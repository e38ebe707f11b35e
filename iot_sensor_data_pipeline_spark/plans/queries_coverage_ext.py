"""Round-9 coverage batch: operators that were pytest-covered but had
no registered query — context-window chunking, PII audit, SCD2
dimension maintenance, fixed-iteration PageRank, skew diagnostics, and
single-scan data profiling — each promoted to a DuckDB-oracled entry
in the extended registry (swept hash-for-hash at two scale points by
tests/test_tpch_full.py, same compare contract as the driver gate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iot_sensor_data_pipeline_spark.plans.registry import register, register_extended
from iot_sensor_data_pipeline_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# documents_chunk_pack — chunk_documents (operators/curation.py): the
# context-window preparation step of a training/retrieval pipeline.
# ---------------------------------------------------------------------------

_CHUNK = 64
_OVERLAP = 16
_STRIDE = _CHUNK - _OVERLAP

# DuckDB mirrors the operator's exact arithmetic: whitespace tokens,
# n_chunks = max(ceil((n - overlap) / stride), 1), chunk i = 1-based
# token slice [i*stride+1, i*stride+chunk] (end-inclusive in DuckDB,
# start+length in Spark — same window), short final chunk kept.
_CHUNK_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(coalesce(text, ''), '\\s+'),
                     t -> t <> '') AS tk
  FROM documents
), spec AS (
  SELECT doc_id, tk,
         greatest(CAST(ceil((len(tk) - {_OVERLAP}) / {_STRIDE}.0) AS BIGINT),
                  1) AS n_chunks
  FROM toks
)
SELECT s.doc_id,
       u.i AS chunk_idx,
       array_to_string(s.tk[(u.i * {_STRIDE} + 1):(u.i * {_STRIDE} + {_CHUNK})],
                       ' ') AS chunk_text,
       len(s.tk[(u.i * {_STRIDE} + 1):(u.i * {_STRIDE} + {_CHUNK})]) AS n_tokens
FROM spec s, LATERAL unnest(range(0, s.n_chunks)) AS u(i)
"""


@register_extended(
    "documents_chunk_pack", oracle=_CHUNK_ORACLE, tags=("pipeline", "curation")
)
def documents_chunk_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size overlapping token chunks over the corpus — one
    shuffle-free codegen scan (split -> sequence -> slice ->
    posexplode), no UDF; see chunk_documents for the scale notes."""
    from iot_sensor_data_pipeline_spark.operators.curation import chunk_documents

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.coalesce("text", F.lit("")).alias("text")
    )
    out = chunk_documents(docs, chunk_tokens=_CHUNK, overlap_tokens=_OVERLAP)
    return out.select(
        F.col("id").alias("doc_id"),
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        "chunk_text",
        F.col("n_tokens").cast("long").alias("n_tokens"),
    )


# ---------------------------------------------------------------------------
# documents_pii_stats — pii_hit_counts / pii_redact audit, per source.
# The corpus text is salted with deterministic synthetic PII (derived
# from doc_id on BOTH engines) so the regex machinery is exercised on
# real hits, not an all-zeros report.
# ---------------------------------------------------------------------------

# keep in sync with operators/curation.py PII_PATTERNS (RE2-compatible
# by design so the identical pattern strings run on DuckDB)
_PII_SQL_SALT = """
  SELECT source,
         concat_ws(' ', text,
           'user' || CAST(doc_id AS VARCHAR) || '@example.org',
           CASE WHEN doc_id % 3 = 0 THEN 'call 415-555-0173' ELSE '' END,
           CASE WHEN doc_id % 5 = 0 THEN 'host 10.20.30.40' ELSE '' END,
           CASE WHEN doc_id % 7 = 0 THEN 'ssn 123-45-6789' ELSE '' END,
           CASE WHEN doc_id % 11 = 0 THEN 'card 4111 1111 1111 1111' ELSE '' END
         ) AS t
  FROM documents
"""


def _pii_oracle() -> str:
    from iot_sensor_data_pipeline_spark.operators.curation import PII_PATTERNS

    counts = ",\n         ".join(
        f"CAST(sum(len(regexp_extract_all(t, '{pat}'))) AS BIGINT) AS n_{name}"
        for name, pat, _ in PII_PATTERNS
    )
    redacted = "t"
    for _, pat, token in PII_PATTERNS:
        redacted = f"regexp_replace({redacted}, '{pat}', '{token}', 'g')"
    return f"""
WITH salted AS ({_PII_SQL_SALT})
SELECT source,
       count(*) AS n_docs,
       {counts},
       CAST(sum(length(t) - length({redacted})) AS BIGINT) AS redacted_chars
FROM salted
GROUP BY source
"""


@register(
    "documents_pii_stats", oracle=_pii_oracle(), tags=("pipeline", "curation", "pii")
)
def documents_pii_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source PII audit: hit counts per class plus the total
    character shrinkage the redaction chain would apply — the
    trust-score input for source-level curation. Scan-side regex
    projections and ONE aggregation; zero joins, zero UDFs."""
    from iot_sensor_data_pipeline_spark.operators.curation import (
        pii_hit_counts,
        pii_redact,
    )

    docs = load_table(spark, sf_dir, "documents")
    salted = docs.select(
        "source",
        F.concat_ws(
            " ",
            F.col("text"),
            F.concat(
                F.lit("user"), F.col("doc_id").cast("string"), F.lit("@example.org")
            ),
            F.when(F.col("doc_id") % 3 == 0, F.lit("call 415-555-0173")).otherwise(
                F.lit("")
            ),
            F.when(F.col("doc_id") % 5 == 0, F.lit("host 10.20.30.40")).otherwise(
                F.lit("")
            ),
            F.when(F.col("doc_id") % 7 == 0, F.lit("ssn 123-45-6789")).otherwise(
                F.lit("")
            ),
            F.when(
                F.col("doc_id") % 11 == 0, F.lit("card 4111 1111 1111 1111")
            ).otherwise(F.lit("")),
        ).alias("t"),
    )
    per_doc = salted.select(
        "source",
        *pii_hit_counts(F.col("t")),
        (F.length("t") - F.length(pii_redact(F.col("t")))).alias("__shrink"),
    )
    hit_cols = [c for c in per_doc.columns if c.startswith("n_")]
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        *[F.sum(c).cast("long").alias(c) for c in hit_cols],
        F.sum("__shrink").cast("long").alias("redacted_chars"),
    )


# ---------------------------------------------------------------------------
# orders_scd2_history — scd2_apply (operators/merge.py): type-2 slowly
# changing dimension over a per-customer status-change stream derived
# from orders (latest order per (customer, day) is the day's update).
# ---------------------------------------------------------------------------

_SCD2_EPOCH = "1990-01-01 00:00:00"

_SCD2_ORACLE = f"""
WITH hist AS (
  SELECT c_custkey, 'NEW' AS status,
         TIMESTAMP '{_SCD2_EPOCH}' AS valid_from,
         CAST(NULL AS TIMESTAMP) AS valid_to,
         true AS is_current
  FROM customer
), upd AS (
  SELECT o_custkey AS c_custkey,
         arg_max(o_orderstatus, o_orderkey) AS status,
         o_orderdate AS ts
  FROM orders GROUP BY o_custkey, o_orderdate
), seq AS (
  SELECT c_custkey, status, ts AS valid_from,
         lead(ts) OVER w AS valid_to,
         lead(ts) OVER w IS NULL AS is_current
  FROM upd
  WINDOW w AS (PARTITION BY c_custkey ORDER BY ts)
), first_upd AS (
  SELECT c_custkey, min(ts) AS first_ts FROM upd GROUP BY c_custkey
), closed AS (
  SELECT h.c_custkey, h.status, h.valid_from, f.first_ts AS valid_to,
         false AS is_current
  FROM hist h JOIN first_upd f USING (c_custkey)
), untouched AS (
  SELECT h.* FROM hist h ANTI JOIN first_upd f USING (c_custkey)
)
SELECT * FROM untouched
UNION ALL SELECT * FROM closed
UNION ALL SELECT * FROM seq
"""


@register(
    "orders_scd2_history", oracle=_SCD2_ORACLE, tags=("maintenance", "scd2")
)
def orders_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 apply: the seed dimension (every customer 'NEW' since the
    epoch) plus the sequenced status-change stream — closed-out rows
    keep their span, the last version per key is current. One window
    over the (small) update stream; the dimension never sorts."""
    from iot_sensor_data_pipeline_spark.operators.merge import scd2_apply

    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")

    hist = customer.select(
        "c_custkey",
        F.lit("NEW").alias("status"),
        F.lit(_SCD2_EPOCH).cast("timestamp_ntz").alias("valid_from"),
        F.lit(None).cast("timestamp_ntz").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    # latest order per (customer, day) = that day's update; orderkey
    # breaks same-day ties deterministically (mirrors arg_max)
    w = Window.partitionBy("o_custkey", "o_orderdate").orderBy(
        F.col("o_orderkey").desc()
    )
    upd = (
        orders.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(
            F.col("o_custkey").alias("c_custkey"),
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderdate").alias("ts"),
        )
    )
    return scd2_apply(hist, upd, keys=["c_custkey"], ts_col="ts")


# ---------------------------------------------------------------------------
# graph_pagerank_bipartite — pagerank (operators/graph.py) in its
# fixed-iteration mode over the customer -> supplier purchase graph.
# Suppliers have no out-edges, so every round exercises the dangling-
# mass correction. The oracle unrolls the same 8 power rounds as a CTE
# chain — deterministic on both engines (no float-keyed early exit).
# ---------------------------------------------------------------------------

_PR_ITERS = 8
_PR_DAMP = 0.85


def _pagerank_oracle(iters: int, d: float) -> str:
    parts = [
        """
WITH edges AS (
  SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
                  's' || CAST(l_suppkey AS VARCHAR) AS dst
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
), nodes AS (
  SELECT src AS id FROM edges UNION SELECT dst FROM edges
), nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
outdeg AS (
  SELECT src AS id, CAST(count(*) AS DOUBLE) AS deg FROM edges GROUP BY src
),
r0 AS (SELECT id, 1.0 / nn.n AS rank FROM nodes, nn)"""
    ]
    for k in range(1, iters + 1):
        p = k - 1
        parts.append(
            f""",
dang{k} AS (
  SELECT coalesce(sum(r.rank), 0.0) AS m
  FROM r{p} r LEFT JOIN outdeg od ON r.id = od.id WHERE od.id IS NULL
),
inf{k} AS (
  SELECT e.dst AS id, sum(r.rank / od.deg) AS inflow
  FROM r{p} r JOIN outdeg od ON r.id = od.id JOIN edges e ON e.src = r.id
  GROUP BY e.dst
),
r{k} AS (
  SELECT nd.id,
         (1.0 - {d}) / nn.n
         + {d} * (coalesce(i.inflow, 0.0) + dang{k}.m / nn.n) AS rank
  FROM nodes nd CROSS JOIN nn CROSS JOIN dang{k}
  LEFT JOIN inf{k} i ON nd.id = i.id
)"""
        )
    parts.append(f"\nSELECT id, round(rank, 7) AS rank FROM r{iters}")
    return "".join(parts)


@register_extended(
    "graph_pagerank_bipartite",
    oracle=_pagerank_oracle(_PR_ITERS, _PR_DAMP),
    tags=("graph", "iterative"),
)
def graph_pagerank_bipartite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Authority ranking over who-buys-from-whom. Ranks rounded to 7dp
    on both engines: the underlying doubles agree to ~1e-15 (same IEEE
    ops, different summation order), far inside the rounding grid."""
    from iot_sensor_data_pipeline_spark.operators.graph import pagerank

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    edges = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    ranks = pagerank(
        edges, damping=_PR_DAMP, max_iterations=_PR_ITERS, tol=None, check_interval=4
    )
    return ranks.select("id", F.round("rank", 7).alias("rank"))


# ---------------------------------------------------------------------------
# lineitem_skew_report — skew_report (operators/skew.py): heaviest-key
# diagnosis with the salt fan-out that would level each hot key. The
# composite (returnflag, linestatus) key gives a genuinely skewed
# distribution (four live combinations of very different sizes).
# ---------------------------------------------------------------------------

_SKEW_TOPK = 10

_SKEW_ORACLE = f"""
WITH pk AS (
  SELECT concat_ws('|', coalesce(CAST(l_returnflag AS VARCHAR), '<NULL>'),
                        coalesce(CAST(l_linestatus AS VARCHAR), '<NULL>')) AS key,
         count(*) AS n_rows
  FROM lineitem GROUP BY 1
), tot AS (
  SELECT CAST(sum(n_rows) AS DOUBLE) AS total,
         CAST(count(*) AS DOUBLE) AS n_keys
  FROM pk
)
SELECT key, n_rows,
       round(n_rows / total, 9) AS row_share,
       round(n_rows / (total / n_keys), 6) AS skew_factor,
       greatest(CAST(ceil(n_rows / (total / n_keys)) AS BIGINT), 1)
         AS suggested_salts
FROM pk, tot
ORDER BY n_rows DESC, key
LIMIT {_SKEW_TOPK}
"""


@register(
    "lineitem_skew_report", oracle=_SKEW_ORACLE, tags=("skew", "diagnostics")
)
def lineitem_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaviest (returnflag, linestatus) keys with the salted_join /
    salted_agg fan-out that would level them. One map-side-combined
    groupBy + a 1-row totals broadcast + TakeOrderedAndProject."""
    from iot_sensor_data_pipeline_spark.operators.skew import skew_report

    lineitem = load_table(spark, sf_dir, "lineitem")
    return skew_report(
        lineitem, keys=["l_returnflag", "l_linestatus"], top_k=_SKEW_TOPK
    )


# ---------------------------------------------------------------------------
# events_seasonal_baseline — operator COMPOSITION showcase: exact
# grouped quantiles (operators/sketches.py, the rank-wise
# percentile_cont that never buffers a group) build a per-(user,
# hour-of-day) seasonal profile, and a Tukey-fence pass counts each
# cell's anomalies. The shape behind "is this sensor reading odd FOR
# 3 AM" dashboards.
# ---------------------------------------------------------------------------

_SEASONAL_ORACLE = """
WITH ev AS (
  SELECT user_id, CAST(hour(ts) AS INT) AS hod, value
  FROM events WHERE value IS NOT NULL
), base AS (
  SELECT user_id, hod,
         round(quantile_cont(value, 0.25), 6) AS p25,
         round(quantile_cont(value, 0.50), 6) AS p50,
         round(quantile_cont(value, 0.75), 6) AS p75
  FROM ev GROUP BY user_id, hod
)
SELECT e.user_id, e.hod,
       CAST(count(*) AS BIGINT) AS n,
       min(b.p50) AS p50,
       round(min(b.p75) - min(b.p25), 6) AS iqr,
       CAST(sum(CASE WHEN e.value > b.p75 + 1.5 * (b.p75 - b.p25)
                       OR e.value < b.p25 - 1.5 * (b.p75 - b.p25)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
FROM ev e JOIN base b USING (user_id, hod)
GROUP BY e.user_id, e.hod
"""


@register(
    "events_seasonal_baseline",
    oracle=_SEASONAL_ORACLE,
    tags=("timeseries", "quantiles", "anomaly"),
)
def events_seasonal_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(user, hour-of-day) seasonal profile with Tukey-fence
    anomaly counts. Exact quantiles come from the rank-wise
    percentile_cont (no group-sized buffer at any scale); the profile
    joins back on the same (user, hod) key the quantile pass shuffled
    on, so the whole query is two key-shuffles and a broadcast-free
    equi-join."""
    from iot_sensor_data_pipeline_spark.operators.sketches import (
        grouped_quantiles_exact,
    )

    events = load_table(spark, sf_dir, "events")
    ev = events.where(F.col("value").isNotNull()).select(
        "user_id", F.hour("ts").alias("hod"), "value"
    )
    qs = grouped_quantiles_exact(ev, ["user_id", "hod"], "value", [0.25, 0.5, 0.75])
    base = qs.groupBy("user_id", "hod").agg(
        F.min(F.when(F.col("q") == 0.25, F.col("value"))).alias("p25"),
        F.min(F.when(F.col("q") == 0.50, F.col("value"))).alias("p50"),
        F.min(F.when(F.col("q") == 0.75, F.col("value"))).alias("p75"),
    )
    iqr = F.col("p75") - F.col("p25")
    anomalous = (F.col("value") > F.col("p75") + 1.5 * iqr) | (
        F.col("value") < F.col("p25") - 1.5 * iqr
    )
    return (
        ev.join(base, ["user_id", "hod"])
        .groupBy("user_id", "hod")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("p50").alias("p50"),
            F.round(F.min("p75") - F.min("p25"), 6).alias("iqr"),
            F.sum(anomalous.cast("long")).alias("n_anomalies"),
        )
    )


# ---------------------------------------------------------------------------
# lineitem_partial_rollup — the mergeable-rollup family
# (operators/sketches.py partial_aggregates / merge_aggregates): fine-
# grain partial moments persist once, every coarser question folds the
# partial ROWS, never the raw history. The oracle is the DIRECT
# aggregate at the coarse grain, so a hash match proves
# merge(partials) == direct cross-engine — the correctness statement a
# continuous-aggregate / materialized-rollup pipeline rests on.
# ---------------------------------------------------------------------------

_ROLLUP_ORACLE = """
SELECT l_returnflag,
       round(CAST(sum(l_quantity) AS DOUBLE), 4) AS sum_qty,
       CAST(count(l_quantity) AS BIGINT) AS n_qty,
       CAST(min(l_quantity) AS DOUBLE) AS min_qty,
       CAST(max(l_quantity) AS DOUBLE) AS max_qty,
       round(avg(l_quantity), 6) AS avg_qty,
       round(stddev_pop(l_quantity), 6) AS std_qty
FROM lineitem GROUP BY l_returnflag
"""


@register(
    "lineitem_partial_rollup",
    oracle=_ROLLUP_ORACLE,
    tags=("sketches", "rollup", "maintenance"),
)
def lineitem_partial_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build per-(returnflag, linestatus) partial moments, then merge
    to the returnflag grain — cost of the merge is #partial rows,
    independent of raw history size. avg/stddev derive from the merged
    moments (means of means would weight groups, not rows)."""
    from iot_sensor_data_pipeline_spark.operators.sketches import (
        merge_aggregates,
        partial_aggregates,
    )

    li = load_table(spark, sf_dir, "lineitem")
    partials = partial_aggregates(li, ["l_returnflag", "l_linestatus"], "l_quantity")
    merged = merge_aggregates(partials, ["l_returnflag"])
    return merged.select(
        "l_returnflag",
        F.round("sum_v", 4).alias("sum_qty"),
        F.col("n_v").alias("n_qty"),
        F.col("min_v").alias("min_qty"),
        F.col("max_v").alias("max_qty"),
        F.round("avg_v", 6).alias("avg_qty"),
        F.round("stddev_pop_v", 6).alias("std_qty"),
    )


# ---------------------------------------------------------------------------
# lineitem_histogram_partials — the mergeable-HISTOGRAM build side
# (operators/sketches.py histogram_partials): per-group per-bin
# (count, exact lo, exact hi) rows over FIXED edges. Edges are literal
# here (histogram_bins' approxQuantile edges are engine-specific; the
# bin-fold mechanics are what this differential pins — searchsorted
# over shared edges, exact per-bin min/max).
# ---------------------------------------------------------------------------

_HIST_EDGES = (10.0, 20.0, 30.0, 40.0)

_HIST_ORACLE = f"""
WITH binned AS (
  SELECT l_returnflag,
         CAST(l_quantity AS DOUBLE) AS v,
         CAST(len(list_filter([{', '.join(str(e) for e in _HIST_EDGES)}],
                              e -> e <= CAST(l_quantity AS DOUBLE))) AS INT)
           AS bin
  FROM lineitem WHERE l_quantity IS NOT NULL
)
SELECT l_returnflag, bin,
       CAST(count(*) AS BIGINT) AS n,
       min(v) AS lo,
       max(v) AS hi
FROM binned GROUP BY l_returnflag, bin
"""


@register(
    "lineitem_histogram_partials",
    oracle=_HIST_ORACLE,
    tags=("sketches", "histogram", "rollup"),
)
def lineitem_histogram_partials(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(returnflag, bin) mergeable histogram rows over fixed
    edges — one map-side-combined aggregation; (keys, bin) pairs
    shuffle, values never do."""
    from iot_sensor_data_pipeline_spark.operators.sketches import histogram_partials

    li = load_table(spark, sf_dir, "lineitem")
    return histogram_partials(
        li, ["l_returnflag"], "l_quantity", list(_HIST_EDGES)
    )


# ---------------------------------------------------------------------------
# documents_profile — profile_columns (operators/sketches.py): the
# single-scan data profiler. approx_distinct (HLL) is engine-specific
# and stays under the rows-only lineitem_approx_distinct gate entry;
# the exact columns are compared hash-for-hash here.
# ---------------------------------------------------------------------------

_PROFILE_COLS = ("doc_id", "text", "lang", "source", "n_chars")


def _profile_oracle() -> str:
    aggs = ["count(*) AS n"]
    for c in _PROFILE_COLS:
        aggs.append(f"count({c}) AS nn_{c}")
        aggs.append(f"CAST(min({c}) AS VARCHAR) AS min_{c}")
        aggs.append(f"CAST(max({c}) AS VARCHAR) AS max_{c}")
    rows = []
    for c in _PROFILE_COLS:
        rows.append(
            f"""SELECT '{c}' AS "column", n AS n_rows, n - nn_{c} AS n_null,
       round((n - nn_{c}) / CAST(n AS DOUBLE), 6) AS null_frac,
       min_{c} AS min_str, max_{c} AS max_str FROM base"""
        )
    return (
        "WITH base AS (SELECT "
        + ", ".join(aggs)
        + " FROM documents)\n"
        + "\nUNION ALL ".join(rows)
    )


@register_extended(
    "documents_profile", oracle=_profile_oracle(), tags=("profiling", "sketches")
)
def documents_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-scan profile of the documents table (all 5 columns' stats
    computed inside a single aggregation, then unpivoted)."""
    from iot_sensor_data_pipeline_spark.operators.sketches import profile_columns

    docs = load_table(spark, sf_dir, "documents")
    return profile_columns(docs, cols=list(_PROFILE_COLS)).drop("approx_distinct")


# ---------------------------------------------------------------------------
# lineitem_drift_report — distribution drift between two temporal
# snapshots (operators/drift.py): PSI + total-variation over
# fixed-width reference bins with explicit overflow bins. The binning
# rule is pure arithmetic by design, so the full metric pipeline
# (unpivot -> bin -> full-outer merge -> epsilon-floored PSI)
# hash-matches DuckDB cross-engine.
# ---------------------------------------------------------------------------

_DRIFT_COLS = ("l_quantity", "l_extendedprice", "l_discount")
_DRIFT_SPLIT = "1995-06-01"
_DRIFT_BINS = 16


def _drift_oracle() -> str:
    def long_form(pred: str) -> str:
        return "\n  UNION ALL\n".join(
            f"  SELECT '{c}' AS col, CAST({c} AS DOUBLE) AS value\n"
            f"  FROM lineitem WHERE {pred} AND {c} IS NOT NULL"
            for c in _DRIFT_COLS
        )

    b = _DRIFT_BINS
    eps = "0.000001"
    bin_case = f"""CASE WHEN s.hi > s.lo THEN
        CASE WHEN l.value = s.hi THEN {b - 1}
             ELSE least(greatest(CAST(floor((l.value - s.lo)
                                            / ((s.hi - s.lo) / {b})) AS BIGINT),
                                 CAST(-1 AS BIGINT)), CAST({b} AS BIGINT)) END
      ELSE CASE WHEN l.value < s.lo THEN -1
                WHEN l.value > s.hi THEN {b}
                ELSE 0 END END"""
    return f"""
WITH ref_long AS (
{long_form(f"l_shipdate < TIMESTAMP '{_DRIFT_SPLIT}'")}
),
cur_long AS (
{long_form(f"l_shipdate >= TIMESTAMP '{_DRIFT_SPLIT}'")}
),
stats AS (SELECT col, min(value) AS lo, max(value) AS hi
          FROM ref_long GROUP BY col),
rb AS (SELECT l.col, {bin_case} AS bin
       FROM ref_long l JOIN stats s ON l.col = s.col),
cb AS (SELECT l.col, {bin_case} AS bin
       FROM cur_long l JOIN stats s ON l.col = s.col),
rc AS (SELECT col, bin, count(*) AS n_ref_bin FROM rb GROUP BY col, bin),
cc AS (SELECT col, bin, count(*) AS n_cur_bin FROM cb GROUP BY col, bin),
m AS (
  SELECT coalesce(rc.col, cc.col) AS col,
         coalesce(rc.bin, cc.bin) AS bin,
         coalesce(rc.n_ref_bin, 0) AS n_ref_bin,
         coalesce(cc.n_cur_bin, 0) AS n_cur_bin
  FROM rc FULL OUTER JOIN cc ON rc.col = cc.col AND rc.bin = cc.bin
),
t AS (SELECT col, sum(n_ref_bin) AS n_ref, sum(n_cur_bin) AS n_cur
      FROM m GROUP BY col)
SELECT m.col,
       CAST(t.n_ref AS BIGINT) AS n_ref,
       CAST(t.n_cur AS BIGINT) AS n_cur,
       round(sum((greatest(m.n_ref_bin / t.n_ref, {eps})
                  - greatest(m.n_cur_bin / t.n_cur, {eps}))
                 * ln(greatest(m.n_ref_bin / t.n_ref, {eps})
                      / greatest(m.n_cur_bin / t.n_cur, {eps}))), 6) AS psi,
       round(0.5 * sum(abs(m.n_ref_bin / t.n_ref
                           - m.n_cur_bin / t.n_cur)), 6) AS tvd,
       round(sum(CASE WHEN m.bin = -1 OR m.bin = {b}
                      THEN m.n_cur_bin ELSE 0 END) / t.n_cur, 6)
         AS escaped_share
FROM m JOIN t ON m.col = t.col
GROUP BY m.col, t.n_ref, t.n_cur
"""


@register(  # rotated INTO the gate in r11 (VERDICT r10 task 2)
    "lineitem_drift_report",
    oracle=_drift_oracle(),
    tags=("drift", "maintenance", "pipeline"),
    bench=True,  # r10 anchor
)
def lineitem_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution drift of post-1995-06 shipments against the
    earlier history (operators/drift.py drift_report): one scan per
    side for all three measure columns, PSI + TVD + range-escape per
    column. The corpus-refresh gate a training-data pipeline runs
    before swapping its reference snapshot."""
    from iot_sensor_data_pipeline_spark.operators.drift import drift_report

    li = load_table(spark, sf_dir, "lineitem")
    split = F.lit(_DRIFT_SPLIT).cast("timestamp_ntz")
    return drift_report(
        li.where(F.col("l_shipdate") < split),
        li.where(F.col("l_shipdate") >= split),
        list(_DRIFT_COLS),
        n_bins=_DRIFT_BINS,
    )


# ---------------------------------------------------------------------------
# documents_categorical_drift — label-share drift between two document
# snapshots (operators/drift.py drift_report_categorical): top-K
# reference buckets + <OTHER>/<NULL>, epsilon-floored PSI/TVD, exact
# unseen-value share. Deterministic bucketing (count desc, value asc)
# makes the whole pipeline hash-match DuckDB.
# ---------------------------------------------------------------------------

_CAT_COLS = ("lang", "source")
_CAT_TOPK = 5
_CAT_SPLIT = 300  # n_chars threshold dividing ref/cur snapshots


def _cat_drift_oracle() -> str:
    def long_counts(pred: str) -> str:
        sel = "\n  UNION ALL\n".join(
            f"  SELECT '{c}' AS col, coalesce(CAST({c} AS VARCHAR), '<NULL>') AS val\n"
            f"  FROM documents WHERE {pred}"
            for c in _CAT_COLS
        )
        return f"SELECT col, val, count(*) AS n FROM (\n{sel}\n) GROUP BY col, val"

    eps = "0.000001"
    return f"""
WITH rc AS ({long_counts(f"n_chars < {_CAT_SPLIT}")}),
cc AS ({long_counts(f"n_chars >= {_CAT_SPLIT}")}),
top AS (
  SELECT col, val FROM (
    SELECT col, val,
           row_number() OVER (PARTITION BY col ORDER BY n DESC, val ASC) AS rk
    FROM rc
  ) WHERE rk <= {_CAT_TOPK}
  UNION
  SELECT col, '<NULL>' AS val FROM rc
  UNION
  SELECT col, '<NULL>' AS val FROM cc
),
rb AS (
  SELECT rc.col,
         CASE WHEN top.val IS NOT NULL THEN rc.val ELSE '<OTHER>' END AS bucket,
         sum(rc.n) AS n_ref_bin
  FROM rc LEFT JOIN top ON rc.col = top.col AND rc.val = top.val
  GROUP BY 1, 2
),
cb AS (
  SELECT cc.col,
         CASE WHEN top.val IS NOT NULL THEN cc.val ELSE '<OTHER>' END AS bucket,
         sum(cc.n) AS n_cur_bin
  FROM cc LEFT JOIN top ON cc.col = top.col AND cc.val = top.val
  GROUP BY 1, 2
),
m AS (
  SELECT coalesce(rb.col, cb.col) AS col,
         coalesce(rb.bucket, cb.bucket) AS bucket,
         coalesce(rb.n_ref_bin, 0) AS n_ref_bin,
         coalesce(cb.n_cur_bin, 0) AS n_cur_bin
  FROM rb FULL OUTER JOIN cb ON rb.col = cb.col AND rb.bucket = cb.bucket
),
t AS (SELECT col, sum(n_ref_bin) AS n_ref, sum(n_cur_bin) AS n_cur
      FROM m GROUP BY col),
u AS (
  SELECT cc.col, sum(cc.n) AS unseen
  FROM cc LEFT JOIN rc ON cc.col = rc.col AND cc.val = rc.val
  WHERE rc.val IS NULL AND cc.val <> '<NULL>'
  GROUP BY cc.col
)
SELECT m.col,
       CAST(t.n_ref AS BIGINT) AS n_ref,
       CAST(t.n_cur AS BIGINT) AS n_cur,
       round(sum((greatest(m.n_ref_bin / t.n_ref, {eps})
                  - greatest(m.n_cur_bin / t.n_cur, {eps}))
                 * ln(greatest(m.n_ref_bin / t.n_ref, {eps})
                      / greatest(m.n_cur_bin / t.n_cur, {eps}))), 6) AS psi,
       round(0.5 * sum(abs(m.n_ref_bin / t.n_ref
                           - m.n_cur_bin / t.n_cur)), 6) AS tvd,
       round(coalesce(any_value(u.unseen), 0) / t.n_cur, 6) AS unseen_share
FROM m JOIN t ON m.col = t.col LEFT JOIN u ON m.col = u.col
GROUP BY m.col, t.n_ref, t.n_cur
"""


@register(  # rotated INTO the gate in r11 (VERDICT r10 task 2)
    "documents_categorical_drift",
    oracle=_cat_drift_oracle(),
    tags=("drift", "pipeline"),
    bench=True,  # r10 anchor
)
def documents_categorical_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language/source share drift between the short-document and
    long-document halves of the corpus — the label-distribution gate a
    curation pipeline runs per refresh."""
    from iot_sensor_data_pipeline_spark.operators.drift import (
        drift_report_categorical,
    )

    docs = load_table(spark, sf_dir, "documents")
    return drift_report_categorical(
        docs.where(F.col("n_chars") < _CAT_SPLIT),
        docs.where(F.col("n_chars") >= _CAT_SPLIT),
        list(_CAT_COLS),
        top_k=_CAT_TOPK,
    )


# ---------------------------------------------------------------------------
# documents_quality_auc — per-group binary-classifier evaluation
# (operators/ranking.py binary_classification_report): tie-aware
# Mann-Whitney AUC + Brier + fixed-bin ECE. Pure arithmetic end to end
# (the score is an exact rational, ranks are integer cumsums, halves
# are exact in binary), so the whole report hash-matches DuckDB.
# ---------------------------------------------------------------------------

_AUC_BINS = 10


def _quality_auc_oracle() -> str:
    return f"""
WITH base AS (
  SELECT source,
         (n_chars % 997) / 996.0 AS s,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
  FROM documents
),
g AS (
  SELECT source, s, count(*) AS n, sum(y) AS npos,
         sum((s - y) * (s - y)) AS se
  FROM base GROUP BY source, s
),
r AS (
  SELECT *,
         coalesce(sum(n) OVER (PARTITION BY source ORDER BY s
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + (n + 1) / 2.0 AS avg_rank
  FROM g
),
pg AS (
  SELECT source, sum(n) AS n, sum(npos) AS n_pos,
         sum(npos * avg_rank) AS pos_ranks, sum(se) AS se_sum
  FROM r GROUP BY source
),
cal AS (
  SELECT source,
         least(CAST(floor(s * {_AUC_BINS}) AS BIGINT), {_AUC_BINS - 1}) AS b,
         count(*) AS nb, avg(s) AS ms, avg(CAST(y AS DOUBLE)) AS my
  FROM base GROUP BY 1, 2
),
cg AS (
  SELECT source, sum(abs(ms - my) * nb) AS ece_num, sum(nb) AS n2
  FROM cal GROUP BY source
)
SELECT pg.source,
       CAST(pg.n AS BIGINT) AS n,
       CAST(pg.n_pos AS BIGINT) AS n_pos,
       round((pos_ranks - n_pos * (n_pos + 1) / 2.0)
             / NULLIF(CAST(n_pos * (pg.n - n_pos) AS DOUBLE), 0), 6) AS auc,
       round(se_sum / pg.n, 6) AS brier,
       round(ece_num / n2, 6) AS ece
FROM pg JOIN cg USING (source)
"""


@register(  # rotated INTO the gate in r12 (VERDICT r11 task 1)
    "documents_quality_auc",
    oracle=_quality_auc_oracle(),
    tags=("pipeline", "eval"),
)
def documents_quality_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source AUC/Brier/ECE of a deterministic pseudo-probability
    (an exact rational of n_chars — engine-portable by construction)
    against the is-English label: the eval report a curation pipeline
    runs on its quality scorer per corpus slice."""
    from iot_sensor_data_pipeline_spark.operators.ranking import (
        binary_classification_report,
    )

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "source",
        ((F.col("n_chars") % 997) / F.lit(996.0)).alias("score"),
        (F.col("lang") == "en").cast("int").alias("label"),
    )
    return binary_classification_report(
        scored, "score", "label", by=["source"],
        n_calibration_bins=_AUC_BINS,
    )


# ---------------------------------------------------------------------------
# events_robust_stats — grouped robust location/scale + modified-z
# outliers (operators/sketches.py grouped_robust_stats /
# robust_outliers): median/MAD/IQR per event type with the
# Iglewicz-Hoaglin outlier count. Built on the rank-wise exact
# percentile_cont, so the whole report (including the rounded-median
# deviation pass) hash-matches DuckDB's quantile_cont digit for digit.
# ---------------------------------------------------------------------------

_ROBUST_Z = 3.5


def _robust_stats_oracle() -> str:
    return f"""
WITH base AS (
  SELECT event_type, CAST(value AS DOUBLE) AS v
  FROM events WHERE value IS NOT NULL
),
s AS (
  SELECT event_type,
         count(*) AS n,
         round(quantile_cont(v, 0.25), 6) AS q1,
         round(quantile_cont(v, 0.5), 6) AS median,
         round(quantile_cont(v, 0.75), 6) AS q3
  FROM base GROUP BY event_type
),
d AS (
  SELECT b.event_type, abs(b.v - s.median) AS dd
  FROM base b JOIN s USING (event_type)
),
m AS (
  SELECT event_type, round(quantile_cont(dd, 0.5), 6) AS mad
  FROM d GROUP BY event_type
),
o AS (
  SELECT b.event_type, count(*) AS n_outliers
  FROM base b JOIN s USING (event_type) JOIN m USING (event_type)
  WHERE m.mad > 0
    AND abs(round(0.6745 * (b.v - s.median) / m.mad, 6)) > {_ROBUST_Z}
  GROUP BY b.event_type
)
SELECT s.event_type,
       CAST(s.n AS BIGINT) AS n,
       s.median, s.q1, s.q3,
       round(s.q3 - s.q1, 6) AS iqr,
       m.mad,
       CAST(coalesce(o.n_outliers, 0) AS BIGINT) AS n_outliers
FROM s JOIN m USING (event_type) LEFT JOIN o USING (event_type)
"""


@register(  # rotated INTO the gate in r12 (VERDICT r11 task 1)
    "events_robust_stats",
    oracle=_robust_stats_oracle(),
    tags=("analytics", "timeseries", "robust"),
)
def events_robust_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD/IQR per event type plus the modified-z outlier count
    — the contamination-resistant baseline an anomaly detector should
    threshold on (a mean/stddev baseline lets the outliers inflate the
    very scale that judges them)."""
    from iot_sensor_data_pipeline_spark.operators.sketches import (
        grouped_robust_stats,
        robust_outliers,
    )

    ev = load_table(spark, sf_dir, "events")
    # the stats relation is group-grain (tiny) and feeds BOTH the
    # report and the outlier pass — checkpoint + pass it in so the
    # rank-wise quantile machinery runs once, not twice (r14)
    stats = grouped_robust_stats(ev, ["event_type"], "value").localCheckpoint(
        eager=False
    )
    out_counts = (
        robust_outliers(
            ev, ["event_type"], "value", z_threshold=_ROBUST_Z, stats=stats
        )
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("__o"))
    )
    return stats.join(out_counts, "event_type", "left").select(
        "event_type", "n", "median", "q1", "q3", "iqr", "mad",
        F.coalesce(F.col("__o"), F.lit(0)).cast("long").alias("n_outliers"),
    )


# ---------------------------------------------------------------------------
# events_ab_test — experiment analysis (operators/experiment.py
# ab_test_report): unit-grain Welch z lift report. Deterministic
# variant assignment (user_id % 3) and pure-arithmetic statistics, so
# the whole report hash-matches DuckDB.
# ---------------------------------------------------------------------------

_AB_ORACLE = """
WITH tagged AS (
  SELECT user_id,
         CASE user_id % 3 WHEN 0 THEN 'control' WHEN 1 THEN 'blue'
              ELSE 'green' END AS variant,
         CAST(value AS DOUBLE) AS value
  FROM events WHERE user_id IS NOT NULL
),
pu AS (
  SELECT variant, user_id, coalesce(sum(value), 0.0) AS m
  FROM tagged GROUP BY variant, user_id
),
s AS (
  SELECT variant, count(*) AS n_units, sum(m) AS sm, sum(m * m) AS ss
  FROM pu GROUP BY variant
),
x AS (
  SELECT variant, n_units, sm / n_units AS mean,
         (ss - sm * sm / n_units) / NULLIF(n_units - 1, 0) AS var
  FROM s
),
c AS (SELECT n_units AS nc, mean AS mc, var AS vc
      FROM x WHERE variant = 'control')
SELECT x.variant,
       CAST(x.n_units AS BIGINT) AS n_units,
       round(x.mean, 6) AS mean,
       CASE WHEN x.variant <> 'control'
            THEN round(x.mean - c.mc, 6) END AS lift,
       CASE WHEN x.variant <> 'control'
            THEN round((x.mean - c.mc) / NULLIF(c.mc, 0), 6) END AS rel_lift,
       CASE WHEN x.variant <> 'control'
              AND sqrt(c.vc / c.nc + x.var / x.n_units) > 0
            THEN round((x.mean - c.mc)
                       / sqrt(c.vc / c.nc + x.var / x.n_units), 6) END AS z
FROM x, c
"""


@register(  # rotated INTO the gate in r12 (VERDICT r11 task 1)
    "events_ab_test",
    oracle=_AB_ORACLE,
    tags=("analytics", "experiment"),
)
def events_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-arm experiment read-out over the events stream: per-user
    summed value as the unit metric, Welch z vs the control arm — the
    decision table an experimentation platform renders."""
    from iot_sensor_data_pipeline_spark.operators.experiment import (
        ab_test_report,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.when(F.col("user_id") % 3 == 0, "control")
        .when(F.col("user_id") % 3 == 1, "blue")
        .otherwise("green")
        .alias("variant"),
        "value",
    )
    return ab_test_report(ev, "user_id", "variant", "value", control="control")


# ---------------------------------------------------------------------------
# events_ab_conversion_multi — multi-metric experiment read-out
# (operators/experiment.py ab_test_report_multi, r12): a conversion
# metric (did the user EVER record value > 50) and the continuous
# spend metric in ONE (variant, unit) pass. The Welch z on the 0/1
# unit values IS the unpooled two-proportion z, so the same oracle
# arithmetic covers both metric kinds.
# ---------------------------------------------------------------------------

_AB_MULTI_ORACLE = """
WITH tagged AS (
  SELECT user_id,
         CASE user_id % 3 WHEN 0 THEN 'control' WHEN 1 THEN 'blue'
              ELSE 'green' END AS variant,
         CAST(value AS DOUBLE) AS value,
         CASE WHEN value > 50 THEN 1.0 ELSE 0.0 END AS conv
  FROM events WHERE user_id IS NOT NULL
),
pu AS (
  SELECT variant, user_id,
         coalesce(sum(value), 0.0) AS m0,
         coalesce(max(conv), 0.0) AS m1
  FROM tagged GROUP BY variant, user_id
),
s AS (
  SELECT variant, count(*) AS n_units,
         sum(m0) AS s0, sum(m0 * m0) AS ss0,
         sum(m1) AS s1, sum(m1 * m1) AS ss1
  FROM pu GROUP BY variant
),
x AS (
  SELECT variant, n_units,
         s0 / n_units AS mean0,
         (ss0 - s0 * s0 / n_units) / NULLIF(n_units - 1, 0) AS var0,
         s1 / n_units AS mean1,
         (ss1 - s1 * s1 / n_units) / NULLIF(n_units - 1, 0) AS var1
  FROM s
),
c AS (SELECT n_units AS nc, mean0 AS mc0, var0 AS vc0,
             mean1 AS mc1, var1 AS vc1
      FROM x WHERE variant = 'control')
SELECT x.variant, 'spend' AS metric, CAST(x.n_units AS BIGINT) AS n_units,
       round(x.mean0, 6) AS mean,
       CASE WHEN x.variant <> 'control'
            THEN round(x.mean0 - c.mc0, 6) END AS lift,
       CASE WHEN x.variant <> 'control'
            THEN round((x.mean0 - c.mc0) / NULLIF(c.mc0, 0), 6) END AS rel_lift,
       CASE WHEN x.variant <> 'control'
              AND sqrt(c.vc0 / c.nc + x.var0 / x.n_units) > 0
            THEN round((x.mean0 - c.mc0)
                       / sqrt(c.vc0 / c.nc + x.var0 / x.n_units), 6) END AS z
FROM x, c
UNION ALL
SELECT x.variant, 'purchase' AS metric, CAST(x.n_units AS BIGINT) AS n_units,
       round(x.mean1, 6) AS mean,
       CASE WHEN x.variant <> 'control'
            THEN round(x.mean1 - c.mc1, 6) END AS lift,
       CASE WHEN x.variant <> 'control'
            THEN round((x.mean1 - c.mc1) / NULLIF(c.mc1, 0), 6) END AS rel_lift,
       CASE WHEN x.variant <> 'control'
              AND sqrt(c.vc1 / c.nc + x.var1 / x.n_units) > 0
            THEN round((x.mean1 - c.mc1)
                       / sqrt(c.vc1 / c.nc + x.var1 / x.n_units), 6) END AS z
FROM x, c
"""


@register_extended(
    "events_ab_conversion_multi",
    oracle=_AB_MULTI_ORACLE,
    tags=("analytics", "experiment"),
)
def events_ab_conversion_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion + spend in one experiment report, one corpus pass
    (r12 — running ab_test_report per metric would re-shuffle the
    events N times)."""
    from iot_sensor_data_pipeline_spark.operators.experiment import (
        Metric,
        ab_test_report_multi,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.when(F.col("user_id") % 3 == 0, "control")
        .when(F.col("user_id") % 3 == 1, "blue")
        .otherwise("green")
        .alias("variant"),
        "value",
        (F.col("value") > 50).alias("converted"),
    )
    return ab_test_report_multi(
        ev, "user_id", "variant",
        [Metric("spend", "value", "sum"),
         Metric("purchase", "converted", "conversion")],
        control="control",
    )


# ---------------------------------------------------------------------------
# events_ab_cuped — CUPED variance-reduced experiment analysis
# (operators/experiment.py ab_test_report_cuped, r12): the pre-period
# spend (before Jan 16) is the covariate for the in-period spend —
# the same-metric-pre-period covariate CUPED was designed around.
# Pure sum/multiply/divide/sqrt arithmetic, so DuckDB reproduces the
# adjusted report digit for digit at 6dp.
# ---------------------------------------------------------------------------

_AB_CUPED_ORACLE = """
WITH tagged AS (
  SELECT user_id,
         CASE user_id % 3 WHEN 0 THEN 'control' WHEN 1 THEN 'blue'
              ELSE 'green' END AS variant,
         CASE WHEN ts >= TIMESTAMP '2024-01-16'
              THEN CAST(value AS DOUBLE) END AS post,
         CASE WHEN ts < TIMESTAMP '2024-01-16'
              THEN CAST(value AS DOUBLE) END AS pre
  FROM events WHERE user_id IS NOT NULL
),
pu AS (
  SELECT variant, user_id,
         coalesce(sum(post), 0.0) AS m, coalesce(sum(pre), 0.0) AS x
  FROM tagged GROUP BY variant, user_id
),
v AS (
  SELECT variant, count(*) AS n, sum(m) AS sm, sum(x) AS sx,
         sum(m * m) AS smm, sum(x * x) AS sxx, sum(m * x) AS smx
  FROM pu GROUP BY variant
),
p AS (
  SELECT sum(n) AS nn, sum(sm) AS psm, sum(sx) AS psx,
         sum(sxx) AS psxx, sum(smx) AS psmx
  FROM v
),
t AS (
  SELECT nn, psx / nn AS xbar,
         CASE WHEN nn > 1 AND (psxx - psx * psx / nn) / (nn - 1) > 0
              THEN ((psmx - psm * psx / nn) / (nn - 1))
                   / ((psxx - psx * psx / nn) / (nn - 1))
              ELSE 0.0 END AS theta
  FROM p
),
a AS (
  SELECT v.variant, v.n, t.theta,
         v.sm - t.theta * v.sx + v.n * (t.theta * t.xbar) AS sadj,
         v.smm - 2 * t.theta * v.smx + t.theta * t.theta * v.sxx
           + 2 * (t.theta * t.xbar) * v.sm
           - 2 * (t.theta * t.xbar) * t.theta * v.sx
           + v.n * (t.theta * t.xbar) * (t.theta * t.xbar) AS ssadj
  FROM v, t
),
x AS (
  SELECT variant, n AS n_units, theta, sadj / n AS mean,
         (ssadj - sadj * sadj / n) / NULLIF(n - 1, 0) AS var
  FROM a
),
c AS (SELECT n_units AS nc, mean AS mc, var AS vc
      FROM x WHERE variant = 'control')
SELECT x.variant, CAST(x.n_units AS BIGINT) AS n_units,
       round(x.theta, 6) AS theta,
       round(x.mean, 6) AS mean,
       CASE WHEN x.variant <> 'control'
            THEN round(x.mean - c.mc, 6) END AS lift,
       CASE WHEN x.variant <> 'control'
            THEN round((x.mean - c.mc) / NULLIF(c.mc, 0), 6) END AS rel_lift,
       CASE WHEN x.variant <> 'control'
              AND sqrt(c.vc / c.nc + x.var / x.n_units) > 0
            THEN round((x.mean - c.mc)
                       / sqrt(c.vc / c.nc + x.var / x.n_units), 6) END AS z
FROM x, c
"""


@register_extended(
    "events_ab_cuped",
    oracle=_AB_CUPED_ORACLE,
    tags=("analytics", "experiment"),
)
def events_ab_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance-reduced read-out: in-period spend adjusted by the
    pre-period spend covariate (r12). The adjustment is
    treatment-independent (pooled theta), so the lift is unbiased
    while its standard error shrinks by the metric/covariate
    correlation."""
    from iot_sensor_data_pipeline_spark.operators.experiment import (
        ab_test_report_cuped,
    )

    cut = F.lit("2024-01-16").cast("timestamp_ntz")
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.when(F.col("user_id") % 3 == 0, "control")
        .when(F.col("user_id") % 3 == 1, "blue")
        .otherwise("green")
        .alias("variant"),
        F.when(F.col("ts") >= cut, F.col("value")).alias("post"),
        F.when(F.col("ts") < cut, F.col("value")).alias("pre"),
    )
    return ab_test_report_cuped(
        ev, "user_id", "variant", "post", "pre", control="control"
    )


# ---------------------------------------------------------------------------
# events_srm_check — sample-ratio-mismatch guardrail
# (operators/experiment.py srm_check, r12): realized unit split vs the
# configured thirds allocation; the chi-square statistic is pure
# arithmetic over variant-grain counts.
# ---------------------------------------------------------------------------

_SRM_ORACLE = """
WITH u AS (
  SELECT DISTINCT
         CASE user_id % 3 WHEN 0 THEN 'control' WHEN 1 THEN 'blue'
              ELSE 'green' END AS variant,
         user_id
  FROM events WHERE user_id IS NOT NULL
),
cnt AS (SELECT variant, count(*) AS n_units FROM u GROUP BY variant),
exp AS (
  SELECT * FROM (VALUES ('blue', 1.0 / 3), ('control', 1.0 / 3),
                        ('green', 1.0 / 3)) AS t(variant, expected_share)
),
tot AS (SELECT CAST(sum(n_units) AS DOUBLE) AS nt FROM cnt),
k AS (
  SELECT e.variant, coalesce(c.n_units, 0) AS n_units, e.expected_share,
         CAST(coalesce(c.n_units, 0) AS DOUBLE) / t.nt AS obs,
         (coalesce(c.n_units, 0) - e.expected_share * t.nt)
           * (coalesce(c.n_units, 0) - e.expected_share * t.nt)
           / (e.expected_share * t.nt) AS term
  FROM exp e LEFT JOIN cnt c USING (variant), tot t
)
SELECT variant, CAST(n_units AS BIGINT) AS n_units,
       round(expected_share, 6) AS expected_share,
       round(obs, 6) AS observed_share,
       round(term, 6) AS chi2_term,
       round((SELECT sum(term) FROM k), 6) AS chi2,
       CAST(2 AS BIGINT) AS df_chi
FROM k
"""


@register_extended(
    "events_srm_check",
    oracle=_SRM_ORACLE,
    tags=("analytics", "experiment", "guardrail"),
)
def events_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dashboard's first row: is the realized split still the
    configured thirds? (r12 — an SRM invalidates every lift above
    it.)"""
    from iot_sensor_data_pipeline_spark.operators.experiment import srm_check

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.when(F.col("user_id") % 3 == 0, "control")
        .when(F.col("user_id") % 3 == 1, "blue")
        .otherwise("green")
        .alias("variant"),
    )
    return srm_check(
        ev, "user_id", "variant",
        {"control": 1.0 / 3, "blue": 1.0 / 3, "green": 1.0 / 3},
    )
