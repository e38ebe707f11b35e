"""Extended LLM-pipeline queries (beyond the driver gate's 50 slots),
hash-checked against DuckDB by tests/test_span_dedup.py with the
driver's compare contract."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iot_sensor_data_pipeline_spark.operators.span_dedup import remove_duplicated_spans
from iot_sensor_data_pipeline_spark.plans.registry import register, register_extended
from iot_sensor_data_pipeline_spark.sources.tables import load_table

_K = 8

# DuckDB expresses the same algorithm on span STRINGS (no xxhash64 in
# DuckDB); Spark keys on 64-bit span hashes — the scale choice the
# operator documents — so a hash collision at sf0.01 (~23k spans,
# P ~ 2^-35) would surface here as a diff.
_SPAN_DEDUP_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS t
  FROM documents
), docs AS (
  SELECT doc_id, t, len(t) AS n FROM toks
), spans AS (
  SELECT doc_id, i, array_to_string(list_slice(t, i, i + {_K} - 1), chr(31)) AS span
  FROM (SELECT doc_id, t, unnest(generate_series(1, n - {_K} + 1)) AS i
        FROM docs WHERE n >= {_K})
), dup AS (
  SELECT span FROM spans GROUP BY span HAVING count(*) >= 2
), dup_starts AS (
  SELECT s.doc_id, s.i FROM spans s JOIN dup USING (span)
), tokpos AS (
  SELECT doc_id, j, t[j] AS tok
  FROM (SELECT doc_id, t, unnest(generate_series(1, n)) AS j FROM docs)
), kept AS (
  SELECT doc_id, j, tok FROM tokpos p
  WHERE NOT EXISTS (
    SELECT 1 FROM dup_starts d
    WHERE d.doc_id = p.doc_id AND d.i <= p.j AND p.j < d.i + {_K}
  )
)
SELECT d.doc_id,
       coalesce((SELECT string_agg(tok, ' ' ORDER BY j)
                 FROM kept x WHERE x.doc_id = d.doc_id), '') AS text_clean,
       cast(d.n AS BIGINT) AS n_tokens,
       cast(d.n - (SELECT count(*) FROM kept x WHERE x.doc_id = d.doc_id)
            AS BIGINT) AS n_removed
FROM docs d
"""


@register_extended(  # rotated out of the gate in r11 (4 rounds hash-green)
    "documents_span_dedup", oracle=_SPAN_DEDUP_ORACLE, tags=("pipeline", "dedup"),
    bench=True,  # r9 anchor
)
def documents_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    out = remove_duplicated_spans(docs, id_col="doc_id", text_col="text", k=_K)
    return out.select(
        "doc_id",
        "text_clean",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_removed").cast("long").alias("n_removed"),
    )


# ---------------------------------------------------------------------------
# Graph analytics over a derived co-supply graph: suppliers are linked
# when they co-supply >= _MIN_COSUPPLY distinct orders — the threshold
# keeps edges statistically meaningful AND keeps the graph sparse (the
# unthresholded version converges to a complete graph as |orders| grows,
# which no triangle algorithm survives: density, not skew, is the
# scale hazard there). Tagged union: ('triangles', 0, count) +
# ('degree_hist', degree, n_vertices).
# ---------------------------------------------------------------------------

_MIN_COSUPPLY = 5

_TRIANGLE_ORACLE = f"""
WITH pairs AS (
  SELECT least(a.l_suppkey, b.l_suppkey) AS u,
         greatest(a.l_suppkey, b.l_suppkey) AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
  GROUP BY 1, 2
  HAVING count(DISTINCT a.l_orderkey) >= {_MIN_COSUPPLY}
), tri AS (
  SELECT count(*) AS c
  FROM pairs e1
  JOIN pairs e2 ON e2.u = e1.u AND e2.v > e1.v
  JOIN pairs e3 ON e3.u = e1.v AND e3.v = e2.v
), deg AS (
  SELECT n, count(*) AS degree FROM (
    SELECT u AS n FROM pairs UNION ALL SELECT v AS n FROM pairs
  ) GROUP BY n
)
SELECT 'triangles' AS tag, 0 AS k, cast(c AS BIGINT) AS v FROM tri
UNION ALL
SELECT 'degree_hist' AS tag, cast(degree AS INT) AS k, cast(count(*) AS BIGINT) AS v
FROM deg GROUP BY degree
"""


@register_extended(
    "suppliers_cosupply_graph", oracle=_TRIANGLE_ORACLE, tags=("graph",)
)
def suppliers_cosupply_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iot_sensor_data_pipeline_spark.operators.graph import (
        degree_histogram,
        triangle_count,
    )

    from iot_sensor_data_pipeline_spark.operators.itemsets import (
        basket_items,
        pair_structs,
    )

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    # per-order supplier SET first (one shuffle of the fact table),
    # then array-side pair expansion — beats the lineitem self-join +
    # countDistinct formulation (no second fact shuffle, pairs are
    # order-distinct by construction so a plain count(*) counts orders).
    # Shares the itemsets module's expansion helper — same dataflow.
    per_order = basket_items(li, "l_orderkey", "l_suppkey")
    edges = (
        per_order.select(F.explode(pair_structs()).alias("p"))
        .groupBy(F.col("p.a").alias("src"), F.col("p.b").alias("dst"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .where(F.col("n_orders") >= _MIN_COSUPPLY)
        .select("src", "dst")
        # consumed three times downstream (degrees, orientation,
        # histogram); checkpoint so the derivation runs once. The
        # sorted-set pair expansion already emits canonical u < v
        # edges exactly once, so both consumers skip the
        # canonicalization dedup shuffle.
        .localCheckpoint()
    )
    tri = triangle_count(edges, assume_canonical=True).select(
        F.lit("triangles").alias("tag"),
        F.lit(0).alias("k"),
        F.col("n_triangles").cast("long").alias("v"),
    )
    hist = degree_histogram(edges, assume_canonical=True).select(
        F.lit("degree_hist").alias("tag"),
        F.col("degree").cast("int").alias("k"),
        F.col("n_vertices").cast("long").alias("v"),
    )
    return tri.unionAll(hist)


# ---------------------------------------------------------------------------
# Interval x interval overlap join: 3-day activity windows of urgent
# orders overlapping those of low-priority orders, counted per year.
# Epochs derive TZ-independently on both engines (see the module note
# in queries_analytics.py).
# ---------------------------------------------------------------------------

_WINDOW_S = 259200  # 3 days

_OVERLAP_ORACLE = f"""
WITH u AS (
  SELECT epoch_us(o_orderdate) / 1000000.0 AS u_lo,
         epoch_us(o_orderdate) / 1000000.0 + {_WINDOW_S} AS u_hi,
         year(o_orderdate) AS u_year
  FROM orders WHERE o_orderpriority = '1-URGENT'
), l AS (
  SELECT epoch_us(o_orderdate) / 1000000.0 AS l_lo,
         epoch_us(o_orderdate) / 1000000.0 + {_WINDOW_S} AS l_hi
  FROM orders WHERE o_orderpriority = '5-LOW'
)
SELECT u_year, cast(count(*) AS BIGINT) AS n_overlaps
FROM u JOIN l ON u_lo < l_hi AND l_lo < u_hi
GROUP BY u_year
"""


@register_extended(
    "orders_window_overlap_join", oracle=_OVERLAP_ORACLE, tags=("join", "interval")
)
def orders_window_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iot_sensor_data_pipeline_spark.operators.joins import interval_overlap_join

    eps = (
        F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', o_orderdate)"
        )
        / F.lit(1000000.0)
    )
    orders = load_table(spark, sf_dir, "orders")
    urgent = orders.where(F.col("o_orderpriority") == "1-URGENT").select(
        eps.alias("u_lo"),
        (eps + _WINDOW_S).alias("u_hi"),
        F.year("o_orderdate").alias("u_year"),
    )
    low = orders.where(F.col("o_orderpriority") == "5-LOW").select(
        eps.alias("l_lo"), (eps + _WINDOW_S).alias("l_hi")
    )
    pairs = interval_overlap_join(
        urgent, low, "u_lo", "u_hi", "l_lo", "l_hi", bucket_width=float(_WINDOW_S)
    )
    return pairs.groupBy("u_year").agg(F.count(F.lit(1)).alias("n_overlaps"))


# ---------------------------------------------------------------------------
# n-gram LM self-perplexity (operators/ngram_lm.py): train on the
# documents table, score the same table — the CCNet-style quality
# signal. Constants appear as the same double expressions on both
# sides (0.4::DOUBLE * 0.4::DOUBLE folds to python's 0.4*0.4; a DECIMAL 0.16
# would NOT equal python's 0.4*0.4); divisions associate identically;
# avg_logprob rounds at 6, perplexity at 4.
# ---------------------------------------------------------------------------

_LM_ORACLE = r"""
WITH toks AS (
  SELECT doc_id,
         ['<s>', '<s>'] ||
         list_filter(string_split_regex(coalesce(text, ''), '\s+'), x -> x <> '')
         || ['</s>'] AS t
  FROM documents
), g1 AS (
  SELECT unnest(t) AS g FROM toks
), uni AS (
  SELECT g, count(*) AS c FROM g1 GROUP BY g
), g2 AS (
  SELECT array_to_string(list_slice(t, i, i + 1), ' ') AS g
  FROM (SELECT t, unnest(generate_series(1, len(t) - 1)) AS i FROM toks)
), bi AS (
  SELECT g, count(*) AS c FROM g2 GROUP BY g
), g3 AS (
  SELECT array_to_string(list_slice(t, i, i + 2), ' ') AS g
  FROM (SELECT t, unnest(generate_series(1, len(t) - 2)) AS i FROM toks)
), tri AS (
  SELECT g, count(*) AS c FROM g3 GROUP BY g
), total AS (
  SELECT sum(c) AS tt FROM uni WHERE g NOT IN ('<s>', '</s>')
), pos AS (
  SELECT doc_id,
         array_to_string(list_slice(t, i, i + 2), ' ') AS tri_g,
         array_to_string(list_slice(t, i, i + 1), ' ') AS ctx2_g,
         array_to_string(list_slice(t, i + 1, i + 2), ' ') AS bi_g,
         t[i + 1] AS ctx1_g,
         t[i + 2] AS uni_g
  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i FROM toks)
), scored AS (
  SELECT doc_id,
         ln(CASE
              WHEN t3.c IS NOT NULL AND c2.c IS NOT NULL THEN t3.c / c2.c
              WHEN b.c IS NOT NULL AND c1.c IS NOT NULL THEN 0.4::DOUBLE * b.c / c1.c
              WHEN u.c IS NOT NULL THEN 0.4::DOUBLE * 0.4::DOUBLE * u.c / total.tt
              ELSE 0.4::DOUBLE * 0.4::DOUBLE * 0.1::DOUBLE / total.tt
            END) AS lp
  FROM pos
  LEFT JOIN tri t3 ON t3.g = pos.tri_g
  LEFT JOIN bi  b  ON b.g = pos.bi_g
  LEFT JOIN bi  c2 ON c2.g = pos.ctx2_g
  LEFT JOIN uni u  ON u.g = pos.uni_g
  LEFT JOIN uni c1 ON c1.g = pos.ctx1_g
  CROSS JOIN total
)
SELECT doc_id,
       cast(count(*) AS BIGINT) AS n_scored,
       round(avg(lp), 6) AS avg_logprob,
       round(exp(-avg(lp)), 4) AS perplexity
FROM scored
GROUP BY doc_id
"""


@register_extended(
    "documents_lm_perplexity", oracle=_LM_ORACLE, tags=("pipeline", "quality")
)
def documents_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iot_sensor_data_pipeline_spark.operators.ngram_lm import (
        score_perplexity,
        train_ngram_lm,
    )

    docs = load_table(spark, sf_dir, "documents")
    lm = train_ngram_lm(docs)
    out = score_perplexity(docs, lm)
    return out.select(
        "doc_id",
        F.col("n_scored").cast("long").alias("n_scored"),
        F.round("avg_logprob", 6).alias("avg_logprob"),
        F.round("perplexity", 4).alias("perplexity"),
    )


# ---------------------------------------------------------------------------
# Market-basket association rules: parts co-ordered within an order.
# Ratios are identical-structure IEEE divisions on both engines, then
# rounded at 6.
# ---------------------------------------------------------------------------

_MIN_PAIR = 3

_RULES_ORACLE = f"""
WITH b AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), nb AS (
  SELECT count(DISTINCT l_orderkey) AS n FROM lineitem
), ic AS (
  SELECT l_partkey AS item, count(*) AS n_item FROM b GROUP BY 1
), pc AS (
  SELECT x.l_partkey AS pa, y.l_partkey AS pb, count(*) AS n_pair
  FROM b x JOIN b y
    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
  GROUP BY 1, 2
  HAVING count(*) >= {_MIN_PAIR}
), d AS (
  SELECT pa AS a, pb AS bb, n_pair FROM pc
  UNION ALL
  SELECT pb, pa, n_pair FROM pc
)
SELECT d.a AS antecedent, d.bb AS consequent,
       cast(d.n_pair AS BIGINT) AS n_pair,
       cast(ia.n_item AS BIGINT) AS n_antecedent,
       round(d.n_pair / nb.n, 6) AS support,
       round(d.n_pair / ia.n_item, 6) AS confidence,
       round((d.n_pair / nb.n) / ((ia.n_item / nb.n) * (ib.n_item / nb.n)), 6)
         AS lift
FROM d
JOIN ic ia ON ia.item = d.a
JOIN ic ib ON ib.item = d.bb
CROSS JOIN nb
"""


@register(
    "parts_association_rules", oracle=_RULES_ORACLE, tags=("analytics", "itemsets")
)
def parts_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iot_sensor_data_pipeline_spark.operators.itemsets import (
        pair_association_rules,
    )

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    out = pair_association_rules(li, "l_orderkey", "l_partkey", min_pair_count=_MIN_PAIR)
    return out.select(
        "antecedent",
        "consequent",
        "n_pair",
        "n_antecedent",
        F.round("support", 6).alias("support"),
        F.round("confidence", 6).alias("confidence"),
        F.round("lift", 6).alias("lift"),
    )


# ---------------------------------------------------------------------------
# Eval-set decontamination (operators/decontamination.py): eval set =
# every 7th doc, train = the rest; union of the drop-mode survivors
# ('kept', n=0) and the contamination evidence ('hits', n = matching
# k-gram windows per contaminated doc). DuckDB mirrors the algorithm on
# gram STRINGS (chr(31)-joined slices) vs Spark's 64-bit hashes — the
# span-dedup oracle convention.
# ---------------------------------------------------------------------------

_K_DECON = 6

_DECON_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(coalesce(text, ''), '\\s+'), x -> x <> '') AS t
  FROM documents
), tr AS (
  SELECT doc_id, t, len(t) AS n FROM toks WHERE doc_id % 7 <> 0
), ev AS (
  SELECT doc_id, t, len(t) AS n FROM toks WHERE doc_id % 7 = 0
), evg AS (
  SELECT DISTINCT array_to_string(list_slice(t, i, i + {_K_DECON} - 1), chr(31)) AS g
  FROM (SELECT t, unnest(generate_series(1, n - {_K_DECON} + 1)) AS i
        FROM ev WHERE n >= {_K_DECON})
), trg AS (
  SELECT doc_id, array_to_string(list_slice(t, i, i + {_K_DECON} - 1), chr(31)) AS g
  FROM (SELECT doc_id, t, unnest(generate_series(1, n - {_K_DECON} + 1)) AS i
        FROM tr WHERE n >= {_K_DECON})
), hits AS (
  SELECT doc_id, count(*) AS n FROM trg
  WHERE g IN (SELECT g FROM evg)
  GROUP BY doc_id
)
SELECT 'hits' AS branch, doc_id, cast(n AS BIGINT) AS n FROM hits
UNION ALL
SELECT 'kept' AS branch, doc_id, cast(0 AS BIGINT) AS n
FROM tr WHERE doc_id NOT IN (SELECT doc_id FROM hits)
"""


# moved INTO the driver gate in r08 (VERDICT r7 item 3)
@register(
    "documents_decontaminate", oracle=_DECON_ORACLE, tags=("pipeline", "dedup"),
    bench=True,  # r9 anchor
)
def documents_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iot_sensor_data_pipeline_spark.operators.decontamination import (
        contaminated_spans,
        decontaminate,
    )

    docs = load_table(spark, sf_dir, "documents")
    train = docs.where(F.col("doc_id") % 7 != 0)
    eval_docs = docs.where(F.col("doc_id") % 7 == 0)
    # ONE span scan feeds both branches (checkpointed — the kept branch
    # and the hit audit would otherwise each replay the k-gram explode)
    hits_rel = contaminated_spans(train, eval_docs, k=_K_DECON).localCheckpoint(
        eager=False
    )
    kept = decontaminate(
        train, eval_docs, k=_K_DECON, mode="drop", hits=hits_rel
    ).select(
        F.lit("kept").alias("branch"),
        "doc_id",
        F.lit(0).cast("long").alias("n"),
    )
    hits = (
        hits_rel.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("hits").alias("branch"), "doc_id", F.col("n"))
    )
    return hits.unionByName(kept)



# ---------------------------------------------------------------------------
# Data mixing (operators/curation.py): one query oracle-stamps the
# whole mixing family — weighted_mix (md5 bucket variant, engine-exact
# by construction), token_budget_sample (md5-order prefix), and
# mixture_report (achieved-vs-target accounting incl. an under-filled
# and a zero budget). DuckDB mirrors the md5 bucket arithmetic and the
# cumulative-window prefix exactly.
# ---------------------------------------------------------------------------

_MIX_RATES = {"src0": 0.5, "src1": 0.25, "src2": 0.0}
_MIX_DEFAULT = 0.8
#: src3's budget exceeds its corpus (fill_ratio < 1 surfaces the
#: shortfall); src4's zero budget keeps nothing but still reports
_MIX_BUDGETS = {"src0": 3000, "src1": 1500, "src3": 100_000, "src4": 0}

_MIX_RATE_CASE = "CASE source " + " ".join(
    f"WHEN '{s}' THEN {int(round(r * 1_000_000))}" for s, r in _MIX_RATES.items()
) + f" ELSE {int(round(_MIX_DEFAULT * 1_000_000))} END"
_MIX_BUDGET_CASE = "CASE source " + " ".join(
    f"WHEN '{s}' THEN {b}" for s, b in _MIX_BUDGETS.items()
) + " ELSE NULL END"
_MIX_TARGET_VALUES = ", ".join(f"('{s}', {b})" for s, b in _MIX_BUDGETS.items())

_MIXING_ORACLE = f"""
WITH mixb AS (
  SELECT doc_id, source, n_chars,
         cast(trunc(cast(('0x' || substr(md5(source || ':' || cast(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
              * 1000000 / 4294967296.0) AS BIGINT) AS b
  FROM documents
), mix AS (
  SELECT 'mix' AS branch, source, doc_id, cast(n_chars AS DOUBLE) AS n
  FROM mixb WHERE b < {_MIX_RATE_CASE}
), ordered AS (
  SELECT doc_id, source, n_chars,
         cast(coalesce(sum(n_chars) OVER (
           PARTITION BY source
           ORDER BY md5(cast(doc_id AS VARCHAR)), doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cum_before,
         {_MIX_BUDGET_CASE} AS budget
  FROM documents
), kept AS (
  SELECT * FROM ordered WHERE cum_before < budget
), targets(source, target_tokens) AS (VALUES {_MIX_TARGET_VALUES}),
achieved AS (
  SELECT source, cast(sum(n_chars) AS BIGINT) AS a_tok, count(*) AS a_docs
  FROM kept GROUP BY source
), rep AS (
  SELECT t.source, t.target_tokens,
         coalesce(a.a_tok, 0) AS a_tok, coalesce(a.a_docs, 0) AS a_docs,
         round(coalesce(a.a_tok, 0) / greatest(t.target_tokens, 1), 6) AS fill
  FROM targets t LEFT JOIN achieved a USING (source)
)
SELECT branch, source, doc_id, n FROM mix
UNION ALL
SELECT 'budget', source, doc_id, cast(cum_before AS DOUBLE) FROM kept
UNION ALL
SELECT 'report_target', source, cast(NULL AS BIGINT), cast(target_tokens AS DOUBLE) FROM rep
UNION ALL
SELECT 'report_achieved', source, cast(NULL AS BIGINT), cast(a_tok AS DOUBLE) FROM rep
UNION ALL
SELECT 'report_docs', source, cast(NULL AS BIGINT), cast(a_docs AS DOUBLE) FROM rep
UNION ALL
SELECT 'report_fill', source, cast(NULL AS BIGINT), fill FROM rep
"""


# in the driver gate from birth (r08): the mixing family's first
# independent CORRECTNESS stamp
@register(
    "documents_data_mixing", oracle=_MIXING_ORACLE, tags=("pipeline", "mixing")
)
def documents_data_mixing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iot_sensor_data_pipeline_spark.operators.curation import (
        md5_mix_bucket_expr,
        mixture_report,
        token_budget_sample,
        weighted_mix,
    )

    docs = load_table(spark, sf_dir, "documents")
    null_id = F.lit(None).cast("long")

    mix = weighted_mix(
        docs,
        "source",
        _MIX_RATES,
        id_col="doc_id",
        default_rate=_MIX_DEFAULT,
        bucket_expr=md5_mix_bucket_expr("source", "doc_id"),
    ).select(
        F.lit("mix").alias("branch"),
        "source",
        "doc_id",
        F.col("n_chars").cast("double").alias("n"),
    )

    sampled = token_budget_sample(
        docs, "source", _MIX_BUDGETS, id_col="doc_id", tokens_col="n_chars"
    )
    budget = sampled.select(
        F.lit("budget").alias("branch"),
        "source",
        "doc_id",
        F.col("cum_before").cast("double").alias("n"),
    )

    rep = mixture_report(sampled, "source", _MIX_BUDGETS, "n_chars")
    rep_rows = None
    for br, col in [
        ("report_target", F.col("target_tokens").cast("double")),
        ("report_achieved", F.col("achieved_tokens").cast("double")),
        ("report_docs", F.col("achieved_docs").cast("double")),
        ("report_fill", F.col("fill_ratio")),
    ]:
        part = rep.select(
            F.lit(br).alias("branch"), "source", null_id.alias("doc_id"),
            col.alias("n"),
        )
        rep_rows = part if rep_rows is None else rep_rows.unionByName(part)

    return mix.unionByName(budget).unionByName(rep_rows)


# ---------------------------------------------------------------------------
# Weighted sampling (Efraimidis-Spirakis over md5-derived uniforms):
# length-proportional document draw, engine-exact by the same md5
# arithmetic as documents_data_mixing.
# ---------------------------------------------------------------------------

_WS_N = 100

_WSAMPLE_ORACLE = f"""
SELECT doc_id, source, n_chars FROM (
  SELECT doc_id, source, n_chars,
         ln((cast(trunc(cast(('0x' || substr(md5(cast(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
             * 1000000 / 4294967296.0) AS BIGINT) + 0.5) / 1000000.0) / n_chars AS k
  FROM documents WHERE n_chars > 0
) ORDER BY k DESC, doc_id LIMIT {_WS_N}
"""


@register_extended(
    "documents_weighted_sample", oracle=_WSAMPLE_ORACLE, tags=("pipeline", "mixing")
)
def documents_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-proportional sample of {_WS_N} documents
    (operators/curation.py:weighted_sample_exact)."""
    from iot_sensor_data_pipeline_spark.operators.curation import (
        weighted_sample_exact,
    )

    docs = load_table(spark, sf_dir, "documents")
    return weighted_sample_exact(docs, "n_chars", _WS_N, "doc_id").select(
        "doc_id", "source", "n_chars"
    )


# ---------------------------------------------------------------------------
# Snapshot diff (operators/merge.py:snapshot_diff): corpus-versioning
# audit. A deterministic "next crawl" is constructed in-query (drop
# doc_id%17, mutate text of doc_id%13, add doc_id%29 under shifted
# ids) so Spark and DuckDB diff identical snapshot pairs.
# ---------------------------------------------------------------------------

_SNAPSHOT_DIFF_ORACLE = """
WITH newt AS (
  SELECT doc_id,
         CASE WHEN doc_id % 13 = 0 THEN text || 'X' ELSE text END AS text
  FROM documents WHERE doc_id % 17 <> 0
  UNION ALL
  SELECT doc_id + 10000000, text FROM documents WHERE doc_id % 29 = 0
)
SELECT COALESCE(n.doc_id, o.doc_id) AS doc_id,
       CASE WHEN o.doc_id IS NULL THEN 'added'
            WHEN n.doc_id IS NULL THEN 'removed'
            WHEN o.text IS NOT DISTINCT FROM n.text THEN 'unchanged'
            ELSE 'changed' END AS change
FROM documents o FULL OUTER JOIN newt n ON o.doc_id = n.doc_id
WHERE NOT (o.doc_id IS NOT NULL AND n.doc_id IS NOT NULL
           AND o.text IS NOT DISTINCT FROM n.text)
"""


# rotated INTO the driver gate in r08
@register(
    "documents_snapshot_diff",
    oracle=_SNAPSHOT_DIFF_ORACLE,
    tags=("pipeline", "versioning"),
)
def documents_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level added/removed/changed audit between two corpus
    versions — one full-outer join on the id, null-safe column
    compare; co-located (zero shuffle) when snapshots are bucketed."""
    from iot_sensor_data_pipeline_spark.operators.merge import snapshot_diff

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = docs.where(F.col("doc_id") % 17 != 0)
    mutated = base.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 13 == 0, F.concat(F.col("text"), F.lit("X"))
        ).otherwise(F.col("text")),
    )
    added = docs.where(F.col("doc_id") % 29 == 0).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
    )
    new = mutated.unionByName(added)
    return snapshot_diff(docs, new, ["doc_id"], ["text"])


# ---------------------------------------------------------------------------
# Domain-level curation (operators/curation.py domain_stats /
# filter_by_domain_stats): per-source n_docs / total_chars /
# mean_quality / intra-domain dup_rate, plus the kept flag at a
# quality threshold chosen inside a wide inter-domain gap at both SFs
# (0.195) so float summation-order differences can never flip it.
# ---------------------------------------------------------------------------

_DOMAIN_MIN_QUALITY = 0.195


def _en_stopword_list_sql() -> str:
    from iot_sensor_data_pipeline_spark.functions.text import STOPWORDS

    return ", ".join(f"'{w}'" for w in STOPWORDS["en"])


def _domain_oracle() -> str:
    return f"""
WITH base AS (
  SELECT source AS domain, text,
         list_filter(string_split(text, ' '), t -> t != '') AS toks,
         length(text) AS n_chars,
         md5(trim(regexp_replace(regexp_replace(regexp_replace(lower(text),
             '[0-9]', '0', 'g'), '[^a-z0\\s]', ' ', 'g'), '\\s+', ' ', 'g'))) AS fp
  FROM documents
), scored AS (
  SELECT domain, fp, n_chars,
    (least(len(toks), 200) / 200.0)
    * (1 - (n_chars - length(regexp_replace(text, '[.,!?;:]', '', 'g'))) * 1.0 / nullif(n_chars, 0))
    * (1 - (n_chars - length(regexp_replace(text, '[0-9]', '', 'g'))) * 1.0 / nullif(n_chars, 0))
    * (0.5 + 0.5 * (least(len(list_filter(toks, t -> t IN ({_en_stopword_list_sql()}))), 10) / 10.0)) AS q
  FROM base
), per_fp AS (
  SELECT domain, fp, count(*) AS c, sum(n_chars) AS chars, sum(q) AS q
  FROM scored GROUP BY 1, 2
), stats AS (
  SELECT domain, sum(c) AS n_docs, sum(chars) AS total_chars,
         round(sum(q) / sum(c), 6) AS mean_quality,
         round(sum(CASE WHEN c > 1 THEN c ELSE 0 END) * 1.0 / sum(c), 6) AS dup_rate
  FROM per_fp GROUP BY 1
)
SELECT domain, n_docs, total_chars, mean_quality, dup_rate,
       CASE WHEN mean_quality >= {_DOMAIN_MIN_QUALITY} THEN 1 ELSE 0 END AS kept
FROM stats
"""


@register_extended(
    "documents_domain_curation",
    oracle=_domain_oracle(),
    tags=("pipeline", "curation", "domain"),
)
def documents_domain_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-grain curation report: per-source doc count, char
    volume, mean quality-heuristic score, intra-domain normalized-
    fingerprint dup rate, and whether filter_by_domain_stats would
    keep the domain at mean_quality >= 0.195 — the aggregation level
    web-corpus pipelines (C4, RefinedWeb, Gopher) actually filter at."""
    from iot_sensor_data_pipeline_spark.operators.curation import domain_stats

    docs = load_table(spark, sf_dir, "documents")
    stats = domain_stats(docs, domain_col="source", text_col="text")
    return stats.select(
        "domain",
        "n_docs",
        "total_chars",
        "mean_quality",
        "dup_rate",
        (F.col("mean_quality") >= _DOMAIN_MIN_QUALITY).cast("int").alias("kept"),
    )


# ---------------------------------------------------------------------------
# Retrieval-quality metrics (operators/ranking.py ranking_metrics_report)
# over the exact kNN ranking, judged by label agreement: every 50th
# vector queries the corpus, a neighbor is relevant iff it shares the
# query's label. Both engines rank by the 6dp-rounded cosine with nid
# tie-break (the cosine_topk contract), so ranks — and therefore DCG —
# are engine-identical before the final rounding.
# ---------------------------------------------------------------------------

_RANKMETRICS_K = 10

_RANKMETRICS_ORACLE = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb, label FROM embeddings
), q AS (
  SELECT * FROM e WHERE vec_id % 50 = 0
), pairs AS (
  SELECT q.vec_id AS qid, c.vec_id AS nid,
         round(list_dot_product(q.emb, c.emb)
               / (sqrt(list_dot_product(q.emb, q.emb))
                  * sqrt(list_dot_product(c.emb, c.emb))), 6) AS score
  FROM q CROSS JOIN e c
  WHERE q.vec_id != c.vec_id
), res AS (
  SELECT qid, nid, rn FROM (
    SELECT *, row_number() OVER (PARTITION BY qid ORDER BY score DESC, nid) AS rn
    FROM pairs
  ) WHERE rn <= {_RANKMETRICS_K}
), rel AS (
  SELECT q.vec_id AS qid, c.vec_id AS nid, 1.0 AS rel
  FROM q JOIN e c ON q.label = c.label AND q.vec_id != c.vec_id
), j AS (
  SELECT r.qid, r.rn, coalesce(v.rel, 0.0) AS rel
  FROM res r LEFT JOIN rel v USING (qid, nid)
), got AS (
  SELECT qid,
         min(CASE WHEN rel > 0 THEN rn END) AS first_hit,
         sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS hits,
         sum(rel / log2(rn + 1)) AS dcg
  FROM j GROUP BY 1
), ideal AS (
  SELECT qid, count(*) AS n_rel,
         sum(CASE WHEN ir <= {_RANKMETRICS_K} THEN rel / log2(ir + 1) ELSE 0 END) AS idcg
  FROM (
    SELECT qid, nid, rel,
           row_number() OVER (PARTITION BY qid ORDER BY rel DESC, nid) AS ir
    FROM rel
  ) GROUP BY 1
)
SELECT got.qid AS qid,
       round(coalesce(1.0 / first_hit, 0.0), 6) AS rr,
       round(hits / {_RANKMETRICS_K}.0, 6) AS precision_at_k,
       round(hits * 1.0 / n_rel, 6) AS recall_at_k,
       round(dcg / idcg, 6) AS ndcg_at_k
FROM got LEFT JOIN ideal USING (qid)
"""


@register_extended(
    "embeddings_ranking_metrics",
    oracle=_RANKMETRICS_ORACLE,
    tags=("pipeline", "similarity", "evaluation"),
)
def embeddings_ranking_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RR / precision@10 / recall@10 / NDCG@10 per query over the
    exact cosine ranking, relevance = label agreement
    (operators/ranking.py:ranking_metrics_report)."""
    from iot_sensor_data_pipeline_spark.operators.ranking import (
        ranking_metrics_report,
    )
    from iot_sensor_data_pipeline_spark.operators.similarity import cosine_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 50 == 0)
    results = cosine_topk(queries, emb, k=_RANKMETRICS_K)
    relevance = (
        queries.select(F.col("vec_id").alias("qid"), "label")
        .join(
            emb.select(F.col("vec_id").alias("nid"), F.col("label").alias("__l")),
            F.col("label") == F.col("__l"),
        )
        .where(F.col("qid") != F.col("nid"))
        .select("qid", "nid", F.lit(1.0).alias("rel"))
    )
    return ranking_metrics_report(results, relevance, k=_RANKMETRICS_K)


# ---------------------------------------------------------------------------
# Epoch shuffle (operators/curation.py epoch_shuffle): the exact global
# training order for two epochs/seeds. Both engines order by
# md5(seed || ':' || doc_id) with the id as the collision tie-break, so
# positions are engine-identical; Spark computes them with the
# range-partition + broadcast-offsets machinery (no single-partition
# sort), the oracle with a plain window.
# ---------------------------------------------------------------------------


def _epoch_shuffle_oracle_branch(seed: int) -> str:
    return f"""
SELECT {seed} AS seed, doc_id,
       CAST(row_number() OVER (
         ORDER BY md5('{seed}:' || CAST(doc_id AS VARCHAR)), doc_id
       ) AS BIGINT) AS shuffle_pos
FROM documents"""


_EPOCH_SHUFFLE_ORACLE = (
    _epoch_shuffle_oracle_branch(1) + "\nUNION ALL" + _epoch_shuffle_oracle_branch(2)
)


@register(
    "documents_epoch_shuffle",
    oracle=_EPOCH_SHUFFLE_ORACLE,
    tags=("pipeline", "curation", "loader"),
)
def documents_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible epoch-shuffle positions for seeds 1 and 2 — every
    engine (and every loader worker) agrees on position i's document,
    and the two seeds are different permutations of the same corpus."""
    from iot_sensor_data_pipeline_spark.operators.curation import epoch_shuffle

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def branch(seed):
        return epoch_shuffle(docs, seed).select(
            F.lit(seed).alias("seed"), "doc_id", "shuffle_pos"
        )

    return branch(1).unionByName(branch(2))


# ---------------------------------------------------------------------------
# As-of join direction variants (operators/joins.py asof_join): the
# pandas merge_asof surface — forward, nearest (backward ties), and a
# tolerance-bounded backward — over the same errors-vs-purchases
# relations as the driver gate's events_asof_join. DuckDB expresses
# forward as ASOF with the inequality flipped and nearest/tolerance by
# composing the two ASOF passes; both engines run on numeric epoch
# seconds so distances are plain arithmetic.
# ---------------------------------------------------------------------------

_ASOF_TOL_S = 600

_ASOF_DIRECTIONS_ORACLE = f"""
WITH e AS (
  SELECT event_id, user_id, epoch_us(ts) / 1000000.0 AS t
  FROM events WHERE event_type = 'error'
), p AS (
  SELECT user_id, epoch_us(ts) / 1000000.0 AS pt, value AS pv
  FROM events WHERE event_type = 'purchase'
), bwd AS (
  SELECT e.event_id, e.user_id, e.t, p.pt AS b_ts, p.pv AS b_v
  FROM e ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.t >= p.pt
), fwd AS (
  SELECT e.event_id, p.pt AS f_ts, p.pv AS f_v
  FROM e ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.t <= p.pt
)
SELECT b.event_id, b.user_id, round(b.t, 6) AS t,
       round(f.f_ts, 6) AS fwd_ts, f.f_v AS fwd_value,
       round(CASE WHEN b.b_ts IS NULL THEN f.f_ts
                  WHEN f.f_ts IS NULL THEN b.b_ts
                  WHEN (b.t - b.b_ts) <= (f.f_ts - b.t) THEN b.b_ts
                  ELSE f.f_ts END, 6) AS near_ts,
       CASE WHEN b.b_ts IS NULL THEN f.f_v
            WHEN f.f_ts IS NULL THEN b.b_v
            WHEN (b.t - b.b_ts) <= (f.f_ts - b.t) THEN b.b_v
            ELSE f.f_v END AS near_value,
       round(CASE WHEN b.t - b.b_ts <= {_ASOF_TOL_S} THEN b.b_ts END, 6) AS tol_ts,
       CASE WHEN b.t - b.b_ts <= {_ASOF_TOL_S} THEN b.b_v END AS tol_value
FROM bwd b JOIN fwd f USING (event_id)
"""


@register_extended(
    "events_asof_directions",
    oracle=_ASOF_DIRECTIONS_ORACLE,
    tags=("relational", "asof"),
)
def events_asof_directions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward / nearest / tolerance-bounded as-of joins over the gate
    query's errors-vs-purchases relations (operators/joins.py
    asof_join direction + tolerance parameters)."""
    from iot_sensor_data_pipeline_spark.operators.joins import asof_join

    events = load_table(spark, sf_dir, "events")
    epoch = (
        F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        )
        / F.lit(1000000.0)
    )
    errors = events.where(F.col("event_type") == "error").select(
        "event_id", "user_id", epoch.alias("t")
    )
    purchases = events.where(F.col("event_type") == "purchase").select(
        "user_id", epoch.alias("pt"), F.col("value").alias("pv")
    )

    def run(**kw):
        return asof_join(
            errors, purchases, on=["user_id"], left_ts="t", right_ts="pt",
            right_vals=["pt", "pv"], **kw
        )

    fwd = run(direction="forward").select(
        "event_id", "user_id", F.round("t", 6).alias("t"),
        F.round("pt", 6).alias("fwd_ts"), F.col("pv").alias("fwd_value"),
    )
    near = run(direction="nearest").select(
        "event_id",
        F.round("pt", 6).alias("near_ts"), F.col("pv").alias("near_value"),
    )
    tol = run(tolerance=float(_ASOF_TOL_S)).select(
        "event_id",
        F.round("pt", 6).alias("tol_ts"), F.col("pv").alias("tol_value"),
    )
    return fwd.join(near, "event_id").join(tol, "event_id")


# ---------------------------------------------------------------------------
# CDC apply (operators/merge.py apply_cdc): a deterministic change log
# derived from orders — seq-1 updates (%7), seq-2 updates (%11), seq-2
# deletes (%13, beating same-seq updates on %143 keys), inserts of the
# held-out %5 keys — applied to the %5-withheld base snapshot. Both
# engines rank the log with the identical (seq DESC, is_delete DESC)
# window; the (key, seq, is_delete) triple is unique by construction.
# ---------------------------------------------------------------------------

_CDC_ORACLE = """
WITH base AS (
  SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders WHERE o_orderkey % 5 != 0
), log AS (
  SELECT o_orderkey, o_totalprice + 100 AS o_totalprice, 'U' AS o_orderstatus,
         'update' AS op, 1 AS seq
  FROM orders WHERE o_orderkey % 7 = 0 AND o_orderkey % 5 != 0
  UNION ALL
  SELECT o_orderkey, o_totalprice + 200, 'V', 'update', 2
  FROM orders WHERE o_orderkey % 11 = 0 AND o_orderkey % 5 != 0
  UNION ALL
  SELECT o_orderkey, NULL, NULL, 'delete', 2
  FROM orders WHERE o_orderkey % 13 = 0 AND o_orderkey % 5 != 0
  UNION ALL
  SELECT o_orderkey, o_totalprice, 'I', 'insert', 1
  FROM orders WHERE o_orderkey % 5 = 0
), latest AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
      PARTITION BY o_orderkey
      ORDER BY seq DESC, CASE WHEN op = 'delete' THEN 1 ELSE 0 END DESC
    ) AS rn
    FROM log
  ) WHERE rn = 1
)
SELECT o_orderkey, o_totalprice, o_orderstatus
FROM base WHERE o_orderkey NOT IN (SELECT o_orderkey FROM latest)
UNION ALL
SELECT o_orderkey, o_totalprice, o_orderstatus
FROM latest WHERE op != 'delete'
"""


@register(
    "orders_cdc_apply",
    oracle=_CDC_ORACLE,
    tags=("relational", "merge", "cdc"),
)
def orders_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debezium-shaped change-log application: latest op per key wins,
    same-seq deletes beat updates, inserts add held-out keys
    (operators/merge.py:apply_cdc)."""
    from iot_sensor_data_pipeline_spark.operators.merge import apply_cdc

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    base = orders.where(F.col("o_orderkey") % 5 != 0)
    in_base = F.col("o_orderkey") % 5 != 0

    def log(cond, price, status, op, seq):
        return orders.where(cond).select(
            "o_orderkey",
            price.alias("o_totalprice"),
            status.alias("o_orderstatus"),
            F.lit(op).alias("op"),
            F.lit(seq).alias("seq"),
        )

    changes = (
        log((F.col("o_orderkey") % 7 == 0) & in_base,
            F.col("o_totalprice") + 100, F.lit("U"), "update", 1)
        .unionByName(
            log((F.col("o_orderkey") % 11 == 0) & in_base,
                F.col("o_totalprice") + 200, F.lit("V"), "update", 2))
        .unionByName(
            log((F.col("o_orderkey") % 13 == 0) & in_base,
                F.lit(None).cast("double"), F.lit(None).cast("string"),
                "delete", 2))
        .unionByName(
            log(F.col("o_orderkey") % 5 == 0,
                F.col("o_totalprice"), F.lit("I"), "insert", 1))
    )
    return apply_cdc(base, changes, ["o_orderkey"], "seq")


# ---------------------------------------------------------------------------
# Curriculum quality deciles: EXACT global decile of the shared
# quality heuristic per document — the ordering-tier assignment
# curriculum schedules train from. Spark computes the rank with the
# scale-safe machinery (range partition + broadcast offsets + ntile
# arithmetic — no single-partition window anywhere); the oracle uses a
# plain ntile. Both rank by (round(quality, 6), doc_id) so the order
# is engine-identical by construction.
# ---------------------------------------------------------------------------


def _quality_sql() -> str:
    return f"""
  SELECT doc_id,
    round(
      (least(len(toks), 200) / 200.0)
      * (1 - (n_chars - length(regexp_replace(text, '[.,!?;:]', '', 'g'))) * 1.0 / nullif(n_chars, 0))
      * (1 - (n_chars - length(regexp_replace(text, '[0-9]', '', 'g'))) * 1.0 / nullif(n_chars, 0))
      * (0.5 + 0.5 * (least(len(list_filter(toks, t -> t IN ({_en_stopword_list_sql()}))), 10) / 10.0)),
      6) AS q6
  FROM (
    SELECT doc_id, text,
           list_filter(string_split(text, ' '), t -> t != '') AS toks,
           length(text) AS n_chars
    FROM documents
  )"""


def _deciles_oracle() -> str:
    return f"""
WITH scored AS ({_quality_sql()})
SELECT doc_id, q6,
       CAST(ntile(10) OVER (ORDER BY q6, doc_id) AS INT) AS decile
FROM scored
"""


@register(
    "documents_quality_deciles",
    oracle=_deciles_oracle(),
    tags=("pipeline", "curation", "curriculum"),
)
def documents_quality_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact global quality decile per document (curriculum tiers) —
    ranking.global_row_number + ntile arithmetic, no single-partition
    sort at any scale."""
    from iot_sensor_data_pipeline_spark.functions.text import quality_score
    from iot_sensor_data_pipeline_spark.operators.ranking import (
        global_row_number,
        ntile_from_rank,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.round(quality_score(F.col("text")), 6).alias("q6")
    )
    ranked, n = global_row_number(
        docs, [F.col("q6"), F.col("doc_id")], out_col="__rank", return_count=True
    )
    return ranked.select(
        "doc_id",
        "q6",
        ntile_from_rank(F.col("__rank"), n, 10).alias("decile"),
    )


# ---------------------------------------------------------------------------
# Exact grouped quantiles (operators/sketches.py grouped_quantiles_exact)
# vs DuckDB's quantile_cont — same percentile_cont definition, computed
# rank-wise so no task ever buffers a whole group.
# ---------------------------------------------------------------------------

_QUANTILE_QS = (0.1, 0.25, 0.5, 0.75, 0.9, 0.99)

_QUANTILES_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT l_returnflag, {q} AS q,
       round(quantile_cont(l_extendedprice, {q}), 6) AS value
FROM lineitem GROUP BY l_returnflag"""
    for q in _QUANTILE_QS
)


@register_extended(  # rotated OUT of the gate in r12 (second r12 rotation: mutation flagships in)
    "lineitem_quantiles_exact",
    oracle=_QUANTILES_ORACLE,
    tags=("relational", "quantiles"),
)
def lineitem_quantiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentile_cont per return flag at six quantiles —
    rank-wise (partitioned window + neighbor-rank join), never a
    group-sized in-memory buffer."""
    from iot_sensor_data_pipeline_spark.operators.sketches import (
        grouped_quantiles_exact,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    return grouped_quantiles_exact(
        li, ["l_returnflag"], "l_extendedprice", list(_QUANTILE_QS)
    )


# ---------------------------------------------------------------------------
# BM25 ranked retrieval (r13) — the lexical half of the retrieval stack
# ---------------------------------------------------------------------------

_BM25_ORACLE = """
WITH d AS (
  SELECT doc_id,
         coalesce(list_filter(regexp_split_to_array(lower(text),
                  '[^a-z0-9]+'), x -> x <> ''), []) AS toks
  FROM documents
),
stats AS (SELECT count(*) AS n_docs, avg(len(toks)) AS avgdl FROM d),
post AS (
  SELECT t.term, d.doc_id, count(*) AS tf, len(d.toks) AS dl
  FROM d, unnest(d.toks) AS t(term)
  GROUP BY 1, 2, 4
),
q AS (SELECT * FROM (VALUES (1, 'spark window join'),
                            (2, 'slow merge sort batch'),
                            (3, 'customer table scan'))
      AS q(query_id, query_text)),
qt AS (
  SELECT query_id, t.term
  FROM q, unnest(list_distinct(list_filter(regexp_split_to_array(
           lower(query_text), '[^a-z0-9]+'), x -> x <> ''))) AS t(term)
),
m AS (SELECT p.* FROM post p WHERE p.term IN (SELECT DISTINCT term FROM qt)),
dfreq AS (SELECT term, count(*) AS df FROM m GROUP BY 1),
scored AS (
  SELECT qt.query_id, m.doc_id,
         round(sum( ln(1 + (s.n_docs - f.df + 0.5)/(f.df + 0.5))
               * m.tf * (1.2 + 1)
               / (m.tf + 1.2 * (1 - 0.75 + 0.75 * m.dl / s.avgdl)) ), 6)
           AS score
  FROM m JOIN dfreq f USING (term) JOIN qt USING (term) CROSS JOIN stats s
  GROUP BY 1, 2
)
SELECT query_id, doc_id, score,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY score DESC, doc_id) AS rn
FROM scored
QUALIFY rn <= 10
"""


@register_extended(
    "documents_bm25_topk", oracle=_BM25_ORACLE,
    tags=("pipeline", "retrieval", "bm25"),
    bench=True,  # r13 anchor: the retrieval family's wall-time trace
)
def documents_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 per query over the documents corpus
    (operators/retrieval.py, r13): inverted-index postings, broadcast
    query-term probe, Lucene-form idf, (score desc, doc_id) ranking on
    the ROUNDED score. The oracle re-derives the entire pipeline —
    portable tokenizer, df from the matched slice, identical BM25
    algebra — so a hash match pins tokenization, tf/df counting, the
    corpus stats, and the ranking contract cross-engine."""
    from iot_sensor_data_pipeline_spark.operators.retrieval import bm25_topk

    docs = load_table(spark, sf_dir, "documents")
    queries = spark.createDataFrame(
        [(1, "spark window join"), (2, "slow merge sort batch"),
         (3, "customer table scan")],
        "query_id int, query_text string",
    )
    return bm25_topk(docs, queries, k=10)


_HYBRID_RRF_ORACLE = """
WITH d AS (
  SELECT doc_id,
         coalesce(list_filter(regexp_split_to_array(lower(text),
                  '[^a-z0-9]+'), x -> x <> ''), []) AS toks
  FROM documents
),
stats AS (SELECT count(*) AS n_docs, avg(len(toks)) AS avgdl FROM d),
post AS (
  SELECT t.term, d.doc_id, count(*) AS tf, len(d.toks) AS dl
  FROM d, unnest(d.toks) AS t(term)
  GROUP BY 1, 2, 4
),
q AS (SELECT * FROM (VALUES (0, 'spark window join'),
                            (100, 'slow merge sort batch'),
                            (200, 'customer table scan'))
      AS q(query_id, query_text)),
qt AS (
  SELECT query_id, t.term
  FROM q, unnest(list_distinct(list_filter(regexp_split_to_array(
           lower(query_text), '[^a-z0-9]+'), x -> x <> ''))) AS t(term)
),
m AS (SELECT p.* FROM post p WHERE p.term IN (SELECT DISTINCT term FROM qt)),
dfreq AS (SELECT term, count(*) AS df FROM m GROUP BY 1),
bm25s AS (
  SELECT qt.query_id, m.doc_id,
         round(sum( ln(1 + (s.n_docs - f.df + 0.5)/(f.df + 0.5))
               * m.tf * (1.2 + 1)
               / (m.tf + 1.2 * (1 - 0.75 + 0.75 * m.dl / s.avgdl)) ), 6)
           AS score
  FROM m JOIN dfreq f USING (term) JOIN qt USING (term) CROSS JOIN stats s
  GROUP BY 1, 2
),
bm25r AS (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id) AS rn
  FROM bm25s QUALIFY rn <= 20
),
qv AS (
  SELECT q.query_id, e.embedding AS qvec
  FROM q JOIN embeddings e ON e.vec_id = q.query_id
),
coss AS (
  SELECT qv.query_id, e.vec_id AS doc_id,
         round(list_cosine_similarity(qv.qvec, e.embedding), 6) AS score
  FROM qv JOIN embeddings e ON e.vec_id <> qv.query_id
),
cosr AS (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id) AS rn
  FROM coss QUALIFY rn <= 20
),
unioned AS (
  SELECT * FROM bm25r UNION ALL SELECT * FROM cosr
),
fused AS (
  SELECT query_id, doc_id,
         round(sum(1.0 / (60 + rn)), 6) AS score,
         count(*) AS n_lists
  FROM unioned GROUP BY 1, 2
)
SELECT query_id, doc_id, score, CAST(n_lists AS BIGINT) AS n_lists,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY score DESC, doc_id) AS rn
FROM fused
QUALIFY rn <= 10
"""


@register_extended(
    "documents_hybrid_rrf", oracle=_HYBRID_RRF_ORACLE,
    tags=("pipeline", "retrieval", "hybrid", "rrf"),
)
def documents_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid search (r13): BM25 top-20 (lexical) and exact-cosine
    top-20 (dense, query vectors = the query docs' own embeddings)
    fused by Reciprocal Rank Fusion into a top-10 per query
    (operators/retrieval.py:rrf_fuse). The oracle re-derives BOTH
    rankers and the fusion in SQL (DuckDB list_cosine_similarity for
    the dense half), so a hash match pins the rank-grain fusion
    contract — RRF consumes ranks, not scores, which is exactly what
    makes heterogeneous rankers composable without calibration."""
    from iot_sensor_data_pipeline_spark.operators.retrieval import (
        bm25_topk,
        rrf_fuse,
    )
    from iot_sensor_data_pipeline_spark.operators.similarity import (
        cosine_topk,
    )

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    queries = spark.createDataFrame(
        [(0, "spark window join"), (100, "slow merge sort batch"),
         (200, "customer table scan")],
        "query_id int, query_text string",
    )
    lexical = bm25_topk(docs, queries, k=20)
    qvecs = emb.join(
        queries.select(F.col("query_id").alias("vec_id")), "vec_id"
    )
    dense = cosine_topk(qvecs, emb, k=20).select(
        F.col("qid").alias("query_id"), F.col("nid").alias("doc_id"), "rn"
    )
    return rrf_fuse([lexical, dense], k=10)


_BM25_INCR_ORACLE = """
WITH cur0 AS (
  SELECT doc_id, text FROM documents WHERE (n_chars < 150) IS NOT TRUE
),
cur1 AS (
  SELECT doc_id,
         CASE WHEN doc_id % 11 = 0 THEN 'spark spark ' || text
              ELSE text END AS text
  FROM cur0
),
cur AS (
  SELECT * FROM cur1
  UNION ALL
  SELECT doc_id + 20000000,
         'fresh retrieval document number ' || CAST(doc_id AS VARCHAR)
  FROM documents WHERE doc_id % 151 = 0
),
d AS (
  SELECT doc_id,
         coalesce(list_filter(regexp_split_to_array(lower(text),
                  '[^a-z0-9]+'), x -> x <> ''), []) AS toks
  FROM cur
),
stats AS (SELECT count(*) AS n_docs, avg(len(toks)) AS avgdl FROM d),
post AS (
  SELECT t.term, d.doc_id, count(*) AS tf, len(d.toks) AS dl
  FROM d, unnest(d.toks) AS t(term)
  GROUP BY 1, 2, 4
),
q AS (SELECT * FROM (VALUES (1, 'spark retrieval'),
                            (2, 'window merge batch'))
      AS q(query_id, query_text)),
qt AS (
  SELECT query_id, t.term
  FROM q, unnest(list_distinct(list_filter(regexp_split_to_array(
           lower(query_text), '[^a-z0-9]+'), x -> x <> ''))) AS t(term)
),
m AS (SELECT p.* FROM post p WHERE p.term IN (SELECT DISTINCT term FROM qt)),
dfreq AS (SELECT term, count(*) AS df FROM m GROUP BY 1),
scored AS (
  SELECT qt.query_id, m.doc_id,
         round(sum( ln(1 + (s.n_docs - f.df + 0.5)/(f.df + 0.5))
               * m.tf * (1.2 + 1)
               / (m.tf + 1.2 * (1 - 0.75 + 0.75 * m.dl / s.avgdl)) ), 6)
           AS score
  FROM m JOIN dfreq f USING (term) JOIN qt USING (term) CROSS JOIN stats s
  GROUP BY 1, 2
)
SELECT query_id, doc_id, score,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY score DESC, doc_id) AS rn
FROM scored
QUALIFY rn <= 10
"""


@register_extended(
    "documents_bm25_incremental", oracle=_BM25_INCR_ORACLE,
    tags=("pipeline", "retrieval", "bm25", "cdf", "ivm"),
)
def documents_bm25_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The retrieval layer joining the IVM story (r13): a scratch
    corpus copy takes a DELETE, a text UPDATE, and an inserting MERGE
    (all feed-carried); ``sync_inverted_index`` follows the feed at
    O(changed docs) — never re-tokenizing the corpus — and BM25 runs
    over the SYNCED index. The oracle recomputes BM25 from scratch over
    the relationally-composed mutation chain, so a hash match pins that
    the incrementally-maintained index is EXACTLY the rebuilt one,
    scores included, with DuckDB as the referee."""
    import tempfile

    from iot_sensor_data_pipeline_spark.operators.retrieval import (
        bm25_topk,
        build_inverted_index,
        sync_inverted_index,
    )
    from iot_sensor_data_pipeline_spark.sources.mutations import (
        delete_where,
        merge_into,
        update_where,
    )

    root = tempfile.mkdtemp(prefix="mutq_bm25i_")
    corpus, idx = f"{root}/corpus", f"{root}/idx"
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text",
                                                         "n_chars")
    docs.repartition(4).write.parquet(corpus)
    build_inverted_index(
        spark.read.parquet(corpus)
    ).write.parquet(idx)

    delete_where(spark, corpus, F.col("n_chars") < 150, change_feed=True)
    update_where(
        spark, corpus, F.col("doc_id") % 11 == 0,
        {"text": F.concat(F.lit("spark spark "), F.col("text"))},
        change_feed=True,
    )
    inserts = docs.where(F.col("doc_id") % 151 == 0).select(
        (F.col("doc_id") + F.lit(20_000_000)).alias("doc_id"),
        F.concat(
            F.lit("fresh retrieval document number "),
            F.col("doc_id").cast("string"),
        ).alias("text"),
    )
    merge_into(spark, corpus, inserts, on=["doc_id"], change_feed=True)
    sync_inverted_index(spark, corpus, idx)

    queries = spark.createDataFrame(
        [(1, "spark retrieval"), (2, "window merge batch")],
        "query_id int, query_text string",
    )
    return bm25_topk(
        spark.read.parquet(corpus), queries, k=10,
        index=spark.read.parquet(idx),
    )


_PHRASE_ORACLE = """
WITH d AS (
  SELECT doc_id,
         coalesce(list_filter(regexp_split_to_array(lower(text),
                  '[^a-z0-9]+'), x -> x <> ''), []) AS t
  FROM documents
),
p AS (SELECT * FROM (VALUES (1, 'batch batch batch'),
                            (2, 'the fast key'),
                            (3, 'merge part window'))
      AS p(phrase_id, phrase_text)),
pt AS (
  SELECT phrase_id,
         list_filter(regexp_split_to_array(lower(phrase_text),
                     '[^a-z0-9]+'), x -> x <> '') AS pt
  FROM p
),
hits AS (
  SELECT pt.phrase_id, d.doc_id,
         (SELECT count(*)
          FROM unnest(generate_series(1, len(d.t) - len(pt.pt) + 1))
            AS g(i)
          WHERE list_slice(d.t, g.i, g.i + len(pt.pt) - 1) = pt.pt) AS n
  FROM d CROSS JOIN pt
  WHERE len(d.t) >= len(pt.pt)
)
SELECT phrase_id, doc_id, CAST(n AS BIGINT) AS n_occurrences
FROM hits WHERE n > 0
"""


@register_extended(
    "documents_phrase_search", oracle=_PHRASE_ORACLE,
    tags=("pipeline", "retrieval", "phrase"),
)
def documents_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase occurrence counting (r13,
    operators/retrieval.py:phrase_search): the positional index joins
    the broadcast phrase tokens once, each match proposes an anchor
    (pos - i), and a (phrase, doc, anchor) group where every offset
    checked in is one occurrence — one plan for any phrase length,
    overlaps counted. The oracle re-derives occurrences by sliding
    list_slice comparison over the same portable tokens, so a hash
    match pins tokenization, the anchor algebra, and overlap
    semantics cross-engine — the verbatim-containment primitive
    decontamination forensics needs."""
    from iot_sensor_data_pipeline_spark.operators.retrieval import (
        phrase_search,
    )

    docs = load_table(spark, sf_dir, "documents")
    phrases = spark.createDataFrame(
        [(1, "batch batch batch"), (2, "the fast key"),
         (3, "merge part window")],
        "phrase_id int, phrase_text string",
    )
    return phrase_search(docs, phrases).select(
        "phrase_id", "doc_id",
        F.col("n_occurrences").cast("long").alias("n_occurrences"),
    )
