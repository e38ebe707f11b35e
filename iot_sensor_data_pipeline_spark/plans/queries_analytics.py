"""Behavioral / time-series / approximate-analytics queries for the
driver's CORRECTNESS gate — the round-5 operator families (funnels,
cohort retention, path analysis, heavy hitters, fuzzy join, rolling
z-score anomalies, z-normalized pattern top-k) promoted from
pytest-only DuckDB differentials (tests/test_funnel.py,
tests/test_timeseries.py) into driver-checked hash matches. Three
tagged-union entries cover seven operators inside the 50-query cap.

Timezone discipline: the driver's session TZ is unknown, so every
epoch conversion here is TZ-independent — Spark derives fractional
epoch seconds via ``timestampdiff(MICROSECOND, NTZ-epoch, ts) / 1e6``
over the TIMESTAMP_NTZ column, DuckDB via ``epoch_us(ts) / 1000000.0``
over the naive timestamp; both are the same exact integer-microsecond
value divided by the same double, hence bit-identical.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iot_sensor_data_pipeline_spark.plans.registry import register, register_extended
from iot_sensor_data_pipeline_spark.sources.tables import load_table

def _epoch_s():
    """TZ-independent fractional epoch seconds from the TIMESTAMP_NTZ
    ``ts`` column (built lazily: F.expr needs an active session)."""
    return (
        F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
        / F.lit(1000000.0)
    )

_FUNNEL_STEPS = ("view", "click", "purchase")
_FUNNEL_WITHIN = 600.0  # 10 minutes between steps
_COHORT_PERIOD = 86400.0  # daily cohorts

# shared CTE prefix: the latest-anchor funnel per user — reused by the
# gate's behavioral union AND the extended funnel-chart query
_FUNNEL_CTES = f"""
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) / 1000000.0 AS t FROM events
  WHERE event_type IN ('view', 'click', 'purchase')
), s1 AS (
  SELECT user_id, max(t) AS t1 FROM e WHERE event_type = 'view' GROUP BY user_id
), s2 AS (
  SELECT c.user_id, max(c.t) AS t2
  FROM e c
  WHERE c.event_type = 'click'
    AND EXISTS (SELECT 1 FROM e v WHERE v.user_id = c.user_id AND v.event_type = 'view'
                AND v.t <= c.t AND c.t - v.t <= {_FUNNEL_WITHIN})
  GROUP BY c.user_id
), s3 AS (
  SELECT p.user_id, max(p.t) AS t3
  FROM e p
  WHERE p.event_type = 'purchase'
    AND EXISTS (
      SELECT 1 FROM e c WHERE c.user_id = p.user_id AND c.event_type = 'click'
        AND c.t <= p.t AND p.t - c.t <= {_FUNNEL_WITHIN}
        AND EXISTS (SELECT 1 FROM e v WHERE v.user_id = c.user_id AND v.event_type = 'view'
                    AND v.t <= c.t AND c.t - v.t <= {_FUNNEL_WITHIN})
    )
  GROUP BY p.user_id
), funnel AS (
  SELECT
    u.user_id,
    CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2
         WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS stage_reached,
    t3 IS NOT NULL AS completed
  FROM (SELECT DISTINCT user_id FROM e) u
  LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
)"""

_BEHAVIORAL_ORACLE = _FUNNEL_CTES + f""", ce AS (
  SELECT user_id AS u,
         CAST(floor(epoch_us(ts) / 1000000.0 / {_COHORT_PERIOD}) AS BIGINT) AS p
  FROM events
), first AS (
  SELECT u, min(p) AS cp FROM ce GROUP BY u
), retention AS (
  SELECT cp AS cohort_period, p - cp AS periods_since, count(DISTINCT u) AS n_users
  FROM ce JOIN first USING (u)
  GROUP BY cp, p - cp
), trans_base AS (
  SELECT event_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM events
), transitions AS (
  SELECT event_type AS from_type, coalesce(nxt, '<end>') AS to_type, count(*) AS n
  FROM trans_base GROUP BY 1, 2
)
SELECT 'funnel' AS kind, CAST(user_id AS VARCHAR) AS k1,
       CAST(completed AS VARCHAR) AS k2, CAST(stage_reached AS BIGINT) AS n
FROM funnel
UNION ALL
SELECT 'retention' AS kind, CAST(cohort_period AS VARCHAR) AS k1,
       CAST(periods_since AS VARCHAR) AS k2, n_users AS n
FROM retention
UNION ALL
SELECT 'transitions' AS kind, from_type AS k1, to_type AS k2, n
FROM transitions
"""


@register(
    "events_behavioral_analytics",
    oracle=_BEHAVIORAL_ORACLE,
    tags=("analytics", "funnel", "cohort", "path"),
)
def events_behavioral_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tagged union of the three behavioral operators
    (operators/funnel.py) over the events table:

    - ``funnel``: 3-step latest-anchor funnel (view -> click ->
      purchase, 10-minute budget per step) — k1 = user, k2 =
      completed, n = stage_reached.
    - ``retention``: daily cohort retention — k1 = cohort_period,
      k2 = periods_since, n = active users.
    - ``transitions``: first-order event-type transition matrix with
      '<end>' terminals — k1 = from_type, k2 = to_type, n = count.
    """
    from iot_sensor_data_pipeline_spark.operators.funnel import (
        cohort_retention,
        event_transitions,
        funnel_stages,
    )

    events = load_table(spark, sf_dir, "events")
    ev = events.select("user_id", "event_type", "event_id", _epoch_s().alias("ts"))

    funnel = funnel_stages(
        ev, list(_FUNNEL_STEPS), within_seconds=_FUNNEL_WITHIN
    ).select(
        F.lit("funnel").alias("kind"),
        F.col("user").cast("string").alias("k1"),
        F.col("completed").cast("string").alias("k2"),
        F.col("stage_reached").cast("long").alias("n"),
    )
    retention = cohort_retention(ev, period_seconds=_COHORT_PERIOD).select(
        F.lit("retention").alias("kind"),
        F.col("cohort_period").cast("string").alias("k1"),
        F.col("periods_since").cast("string").alias("k2"),
        F.col("n_users").alias("n"),
    )
    transitions = event_transitions(events, id_col="event_id").select(
        F.lit("transitions").alias("kind"),
        F.col("from_type").alias("k1"),
        F.col("to_type").alias("k2"),
        "n",
    )
    return funnel.unionByName(retention).unionByName(transitions)


_FUNNEL_COUNTS_ORACLE = (
    _FUNNEL_CTES
    + """
SELECT s.stage, CAST(count(f.user_id) AS BIGINT) AS n_users
FROM (SELECT unnest([1, 2, 3]) AS stage) s
LEFT JOIN funnel f ON f.stage_reached >= s.stage
GROUP BY s.stage
"""
)


@register_extended(
    "events_funnel_counts",
    oracle=_FUNNEL_COUNTS_ORACLE,
    tags=("analytics", "funnel"),
)
def events_funnel_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The funnel CHART on top of funnel_stages: one row per step with
    the users who reached at least that stage — monotone by
    construction, zero-stage rows included (operators/funnel.py
    funnel_counts; the per-user stages are the gate-stamped
    events_behavioral_analytics relation)."""
    from iot_sensor_data_pipeline_spark.operators.funnel import (
        funnel_counts,
        funnel_stages,
    )

    events = load_table(spark, sf_dir, "events")
    ev = events.select("user_id", "event_type", _epoch_s().alias("ts"))
    stages = funnel_stages(ev, list(_FUNNEL_STEPS), within_seconds=_FUNNEL_WITHIN)
    return funnel_counts(stages, n_steps=len(_FUNNEL_STEPS))


_PATTERN = [1.0, 3.0, 2.0]
_TOPK = 25
_ZW = 6  # rolling z-score window rows
_ZK = 2.5  # rolling z-score threshold


def _znorm(p: list[float]) -> list[float]:
    mu = sum(p) / len(p)
    sd = math.sqrt(sum((x - mu) ** 2 for x in p) / len(p))
    return [(x - mu) / sd for x in p]


_Q1, _Q2, _Q3 = _znorm(_PATTERN)

_TIMESERIES_ORACLE = f"""
WITH zb AS (
  SELECT user_id AS key, ts, CAST(value AS DOUBLE) AS value,
         avg(CAST(value AS DOUBLE)) OVER w AS mu_raw,
         stddev_samp(CAST(value AS DOUBLE)) OVER w AS sigma_raw,
         count(value) OVER w AS n
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN {_ZW} PRECEDING AND 1 PRECEDING)
), seqs AS (
  SELECT user_id AS key, ts,
         list(CAST(value AS DOUBLE)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS seq
  FROM events
), sized AS (
  SELECT key, ts, seq,
         list_sum(seq) / 3 AS mu,
         sqrt(greatest(list_sum(list_transform(seq, x -> x * x)) / 3
              - (list_sum(seq) / 3) * (list_sum(seq) / 3), 0)) AS sigma
  FROM (SELECT * FROM seqs WHERE len(seq) = 3)
), topk AS (
  SELECT key, ts,
         round(sqrt(
           ((seq[1] - mu) / sigma - ({_Q1!r})) * ((seq[1] - mu) / sigma - ({_Q1!r}))
         + ((seq[2] - mu) / sigma - ({_Q2!r})) * ((seq[2] - mu) / sigma - ({_Q2!r}))
         + ((seq[3] - mu) / sigma - ({_Q3!r})) * ((seq[3] - mu) / sigma - ({_Q3!r}))
         ), 6) AS dist
  FROM sized
  WHERE sigma > 0
  ORDER BY dist ASC, key ASC, ts ASC
  LIMIT {_TOPK}
)
SELECT 'zscore' AS kind, key, ts, value,
       round(mu_raw, 6) AS mu,
       round(sigma_raw, 6) AS sigma,
       CASE WHEN n < {_ZW} OR sigma_raw IS NULL OR sigma_raw <= 0 THEN NULL
            ELSE abs(value - mu_raw) > {_ZK} * sigma_raw END AS is_anomaly,
       CAST(NULL AS DOUBLE) AS dist
FROM zb
UNION ALL
SELECT 'pattern_topk' AS kind, key, ts,
       CAST(NULL AS DOUBLE) AS value,
       CAST(NULL AS DOUBLE) AS mu,
       CAST(NULL AS DOUBLE) AS sigma,
       CAST(NULL AS BOOLEAN) AS is_anomaly,
       dist
FROM topk
"""


@register(
    "events_timeseries_analytics",
    oracle=_TIMESERIES_ORACLE,
    tags=("analytics", "timeseries", "anomaly"),
)
def events_timeseries_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tagged union of the two batch time-series operators
    (operators/timeseries.py) over the events table:

    - ``zscore``: rolling z-score anomaly flags (window 6 preceding
      rows, k=2.5, self-excluded baseline, NULL on warm-up and flat
      baselines) — one row per event.
    - ``pattern_topk``: top-25 z-normalized euclidean matches of the
      [1, 3, 2] spike shape across every user's value stream,
      (dist, key, ts) tie-break.
    """
    from iot_sensor_data_pipeline_spark.operators.timeseries import (
        rolling_zscore_anomalies,
        znorm_pattern_topk,
    )

    events = load_table(spark, sf_dir, "events")
    null_d = F.lit(None).cast("double")
    zscore = rolling_zscore_anomalies(events, window_rows=_ZW, k_sigma=_ZK).select(
        F.lit("zscore").alias("kind"),
        "key",
        "ts",
        "value",
        "mu",
        "sigma",
        "is_anomaly",
        null_d.alias("dist"),
    )
    topk = znorm_pattern_topk(events, _PATTERN, k=_TOPK).select(
        F.lit("pattern_topk").alias("kind"),
        "key",
        "ts",
        null_d.alias("value"),
        null_d.alias("mu"),
        null_d.alias("sigma"),
        F.lit(None).cast("boolean").alias("is_anomaly"),
        "dist",
    )
    return zscore.unionByName(topk)


_HH_K = 4096  # Misra-Gries counters: exactness holds iff min_count > n/k
_HH_MIN = 20
_FUZZY_MOD = 5  # customer subset: c_custkey % 5 == 0

_HH_FUZZY_ORACLE = f"""
SELECT 'heavy' AS kind, token AS a, CAST(NULL AS VARCHAR) AS b, count(*) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
GROUP BY token
HAVING count(*) >= {_HH_MIN}
UNION ALL
SELECT 'fuzzy' AS kind,
       CAST(l.c_custkey AS VARCHAR) AS a,
       CAST(r.c_custkey AS VARCHAR) AS b,
       CAST(levenshtein(l.c_name, r.nm) AS BIGINT) AS n
FROM (SELECT c_custkey, c_name FROM customer WHERE c_custkey % {_FUZZY_MOD} = 0) l,
     (SELECT c_custkey, substr(c_name, 1, 8) || substr(c_name, 10) AS nm
      FROM customer WHERE c_custkey % {_FUZZY_MOD} = 0) r
WHERE abs(len(l.c_name) - len(r.nm)) <= 1
  AND levenshtein(l.c_name, r.nm) <= 1
"""


def fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fuzzy branch of :func:`tokens_heavy_hitters_fuzzy` as a
    standalone relation — (left_id, right_id, a, b, distance) from the
    id-keyed q-gram-blocked edit-distance join of customer names
    against a deterministically corrupted copy. Factored out so
    bench.py can anchor the fuzzy_join operator's wall time (its r14
    prefix-filter rewrite shipped without a bench anchor) without
    duplicating the query's construction."""
    from iot_sensor_data_pipeline_spark.operators.joins import fuzzy_join

    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_custkey") % _FUZZY_MOD == 0
    )
    corrupted = cust.select(
        "c_custkey",
        F.concat(
            F.substring("c_name", 1, 8), F.substring("c_name", 10, 1 << 20)
        ).alias("c_name_typo"),
    )
    return fuzzy_join(
        cust,
        corrupted,
        "c_name",
        "c_name_typo",
        max_distance=1,
        left_id="c_custkey",
        right_id="c_custkey",
    )


@register(
    "tokens_heavy_hitters_fuzzy",
    oracle=_HH_FUZZY_ORACLE,
    tags=("analytics", "sketch", "fuzzy"),
)
def tokens_heavy_hitters_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tagged union of the two candidate-generation operators:

    - ``heavy``: exact heavy hitters over the exploded document tokens
      (operators/sketches.heavy_hitters: per-partition Misra-Gries
      candidates + exact recount). With min_count > n_tokens /
      k_counters the output EQUALS the plain GROUP BY ... HAVING
      oracle (every qualifying item is guaranteed a surviving
      candidate) — a = token, n = exact count.
    - ``fuzzy``: id-keyed q-gram-blocked edit-distance join
      (operators/joins.fuzzy_join) matching customer names against a
      deterministically corrupted copy (the '#' deleted) at
      max_distance 1 — a = left c_custkey, b = right c_custkey,
      n = levenshtein distance. The oracle is the naive length-
      filtered cross join; the operator must agree exactly.
    """
    from iot_sensor_data_pipeline_spark.operators.sketches import heavy_hitters

    docs = load_table(spark, sf_dir, "documents")
    tokens = docs.select(F.explode(F.split("text", " ", -1)).alias("token"))
    heavy = heavy_hitters(
        tokens, "token", k_counters=_HH_K, min_count=_HH_MIN
    ).select(
        F.lit("heavy").alias("kind"),
        F.col("token").alias("a"),
        F.lit(None).cast("string").alias("b"),
        "n",
    )

    fuzzy = fuzzy_name_pairs(spark, sf_dir).select(
        F.lit("fuzzy").alias("kind"),
        F.col("left_id").cast("string").alias("a"),
        F.col("right_id").cast("string").alias("b"),
        F.col("distance").cast("long").alias("n"),
    )
    return heavy.unionByName(fuzzy)


# ---------------------------------------------------------------------------
# Dense time-bucket rollup with gap filling (time_bucket_gapfill):
# per-event-type 300 s buckets of avg(value); the 'locf' and 'linear'
# branches exercise both fill methods over the SAME dense spine. The
# epoch arithmetic is the module's TZ-independent convention; both
# engines floor identical doubles so the bucketing is engine-exact.
# ---------------------------------------------------------------------------

_GF_W = 300

_GAPFILL_ORACLE = f"""
WITH b AS (
  SELECT event_type,
         CAST(floor(epoch_us(ts) / 1000000.0 / {_GF_W}) * {_GF_W} AS BIGINT) AS bucket,
         avg(value) AS v
  FROM events GROUP BY 1, 2
), spine AS (
  SELECT event_type, unnest(generate_series(lo, hi, {_GF_W})) AS bucket
  FROM (SELECT event_type, min(bucket) AS lo, max(bucket) AS hi FROM b GROUP BY 1)
), dense AS (
  SELECT s.event_type, s.bucket, b.v
  FROM spine s LEFT JOIN b USING (event_type, bucket)
), filled AS (
  SELECT event_type, bucket, v,
    last_value(v IGNORE NULLS) OVER wpast AS locf_v,
    last_value(CASE WHEN v IS NOT NULL THEN bucket END IGNORE NULLS) OVER wpast AS pb,
    last_value(CASE WHEN v IS NOT NULL THEN v END IGNORE NULLS) OVER wpast AS pv,
    first_value(CASE WHEN v IS NOT NULL THEN bucket END IGNORE NULLS) OVER wfut AS nb,
    first_value(CASE WHEN v IS NOT NULL THEN v END IGNORE NULLS) OVER wfut AS nv
  FROM dense
  WINDOW
    wpast AS (PARTITION BY event_type ORDER BY bucket
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    wfut AS (PARTITION BY event_type ORDER BY bucket
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT 'locf' AS branch, event_type, bucket, round(locf_v, 6) AS val,
       CASE WHEN v IS NULL THEN 1 ELSE 0 END AS gap
FROM filled
UNION ALL
SELECT 'linear' AS branch, event_type, bucket,
       round(CASE WHEN v IS NOT NULL THEN v
                  WHEN pb IS NOT NULL AND nb IS NOT NULL
                  THEN pv + (nv - pv) * (bucket - pb) / (nb - pb)
             END, 6) AS val,
       CASE WHEN v IS NULL THEN 1 ELSE 0 END AS gap
FROM filled
"""


@register_extended(
    "events_gapfill",
    oracle=_GAPFILL_ORACLE,
    tags=("analytics", "timeseries", "gapfill"),
)
def events_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hypertable rollup: avg(value) per (event_type, 300 s
    bucket) with EVERY bucket of each type's range present — gaps
    filled by LOCF in one branch and linear interpolation in the
    other (operators/timeseries.py:time_bucket_gapfill)."""
    from iot_sensor_data_pipeline_spark.operators.timeseries import (
        time_bucket_gapfill,
    )

    events = load_table(spark, sf_dir, "events").select(
        "event_type", _epoch_s().alias("t"), "value"
    )

    def branch(fill):
        out = time_bucket_gapfill(
            events, "t", _GF_W, ["event_type"], "value", agg="avg", fill=fill
        )
        return out.select(
            F.lit(fill).alias("branch"),
            "event_type",
            "bucket",
            F.round("val", 6).alias("val"),
            "gap",
        )

    return branch("locf").unionByName(branch("linear"))


# ---------------------------------------------------------------------------
# Time-weighted average (time_weighted_avg): per-event-type 600 s
# buckets, LOCF and trapezoidal branches over the SAME segment
# relation. Both engines build segments with lead() over (t, event_id),
# explode to covered buckets with identical double arithmetic, and clip
# overlaps at bucket edges — engine-exact like the gapfill oracle.
# ---------------------------------------------------------------------------

_TWA_W = 600

_TWA_ORACLE = f"""
WITH e AS (
  SELECT event_type, epoch_us(ts) / 1000000.0 AS t, value AS v, event_id
  FROM events
), seg AS (
  SELECT event_type, t AS t0, v AS v0,
         lead(t) OVER wk AS t1, lead(v) OVER wk AS v1
  FROM e
  WINDOW wk AS (PARTITION BY event_type ORDER BY t, event_id)
), sfil AS (
  SELECT * FROM seg WHERE t1 > t0
), ex AS (
  SELECT event_type, t0, v0, t1, v1,
         unnest(generate_series(
           CAST(floor(t0 / {_TWA_W}) AS BIGINT),
           CAST(floor(t1 / {_TWA_W}) AS BIGINT)
             - CASE WHEN t1 = floor(t1 / {_TWA_W}) * {_TWA_W} THEN 1 ELSE 0 END
         )) AS b
  FROM sfil
), ov AS (
  SELECT event_type, b, t0, v0, t1, v1,
         greatest(t0, b * {_TWA_W}) AS lo,
         least(t1, (b + 1) * {_TWA_W}) AS hi
  FROM ex
)
SELECT 'locf' AS branch, event_type, b * {_TWA_W} AS bucket,
       round(sum(v0 * (hi - lo)) / sum(hi - lo), 6) AS twa,
       round(sum(hi - lo), 6) AS covered
FROM ov GROUP BY 1, 2, 3
UNION ALL
SELECT 'linear' AS branch, event_type, b * {_TWA_W} AS bucket,
       round(sum((v0 + (v1 - v0) / (t1 - t0) * (lo - t0)
                  + v0 + (v1 - v0) / (t1 - t0) * (hi - t0)) / 2 * (hi - lo))
             / sum(hi - lo), 6) AS twa,
       round(sum(hi - lo), 6) AS covered
FROM ov GROUP BY 1, 2, 3
"""


@register(
    "events_time_weighted_avg",
    oracle=_TWA_ORACLE,
    tags=("analytics", "timeseries", "twa"),
)
def events_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of ``value`` per (event_type, 600 s
    bucket) — LOCF step integration in one branch, trapezoidal linear
    integration in the other
    (operators/timeseries.py:time_weighted_avg). The physically
    meaningful mean for irregularly sampled state: a plain avg()
    over-weights burst periods."""
    from iot_sensor_data_pipeline_spark.operators.timeseries import (
        time_weighted_avg,
    )

    events = load_table(spark, sf_dir, "events").select(
        "event_type", _epoch_s().alias("t"), "value", "event_id"
    )

    def branch(method):
        out = time_weighted_avg(
            events, "t", _TWA_W, ["event_type"], "value",
            method=method, id_col="event_id",
            # unbounded carry OPT-IN (the DuckDB oracle integrates
            # across all gaps); events is dense per type, so this is
            # safe here — sparse 100 TB series should keep the "auto"
            # default
            max_carry=None,
        )
        return out.select(
            F.lit(method).alias("branch"), "event_type", "bucket", "twa", "covered"
        )

    return branch("locf").unionByName(branch("linear"))
