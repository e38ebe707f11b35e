"""Relational surface, part 2: sessionization, ordered string
aggregation, arg-max aggregates, date arithmetic, null-handling,
subquery forms, distinct variants.

Same oracle discipline as queries_relational.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iot_sensor_data_pipeline_spark.plans.registry import register, register_extended
from iot_sensor_data_pipeline_spark.sources.tables import load_table, register_views

# ---------------------------------------------------------------------------
# Sessionization (batch): gap > 30 min starts a new session per user.
# The lag + cumulative-sum idiom — one shuffle on user, one sort.
# (Streaming uses F.session_window instead; tests/test_stateful.py.)
# ---------------------------------------------------------------------------

_SESSIONIZE_ORACLE = """
WITH marked AS (
  SELECT
    user_id, event_id, ts,
    CASE WHEN ts - lag(ts) OVER w <= INTERVAL '30 minutes' THEN 0 ELSE 1 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessions AS (
  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM marked
)
SELECT
  user_id,
  CAST(session_id AS BIGINT) AS session_id,
  CAST(min(ts) AS TIMESTAMP) AS session_start,
  CAST(max(ts) AS TIMESTAMP) AS session_end,
  count(*) AS n_events
FROM sessions
GROUP BY user_id, session_id
"""


@register("events_sessionize", oracle=_SESSIONIZE_ORACLE, tags=("relational", "session"), bench=True)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = events.select(
        "user_id",
        "event_id",
        "ts",
        F.lag("ts").over(w).alias("prev_ts"),
    ).select(
        "user_id",
        "event_id",
        "ts",
        # MICROSECOND, not SECOND: a 1800.5s gap must start a session,
        # and second-granularity diffs truncate that to 1800
        F.when(F.expr("timestampdiff(MICROSECOND, prev_ts, ts)") <= 1_800_000_000, 0)
        .otherwise(1)
        .alias("new_session"),
    )
    sessions = marked.withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


# ---------------------------------------------------------------------------
# Ordered string aggregation
# ---------------------------------------------------------------------------

_STRINGAGG_ARGMAX_ORACLE = """
SELECT
  'nations' AS src,
  CAST(n_regionkey AS VARCHAR) AS grp,
  string_agg(n_name, ',' ORDER BY n_name) AS nations,
  CAST(NULL AS BIGINT) AS biggest_order,
  CAST(NULL AS BIGINT) AS smallest_order,
  CAST(NULL AS DOUBLE) AS max_price,
  CAST(NULL AS BIGINT) AS n_big
FROM nation
GROUP BY n_regionkey
UNION ALL
SELECT
  'orders' AS src,
  o_orderstatus AS grp,
  CAST(NULL AS VARCHAR) AS nations,
  arg_max(o_orderkey, o_totalprice) AS biggest_order,
  arg_min(o_orderkey, o_totalprice) AS smallest_order,
  max(o_totalprice)                 AS max_price,
  count(*) FILTER (WHERE o_totalprice > 200000) AS n_big
FROM orders
GROUP BY o_orderstatus
"""


# rotated out of the driver gate in r08 (long-green; extended sweep keeps the oracle)
@register_extended("string_agg_argmax_union", oracle=_STRINGAGG_ARGMAX_ORACLE, tags=("relational", "agg"))
def string_agg_argmax_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (collect_list -> array_sort ->
    array_join) and arg-max/arg-min/count_if aggregates, as one tagged
    union (two tiny agg-surface demos share one registry entry to keep
    the registry inside the driver's 50-query gate)."""
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    nations = nation.groupBy("n_regionkey").agg(
        F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations")
    ).select(
        F.lit("nations").alias("src"),
        F.col("n_regionkey").cast("string").alias("grp"),
        "nations",
        F.lit(None).cast("long").alias("biggest_order"),
        F.lit(None).cast("long").alias("smallest_order"),
        F.lit(None).cast("double").alias("max_price"),
        F.lit(None).cast("long").alias("n_big"),
    )
    argmax = orders.groupBy("o_orderstatus").agg(
        F.max_by("o_orderkey", "o_totalprice").alias("biggest_order"),
        F.min_by("o_orderkey", "o_totalprice").alias("smallest_order"),
        F.max("o_totalprice").alias("max_price"),
        F.count_if(F.col("o_totalprice") > 200000).alias("n_big"),
    ).select(
        F.lit("orders").alias("src"),
        F.col("o_orderstatus").alias("grp"),
        F.lit(None).cast("string").alias("nations"),
        "biggest_order",
        "smallest_order",
        "max_price",
        "n_big",
    )
    return nations.unionByName(argmax)


# ---------------------------------------------------------------------------
# Null-handling functions + subquery forms, as one tagged union
# (formerly the separate customers_null_handling and
# customers_subqueries entries — merged to free a registry slot for
# the analytics gate; each branch keeps its exact former projection).
# ---------------------------------------------------------------------------

_SUBQUERY_SQL = """
SELECT
  c_custkey,
  c_acctbal,
  (SELECT count(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_orders
FROM customer c
WHERE c.c_nationkey IN (
        SELECT n_nationkey FROM nation JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE')
  AND c.c_acctbal > (SELECT avg(c_acctbal) FROM customer)
"""

_NULLS_SUBQ_ORACLE = f"""
WITH lj AS (
  SELECT c_custkey, c_acctbal, o_totalprice
  FROM customer LEFT JOIN orders ON o_custkey = c_custkey AND o_totalprice > 450000
)
SELECT
  'nulls' AS src,
  c_custkey,
  coalesce(o_totalprice, 0.0)             AS price_or_zero,
  nullif(c_acctbal, 0.0)                  AS bal_nullif,
  CASE WHEN o_totalprice IS NULL THEN 'none' ELSE 'big' END AS has_big,
  ifnull(o_totalprice, c_acctbal)         AS price_or_bal,
  CAST(NULL AS DOUBLE)                    AS c_acctbal_subq,
  CAST(NULL AS BIGINT)                    AS n_orders
FROM lj
UNION ALL
SELECT
  'subq' AS src,
  c_custkey,
  CAST(NULL AS DOUBLE) AS price_or_zero,
  CAST(NULL AS DOUBLE) AS bal_nullif,
  CAST(NULL AS VARCHAR) AS has_big,
  CAST(NULL AS DOUBLE) AS price_or_bal,
  c_acctbal AS c_acctbal_subq,
  n_orders
FROM ({_SUBQUERY_SQL})
"""


@register_extended("customers_null_subqueries", oracle=_NULLS_SUBQ_ORACLE, tags=("relational", "nulls", "subquery"))
def customers_null_subqueries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Branch 'nulls': coalesce/nullif/ifnull over a deliberately
    NULL-producing left join. Branch 'subq': IN-subquery + correlated
    scalar subquery + uncorrelated scalar subquery — Catalyst
    decorrelates these into joins; the same SQL text runs on both
    engines."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 450000)
    lj = cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
    nulls = lj.select(
        F.lit("nulls").alias("src"),
        "c_custkey",
        F.coalesce("o_totalprice", F.lit(0.0)).alias("price_or_zero"),
        F.nullif("c_acctbal", F.lit(0.0)).alias("bal_nullif"),
        F.when(F.col("o_totalprice").isNull(), "none").otherwise("big").alias("has_big"),
        F.ifnull("o_totalprice", "c_acctbal").alias("price_or_bal"),
        F.lit(None).cast("double").alias("c_acctbal_subq"),
        F.lit(None).cast("long").alias("n_orders"),
    )
    register_views(spark, sf_dir)
    subq = spark.sql(_SUBQUERY_SQL).select(
        F.lit("subq").alias("src"),
        "c_custkey",
        F.lit(None).cast("double").alias("price_or_zero"),
        F.lit(None).cast("double").alias("bal_nullif"),
        F.lit(None).cast("string").alias("has_big"),
        F.lit(None).cast("double").alias("price_or_bal"),
        F.col("c_acctbal").alias("c_acctbal_subq"),
        "n_orders",
    )
    return nulls.unionByName(subq)


# ---------------------------------------------------------------------------
# Bag (duplicate-preserving) set operations: INTERSECT ALL / EXCEPT ALL
# — the multiset semantics the plain variants lose — plus the DISTINCT
# operator as a third tagged branch (one setops registry entry keeps
# the registry inside the driver's 50-query gate).
# ---------------------------------------------------------------------------

_BAG_SETOPS_ORACLE = """
WITH y96 AS (
  SELECT o_orderstatus, o_orderpriority FROM orders
  WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
), y97 AS (
  SELECT o_orderstatus, o_orderpriority FROM orders
  WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
), asia_nations AS (
  SELECT n_nationkey FROM nation JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'ASIA'
), cust_nations AS (
  SELECT DISTINCT c_nationkey AS n_nationkey FROM customer WHERE c_acctbal > 9000
)
SELECT o_orderstatus AS k1, o_orderpriority AS k2, 'common' AS src FROM (
  SELECT * FROM y96 INTERSECT ALL SELECT * FROM y97
)
UNION ALL
SELECT o_orderstatus AS k1, o_orderpriority AS k2, 'y96_extra' AS src FROM (
  SELECT * FROM y96 EXCEPT ALL SELECT * FROM y97
)
UNION ALL
SELECT o_orderstatus AS k1, o_orderpriority AS k2, 'distinct' AS src FROM (
  SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
)
UNION ALL
SELECT CAST(n_nationkey AS VARCHAR) AS k1, NULL AS k2, 'nation_both' AS src
FROM (SELECT * FROM asia_nations INTERSECT SELECT * FROM cust_nations)
UNION ALL
SELECT CAST(n_nationkey AS VARCHAR) AS k1, NULL AS k2, 'nation_asia_only' AS src
FROM (SELECT * FROM asia_nations EXCEPT SELECT * FROM cust_nations)
"""


# rotated out of the driver gate in r08 (long-green since r04; the
# extended two-SF differential keeps the identical oracle checked)
@register_extended("orders_bag_set_ops", oracle=_BAG_SETOPS_ORACLE, tags=("relational", "setops", "distinct"))
def orders_bag_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """intersectAll / exceptAll: per-row multiplicity is min(counts) /
    count difference — verified against ANSI INTERSECT ALL / EXCEPT ALL.
    The 'distinct' branch pins DataFrame.distinct() (hash aggregation
    on all columns). The 'nation_*' branches carry the plain
    (duplicate-eliminating) INTERSECT / EXCEPT surface — formerly the
    standalone nations_set_ops entry (queries_relational.py), folded
    here in round 5 with keys harmonized to (k1, k2) to keep the
    registry inside the driver's 50-query gate."""
    from iot_sensor_data_pipeline_spark.operators.setops import difference, intersect
    from iot_sensor_data_pipeline_spark.plans.queries_relational import nations_set_ops

    orders = load_table(spark, sf_dir, "orders")

    def year_slice(lo: str, hi: str) -> DataFrame:
        return orders.where(
            (F.col("o_orderdate") >= F.lit(lo).cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit(hi).cast("timestamp_ntz"))
        ).select(F.col("o_orderstatus").alias("k1"), F.col("o_orderpriority").alias("k2"))

    y96 = year_slice("1996-01-01", "1997-01-01")
    y97 = year_slice("1997-01-01", "1998-01-01")
    common = intersect(y96, y97, keep_duplicates=True).withColumn("src", F.lit("common"))
    extra = difference(y96, y97, keep_duplicates=True).withColumn("src", F.lit("y96_extra"))
    dist = (
        orders.select(F.col("o_orderstatus").alias("k1"), F.col("o_orderpriority").alias("k2"))
        .distinct()
        .withColumn("src", F.lit("distinct"))
    )
    nations = nations_set_ops(spark, sf_dir).select(
        F.col("n_nationkey").cast("string").alias("k1"),
        F.lit(None).cast("string").alias("k2"),
        F.concat(F.lit("nation_"), F.col("src")).alias("src"),
    )
    return common.unionByName(extra).unionByName(dist).unionByName(nations)


# ---------------------------------------------------------------------------
# Grouped-map UDF (applyInPandas): per-user inter-event gap statistics
# computed in pandas per group, oracle-checked against the lag-based
# SQL formulation — pins the Arrow grouped-map path end to end.
# ---------------------------------------------------------------------------

_GAP_STATS_ORACLE = """
WITH gaps AS (
  SELECT
    user_id,
    CAST(ts AS TIMESTAMP) - lag(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
  FROM events
)
SELECT
  user_id,
  count(*)                                       AS n_events,
  round(avg(epoch(gap)), 4)                      AS avg_gap_s,
  round(max(epoch(gap)), 4)                      AS max_gap_s
FROM gaps
GROUP BY user_id
"""


@register_extended("events_user_gap_stats", oracle=_GAP_STATS_ORACLE, tags=("relational", "udf"))
def events_user_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas grouped map: one pandas DataFrame per user computes
    inter-event gap stats — the UDAF-via-grouped-map pattern. One
    shuffle on user_id, Arrow both ways."""
    import pandas as pd

    def gap_stats(pdf):
        pdf = pdf.sort_values(["ts", "event_id"], kind="stable")
        gaps = pdf["ts"].diff().dt.total_seconds().dropna()
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n_events": [len(pdf)],
                "avg_gap_s": [round(float(gaps.mean()), 4) if len(gaps) else None],
                "max_gap_s": [round(float(gaps.max()), 4) if len(gaps) else None],
            }
        )

    events = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    return events.groupBy("user_id").applyInPandas(
        gap_stats, "user_id bigint, n_events bigint, avg_gap_s double, max_gap_s double"
    )


# ---------------------------------------------------------------------------
# TPC-H-style Q14: promo revenue share — broadcast dim join +
# conditional aggregation into one scalar.
# ---------------------------------------------------------------------------

_Q14_ORACLE = """
SELECT
  round(
    100.0 * sum(CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
      / sum(l_extendedprice * (1 - l_discount)),
    4
  ) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-02-01'
"""


def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast dim join + conditional aggregation into one scalar;
    registered through tpch_q6_q14_scalars since round 5."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-02-01").cast("timestamp_ntz"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                100.0 * F.sum(F.when(F.col("p_type") == "PROMO", net).otherwise(0.0)) / F.sum(net),
                4,
            ).alias("promo_revenue_pct")
        )
    )


# ---------------------------------------------------------------------------
# The built-in session_window operator (formerly its own registry entry,
# events_session_window) is cross-validated against events_sessionize's
# independent lag+cumsum algorithm in tests/test_stateful.py:98,114 —
# one sessionization entry keeps the registry inside the driver's
# 50-query gate; the streaming path is covered there too.
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# Higher-order array functions: collect -> sort -> transform/filter/
# reduce/exists, all inside the engine (no explode round-trip).
# ---------------------------------------------------------------------------

_ARRAY_HOF_ORACLE = """
WITH per_order AS (
  SELECT l_orderkey, list_sort(list(l_quantity)) AS qtys
  FROM lineitem GROUP BY l_orderkey
)
SELECT
  l_orderkey,
  qtys[1]                                               AS min_qty,
  len(qtys)                                             AS n_items,
  round(list_sum(list_transform(qtys, q -> q * 2.5)), 4) AS transformed_sum,
  len(list_filter(qtys, q -> q > 25))                   AS n_large,
  CAST(len(list_filter(qtys, q -> q > 45)) > 0 AS BOOLEAN) AS has_huge
FROM per_order
"""


# rotated out of the driver gate in r08 (long-green since r04; the
# extended two-SF differential keeps the identical oracle checked)
@register_extended("lineitem_array_hof", oracle=_ARRAY_HOF_ORACLE, tags=("relational", "array"))
def lineitem_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list -> array_sort -> transform/filter/aggregate/exists —
    the higher-order-function surface over grouped arrays."""
    li = load_table(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_list("l_quantity")).alias("qtys")
    )
    return per_order.select(
        "l_orderkey",
        F.element_at("qtys", 1).alias("min_qty"),
        F.size("qtys").alias("n_items"),
        F.round(
            F.aggregate(
                F.transform("qtys", lambda q: q * 2.5), F.lit(0.0), lambda acc, v: acc + v
            ),
            4,
        ).alias("transformed_sum"),
        F.size(F.filter("qtys", lambda q: q > 25)).alias("n_large"),
        F.exists("qtys", lambda q: q > 45).alias("has_huge"),
    )


# ---------------------------------------------------------------------------
# Unpivot (wide -> long). Oracle written as UNION ALL for portability.
# ---------------------------------------------------------------------------

_UNPIVOT_ORACLE = """
SELECT l_orderkey, l_linenumber, 'quantity' AS measure, l_quantity AS val FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'discount' AS measure, l_discount AS val FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'tax'      AS measure, l_tax      AS val FROM lineitem
"""


@register_extended("lineitem_unpivot", oracle=_UNPIVOT_ORACLE, tags=("relational", "pivot"))
def lineitem_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide -> long via DataFrame.unpivot (a.k.a. melt)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="val",
    ).withColumn(
        "measure",
        F.col("measure").substr(F.lit(3), F.length("measure")),  # l_quantity -> quantity
    )


_NTILE_ORACLE = """
WITH spend AS (
  SELECT
    c_custkey,
    count(o_orderkey)                        AS n_orders,
    round(coalesce(sum(o_totalprice), 0), 2) AS total_spend
  FROM customer
  LEFT JOIN orders ON o_custkey = c_custkey
  GROUP BY c_custkey
)
SELECT
  c_custkey,
  n_orders,
  total_spend,
  CAST(ntile(4) OVER (ORDER BY total_spend DESC, c_custkey) AS INTEGER) AS spend_quartile,
  round(percent_rank() OVER (ORDER BY total_spend, c_custkey), 6) AS spend_pct_rank,
  round(cume_dist() OVER (ORDER BY total_spend, c_custkey), 6) AS spend_cume_dist
FROM spend
"""


@register_extended("customers_spend_quartiles", oracle=_NTILE_ORACLE, tags=("relational", "window", "join"))
def customers_spend_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT JOIN + aggregation (the former customers_left_join_agg —
    customers with no orders keep spend 0) feeding distribution
    analytics: ntile/percent_rank/cume_dist over per-customer spend.

    SCALE-SAFE: a bare ``Window.orderBy`` would funnel every customer
    through one partition; instead the exact global rank comes from
    operators.ranking.global_row_number (range repartition + local
    row_number + broadcast offsets) and the three distribution
    functions are derived arithmetically from it — the plan contains
    no ``Exchange SinglePartition`` (pinned by tests/test_plans.py).
    The composite sort key (total_spend, c_custkey) is unique, so the
    derived values equal the window-function definitions exactly.
    """
    from iot_sensor_data_pipeline_spark.operators.ranking import (
        cume_dist_from_rank,
        global_row_number,
        ntile_from_rank,
        percent_rank_from_rank,
    )

    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    # checkpointed (lazy): the join+agg feeds both ranking passes (each
    # of which runs its own offsets job) — without it the
    # customer-orders aggregation would recompute once per downstream
    # action. RDD-level storage is GC-reclaimed; Dataset.persist would
    # pin a CacheManager entry for the session. The total row count
    # falls out of the first ranking's offsets for free (return_count),
    # so no separate count() action is needed.
    spend = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spend"),
        )
        .localCheckpoint(eager=False)
    )
    ranked, n_rows = global_row_number(
        spend,
        [F.col("total_spend").asc(), F.col("c_custkey").asc()],
        "rank_asc",
        return_count=True,
    )
    ranked = global_row_number(
        ranked, [F.col("total_spend").desc(), F.col("c_custkey").asc()], "rank_desc"
    )
    return ranked.select(
        "c_custkey",
        "n_orders",
        "total_spend",
        ntile_from_rank(F.col("rank_desc"), n_rows, 4).alias("spend_quartile"),
        F.round(percent_rank_from_rank(F.col("rank_asc"), n_rows), 6).alias("spend_pct_rank"),
        F.round(cume_dist_from_rank(F.col("rank_asc"), n_rows), 6).alias("spend_cume_dist"),
    )


# ---------------------------------------------------------------------------
# TPC-H-style Q6: the pure scan-filter-sum pushdown showcase
# ---------------------------------------------------------------------------

_Q6_ORACLE = """
SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every predicate reaches the parquet scan (PushedFilters) and the
    projection prunes to 4 columns — the canonical pushdown check.
    Registered through tpch_q6_q14_scalars since round 5; still benched
    standalone under its historical name (bench.py EXTRA_HEADLINES) so
    round-over-round timings stay comparable."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias("revenue"))
    )


_Q6_Q14_ORACLE = f"""
SELECT 'q6_forecast_revenue' AS metric, revenue AS value FROM ({_Q6_ORACLE})
UNION ALL
SELECT 'q14_promo_revenue_pct' AS metric, promo_revenue_pct AS value FROM ({_Q14_ORACLE})
"""


@register("tpch_q6_q14_scalars", oracle=_Q6_Q14_ORACLE, tags=("relational", "scan", "join", "agg"))
def tpch_q6_q14_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The two single-scalar TPC-H-style aggregates (Q6 scan-filter-sum
    pushdown, Q14 broadcast-join promo share) as one tagged union —
    merged in round 5 to free registry slots for the new pipeline
    operators while both plans keep executing under the oracle (Q6 is
    additionally benched standalone under its historical name)."""
    q6 = tpch_q6_forecast_revenue(spark, sf_dir).select(
        F.lit("q6_forecast_revenue").alias("metric"), F.col("revenue").alias("value")
    )
    q14 = tpch_q14_promo_revenue(spark, sf_dir).select(
        F.lit("q14_promo_revenue_pct").alias("metric"),
        F.col("promo_revenue_pct").alias("value"),
    )
    return q6.unionByName(q14)


# ---------------------------------------------------------------------------
# TPC-H-style Q10: returned-item customer ranking (4-way join + top-20)
# ---------------------------------------------------------------------------

_Q10_ORACLE = """
SELECT
  c_custkey, c_name, n_name,
  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM customer
JOIN orders   ON c_custkey  = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-10-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@register_extended("tpch_q10_returned_items", oracle=_Q10_ORACLE, tags=("relational", "join", "topk"))
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    )
    return (
        joined.groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Bloom-filter pruned semi/anti join (operators/bloom.py). The bloom
# stage is probabilistic but the composed operators are EXACT, so a
# plain IN / NOT IN oracle checks them — the semi branch runs the
# all-JVM broadcast-join probe path, the anti branch the Arrow/numpy
# bitset path, putting both under the hash gate in one query.
# ---------------------------------------------------------------------------

_BLOOM_JOIN_ORACLE = """
WITH hv AS (SELECT o_orderkey FROM orders WHERE o_totalprice > 350000)
SELECT 'semi' AS branch, l_returnflag,
       COUNT(*) AS n,
       round(SUM(l_quantity), 4) AS sum_qty,
       round(SUM(l_extendedprice), 4) AS sum_price
FROM lineitem WHERE l_orderkey IN (SELECT o_orderkey FROM hv)
GROUP BY l_returnflag
UNION ALL
SELECT 'anti' AS branch, l_returnflag,
       COUNT(*) AS n,
       round(SUM(l_quantity), 4) AS sum_qty,
       round(SUM(l_extendedprice), 4) AS sum_price
FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM hv)
GROUP BY l_returnflag
"""


# rotated INTO the driver gate in r08
@register(
    "lineitem_bloom_join", oracle=_BLOOM_JOIN_ORACLE, tags=("join", "bloom", "scale")
)
def lineitem_bloom_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact semi + anti join through bloom-filter pre-pruning.

    At 100 TB the fact side never ships non-candidate rows to the join:
    the packed bitset relation (<= m_bits/64 rows) broadcasts, each scan
    task discards misses locally, and only survivors (true matches +
    ~fpp false positives) reach the exact equi-join. Both probe paths
    are exercised: 'join' (chained broadcast lookups, zero collect) for
    the semi branch, 'pandas' (numpy bitset over Arrow batches) for the
    anti branch."""
    from iot_sensor_data_pipeline_spark.operators.bloom import (
        bloom_anti_join,
        bloom_semi_join,
    )

    li = load_table(spark, sf_dir, "lineitem")
    hv = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > 350000)
        .select(F.col("o_orderkey").alias("l_orderkey"))
    )

    def rollup(df: DataFrame, branch: str) -> DataFrame:
        return df.groupBy("l_returnflag").agg(
            F.lit(branch).alias("branch"),
            F.count("*").alias("n"),
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_price"),
        )

    semi = rollup(
        bloom_semi_join(li, hv, ["l_orderkey"], m_bits=1 << 17, n_hashes=6), "semi"
    )
    anti = rollup(
        bloom_anti_join(
            li, hv, ["l_orderkey"], m_bits=1 << 17, n_hashes=6, method="pandas"
        ),
        "anti",
    )
    cols = ["branch", "l_returnflag", "n", "sum_qty", "sum_price"]
    return semi.select(*cols).unionByName(anti.select(*cols))
