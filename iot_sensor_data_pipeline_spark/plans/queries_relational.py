"""General relational surface (SURVEY.md §7 milestone 2): joins,
top-k, window functions, set ops, rollup/cube/grouping sets, pivot,
subqueries, statistical aggregates — the capabilities the reference
lacks entirely (SURVEY.md §2.4 gap list) that a same-capabilities
engine must provide.

Float policy for oracle parity: row-level arithmetic is bit-identical
IEEE across engines (no rounding); SUM/AVG aggregates round at a
precision where the true decimal value is exact but summation-order
noise (~1e-9) cannot straddle a rounding boundary (sums of 2-dp money
-> round 2; discounted products, exact at 4 dp -> round 4; avg ->
round 4; variance-family -> round 6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iot_sensor_data_pipeline_spark.operators.joins import (
    anti_join,
    asof_join,
    broadcast_join,
    semi_join,
)
from iot_sensor_data_pipeline_spark.operators.setops import difference, intersect
from iot_sensor_data_pipeline_spark.operators.topk import top_k, top_k_per_group
from iot_sensor_data_pipeline_spark.plans.registry import register, register_extended
from iot_sensor_data_pipeline_spark.sources.tables import load_table, register_views

# ---------------------------------------------------------------------------
# TPC-H-style Q1: full-scan group-by with 8 aggregates
# ---------------------------------------------------------------------------

_Q1_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  sum(l_quantity)                                           AS sum_qty,
  round(sum(l_extendedprice), 2)                            AS sum_base_price,
  round(sum(l_extendedprice * (1 - l_discount)), 4)         AS sum_disc_price,
  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
  round(avg(l_quantity), 4)                                 AS avg_qty,
  round(avg(l_extendedprice), 4)                            AS avg_price,
  round(avg(l_discount), 4)                                 AS avg_disc,
  count(*)                                                  AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


@register_extended(  # rotated out of the gate in r12 (hash-green since r02)
    "tpch_q1_pricing_summary", oracle=_Q1_ORACLE, tags=("relational", "agg"), bench=True
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(disc_price), 4).alias("sum_disc_price"),
        F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 4).alias("sum_charge"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


# ---------------------------------------------------------------------------
# TPC-H-style Q3: 3-way join + agg + deterministic top-10
# ---------------------------------------------------------------------------

_Q3_ORACLE = """
SELECT
  l_orderkey,
  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
  o_orderdate,
  o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate  > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""


@register_extended(  # rotated out of the gate in r12 (hash-green since r02)
    "tpch_q3_top_orders", oracle=_Q3_ORACLE, tags=("relational", "join", "topk"), bench=True
)
def tpch_q3_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp_ntz")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp_ntz")
    )
    # customer (filtered to one segment) broadcasts; orders scans once
    o_c = broadcast_join(orders, cust.select("c_custkey"), orders.o_custkey == cust.c_custkey)
    joined = li.join(o_c, li.l_orderkey == o_c.o_orderkey)
    agg = joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue")
    )
    return top_k(
        agg, [F.col("revenue").desc(), F.col("o_orderdate"), F.col("l_orderkey")], 10
    ).select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")


# ---------------------------------------------------------------------------
# TPC-H-style Q5: 6-way join with dimension broadcast
# ---------------------------------------------------------------------------

_Q5_ORACLE = """
SELECT
  n_name,
  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM customer
JOIN orders   ON c_custkey  = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey  = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


@register_extended(  # rotated out of the gate in r12 (hash-green since r02)
    "tpch_q5_regional_revenue", oracle=_Q5_ORACLE, tags=("relational", "join"), bench=True
)
def tpch_q5_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = {n: load_table(spark, sf_dir, n) for n in ("customer", "orders", "lineitem", "supplier", "nation", "region")}
    orders = t["orders"].where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    # dims are tiny -> broadcast; facts join on shuffled keys with AQE
    nr = broadcast_join(
        t["nation"], t["region"].where(F.col("r_name") == "ASIA"), t["nation"].n_regionkey == t["region"].r_regionkey
    ).select("n_nationkey", "n_name")
    sup = broadcast_join(t["supplier"], nr, t["supplier"].s_nationkey == nr.n_nationkey).select(
        "s_suppkey", "s_nationkey", "n_name"
    )
    joined = (
        t["lineitem"]
        .join(orders, t["lineitem"].l_orderkey == orders.o_orderkey)
        .join(sup, t["lineitem"].l_suppkey == sup.s_suppkey)
        .join(
            t["customer"],
            (orders.o_custkey == t["customer"].c_custkey)
            & (sup.s_nationkey == t["customer"].c_nationkey),
        )
    )
    return joined.groupBy("n_name").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue")
    )


# ---------------------------------------------------------------------------
# Semi / anti / outer joins
# ---------------------------------------------------------------------------

_SEMI_ANTI_ORACLE = """
SELECT c_custkey, c_name, 'semi' AS src
FROM customer
WHERE EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_totalprice > 400000
)
UNION ALL
SELECT c_custkey, c_name, 'anti' AS src
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


# rotated out of the driver gate in r08 (long-green since r02; bloom_join
# now carries in-gate semi/anti coverage; extended two-SF sweep keeps the oracle)
@register_extended("customers_semi_anti_join", oracle=_SEMI_ANTI_ORACLE, tags=("relational", "join"))
def customers_semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi + left_anti in one tagged union (one registry entry per
    join family keeps the registry inside the driver's 50-query gate)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    big_orders = orders.where(F.col("o_totalprice") > 400000)
    semi = semi_join(cust, big_orders, cust.c_custkey == big_orders.o_custkey).select(
        "c_custkey", "c_name", F.lit("semi").alias("src")
    )
    anti = anti_join(cust, orders, cust.c_custkey == orders.o_custkey).select(
        "c_custkey", "c_name", F.lit("anti").alias("src")
    )
    return semi.unionByName(anti)


# ---------------------------------------------------------------------------
# Window functions: ranking, lag/lead, running frames
# ---------------------------------------------------------------------------

_WINDOW_FN_ORACLE = """
SELECT
  o_orderkey, o_custkey, o_orderdate, o_totalprice,
  row_number() OVER w                                    AS rn,
  rank()       OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS price_rank,
  lag(o_totalprice)  OVER w                              AS prev_price,
  lead(o_totalprice) OVER w                              AS next_price,
  round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend,
  round(avg(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)    AS moving_avg3
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


@register_extended(  # rotated OUT of the gate in r13 (hash-green since r02; mutation/IVM flagships in) — two-SF extended sweep keeps the oracle; still benched under its r1 anchor
    "orders_window_functions", oracle=_WINDOW_FN_ORACLE,
    tags=("relational", "window"), bench=True,
)
def orders_window_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_rank = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return orders.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w_rank).alias("price_rank"),
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.round(
            F.sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2
        ).alias("running_spend"),
        F.round(F.avg("o_totalprice").over(w.rowsBetween(-2, 0)), 4).alias("moving_avg3"),
    )


# ---------------------------------------------------------------------------
# Per-group top-k (WindowGroupLimit pushdown)
# ---------------------------------------------------------------------------

_TOPK_GROUP_ORACLE = """
SELECT * FROM (
  SELECT
    o_custkey, o_orderkey, o_totalprice,
    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 3
"""


@register_extended("orders_topk_per_customer", oracle=_TOPK_GROUP_ORACLE, tags=("relational", "topk"))
def orders_topk_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice")
    return top_k_per_group(
        orders,
        group_by=["o_custkey"],
        order_by=[F.col("o_totalprice").desc(), F.col("o_orderkey")],
        k=3,
    )


# ---------------------------------------------------------------------------
# As-of join: for each error event, the user's most recent purchase
# ---------------------------------------------------------------------------

_ASOF_ORACLE = """
WITH errors AS (
  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'error'
), purchases AS (
  SELECT user_id, ts AS p_ts, value AS p_value FROM events WHERE event_type = 'purchase'
)
SELECT e.event_id, e.user_id, CAST(e.ts AS TIMESTAMP) AS ts, e.value,
       CAST(p.p_ts AS TIMESTAMP) AS last_purchase_ts, p.p_value AS last_purchase_value
FROM errors e
ASOF LEFT JOIN purchases p ON e.user_id = p.user_id AND e.ts >= p.p_ts
"""


@register_extended(  # rotated OUT of the gate in r13 (hash-green since r02; mutation/IVM flagships in) — two-SF extended sweep keeps the oracle (plus events_asof_directions); still benched under its r1 anchor
    "events_asof_join", oracle=_ASOF_ORACLE,
    tags=("relational", "asof"), bench=True,
)
def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join composed from union + ordered window (operators/joins.py):
    one shuffle, no Python — Spark's answer to DuckDB's native ASOF."""
    events = load_table(spark, sf_dir, "events")
    errors = events.where(F.col("event_type") == "error").select("event_id", "user_id", "ts", "value")
    purchases = events.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts"), F.col("value").alias("p_value")
    )
    out = asof_join(
        errors,
        purchases,
        on=["user_id"],
        left_ts="ts",
        right_ts="p_ts",
        right_vals=["p_ts", "p_value"],
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.col("p_ts").alias("last_purchase_ts"),
        F.col("p_value").alias("last_purchase_value"),
    )


# ---------------------------------------------------------------------------
# Set operations (plain INTERSECT / EXCEPT). Formerly the standalone
# nations_set_ops registry entry; since round 5 its branches ride in
# orders_bag_set_ops (queries_relational2.py) so the freed slot keeps
# the registry inside the driver's 50-query gate. The implementation
# stays here, exported for that union.
# ---------------------------------------------------------------------------


def nations_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-set INTERSECT / EXCEPT over the Asia-nations /
    rich-customer-nations pair; registered through orders_bag_set_ops
    ('nation_both' / 'nation_asia_only' branches)."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    cust = load_table(spark, sf_dir, "customer")
    asia = broadcast_join(
        nation, region.where(F.col("r_name") == "ASIA"), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey")
    rich = cust.where(F.col("c_acctbal") > 9000).select(
        F.col("c_nationkey").alias("n_nationkey")
    ).distinct()
    both = intersect(asia, rich).withColumn("src", F.lit("both"))
    asia_only = difference(asia, rich).withColumn("src", F.lit("asia_only"))
    return both.unionByName(asia_only)


# ---------------------------------------------------------------------------
# Rollup / cube / grouping sets
# ---------------------------------------------------------------------------

_GROUPING_ANALYTICS_ORACLE = """
SELECT
  o_orderstatus AS k1, o_orderpriority AS k2,
  round(sum(o_totalprice), 2) AS total,
  count(*)                    AS n,
  'rollup' AS src
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
UNION ALL
SELECT
  o_orderstatus AS k1, o_orderpriority AS k2,
  round(sum(o_totalprice), 2) AS total,
  count(*)                    AS n,
  'gsets' AS src
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
UNION ALL
SELECT
  l_returnflag AS k1, l_linestatus AS k2,
  round(sum(l_quantity), 2) AS total,
  count(*)                  AS n,
  'cube' AS src
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
UNION ALL
SELECT
  CAST(n_orders AS VARCHAR) AS k1, NULL AS k2,
  CAST(NULL AS DOUBLE) AS total,
  count(*)             AS n,
  'dist' AS src
FROM (
  SELECT c_custkey, count(o_orderkey) AS n_orders
  FROM customer LEFT JOIN orders ON o_custkey = c_custkey
  GROUP BY c_custkey
)
GROUP BY n_orders
"""

_GSETS_SQL = """
SELECT
  o_orderstatus AS k1, o_orderpriority AS k2,
  round(sum(o_totalprice), 2) AS total,
  count(*)                    AS n
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
"""


@register_extended("orders_grouping_analytics", oracle=_GROUPING_ANALYTICS_ORACLE, tags=("relational", "grouping"))
def orders_grouping_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (DataFrame .rollup API) + GROUPING SETS (SQL surface) +
    CUBE (DataFrame .cube API, over lineitem — formerly the standalone
    lineitem_cube entry) in one tagged union: all three grouping-
    analytics operators under one oracle, keys harmonized to (k1, k2)
    so the branches union (keeps the registry inside the driver's
    50-query gate; the rollup branch subsumes the former grand-total
    grouping set). The 'dist' branch (round 5) is the TPC-H Q13-style
    aggregate-of-aggregate: orders-per-customer (a LEFT join so
    zero-order customers keep their n_orders=0 row) re-aggregated
    into a customer-count distribution — two cascaded hash
    aggregations, the second over the first's (small) output."""
    orders = load_table(spark, sf_dir, "orders")
    rollup = (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("total"),
            F.count(F.lit(1)).alias("n"),
        )
        .withColumnsRenamed({"o_orderstatus": "k1", "o_orderpriority": "k2"})
        .withColumn("src", F.lit("rollup"))
    )
    register_views(spark, sf_dir)
    gsets = spark.sql(_GSETS_SQL).withColumn("src", F.lit("gsets"))
    li = load_table(spark, sf_dir, "lineitem")
    cube = (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("total"),
            F.count(F.lit(1)).alias("n"),
        )
        .withColumnsRenamed({"l_returnflag": "k1", "l_linestatus": "k2"})
        .withColumn("src", F.lit("cube"))
    )
    cust = load_table(spark, sf_dir, "customer")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    dist = (
        per_cust.groupBy("n_orders")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("n_orders").cast("string").alias("k1"),
            F.lit(None).cast("string").alias("k2"),
            F.lit(None).cast("double").alias("total"),
            "n",
            F.lit("dist").alias("src"),
        )
    )
    return rollup.unionByName(gsets).unionByName(cube).unionByName(dist)


# ---------------------------------------------------------------------------
# Pivot (conditional aggregation)
# ---------------------------------------------------------------------------

_PIVOT_STATS_ORACLE = """
SELECT
  l_returnflag,
  sum(l_quantity) FILTER (WHERE l_linestatus = 'O') AS qty_open,
  sum(l_quantity) FILTER (WHERE l_linestatus = 'F') AS qty_filled,
  count(*)        FILTER (WHERE l_linestatus = 'O') AS n_open,
  count(*)        FILTER (WHERE l_linestatus = 'F') AS n_filled,
  round(stddev_samp(l_quantity), 6)              AS qty_stddev,
  round(var_samp(l_extendedprice), 2)            AS price_var,
  round(corr(l_extendedprice, l_quantity), 6)    AS price_qty_corr,
  round(covar_samp(l_extendedprice, l_quantity), 4) AS price_qty_covar,
  count(DISTINCT l_partkey)                      AS n_parts,
  round(quantile_cont(l_quantity, 0.5), 4)       AS median_qty
FROM lineitem
GROUP BY l_returnflag
"""


# rotated out of the driver gate in r08 (long-green; extended sweep keeps the oracle)
@register_extended("lineitem_pivot_stats", oracle=_PIVOT_STATS_ORACLE, tags=("relational", "pivot", "agg"))
def lineitem_pivot_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (conditional aggregation via the .pivot operator) joined
    with the statistical-aggregate surface (stddev/var/corr/covar/
    count-distinct/exact median) — formerly the separate lineitem_pivot
    and lineitem_stats_agg entries; same l_returnflag grain, so they
    merge into one wide relation (equi-join of two 3-row aggregates,
    broadcast-trivial) under one oracle."""
    li = load_table(spark, sf_dir, "lineitem")
    pivoted = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum("l_quantity").alias("qty"), F.count(F.lit(1)).alias("n"))
    )
    # pivot yields NULL counts for absent (flag, status) combos; the
    # oracle's count(*) FILTER yields 0 — coalesce so both agree on
    # datasets where a combination is missing
    pivoted = pivoted.select(
        "l_returnflag",
        F.col("O_qty").alias("qty_open"),
        F.col("F_qty").alias("qty_filled"),
        F.coalesce("O_n", F.lit(0)).alias("n_open"),
        F.coalesce("F_n", F.lit(0)).alias("n_filled"),
    )
    stats = li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 6).alias("qty_stddev"),
        F.round(F.var_samp("l_extendedprice"), 2).alias("price_var"),
        F.round(F.corr("l_extendedprice", "l_quantity"), 6).alias("price_qty_corr"),
        F.round(F.covar_samp("l_extendedprice", "l_quantity"), 4).alias("price_qty_covar"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.round(F.percentile("l_quantity", 0.5), 4).alias("median_qty"),
    )
    return pivoted.join(stats, "l_returnflag")


@register("lineitem_approx_distinct", oracle=None, tags=("relational", "approx"))
def lineitem_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL-sketch distinct counting — algorithm-specific estimates, so no
    cross-engine oracle (rows-only check); accuracy asserted in unit tests."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.expr("approx_percentile(l_quantity, 0.5)").alias("approx_median"),
    )


# ---------------------------------------------------------------------------
# Array ops: split + explode + re-aggregate — formerly the standalone
# documents_token_counts entry; now the 'tokens' branch of
# documents_string_scalars (queries_scalars.py), merged to free a
# registry slot for the analytics gate. Same projection, same oracle.
# ---------------------------------------------------------------------------
