"""Full TPC-H-shape relational suite (q2/4/7/8/9/11/12/13/15/16/17/18/
19/20/21/22), adapted to the testdata's reduced schema.

These complete the relational surface beyond the driver-gated
q1/3/5/6/10/14: correlated min subqueries (q2), EXISTS semi-joins (q4),
multi-nation join pair filters (q7), market-share CASE ratios (q8),
LIKE-filtered profit rollups (q9), HAVING-vs-global-scalar (q11),
CASE-counting (q12), outer-join distributions (q13), view + scalar-max
(q15), NOT-IN + count-distinct (q16), correlated-avg (q17), HAVING-IN
(q18), OR-of-ANDs pushdown (q19), nested IN (q20), EXISTS+NOT-EXISTS
(q21), and anti-join + scalar-avg (q22).

The testdata schema drops ``partsupp``, comments, ship modes, and
commit/receipt dates, so queries that depend on them are adapted while
keeping the plan shape that makes each query interesting (the
adaptation is noted per query). Registered via ``register_extended`` —
the driver gate is capped at 50 slots, so these are hash-checked
against DuckDB by tests/test_tpch_full.py using the identical
differential contract (tests/oracle_harness.py).

Float policy mirrors queries_relational.py: SUM/AVG round at 4, ratios
at 6; comparisons that gate row membership compare identically-rounded
values on both sides so summation-order noise cannot flip membership.

Scale notes: every dimension (supplier, nation, region, filtered part)
broadcasts; fact-fact joins (orders x lineitem) shuffle on the order
key; scalar subqueries materialize as 1-row broadcast relations, never
driver collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iot_sensor_data_pipeline_spark.plans.registry import register, register_extended
from iot_sensor_data_pipeline_spark.sources.tables import load_table


def _ts(lit: str) -> F.Column:
    return F.lit(lit).cast("timestamp_ntz")


# ---------------------------------------------------------------------------
# Q2 (adapted): min-cost supplier per part via correlated min subquery.
# No partsupp table -> unit cost is derived from lineitem as
# min(l_extendedprice / l_quantity) per (part, supplier); the correlated
# "cost = (SELECT min(...) ... WHERE same part AND region)" shape is kept.
# ---------------------------------------------------------------------------

_Q2_ORACLE = """
WITH supply AS (
  SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
), eu AS (
  SELECT s_suppkey, s_acctbal, s_name, n_name
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
                JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
       round(unit_cost, 4) AS unit_cost
FROM part
JOIN supply ON p_partkey = supply.l_partkey
JOIN eu     ON eu.s_suppkey = supply.l_suppkey
WHERE p_size = 15 AND p_type = 'LARGE'
  AND unit_cost = (
    SELECT min(s2.unit_cost)
    FROM supply s2 JOIN eu e2 ON e2.s_suppkey = s2.l_suppkey
    WHERE s2.l_partkey = supply.l_partkey
  )
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


@register_extended("tpch_q2_min_cost_supplier", oracle=_Q2_ORACLE, tags=("relational", "subquery"))
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supply = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    eu = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(load_table(spark, sf_dir, "nation")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(load_table(spark, sf_dir, "region")).where(F.col("r_name") == "EUROPE"),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    # supplier is tiny at every SF (10k rows/SF) -> broadcast; the
    # correlated min is a WINDOW over l_partkey, so the fact table is
    # scanned once and the supply relation is consumed once (the
    # agg-then-join-back formulation scans lineitem twice)
    supply_eu = supply.join(F.broadcast(eu), supply.l_suppkey == eu.s_suppkey)
    part = F.broadcast(
        load_table(spark, sf_dir, "part").where((F.col("p_size") == 15) & (F.col("p_type") == "LARGE"))
    )
    w = Window.partitionBy("l_partkey")
    out = (
        supply_eu.withColumn("min_cost", F.min("unit_cost").over(w))
        .where(F.col("unit_cost") == F.col("min_cost"))
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
                F.round("unit_cost", 4).alias("unit_cost"))
    )
    return out.orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey").limit(100)


# ---------------------------------------------------------------------------
# Q4 (adapted): order-priority checking via EXISTS semi-join. No
# commit/receipt dates -> "late" means a line shipped >30 days after the
# order date; the EXISTS -> left-semi non-equi join shape is kept.
# ---------------------------------------------------------------------------

_Q4_ORACLE = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01'
  AND o_orderdate <  TIMESTAMP '1996-10-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 30 DAY
  )
GROUP BY o_orderpriority
"""


@register_extended("tpch_q4_priority_check", oracle=_Q4_ORACLE, tags=("relational", "semi"))
def tpch_q4_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ts("1996-07-01")) & (F.col("o_orderdate") < _ts("1996-10-01"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
    )
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# ---------------------------------------------------------------------------
# Q7: volume shipping between two nations (exact shape; nation names are
# the testdata's NATION_i).
# ---------------------------------------------------------------------------

_Q7_ORACLE = """
SELECT supp_nation, cust_nation, l_year, round(sum(volume), 4) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         year(l_shipdate) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
) shipping
GROUP BY supp_nation, cust_nation, l_year
"""


@register_extended("tpch_q7_nation_volume", oracle=_Q7_ORACLE, tags=("relational", "join"))
def tpch_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate").between(_ts("1996-01-01"), _ts("1997-12-31"))
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    # supplier side broadcasts (10k rows/SF); the two-nation customer
    # slice shuffles with orders on the customer key.
    j = (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .where(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return j.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
    ).agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"))


# ---------------------------------------------------------------------------
# Q8: national market share within a region for one part type.
# ---------------------------------------------------------------------------

_Q8_ORACLE = """
SELECT o_year,
       round(sum(CASE WHEN nation = 'NATION_5' THEN volume ELSE 0 END) / sum(volume), 6)
         AS mkt_share
FROM (
  SELECT year(o_orderdate) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n2.n_name AS nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region    ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA'
    AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
    AND p_type = 'PROMO'
) all_nations
GROUP BY o_year
"""


@register_extended("tpch_q8_market_share", oracle=_Q8_ORACLE, tags=("relational", "join"))
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    part = load_table(spark, sf_dir, "part").where(F.col("p_type") == "PROMO").select("p_partkey")
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    cust_region = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(nation.join(F.broadcast(region),
                                      F.col("n_regionkey") == F.col("r_regionkey"))
                          .select("n_nationkey")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey")
    )
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate").between(_ts("1996-01-01"), _ts("1997-12-31"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    j = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust_region, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return j.groupBy(F.year("o_orderdate").alias("o_year")).agg(
        F.round(
            F.sum(F.when(F.col("nation") == "NATION_5", vol).otherwise(F.lit(0.0)))
            / F.sum(vol),
            6,
        ).alias("mkt_share")
    )


# ---------------------------------------------------------------------------
# Q9 (adapted): product-type profit. No ps_supplycost -> profit is the
# discounted revenue; the LIKE-filtered part join + nation/year rollup
# shape is kept.
# ---------------------------------------------------------------------------

_Q9_ORACLE = """
SELECT nation, o_year, round(sum(amount), 4) AS sum_profit
FROM (
  SELECT n_name AS nation, year(o_orderdate) AS o_year,
         l_extendedprice * (1 - l_discount) AS amount
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE p_name LIKE '%gear%'
) profit
GROUP BY nation, o_year
"""


@register_extended(  # rotated out of the gate in r11 (4 rounds hash-green)
    "tpch_q9_product_profit", oracle=_Q9_ORACLE, tags=("relational", "join")
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%gear%")).select(
        "p_partkey"
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(load_table(spark, sf_dir, "nation")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    j = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
    )
    return j.groupBy("nation", F.year("o_orderdate").alias("o_year")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("sum_profit")
    )


# ---------------------------------------------------------------------------
# Q12 (adapted): priority CASE-counting by lateness bucket. No ship
# modes or commit/receipt dates -> the GROUP BY key is "shipped >60 days
# after order date"; the high/low CASE-count shape is kept.
# ---------------------------------------------------------------------------

_Q12_ORACLE = """
SELECT (l_shipdate > o_orderdate + INTERVAL 60 DAY) AS late,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
         AS high_line_count,
       sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
         AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY late
"""


@register_extended("tpch_q12_priority_lateness", oracle=_Q12_ORACLE, tags=("relational", "agg"))
def tpch_q12_priority_lateness(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1997-01-01")) & (F.col("l_shipdate") < _ts("1998-01-01"))
    ).select("l_orderkey", "l_shipdate")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    j = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return j.groupBy(
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")).alias("late")
    ).agg(
        F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
        F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
    )


# ---------------------------------------------------------------------------
# Q13: customer order-count distribution via LEFT OUTER JOIN with a
# right-side predicate (no o_comment -> the excluded slice is urgent
# orders).
# ---------------------------------------------------------------------------

_Q13_ORACLE = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
"""


@register_extended("tpch_q13_order_distribution", oracle=_Q13_ORACLE, tags=("relational", "outer"))
def tpch_q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# ---------------------------------------------------------------------------
# Q15: top supplier by quarterly revenue — revenue view + scalar-max
# subquery as a 1-row broadcast join, never a driver collect.
# ---------------------------------------------------------------------------

_Q15_ORACLE = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
"""


@register_extended("tpch_q15_top_supplier", oracle=_Q15_ORACLE, tags=("relational", "subquery"))
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1996-01-01")) & (F.col("l_shipdate") < _ts("1996-04-01"))
    )
    # checkpoint the per-supplier aggregate (10k rows/SF): it feeds both
    # the max and the equality probe, and rescanning lineitem for each
    # would double the fact-scan count
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "total_revenue"
            )
        )
        .localCheckpoint()
    )
    # both sides round to 4 dp before the equality, so summation-order
    # noise cannot create a cross-engine membership difference
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(F.broadcast(max_rev), F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# ---------------------------------------------------------------------------
# Q11 (adapted): important stock. No partsupp -> a part's "value" for
# NATION_7's suppliers is its shipped extendedprice total; the
# HAVING-vs-global-scalar-subquery shape is kept. Both engines round the
# global total to 2 dp (exact: money sums are exact decimals at 2 dp)
# before scaling, so the threshold is the identical double on each side.
# ---------------------------------------------------------------------------

_Q11_ORACLE = """
WITH li AS (
  SELECT l_partkey, l_extendedprice
  FROM lineitem
  WHERE l_suppkey IN (
    SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_7'
  )
)
SELECT l_partkey, round(sum(l_extendedprice), 4) AS value
FROM li
GROUP BY l_partkey
HAVING round(sum(l_extendedprice), 4) >
       round((SELECT sum(l_extendedprice) FROM li), 2) * 0.001
"""


@register_extended("tpch_q11_important_stock", oracle=_Q11_ORACLE, tags=("relational", "subquery"))
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(load_table(spark, sf_dir, "nation")).where(F.col("n_name") == "NATION_7"),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .select("l_partkey", "l_extendedprice")
    )
    # one fact scan: the global total is the sum of the per-part sums
    # (identical after the 2-dp rounding, which recovers the exact
    # decimal total); per_part is consumed twice so checkpoint the
    # aggregated (#parts-sized) relation instead of rescanning lineitem
    per_part = (
        li.groupBy("l_partkey")
        .agg(F.sum("l_extendedprice").alias("raw_value"))
        .localCheckpoint()
    )
    thresh = per_part.agg(
        (F.round(F.sum("raw_value"), 2) * F.lit(0.001)).alias("thresh")
    )
    return (
        per_part.withColumn("value", F.round("raw_value", 4))
        .join(F.broadcast(thresh), F.col("value") > F.col("thresh"))
        .select("l_partkey", "value")
    )


# ---------------------------------------------------------------------------
# Q16 (adapted): parts/supplier relationship. No partsupp -> the
# part-supplier relation is derived from lineitem; no s_comment -> the
# NOT-IN excluded set is negative-balance suppliers. Keeps
# NOT-IN-subquery + count(DISTINCT) over a multi-attribute group.
# ---------------------------------------------------------------------------

_Q16_ORACLE = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
  AND p_size IN (1, 5, 15, 25, 35, 45)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
GROUP BY p_brand, p_type, p_size
"""


@register_extended("tpch_q16_part_supplier_cnt", oracle=_Q16_ORACLE, tags=("relational", "anti"))
def tpch_q16_part_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 15, 25, 35, 45)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad_supp = load_table(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0.0).select(
        "s_suppkey"
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .join(F.broadcast(bad_supp), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# Q17: small-quantity-order revenue via correlated per-part average.
# Both engines round the 0.5*avg threshold to 6 dp so summation-order
# noise in avg() cannot flip a row's membership.
# ---------------------------------------------------------------------------

_Q17_ORACLE = """
SELECT round(sum(l_extendedprice) / 7.0, 4) AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#3'
  AND l_quantity < (
    SELECT round(0.5 * avg(l_quantity), 6)
    FROM lineitem l2 WHERE l2.l_partkey = p_partkey
  )
"""


@register_extended("tpch_q17_small_quantity", oracle=_Q17_ORACLE, tags=("relational", "subquery"))
def tpch_q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#3").select(
        "p_partkey"
    )
    # the correlated avg touches ALL lineitems of the brand's parts, so
    # restrict to those parts first (semi join), then express the
    # per-part threshold as a WINDOW over l_partkey — one fact scan and
    # one shuffle, where the agg-then-join-back formulation scans the
    # fact twice
    li_brand = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
    w = Window.partitionBy("l_partkey")
    return (
        li_brand.withColumn(
            "qty_thresh", F.round(F.lit(0.5) * F.avg("l_quantity").over(w), 6)
        )
        .where(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(F.round(F.sum("l_extendedprice") / F.lit(7.0), 4).alias("avg_yearly"))
    )


# ---------------------------------------------------------------------------
# Q18: large-volume customers — HAVING-gated IN subquery on the same
# fact table. Quantities are integral doubles, so sums are exact and the
# >150 gate is noise-free.
# ---------------------------------------------------------------------------

_Q18_ORACLE = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       sum(l_quantity) AS total_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150
)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
LIMIT 100
"""


@register_extended("tpch_q18_large_volume", oracle=_Q18_ORACLE, tags=("relational", "semi"))
def tpch_q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    big = li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("total_qty")).where(
        F.col("total_qty") > 150
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    # `big` carries the already-aggregated per-order quantity, so the
    # IN-subquery join is also the aggregate — lineitem is scanned once
    out = (
        orders.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty")
    )
    return out.orderBy(F.col("o_totalprice").desc(), "o_orderdate", "o_orderkey").limit(100)


# ---------------------------------------------------------------------------
# Q19: discounted revenue over an OR-of-ANDs predicate (brand x size x
# quantity bands). The disjunction must reach the scan as a pushed
# filter on the part side and stay a single-pass join — no union of
# three scans.
# ---------------------------------------------------------------------------

_Q19_ORACLE = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 5
       AND l_quantity >= 1 AND l_quantity <= 11)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 10
       AND l_quantity >= 10 AND l_quantity <= 20)
   OR (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 15
       AND l_quantity >= 20 AND l_quantity <= 30)
"""


@register_extended("tpch_q19_disjunctive_revenue", oracle=_Q19_ORACLE, tags=("relational", "filter"))
def tpch_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # pre-filter part to the union of brand/size bands (prunes the
    # broadcast), keep the full disjunction as the post-join filter
    part = load_table(spark, sf_dir, "part").where(
        ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 5))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 10))
        | ((F.col("p_brand") == "Brand#4") & F.col("p_size").between(1, 15))
    ).select("p_partkey", "p_brand", "p_size")
    li = load_table(spark, sf_dir, "lineitem")
    j = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    cond = (
        ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 5)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 10)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#4") & F.col("p_size").between(1, 15)
           & F.col("l_quantity").between(20, 30))
    )
    return j.where(cond).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue")
    )


# ---------------------------------------------------------------------------
# Q20 (adapted): supplier promotion candidates via nested IN. No
# partsupp/availqty -> the inner relation is per-(supplier, part)
# shipped quantity of 'red%' parts in 1996 exceeding a budget; keeps the
# IN (GROUP BY ... HAVING) -> semi-join pipeline.
# ---------------------------------------------------------------------------

_Q20_ORACLE = """
SELECT s_name, s_suppkey
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_3'
  AND s_suppkey IN (
    SELECT l_suppkey
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_name LIKE 'red%'
      AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_suppkey, l_partkey
    HAVING sum(l_quantity) > 50
  )
"""


@register_extended("tpch_q20_promotion_suppliers", oracle=_Q20_ORACLE, tags=("relational", "semi"))
def tpch_q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").where(F.col("p_name").like("red%")).select(
        "p_partkey"
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1996-01-01")) & (F.col("l_shipdate") < _ts("1997-01-01"))
    )
    inner = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .where(F.col("qty") > 50)
        .select("l_suppkey")
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(load_table(spark, sf_dir, "nation")).where(F.col("n_name") == "NATION_3"),
              F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return supp.join(inner, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi").select(
        "s_name", "s_suppkey"
    )


# ---------------------------------------------------------------------------
# Q21 (adapted): suppliers who kept orders waiting. No receipt/commit
# dates -> "late" is shipping >90 days after the order date. The oracle
# keeps the classic EXISTS + NOT EXISTS formulation as the semantic
# spec; the Spark side deliberately does NOT translate it (that costs
# three scans of the fact table: l1 + a semi probe + an anti probe).
# Instead it computes per-(order, supplier) late-line counts and
# per-order supplier statistics in one scan — a row qualifies iff its
# order has >= 2 suppliers and exactly ONE late supplier (necessarily
# itself, since the row is late). Equivalence with the EXISTS form is
# what the differential test checks.
# ---------------------------------------------------------------------------

_Q21_ORACLE = """
SELECT s_name, count(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders    ON o_orderkey = l1.l_orderkey
JOIN nation    ON s_nationkey = n_nationkey
WHERE o_orderstatus = 'F' AND n_name = 'NATION_4'
  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


@register_extended("tpch_q21_waiting_suppliers", oracle=_Q21_ORACLE, tags=("relational", "anti"))
def tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(load_table(spark, sf_dir, "nation")).where(F.col("n_name") == "NATION_4"),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name")
    )
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    j = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
    per_os = j.groupBy("l_orderkey", "l_suppkey").agg(
        F.sum(F.when(late, 1).otherwise(0)).alias("n_late_lines")
    )
    w = Window.partitionBy("l_orderkey")
    stats = per_os.select(
        "*",
        F.count(F.lit(1)).over(w).alias("n_suppliers"),
        F.sum((F.col("n_late_lines") > 0).cast("int")).over(w).alias("n_late_suppliers"),
    )
    qual = stats.where(
        (F.col("n_late_lines") > 0)
        & (F.col("n_suppliers") >= 2)
        & (F.col("n_late_suppliers") == 1)
    )
    return (
        qual.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.sum("n_late_lines").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q22 (adapted): global sales opportunity. No c_phone -> the country
# grouping key is the market segment; keeps scalar-avg subquery +
# NOT-EXISTS anti join. The avg threshold is rounded to 6 dp on both
# sides; balances are 2 dp so membership cannot straddle the rounding.
# ---------------------------------------------------------------------------

_Q22_ORACLE = """
WITH active AS (
  SELECT c_mktsegment, c_acctbal, c_custkey FROM customer
  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY', 'AUTOMOBILE')
)
SELECT c_mktsegment, count(*) AS numcust, round(sum(c_acctbal), 4) AS totacctbal
FROM active
WHERE c_acctbal > (SELECT round(avg(c_acctbal), 6) FROM active WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment
"""


@register_extended("tpch_q22_sales_opportunity", oracle=_Q22_ORACLE, tags=("relational", "anti"))
def tpch_q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    active = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY", "AUTOMOBILE")
    ).select("c_mktsegment", "c_acctbal", "c_custkey")
    thresh = active.where(F.col("c_acctbal") > 0.0).agg(
        F.round(F.avg("c_acctbal"), 6).alias("avg_bal")
    )
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    return (
        active.join(F.broadcast(thresh), F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("numcust"),
             F.round(F.sum("c_acctbal"), 4).alias("totacctbal"))
    )
