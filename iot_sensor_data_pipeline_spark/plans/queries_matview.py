"""Oracle-checked query for the incrementally-maintained aggregate
materialized view (``sources/matview.py``): a scratch copy of
``orders`` gets an MV, then a DELETE + key-moving UPDATE + MERGE-insert
chain (all with ``change_feed=True``), then ONE incremental refresh —
and the returned MV content is hash-compared against a DuckDB oracle
that re-derives the final aggregates as a pure ``GROUP BY`` over the
relationally-composed mutation chain. The engine under test maintains
the aggregate from row-image deltas (plus the dirty-group min/max
recompute the DELETE forces); the oracle never sees a delta — only the
relational meaning — so a hash match pins the whole IVM machinery.

Rounding contract: every value in play is exact at 2 decimal places
(TPC-H money + literal 2dp arithmetic), so ``round(.., 2)`` on both
sides absorbs the incremental float drift (~1e-9 absolute) without any
half-way-boundary risk.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iot_sensor_data_pipeline_spark.plans.registry import register, register_extended
from iot_sensor_data_pipeline_spark.sources.tables import load_table


def _scratch(prefix: str) -> str:
    return tempfile.mkdtemp(prefix=f"mvq_{prefix}_") + "/t"


_MV_ORACLE = """
WITH t1 AS (
  SELECT * FROM orders
  WHERE (o_orderstatus = 'F' AND o_totalprice < 80000) IS NOT TRUE
), t2 AS (
  SELECT
    CASE WHEN o_custkey % 13 = 0 THEN '9-MOVED'
         ELSE o_orderpriority END AS grp,
    CASE WHEN o_custkey % 13 = 0 THEN o_totalprice + 500.0
         ELSE o_totalprice END AS v
  FROM t1
  UNION ALL
  SELECT '9-NEW' AS grp, CAST(o_orderkey % 1000 AS DOUBLE) + 0.5 AS v
  FROM orders WHERE o_orderkey % 501 = 0
)
SELECT grp, COUNT(*) AS n_rows, COUNT(v) AS n_v,
       round(SUM(v), 2) AS sum_v,
       round(MIN(v), 2) AS min_v,
       round(MAX(v), 2) AS max_v
FROM t2 GROUP BY grp
"""


@register(  # rotated INTO the gate in r12 (third r12 rotation)
    "orders_incremental_mv", oracle=_MV_ORACLE, tags=("matview", "ivm")
)
def orders_incremental_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized ``GROUP BY o_orderpriority`` over a mutating orders
    table, maintained incrementally from the change feed: the DELETE
    removes low-price F-status rows (taking group minima with them —
    the dirty-group recompute path), the UPDATE moves every 13th
    customer's orders into a new '9-MOVED' group (pre-image subtracts,
    post-image adds across groups), and the MERGE inserts a synthetic
    '9-NEW' group. One refresh folds all three feed versions."""
    from iot_sensor_data_pipeline_spark.sources.matview import (
        create_agg_view,
        read_agg_view,
        refresh_agg_view,
    )
    from iot_sensor_data_pipeline_spark.sources.mutations import (
        delete_where,
        merge_into,
        update_where,
    )

    path = _scratch("t")
    mv = _scratch("mv")
    orders = load_table(spark, sf_dir, "orders")
    orders.repartition(6).write.parquet(path)
    create_agg_view(spark, path, mv, ["o_orderpriority"], "o_totalprice")
    delete_where(
        spark, path,
        (F.col("o_orderstatus") == "F") & (F.col("o_totalprice") < 80000),
        change_feed=True,
    )
    update_where(
        spark, path, F.col("o_custkey") % 13 == 0,
        {"o_orderpriority": F.lit("9-MOVED"),
         "o_totalprice": F.col("o_totalprice") + F.lit(500.0)},
        change_feed=True,
    )
    inserts = orders.where(F.col("o_orderkey") % 501 == 0).select(
        (F.col("o_orderkey") + F.lit(10_000_000)).alias("o_orderkey"),
        F.lit("9-NEW").alias("o_orderpriority"),
        ((F.col("o_orderkey") % 1000).cast("double") + F.lit(0.5))
        .alias("o_totalprice"),
    )
    merge_into(spark, path, inserts, on=["o_orderkey"], change_feed=True)
    refresh_agg_view(spark, path, mv)
    v = read_agg_view(spark, mv)
    return v.select(
        F.col("o_orderpriority").alias("grp"),
        "n_rows",
        "n_v",
        F.round("sum_v", 2).alias("sum_v"),
        F.round("min_v", 2).alias("min_v"),
        F.round("max_v", 2).alias("max_v"),
    )


_APPEND_MV_ORACLE = """
WITH t AS (
  SELECT * FROM orders
  WHERE (o_orderpriority = '1-URGENT' AND o_totalprice < 100000)
        IS NOT TRUE
)
SELECT o_orderstatus AS grp,
       COUNT(*) AS n_rows,
       COUNT(o_totalprice) AS n_price,
       round(SUM(o_totalprice), 2) AS sum_price,
       round(MIN(o_totalprice), 2) AS min_price,
       round(MAX(o_totalprice), 2) AS max_price,
       COUNT(o_custkey) AS n_cust,
       CAST(SUM(o_custkey) AS DOUBLE) AS sum_cust
FROM t GROUP BY o_orderstatus
"""


@register_extended(
    "orders_append_mv", oracle=_APPEND_MV_ORACLE,
    tags=("matview", "ivm", "appends"),
)
def orders_append_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The APPEND-absorption path of the incremental MV under an
    oracle: orders arrives as three epoch-idempotent sink batches
    (``e<N>-<lineage>-`` names), the MV is created after the FIRST
    epoch only, a refresh absorbs the two later epochs as insert
    deltas (no change feed involved), then a feed-carrying DELETE
    lands and a second refresh folds it — and the final two-measure MV
    (price + custkey moments per order status) hash-matches a pure
    GROUP BY over the filtered original table. The oracle never sees
    epochs, cursors, or deltas — only the relational meaning."""
    from iot_sensor_data_pipeline_spark.sources.matview import (
        create_agg_view,
        read_agg_view,
        refresh_agg_view,
    )
    from iot_sensor_data_pipeline_spark.sources.mutations import (
        delete_where,
    )
    from iot_sensor_data_pipeline_spark.sources.sinks import (
        parquet_batch_sink,
    )

    path = _scratch("ap_t")
    mv = _scratch("ap_mv")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderpriority",
        "o_totalprice", "o_custkey",
    )
    sink = parquet_batch_sink(path, checkpoint="/ckpt/APPEND_MV_Q")
    sink(orders.where(F.col("o_orderkey") % 3 == 0).coalesce(2), 0)
    create_agg_view(
        spark, path, mv, ["o_orderstatus"],
        ["o_totalprice", "o_custkey"],
    )
    sink(orders.where(F.col("o_orderkey") % 3 == 1).coalesce(2), 1)
    sink(orders.where(F.col("o_orderkey") % 3 == 2).coalesce(2), 2)
    refresh_agg_view(spark, path, mv)  # appends only, no feed
    delete_where(
        spark, path,
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_totalprice") < 100000),
        change_feed=True,
    )
    refresh_agg_view(spark, path, mv)  # feed only
    v = read_agg_view(spark, mv)
    return v.select(
        F.col("o_orderstatus").alias("grp"),
        "n_rows",
        F.col("n_o_totalprice").alias("n_price"),
        F.round("sum_o_totalprice", 2).alias("sum_price"),
        F.round("min_o_totalprice", 2).alias("min_price"),
        F.round("max_o_totalprice", 2).alias("max_price"),
        F.col("n_o_custkey").alias("n_cust"),
        F.col("sum_o_custkey").alias("sum_cust"),
    )


_HIST_MV_ORACLE = """
WITH t AS (
  SELECT * FROM lineitem
  WHERE (l_returnflag = 'A' AND l_quantity < 10) IS NOT TRUE
)
SELECT l_returnflag AS grp, COUNT(*) AS n_rows,
       COUNT(*) FILTER (WHERE l_quantity < 1) AS b0,
       COUNT(*) FILTER (WHERE l_quantity >= 1 AND l_quantity < 6) AS b1,
       COUNT(*) FILTER (WHERE l_quantity >= 6 AND l_quantity < 11) AS b2,
       COUNT(*) FILTER (WHERE l_quantity >= 11 AND l_quantity < 16) AS b3,
       COUNT(*) FILTER (WHERE l_quantity >= 16 AND l_quantity < 21) AS b4,
       COUNT(*) FILTER (WHERE l_quantity >= 21 AND l_quantity < 26) AS b5,
       COUNT(*) FILTER (WHERE l_quantity >= 26 AND l_quantity < 31) AS b6,
       COUNT(*) FILTER (WHERE l_quantity >= 31 AND l_quantity < 36) AS b7,
       COUNT(*) FILTER (WHERE l_quantity >= 36 AND l_quantity < 41) AS b8,
       COUNT(*) FILTER (WHERE l_quantity >= 41 AND l_quantity < 46) AS b9,
       COUNT(*) FILTER (WHERE l_quantity >= 46 AND l_quantity < 51) AS b10,
       COUNT(*) FILTER (WHERE l_quantity >= 51) AS b11
FROM t GROUP BY l_returnflag
"""


@register_extended(
    "lineitem_histogram_mv", oracle=_HIST_MV_ORACLE,
    tags=("matview", "ivm", "histogram"),
)
def lineitem_histogram_mv(spark, sf_dir):
    """Fixed-bin histogram measures under a cross-engine oracle: an MV
    over lineitem keyed by return flag carries a 10-bin l_quantity
    histogram ([1, 51), width 5, under/overflow bins); a feed-carrying
    DELETE folds in as EXACT integer bin subtractions (no dirty
    recompute for the histogram itself) and the final per-group counts
    hash-match DuckDB's COUNT(*) FILTER re-derivation bin by bin."""
    from iot_sensor_data_pipeline_spark.sources.matview import (
        create_agg_view,
        read_agg_partials,
        refresh_agg_view,
    )
    from iot_sensor_data_pipeline_spark.sources.mutations import (
        delete_where,
    )

    path = _scratch("h_t")
    mv = _scratch("h_mv")
    load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity",
        "l_extendedprice",
    ).repartition(8).write.parquet(path)
    create_agg_view(
        spark, path, mv, ["l_returnflag"], "l_extendedprice",
        histogram_cols={"l_quantity": (1.0, 51.0, 10)},
    )
    delete_where(
        spark, path,
        (F.col("l_returnflag") == "A") & (F.col("l_quantity") < 10),
        change_feed=True,
    )
    refresh_agg_view(spark, path, mv)
    parts = read_agg_partials(spark, mv)
    return parts.select(
        F.col("l_returnflag").alias("grp"),
        "n_rows",
        *[F.col(f"hist_l_quantity_{i}").alias(f"b{i}") for i in range(12)],
    )
