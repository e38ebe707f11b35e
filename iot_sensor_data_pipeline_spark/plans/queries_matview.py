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

from iot_sensor_data_pipeline_spark.plans.registry import register
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
