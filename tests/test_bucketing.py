"""Bucketed tables: co-located joins and aggregations without a
shuffle — the pre-partitioning strategy SCALE.md prescribes for
repeatedly-joined fact tables."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iot_sensor_data_pipeline_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    (
        orders.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("b_orders")
    )
    (
        lineitem.write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("b_lineitem")
    )
    return spark.table("b_orders"), spark.table("b_lineitem")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    b_orders, b_lineitem = bucketed_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = b_lineitem.join(b_orders, b_lineitem.l_orderkey == b_orders.o_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # both sides read pre-bucketed -> SortMergeJoin with ZERO exchanges
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        # and it still computes the right thing
        n = joined.count()
        direct = (
            load_table(spark, "/root/testdata/sf0.001", "lineitem")
            .join(
                load_table(spark, "/root/testdata/sf0.001", "orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .count()
        )
        assert n == direct
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_aggregation_has_no_shuffle(spark, bucketed_tables):
    _, b_lineitem = bucketed_tables
    agg = b_lineitem.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # grouping key == bucket key
