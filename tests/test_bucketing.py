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


def test_bucketed_band_index_probe_is_exchange_free_on_index_side(spark, sf_dir):
    """VERDICT r04 #4: a near-dup band index stored bucketed by
    (band_idx, band_hash) must sort-merge the batch probe with NO
    exchange on the index side — at 100 TB the index is the corpus-
    sized relation, and this is what makes probe cost independent of
    corpus size. Exactly ONE shuffle is allowed: the (small) batch
    delta repartitioning to the index's bucket layout."""
    from iot_sensor_data_pipeline_spark.operators.dedup import (
        hashed_shingles,
        minhash_band_index,
        minhash_signatures,
    )
    from iot_sensor_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    sigs = minhash_signatures(hashed_shingles(docs, "doc_id", "text", n=3))
    spark.sql("DROP TABLE IF EXISTS b_nd_bands")
    (
        minhash_band_index(sigs)
        .write.format("parquet")
        .bucketBy(8, "band_idx", "band_hash")
        .sortBy("band_idx", "band_hash")
        .saveAsTable("b_nd_bands")
    )

    # literal delta (its lineage must not add exchanges of its own —
    # the assertion is about the PROBE join's shape)
    delta = spark.createDataFrame(
        [(1_000_000 + n, n % 32, n * 7919) for n in range(50)],
        "i long, band_idx int, band_hash long",
    )

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        probe = delta.join(
            spark.table("b_nd_bands").select(
                F.col("id").alias("j"), "band_idx", "band_hash"
            ),
            ["band_idx", "band_hash"],
        ).select("i", "j")
        plan = probe._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "BroadcastExchange" not in plan
        # one exchange total: the delta side shuffling INTO the bucket
        # layout; zero on the index side
        assert plan.count("Exchange hashpartitioning") == 1, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS b_nd_bands")
