"""Bucketed materialization (operators/bucketing.py): the write-once /
join-shuffle-free-forever contract, asserted at the byte level."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iot_sensor_data_pipeline_spark.operators.bucketing import (
    bucketed_join,
    write_bucketed,
)
from iot_sensor_data_pipeline_spark.plans.metrics import shuffle_summary


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    fact = spark.range(50_000).select(
        (F.col("id") % 5000).alias("k"), (F.col("id") * 7 % 997).alias("v")
    )
    dim = spark.range(5000).select(
        F.col("id").alias("k"), F.concat(F.lit("n_"), F.col("id")).alias("name")
    )
    write_bucketed(fact, "bt_fact", ["k"], 8, sort_cols=["k"])
    write_bucketed(dim, "bt_dim", ["k"], 8, sort_cols=["k"])
    yield "bt_fact", "bt_dim"
    spark.sql("DROP TABLE IF EXISTS bt_fact")
    spark.sql("DROP TABLE IF EXISTS bt_dim")


def test_bucketed_join_zero_shuffle_bytes(spark, bucketed_tables):
    left, right = bucketed_tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, left, right, ["k"])
        s = shuffle_summary(joined)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert s.n_shuffles == 0
    assert s.shuffle_bytes == 0
    assert joined.count() == 50_000


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    left, right = bucketed_tables
    got = bucketed_join(spark, left, right, ["k"], how="left")
    want = spark.table(left).join(spark.table(right), ["k"], "left")
    assert (
        got.groupBy().agg(F.sum("v"), F.count("*")).collect()
        == want.groupBy().agg(F.sum("v"), F.count("*")).collect()
    )


def test_one_side_bucketed_shuffles_only_other_side(spark, bucketed_tables):
    left, _ = bucketed_tables
    other = spark.range(5000).select(
        F.col("id").alias("k"), F.lit("x").alias("tag")
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(left).join(other, ["k"])
        s = shuffle_summary(joined)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    # the 50k-row bucketed fact stays in place; only the 5k dim moves
    assert s.n_shuffles == 1
    assert s.shuffle_records <= 5000


def test_validation(spark):
    df = spark.range(10).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="n_buckets"):
        write_bucketed(df, "bt_bad", ["k"], 0)
    with pytest.raises(ValueError, match="keys"):
        write_bucketed(df, "bt_bad", [], 4)
