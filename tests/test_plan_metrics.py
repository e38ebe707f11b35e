"""Runtime shuffle-byte assertions (plans/metrics.py): measured
evidence for the operators whose 100 TB story is "the big side never
shuffles"."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iot_sensor_data_pipeline_spark.plans.metrics import (
    executed_metrics,
    shuffle_summary,
)
from iot_sensor_data_pipeline_spark.sources.tables import load_table


def test_groupby_shuffles_measurably(spark):
    s = shuffle_summary(
        spark.range(200_000).groupBy((F.col("id") % 1000).alias("k")).count()
    )
    assert s.n_shuffles == 1
    assert s.shuffle_bytes > 0
    assert s.shuffle_records > 0


def test_scan_filter_shuffles_zero_bytes(spark, sf_dir_mid):
    docs = load_table(spark, sf_dir_mid, "documents")
    s = shuffle_summary(docs.where(F.length("text") > 500).select("doc_id", "lang"))
    assert s.n_shuffles == 0
    assert s.shuffle_bytes == 0


def test_weighted_mix_is_shuffle_free_at_runtime(spark, sf_dir_mid):
    """The mixing filter's scale claim, measured: ZERO shuffle bytes."""
    from iot_sensor_data_pipeline_spark.operators.curation import weighted_mix

    docs = load_table(spark, sf_dir_mid, "documents")
    mixed = weighted_mix(
        docs, "lang", {"en": 0.5, "de": 1.0}, id_col="doc_id", default_rate=0.25
    )
    s = shuffle_summary(mixed)
    assert s.n_shuffles == 0
    assert s.shuffle_bytes == 0


def test_broadcast_join_no_shuffle(spark, sf_dir_mid):
    orders = load_table(spark, sf_dir_mid, "orders")
    cust = load_table(spark, sf_dir_mid, "customer").select("c_custkey", "c_name")
    s = shuffle_summary(
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    )
    assert s.n_shuffles == 0
    assert s.n_broadcasts == 1
    assert s.broadcast_bytes > 0


def test_bloom_prune_shuffles_only_the_filter(spark):
    """The fact side's rows never hit a shuffle: the only exchange is
    the packed bloom words (~KBs), orders of magnitude below the fact
    relation the equivalent sort-merge semi join would shuffle."""
    from iot_sensor_data_pipeline_spark.operators.bloom import bloom_prune

    fact = spark.range(300_000).select(
        (F.col("id") % 50_000).alias("k"), F.col("id").alias("v")
    )
    keys = spark.range(500).select((F.col("id") * 97 + 1).alias("k"))

    pruned = bloom_prune(fact, keys, ["k"], m_bits=1 << 14, n_hashes=5)
    s = shuffle_summary(pruned)
    # RECORDS are the structural invariant (partial bit-OR rows: at
    # most one row per packed word per map task — exact and
    # environment-independent). BYTES of the same records vary with
    # shuffle-codec buffer state across a long-lived session (observed
    # 41.5 KiB cold vs 74.9 KiB after hundreds of suite jobs), so the
    # byte bound keeps headroom and the 100 TB claim is pinned by the
    # RELATIVE comparison below, not the absolute.
    words_cap = (1 << 14) // 64 * 64  # every packed word x map tasks
    assert s.shuffle_records <= words_cap
    assert s.shuffle_bytes < 256 * 1024

    # reference point: the same semi join forced through sort-merge
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plain = fact.join(keys, ["k"], "semi")
        s_plain = shuffle_summary(plain)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    # ~300k fact rows shuffle vs ~2k packed-word rows: two orders of
    # magnitude in records, one-plus in bytes
    assert s_plain.shuffle_records > 100 * s.shuffle_records
    assert s_plain.shuffle_bytes > 10 * s.shuffle_bytes


def test_executed_metrics_exposes_nodes(spark):
    nodes = executed_metrics(spark.range(10).groupBy().count())
    names = [n.name for n in nodes]
    assert any("HashAggregate" in n for n in names)
    assert all(isinstance(n.metrics, dict) for n in nodes)


def test_reused_exchange_not_double_counted(spark):
    """Self-join over one aggregation: the exchange is built once and
    reused; bytes must be charged once."""
    agg = spark.range(100_000).groupBy((F.col("id") % 256).alias("k")).count()
    joined = agg.alias("a").join(agg.alias("b"), "k").where(F.col("a.count") >= 0)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        s = shuffle_summary(joined)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    single = shuffle_summary(
        spark.range(100_000).groupBy((F.col("id") % 256).alias("k")).count()
    )
    # the self-join's exchanges: one build for the agg (reused) + the
    # two join-side repartitions at most; reuse keeps total bounded
    assert s.shuffle_bytes < 6 * max(single.shuffle_bytes, 1)
