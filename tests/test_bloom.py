"""Bloom-filter join pruning (operators/bloom.py).

Contract under test:
- no false NEGATIVES ever (prune output is a superset of semi matches);
- bloom_semi_join / bloom_anti_join are EXACT (equal to plain joins),
  for both probe methods, single- and multi-column keys, null keys;
- measured false-positive rate tracks the theoretical fpp;
- the "join" probe path stays broadcast-only on the probe side (no
  sort-merge join, no shuffle of the probe relation).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from iot_sensor_data_pipeline_spark.operators.bloom import (
    bloom_anti_join,
    bloom_bits,
    bloom_params,
    bloom_prune,
    bloom_semi_join,
)
from iot_sensor_data_pipeline_spark.sources.tables import load_table


def _rows(df, cols):
    def key(t):
        return tuple((v is None, v if v is not None else 0) for v in t)

    return sorted((tuple(r[c] for c in cols) for r in df.collect()), key=key)


@pytest.fixture(scope="module")
def fact_and_keys(spark):
    # 20k fact rows over 2k ids; keys = 150 selected ids (~7.5% match)
    fact = spark.range(20_000).select(
        (F.col("id") % 2000).alias("k"),
        (F.col("id") * 37 % 101).alias("v"),
    )
    keys = spark.range(150).select((F.col("id") * 13 + 7).alias("k"))
    return fact, keys


@pytest.mark.parametrize("method", ["join", "pandas"])
def test_semi_join_exact(spark, fact_and_keys, method):
    fact, keys = fact_and_keys
    got = bloom_semi_join(fact, keys, ["k"], m_bits=1 << 14, n_hashes=5, method=method)
    want = fact.join(keys, ["k"], "semi")
    assert _rows(got, ["k", "v"]) == _rows(want, ["k", "v"])


@pytest.mark.parametrize("method", ["join", "pandas"])
def test_anti_join_exact(spark, fact_and_keys, method):
    fact, keys = fact_and_keys
    got = bloom_anti_join(fact, keys, ["k"], m_bits=1 << 14, n_hashes=5, method=method)
    want = fact.join(keys, ["k"], "anti")
    assert _rows(got, ["k", "v"]) == _rows(want, ["k", "v"])


@pytest.mark.parametrize("method", ["join", "pandas"])
def test_prune_is_superset_and_noisy_only_by_fpp(spark, fact_and_keys, method):
    fact, keys = fact_and_keys
    pruned = bloom_prune(
        fact, keys, ["k"], m_bits=1 << 14, n_hashes=5, method=method
    )
    matches = set(r.k for r in fact.join(keys, ["k"], "semi").select("k").collect())
    kept = [r.k for r in pruned.select("k").collect()]
    assert matches <= set(kept), "bloom produced a false negative"
    # theoretical fpp for m=16384, g=5, n=150 distinct keys
    n = 150
    m, g = 1 << 14, 5
    fpp = (1 - math.exp(-g * n / m)) ** g
    non_match_rows = fact.count() - fact.join(keys, ["k"], "semi").count()
    false_pos = len(kept) - sum(1 for k in kept if k in matches)
    assert false_pos / max(non_match_rows, 1) < max(4 * fpp, 0.01)


@pytest.mark.parametrize("method", ["join", "pandas"])
def test_multi_column_keys_and_nulls(spark, method):
    fact = spark.createDataFrame(
        [(1, "a", 10), (1, None, 11), (2, "b", 12), (None, "a", 13), (3, "c", 14)],
        "x int, y string, v int",
    )
    keys = spark.createDataFrame(
        [(1, "a"), (3, "c"), (None, "a")], "x int, y string"
    )
    for fn, how in ((bloom_semi_join, "semi"), (bloom_anti_join, "anti")):
        got = fn(fact, keys, ["x", "y"], m_bits=1 << 10, n_hashes=4, method=method)
        want = fact.join(keys, ["x", "y"], how)
        assert _rows(got, ["x", "y", "v"]) == _rows(want, ["x", "y", "v"])


def test_join_path_plan_is_broadcast_only(spark, fact_and_keys):
    fact, keys = fact_and_keys
    plan = bloom_prune(
        fact, keys, ["k"], m_bits=1 << 14, n_hashes=5, method="join"
    )._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_bloom_bits_is_small_relation(spark, fact_and_keys):
    _, keys = fact_and_keys
    words = bloom_bits(keys, ["k"], m_bits=1 << 12, n_hashes=5)
    rows = words.collect()
    assert 0 < len(rows) <= (1 << 12) // 64
    assert set(words.columns) == {"word", "bits"}
    assert all(0 <= r.word < (1 << 12) // 64 for r in rows)


def test_params_helper():
    m, g = bloom_params(1_000_000, 0.01)
    # textbook optimum: ~9.59 bits/key, ~7 hashes at 1% fpp
    assert 9 * 1_000_000 <= m <= 10.5 * 1_000_000
    assert g == 7
    assert m % 64 == 0
    with pytest.raises(ValueError):
        bloom_params(0)
    with pytest.raises(ValueError):
        bloom_params(10, 1.5)


def test_auto_sizing_from_expected_keys(spark, fact_and_keys):
    fact, keys = fact_and_keys
    got = bloom_semi_join(fact, keys, ["k"], expected_keys=150, fpp=0.001)
    want = fact.join(keys, ["k"], "semi")
    assert got.count() == want.count()


def test_validation_errors(spark, fact_and_keys):
    fact, keys = fact_and_keys
    with pytest.raises(ValueError, match="m_bits or expected_keys"):
        bloom_prune(fact, keys, ["k"])
    with pytest.raises(ValueError, match="method"):
        bloom_prune(fact, keys, ["k"], m_bits=1 << 10, method="magic")
    with pytest.raises(ValueError, match="absent"):
        bloom_prune(fact, keys, ["nope"], m_bits=1 << 10)
    with pytest.raises(ValueError, match="n_hashes"):
        bloom_prune(fact, keys, ["k"], m_bits=1 << 10, n_hashes=99)


def test_sf_tables_semi_join_parity(spark, sf_dir):
    """lineitem pruned against high-value orders: exact parity with the
    plain semi join on real testdata tables."""
    li = load_table(spark, sf_dir, "lineitem")
    big_orders = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > 200000)
        .select(F.col("o_orderkey").alias("l_orderkey"))
    )
    got = bloom_semi_join(li, big_orders, ["l_orderkey"], m_bits=1 << 16, n_hashes=6)
    want = li.join(big_orders, ["l_orderkey"], "semi")
    assert got.count() == want.count()
    g = got.agg(F.sum("l_quantity").alias("s"), F.count("*").alias("c")).collect()[0]
    w = want.agg(F.sum("l_quantity").alias("s"), F.count("*").alias("c")).collect()[0]
    assert (g.s, g.c) == (w.s, w.c)
