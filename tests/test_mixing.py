"""Data mixing (operators/mixing.py): budget-cap semantics, weight
normalization, determinism/stability properties of the md5 order,
split fractions and leak-proofness, guards, DuckDB differential."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from iot_sensor_data_pipeline_spark.operators.mixing import (
    _hex_threshold,
    mixture_sample,
    split_by_hash,
)


def _docs(spark, n=60, domains=("a", "b", "c")):
    rows = [
        (i, domains[i % len(domains)], "tok " * (5 + i % 7))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def _ref_mix(rows, weights, budget):
    """Python reference: md5-ordered greedy prefix per domain."""
    wsum = sum(weights.values())
    budgets = {d: int(budget * w / wsum) for d, w in weights.items()}
    out = set()
    for d, b in budgets.items():
        cum = 0
        dom = sorted(
            (r for r in rows if r[1] == d),
            key=lambda r: (hashlib.md5(str(r[0]).encode()).hexdigest(), r[0]),
        )
        for i, toks, _ in ((r[0], len(r[2].split()), r) for r in dom):
            cum += toks
            if cum > b:
                break
            out.add(i)
    return out


def test_mixture_matches_python_reference(spark):
    df = _docs(spark)
    rows = [(r.doc_id, r.source, r.text) for r in df.collect()]
    weights = {"a": 2.0, "b": 1.0}
    got = {
        r.doc_id for r in mixture_sample(df, weights, 100).collect()
    }
    assert got == _ref_mix(rows, weights, 100)
    assert len(got) > 0
    # domain c excluded (no weight)
    assert all(i % 3 != 2 for i in got)


def test_budget_is_hard_cap_per_domain(spark):
    df = _docs(spark)
    out = mixture_sample(df, {"a": 1.0, "b": 1.0}, 60)
    per = {
        r.source: r.t
        for r in out.groupBy("source").agg(F.sum("n_tokens").alias("t")).collect()
    }
    assert all(t <= 30 for t in per.values())


def test_mixture_is_stable_under_corpus_growth(spark):
    """Adding documents never evicts an already-chosen one unless the
    new doc hashes EARLIER in its domain — the md5 order is a fixed
    permutation, so the chosen set changes only at the budget frontier,
    not wholesale (the reproducibility property random sampling lacks)."""
    small = _docs(spark, n=30)
    big = _docs(spark, n=60)
    w = {"a": 1.0}
    picked_small = {r.doc_id for r in mixture_sample(small, w, 80).collect()}
    picked_big = {r.doc_id for r in mixture_sample(big, w, 80).collect()}
    # every doc in both corpora that the big run picked AND hashes
    # before the small run's frontier is also in the small run
    assert picked_big & set(range(30)) <= picked_small


def test_mixture_partitioning_invariance(spark):
    df = _docs(spark)
    w = {"a": 3.0, "b": 1.0, "c": 1.0}
    a = sorted(r.doc_id for r in mixture_sample(df.repartition(1), w, 120).collect())
    b = sorted(r.doc_id for r in mixture_sample(df.repartition(13), w, 120).collect())
    assert a == b


def test_mixture_precomputed_token_col(spark):
    df = _docs(spark).withColumn("n_tok", F.size(F.split("text", " ")) - 1)
    out = mixture_sample(
        df, {"a": 1.0}, 50, token_count_col="n_tok"
    )
    assert out.count() > 0 and "mix_rank" in out.columns


def test_mixture_guards(spark):
    df = _docs(spark)
    with pytest.raises(ValueError, match="token_budget"):
        mixture_sample(df, {"a": 1.0}, -1)
    with pytest.raises(ValueError, match="non-empty"):
        mixture_sample(df, {}, 10)
    with pytest.raises(ValueError, match="non-negative"):
        mixture_sample(df, {"a": -1.0}, 10)
    with pytest.raises(ValueError, match="> 0"):
        mixture_sample(df, {"a": 0.0}, 10)


def test_split_fractions_and_determinism(spark):
    df = _docs(spark, n=3000)
    out = split_by_hash(df, {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r.split: r.n for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert 0.75 <= counts["train"] / 3000 <= 0.85
    # determinism: same id -> same split, across partitionings
    a = {r.doc_id: r.split for r in out.collect()}
    b = {
        r.doc_id: r.split
        for r in split_by_hash(
            df.repartition(17), {"train": 0.8, "val": 0.1, "test": 0.1}
        ).collect()
    }
    assert a == b
    # leak-proof under growth: a subset corpus assigns identically
    sub = split_by_hash(df.where("doc_id < 100"), {"train": 0.8, "val": 0.1, "test": 0.1})
    assert all(a[r.doc_id] == r.split for r in sub.collect())


def test_split_matches_python_md5(spark):
    df = _docs(spark, n=50)
    out = {r.doc_id: r.split for r in split_by_hash(df, {"x": 0.5, "y": 0.5}).collect()}
    t = _hex_threshold(0.5)
    for i in range(50):
        want = "x" if hashlib.md5(str(i).encode()).hexdigest() < t else "y"
        assert out[i] == want, i


def test_split_guards(spark):
    df = _docs(spark)
    with pytest.raises(ValueError, match="non-empty"):
        split_by_hash(df, {})
    with pytest.raises(ValueError, match="sum to 1"):
        split_by_hash(df, {"a": 0.5, "b": 0.4})
    with pytest.raises(ValueError, match="non-negative"):
        split_by_hash(df, {"a": 1.5, "b": -0.5})


def test_split_is_pure_projection(spark):
    plan = (
        split_by_hash(_docs(spark), {"a": 0.5, "b": 0.5})
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


def test_matches_duckdb_oracle_by_name(spark):
    from iot_sensor_data_pipeline_spark.plans import EXTENDED_REGISTRY
    from tests.conftest import SF_SMALL
    from tests.oracle_harness import compare_query

    q = EXTENDED_REGISTRY["documents_mixture_split"]
    for sf in ("/root/testdata/sf0.01", SF_SMALL):
        ok, msg = compare_query(spark, sf, q.fn, q.oracle)
        assert ok, (sf, msg)
