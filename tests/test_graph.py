"""PageRank (operators/graph.py) vs an independent numpy power
iteration, plus the dangling-mass and fail-loud contracts."""

from __future__ import annotations

import pytest

from iot_sensor_data_pipeline_spark.operators.graph import pagerank


def _numpy_pagerank(edges, n, damping=0.85, iters=200):
    """Dense reference: teleport + dangling-uniform, same model."""
    import numpy as np

    m = np.zeros((n, n))
    out = np.zeros(n)
    for s, d in edges:
        m[d, s] += 1.0
        out[s] += 1.0
    for s in range(n):
        if out[s] > 0:
            m[:, s] /= out[s]
        else:
            m[:, s] = 1.0 / n  # dangling: uniform
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        r = (1 - damping) / n + damping * (m @ r)
    return r


def test_pagerank_matches_numpy_reference(spark):
    edges = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2)]  # 3 -> 2 -> 0 loop
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.id: r.rank for r in pagerank(df, tol=1e-9, max_iterations=100).collect()}
    want = _numpy_pagerank(edges, 4)
    assert set(got) == {0, 1, 2, 3}
    for i in range(4):
        assert abs(got[i] - want[i]) < 1e-6, (i, got[i], want[i])
    assert abs(sum(got.values()) - 1.0) < 1e-9  # a distribution


def test_pagerank_dangling_mass_redistributes(spark):
    """Node 2 has no out-edges; without the dangling correction the
    rank sum decays below 1 each round."""
    df = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    got = {r.id: r.rank for r in pagerank(df, tol=1e-10, max_iterations=200).collect()}
    assert abs(sum(got.values()) - 1.0) < 1e-8
    assert got[2] > got[1] > got[0]  # rank flows down the chain


def test_pagerank_raises_instead_of_half_converged(spark):
    df = spark.createDataFrame([(0, 1), (1, 0)], "src long, dst long")
    with pytest.raises(RuntimeError, match="did not converge"):
        pagerank(df, tol=0.0, max_iterations=2)  # tol=0 can never be met


def test_pagerank_empty_graph(spark):
    df = spark.createDataFrame([], "src long, dst long")
    assert pagerank(df).count() == 0


def test_pagerank_fixed_iterations_mode(spark):
    """tol=None runs exactly max_iterations and returns (never raises)
    — the deterministic form the cross-engine oracle needs — and a
    generous round count lands on the same fixpoint as converged mode."""
    edges = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    fixed = {r.id: r.rank for r in pagerank(df, tol=None, max_iterations=60).collect()}
    want = _numpy_pagerank(edges, 4)
    for i in range(4):
        assert abs(fixed[i] - want[i]) < 1e-9, (i, fixed[i], want[i])
    # even 1 round with tol=None must return, not raise
    one = pagerank(df, tol=None, max_iterations=1).collect()
    assert len(one) == 4
    assert abs(sum(r.rank for r in one) - 1.0) < 1e-9
