"""Triangle counting / degree histogram (operators/graph.py): goldens
on known graphs, orientation invariants, the DuckDB differential."""

from __future__ import annotations

import pytest

from itertools import combinations

from iot_sensor_data_pipeline_spark.operators.graph import (
    canonical_edges,
    degree_histogram,
    triangle_count,
)
from iot_sensor_data_pipeline_spark.plans import EXTENDED_REGISTRY
from tests.conftest import SF_SMALL
from tests.oracle_harness import compare_query

SF = "/root/testdata/sf0.01"


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _count(spark, pairs):
    return triangle_count(_edges(spark, pairs)).collect()[0]["n_triangles"]


def test_k4_has_four_triangles(spark):
    k4 = list(combinations(range(4), 2))
    assert _count(spark, k4) == 4


def test_cycle_has_none_and_chord_adds_two(spark):
    cycle = [(0, 1), (1, 2), (2, 3), (3, 0)]
    assert _count(spark, cycle) == 0
    assert _count(spark, cycle + [(0, 2)]) == 2


def test_direction_duplicates_and_self_loops_ignored(spark):
    messy = [(0, 1), (1, 0), (1, 2), (2, 0), (0, 0), (2, 0)]
    assert _count(spark, messy) == 1
    assert canonical_edges(_edges(spark, messy)).count() == 3


def test_star_graph_skew_no_triangles(spark):
    # a celebrity hub: naive wedge enumeration from the hub is O(d^2);
    # degree orientation points every edge INTO the hub, so zero wedges
    # originate there
    star = [(0, i) for i in range(1, 40)]
    assert _count(spark, star) == 0
    hist = {r["degree"]: r["n_vertices"] for r in degree_histogram(_edges(spark, star)).collect()}
    assert hist == {39: 1, 1: 39}


def test_k5_exact(spark):
    assert _count(spark, list(combinations(range(5), 2))) == 10


@pytest.mark.parametrize("sf", [SF, SF_SMALL])
def test_matches_duckdb_oracle(spark, sf):
    q = EXTENDED_REGISTRY["suppliers_cosupply_graph"]
    ok, msg = compare_query(spark, sf, q.fn, q.oracle)
    assert ok, msg


def test_random_graphs_match_python_reference(spark):
    """Random G(n, p) graphs (with noisy directions/dupes/self-loops)
    vs a set-intersection reference count."""
    import random

    rng = random.Random(0xBEEF)
    for trial in range(5):
        n = rng.randint(4, 14)
        p = rng.choice([0.2, 0.5, 0.8])
        base = [(a, b) for a, b in combinations(range(n), 2) if rng.random() < p]
        # inject direction flips, duplicates, self-loops
        noisy = [e if rng.random() < 0.5 else (e[1], e[0]) for e in base]
        noisy += [e for e in base if rng.random() < 0.3]
        noisy += [(i, i) for i in range(0, n, 3)]
        if not noisy:
            noisy = [(0, 1)]
        adj = {i: set() for i in range(n)}
        for a, b in base:
            adj[a].add(b)
            adj[b].add(a)
        expected = sum(
            1 for a, b, c in combinations(range(n), 3)
            if b in adj[a] and c in adj[a] and c in adj[b]
        )
        assert _count(spark, noisy) == expected, (trial, n, p, base)
