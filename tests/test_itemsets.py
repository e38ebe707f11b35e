"""Association rules (operators/itemsets.py): golden metrics, symmetry
and threshold semantics, random differential vs a Python reference,
DuckDB oracle at two scales."""

from __future__ import annotations

import pytest

from iot_sensor_data_pipeline_spark.operators.itemsets import (
    basket_items,
    pair_association_rules,
)
from iot_sensor_data_pipeline_spark.plans import REGISTRY
from tests.conftest import SF_SMALL
from tests.oracle_harness import compare_query

SF = "/root/testdata/sf0.01"


def _baskets(spark, rows):
    return spark.createDataFrame(rows, "basket long, item string")


def test_golden_metrics(spark):
    # 4 baskets: {a,b} x3, {a} x1 -> n_a=4, n_b=3, n_ab=3
    rows = [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (3, "b"), (4, "a")]
    out = {(r["antecedent"], r["consequent"]): r
           for r in pair_association_rules(_baskets(spark, rows), "basket", "item").collect()}
    ab, ba = out[("a", "b")], out[("b", "a")]
    assert ab["support"] == ba["support"] == 0.75
    assert ab["confidence"] == 0.75       # 3/4
    assert ba["confidence"] == 1.0        # 3/3
    assert abs(ab["lift"] - 1.0) < 1e-12  # 0.75 / (1.0 * 0.75)
    assert ab["lift"] == ba["lift"]


def test_duplicate_items_in_basket_count_once(spark):
    rows = [(1, "a"), (1, "a"), (1, "b"), (2, "a"), (2, "b")]
    out = pair_association_rules(_baskets(spark, rows), "basket", "item").collect()
    assert {r["n_pair"] for r in out} == {2}
    assert {r["n_antecedent"] for r in out} == {2}


def test_threshold_prunes_rare_pairs(spark):
    rows = [(1, "a"), (1, "b"), (2, "a"), (2, "c")]
    out = pair_association_rules(
        _baskets(spark, rows), "basket", "item", min_pair_count=2
    )
    assert out.count() == 0
    with pytest.raises(ValueError, match="min_pair_count"):
        pair_association_rules(_baskets(spark, rows), "basket", "item", 0)


def test_random_differential_vs_python(spark):
    import random
    from collections import Counter
    from itertools import combinations

    rng = random.Random(4242)
    items = "abcdefg"
    rows = []
    baskets = {}
    for b in range(40):
        s = sorted(rng.sample(items, rng.randint(1, 4)))
        baskets[b] = s
        rows += [(b, i) for i in s for _ in range(rng.randint(1, 2))]
    pair_c: Counter = Counter()
    item_c: Counter = Counter()
    for s in baskets.values():
        item_c.update(s)
        pair_c.update(combinations(s, 2))
    n = len(baskets)
    want = {}
    for (a, b), c in pair_c.items():
        if c < 2:
            continue
        for x, y in ((a, b), (b, a)):
            want[(x, y)] = (
                c, item_c[x],
                round(c / n, 9),
                round(c / item_c[x], 9),
                round((c / n) / ((item_c[a] / n) * (item_c[b] / n)), 9),
            )
    got = {
        (r["antecedent"], r["consequent"]): (
            r["n_pair"], r["n_antecedent"],
            round(r["support"], 9), round(r["confidence"], 9), round(r["lift"], 9),
        )
        for r in pair_association_rules(
            _baskets(spark, rows), "basket", "item", min_pair_count=2
        ).collect()
    }
    assert got == want


def test_basket_items_sorted_distinct(spark):
    rows = [(1, "c"), (1, "a"), (1, "a"), (1, "b")]
    out = basket_items(_baskets(spark, rows), "basket", "item").collect()[0]
    assert out["items"] == ["a", "b", "c"]


@pytest.mark.parametrize("sf", [SF, SF_SMALL])
def test_matches_duckdb_oracle(spark, sf):
    q = REGISTRY["parts_association_rules"]
    ok, msg = compare_query(spark, sf, q.fn, q.oracle)
    assert ok, msg
