"""Pairwise frequent-itemset mining: support / confidence / lift over
co-occurrence baskets — the market-basket analytics family
(recommendation candidates, cross-sell analysis, co-view mining).

Spark-first shape (the same dataflow that makes the co-supply graph
scale): ONE shuffle of the fact table builds per-basket distinct item
sets, pairs expand ARRAY-SIDE from the sorted set (so each unordered
pair appears once per basket by construction and a plain count(*)
counts baskets), and the single-item supports come from the same
per-basket relation. The n-baskets scalar rides as a 1-row broadcast.
Full Apriori over arbitrary itemset sizes explodes combinatorially at
any scale; pairs (plus the per-basket sets this module exposes for ad
hoc deeper digs) cover the standard production uses.

Metrics (counts are exact BIGINTs; ratios are exact IEEE divisions,
which is what lets the DuckDB oracle hash-match them):

    support(a, b)    = n_ab / n_baskets
    confidence(a->b) = n_ab / n_a
    lift(a, b)       = support(a,b) / (support(a) * support(b))

Every unordered frequent pair emits TWO directed rules (a->b and
b->a): support and lift are symmetric, confidence is not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def basket_items(df: DataFrame, basket_col: str, item_col: str) -> DataFrame:
    """(basket, sorted distinct item array) — one fact shuffle."""
    return df.groupBy(basket_col).agg(
        F.sort_array(F.collect_set(item_col)).alias("items")
    )


def pair_structs():
    """Array-side unordered-pair expansion over the sorted ``items``
    column of :func:`basket_items` output: every (a, b) with a < b,
    each exactly once per basket (shared with the co-supply graph
    query — one implementation of the slice arithmetic)."""
    return F.flatten(
        F.transform(
            "items",
            lambda x, i: F.transform(
                F.slice(
                    "items", i + 2, F.greatest(F.size("items") - i - 1, F.lit(0))
                ),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )


def pair_association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_count: int = 2,
) -> DataFrame:
    """Directed rules (antecedent, consequent, n_pair, n_antecedent,
    support, confidence, lift) for every item pair co-occurring in at
    least ``min_pair_count`` baskets.

    ``min_pair_count`` is the skew/size guard: it prunes the pair
    relation BEFORE the metric joins, the same role the co-supply
    threshold plays for the dense-graph hazard.
    """
    if min_pair_count < 1:
        raise ValueError("pair_association_rules: min_pair_count must be >= 1")
    baskets = basket_items(df, basket_col, item_col).localCheckpoint(eager=False)
    n_baskets = baskets.agg(F.count(F.lit(1)).alias("n_baskets"))
    item_counts = (
        baskets.select(F.explode("items").alias("item"))
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("n_item"))
    )
    pair_counts = (
        baskets.select(F.explode(pair_structs()).alias("p"))
        .groupBy("p.a", "p.b")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .where(F.col("n_pair") >= min_pair_count)
    )
    directed = pair_counts.select("a", "b", "n_pair").unionByName(
        pair_counts.select(
            F.col("b").alias("a"), F.col("a").alias("b"), "n_pair"
        )
    )
    ante = item_counts.select(
        F.col("item").alias("a"), F.col("n_item").alias("n_antecedent")
    )
    cons = item_counts.select(
        F.col("item").alias("b"), F.col("n_item").alias("n_consequent")
    )
    out = (
        directed.join(ante, "a")
        .join(cons, "b")
        .crossJoin(F.broadcast(n_baskets))
    )
    support = F.col("n_pair") / F.col("n_baskets")
    supp_a = F.col("n_antecedent") / F.col("n_baskets")
    supp_b = F.col("n_consequent") / F.col("n_baskets")
    return out.select(
        F.col("a").alias("antecedent"),
        F.col("b").alias("consequent"),
        "n_pair",
        "n_antecedent",
        support.alias("support"),
        (F.col("n_pair") / F.col("n_antecedent")).alias("confidence"),
        (support / (supp_a * supp_b)).alias("lift"),
    )
