"""Iterative graph analytics over edge relations.

``pagerank`` complements the connected-components operators
(operators/dedup.py): components tell you WHICH rows form a duplicate
/ link cluster, PageRank tells you which nodes inside the graph carry
weight — canonical-document election among near-duplicates, authority
scoring over a hyperlink crawl before quality filtering, hub detection
in a sensor-communication graph.

Same scale discipline as the other iterative operators: every round is
two joins + one aggregation over the edge relation (no driver-side
graph state, no collect of nodes), the edge relation and per-round
ranks are localCheckpointed (lineage truncated — executor loss fails
loudly rather than recomputing a divergent iteration), and convergence
is an L1-delta action per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    max_iterations: int = 30,
    tol: float = 1e-6,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Power-iteration PageRank over a directed edge list. Returns
    ``(id, rank)`` for every node appearing as source OR destination;
    ranks sum to 1. Dangling nodes (no out-edges) redistribute their
    mass uniformly — the standard correction, without which rank
    leaks and the result is not a distribution.

    Stops when the L1 change drops below ``tol``; raises RuntimeError
    at ``max_iterations`` (returning a half-converged ranking would
    silently misorder close nodes — same fail-loud contract as
    ``duplicate_clusters``). Plan shape per round: one equi-join of
    edges against current ranks (shuffle on src), one aggregation on
    dst, one tiny dangling-mass aggregate; edge relation shuffles
    once per round on the same key, so at scale pre-partition (or
    bucket) the edge table by src.
    """
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    e = e.localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    out_deg = (
        e.groupBy("src")
        .agg(F.count(F.lit(1)).alias("deg"))
        .withColumnRenamed("src", "__od_id")  # avoid self-join ambiguity with e.src
    )
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(max_iterations):
        # persisted: the dangling aggregate AND the contribs join both
        # read this relation — uncached, the ranks x out_deg join
        # would execute twice per round
        with_deg = (
            ranks.join(out_deg, ranks.id == out_deg.__od_id, "left")
            .drop("__od_id")
            .persist()
        )
        # dangling mass: rank held by nodes with no out-edges
        dangling = (
            with_deg.where(F.col("deg").isNull())
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .collect()[0][0]
        )
        contribs = (
            e.join(with_deg.where(F.col("deg").isNotNull()), e.src == F.col("id"))
            .select("dst", (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        base = (1.0 - damping) / n + damping * dangling / n
        new_ranks = (
            nodes.join(contribs, nodes.id == contribs.dst, "left")
            .select(
                "id",
                (F.lit(base) + F.lit(damping) * F.coalesce(F.col("inflow"), F.lit(0.0))).alias(
                    "rank"
                ),
            )
            .localCheckpoint(eager=True)
        )
        delta = (
            new_ranks.alias("n")
            .join(ranks.alias("o"), "id")
            .agg(F.sum(F.abs(F.col("n.rank") - F.col("o.rank"))))
            .collect()[0][0]
        )
        with_deg.unpersist()
        ranks = new_ranks
        if delta < tol:
            return ranks
    raise RuntimeError(
        f"pagerank did not converge within {max_iterations} iterations "
        f"(last L1 delta {delta:.2e} >= tol {tol:.0e}); raise max_iterations"
    )
