"""Iterative graph analytics over edge relations.

``pagerank`` complements the connected-components operators
(operators/dedup.py): components tell you WHICH rows form a duplicate
/ link cluster, PageRank tells you which nodes inside the graph carry
weight — canonical-document election among near-duplicates, authority
scoring over a hyperlink crawl before quality filtering, hub detection
in a sensor-communication graph.

Same scale discipline as the other iterative operators: every round is
a fully LAZY dataflow — one scatter join of ranks against the edge
relation plus one aggregation, with the dangling-mass correction
carried as a broadcast 1-row relation instead of a per-round driver
collect — and the driver touches the cluster only every
``check_interval`` rounds (a single action that materializes the
convergence delta and localCheckpoints the rank relation, truncating
lineage). At a billion edges x 30 rounds that is ~30/check_interval
job launches instead of 90.
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
    check_interval: int = 3,
) -> DataFrame:
    """Power-iteration PageRank over a directed edge list. Returns
    ``(id, rank)`` for every node appearing as source OR destination;
    ranks sum to 1. Dangling nodes (no out-edges) redistribute their
    mass uniformly — the standard correction, without which rank
    leaks and the result is not a distribution.

    Per-round dataflow (ZERO driver actions per round): ranks
    left-join the out-degree table, then SCATTER via a left join onto
    the edge relation — a node with out-edges produces one
    ``rank/deg`` contribution row per edge, a dangling node produces
    one row with a NULL dst carrying its whole rank. One groupBy(dst)
    then yields BOTH the per-node inflow and (in the NULL-dst group)
    the total dangling mass in a single pass; the dangling total is
    re-aggregated from that node-scale relation into a 1-row DataFrame
    and broadcast-cross-joined into the rank update, so the scalar
    never visits the driver. Edges shuffle on src once per round — at
    scale pre-partition (or bucket) the edge table by src.

    Every ``check_interval`` rounds the driver runs ONE action: it
    localCheckpoints the current ranks (eager — truncates the
    accumulated lazy lineage; executor loss fails loudly rather than
    recomputing a divergent iteration) and computes the L1 delta
    against the ranks at the previous checkpoint. Converged when that
    delta drops below ``tol`` (a stricter test than the per-round
    delta it replaces: the L1 distance across N rounds of a
    contraction dominates the last single-round step). Raises
    RuntimeError at ``max_iterations`` (returning a half-converged
    ranking would silently misorder close nodes — same fail-loud
    contract as ``duplicate_clusters``).
    """
    if check_interval < 1:
        raise ValueError("pagerank: check_interval must be >= 1")
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
    ranks = nodes.withColumn("rank", F.lit(1.0 / n)).localCheckpoint(eager=True)
    checkpointed = ranks  # ranks at the last driver touch-point
    delta = float("inf")
    for it in range(max_iterations):
        with_deg = ranks.join(out_deg, ranks.id == out_deg.__od_id, "left").drop(
            "__od_id"
        )
        # scatter: per-edge contribution rows, plus one NULL-dst row
        # per dangling node carrying its full rank — one pass computes
        # both inflow and dangling mass
        scattered = with_deg.join(e, with_deg.id == e.src, "left").select(
            "dst",
            F.when(F.col("deg").isNotNull(), F.col("rank") / F.col("deg")).alias("c"),
            F.when(F.col("deg").isNull(), F.col("rank")).alias("dang"),
        )
        agg = scattered.groupBy("dst").agg(
            F.sum("c").alias("inflow"), F.sum("dang").alias("dang_part")
        )
        # node-scale re-aggregation: always exactly 1 row, even when no
        # dangling group exists (coalesce -> 0.0); broadcast into the
        # update so the scalar never round-trips through the driver
        dangling_row = agg.agg(
            F.coalesce(F.sum("dang_part"), F.lit(0.0)).alias("__dangling")
        )
        ranks = (
            nodes.join(
                agg.where(F.col("dst").isNotNull()), nodes.id == F.col("dst"), "left"
            )
            .crossJoin(F.broadcast(dangling_row))
            .select(
                "id",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("inflow"), F.lit(0.0))
                        + F.col("__dangling") / n
                    )
                ).alias("rank"),
            )
        )
        last_round = it == max_iterations - 1
        if (it + 1) % check_interval == 0 or last_round:
            ranks = ranks.localCheckpoint(eager=True)
            delta = (
                ranks.alias("n")
                .join(checkpointed.alias("o"), "id")
                .agg(F.sum(F.abs(F.col("n.rank") - F.col("o.rank"))))
                .collect()[0][0]
            )
            checkpointed = ranks
            if delta < tol:
                return ranks
    raise RuntimeError(
        f"pagerank did not converge within {max_iterations} iterations "
        f"(last L1 delta {delta:.2e} >= tol {tol:.0e}); raise max_iterations"
    )
