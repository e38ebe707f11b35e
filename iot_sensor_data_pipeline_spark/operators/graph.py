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
    tol: float | None = 1e-6,
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

    ``tol=None`` switches to FIXED-ITERATION mode: run exactly
    ``max_iterations`` power rounds with no convergence action and
    return — the deterministic form a cross-engine differential
    needs (an early exit keyed on a float delta could fire on a
    different round per engine), and the cheaper form when the
    caller has already sized the round count (lineage is still
    checkpoint-truncated every ``check_interval`` rounds).
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
            if tol is None:
                continue  # fixed-iteration mode: no convergence action
            delta = (
                ranks.alias("n")
                .join(checkpointed.alias("o"), "id")
                .agg(F.sum(F.abs(F.col("n.rank") - F.col("o.rank"))))
                .collect()[0][0]
            )
            checkpointed = ranks
            if delta < tol:
                return ranks
    if tol is None:
        return ranks
    raise RuntimeError(
        f"pagerank did not converge within {max_iterations} iterations "
        f"(last L1 delta {delta:.2e} >= tol {tol:.0e}); raise max_iterations"
    )


def canonical_edges(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Normalize a (possibly directed, noisy) edge relation into the
    undirected canonical form: (u, v) with u < v, self-loops dropped,
    duplicates collapsed."""
    u = F.least(F.col(src), F.col(dst)).alias("u")
    v = F.greatest(F.col(src), F.col(dst)).alias("v")
    return (
        edges.select(u, v)
        .where(F.col("u") != F.col("v"))
        .dropDuplicates(["u", "v"])
    )


def triangle_count(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    assume_canonical: bool = False,
) -> DataFrame:
    """Global triangle count via degree-ordered edge orientation
    (the MapReduce-era trick of Suri & Vassilvitskii's "Counting
    triangles and the curse of the last reducer", WWW'11).

    Each undirected edge is oriented from its lower-(degree, id)
    endpoint to the higher one; every triangle then has exactly one
    vertex with two out-edges, so counting (wedge e1=a->b, e2=a->c,
    closing edge b->c) sees each triangle once. The payoff at scale:
    out-degree is bounded by O(sqrt(m)) regardless of how skewed the
    raw degree distribution is, so the wedge join never explodes on a
    celebrity vertex — the naive 3-way self-join on the raw edge list
    does.

    Two shuffles (degree agg + wedge join) plus a semi-ish closing join;
    returns a 1-row DataFrame (n_triangles).
    """
    # canonical edges are consumed twice (degrees + orientation); the
    # caller can persist the input if recomputing its lineage is costly,
    # and pass assume_canonical=True when the input is already the
    # canonical (u, v) relation to skip the dedup shuffle entirely
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        if assume_canonical
        else canonical_edges(edges, src, dst)
    )
    deg = (
        e.select(F.col("u").alias("n")).unionAll(e.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # orient by (degree, id): from the smaller endpoint to the larger
    du = deg.select(F.col("n").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("n").alias("v"), F.col("deg").alias("dv"))
    keyed = e.join(du, "u").join(dv, "v")
    fwd = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = keyed.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("b"),
    )
    w1 = oriented.select(F.col("a").alias("wa"), F.col("b").alias("wb"))
    w2 = oriented.select(F.col("a").alias("xa"), F.col("b").alias("xb"))
    wedges = w1.join(w2, (F.col("wa") == F.col("xa")) & (F.col("wb") < F.col("xb")))
    closing = oriented.select(
        F.col("a").alias("ca"), F.col("b").alias("cb")
    ).unionAll(oriented.select(F.col("b").alias("ca"), F.col("a").alias("cb")))
    closed = wedges.join(
        closing.dropDuplicates(["ca", "cb"]),
        (F.col("wb") == F.col("ca")) & (F.col("xb") == F.col("cb")),
        "left_semi",
    )
    return closed.agg(F.count(F.lit(1)).alias("n_triangles"))


def degree_histogram(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    assume_canonical: bool = False,
) -> DataFrame:
    """Distribution of undirected vertex degrees: (degree, n_vertices)."""
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        if assume_canonical
        else canonical_edges(edges, src, dst)
    )
    deg = (
        e.select(F.col("u").alias("n")).unionAll(e.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return deg.groupBy("degree").agg(F.count(F.lit(1)).alias("n_vertices"))
