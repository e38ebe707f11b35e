"""Similarity search over embedding columns (array<float>).

Two tiers:
- ``cosine_topk`` — exact brute force: query x corpus join with a
  JVM-side fold for the dot product. The baseline, and the verifier
  for the approximate path. O(|Q| x |C|): fine when either side is
  small (or broadcast); never the 100 TB path.
- ``rp_lsh_topk`` — random-hyperplane LSH: r signed projections ->
  one bucket id per vector -> candidates = bucket collisions ->
  exact cosine re-rank of candidates only. The scale path: the
  corpus-side work collapses from |C| to the colliding buckets, and
  the join is a plain shuffle on the bucket key. Multi-probe (flip
  one bit) trades compute for recall.

Vector math is F.zip_with / F.aggregate over array<double> — codegen'd
fold, no Python, deterministic left-to-right summation (matches the
oracle's sequential list_dot_product).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def as_double_array(col) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    round_score: int = 6,
    broadcast_queries: bool = True,
) -> DataFrame:
    """Exact top-k neighbors per query by cosine. Output:
    (qid, nid, score, rn), self-matches excluded, ties broken by nid.

    The ranking orders by the ROUNDED score so results are stable
    across engines and runs; rn is a row_number (exactly k rows/query).

    ``broadcast_queries`` ships the (small) query set to every
    executor so the big corpus never shuffles — the right plan when
    |Q| << |C|, which is the only regime brute force is for.
    """
    q = queries.select(
        F.col(query_id).alias("qid"), as_double_array(F.col(vec_col)).alias("qv")
    )
    c = corpus.select(
        F.col(corpus_id).alias("nid"), as_double_array(F.col(vec_col)).alias("cv")
    )
    pairs = (
        (c.crossJoin(F.broadcast(q)) if broadcast_queries else q.crossJoin(c))
        .where(F.col("qid") != F.col("nid"))
        .select(
            "qid",
            "nid",
            F.round(cosine(F.col("qv"), F.col("cv")), round_score).alias("score"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("nid"))
    return pairs.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= k)


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-gaussian hyperplanes (Box-Muller over an
    LCG) — no numpy dependency, reproducible across runs/engines."""
    state = seed
    out: list[list[float]] = []

    def rng() -> float:
        nonlocal state
        state = (state * 6_364_136_223_846_793_005 + 1_442_695_040_888_963_407) % (2**63)
        return (state >> 11) / float(1 << 52)  # uniform [0,1)

    for _ in range(n_planes):
        plane = []
        for _ in range(dim):
            u1 = max(rng(), 1e-12)
            u2 = rng()
            plane.append(math.sqrt(-2 * math.log(u1)) * math.cos(2 * math.pi * u2))
        out.append(plane)
    return out


def rp_lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    dim: int,
    n_planes: int = 5,
    multi_probe: bool = True,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    round_score: int = 6,
) -> DataFrame:
    """Approximate top-k by random-hyperplane LSH + exact re-rank.

    Bucket id = n_planes sign bits of the projections (one long).
    ``multi_probe`` also probes the n_planes buckets at hamming
    distance 1 from the query's bucket, boosting recall for vectors
    near a hyperplane at n_planes x candidate cost.

    Sizing: 2^n_planes buckets — pick n_planes ~ log2(|corpus| /
    desired_bucket_size). Too many planes splinters true neighbors
    across buckets (recall collapses); too few degenerates to brute
    force. Recall improves with the data's cluster structure: isotropic
    random vectors are the worst case (tests assert the floor there).
    """
    planes = _hyperplanes(dim, n_planes)

    def bucket_of(vec: Column) -> Column:
        bits = [
            F.when(
                F.aggregate(
                    F.zip_with(
                        vec,
                        F.array(*[F.lit(w) for w in plane]),
                        lambda x, y: x * y,
                    ),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                )
                > 0,
                F.lit(1).cast("long"),
            ).otherwise(F.lit(0).cast("long"))
            * (2**i)
            for i, plane in enumerate(planes)
        ]
        out = bits[0]
        for b in bits[1:]:
            out = out + b
        return out

    c = corpus.select(
        F.col(corpus_id).alias("nid"), as_double_array(F.col(vec_col)).alias("cv")
    ).withColumn("bucket", bucket_of(F.col("cv")))

    q = queries.select(
        F.col(query_id).alias("qid"), as_double_array(F.col(vec_col)).alias("qv")
    ).withColumn("q_bucket", bucket_of(F.col("qv")))
    if multi_probe:
        probes = F.array(
            F.col("q_bucket"),
            *[F.col("q_bucket").bitwiseXOR(F.lit(2**i)) for i in range(n_planes)],
        )
    else:
        probes = F.array(F.col("q_bucket"))
    q = q.select("qid", "qv", F.explode(probes).alias("bucket"))

    pairs = (
        q.join(c, "bucket")
        .where(F.col("qid") != F.col("nid"))
        .select(
            "qid",
            "nid",
            F.round(cosine(F.col("qv"), F.col("cv")), round_score).alias("score"),
        )
        .distinct()
    )
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("nid"))
    return pairs.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= k)
