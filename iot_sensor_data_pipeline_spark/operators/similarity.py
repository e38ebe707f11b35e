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


def _staged_cosine(va: Column, vb: Column, na: Column, nb: Column) -> Column:
    """``cosine`` with the per-side norms STAGED: every pair-scoring
    site in this module attaches ``l2_norm`` to each side's projection
    (one interpreted fold per input row) and scores pairs with a
    single dot fold plus one multiply/divide — instead of re-walking
    both arrays three times per pair. Bit-identical to :func:`cosine`
    (same folds in the same order, evaluated once and reused), so
    every hash-checked consumer is unchanged; higher-order folds are
    interpreted, which is why per-pair re-evaluation is the dominant
    cost of the brute-force scorers (r15: 3 folds -> 1 per pair)."""
    return dot(va, vb) / (na * nb)


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
    ).select("qid", "qv", l2_norm(F.col("qv")).alias("__qn"))
    c = corpus.select(
        F.col(corpus_id).alias("nid"), as_double_array(F.col(vec_col)).alias("cv")
    ).select("nid", "cv", l2_norm(F.col("cv")).alias("__cn"))
    pairs = (
        (c.crossJoin(F.broadcast(q)) if broadcast_queries else q.crossJoin(c))
        .where(F.col("qid") != F.col("nid"))
        .select(
            "qid",
            "nid",
            F.round(
                _staged_cosine(
                    F.col("qv"), F.col("cv"), F.col("__qn"), F.col("__cn")
                ),
                round_score,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("nid"))
    return pairs.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= k)


def cosine_near_dup_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int | None = None,
    n_tables: int = 6,
    round_score: int = 6,
    dim: int | None = None,
    max_bucket_freq: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (i < j, score >= threshold).

    ``n_planes=None`` -> exact all-pairs (quadratic; oracle/verification
    path). With ``n_planes`` set, candidates come from RP-LSH collisions
    across ``n_tables`` INDEPENDENT hash tables (the classic L-tables
    amplification: per-pair miss probability (1-p)^L) plus 1-bit
    multi-probe per table; only candidates are scored. For threshold-
    similarity pairs (theta around 60-66 deg at t=0.4) a single table
    recalls ~30%; 6 tables push past ~85%.

    ``dim`` (the vector dimensionality) is required with ``n_planes``:
    hyperplanes are generated driver-side from it, keeping the operator
    free of hidden driver actions (no ``.first()`` probe — an empty or
    lazily-defined input never blocks plan construction).

    ``max_bucket_freq`` is the bucket-skew guard (the RP-LSH analogue
    of MinHash's ``max_shingle_freq`` / SimHash's ``max_chunk_freq``):
    a (table, bucket) holding more than that many vectors — a dense
    cluster or a duplicated embedding — is dropped from candidate
    generation in EVERY table it floods, bounding the self-join.
    RECALL CONSEQUENCE: pairs colliding ONLY in dropped buckets are
    lost; a pair also colliding in any surviving table is unaffected
    (and a cluster dense enough to flood all tables is better handled
    by exact dedup first). The bucket space is n_tables x 2^n_planes,
    so the frequency relation stays broadcast-small at any corpus
    size. Note scoring is NOT the scale hazard here — the codegen'd
    fold scores ~300k pairs/s/core (measured; an Arrow GEMM scorer is
    no faster at dim 64) — bucket blowup is.
    """
    e = df.select(
        F.col(id_col).alias("id"), as_double_array(F.col(vec_col)).alias("v")
    ).select("id", "v", l2_norm(F.col("v")).alias("n"))
    a = e.select(
        F.col("id").alias("i"), F.col("v").alias("va"), F.col("n").alias("na")
    )
    b = e.select(
        F.col("id").alias("j"), F.col("v").alias("vb"), F.col("n").alias("nb")
    )
    if n_planes is None:
        # spread the quadratic pair work: the streamed side of the
        # broadcast nested-loop join inherits the SCAN's partitioning,
        # and a small corpus (one parquet row group) otherwise scores
        # every |C|^2/2 pair in ONE task (measured 11.7 s single-task
        # at 2k x 2k, dim 64). Hash-repartitioning |C| id-keyed rows is
        # noise next to the pair work it parallelizes; never shrink a
        # scan that is already wider than the session's parallelism.
        n_part = max(
            a.sparkSession.sparkContext.defaultParallelism,
            a.rdd.getNumPartitions(),
        )
        pairs = a.repartition(n_part, "i").crossJoin(b).where(
            F.col("i") < F.col("j")
        )
    else:
        if dim is None:
            raise ValueError(
                "cosine_near_dup_pairs: pass dim (vector dimensionality) "
                "when n_planes is set — the LSH hyperplanes are generated "
                "from it without probing the data"
            )
        table_planes = [
            _hyperplanes(dim, n_planes, seed=42 + 1000 * t) for t in range(n_tables)
        ]
        # one combined key per (table, bucket): t * 2^n_planes + bucket
        buckets = [
            (_bucket_expr(F.col("v"), planes) + F.lit(t * (2**n_planes))).alias(f"b{t}")
            for t, planes in enumerate(table_planes)
        ]
        # candidate generation carries ONLY 8-byte ids: the probe
        # explode/join/distinct never touch the vectors (VERDICT r04
        # #2 — shipping (i, j, va, vb) through the distinct shuffled
        # 2 x dim doubles per candidate; at embedding scale that
        # exchange dominates). Vectors re-join onto the deduped (i, j)
        # pairs afterwards — two narrow equi-joins on id.
        bucketed = e.select("id", *buckets)
        probe_cols = []
        for t in range(n_tables):
            probe_cols.append(F.col(f"b{t}"))
            probe_cols.extend(
                F.col(f"b{t}").bitwiseXOR(F.lit(2**p)) for p in range(n_planes)
            )
        left = bucketed.select(
            F.col("id").alias("i"),
            F.explode(F.array(*probe_cols)).alias("probe"),
        )
        right = bucketed.select(
            F.col("id").alias("j"),
            F.explode(F.array(*[F.col(f"b{t}") for t in range(n_tables)])).alias("probe"),
        )
        if max_bucket_freq is not None:
            # bucket occupancy counted on the TRUE buckets (right
            # side); both sides semi-join the surviving bucket list,
            # which is bounded by the n_tables * 2^n_planes key space
            # (broadcast-small regardless of corpus size)
            freq = right.groupBy("probe").agg(F.count(F.lit(1)).alias("__f"))
            ok = freq.where(F.col("__f") <= max_bucket_freq).select("probe")
            left = left.join(F.broadcast(ok), "probe", "left_semi")
            right = right.join(F.broadcast(ok), "probe", "left_semi")
        cand = (
            left.join(right, "probe")
            .where(F.col("i") < F.col("j"))
            .select("i", "j")
            .distinct()
        )
        pairs = cand.join(
            e.select(
                F.col("id").alias("i"), F.col("v").alias("va"),
                F.col("n").alias("na"),
            ),
            "i",
        ).join(
            e.select(
                F.col("id").alias("j"), F.col("v").alias("vb"),
                F.col("n").alias("nb"),
            ),
            "j",
        )
    return (
        pairs.select(
            "i",
            "j",
            F.round(
                _staged_cosine(
                    F.col("va"), F.col("vb"), F.col("na"), F.col("nb")
                ),
                round_score,
            ).alias("score"),
        )
        .where(F.col("score") >= threshold)
    )


def _nearest_centroids_udf(centroids, n: int):
    """Arrow-vectorized centroid assignment: the (n_centroids x dim)
    matrix ships ONCE per task inside the closure (no per-row
    literals, no shuffle), and each Arrow batch is one numpy GEMM:
    d = |x|^2 - 2 x.C^T + |c|^2. Stable argsort ties break by centroid
    id — the module's documented (distance, cid) contract."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centroids, dtype="float64")  # (m, dim)
    csq = np.einsum("ij,ij->i", C, C)

    def _assign(v):  # pd.Series[array<double>] -> pd.Series[array<int>]
        if len(v) == 0:
            return pd.Series(np.empty(0, dtype=object))
        X = np.stack(v.to_numpy())  # fixed-dim vectors (the IVF contract)
        d = np.einsum("ij,ij->i", X, X)[:, None] - 2.0 * (X @ C.T) + csq[None, :]
        idx = np.argsort(d, axis=1, kind="stable")[:, :n].astype("int32")
        return pd.Series(list(idx))

    return pandas_udf(_assign, "array<int>")


def _centroid_assigners(centroids: list[list[float]], n_probe: int):
    """(assign_one, assign_probe) Column builders for a trained
    quantizer: nearest-centroid id / n_probe nearest ids, both the
    Arrow GEMM kernel — the centroids ship to executors in the task
    closure, never through a shuffle. Shared by build and probe so a
    persisted index and a fresh query plan can never use different
    assignment semantics.

    Until r15 quantizers at or below 32 centroids used an all-literal
    JVM expression (16 structs of zip_with/aggregate folds) on the
    theory that codegen beats the Python boundary. Measured the other
    way around (r15, sf0.1, 50k x dim-64, 16 centroids): the
    higher-order folds are INTERPRETED, not codegen'd, and the literal
    assignment scan took 2.55 s vs 0.34 s for the GEMM kernel — 7.6x.
    The numeric results agree on every SF fixture (0 mismatching
    assignments across sf0.001/0.01/0.1 at 8 and 16 centroids, probe
    widths 3 and 4; exact FP ties would break by cid under both
    formulations)."""
    one_udf = _nearest_centroids_udf(centroids, 1)
    probe_udf = _nearest_centroids_udf(centroids, n_probe)
    return (lambda vec: one_udf(vec)[0], probe_udf)


def ivf_build(
    corpus: DataFrame,
    n_centroids: int = 16,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    train_sample_rows: int = 200_000,
    max_iter: int = 20,
) -> tuple[DataFrame, list[list[float]]]:
    """Build the IVF index ONCE: train the k-means coarse quantizer
    (Spark ML, on a capped sample so fitting cost stays constant as
    the corpus grows) and assign every corpus vector to its nearest
    centroid. Returns ``(assignments, centroids)``:

    - ``assignments`` — (cid int, nid, cv array<double>): the posting
      lists. PERSIST THIS bucketed by cid
      (``.write.bucketBy(n, "cid").sortBy("cid").saveAsTable(...)``) —
      probes then join posting lists with ZERO exchange on the index
      side, so probe cost never reshuffles the corpus (the same layout
      argument as the near-dup band index; plan-pinned in
      tests/test_similarity.py).
    - ``centroids`` — n_centroids x dim python floats, driver-small:
      persist as JSON next to the table and pass to :func:`ivf_probe`.

    At 100 TB this build is one corpus scan + one bucketed write;
    :func:`ivf_topk` (build + probe fused) re-does it per call and is
    only for ad-hoc queries.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    c = corpus.select(
        F.col(corpus_id).alias("nid"), as_double_array(F.col(vec_col)).alias("cv")
    )
    # quantizer training needs only a sample — cap it so fitting cost
    # stays constant as the corpus grows (standard IVF practice).
    # Hash-ordered top-N (TakeOrderedAndProject) rather than a bare
    # limit(): limit takes the FIRST partitions only, which on data
    # clustered by date/tenant trains the quantizer on a biased slice
    train = (
        c.select("cv")
        .orderBy(F.xxhash64(F.col("cv")))
        .limit(train_sample_rows)
        .select(array_to_vector("cv").alias("features"))
    )
    model = KMeans(
        k=n_centroids, seed=seed, featuresCol="features", maxIter=max_iter
    ).fit(train)
    centroids = [list(map(float, ctr)) for ctr in model.clusterCenters()]
    assign_one, _ = _centroid_assigners(centroids, 1)
    assignments = c.select(
        assign_one(F.col("cv")).cast("int").alias("cid"), "nid", "cv"
    )
    return assignments, centroids


def ivf_assign(
    vectors: DataFrame,
    centroids: list[list[float]],
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign NEW vectors to an existing quantizer — the incremental
    path for a growing corpus: append the returned (cid, nid, cv) rows
    to the persisted posting table (same bucketed spec) without
    retraining or touching indexed vectors. Retrain (a fresh
    :func:`ivf_build`) only when the data distribution drifts enough
    that posting-list sizes skew — standard IVF operating practice."""
    assign_one, _ = _centroid_assigners(centroids, 1)
    return vectors.select(
        F.col(corpus_id).alias("nid"), as_double_array(F.col(vec_col)).alias("cv")
    ).select(assign_one(F.col("cv")).cast("int").alias("cid"), "nid", "cv")


def ivf_probe(
    queries: DataFrame,
    assignments: DataFrame,
    centroids: list[list[float]],
    k: int,
    n_probe: int = 3,
    query_id: str = "vec_id",
    vec_col: str = "embedding",
    round_score: int = 6,
) -> DataFrame:
    """Probe a built IVF index: assign each query to its ``n_probe``
    nearest centroids, join the corresponding posting lists, exact
    cosine re-rank. ``assignments``/``centroids`` come from
    :func:`ivf_build` (the assignments side may be a bucketed table —
    the join key cid is cast int on both sides, so bucketed scans
    match without cross-side coercion)."""
    _, assign_probe = _centroid_assigners(centroids, n_probe)
    q = (
        queries.select(
            F.col(query_id).alias("qid"), as_double_array(F.col(vec_col)).alias("qv")
        )
        .select(
            "qid", "qv", l2_norm(F.col("qv")).alias("__qn"),
            F.explode(assign_probe(F.col("qv"))).alias("cid"),
        )
        .withColumn("cid", F.col("cid").cast("int"))
    )
    # the posting-side norm stages ONCE PER POSTING ROW (a projection
    # over the — possibly bucketed — assignments scan preserves its
    # partitioning), instead of once per (query, posting) pair
    postings = assignments.withColumn("__cn", l2_norm(F.col("cv")))
    pairs = (
        q.join(postings, "cid")
        .where(F.col("qid") != F.col("nid"))
        .select(
            "qid",
            "nid",
            F.round(
                _staged_cosine(
                    F.col("qv"), F.col("cv"), F.col("__qn"), F.col("__cn")
                ),
                round_score,
            ).alias("score"),
        )
        .distinct()
    )
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("nid"))
    return pairs.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= k)


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    n_centroids: int = 16,
    n_probe: int = 3,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    round_score: int = 6,
    seed: int = 42,
) -> DataFrame:
    """IVF (inverted-file) ANN: k-means coarse quantizer -> per-centroid
    posting lists -> probe the ``n_probe`` nearest centroids per query
    -> exact cosine re-rank of those lists. Fused
    :func:`ivf_build` + :func:`ivf_probe` for ad-hoc use — a pipeline
    that probes repeatedly should build once, persist the assignments
    bucketed by cid, and call ivf_probe.

    Corpus scan cost per query drops from |C| to
    ~ n_probe/n_centroids * |C|. The right default for clustered
    embedding spaces; for isotropic data prefer rp_lsh_topk.
    """
    assignments, centroids = ivf_build(
        corpus, n_centroids=n_centroids, corpus_id=corpus_id,
        vec_col=vec_col, seed=seed,
    )
    return ivf_probe(
        queries, assignments, centroids, k, n_probe=n_probe,
        query_id=query_id, vec_col=vec_col, round_score=round_score,
    )


def _topk_partial_schema():
    """(qid, nid, score) Arrow schema shared by the GEMM paths."""
    from pyspark.sql import types as T

    return T.StructType(
        [
            T.StructField("qid", T.LongType()),
            T.StructField("nid", T.LongType()),
            T.StructField("score", T.DoubleType()),
        ]
    )


def _local_topk_frame(qids, qm_norm, nids, cm_norm, k, round_score):
    """Shared local-selection kernel for the GEMM paths: rounded-score
    lexsort (score desc, nid asc — IDENTICAL to the global rank
    window, so ties survive the local cut) and a k+1 take absorbing at
    most one self-match. ONE copy of the tie-break semantics keeps
    cosine_topk_gemm and cosine_topk_blocked equality-pinned to
    cosine_topk by construction."""
    import numpy as np
    import pandas as pd

    scores = np.round(qm_norm @ cm_norm.T, round_score)
    take = min(k + 1, scores.shape[1])
    order = np.lexsort((np.broadcast_to(nids, scores.shape), -scores), axis=1)
    idx = order[:, :take]
    return pd.DataFrame(
        {
            "qid": np.repeat(qids, take),
            "nid": nids[idx.ravel()],
            "score": np.take_along_axis(scores, idx, axis=1).ravel(),
        }
    )


def cosine_topk_gemm(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    round_score: int = 6,
) -> DataFrame:
    """Exact top-k via per-partition matrix multiply (mapInPandas).

    The query set collects to the driver ONCE as a normalized numpy
    matrix (|Q| x dim — queries must be driver-small, same regime as
    broadcast), ships inside the closure, and every corpus partition
    computes scores as ONE BLAS GEMM + argpartition — orders of
    magnitude fewer interpreter ops than per-row folds when |Q| is in
    the hundreds+. Per-partition local top-k (k rows per query per
    partition) then a global rank window finishes the merge, so the
    shuffle carries k*P rows per query, not |C|.

    Equality with cosine_topk is pinned in tests (same rounding, same
    tie-break — the local selection orders by the rounded score too).
    Ids must be integral (the Arrow schema pins them to long); use
    cosine_topk for string-keyed vectors.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    q_rows = queries.select(
        F.col(query_id).alias("qid"), as_double_array(F.col(vec_col)).alias("qv")
    ).collect()
    qids = np.array([r.qid for r in q_rows])
    qm = np.array([r.qv for r in q_rows], dtype="float64")
    qm /= np.linalg.norm(qm, axis=1, keepdims=True)

    out_schema = _topk_partial_schema()

    def batches(it):
        for pdf in it:
            nids = pdf["nid"].to_numpy()
            cm = np.array(list(pdf["cv"]), dtype="float64")
            cm /= np.linalg.norm(cm, axis=1, keepdims=True)
            yield _local_topk_frame(qids, qm, nids, cm, k, round_score)

    c = corpus.select(
        F.col(corpus_id).cast("long").alias("nid"),
        as_double_array(F.col(vec_col)).alias("cv"),
    )
    partial = c.mapInPandas(batches, out_schema).where(F.col("qid") != F.col("nid"))
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("nid"))
    return partial.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= k)


def _bucket_expr(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id for a vector given hyperplanes (shared by the
    LSH operators)."""
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(vec, F.array(*[F.lit(w) for w in plane]), lambda x, y: x * y),
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


def recommended_n_planes(corpus_size: int, target_bucket_size: int = 64) -> int:
    """The docstring sizing rule as code: n_planes ~ log2(corpus /
    target_bucket_size), floored at 1. Too many planes splinters true
    neighbors across buckets (recall collapses); too few degenerates
    to brute force — mis-sizing by even a few planes moves bucket
    occupancy by that power of two, which is the usual cause of
    "LSH was slow" (measured in SCALE.md)."""
    return max(1, math.ceil(math.log2(max(corpus_size, 2) / max(target_bucket_size, 1))))


def rp_lsh_build(
    corpus: DataFrame,
    dim: int,
    n_planes: int = 5,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Build the RP-LSH index ONCE: (bucket long, nid, cv) — every
    corpus vector tagged with its sign-bit bucket. PERSIST bucketed by
    ``bucket`` (``.write.bucketBy(n, "bucket").sortBy("bucket")
    .saveAsTable(...)``) so probes join the bucket lists with ZERO
    exchange on the index side. The hyperplanes are deterministic in
    (dim, n_planes) — nothing else needs persisting; a probe with the
    same parameters reconstructs them exactly."""
    planes = _hyperplanes(dim, n_planes)
    return corpus.select(
        F.col(corpus_id).alias("nid"), as_double_array(F.col(vec_col)).alias("cv")
    ).select(_bucket_expr(F.col("cv"), planes).alias("bucket"), "nid", "cv")


def rp_lsh_probe(
    queries: DataFrame,
    index: DataFrame,
    dim: int,
    k: int,
    n_planes: int = 5,
    multi_probe: bool = True,
    query_id: str = "vec_id",
    vec_col: str = "embedding",
    round_score: int = 6,
) -> DataFrame:
    """Probe a built RP-LSH index (:func:`rp_lsh_build` output, plain
    or persisted as a bucketed table): bucket each query with the SAME
    deterministic hyperplanes, join the colliding bucket lists, exact
    cosine re-rank. ``multi_probe`` also probes the n_planes buckets
    at hamming distance 1, boosting recall for vectors near a
    hyperplane at n_planes x candidate cost."""
    planes = _hyperplanes(dim, n_planes)
    q = queries.select(
        F.col(query_id).alias("qid"), as_double_array(F.col(vec_col)).alias("qv")
    ).withColumn("q_bucket", _bucket_expr(F.col("qv"), planes))
    if multi_probe:
        probes = F.array(
            F.col("q_bucket"),
            *[F.col("q_bucket").bitwiseXOR(F.lit(2**i)) for i in range(n_planes)],
        )
    else:
        probes = F.array(F.col("q_bucket"))
    q = q.select(
        "qid", "qv", l2_norm(F.col("qv")).alias("__qn"),
        F.explode(probes).alias("bucket"),
    )

    # norm staged once per index row (projection preserves a bucketed
    # table's partitioning), not once per colliding pair
    idx = index.withColumn("__cn", l2_norm(F.col("cv")))
    pairs = (
        q.join(idx, "bucket")
        .where(F.col("qid") != F.col("nid"))
        .select(
            "qid",
            "nid",
            F.round(
                _staged_cosine(
                    F.col("qv"), F.col("cv"), F.col("__qn"), F.col("__cn")
                ),
                round_score,
            ).alias("score"),
        )
        .distinct()
    )
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("nid"))
    return pairs.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= k)


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
    Fused :func:`rp_lsh_build` + :func:`rp_lsh_probe` for ad-hoc use —
    repeated probing should build once, persist the bucket table
    bucketed by ``bucket``, and call rp_lsh_probe.

    Bucket id = n_planes sign bits of the projections (one long).
    Sizing: 2^n_planes buckets — :func:`recommended_n_planes` encodes
    the n_planes ~ log2(|corpus| / desired_bucket_size) rule. Recall
    improves with the data's cluster structure: isotropic random
    vectors are the worst case (tests assert the floor there).
    """
    index = rp_lsh_build(
        corpus, dim, n_planes=n_planes, corpus_id=corpus_id, vec_col=vec_col
    )
    return rp_lsh_probe(
        queries, index, dim, k, n_planes=n_planes, multi_probe=multi_probe,
        query_id=query_id, vec_col=vec_col, round_score=round_score,
    )


def cosine_topk_blocked(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    round_score: int = 6,
    q_blocks: int = 8,
    c_blocks: int = 8,
) -> DataFrame:
    """Exact top-k when BOTH sides are large: distributed block GEMM.

    cosine_topk broadcasts the corpus rows against driver-small
    queries; cosine_topk_gemm ships a driver-small query matrix to
    every corpus partition. When neither side fits the driver (the
    all-pairs kNN regime — e.g. kNN-graph construction over the whole
    corpus), this operator hash-blocks both sides and computes one
    BLAS GEMM per (query-block, corpus-block) tile via
    ``cogroup().applyInPandas``:

    - queries replicate to each of ``c_blocks``; corpus rows replicate
      to each of ``q_blocks`` — shuffle volume |Q|*CB + |C|*QB rows,
      the standard block outer-product cost, with NO driver collect
      and no full |Q| x |C| materialization (each tile emits only
      k rows per query).
    - the merge window then ranks CB*k candidate rows per query.

    Pick block counts so a tile's two matrices ((|Q|/QB + |C|/CB) x
    dim doubles) fit comfortably in one task; hash blocking keeps
    tiles balanced regardless of id distribution. Rounding and
    tie-break match cosine_topk exactly (equality pinned in tests).
    Ids must be integral, as in cosine_topk_gemm.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    out_schema = _topk_partial_schema()

    # (qb, cb) are int on BOTH sides — pmod results cast down to match
    # the int explode literals, so cogroup key matching never depends on
    # cross-side implicit coercion (version-fragile)
    q = (
        queries.select(
            F.col(query_id).cast("long").alias("qid"),
            as_double_array(F.col(vec_col)).alias("qv"),
        )
        .withColumn("qb", F.pmod(F.xxhash64("qid"), F.lit(q_blocks)).cast("int"))
        .withColumn(
            "cb", F.explode(F.array(*[F.lit(i) for i in range(c_blocks)]))
        )
    )
    c = (
        corpus.select(
            F.col(corpus_id).cast("long").alias("nid"),
            as_double_array(F.col(vec_col)).alias("cv"),
        )
        .withColumn("cb", F.pmod(F.xxhash64("nid"), F.lit(c_blocks)).cast("int"))
        .withColumn(
            "qb", F.explode(F.array(*[F.lit(i) for i in range(q_blocks)]))
        )
    )

    def tile(key, qpdf: pd.DataFrame, cpdf: pd.DataFrame) -> pd.DataFrame:
        if qpdf.empty or cpdf.empty:
            return pd.DataFrame({"qid": [], "nid": [], "score": []}).astype(
                {"qid": "int64", "nid": "int64", "score": "float64"}
            )
        qids = qpdf["qid"].to_numpy()
        qm = np.array(list(qpdf["qv"]), dtype="float64")
        qm /= np.linalg.norm(qm, axis=1, keepdims=True)
        nids = cpdf["nid"].to_numpy()
        cm = np.array(list(cpdf["cv"]), dtype="float64")
        cm /= np.linalg.norm(cm, axis=1, keepdims=True)
        return _local_topk_frame(qids, qm, nids, cm, k, round_score)

    partial = (
        q.groupBy("qb", "cb")
        .cogroup(c.groupBy("qb", "cb"))
        .applyInPandas(tile, out_schema)
        .where(F.col("qid") != F.col("nid"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("nid"))
    return partial.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= k)


def semantic_dedup(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int | None = None,
    seed: int = 42,
    round_score: int = 6,
    max_cluster_size: int | None = None,
    max_iterations: int = 20,
) -> DataFrame:
    """SemDeDup-style semantic deduplication over an embedding column
    (Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
    through semantic deduplication"): documents whose embeddings are
    cosine-similar above ``threshold`` are grouped, and one canonical
    representative (the minimum id — deterministic across runs and
    engines) is kept per group. Returns ``(id, cluster, kept)`` with
    ``kept`` = 1 for the representative, 0 for semantic duplicates.

    Two candidate-generation modes:

    - ``n_clusters=None`` — exact all-pairs cosine (quadratic): the
      oracle/verification path, never the 100 TB path.
    - ``n_clusters=k`` — the SemDeDup scale path: a k-means coarse
      quantizer (trained on a capped sample, see :func:`ivf_build`)
      partitions the corpus; pairwise cosine runs only WITHIN each
      cluster, so total pair work is sum(|cluster|^2) ~= N^2/k instead
      of N^2, and the pair join is a plain equi-join on the cluster id
      (each vector lands in exactly one cluster, so no distinct is
      needed). Cross-cluster near-duplicates are missed by design —
      the paper's documented recall trade for web-scale corpora.

    ``max_cluster_size`` is the bucket-skew guard (the semantic-dedup
    analogue of MinHash's ``max_shingle_freq``): a cluster larger than
    the cap — a degenerate quantizer cell, e.g. a spam blob — is
    dropped from pair generation rather than allowed a quadratic
    self-join; its members are all kept. The surviving-cluster list is
    bounded by ``n_clusters``, so it broadcasts at any corpus size.

    Grouping uses connected components (min-label propagation —
    semantic-dup clusters are shallow; pass the pairs through
    :func:`~iot_sensor_data_pipeline_spark.operators.dedup.duplicate_clusters_star`
    yourself for pathological chains), so transitive duplicates
    (a~b, b~c) collapse into one group even when a and c are not
    directly similar — the same contract as the text-side
    ``duplicate_clusters``.
    """
    from iot_sensor_data_pipeline_spark.operators.dedup import duplicate_clusters

    ids = df.select(F.col(id_col).alias("id"))
    if n_clusters is None:
        pairs = cosine_near_dup_pairs(
            df, threshold, id_col=id_col, vec_col=vec_col, round_score=round_score
        )
    else:
        assignments, _ = ivf_build(
            df, n_centroids=n_clusters, corpus_id=id_col, vec_col=vec_col, seed=seed
        )
        if max_cluster_size is not None:
            sizes = assignments.groupBy("cid").agg(F.count(F.lit(1)).alias("__n"))
            ok = sizes.where(F.col("__n") <= max_cluster_size).select("cid")
            assignments = assignments.join(F.broadcast(ok), "cid", "left_semi")
        normed = assignments.withColumn("__n", l2_norm(F.col("cv")))
        a = normed.select(
            "cid", F.col("nid").alias("i"), F.col("cv").alias("va"),
            F.col("__n").alias("na"),
        )
        b = normed.select(
            "cid", F.col("nid").alias("j"), F.col("cv").alias("vb"),
            F.col("__n").alias("nb"),
        )
        pairs = (
            a.join(b, "cid")
            .where(F.col("i") < F.col("j"))
            .select(
                "i",
                "j",
                F.round(
                    _staged_cosine(
                        F.col("va"), F.col("vb"), F.col("na"), F.col("nb")
                    ),
                    round_score,
                ).alias("score"),
            )
            .where(F.col("score") >= threshold)
        )
    labels = duplicate_clusters(ids, pairs, max_iterations=max_iterations)
    return labels.select(
        "id",
        "cluster",
        (F.col("id") == F.col("cluster")).cast("int").alias("kept"),
    )


def semdedup_incremental(
    batch: DataFrame,
    postings: DataFrame,
    centroids: list[list[float]],
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_score: int = 6,
    materialize: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Incremental SemDeDup step: compare a NEW batch of embeddings
    against an already-indexed corpus (and against itself) without
    ever re-scoring corpus-vs-corpus. Returns ``(pairs, delta)``:

    - ``pairs`` — (i, j, score): i is always a batch id; j is an
      indexed id (new-vs-corpus) or a larger batch id (new-vs-new,
      i < j). Score is within-cluster cosine >= ``threshold``.
    - ``delta`` — (cid, nid, cv): the batch's posting-list rows,
      for the caller to append to the index (same layout as
      :func:`ivf_build` / :func:`ivf_assign`).

    The quantizer (``centroids``) is fixed: batches assign with
    :func:`ivf_assign`, so the corpus is never re-clustered and the
    per-batch cost is |batch| x (posting lists of the touched
    clusters) — independent of total corpus size in all other
    clusters. Replay-safe by construction: the corpus side drops the
    batch's own ids first, so a micro-batch whose delta was already
    appended (at-least-once foreachBatch) emits exactly its original
    pairs instead of matching itself in the index; pairs are
    ``distinct()`` (an output-sized relation), so duplicate posting
    rows left by replayed appends of OTHER batches cannot multiply
    output either — the index itself is never re-shuffled per batch
    (fold its duplicates offline with the streaming module's
    ``compact_semdedup_index``).

    ``materialize=True`` eagerly localCheckpoints the assignment so
    the returned ``pairs`` (which reference it three times:
    batch-vs-corpus, both sides of batch-vs-batch) and the ``delta``
    append all read ONE computed pass — without it, each consumer
    re-runs the centroid assignment (4 passes per micro-batch; with
    >32 centroids that is 4 Arrow GEMM scans of the batch).
    """
    delta = ivf_assign(batch, centroids, corpus_id=id_col, vec_col=vec_col)
    if materialize:
        delta = delta.localCheckpoint(eager=True)
    batch_ids = delta.select(F.col("nid").alias("__bid"))
    corpus = postings.join(
        batch_ids, postings.nid == batch_ids.__bid, "left_anti"
    )
    delta_n = delta.withColumn("__n", l2_norm(F.col("cv")))
    corpus_n = corpus.withColumn("__n", l2_norm(F.col("cv")))
    b_i = delta_n.select(
        "cid", F.col("nid").alias("i"), F.col("cv").alias("va"),
        F.col("__n").alias("na"),
    )
    c_j = corpus_n.select(
        "cid", F.col("nid").alias("j"), F.col("cv").alias("vb"),
        F.col("__n").alias("nb"),
    )
    b_j = delta_n.select(
        "cid", F.col("nid").alias("j"), F.col("cv").alias("vb"),
        F.col("__n").alias("nb"),
    )
    vs_corpus = b_i.join(c_j, "cid")
    vs_batch = b_i.join(b_j, "cid").where(F.col("i") < F.col("j"))
    pairs = (
        vs_corpus.unionByName(vs_batch)
        .select(
            "i",
            "j",
            F.round(
                _staged_cosine(
                    F.col("va"), F.col("vb"), F.col("na"), F.col("nb")
                ),
                round_score,
            ).alias("score"),
        )
        .where(F.col("score") >= threshold)
        .distinct()
    )
    return pairs, delta


def ann_recall_report(
    truth: DataFrame,
    variants: dict[str, DataFrame],
    query_col: str = "qid",
    neighbor_col: str = "nid",
    round_out: int = 6,
) -> DataFrame:
    """Recall@k scoreboard for ANN variants against an exact ground
    truth — the measure-don't-guess step before an index choice is
    allowed near production: a 10x-faster index at 0.4 recall is not
    an optimization, and nothing in an ANN pipeline fails loudly when
    recall quietly collapses (results stay plausible-looking).

    ``truth`` is the exact result relation (e.g. :func:`cosine_topk`
    output) and each ``variants[name]`` an approximate one; both only
    need (query_col, neighbor_col). One row per variant:

    - ``macro_recall`` — mean of per-query |approx ∩ truth| / |truth|
      (every query votes equally, the standard ANN-benchmark metric);
    - ``micro_recall`` — total hits / total truth rows (volume-
      weighted; diverges from macro when per-query truth sizes vary);
    - ``n_queries``, ``n_truth_rows`` for context. Queries a variant
      returns NOTHING for still count (recall 0 for them), via the
      left join from the truth side.

    Shape: per variant, one equi-join truth⋈approx on (query, neighbor)
    + two aggregations — truth relations are |Q| x k rows, so this is
    report-grain work, no corpus scan. Deterministic given
    deterministic inputs (every in-repo variant is seed-pinned).
    """
    if not variants:
        raise ValueError("ann_recall_report: variants must be non-empty")
    t = truth.select(
        F.col(query_col).alias("__q"), F.col(neighbor_col).alias("__n")
    )
    reports = []
    for name, approx in variants.items():
        a = approx.select(
            F.col(query_col).alias("__q"),
            F.col(neighbor_col).alias("__n"),
            F.lit(1).alias("__hit"),
        ).distinct()
        per_q = (
            t.join(a, ["__q", "__n"], "left")
            .groupBy("__q")
            .agg(
                F.count(F.lit(1)).alias("__truth"),
                F.sum(F.coalesce("__hit", F.lit(0))).alias("__hits"),
            )
        )
        reports.append(
            per_q.agg(
                F.lit(name).alias("variant"),
                F.count(F.lit(1)).alias("n_queries"),
                F.sum("__truth").alias("n_truth_rows"),
                F.round(F.avg(F.col("__hits") / F.col("__truth")), round_out).alias(
                    "macro_recall"
                ),
                F.round(F.sum("__hits") / F.sum("__truth"), round_out).alias(
                    "micro_recall"
                ),
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out


def choose_n_probe(
    truth: DataFrame,
    probe_fn,
    candidate_probes,
    recall_floor: float,
    n_cells: int | None = None,
    metric: str = "macro_recall",
    query_col: str = "qid",
    neighbor_col: str = "nid",
) -> tuple[int | None, DataFrame]:
    """Close the measure-don't-guess loop on IVF probe width: evaluate
    ``probe_fn(n_probe)`` for each candidate against the exact
    ``truth`` relation (a held-out query sample's :func:`cosine_topk`)
    via :func:`ann_recall_report` and pick the SMALLEST ``n_probe``
    whose measured ``metric`` meets ``recall_floor`` — n_probe is the
    recall/cost dial of every IVF index (expected scan fraction ~
    n_probe / n_cells), and guessing it is how ANN recall quietly
    collapses in production.

    Returns ``(chosen_n_probe, frontier)`` where ``frontier`` is one
    row per candidate: ``n_probe``, the report's recall columns, and
    ``scan_fraction`` (n_probe / n_cells when ``n_cells`` is given —
    the measured-candidate-reduction companion, see SCALE.md's
    ``ivfpq_topk_blocked`` row tracking it at 0.072 vs 0.062 expected).
    ``chosen_n_probe`` is None when NO candidate meets the floor — the
    caller's signal to fall back to exhaustive probing (which pins
    recall 1.0 by construction: probing every cell IS brute force) or
    re-cluster.

    Evaluation cost: each candidate probes only the held-out sample
    (report-grain joins, |Q| x k rows per variant), never the corpus at
    production query volume. The frontier is computed in ONE
    ann_recall_report pass over all candidates.
    """
    probes = sorted(set(int(p) for p in candidate_probes))
    if not probes:
        raise ValueError("choose_n_probe: candidate_probes must be non-empty")
    if not (0.0 < recall_floor <= 1.0):
        raise ValueError(
            f"choose_n_probe: recall_floor must be in (0, 1], got {recall_floor}"
        )
    if metric not in ("macro_recall", "micro_recall"):
        raise ValueError(
            f"choose_n_probe: metric must be macro_recall or micro_recall, "
            f"got {metric!r}"
        )
    variants = {f"n_probe={p}": probe_fn(p) for p in probes}
    rep = ann_recall_report(
        truth, variants, query_col=query_col, neighbor_col=neighbor_col
    )
    frontier = rep.withColumn(
        "n_probe", F.split(F.col("variant"), "=").getItem(1).cast("int")
    )
    if n_cells is not None:
        frontier = frontier.withColumn(
            "scan_fraction",
            F.round(F.col("n_probe") / F.lit(float(n_cells)), 6),
        )
    frontier = frontier.orderBy("n_probe")
    rows = frontier.collect()  # one row per candidate: driver-trivial
    chosen = next(
        (r["n_probe"] for r in rows if r[metric] >= recall_floor), None
    )
    # return the MATERIALIZED frontier: handing back the lazy plan
    # would re-run every candidate probe each time the caller looks at it
    spark = truth.sparkSession
    return chosen, spark.createDataFrame(rows, frontier.schema)
