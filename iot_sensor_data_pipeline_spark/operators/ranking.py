"""Scale-safe global ranking.

A window over ``Window.orderBy(...)`` with no partitionBy collapses the
whole relation into ONE partition (``Exchange SinglePartition`` in the
plan) — the classic 100-TB scale-killer for ntile/percent_rank/rank.
This module computes EXACT global row numbers the way Spark's own
distributed sort does, but keeps the result distributed:

1. ``repartitionByRange`` on the sort key (sampled range boundaries —
   one ordinary shuffle, disjoint ordered ranges per partition),
2. per-partition ``row_number`` (parallel, partition-local window),
3. per-partition counts -> cumulative offsets (#partitions rows to the
   driver — trivially small at any data scale),
4. broadcast the offset table back and add.

``rank``/``percent_rank``/``cume_dist``/``ntile`` are then pure
arithmetic over the row number (formulas below), so the single-
partition exchange never appears in any plan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def global_row_number(
    df: DataFrame,
    order_by: Sequence[Column],
    out_col: str = "row_number",
    num_partitions: int | None = None,
    return_count: bool = False,
) -> DataFrame | tuple[DataFrame, int]:
    """Exact 1-based global row number in ``order_by`` order, without a
    single-partition sort. The full sort key must be unique (row_number
    over ties would otherwise depend on partition-internal order).

    The range-partitioned relation is LOCAL-CHECKPOINTED before the
    offsets collect — load-bearing for correctness, not a cache
    optimization: ``repartitionByRange`` samples its boundaries per
    query execution, so without it the offsets job and the final join
    would each plan their own exchange and could place rows in
    different partitions, silently mismatching the broadcast offsets.
    The checkpoint materializes the partitioning ONCE and truncates
    lineage, so re-sampling is impossible by construction (executor
    loss fails loudly instead of recomputing differently). Checkpoint
    storage is RDD-level, reclaimed by Spark's ContextCleaner when the
    result is garbage collected — unlike ``Dataset.persist``, whose
    CacheManager entry would outlive the call.

    ``return_count=True`` additionally returns the total row count —
    free here (it is the sum of the per-partition counts), saving
    callers a separate ``df.count()`` action.
    """
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))

    parts = df.repartitionByRange(num_partitions, *order_by).withColumn(
        "__pid", F.spark_partition_id()
    )
    local = parts.withColumn(
        "__lrn", F.row_number().over(Window.partitionBy("__pid").orderBy(*order_by))
    ).localCheckpoint(eager=True)
    counts = sorted(
        local.groupBy("__pid").count().collect(), key=lambda r: r["__pid"]
    )
    offsets, acc = [], 0
    for r in counts:
        offsets.append((r["__pid"], acc))
        acc += r["count"]
    offset_df = spark.createDataFrame(offsets or [], "__pid int, __offset long")
    out = (
        local.join(F.broadcast(offset_df), "__pid")
        .withColumn(out_col, F.col("__offset") + F.col("__lrn"))
        .drop("__pid", "__lrn", "__offset")
    )
    if return_count:
        return out, acc
    return out


def ntile_from_rank(rank: Column, n_rows: int, tiles: int) -> Column:
    """ANSI ntile(tiles) from a 1-based global rank: the first
    ``n_rows % tiles`` buckets hold ``n_rows // tiles + 1`` rows, the
    rest hold ``n_rows // tiles`` — pure arithmetic, no window."""
    q, rem = divmod(n_rows, tiles)
    big = q + 1
    cutoff = rem * big
    small = max(q, 1)  # q == 0: every row lands in the `big` region
    return (
        F.when(rank <= F.lit(cutoff), F.floor((rank - 1) / big) + 1)
        .otherwise(F.lit(rem) + F.floor((rank - F.lit(cutoff) - 1) / small) + 1)
        .cast("int")
    )


def percent_rank_from_rank(rank: Column, n_rows: int) -> Column:
    """ANSI percent_rank from a 1-based rank over a UNIQUE sort key:
    (rank - 1) / (n_rows - 1); defined as 0 for a single row."""
    if n_rows <= 1:
        return F.lit(0.0)
    return (rank - 1) / F.lit(float(n_rows - 1))


def cume_dist_from_rank(rank: Column, n_rows: int) -> Column:
    """ANSI cume_dist over a UNIQUE sort key: rank / n_rows (with ties
    impossible, the last-peer rank is the rank itself)."""
    return rank / F.lit(float(max(n_rows, 1)))


def ranking_metrics_report(
    results: DataFrame,
    relevance: DataFrame,
    k: int,
    query_col: str = "qid",
    item_col: str = "nid",
    rank_col: str = "rn",
    rel_col: str = "rel",
    round_out: int = 6,
) -> DataFrame:
    """Per-query ranking-quality metrics — the retrieval-evaluation
    companion to ``similarity.ann_recall_report``: where recall asks
    "did the index find the true neighbors", this asks "is the ranking
    USEFUL against graded relevance judgments" (the RAG / search-eval
    question, scored the way IR benchmarks score it).

    ``results`` carries 1-based ranks (``rank_col``) per query —
    e.g. :func:`~.similarity.cosine_topk` output; ``relevance`` is the
    judgment relation (query, item, grade>0), absent pairs grade 0.
    One row per DISTINCT query in ``results``:

    - ``rr``           — reciprocal rank of the first relevant result
                         (0.0 when nothing relevant in the top k);
    - ``precision_at_k`` — relevant results in the top k / k;
    - ``recall_at_k``  — relevant results in the top k / the query's
                         total relevant count (NULL when the query has
                         no judged-relevant items — undefined, not 0);
    - ``ndcg_at_k``    — DCG/IDCG with the standard rel/log2(rank+1)
                         gain and the ideal ranking truncated at k
                         (NULL when undefined, as above).

    Ties in the ideal ordering break by (grade DESC, item ASC) so the
    IDCG is engine-deterministic. Shape: one equi-join of the top-k
    relation with judgments plus two aggregations at query grain —
    eval-set sized work; the corpus never appears here.
    """
    if k < 1:
        raise ValueError(f"ranking_metrics_report: k must be >= 1, got {k}")
    res = results.select(
        F.col(query_col).alias("__q"),
        F.col(item_col).alias("__i"),
        F.col(rank_col).alias("__rn"),
    ).where(F.col("__rn") <= k)
    rel = relevance.select(
        F.col(query_col).alias("__q"),
        F.col(item_col).alias("__i"),
        F.col(rel_col).cast("double").alias("__rel"),
    ).where(F.col("__rel") > 0)
    # judgment relations may carry duplicate (query, item) rows
    # (multiple raters / merged sources); collapse to max grade so the
    # left join stays 1:1 — duplicates would otherwise multiply hits,
    # precision, DCG, and n_rel
    rel = rel.groupBy("__q", "__i").agg(F.max("__rel").alias("__rel"))

    j = res.join(rel, ["__q", "__i"], "left").select(
        "__q", "__rn", F.coalesce("__rel", F.lit(0.0)).alias("__rel")
    )
    got = j.groupBy("__q").agg(
        F.min(F.when(F.col("__rel") > 0, F.col("__rn"))).alias("__first"),
        F.sum((F.col("__rel") > 0).cast("int")).alias("__hits"),
        F.sum(F.col("__rel") / F.log2(F.col("__rn") + 1)).alias("__dcg"),
    )
    wi = Window.partitionBy("__q").orderBy(F.col("__rel").desc(), F.col("__i").asc())
    ideal = (
        rel.withColumn("__ir", F.row_number().over(wi))
        .groupBy("__q")
        .agg(
            F.count(F.lit(1)).alias("__n_rel"),
            F.sum(
                F.when(
                    F.col("__ir") <= k, F.col("__rel") / F.log2(F.col("__ir") + 1)
                ).otherwise(F.lit(0.0))
            ).alias("__idcg"),
        )
    )
    return (
        got.join(ideal, "__q", "left")
        .select(
            F.col("__q").alias(query_col),
            F.round(
                F.coalesce(F.lit(1.0) / F.col("__first"), F.lit(0.0)), round_out
            ).alias("rr"),
            F.round(F.col("__hits") / F.lit(float(k)), round_out).alias(
                "precision_at_k"
            ),
            F.round(F.col("__hits") / F.col("__n_rel"), round_out).alias(
                "recall_at_k"
            ),
            F.round(F.col("__dcg") / F.col("__idcg"), round_out).alias("ndcg_at_k"),
        )
    )


def binary_classification_report(
    df: DataFrame,
    score_col: str,
    label_col: str,
    by: list[str],
    n_calibration_bins: int = 10,
    round_out: int = 6,
) -> DataFrame:
    """Per-group evaluation of a binary scorer — the model-eval
    companion to :func:`ranking_metrics_report` for the pipeline's own
    classifiers (``quality.train_quality_classifier`` scores, heuristic
    quality gates, drift-triggered re-labels): where the ranking report
    asks "is the ORDERING useful", this asks "does the score SEPARATE
    and is it CALIBRATED", per group, exactly.

    One row per ``by`` group: ``(by..., n, n_pos, auc, brier, ece)``.

    - ``auc`` — ROC AUC via the tie-aware Mann-Whitney rank-sum
      identity: with average ranks r_i over the group's scores,
      ``AUC = (sum_{i in pos} r_i - n_pos(n_pos+1)/2) / (n_pos*n_neg)``
      (the published equivalence; ties contribute 1/2, matching the
      trapezoidal ROC). Computed at DISTINCT-SCORE grain: one groupBy
      to (group, score) counts, ONE window per group ordered by score
      for the cumulative count (metadata-sized relation — never a
      per-row global sort), one final aggregate. NULL when the group is
      single-class (no ranking to score — the ranking_metrics NULL
      discipline, never a misleading 0.5).
    - ``brier`` — mean squared error of the probability against the
      0/1 label; the proper-scoring-rule summary.
    - ``ece`` — expected calibration error over ``n_calibration_bins``
      fixed-width probability bins: sum over bins of
      ``|mean(score) - mean(label)| * n_bin / n``. Fixed-width (not
      quantile) bins keep the whole report pure arithmetic, so a SQL
      oracle reproduces it bit-for-bit — the drift_report discipline.

    Scores must lie in [0, 1] (validated — a raw margin would silently
    corrupt brier/ece); labels must be 0/1 integers (NULL labels are
    rejected loudly rather than dropped: a silently shrinking eval set
    is how eval bugs hide). Validation rides the main projection
    (``raise_error`` under a ``when`` — the apply_cdc discipline), so
    it costs no eager validation job; the raise surfaces at action
    time with the offending values in the message.
    Rows whose ``by`` key is NULL are excluded by the report joins
    (standard equi-join semantics — the same rule a SQL ``GROUP BY ..
    JOIN USING`` oracle applies); coalesce group keys upstream if NULL
    is a group you care about. Everything is plain expressions over two
    aggregation passes + one per-group window at distinct-score grain;
    no UDFs, no collects."""
    if not by:
        raise ValueError(
            "binary_classification_report: by must be non-empty (use a "
            "constant column for one global report)"
        )
    if n_calibration_bins < 2:
        raise ValueError("binary_classification_report: n_calibration_bins >= 2")
    from pyspark.sql import Window

    s, y = F.col(score_col), F.col(label_col)
    # inline fail-loud: the ok-condition is NULL for NULL score/label,
    # so the when() is not-true for NULLs AND out-of-domain values —
    # either way the otherwise branch raises with the offending pair
    ok = (s >= 0) & (s <= 1) & y.isin(0, 1)
    base = df.select(
        *by,
        F.when(ok, s.cast("double")).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        f"binary_classification_report: NULL/out-of-[0,1] "
                        f"{score_col!r} or non-0/1 {label_col!r}: score="
                    ),
                    F.coalesce(s.cast("string"), F.lit("NULL")),
                    F.lit(", label="),
                    F.coalesce(y.cast("string"), F.lit("NULL")),
                )
            )
        ).alias("__s"),
        y.cast("long").alias("__y"),
    )
    # distinct-score grain: counts per (group, score)
    g = base.groupBy(*by, "__s").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__y").alias("__npos"),
        F.sum(F.pow(F.col("__s") - F.col("__y"), F.lit(2.0))).alias("__se"),
    )
    wcum = (
        Window.partitionBy(*by).orderBy("__s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = g.select(
        *by, "__n", "__npos", "__se",
        (
            F.coalesce(F.sum("__n").over(wcum), F.lit(0))
            + (F.col("__n") + 1) / 2.0
        ).alias("__avg_rank"),
    )
    per_group = ranked.groupBy(*by).agg(
        F.sum("__n").alias("n"),
        F.sum("__npos").alias("n_pos"),
        F.sum(F.col("__npos") * F.col("__avg_rank")).alias("__pos_ranks"),
        F.sum("__se").alias("__se_sum"),
    )
    n_neg = F.col("n") - F.col("n_pos")
    auc = F.try_divide(
        F.col("__pos_ranks") - F.col("n_pos") * (F.col("n_pos") + 1) / 2.0,
        (F.col("n_pos") * n_neg).cast("double"),
    )
    # calibration bins: fixed-width over [0,1]; score == 1.0 folds into
    # the last bin (same closed-top rule as drift_report's edge bin)
    b = n_calibration_bins
    bin_expr = F.least(F.floor(F.col("__s") * b), F.lit(b - 1)).cast("long")
    cal = (
        base.groupBy(*by, bin_expr.alias("__b"))
        .agg(
            F.count(F.lit(1)).alias("__nb"),
            F.avg("__s").alias("__ms"),
            F.avg(F.col("__y").cast("double")).alias("__my"),
        )
        .groupBy(*by)
        .agg(
            F.sum(
                F.abs(F.col("__ms") - F.col("__my")) * F.col("__nb")
            ).alias("__ece_num"),
            F.sum("__nb").alias("__n2"),
        )
    )
    return per_group.join(cal, by).select(
        *by,
        "n",
        "n_pos",
        F.round(auc, round_out).alias("auc"),
        F.round(F.col("__se_sum") / F.col("n"), round_out).alias("brier"),
        F.round(F.col("__ece_num") / F.col("__n2"), round_out).alias("ece"),
    )
