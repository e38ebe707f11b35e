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
