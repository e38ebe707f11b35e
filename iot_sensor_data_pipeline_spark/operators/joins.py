"""Join operators.

The reference contains ZERO joins (SURVEY.md §2.4 gap list); a
same-capabilities engine needs the full join surface. Everything here
is built-in DataFrame joins — Catalyst + AQE pick broadcast vs
sort-merge vs shuffled-hash at runtime — plus one genuinely missing
operator (as-of join) composed from built-ins.

Scale notes:
- `broadcast_join` pins the small side as a broadcast hash join: no
  shuffle of the big side. Use for dimension tables (region, nation,
  part at 100 TB fact scale).
- semi/anti joins ship only the join keys of the right side — prefer
  them over inner-join+distinct for existence checks.
- the as-of join is ONE shuffle (by the equi-key) + ONE sort within
  partitions — the same cost profile as a sort-merge join, with no
  Python in the path. This beats the per-group `merge_asof` pandas
  approach (which pays Arrow serialization) and is skew-tolerant via
  AQE like any other exchange.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def broadcast_join(
    big: DataFrame, small: DataFrame, on, how: str = "inner"
) -> DataFrame:
    """Equi-join with the small side broadcast (no big-side shuffle)."""
    return big.join(F.broadcast(small), on, how)


def semi_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """EXISTS: rows of ``left`` with at least one match in ``right``."""
    return left.join(right, on, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """NOT EXISTS: rows of ``left`` with no match in ``right``."""
    return left.join(right, on, "left_anti")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_vals: Sequence[str],
    how: str = "left",
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    ``right_ts <= left_ts`` within the same ``on`` keys (inclusive,
    matching DuckDB/kdb ASOF semantics).

    Spark has no native as-of join; this composes one from a union +
    ordered window with `last(..., ignorenulls)`:

    1. tag both inputs and union them (right rows carry their values,
       left rows carry nulls),
    2. per equi-key, order by (ts, side) — right rows sort before left
       rows at equal timestamps so `<=` is inclusive,
    3. `last(value, ignorenulls=True)` over rows-unbounded-preceding
       propagates the most recent right value onto every left row,
    4. keep only left rows.

    Cost: one shuffle on ``on`` + one sort — identical to sort-merge
    join, fully JVM-side, streaming-friendly frame (no full-partition
    buffering).

    Ties: multiple RIGHT rows with the same (key, right_ts) resolve to
    an arbitrary one of them (same ambiguity as pandas merge_asof,
    which silently takes input order) — dedupe the right side first if
    that matters.
    """
    on = list(on)
    lcols = left.columns
    # right values travel as ONE struct: last(ignorenulls) then skips
    # whole unmatched (left) rows but keeps matched rows even when
    # individual value columns are NULL — per-column propagation would
    # skip NULL VALUES and blend columns from different right rows
    rstruct_type = T.StructType([right.schema[c] for c in right_vals])
    tagged_left = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.col(c).alias(f"__l_{c}") for c in lcols if c not in on],
        F.lit(None).cast(rstruct_type).alias("__rvals"),
    )
    tagged_right = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}") for c in lcols if c not in on],
        F.struct(*right_vals).alias("__rvals"),
    )

    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts"), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = tagged_left.unionByName(tagged_right).withColumn(
        "__rvals", F.last("__rvals", ignorenulls=True).over(w)
    )

    out = merged.where(F.col("__side") == 1)
    if how == "inner":
        out = out.where(F.col("__rvals").isNotNull())
    return out.select(
        *on,
        F.col("__ts").alias(left_ts),
        *[F.col(f"__l_{c}").alias(c) for c in lcols if c not in on and c != left_ts],
        *[F.col(f"__rvals.{c}").alias(c) for c in right_vals],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_lo: str,
    right_hi: str,
    bucket_width: float,
    extra_on: Sequence[str] = (),
) -> DataFrame:
    """Scale-safe interval join: pairs every left row with the right
    rows whose half-open interval ``[lo, hi)`` contains its point
    value. Spark plans a bare non-equi join as a broadcast-nested-loop
    or cartesian product — O(|L| x |R|) and a cluster-killer at any
    real size. This operator makes it an EQUI-join by binning:

    - each left row gets ONE bucket, ``floor(point / width)``;
    - each right interval explodes to the buckets it covers
      (``sequence(floor(lo/w), floor(hi/w))``);
    - equi-join on the bucket (plus ``extra_on`` keys), then the exact
      residual predicate ``lo <= point < hi``.

    Every matching pair survives exactly once (the left row's single
    bucket is covered by the right interval at most once), so no
    distinct pass is needed. Shuffle volume is |L| + |R| x (mean
    interval span / width): pick ``bucket_width`` near the MEDIAN
    interval length — too small multiplies right rows, too large packs
    unrelated rows into one bucket and pushes work into the residual
    filter. A long-tail interval (>> width) multiplies accordingly;
    split pathological spans into a separate branch if the tail is
    heavy. Columns are numeric; join on timestamps by passing epoch
    expressions (``F.unix_timestamp``) in a prior select.

    Column names must be disjoint apart from ``extra_on`` (both
    sides' columns pass through unprefixed); overlapping names raise
    here at plan-build time instead of surfacing as an
    AMBIGUOUS_REFERENCE from the residual predicate.
    """
    w = float(bucket_width)
    if not (w > 0.0) or math.isinf(w):
        # w=0 would floor every value into one bucket (Infinity /
        # Long.MaxValue) — the single-partition quadratic join this
        # operator exists to prevent, with CORRECT output masking it
        raise ValueError(f"range_join: bucket_width must be a positive finite number, got {bucket_width}")
    overlap = (set(left.columns) & set(right.columns)) - set(extra_on)
    if overlap:
        raise ValueError(
            "range_join: left and right share non-key columns "
            f"{sorted(overlap)} — rename or drop them (output columns "
            "pass through unprefixed), or list join keys in extra_on"
        )
    lb = left.withColumn("__bucket", F.floor(F.col(left_point) / w))
    rb = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(right_lo) / w), F.floor(F.col(right_hi) / w)
            )
        ),
    )
    on = ["__bucket", *extra_on]
    return (
        lb.join(rb, on)
        .where(
            (F.col(right_lo) <= F.col(left_point))
            & (F.col(left_point) < F.col(right_hi))
        )
        .drop("__bucket")
    )
