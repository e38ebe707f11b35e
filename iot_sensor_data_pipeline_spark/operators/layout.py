"""Data-layout helpers: multi-dimensional clustering for scan pruning.

A table sorted by one column prunes beautifully on that column and not
at all on any other. ``zorder_key`` interleaves the bits of several
bounded integer columns into one sort key (Morton / Z-order curve), so
sorting by it clusters rows that are close in EVERY keyed dimension
into the same files and row groups — parquet min/max stats then prune
multi-dimensional predicates (point lookups, boxes, per-dimension
bands) instead of only the leading sort column. This is the layout
trick behind Delta/Iceberg OPTIMIZE ZORDER, expressed as a plain
codegen expression usable with any ``sortWithinPartitions``/
``repartitionByRange`` write.

The curve needs bounded non-negative ints per dimension; use
``bucketize_for_zorder`` to rank arbitrary numeric/timestamp columns
into ``2^bits`` quantile buckets first (approx quantiles — layout
quality needs rough uniformity, not exactness).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: Sequence[str | Column], bits: int = 12) -> Column:
    """Morton interleave of ``cols`` (each an integer in
    ``[0, 2^bits)``) into one long. Bit i of column k lands at
    position ``i * n_cols + k``, so the combined key alternates bits
    across dimensions — pure shift/or codegen, no UDF. ``bits`` is
    per-dimension resolution: n_cols * bits must fit 63 bits.
    Values outside the range fold in via a mask (pruning quality
    degrades, correctness of downstream predicates is unaffected —
    the key orders rows, it never filters them)."""
    cols = list(cols)
    n = len(cols)
    if n < 2:
        raise ValueError("zorder_key: interleaving needs >= 2 columns")
    if n * bits > 63:
        raise ValueError(f"zorder_key: {n} cols x {bits} bits exceeds a long")
    key = F.lit(0).cast("long")
    for k, c in enumerate(cols):
        v = (
            (F.col(c) if isinstance(c, str) else c)
            .cast("long")
            .bitwiseAND(F.lit((1 << bits) - 1))
        )
        for i in range(bits):
            bit = F.shiftright(v, i).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, i * n + k))
    return key


def bucketize_for_zorder(
    df: DataFrame, cols: Sequence[str], bits: int = 7, rel_err: float = 0.001
) -> DataFrame:
    """Append ``__zb_<col>`` quantile-bucket columns in
    ``[0, 2^bits)`` for each of ``cols`` — rank-based, so skewed
    distributions still spread evenly over the curve (raw value bits
    would collapse a log-normal column into a few buckets). Timestamp/
    date columns are bucketed via their epoch seconds (approxQuantile
    is numeric-only). ONE approx-quantile pass covers every column;
    feed the bucket columns to :func:`zorder_key` with the same
    ``bits``.

    ``bits`` defaults low on purpose: 2^bits buckets per dimension is
    plenty to shape file-level clustering (files >> buckets is
    useless), and the cut-point resolution must stay well above the
    sketch's rank error — at the defaults (128 buckets, rel_err 0.1%)
    adjacent cuts are ~8 sketch-errors apart. Raising ``bits`` without
    tightening ``rel_err`` buys duplicate cut points (collapsed
    buckets), not finer layout; each row also pays an O(2^bits)
    bucket-search fold per column."""
    cols = list(cols)
    n_buckets = 1 << bits
    numeric = {}
    work = df
    for c in cols:
        dtype = dict(df.dtypes)[c]
        if dtype in ("timestamp", "timestamp_ntz", "date"):
            work = work.withColumn(f"__zq_{c}", F.col(c).cast("timestamp").cast("double"))
            numeric[c] = f"__zq_{c}"
        else:
            numeric[c] = c
    probs = [i / n_buckets for i in range(1, n_buckets)]
    all_cuts = work.approxQuantile([numeric[c] for c in cols], probs, rel_err)
    out = work
    for c, cuts in zip(cols, all_cuts):
        # searchsorted as a codegen expression: count of cut points <= value
        arr = F.array(*[F.lit(x) for x in cuts])
        out = out.withColumn(
            f"__zb_{c}",
            F.aggregate(
                F.filter(arr, lambda cut: cut <= F.col(numeric[c])),
                F.lit(0).cast("long"),
                lambda acc, _: acc + 1,
            ),
        )
    return out.drop(*[v for k, v in numeric.items() if v != k])
