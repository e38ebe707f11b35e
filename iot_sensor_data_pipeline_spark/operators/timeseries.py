"""Time-series subsequence similarity search — find where a query
pattern occurs in a fleet's value streams (UCR-suite-style z-normalized
euclidean matching, the standard primitive behind "which sensors showed
this spike shape, and when").

Spark-first shape: subsequences are sliding windows materialized with
``collect_list`` over a rows-frame window (one shuffle on the series
key, frame order fixed by a unique (ts, id) ordering), the query
pattern is z-normalized ONCE driver-side and embedded as an array
literal, and the distance is a codegen ``zip_with``/``aggregate`` fold
— no UDF, no driver collect. Top-k goes through orderBy+limit, which
Spark executes as TakeOrderedAndProject (per-partition heaps, never a
global sort).

Z-normalization makes the match amplitude- and offset-invariant (a
spike is a spike whether it rides on 20C or 30C); windows with zero
variance (flat lines) cannot be z-normalized and are excluded, which
also keeps the oracle semantics engine-exact (no 0/0).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def znorm_pattern_topk(
    series: DataFrame,
    pattern: list[float],
    k: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    round_dist: int = 6,
) -> DataFrame:
    """Top-``k`` closest length-``len(pattern)`` subsequences to
    ``pattern`` across every series, by z-normalized euclidean
    distance. Returns ``(key, ts, dist)`` where ``ts`` is the
    subsequence's LAST point, ordered by (dist, key, ts) — ties
    deterministic. ``id_col`` breaks ordering ties inside a series so
    the window frames (and therefore results) are reproducible.
    """
    m = len(pattern)
    if m < 2:
        raise ValueError(f"znorm_pattern_topk: pattern needs >= 2 points, got {m}")
    mean_q = sum(pattern) / m
    var_q = sum((x - mean_q) ** 2 for x in pattern) / m
    if var_q <= 0:
        raise ValueError("znorm_pattern_topk: constant pattern cannot be z-normalized")
    std_q = math.sqrt(var_q)
    q_norm = F.array(*[F.lit((x - mean_q) / std_q) for x in pattern])

    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col), F.col(id_col))
        .rowsBetween(-(m - 1), 0)
    )
    seqs = series.select(
        F.col(key_col).alias("key"),
        F.col(ts_col).alias("ts"),
        F.collect_list(F.col(value_col).cast("double")).over(w).alias("seq"),
    ).where(F.size("seq") == m)

    s_sum = F.aggregate("seq", F.lit(0.0), lambda a, x: a + x)
    s_sq = F.aggregate("seq", F.lit(0.0), lambda a, x: a + x * x)
    # greatest(..., 0): float cancellation can push the variance of a
    # flat window a hair NEGATIVE (e.g. constant 0.1), and
    # sqrt(negative) = NaN which Spark orders ABOVE every number — so
    # a bare `sigma > 0` guard would pass NaN sigmas and leak
    # NaN-distance rows into the top-k. Clamping makes flat windows
    # exactly 0 and the filter airtight.
    variance = F.greatest(s_sq / m - (s_sum / m) * (s_sum / m), F.lit(0.0))
    with_stats = seqs.select(
        "key",
        "ts",
        "seq",
        (s_sum / m).alias("mu"),
        F.sqrt(variance).alias("sigma"),
    ).where(F.col("sigma") > 0)  # flat windows are not z-normalizable

    zdiff = F.zip_with(
        "seq",
        q_norm,
        lambda x, q: ((x - F.col("mu")) / F.col("sigma") - q)
        * ((x - F.col("mu")) / F.col("sigma") - q),
    )
    dist = F.sqrt(F.aggregate(zdiff, F.lit(0.0), lambda a, x: a + x))
    return (
        with_stats.select(
            "key", "ts", F.round(dist, round_dist).alias("dist")
        )
        .orderBy(F.col("dist").asc(), F.col("key").asc(), F.col("ts").asc())
        .limit(k)
    )


def rolling_zscore_anomalies(
    series: DataFrame,
    window_rows: int,
    k_sigma: float = 3.0,
    min_periods: int | None = None,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    round_stats: int = 6,
) -> DataFrame:
    """Adaptive anomaly detection: flag a point when it deviates more
    than ``k_sigma`` standard deviations from its OWN series' rolling
    baseline (mean/std of the ``window_rows`` PRECEDING points — the
    current point is excluded so an outlier cannot absorb itself into
    its baseline). The adaptive complement to the reference's static
    thresholds (reference alert_detector.py:106-153): a sensor that
    normally reads 20C and one that reads 30C each get their own
    baseline, and drifting fleets need no rule rewrites.

    Points with fewer than ``min_periods`` (default: ``window_rows``)
    preceding samples, or a zero-variance baseline, emit
    ``is_anomaly = NULL`` (unknown — no baseline to judge against)
    rather than false. Returns
    ``(key, ts, value, mu, sigma, is_anomaly)``.

    One shuffle on the series key (same rows-frame window machinery as
    :func:`znorm_pattern_topk`, all codegen aggregates); at 100 TB the
    per-series state is the frame, so memory is window_rows x active
    series per task, independent of history length.
    """
    if window_rows < 2:
        raise ValueError(f"rolling_zscore_anomalies: window_rows must be >= 2, got {window_rows}")
    if min_periods is None:
        min_periods = window_rows
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col), F.col(id_col))
        .rowsBetween(-window_rows, -1)
    )
    v = F.col(value_col).cast("double")
    mu = F.avg(v).over(w)
    sigma = F.stddev_samp(v).over(w)
    n = F.count(v).over(w)
    flag = (
        F.when((n < min_periods) | sigma.isNull() | (sigma <= 0), F.lit(None).cast("boolean"))
        .otherwise(F.abs(v - mu) > k_sigma * sigma)
    )
    return series.select(
        F.col(key_col).alias("key"),
        F.col(ts_col).alias("ts"),
        v.alias("value"),
        F.round(mu, round_stats).alias("mu"),
        F.round(sigma, round_stats).alias("sigma"),
        flag.alias("is_anomaly"),
    )


def time_weighted_avg(
    df: DataFrame,
    time_col: str,
    bucket_width: int,
    key_cols: list[str],
    value_col: str,
    method: str = "locf",
    id_col: str | None = None,
    max_carry: float | str | None = "auto",
    round_out: int = 6,
    tuned: dict | None = None,
    tune_sample_rows: int = 100_000,
) -> DataFrame:
    """Time-weighted average per (key, bucket) over IRREGULARLY sampled
    series (TimescaleDB's ``time_weight('LOCF'|'Linear')`` +
    ``average``): each sample holds from its timestamp to the next
    sample's, the step (LOCF) or linear (trapezoidal) function is
    integrated, and segments are CLIPPED at bucket boundaries so a
    reading that straddles buckets contributes exactly its overlap to
    each. A plain ``avg`` over-weights burst periods — ten readings in
    one second count ten times a reading that held for ten minutes;
    the time-weighted form is the physically meaningful mean for
    sampled state (temperature, gauge levels, connection counts).

    ``time_col`` is NUMERIC (epoch seconds — the module's
    TZ-independent convention, see :func:`time_bucket_gapfill`),
    ``bucket_width`` a positive integer in the same unit. ``id_col``
    breaks ordering ties between equal timestamps so segment
    construction is deterministic; equal-timestamp pairs form
    zero-length segments which carry zero weight. ``max_carry`` (same
    unit) truncates any segment at ``t0 + max_carry`` — both a
    staleness bound (a sensor silent for a week should not project its
    last reading across the week) and the explosion bound: a segment
    covers span/width bucket rows, so carry is never unbounded.

    ``max_carry`` DEFAULTS to ``"auto"``: the p99 inter-sample gap
    from a hash-ordered capped sample of the segments (the
    ``range_join`` auto-tune discipline — layout-independent,
    TakeOrderedAndProject, never a full sort), floored at one
    ``bucket_width`` so dense series are never clipped. SCALE.md
    measured unbounded carry exploding 100k sparse events into 6.29M
    bucket rows (9.6x the bounded form) — at 100 TB the unbounded form
    is the dangerous configuration, so it is OPT-IN: pass
    ``max_carry=None`` to integrate across arbitrary silences. Auto
    costs one extra execution of the segment window (the tuning
    action); perf-critical recurring jobs should measure once and pin
    the value. Pass a dict as ``tuned`` to receive the chosen bound.

    Output: ``key_cols``, ``bucket`` (bucket start, long), ``twa``
    (integral / covered time, double), ``covered`` (observed seconds
    inside the bucket — exposed because twa over a 1 %-covered bucket
    is a much weaker statement than over a fully covered one). Buckets
    no segment touches are absent — compose with
    :func:`time_bucket_gapfill` for a dense axis.

    Scale shape: ONE shuffle on the series key for the lead() window,
    then the bucket explode (covered buckets per segment, bounded by
    ``max_carry``) feeds a map-side-combinable sum aggregation — the
    same bucketize-don't-BNLJ discipline as ``range_join``
    (operators/joins.py). No UDF, no driver collect.
    """
    if bucket_width < 1:
        raise ValueError(
            f"time_weighted_avg: bucket_width must be a positive "
            f"integer, got {bucket_width}"
        )
    if method not in ("locf", "linear"):
        raise ValueError(
            f"time_weighted_avg: method must be 'locf' or 'linear', got {method!r}"
        )
    if not key_cols:
        raise ValueError(
            "time_weighted_avg: key_cols must be non-empty (use a "
            "constant column for a single global series)"
        )
    if isinstance(max_carry, str):
        if max_carry != "auto":
            raise ValueError(
                f"time_weighted_avg: max_carry must be a positive number, "
                f"None (unbounded), or 'auto', got {max_carry!r}"
            )
    elif max_carry is not None and max_carry <= 0:
        raise ValueError(
            f"time_weighted_avg: max_carry must be positive, got {max_carry}"
        )
    w = int(bucket_width)
    order = [F.col(time_col)] + ([F.col(id_col)] if id_col else [])
    wk = Window.partitionBy(*key_cols).orderBy(*order)
    t0 = F.col(time_col).cast("double")
    v0 = F.col(value_col).cast("double")
    segs = df.select(
        *key_cols,
        t0.alias("__t0"),
        v0.alias("__v0"),
        F.lead(t0).over(wk).alias("__t1"),
        F.lead(v0).over(wk).alias("__v1"),
    ).where(F.col("__t1") > F.col("__t0"))
    if max_carry == "auto":
        # p99 inter-sample gap from a hash-ordered capped sample —
        # layout-independent (hash of data columns, not row position),
        # floored at one bucket width so dense series are unaffected
        spans = (
            segs.select(
                (F.col("__t1") - F.col("__t0")).alias("__gap"),
                F.xxhash64(*[F.col(c) for c in key_cols], F.col("__t0")).alias(
                    "__h"
                ),
            )
            .orderBy("__h")
            .limit(tune_sample_rows)
            .drop("__h")
        )
        # exact percentile over the CAPPED sample (<= tune_sample_rows
        # values in one task — bounded): approxQuantile's rank error
        # can land on the very outlier gap the bound exists to clip
        p99 = spans.agg(
            F.expr("percentile(__gap, 0.99)").alias("__p")
        ).collect()[0]["__p"]
        max_carry = max(float(p99), float(w)) if p99 is not None else None
        if tuned is not None:
            tuned["max_carry"] = max_carry
    # truncate the WEIGHTED span, not the slope: linear interpolation
    # still runs along the original (t0,v0)->(t1,v1) chord
    t_end = (
        F.least(F.col("__t1"), F.col("__t0") + F.lit(float(max_carry)))
        if max_carry is not None
        else F.col("__t1")
    )
    i0 = F.floor(F.col("__t0") / w).cast("long")
    # last covered bucket: strictly-before t_end (a segment ending
    # exactly on a boundary does not touch the next bucket)
    i1 = (
        F.floor(t_end / w).cast("long")
        - F.when(t_end == F.floor(t_end / w) * w, F.lit(1)).otherwise(F.lit(0))
    )
    exploded = segs.select(
        *key_cols,
        "__t0",
        "__v0",
        "__t1",
        "__v1",
        t_end.alias("__te"),
        F.explode(F.sequence(i0, i1)).alias("__b"),
    )
    lo = F.greatest(F.col("__t0"), F.col("__b").cast("double") * w)
    hi = F.least(F.col("__te"), (F.col("__b") + 1).cast("double") * w)
    dt = hi - lo
    if method == "locf":
        contrib = F.col("__v0") * dt
    else:  # linear: integral of the chord over [lo, hi] = mean of its
        # endpoint values x overlap length (trapezoid)
        slope = (F.col("__v1") - F.col("__v0")) / (F.col("__t1") - F.col("__t0"))
        v_lo = F.col("__v0") + slope * (lo - F.col("__t0"))
        v_hi = F.col("__v0") + slope * (hi - F.col("__t0"))
        contrib = (v_lo + v_hi) / 2 * dt
    return (
        exploded.groupBy(*key_cols, (F.col("__b") * w).alias("bucket"))
        .agg(
            F.sum(contrib).alias("__num"),
            F.sum(dt).alias("__den"),
        )
        .select(
            *key_cols,
            "bucket",
            F.round(F.col("__num") / F.col("__den"), round_out).alias("twa"),
            F.round(F.col("__den"), round_out).alias("covered"),
        )
    )


_GAPFILL_AGGS = {
    "avg": F.avg,
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
    "count": lambda c: F.count(c),
}


def time_bucket_gapfill(
    df: DataFrame,
    time_col: str,
    bucket_width: int,
    key_cols: list[str],
    value_col: str,
    agg: str = "avg",
    fill: str = "locf",
) -> DataFrame:
    """Hypertable-style dense rollup (TimescaleDB's
    ``time_bucket_gapfill`` + ``locf``/``interpolate``): aggregate a
    series into fixed-width time buckets, then EMIT EVERY bucket in
    each key's [min, max] range — buckets with no data appear with a
    filled value instead of silently vanishing (a dashboard or
    downstream join that assumes dense time axes breaks on missing
    rows, and "no data" is itself signal).

    ``time_col`` is NUMERIC (epoch seconds or any monotone numeric
    axis — convert timestamps with a timezone-independent
    ``timestampdiff`` in a prior select; never a session-TZ cast) and
    ``bucket_width`` a positive integer in the same unit. ``fill``:

    - ``'null'``   — gap buckets carry NULL (bare dense axis);
    - ``'locf'``   — last observation carried forward (leading-edge
                     gaps stay NULL: nothing to carry);
    - ``'linear'`` — linear interpolation between the nearest
                     observed buckets on each side (edge gaps with
                     only one side stay NULL — interpolation never
                     extrapolates).

    Output: ``key_cols``, ``bucket`` (the bucket's start on the
    numeric axis), ``val`` (aggregated or filled, double), ``gap``
    (1 when the bucket had no data). Scale shape: the ONE corpus-scale
    shuffle is the bucket aggregation (map-side combined); the spine
    explode, the spine-data join, and the fill windows all run on the
    POST-aggregation relation, whose size is range/width buckets per
    key — and the per-key fill windows are the standard per-series
    sequential scan every gap-fill engine does (parallel across keys).
    A key whose range/width exceeds ~2^31 buckets overflows the spine
    array — split pathological ranges upstream; that many buckets is
    a misconfigured width, not a workload.
    """
    if bucket_width < 1:
        raise ValueError(
            f"time_bucket_gapfill: bucket_width must be a positive "
            f"integer, got {bucket_width}"
        )
    if agg not in _GAPFILL_AGGS:
        raise ValueError(
            f"time_bucket_gapfill: agg must be one of "
            f"{sorted(_GAPFILL_AGGS)}, got {agg!r}"
        )
    if fill not in ("null", "locf", "linear"):
        raise ValueError(
            "time_bucket_gapfill: fill must be 'null', 'locf' or "
            f"'linear', got {fill!r}"
        )
    if not key_cols:
        # an un-keyed call would make every fill window one global
        # partition — pass a constant key if the series is truly global
        raise ValueError(
            "time_bucket_gapfill: key_cols must be non-empty (use a "
            "constant column for a single global series)"
        )
    w = int(bucket_width)
    bucket = (F.floor(F.col(time_col) / w) * w).cast("long")
    # checkpointed: the bucket aggregation is the ONE corpus-scale
    # shuffle and it feeds BOTH the spine range-agg and the dense join
    # below — without it the full input scan+aggregate executes twice
    # per call. The relation itself is bucket-grain (range/width rows
    # per key — bounded), so the lazy RDD storage is trivial.
    aggd = (
        df.groupBy(*key_cols, bucket.alias("bucket"))
        .agg(_GAPFILL_AGGS[agg](F.col(value_col)).cast("double").alias("__v"))
    ).localCheckpoint(eager=False)
    # the per-key range relation is a few BYTES per key, so AQE's
    # byte-based coalescing collapses it to ONE partition — and the
    # row-EXPANDING explode below plus the fill windows then run in a
    # single task (measured 11.8 s serial for a ~0.5M-bucket spine at
    # sf0.1). Re-hash by key with an explicit partition count (AQE
    # never coalesces a fixed-n repartition) so each key's spine
    # explode and sequential fill scan runs in its own task — the
    # parallel-across-keys shape the docstring promises; hash(key)
    # partitioning also satisfies the dense join's and the windows'
    # clustering requirement, so no further exchange downstream.
    n_part = aggd.sparkSession.sparkContext.defaultParallelism
    spine = (
        aggd.groupBy(*key_cols)
        .agg(F.min("bucket").alias("__lo"), F.max("bucket").alias("__hi"))
        .repartition(n_part, *key_cols)
        .select(
            *key_cols,
            F.explode(
                F.sequence(F.col("__lo"), F.col("__hi"), F.lit(w))
            ).alias("bucket"),
        )
    )
    dense = spine.join(aggd, [*key_cols, "bucket"], "left")
    has = F.col("__v").isNotNull()
    if fill == "null":
        val = F.col("__v")
    elif fill == "locf":
        wb = (
            Window.partitionBy(*key_cols)
            .orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        val = F.last(F.when(has, F.col("__v")), ignorenulls=True).over(wb)
    else:  # linear
        wb = (
            Window.partitionBy(*key_cols)
            .orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        # "nearest observation AFTER current" as a RUNNING frame over
        # the REVERSED order: first(x) over [current, +inf) ascending
        # == last(x) over [-inf, current] descending. Identical values,
        # but Spark executes [unboundedPreceding, current] frames as an
        # O(n) accumulating scan while [current, unboundedFollowing]
        # frames re-aggregate the remaining rows PER ROW — O(n^2) per
        # key partition (measured: 12 s single-task vs 0.4 s for an
        # 8.6k-bucket-per-key spine at sf0.1).
        wf_ = (
            Window.partitionBy(*key_cols)
            .orderBy(F.col("bucket").desc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        # paired (bucket, value) of the nearest observation on each
        # side — the two columns stay consistent because both are
        # gated by the SAME has-condition on the SAME row
        pb = F.last(F.when(has, F.col("bucket")), ignorenulls=True).over(wb)
        pv = F.last(F.when(has, F.col("__v")), ignorenulls=True).over(wb)
        nb = F.last(F.when(has, F.col("bucket")), ignorenulls=True).over(wf_)
        nv = F.last(F.when(has, F.col("__v")), ignorenulls=True).over(wf_)
        # on gap rows pb < bucket < nb strictly, so nb - pb >= 2w > 0
        val = F.when(has, F.col("__v")).when(
            pb.isNotNull() & nb.isNotNull(),
            pv + (nv - pv) * (F.col("bucket") - pb) / (nb - pb),
        )
    return dense.select(
        *key_cols,
        "bucket",
        val.alias("val"),
        (~has).cast("int").alias("gap"),
    )


def lttb_downsample(
    df: DataFrame,
    n_out: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling per series — the
    standard visually-faithful reduction (Steinarsson 2013, the
    algorithm behind TimescaleDB's ``lttb`` and most dashboarding
    engines): keep the first and last points, split the middle into
    ``n_out - 2`` buckets, and from each bucket keep the point forming
    the largest triangle with the previously kept point and the NEXT
    bucket's centroid — preserving spikes and shape where uniform
    striding flattens them.

    Inherently sequential per series (each choice depends on the
    previous kept point), so this is a legitimate Arrow/pandas path:
    ``applyInPandas`` per key, numpy triangle areas per bucket, series
    parallel across the cluster. Each TASK holds one series
    (~16 bytes/point — pre-aggregate a series that can't fit, e.g.
    with :func:`time_bucket_gapfill`, before plotting-grade
    downsampling; that is the universal LTTB deployment shape).

    Ties (equal areas) break to the EARLIEST point; output rows are
    the ORIGINAL (key, ts, value) rows of the kept points. Series with
    <= ``n_out`` points pass through unchanged.
    """
    if n_out < 3:
        raise ValueError(f"lttb_downsample: n_out must be >= 3, got {n_out}")

    from pyspark.sql.types import StructType

    out_schema = StructType(
        [
            df.schema[key_col],
            df.schema[ts_col],
            df.schema[value_col],
        ]
    )
    n = int(n_out)

    def per_series(pdf):
        import numpy as np

        pdf = pdf.sort_values([ts_col]).reset_index(drop=True)
        m = len(pdf)
        if m <= n:
            return pdf[[key_col, ts_col, value_col]]
        t = pdf[ts_col].astype("float64").to_numpy()
        v = pdf[value_col].astype("float64").to_numpy()
        # bucket boundaries over the middle m-2 points, n-2 buckets
        edges = (np.arange(n - 1) * (m - 2) / (n - 2)).astype(np.int64) + 1
        edges = np.append(edges, m - 1)
        keep = [0]
        prev = 0
        for b in range(n - 2):
            lo, hi = edges[b], edges[b + 1]  # this bucket: [lo, hi)
            # next bucket's centroid; after the last middle bucket the
            # "next bucket" is the always-kept final point
            if b == n - 3:
                cx, cy = t[m - 1], v[m - 1]
            else:
                nlo, nhi = edges[b + 1], edges[b + 2]
                cx, cy = t[nlo:nhi].mean(), v[nlo:nhi].mean()
            ax, ay = t[prev], v[prev]
            area = np.abs(
                (ax - cx) * (v[lo:hi] - ay) - (ax - t[lo:hi]) * (cy - ay)
            )
            prev = lo + int(np.argmax(area))
            keep.append(prev)
        keep.append(m - 1)
        return pdf.iloc[keep][[key_col, ts_col, value_col]]

    return (
        df.select(key_col, ts_col, value_col)
        .groupBy(key_col)
        .applyInPandas(per_series, out_schema)
    )
