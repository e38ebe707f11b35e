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
