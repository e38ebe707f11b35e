"""Event-time windowed aggregation.

Re-expresses the reference aggregator job (reference
data_agregator.py:74-95: watermark 1 min -> tumbling 4-min window ->
groupBy(window, sensor_id, sensor_type) -> avg/min/max/count) as a
general, reusable operator that works identically on a batch DataFrame
and a Structured Streaming DataFrame (Spark's unified API makes the
same code valid for both; the watermark is a no-op in batch).

Scale notes:
- the groupBy shuffles on (window, *keys); at 100 TB the window column
  has bounded cardinality per key so partial (map-side) aggregation
  collapses most rows before the shuffle — this is the plan Catalyst
  produces for HashAggregate, nothing manual needed.
- in streaming, state per open window is bounded by the watermark
  (A1/A7 in SURVEY.md §2.4); RocksDB state store (session.py) keeps
  large key spaces off-heap.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: default aggregate set = the reference's avg/min/max/count
#: (reference data_agregator.py:81-84)
DEFAULT_AGGS = ("avg", "min", "max", "count")


def windowed_agg(
    df: DataFrame,
    ts_col: str,
    keys: Sequence[str],
    value_col: str,
    window_duration: str,
    slide_duration: str | None = None,
    watermark: str | None = None,
    aggs: Sequence[str] = DEFAULT_AGGS,
    round_avg: int | None = None,
) -> DataFrame:
    """Tumbling (or sliding, if ``slide_duration``) event-time window agg.

    Output columns: window_start, window_end, *keys, then one column per
    agg named ``{agg}_value`` (count is named ``n``) — stable names so
    downstream sinks and the correctness oracle can align columns.
    """
    if watermark is not None and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)

    window_col = (
        F.window(F.col(ts_col), window_duration, slide_duration)
        if slide_duration
        else F.window(F.col(ts_col), window_duration)
    )

    agg_exprs: list[Column] = []
    for agg in aggs:
        if agg == "count":
            agg_exprs.append(F.count(F.lit(1)).alias("n"))
        elif agg == "avg" and round_avg is not None:
            agg_exprs.append(F.round(F.avg(value_col), round_avg).alias("avg_value"))
        else:
            agg_exprs.append(getattr(F, agg)(value_col).alias(f"{agg}_value"))

    out_aggs = ["n" if a == "count" else f"{a}_value" for a in aggs]
    return (
        df.groupBy(window_col.alias("w"), *keys)
        .agg(*agg_exprs)
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *keys,
            *out_aggs,
        )
    )
