"""Batch sinks: partitioned parquet (data-lake layout) and console.

The reference's only batch outputs are JDBC appends; a general engine
also needs columnar table output. ``parquet_sink`` writes
date/hour-partitioned parquet — the layout that makes downstream
partition pruning work (queries on a time range touch only those
directories).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_partitioned_parquet(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str] = (),
    mode: str = "append",
    max_records_per_file: int | None = 1_000_000,
) -> None:
    """Partitioned parquet write. ``max_records_per_file`` bounds file
    size so one skewed partition value doesn't produce a 100 GB file."""
    writer = df.write.mode(mode)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)


def with_date_partitions(df: DataFrame, ts_col: str) -> DataFrame:
    """Add dt/hour partition columns derived from event time — the
    standard lake layout for time-series tables."""
    return df.withColumn("dt", F.to_date(ts_col)).withColumn("hour", F.hour(ts_col))


def parquet_batch_sink(path: str, partition_cols: Sequence[str] = ()):
    """foreachBatch-compatible sink: append each micro-batch to a
    partitioned parquet table."""

    def sink(batch_df: DataFrame) -> None:
        write_partitioned_parquet(batch_df, path, partition_cols)

    return sink
