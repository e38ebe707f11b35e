"""MERGE / upsert / SCD2 emulation on plain parquet tables.

Without a transactional table format (Delta/Iceberg jars are not in
this environment), MERGE INTO is emulated with the standard anti-join
+ union + window idiom — the same logical result, full-rewrite
physical cost (documented; with Delta these operators map 1:1 onto
``MERGE INTO``).

Scale notes: both operators are one shuffle on the key columns. For
partitioned tables, restrict the rewrite to the partitions the updates
touch (dynamic partition overwrite) — the helper accepts a pre-filtered
``current`` for exactly that reason.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def upsert_snapshot(
    current: DataFrame, updates: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Last-writer-wins upsert: rows of ``updates`` replace same-key
    rows of ``current``; new keys append. (MERGE WHEN MATCHED UPDATE /
    WHEN NOT MATCHED INSERT.)"""
    keys = list(keys)
    survivors = current.join(updates.select(*keys).distinct(), keys, "left_anti")
    return survivors.unionByName(updates)


def scd2_apply(
    history: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    end_col: str = "valid_to",
    start_col: str = "valid_from",
    current_flag: str = "is_current",
) -> DataFrame:
    """Slowly-changing-dimension type 2: close out current rows whose
    key appears in ``updates`` (valid_to = update ts) and append the
    new versions as current.

    ``history`` schema: business columns + valid_from/valid_to/
    is_current. ``updates``: business columns + ts_col (event time of
    the change). Multiple updates per key in one batch are sequenced by
    ts (each closes the previous).
    """
    keys = list(keys)

    # sequence updates per key: each row's valid_to is the next row's ts
    w = Window.partitionBy(*keys).orderBy(ts_col)
    seq = (
        updates.withColumn(start_col, F.col(ts_col))
        .withColumn(end_col, F.lead(ts_col).over(w))
        .withColumn(current_flag, F.col(end_col).isNull())
        .drop(ts_col)
    )
    first_update = updates.groupBy(*keys).agg(F.min(ts_col).alias("__first_ts"))

    touched = history.join(first_update, keys, "inner")
    untouched = history.join(first_update, keys, "left_anti")

    closed = (
        touched.withColumn(
            end_col,
            F.when(F.col(current_flag), F.col("__first_ts")).otherwise(F.col(end_col)),
        )
        .withColumn(current_flag, F.lit(False))
        .drop("__first_ts")
    )
    return untouched.unionByName(closed).unionByName(seq)
