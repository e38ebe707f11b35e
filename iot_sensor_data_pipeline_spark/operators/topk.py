"""Sort / limit / top-k operators (absent from the reference,
SURVEY.md §2.4 gap list).

Scale notes:
- global top-k via ``orderBy().limit(k)`` compiles to TakeOrderedAndProject:
  each partition keeps only its local top-k, the driver merges k*P rows —
  no global sort, no full shuffle. This is THE way to do top-k at 100 TB.
- per-group top-k uses a rank window; Spark inserts a WindowGroupLimit
  (since 3.5) so partitions prune to k rows per group before the final
  window — check .explain for it when k is small.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k(df: DataFrame, order_by: Sequence[Column], k: int) -> DataFrame:
    """Global top-k -> TakeOrderedAndProject (no global sort)."""
    return df.orderBy(*order_by).limit(k)


def top_k_per_group(
    df: DataFrame,
    group_by: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rn",
    method: str = "row_number",
) -> DataFrame:
    """Top-k rows per group via a rank window function.

    ``method``: row_number (exactly k), rank / dense_rank (ties kept).
    """
    w = Window.partitionBy(*group_by).orderBy(*order_by)
    rank_fn = getattr(F, method)
    return df.withColumn(rank_col, rank_fn().over(w)).where(F.col(rank_col) <= k)
