"""Set operations (absent from the reference, SURVEY.md §2.4 gap list).

Thin, explicit wrappers over Spark's built-ins documenting the
bag-vs-set semantics choice each call makes. ``intersect_all`` /
``except_all`` preserve duplicates (ANSI INTERSECT ALL / EXCEPT ALL);
the plain variants deduplicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def union_all(*dfs: DataFrame) -> DataFrame:
    """UNION ALL by column NAME (order-independent, safer than union())."""
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df)
    return out


def union_distinct(*dfs: DataFrame) -> DataFrame:
    return union_all(*dfs).distinct()


def intersect(a: DataFrame, b: DataFrame, keep_duplicates: bool = False) -> DataFrame:
    return a.intersectAll(b) if keep_duplicates else a.intersect(b)


def difference(a: DataFrame, b: DataFrame, keep_duplicates: bool = False) -> DataFrame:
    return a.exceptAll(b) if keep_duplicates else a.subtract(b)
