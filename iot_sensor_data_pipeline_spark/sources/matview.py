"""Incrementally-maintained aggregate materialized views, fed by the
mutation change feed — the consumer that makes the feed pay for itself.

Why this exists: at 100 TB the question "sum/avg/min/max of X per
group, right now" cannot be answered by re-scanning the corpus on
every dashboard tick, and the classic answer — a scheduled full
``GROUP BY`` rebuild — re-reads everything to reflect a mutation that
touched a handful of rows. This module maintains the aggregate
INCREMENTALLY from the table's change data feed
(``mutations.read_change_feed``): each refresh reads ONLY the new feed
versions (row images of what actually changed), folds signed deltas
into the stored per-group moments, and commits a new MV version. Cost
per refresh is O(changed rows + MV size), independent of the base
table — the incremental view maintenance ("counting algorithm")
literature's self-maintainable-aggregate case, expressed as two
key-grain DataFrame joins.

Design (Spark-first):

- **stored partials, derived finals.** The MV stores the five
  associative moments per group — ``n_rows`` (count(*)), ``n_v``
  (count of non-NULL values), ``sum_v``, ``sumsq_v``, ``min_v``,
  ``max_v`` — the same mergeable algebra as
  ``operators.sketches.partial_aggregates``, so ``read_agg_view`` can
  also answer any COARSER grouping of the MV keys by re-merging
  partial rows (no base-table access). avg/stddev derive at read time;
  deriving them per partial and averaging would weight groups, not
  rows.
- **sum/count are self-maintainable; min/max are not.** Inserted
  images add to the moments, deleted images subtract (an update is a
  delete of the pre-image plus an insert of the post-image, so a
  key-moving UPDATE transfers its row between groups for free). min and
  max only REFINE under inserts; a removal that may have removed the
  current extreme makes the group DIRTY, and dirty groups alone are
  recomputed exactly from the base table via a broadcast semi-join on
  their keys — the textbook affected-group recompute, sublinear because
  deletes touching a group extreme are the rare case and the semi-join
  scan prunes through the same predicate/partition machinery every
  other read uses. The dirty test is conservative-exact: a group is
  dirty iff it saw any removal and either has no stored extreme yet or
  the removed range touches the candidate extreme
  (``rm_min <= least(min_v, ins_min)`` / ``rm_max >= greatest(...)``)
  — equal values count as touching, so removing one of two copies of
  the minimum recomputes rather than guesses.
- **the recompute also heals float drift.** Incremental add/subtract
  on doubles accumulates rounding error that a full rebuild would not;
  every dirty-group recompute replaces ALL of the group's moments with
  exact values, so the drift horizon is bounded by mutation locality,
  and a deliberate ``refresh_agg_view(..., recompute_all=True)``
  rebuilds every group's moments while keeping the cursor discipline.
- **cursor and data commit in one rename.** The feed cursor
  (``feed_version``) lives in ``_meta.json`` INSIDE the committed MV
  version directory (``manifest._commit_version_in(meta=...)``), so a
  crash anywhere leaves either the old (version, cursor) pair or the
  new one — never a cursor that disagrees with the rows next to it.
  Replaying a refresh after a crash re-reads the same feed versions
  against the same MV version and produces the same result.
- **gaps fail loudly.** A cursor whose successor feed version was
  expired (``expire_change_feed``) raises through
  ``read_change_feed``'s continuity guard — re-create the view instead
  of silently desynchronizing. The dirty-group recompute additionally
  cross-checks its exact ``count(*)`` against the incrementally-merged
  count and raises on disagreement (a mutation that ran without
  ``change_feed=True`` is the usual culprit; the MV contract is that
  EVERY mutation on the source carries the feed).

The reference pipeline has no materialized-view story (its aggregates
are recomputed per window by the streaming job,
``/root/reference/spark_processing/data_agregator.py:74-95``); this is
the batch/lakehouse counterpart built on public IVM designs.

Single-maintenance-writer assumption, same as OPTIMIZE and mutations:
one ``create_agg_view``/``refresh_agg_view`` at a time per MV, and no
concurrent mutation on the source while a create/refresh runs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from iot_sensor_data_pipeline_spark.sources.manifest import (
    _commit_version_in,
    _fs_for,
    _read_json_file,
    _versions_in,
)
from iot_sensor_data_pipeline_spark.sources.mutations import (
    _OP,
    _layout,
    _read_files,
    _read_schema_for,
    change_feed_versions,
    read_change_feed,
)

__all__ = [
    "create_agg_view",
    "refresh_agg_view",
    "read_agg_view",
    "read_agg_partials",
]

#: MV partial columns, in storage order after the keys. Key names
#: colliding with these are rejected at create time.
_MOMENTS = ("n_rows", "n_v", "sum_v", "sumsq_v", "min_v", "max_v")


def _read_base(spark: SparkSession, path: str) -> DataFrame:
    """The source table under the mutation module's read rules (union
    schema over files, partition columns as verbatim strings) — the MV
    must aggregate exactly the relation the mutations mutate, or the
    feed's row images would not reconcile with the scan."""
    part_cols, files_canon, _rel_of = _layout(spark, path)
    _data, read_schema = _read_schema_for(
        spark, path, files_canon, part_cols
    )
    return _read_files(spark, path, files_canon, read_schema)


def _moment_aggs(value_col: str) -> list:
    v = F.col(value_col).cast("double")
    return [
        F.count(F.lit(1)).alias("n_rows"),
        F.count(v).alias("n_v"),
        F.coalesce(F.sum(v), F.lit(0.0)).alias("sum_v"),
        F.coalesce(F.sum(v * v), F.lit(0.0)).alias("sumsq_v"),
        F.min(v).alias("min_v"),
        F.max(v).alias("max_v"),
    ]


def _mv_meta(spark: SparkSession, mv_path: str) -> tuple[int, dict]:
    """(newest committed version, its _meta.json) — raises when the MV
    does not exist or a version lacks its sidecar (not an MV dir)."""
    versions = _versions_in(spark, mv_path)
    if not versions:
        raise ValueError(
            f"no materialized view under {mv_path} — create_agg_view first"
        )
    fs, _root, jvm = _fs_for(spark, mv_path)
    p = jvm.org.apache.hadoop.fs.Path(
        f"{mv_path}/v{versions[-1]}/_meta.json"
    )
    if not fs.exists(p):
        raise ValueError(
            f"{mv_path}/v{versions[-1]} has no _meta.json — not a "
            "materialized-view directory"
        )
    return versions[-1], _read_json_file(fs, jvm, p)


def _nullsafe_cond(left, right, keys: Sequence[str]):
    cond = None
    for k in keys:
        c = left[k].eqNullSafe(right[k])
        cond = c if cond is None else (cond & c)
    return cond


def read_agg_partials(spark: SparkSession, mv_path: str) -> DataFrame:
    """The stored per-group moment rows of the newest MV version, read
    under the meta sidecar's explicit schema (an MV whose every group
    died commits a zero-row version — Spark cannot infer a schema from
    an empty directory, the sidecar can)."""
    v, meta = _mv_meta(spark, mv_path)
    schema = StructType.fromJson(meta["schema"])
    return spark.read.schema(schema).parquet(f"{mv_path}/v{v}")


def create_agg_view(
    spark: SparkSession,
    src_path: str,
    mv_path: str,
    keys: Sequence[str],
    value_col: str,
    keep_versions: int = 2,
    single_file: bool = True,
) -> dict:
    """Full build: one ``GROUP BY`` scan of the source table, committed
    as MV ``v1`` with the feed cursor taken BEFORE the scan (a feed
    version committed mid-scan is partially visible to the scan; taking
    the cursor first means refresh re-applies it, and re-applying to
    the groups it touched is healed by the dirty recompute — under the
    documented single-writer discipline the case never arises).

    ``single_file=False`` for key spaces too large for one driver-read
    file (a per-user MV); the aggregate write then stays distributed.

    Returns ``{"status", "n_groups", "feed_version"}``."""
    keys = list(keys)
    if not keys:
        raise ValueError("create_agg_view: need at least one key column")
    bad = [k for k in keys if k in _MOMENTS]
    if bad:
        raise ValueError(
            f"create_agg_view: key columns {bad} collide with the MV's "
            f"reserved moment columns {_MOMENTS} — alias them first"
        )
    if value_col in keys:
        raise ValueError(
            f"create_agg_view: value_col {value_col!r} is also a key"
        )
    if _versions_in(spark, mv_path):
        raise ValueError(
            f"materialized view already exists under {mv_path} — "
            "refresh_agg_view maintains it; delete the directory to "
            "rebuild from scratch"
        )
    feed = change_feed_versions(spark, src_path)
    cursor = feed[-1] if feed else 0
    base = _read_base(spark, src_path)
    missing = [c for c in [*keys, value_col] if c not in base.columns]
    if missing:
        raise ValueError(
            f"create_agg_view: source table lacks columns {missing}"
        )
    partials = base.groupBy(*keys).agg(*_moment_aggs(value_col))
    _commit_version_in(
        spark, mv_path, partials,
        keep_versions=keep_versions, single_file=single_file,
        meta={
            "keys": keys,
            "value_col": value_col,
            "feed_version": cursor,
            "schema": partials.schema.jsonValue(),
        },
    )
    # count from the committed MV (group-grain), not a second base scan
    n_groups = read_agg_partials(spark, mv_path).count()
    return {"status": "created", "n_groups": n_groups,
            "feed_version": cursor}


def refresh_agg_view(
    spark: SparkSession,
    src_path: str,
    mv_path: str,
    keep_versions: int = 2,
    single_file: bool = True,
    recompute_all: bool = False,
) -> dict:
    """Fold the source's unapplied change-feed versions into the MV and
    commit the result as the next MV version (cursor rides the same
    rename — see module docstring). No new feed versions -> no-op, no
    version minted.

    Returns ``{"status", "applied_versions", "n_groups",
    "n_dirty_recomputed", "feed_version"}``."""
    _v, meta = _mv_meta(spark, mv_path)
    keys: list[str] = list(meta["keys"])
    value_col: str = meta["value_col"]
    cursor: int = int(meta["feed_version"])
    all_versions = change_feed_versions(spark, src_path)
    # continuity first, even when there is nothing new: a cursor below
    # the oldest retained version minus one means the MV slept through
    # an expiry that removed versions it never saw
    if all_versions and cursor + 1 < all_versions[0] and cursor < all_versions[-1]:
        raise ValueError(
            f"change feed gap: the MV's cursor is {cursor} but the "
            f"oldest retained feed version is {all_versions[0]} "
            "(expire_change_feed ran past it) — re-create the view"
        )
    new_versions = [v for v in all_versions if v > cursor]
    if not new_versions:
        return {"status": "noop", "applied_versions": [],
                "n_groups": None, "n_dirty_recomputed": 0,
                "feed_version": cursor}
    feed = read_change_feed(spark, src_path, since_version=cursor)

    v = F.col(value_col).cast("double")
    sign = F.when(
        F.col(_OP).isin("insert", "update_post"), F.lit(1)
    ).otherwise(F.lit(-1))
    # signed delta moments per group. sum() skips NULL terms, so the
    # value-dependent deltas self-restrict to non-NULL images; the
    # row-count delta must not (a NULL-valued row still counts).
    delta = feed.groupBy(*keys).agg(
        F.sum(sign).alias("d_n_rows"),
        F.coalesce(
            F.sum(F.when(v.isNotNull(), sign)), F.lit(0)
        ).alias("d_n_v"),
        F.coalesce(F.sum(sign * v), F.lit(0.0)).alias("d_sum_v"),
        F.coalesce(F.sum(sign * v * v), F.lit(0.0)).alias("d_sumsq_v"),
        F.min(F.when(sign > 0, v)).alias("ins_min"),
        F.max(F.when(sign > 0, v)).alias("ins_max"),
        F.min(F.when(sign < 0, v)).alias("rm_min"),
        F.max(F.when(sign < 0, v)).alias("rm_max"),
    )

    mv = read_agg_partials(spark, mv_path).alias("m")
    d = delta.alias("d")
    # full outer: groups only in the MV pass through, groups only in
    # the delta are born, shared groups merge. eqNullSafe because a
    # NULL key value is a legitimate group.
    j = mv.join(d, _nullsafe_cond(mv, d, keys), "full_outer")

    n_rows_new = F.coalesce(mv["n_rows"], F.lit(0)) + F.coalesce(
        d["d_n_rows"], F.lit(0)
    )
    n_v_new = F.coalesce(mv["n_v"], F.lit(0)) + F.coalesce(
        d["d_n_v"], F.lit(0)
    )
    # a negative merged count means the feed and the MV disagree about
    # history (double-applied feed, hand-edited MV, or a mutation that
    # ran without change_feed=True) — fail the refresh, loudly, inside
    # the projection (raise_error under when, the apply_cdc/AUC
    # discipline — no extra validation job)
    n_rows_guarded = F.when(
        (n_rows_new >= 0) & (n_v_new >= 0), n_rows_new
    ).otherwise(
        F.raise_error(F.concat(
            F.lit("refresh_agg_view: negative merged count for group ("),
            F.concat_ws(
                ", ",
                *[F.coalesce(F.coalesce(mv[k], d[k]).cast("string"),
                             F.lit("NULL")) for k in keys],
            ),
            F.lit(") — the change feed and the MV are out of sync; "
                  "re-create the view"),
        ))
    )
    cand_min = F.least(mv["min_v"], d["ins_min"])
    cand_max = F.greatest(mv["max_v"], d["ins_max"])
    alive = n_rows_new > 0
    has_values = n_v_new > 0
    dirty = (
        F.lit(recompute_all)
        | (
            d["rm_min"].isNotNull()
            & has_values
            & (
                mv["min_v"].isNull()
                | (d["rm_min"] <= cand_min)
                | (d["rm_max"] >= cand_max)
            )
        )
    )
    # canonical storage: a group alive with zero non-NULL values holds
    # EXACT zero sums (incremental subtraction would leave float
    # epsilon) and NULL extremes
    merged = j.select(
        *[F.coalesce(mv[k], d[k]).alias(k) for k in keys],
        n_rows_guarded.alias("n_rows"),
        n_v_new.alias("n_v"),
        F.when(
            has_values,
            F.coalesce(mv["sum_v"], F.lit(0.0))
            + F.coalesce(d["d_sum_v"], F.lit(0.0)),
        ).otherwise(F.lit(0.0)).alias("sum_v"),
        F.when(
            has_values,
            F.coalesce(mv["sumsq_v"], F.lit(0.0))
            + F.coalesce(d["d_sumsq_v"], F.lit(0.0)),
        ).otherwise(F.lit(0.0)).alias("sumsq_v"),
        F.when(has_values, cand_min).alias("min_v"),
        F.when(has_values, cand_max).alias("max_v"),
        (dirty & alive).alias("__dirty"),
    ).where(alive).persist()
    try:
        schema = StructType.fromJson(meta["schema"])
        cols = schema.fieldNames()
        n_dirty = merged.where(F.col("__dirty")).count()
        if n_dirty:
            dirty_keys = merged.where(F.col("__dirty")).select(*keys)
            base = _read_base(spark, src_path)
            dk = F.broadcast(dirty_keys).alias("k")
            b = base.alias("b")
            exact = (
                b.join(dk, _nullsafe_cond(b, dk, keys), "left_semi")
                .groupBy(*keys)
                .agg(*_moment_aggs(value_col))
            ).alias("x")
            dm = merged.where(F.col("__dirty")).alias("dm")
            # exact recount must agree with the incrementally-merged
            # count — disagreement means a mutation skipped the feed
            # (NULL exact count = alive dirty group with no base rows,
            # the same desync)
            recount = F.when(
                dm["n_rows"] == exact["n_rows"], exact["n_rows"]
            ).otherwise(
                F.raise_error(F.lit(
                    "refresh_agg_view: dirty-group recount disagrees "
                    "with the change feed (a mutation ran without "
                    "change_feed=True?) — re-create the view"
                ))
            )
            recomputed = (
                dm.join(exact, _nullsafe_cond(dm, exact, keys), "left")
                .select(
                    *[dm[k].alias(k) for k in keys],
                    recount.alias("n_rows"),
                    exact["n_v"].alias("n_v"),
                    exact["sum_v"].alias("sum_v"),
                    exact["sumsq_v"].alias("sumsq_v"),
                    exact["min_v"].alias("min_v"),
                    exact["max_v"].alias("max_v"),
                )
            )
            out = (
                merged.where(~F.col("__dirty")).select(*cols)
                .unionByName(recomputed.select(*cols))
            )
        else:
            out = merged.select(*cols)
        out = out.select(
            *[F.col(c).cast(schema[c].dataType) for c in cols]
        ).persist()
        try:
            n_groups = out.count()
            _commit_version_in(
                spark, mv_path, out,
                keep_versions=keep_versions, single_file=single_file,
                meta={**meta, "feed_version": new_versions[-1]},
            )
        finally:
            out.unpersist()
    finally:
        merged.unpersist()
    return {
        "status": "refreshed",
        "applied_versions": new_versions,
        "n_groups": n_groups,
        "n_dirty_recomputed": n_dirty,
        "feed_version": new_versions[-1],
    }


def read_agg_view(
    spark: SparkSession,
    mv_path: str,
    group_keys: Sequence[str] | None = None,
) -> DataFrame:
    """Final aggregates from the stored moments — at the MV's own grain
    (default) or any COARSER ``group_keys`` subset, answered by merging
    partial rows (``operators.sketches.merge_aggregates`` discipline:
    exact n/sum/min/max, avg and population stddev derived from merged
    moments, NULL when the group has no non-NULL values). Never touches
    the base table."""
    partials = read_agg_partials(spark, mv_path)
    if group_keys is None:
        merged = partials
        out_keys = [
            c for c in partials.columns if c not in _MOMENTS
        ]
    else:
        out_keys = list(group_keys)
        missing = [k for k in out_keys if k not in partials.columns]
        if missing:
            raise ValueError(
                f"read_agg_view: {missing} are not MV key columns "
                f"({[c for c in partials.columns if c not in _MOMENTS]})"
            )
        merged = partials.groupBy(*out_keys).agg(
            F.sum("n_rows").alias("n_rows"),
            F.sum("n_v").alias("n_v"),
            F.sum("sum_v").alias("sum_v"),
            F.sum("sumsq_v").alias("sumsq_v"),
            F.min("min_v").alias("min_v"),
            F.max("max_v").alias("max_v"),
        )
    mean = F.try_divide(F.col("sum_v"), F.col("n_v"))
    # clamp: float cancellation can push E[x^2]-E[x]^2 a hair negative
    var = F.greatest(
        F.try_divide(F.col("sumsq_v"), F.col("n_v")) - mean * mean,
        F.lit(0.0),
    )
    has = F.col("n_v") > 0
    return merged.select(
        *out_keys,
        "n_rows",
        "n_v",
        F.when(has, F.col("sum_v")).alias("sum_v"),
        "min_v",
        "max_v",
        F.when(has, mean).alias("avg_v"),
        F.when(has, F.sqrt(var)).alias("stddev_pop_v"),
    )
