"""File-level data skipping over plain parquet: a min/max manifest and
a pruned reader — the lakehouse trick (Delta/Iceberg manifests, Parquet
footer statistics) without a table format.

The 100 TB problem: a selective predicate over an UN-partitioned (or
wrong-partitioned) column still opens every file. Parquet footers
already carry per-row-group min/max/null-count for every column; a
manifest materializes them as a tiny relation so the DRIVER can drop
whole files before the scan starts — complementary to partition
pruning (directory level) and row-group/predicate pushdown (inside an
already-opened file, footer round-trip per file per query). Pair with
``operators/layout.py`` z-ordering: clustering narrows per-file ranges,
which is exactly what makes these stats selective.

Scale posture:

- **Footer reads are distributed.** ``footer_stats`` ships the file
  LIST (not the data) to executors; each task reads only parquet
  footers (KBs per file) via pyarrow and emits one row per
  (file, column). A million-file table is a million-row manifest —
  trivially a DataFrame, never a driver loop over footers.
- **Pruning is conservative.** A file is kept unless its stats PROVE
  no row can match: interval-overlap test per column, missing stats or
  files absent from a stale manifest are kept, and ``read_pruned``
  re-applies the exact predicate — output equals the full scan's,
  only the opened-file set shrinks.
- The manifest lives at ``<path>/_manifest``: underscore-prefixed
  paths are invisible to Spark/Hadoop parquet listings, so the data
  directory stays readable as before.

Scope: flat parquet directories (hive-partitioned layouts get
directory-level pruning from Spark itself; explicit file lists would
drop the inferred partition columns). Numeric, string, and timestamp
columns (timestamps compare in epoch-seconds domain).
"""

from __future__ import annotations

import datetime as _dt
from collections.abc import Iterator, Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "footer_stats",
    "write_manifest",
    "update_manifest",
    "read_manifest",
    "prune_files",
    "read_pruned",
    "plan_compaction",
    "compact_files",
    "compact_clustered",
]

MANIFEST_DIR = "_manifest"

_STATS_SCHEMA = (
    "file string, col string, n_rows long, null_count long, "
    "has_stats boolean, min_num double, max_num double, "
    "min_str string, max_str string"
)


def _list_parquet_files(spark: SparkSession, path: str) -> list[str]:
    """Non-hidden *.parquet files directly under ``path`` (Hadoop FS,
    so any supported filesystem scheme works)."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        raise ValueError(f"no parquet files under {path}")
    out = []
    for st in fs.listStatus(jpath):
        name = st.getPath().getName()
        if st.isFile() and name.endswith(".parquet") and not name.startswith(("_", ".")):
            out.append(st.getPath().toString())
    return sorted(out)


def _to_num(v) -> float | None:
    """Project a stats value onto the numeric comparison domain."""
    if isinstance(v, bool):
        return float(v)
    if isinstance(v, (int, float)):
        return float(v)
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=v.tzinfo or _dt.timezone.utc).timestamp()
    if isinstance(v, _dt.date):
        return _dt.datetime(v.year, v.month, v.day, tzinfo=_dt.timezone.utc).timestamp()
    return None


def footer_stats(
    spark: SparkSession, path: str, cols: Sequence[str]
) -> DataFrame:
    """Per-(file, column) min/max/null-count from parquet FOOTERS.

    One row per file per requested column; ``has_stats=False`` (and
    null min/max) when the writer emitted no statistics — consumers
    must treat such files as match-possible."""
    cols = list(cols)
    if not cols:
        raise ValueError("cols must name at least one column")
    files = _list_parquet_files(spark, path)
    if not files:
        raise ValueError(f"no parquet files under {path}")
    fdf = spark.createDataFrame([(f,) for f in files], "file string")
    return _footer_stats_for(fdf, cols, len(files))


def _footer_stats_for(fdf: DataFrame, cols: Sequence[str], n_files: int) -> DataFrame:
    fdf = fdf.repartition(min(n_files, 64))
    want = list(cols)

    def read_footers(batches: Iterator) -> Iterator:
        import pandas as pd
        import pyarrow.parquet as pq

        for pdf in batches:
            rows = []
            for f in pdf["file"]:
                local = f[len("file:"):] if f.startswith("file:") else f
                md = pq.ParquetFile(local).metadata
                names = {md.schema.column(i).name: i for i in range(md.num_columns)}
                for c in want:
                    idx = names.get(c)
                    if idx is None:
                        rows.append((f, c, md.num_rows, None, False,
                                     None, None, None, None))
                        continue
                    mins, maxs, nulls, ok = [], [], 0, True
                    for rg in range(md.num_row_groups):
                        st = md.row_group(rg).column(idx).statistics
                        if st is None or not st.has_min_max:
                            ok = False
                            break
                        mins.append(st.min)
                        maxs.append(st.max)
                        nulls += st.null_count or 0
                    if not ok or not mins:
                        rows.append((f, c, md.num_rows, None, False,
                                     None, None, None, None))
                        continue
                    lo, hi = min(mins), max(maxs)
                    lo_n, hi_n = _to_num(lo), _to_num(hi)
                    lo_s = lo if isinstance(lo, str) else None
                    hi_s = hi if isinstance(hi, str) else None
                    rows.append((f, c, md.num_rows, nulls, True,
                                 lo_n, hi_n, lo_s, hi_s))
            yield pd.DataFrame(
                rows,
                columns=["file", "col", "n_rows", "null_count", "has_stats",
                         "min_num", "max_num", "min_str", "max_str"],
            )

    return fdf.mapInPandas(read_footers, _STATS_SCHEMA)


def write_manifest(
    spark: SparkSession, path: str, cols: Sequence[str]
) -> DataFrame:
    """Materialize ``footer_stats`` at ``<path>/_manifest`` (overwrite).

    The manifest is tiny (one row per file per column); a single output
    file keeps the later driver-side read cheap."""
    stats = footer_stats(spark, path, cols)
    stats.coalesce(1).write.mode("overwrite").parquet(f"{path}/{MANIFEST_DIR}")
    return stats


def read_manifest(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(f"{path}/{MANIFEST_DIR}")


def update_manifest(
    spark: SparkSession, path: str, cols: Sequence[str]
) -> DataFrame:
    """Incrementally extend the manifest: footer-read ONLY files not
    yet listed, keep existing rows for files still present, drop rows
    for deleted files. At 100 TB an append-heavy table re-reads a few
    new footers per batch, never the historical million.

    Falls back to a full :func:`write_manifest` when no manifest
    exists yet or the column set changed."""
    cols = list(cols)
    files = set(_list_parquet_files(spark, path))
    try:
        existing = read_manifest(spark, path)
        existing_rows = existing.collect()
    except Exception:
        return write_manifest(spark, path, cols)
    have_cols = {r.col for r in existing_rows}
    if have_cols != set(cols):
        return write_manifest(spark, path, cols)
    kept = [r for r in existing_rows if r.file in files]
    known = {r.file for r in kept}
    new_files = sorted(files - known)
    merged = spark.createDataFrame(kept, _STATS_SCHEMA) if kept else None
    if new_files:
        fdf = spark.createDataFrame([(f,) for f in new_files], "file string")
        fresh = _footer_stats_for(fdf, cols, len(new_files))
        merged = fresh if merged is None else merged.unionByName(fresh)
    if merged is None:
        raise ValueError(f"no parquet files under {path}")
    # materialize on the driver before overwriting: kept rows came FROM
    # the manifest being replaced (tiny relation; one row per file-col)
    rows = merged.collect()
    final = spark.createDataFrame(rows, _STATS_SCHEMA)
    final.coalesce(1).write.mode("overwrite").parquet(f"{path}/{MANIFEST_DIR}")
    return final


def _normalize_bound(v):
    if isinstance(v, str):
        return v, "str"
    n = _to_num(v)
    if n is None:
        raise ValueError(f"unsupported predicate bound type: {type(v).__name__}")
    return n, "num"


def prune_files(
    spark: SparkSession,
    path: str,
    predicates: Mapping[str, tuple],
) -> tuple[list[str], int]:
    """(files that may contain matches, total file count).

    ``predicates`` maps column -> (lo, hi) inclusive bounds (either may
    be None for one-sided ranges). A file survives unless some column's
    stats prove emptiness: max < lo or min > hi. Range predicates never
    match NULL, so all-null columns only prune when stats exist and the
    file has no non-null values in range. Files missing from the
    manifest (stale manifest after new writes) are conservatively
    kept."""
    if not predicates:
        raise ValueError("predicates must not be empty")
    all_files = _list_parquet_files(spark, path)
    stats = read_manifest(spark, path).collect()
    by_file: dict[str, dict[str, dict]] = {}
    for r in stats:
        by_file.setdefault(r.file, {})[r.col] = r.asDict()
    kept = []
    for f in all_files:
        fstats = by_file.get(f)
        if fstats is None:
            kept.append(f)  # not in manifest: must assume matches
            continue
        alive = True
        for c, bounds in predicates.items():
            lo, hi = bounds
            st = fstats.get(c)
            if st is None or not st["has_stats"]:
                continue  # unknown: cannot prune on this column
            for bound, cmp_max in ((lo, True), (hi, False)):
                if bound is None:
                    continue
                val, domain = _normalize_bound(bound)
                smin = st["min_str"] if domain == "str" else st["min_num"]
                smax = st["max_str"] if domain == "str" else st["max_num"]
                if smin is None or smax is None:
                    continue  # stats in the other domain: skip
                if cmp_max and smax < val:
                    alive = False
                elif not cmp_max and smin > val:
                    alive = False
            if not alive:
                break
        if alive:
            kept.append(f)
    return kept, len(all_files)


def read_pruned(
    spark: SparkSession,
    path: str,
    predicates: Mapping[str, tuple],
) -> DataFrame:
    """Scan only the files that can match, then apply the EXACT
    predicate — identical rows to a full scan + filter, fewer files
    opened. Returns an empty DataFrame with the table's schema when
    every file is pruned."""
    kept, _total = prune_files(spark, path, predicates)
    full = spark.read.parquet(path)
    df = spark.read.schema(full.schema).parquet(*kept) if kept else full.limit(0)
    for c, (lo, hi) in predicates.items():
        if lo is not None:
            df = df.where(F.col(c) >= F.lit(lo))
        if hi is not None:
            df = df.where(F.col(c) <= F.lit(hi))
    return df


def _list_parquet_files_with_size(
    spark: SparkSession, path: str
) -> list[tuple[str, int]]:
    """(path, bytes) for non-hidden *.parquet files under ``path``."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        raise ValueError(f"no parquet files under {path}")
    out = []
    for st in fs.listStatus(jpath):
        name = st.getPath().getName()
        if st.isFile() and name.endswith(".parquet") and not name.startswith(("_", ".")):
            out.append((st.getPath().toString(), int(st.getLen())))
    return sorted(out)


def plan_compaction(
    spark: SparkSession,
    path: str,
    target_bytes: int,
    min_bin_files: int = 2,
) -> DataFrame:
    """Small-file compaction plan — the maintenance half of the
    lakehouse OPTIMIZE loop. Streaming/incremental writers (every
    foreachBatch sink in ``streaming/jobs.py``) emit one file per
    micro-batch per partition; at 100 TB the resulting million-file
    directory pays a listing + footer + task-schedule cost per file on
    EVERY read. This plans the rewrite: files already >= ``target_bytes``
    are kept as-is, smaller files are packed into bins of ~``target_bytes``
    by a cumulative-sum split over the (deterministic) name order.

    Returns one row per file: ``(file, size, action, bin)`` where
    ``action`` is 'keep' or 'compact' and ``bin`` numbers the rewrite
    groups (NULL for keeps). A bin can exceed ``target_bytes`` by at
    most one straddling file — the greedy cumsum split, same answer on
    any engine (the python mirror in tests pins it). Bins holding fewer
    than ``min_bin_files`` files are downgraded to 'keep' (rewriting a
    single file buys nothing).

    Scale note: the plan is FILE-METADATA-grain (one row per file from
    one directory listing — no footer or data reads) and the cumsum is
    a window over that tiny relation; a million-file table plans in
    seconds. The global name-order window is single-partition BY DESIGN:
    it runs on the metadata relation, never on data.
    """
    if target_bytes < 1:
        raise ValueError(f"plan_compaction: target_bytes must be positive, got {target_bytes}")
    files = _list_parquet_files_with_size(spark, path)
    fdf = spark.createDataFrame(files, "file string, size long")
    from pyspark.sql import Window

    small = fdf.where(F.col("size") < target_bytes)
    w = Window.orderBy("file").rowsBetween(Window.unboundedPreceding, -1)
    binned = small.select(
        "file",
        "size",
        F.floor(
            F.coalesce(F.sum("size").over(w), F.lit(0)) / target_bytes
        ).alias("bin"),
    )
    counts = binned.groupBy("bin").agg(F.count(F.lit(1)).alias("__n"))
    binned = binned.join(counts, "bin").select(
        "file",
        "size",
        F.when(F.col("__n") >= min_bin_files, F.lit("compact"))
        .otherwise(F.lit("keep"))
        .alias("action"),
        F.when(F.col("__n") >= min_bin_files, F.col("bin")).alias("bin"),
    )
    keeps = fdf.where(F.col("size") >= target_bytes).select(
        "file", "size", F.lit("keep").alias("action"), F.lit(None).cast("long").alias("bin")
    )
    return binned.unionByName(keeps)


def compact_files(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_bytes: int,
    min_bin_files: int = 2,
) -> tuple[DataFrame, list[str]]:
    """Execute a :func:`plan_compaction` plan: rewrite every 'compact'
    bin into ONE file under ``out_path`` in a single distributed job,
    and return ``(plan, keep_files)`` — the caller swaps the directory
    (or union-reads ``out_path`` + keeps) once the write commits.
    Originals are never deleted here: publish-then-retire is the
    caller's transaction to manage.

    One job, no per-bin driver loop: the small files are read in one
    scan, rows are tagged with their bin via a broadcast join on
    ``input_file_name()``, hash-repartitioned BY BIN (each output task
    receives whole bins), and written append-mode. Task count equals
    bin count; each task writes ~``target_bytes``.
    """
    plan = plan_compaction(spark, path, target_bytes, min_bin_files).persist()
    compact_rows = plan.where(F.col("action") == "compact")
    pairs = [(r.file, r.bin) for r in compact_rows.select("file", "bin").collect()]
    keep_files = [r.file for r in plan.where(F.col("action") == "keep").collect()]
    if pairs:
        n_bins = len({b for _, b in pairs})
        bin_map = spark.createDataFrame(pairs, "file string, __bin long")
        full_schema = spark.read.parquet(path).schema
        # canonicalize the local-FS scheme: listStatus renders
        # 'file:/x', input_file_name() 'file:///x' — same file
        canon = lambda c: F.regexp_replace(c, r"^file:/+", "file:///")  # noqa: E731
        df = (
            spark.read.schema(full_schema)
            .parquet(*[f for f, _ in pairs])
            .withColumn("file", canon(F.input_file_name()))
            .join(
                F.broadcast(bin_map.select(canon(F.col("file")).alias("file"), "__bin")),
                "file",
                "left",
            )
            .drop("file")
        )
        df = df.persist()
        n_unmatched = df.where(F.col("__bin").isNull()).count()
        if n_unmatched:
            df.unpersist()
            raise RuntimeError(
                f"compact_files: {n_unmatched} rows' input_file_name did not "
                "match the plan's file list (URI scheme mismatch?) — refusing "
                "to write a partial compaction"
            )
        (
            df.repartition(n_bins, "__bin")
            .drop("__bin")
            .write.mode("append")
            .parquet(out_path)
        )
        df.unpersist()
    plan.unpersist()
    return plan, keep_files


def compact_clustered(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_bytes: int,
    cluster_by: Sequence,
    min_bin_files: int = 2,
) -> tuple[DataFrame, list[str]]:
    """Compact AND cluster in one rewrite — the ``OPTIMIZE ... ZORDER
    BY`` pairing: since every small file is being rewritten anyway,
    spend the same pass range-partitioning rows by ``cluster_by`` so
    each output file holds a NARROW key range. Plain compaction
    (:func:`compact_files`) preserves the accidental row placement the
    streaming sinks produced — every output file still spans the full
    key domain and the footer-stats manifest (:func:`write_manifest`,
    :func:`read_pruned`) can prune nothing; after a clustered rewrite
    the per-file min/max become selective, which is exactly what makes
    file skipping work (pair multi-dimension keys via
    ``operators.layout.zorder_key`` — pass the expression as a
    ``cluster_by`` element).

    Output file count = ceil(total small bytes / target_bytes); one
    ``repartitionByRange`` (sampled boundaries, one shuffle of the
    small files only) + ``sortWithinPartitions`` for row-group-level
    locality inside each file. Keep-files (already >= target) are
    untouched and returned for the caller's publish step, exactly as
    in :func:`compact_files`.
    """
    cluster_by = list(cluster_by)
    if not cluster_by:
        raise ValueError("compact_clustered: cluster_by must name at least one column")
    plan = plan_compaction(spark, path, target_bytes, min_bin_files).persist()
    compact_rows = plan.where(F.col("action") == "compact").collect()
    keep_files = [r.file for r in plan.where(F.col("action") == "keep").collect()]
    if compact_rows:
        total = sum(r.size for r in compact_rows)
        n_bins = max(1, -(-total // int(target_bytes)))
        full_schema = spark.read.parquet(path).schema
        cols = [F.col(c) if isinstance(c, str) else c for c in cluster_by]
        (
            spark.read.schema(full_schema)
            .parquet(*[r.file for r in compact_rows])
            .repartitionByRange(n_bins, *cols)
            .sortWithinPartitions(*cols)
            .write.mode("append")
            .parquet(out_path)
        )
    plan.unpersist()
    return plan, keep_files
