"""Per-FILE Bloom indexes: file skipping for point lookups on
high-cardinality, unsorted columns — the case footer min/max stats
(sources/manifest.py) cannot prune. A randomly-loaded id column spans
nearly the full domain in every file, so every file's [min, max]
contains every probe key and range pruning keeps 100% of files; a
per-file Bloom filter answers "could THIS file contain key k" at a few
bits per distinct key (the same design as Delta Lake / Parquet
column-level bloom indexes — public knowledge, re-expressed over the
engine's packed-words bloom relation from operators/bloom.py).

Layout: ``<table>/_bloom_<col...>/`` holds one parquet relation
``(file, word, bits, m_bits, n_hashes)`` — each file's filter packed
into 64-bit words, absent words all-zero. Underscore-prefixed dirs are
invisible to Spark's table scans, same convention as ``_manifest``.

Scale posture:
- BUILD is one distributed pass over the indexed columns
  (input_file_name grain, map-side-combined bit_or per (file, word));
  nothing driver-sized anywhere.
- REFRESH (``update_bloom_index``) reads ONLY files absent from the
  index — per micro-batch cost is the new files' key columns, never
  the historical table. Coverage is an explicit per-file sentinel row
  (COVERAGE_WORD), independent of whether the file contributed bloom
  bits, and commits are VERSIONED (``v<N+1>`` under the index dir,
  same discipline as update_manifest) — readers never hit a
  missing-index window.
- PRUNE joins the (broadcast) probe positions against the index
  relation and collects only candidate file NAMES: O(kept files) on
  the driver, the same order as the directory listing Spark's planner
  already holds. Files not covered by the index (stale index after new
  writes) are conservatively KEPT — a stale index can cost I/O, never
  correctness, exactly the manifest.py discipline.
- NO FALSE NEGATIVES by construction: a file is dropped only when some
  probe bit is provably unset in its filter.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iot_sensor_data_pipeline_spark.operators.bloom import (
    _positions,
    _resolve_params,
)
from iot_sensor_data_pipeline_spark.sources.manifest import (
    _commit_version_in,
    _list_parquet_files,
    _read_versioned_in,
)

__all__ = [
    "bloom_index_dir",
    "write_bloom_index",
    "update_bloom_index",
    "prune_files_bloom",
    "read_pruned_bloom",
]


def bloom_index_dir(path: str, on: Sequence[str]) -> str:
    return f"{path}/_bloom_{'_'.join(on)}"


def _require_data_columns(spark: SparkSession, files, on: Sequence[str]) -> None:
    """Key columns must live IN the data files, not in partition
    directory names: a hive partition column read from an explicit
    file list is all-NULL, so the incremental path would index a
    covered file with NO bits for real keys and point reads would
    PRUNE files that contain the key — silent wrong answers, the one
    failure a bloom index must never produce. Partition-column point
    lookups are directory pruning's job (Spark does it natively).
    One footer-level schema probe of a single file."""
    if not files:
        raise ValueError(
            "no parquet data files under the table — nothing to index "
            "(write data before building a bloom index)"
        )
    file_cols = set(spark.read.parquet(files[0]).schema.fieldNames())
    missing = [c for c in on if c not in file_cols]
    if missing:
        raise ValueError(
            f"bloom index keys {missing} are not data columns of the "
            "files (hive partition columns?) — index data columns only; "
            "partition columns already get directory-level pruning"
        )


def _not_null(on: Sequence[str]):
    e = F.lit(True)
    for c in on:
        e = e & F.col(c).isNotNull()
    return e


def _canon(name: str) -> str:
    """Canonical file name: input_file_name() renders local files as
    'file:///x' while Hadoop's listing renders 'file:/x' — normalize
    the local scheme away so index rows and directory listings join;
    real remote URIs (hdfs://, s3a://) pass through untouched."""
    if name.startswith("file:"):
        return "/" + name[5:].lstrip("/")
    return name


def _canon_col(c) -> F.Column:
    return F.when(
        c.startswith("file:"), F.regexp_replace(c, "^file:/+", "/")
    ).otherwise(c)


#: sentinel word id marking "this file IS covered by the index" —
#: real packed words are >= 0, so a probe (whose positions are
#: non-negative) can never join it. Emitted once per input file
#: regardless of key content: coverage must be independent of whether
#: a file contributed bloom bits (an empty micro-batch file or an
#: all-NULL-keys file would otherwise re-enter the refresh as "new"
#: forever, turning every steady-state no-op into a full index rewrite
#: — ADVICE r9 item 2).
COVERAGE_WORD = -1


def _file_blooms(
    df: DataFrame, on: Sequence[str], m_bits: int, n_hashes: int
) -> DataFrame:
    """(file, word, bits, m_bits, n_hashes) — one filter per input
    file, packed into 64-bit words, plus one COVERAGE_WORD sentinel row
    per file. NULL keys contribute no probes (bloom membership of NULL
    is meaningless for equi-lookups)."""
    tagged = df.select(*on, _canon_col(F.input_file_name()).alias("file"))
    probes = (
        tagged.where(_not_null(on))
        .select(
            "file",
            F.explode(F.array(*_positions(on, m_bits, n_hashes))).alias("__pos"),
        )
        .select(
            "file",
            F.shiftright(F.col("__pos"), 6).alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(__pos & 63 AS INT))").alias(
                "__mask"
            ),
        )
    )
    return probes.groupBy("file", "word").agg(
        F.bit_or("__mask").alias("bits"),
        F.lit(m_bits).cast("long").alias("m_bits"),
        F.lit(n_hashes).cast("int").alias("n_hashes"),
    )


def _coverage_rows(
    spark: SparkSession, files: Sequence[str], m_bits: int, n_hashes: int
) -> DataFrame:
    """One COVERAGE_WORD sentinel per file, built from the DIRECTORY
    LISTING (not from scanned rows — a zero-row file yields no
    input_file_name rows at all, and an all-NULL-keys file yields no
    probes; both must still count as covered)."""
    fdf = spark.createDataFrame([(f,) for f in files], "file string")
    return fdf.select(
        "file",
        F.lit(COVERAGE_WORD).cast("long").alias("word"),
        F.lit(0).cast("long").alias("bits"),
        F.lit(m_bits).cast("long").alias("m_bits"),
        F.lit(n_hashes).cast("int").alias("n_hashes"),
    )


def write_bloom_index(
    spark: SparkSession,
    path: str,
    on: Sequence[str],
    m_bits: int | None = None,
    n_hashes: int | None = None,
    expected_keys_per_file: int | None = None,
    fpp: float = 0.01,
) -> DataFrame:
    """Build the per-file Bloom index for key columns ``on`` (one
    distributed pass over those columns; size via ``m_bits`` directly
    or ``expected_keys_per_file``+``fpp``). Key TYPES are part of the
    contract: probes must hash the same types the index was built
    from (xxhash64 of a long and of its string rendering differ)."""
    on = list(on)
    if not on:
        raise ValueError("on must name at least one key column")
    m_bits, n_hashes = _resolve_params(m_bits, n_hashes, expected_keys_per_file, fpp)
    files = [_canon(f) for f in _list_parquet_files(spark, path)]
    _require_data_columns(spark, files, on)
    df = spark.read.parquet(path).select(*on)
    blooms = _file_blooms(df, on, m_bits, n_hashes).unionByName(
        _coverage_rows(spark, files, m_bits, n_hashes)
    )
    idx_dir = bloom_index_dir(path, on)
    _commit_version_in(spark, idx_dir, blooms, single_file=False)
    return _read_versioned_in(spark, idx_dir)


def _read_bloom_index(spark: SparkSession, idx_dir: str) -> DataFrame:
    """Newest committed index version (legacy flat layout read as-is;
    the next update migrates it)."""
    return _read_versioned_in(spark, idx_dir)


def update_bloom_index(
    spark: SparkSession, path: str, on: Sequence[str]
) -> DataFrame:
    """Incrementally extend the index: bloom-build ONLY files it does
    not cover yet, keep rows for files still present, drop rows for
    deleted files; no-op (zero jobs, no new version) when the file set
    is unchanged. Parameters (m_bits, n_hashes) are inherited from the
    existing index so old and new filters stay probe-compatible.

    Coverage is the per-file COVERAGE_WORD sentinel, not the presence
    of bloom bits — a zero-row or all-NULL-keys file is indexed exactly
    once and the steady-state zero-job no-op keeps firing (ADVICE r9
    item 2; a legacy sentinel-free index re-reads such files once and
    is sentinel-covered from then on). Commits are versioned
    (``v<N+1>``), so concurrent readers never hit a missing-index
    window."""
    on = list(on)
    idx_dir = bloom_index_dir(path, on)
    files = [_canon(f) for f in _list_parquet_files(spark, path)]
    if not files:
        raise ValueError(f"no parquet files under {path}")
    existing = _read_bloom_index(spark, idx_dir)
    params = existing.select("m_bits", "n_hashes").first()
    if params is None:
        raise ValueError(
            f"bloom index at {idx_dir} is empty — rebuild with write_bloom_index"
        )
    m_bits, n_hashes = int(params.m_bits), int(params.n_hashes)
    indexed = {r.file for r in existing.select("file").distinct().collect()}
    new_files = [f for f in files if f not in indexed]
    dropped = indexed - set(files)
    if not new_files and not dropped:
        return existing
    fdf = spark.createDataFrame([(f,) for f in files], "file string")
    kept = existing.join(F.broadcast(fdf), "file", "left_semi")
    if new_files:
        _require_data_columns(spark, new_files, on)
        new_df = spark.read.schema(spark.read.parquet(path).schema).parquet(
            *new_files
        ).select(*on)
        fresh = _file_blooms(new_df, on, m_bits, n_hashes).unionByName(
            _coverage_rows(spark, new_files, m_bits, n_hashes)
        )
    else:
        fresh = kept.limit(0)
    merged = kept.unionByName(fresh)
    _commit_version_in(spark, idx_dir, merged, single_file=False)
    return _read_bloom_index(spark, idx_dir)


def prune_files_bloom(
    spark: SparkSession,
    path: str,
    on: Sequence[str],
    keys: DataFrame,
) -> tuple[list[str], int]:
    """(files that may contain some probe key, total file count).

    ``keys`` carries the probe values in columns named ``on`` (typed as
    in the table). A file survives when EVERY one of some key's
    n_hashes probe bits is set in its filter; files the index does not
    cover are conservatively kept. The probe relation (|keys| x
    n_hashes small rows) broadcasts into the index join — the index
    itself never collects."""
    on = list(on)
    idx = _read_bloom_index(spark, bloom_index_dir(path, on))
    params = idx.select("m_bits", "n_hashes").first()
    if params is None:
        raise ValueError("bloom index is empty — rebuild with write_bloom_index")
    m_bits, n_hashes = int(params.m_bits), int(params.n_hashes)
    all_files = [_canon(f) for f in _list_parquet_files(spark, path)]

    probes = (
        keys.select(*on)
        .distinct()
        .where(_not_null(on))
        .select(
            *on,
            F.posexplode(F.array(*_positions(on, m_bits, n_hashes))).alias(
                "__i", "__pos"
            ),
        )
        .select(
            *on,
            F.shiftright(F.col("__pos"), 6).alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(__pos & 63 AS INT))").alias(
                "__mask"
            ),
        )
    )
    # two probe positions of one key may share a (word, mask) pair —
    # count MATCHED PROBE ROWS (duplicates count twice on both sides of
    # the comparison), so == n_hashes still means "all probes hit"
    cand = (
        idx.join(F.broadcast(probes), "word")
        .where(F.col("bits").bitwiseAND(F.col("__mask")) != 0)
        .groupBy("file", *on)
        .agg(F.count(F.lit(1)).alias("__hits"))
        .where(F.col("__hits") == n_hashes)
        .select("file")
        .distinct()
    )
    hit_files = {r.file for r in cand.collect()}
    indexed = {r.file for r in idx.select("file").distinct().collect()}
    kept = [f for f in all_files if f in hit_files or f not in indexed]
    return kept, len(all_files)


def read_pruned_bloom(
    spark: SparkSession,
    path: str,
    on: Sequence[str],
    keys: DataFrame,
) -> DataFrame:
    """Point-lookup scan: open only the candidate files, then apply the
    EXACT key predicate (broadcast semi-join) — identical rows to a
    full scan + semi-join, a few files opened instead of all of them."""
    kept, _total = prune_files_bloom(spark, path, on, keys)
    full = spark.read.parquet(path)
    # basePath keeps hive partition columns alive on the explicit file
    # list (harmless for flat layouts — see manifest.read_pruned)
    df = (
        spark.read.schema(full.schema).option("basePath", path).parquet(*kept)
        if kept
        else full.limit(0)
    )
    return df.join(F.broadcast(keys.select(*on).distinct()), list(on), "left_semi")
