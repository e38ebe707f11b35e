"""Per-file Bloom index (sources/bloom_index.py): file skipping for
point lookups on high-cardinality unsorted columns, where footer
min/max stats cannot prune. Correctness contract: NO false negatives
ever (a stale or lossy index may cost I/O, never rows)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from iot_sensor_data_pipeline_spark.sources.bloom_index import (
    bloom_index_dir,
    prune_files_bloom,
    read_pruned_bloom,
    update_bloom_index,
    write_bloom_index,
)

N_FILES = 10
ROWS_PER_FILE = 400


@pytest.fixture(scope="module")
def table(spark, tmp_path_factory):
    """10 files of RANDOMLY INTERLEAVED ids — every file's [min, max]
    spans ~the whole domain, so min/max pruning would keep all files;
    only the bloom can skip."""
    path = str(tmp_path_factory.mktemp("bloomidx") / "tbl")
    n = N_FILES * ROWS_PER_FILE
    df = (
        spark.range(n)
        .select(
            F.col("id").alias("k"),
            F.concat(F.lit("p"), F.col("id")).alias("payload"),
        )
        # hash-partition on k: every file gets ids scattered across the
        # whole domain, so min/max pruning is useless by construction
        .repartition(N_FILES, "k")
    )
    df.write.mode("overwrite").parquet(path)
    write_bloom_index(
        spark, path, ["k"], expected_keys_per_file=ROWS_PER_FILE, fpp=0.01
    )
    return path


def test_point_lookup_skips_most_files_and_loses_nothing(spark, table):
    keys = spark.createDataFrame([(7,), (1234,), (3999,)], "k long")
    kept, total = prune_files_bloom(spark, table, ["k"], keys)
    assert total == N_FILES
    # 3 keys live in <= 3 files; fpp adds at most a couple of stragglers
    assert 1 <= len(kept) <= 6

    got = read_pruned_bloom(spark, table, ["k"], keys)
    want = (
        spark.read.parquet(table)
        .join(F.broadcast(keys), "k", "left_semi")
    )
    assert sorted(r.payload for r in got.collect()) == sorted(
        r.payload for r in want.collect()
    )


def test_absent_keys_prune_to_nearly_nothing(spark, table):
    keys = spark.createDataFrame([(10**9 + i,) for i in range(5)], "k long")
    kept, total = prune_files_bloom(spark, table, ["k"], keys)
    # 5 absent keys x 10 files x fpp 1% -> expected ~0.5 false-positive
    # files; allow generous slack, but a no-op prune means a broken index
    assert len(kept) <= 4
    assert read_pruned_bloom(spark, table, ["k"], keys).count() == 0


def test_no_false_negatives_exhaustive(spark, table):
    """Every 37th key of the whole domain: pruned scan == full scan."""
    keys = spark.range(0, N_FILES * ROWS_PER_FILE, 37).select(
        F.col("id").alias("k")
    )
    got = read_pruned_bloom(spark, table, ["k"], keys).count()
    want = (
        spark.read.parquet(table).join(F.broadcast(keys), "k", "left_semi").count()
    )
    assert got == want == len(range(0, N_FILES * ROWS_PER_FILE, 37))


def test_stale_index_is_conservative_then_update_heals(spark, table):
    """A file added AFTER the index build must always be kept (no
    false negatives from staleness); update_bloom_index covers it
    incrementally and a second refresh is a no-op (no swap window)."""
    new_key = 777_777
    spark.createDataFrame([(new_key, "late")], "k long, payload string").coalesce(
        1
    ).write.mode("append").parquet(table)

    keys = spark.createDataFrame([(new_key,)], "k long")
    got = {r.payload for r in read_pruned_bloom(spark, table, ["k"], keys).collect()}
    assert got == {"late"}  # stale index, row still found

    idx = update_bloom_index(spark, table, ["k"])
    n_indexed = idx.select("file").distinct().count()
    assert n_indexed == N_FILES + 1
    kept, total = prune_files_bloom(spark, table, ["k"], keys)
    assert total == N_FILES + 1
    assert len(kept) <= 2  # the late file + at most one fp straggler
    got2 = {r.payload for r in read_pruned_bloom(spark, table, ["k"], keys).collect()}
    assert got2 == {"late"}

    # steady state: no new/deleted files -> untouched index dir
    idir = bloom_index_dir(table, ["k"])
    before = {f: os.path.getmtime(os.path.join(idir, f)) for f in os.listdir(idir)}
    update_bloom_index(spark, table, ["k"])
    after = {f: os.path.getmtime(os.path.join(idir, f)) for f in os.listdir(idir)}
    assert after == before


def test_null_probe_keys_match_nothing(spark, table):
    keys = spark.createDataFrame([(None,), (5,)], "k long")
    got = read_pruned_bloom(spark, table, ["k"], keys)
    assert [r.k for r in got.collect()] == [5]


def test_composite_key_index(spark, tmp_path):
    path = str(tmp_path / "tbl2")
    df = spark.range(1000).select(
        (F.col("id") % 50).alias("a"),
        (F.col("id") % 7).alias("b"),
        F.col("id").alias("v"),
    )
    df.repartition(8).write.mode("overwrite").parquet(path)
    write_bloom_index(spark, path, ["a", "b"], expected_keys_per_file=200)
    keys = spark.createDataFrame([(3, 3), (10, 4)], "a long, b long")
    got = read_pruned_bloom(spark, path, ["a", "b"], keys)
    want = spark.read.parquet(path).join(F.broadcast(keys), ["a", "b"], "left_semi")
    assert sorted(r.v for r in got.collect()) == sorted(
        r.v for r in want.collect()
    )


def test_zero_key_files_are_covered_once(spark, tmp_path):
    """ADVICE r9 item 2: a data file with zero non-null key rows (empty
    micro-batch file, all-NULL keys) must enter coverage on its first
    refresh and never re-trigger index work — the steady-state no-op
    keeps firing. Coverage rides an explicit per-file sentinel row, not
    the presence of bloom bits."""
    from iot_sensor_data_pipeline_spark.sources.bloom_index import (
        update_bloom_index,
        write_bloom_index,
    )
    from iot_sensor_data_pipeline_spark.sources.manifest import _versions_in

    path = str(tmp_path / "tbl")
    spark.range(0, 50).select(F.col("id").alias("k")).coalesce(1).write.parquet(path)
    write_bloom_index(spark, path, ["k"], expected_keys_per_file=100)
    idx_dir = f"{path}/_bloom_k"

    # an all-NULL-keys file and a zero-ROW file join the table
    spark.createDataFrame([(None,)], "k long").coalesce(1).write.mode(
        "append"
    ).parquet(path)
    spark.range(0, 0).select(F.col("id").alias("k")).coalesce(1).write.mode(
        "append"
    ).parquet(path)
    update_bloom_index(spark, path, ["k"])
    v_after_refresh = _versions_in(spark, idx_dir)

    # steady state: repeated refreshes are true no-ops — no new version
    for _ in range(3):
        update_bloom_index(spark, path, ["k"])
    assert _versions_in(spark, idx_dir) == v_after_refresh

    # and lookups still work: bloom pruning drops the keyless files
    from iot_sensor_data_pipeline_spark.sources.bloom_index import (
        prune_files_bloom,
        read_pruned_bloom,
    )

    keys = spark.createDataFrame([(7,)], "k long")
    kept, total = prune_files_bloom(spark, path, ["k"], keys)
    assert total == 3
    assert len(kept) == 1  # the keyless files are provably keyless
    assert [r.k for r in read_pruned_bloom(spark, path, ["k"], keys).collect()] == [7]


def test_bloom_index_versioned_commits_no_reader_window(spark, tmp_path):
    """update_bloom_index commits v<N+1> while the superseded version
    stays readable — a reader loop across refreshes never fails (the
    r9 delete+rename missing-index window is gone)."""
    import threading

    from iot_sensor_data_pipeline_spark.sources.bloom_index import (
        prune_files_bloom,
        update_bloom_index,
        write_bloom_index,
    )

    path = str(tmp_path / "tbl")
    spark.range(0, 100).select(F.col("id").alias("k")).coalesce(1).write.parquet(path)
    write_bloom_index(spark, path, ["k"], expected_keys_per_file=200)
    keys = spark.createDataFrame([(42,)], "k long")

    stop = threading.Event()
    failures: list[BaseException] = []

    def reader():
        while not stop.is_set():
            try:
                kept, total = prune_files_bloom(spark, path, ["k"], keys)
                assert 1 <= len(kept) <= total
            except BaseException as e:  # noqa: BLE001
                failures.append(e)
                return

    t = threading.Thread(target=reader, daemon=True)
    t.start()
    try:
        for b in range(1, 5):
            spark.range(b * 100, (b + 1) * 100).select(
                F.col("id").alias("k")
            ).coalesce(1).write.mode("append").parquet(path)
            update_bloom_index(spark, path, ["k"])
    finally:
        stop.set()
        t.join(timeout=120)
    assert not failures, failures[0]


def test_write_bloom_index_empty_table_raises_clearly(spark, tmp_path):
    """ADVICE r11: an existing directory with zero data files must
    raise a clear ValueError, not IndexError on files[0]."""
    import os

    import pytest

    from iot_sensor_data_pipeline_spark.sources.bloom_index import (
        write_bloom_index,
    )

    path = str(tmp_path / "empty")
    os.makedirs(path)
    with pytest.raises(ValueError, match="no parquet"):
        write_bloom_index(spark, path, ["k"], expected_keys_per_file=10)
