"""Z-order layout (operators/layout.py): the measurable pruning claim —
file-level min/max stats over a z-ordered layout prune predicates on
EVERY keyed dimension, where a 1D sort prunes only its leading column.
Verified against the actual parquet footers via pyarrow."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from iot_sensor_data_pipeline_spark.operators.layout import (
    bucketize_for_zorder,
    zorder_key,
)


def _file_ranges(path, col):
    """(min, max) of `col` per written parquet file, from footers."""
    out = []
    for f in sorted(glob.glob(f"{path}/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    lo = c.statistics.min if lo is None else min(lo, c.statistics.min)
                    hi = c.statistics.max if hi is None else max(hi, c.statistics.max)
        out.append((lo, hi))
    return out


def _n_intersecting(ranges, lo, hi):
    return sum(1 for a, b in ranges if a is not None and not (b < lo or a > hi))


def test_zorder_layout_prunes_both_dimensions(spark, tmp_path):
    n = 200_000
    df = spark.range(n).select(
        (F.hash("id") % 1024 + 1024) % 1024,
        (F.hash(F.col("id") + 7) % 1024 + 1024) % 1024,
    ).toDF("x", "y")

    xsorted = str(tmp_path / "xsorted")
    zordered = str(tmp_path / "zordered")
    files = 64
    df.repartitionByRange(files, "x").sortWithinPartitions("x").write.parquet(xsorted)
    zdf = df.withColumn("zk", zorder_key(["x", "y"], bits=10))
    zdf.repartitionByRange(files, "zk").sortWithinPartitions("zk").drop("zk").write.parquet(zordered)

    band = (100, 119)  # a y-only band predicate
    x_layout_y = _n_intersecting(_file_ranges(xsorted, "y"), *band)
    z_layout_y = _n_intersecting(_file_ranges(zordered, "y"), *band)
    n_x_files = len(_file_ranges(xsorted, "y"))
    # 1D x-sort: every file spans all of y -> no pruning on y
    assert x_layout_y == n_x_files
    # z-order: files cover 2D tiles -> most exclude the y band
    assert z_layout_y < 0.45 * n_x_files, (z_layout_y, n_x_files)
    # and x-band predicates still prune on the z-ordered layout
    z_layout_x = _n_intersecting(_file_ranges(zordered, "x"), *band)
    assert z_layout_x < 0.45 * n_x_files


def test_zorder_key_locality_and_guards(spark):
    with pytest.raises(ValueError, match=">= 2"):
        zorder_key(["x"])
    with pytest.raises(ValueError, match="exceeds a long"):
        zorder_key(["a", "b", "c", "d"], bits=16)
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (1023, 1023)], "x int, y int"
    )
    keys = {
        (r.x, r.y): r.zk
        for r in df.select("x", "y", zorder_key(["x", "y"], bits=10).alias("zk")).collect()
    }
    assert keys[(0, 0)] == 0
    assert keys[(1, 0)] == 1  # x occupies even bit positions
    assert keys[(0, 1)] == 2  # y the odd ones
    assert keys[(1023, 1023)] == (1 << 20) - 1


def test_bucketize_for_zorder_handles_skew(spark):
    """Rank bucketing spreads a heavily skewed column evenly — raw
    value bits would put almost everything in bucket 0."""
    import math

    rows = [(i, math.exp(i / 5000.0)) for i in range(20_000)]  # log-normal-ish
    df = spark.createDataFrame(rows, "id long, v double")
    b = bucketize_for_zorder(df, ["v"], bits=4)  # 16 buckets
    counts = {
        r.b: r.n
        for r in b.groupBy(F.col("__zb_v").alias("b")).agg(F.count("*").alias("n")).collect()
    }
    assert len(counts) == 16
    assert max(counts.values()) < 3 * (20_000 / 16)  # no collapsed bucket


def test_bucketize_for_zorder_timestamps(spark):
    """Timestamp columns bucketize via epoch seconds — the (time,
    sensor) layout is the module's headline use case."""
    from pyspark.sql import functions as F

    df = spark.range(1000).select(
        F.timestamp_seconds(F.col("id") * 3600).alias("ts"),
        (F.col("id") % 50).alias("sensor"),
    )
    b = bucketize_for_zorder(df, ["ts"], bits=3)
    counts = [
        r.n
        for r in b.groupBy("__zb_ts").agg(F.count("*").alias("n")).collect()
    ]
    assert len(counts) == 8
    assert max(counts) < 2 * (1000 / 8)
    assert "__zq_ts" not in b.columns  # helper column cleaned up


def test_sink_zorder_by_prunes_at_file_grain(spark, tmp_path):
    """write_partitioned_parquet(zorder_by=...) end to end: the sink's
    z-ordered layout prunes a y-band predicate at the FILE grain where
    the plain write cannot — footer-verified, same machinery as the
    operator-level test."""
    from iot_sensor_data_pipeline_spark.sources.sinks import (
        write_partitioned_parquet,
    )

    n = 100_000
    df = spark.range(n).select(
        (F.hash("id") % 512 + 512) % 512,
        (F.hash(F.col("id") + 7) % 512 + 512) % 512,
    ).toDF("x", "y")

    plain = str(tmp_path / "plain")
    zpath = str(tmp_path / "z")
    files = 32
    df.repartitionByRange(files, "x").sortWithinPartitions("x").write.parquet(plain)
    write_partitioned_parquet(
        df, zpath, mode="overwrite", zorder_by=["x", "y"],
        zorder_files=files, max_records_per_file=None,
    )

    band = (50, 59)  # y-only band predicate
    plain_ranges = _file_ranges(plain, "y")
    z_ranges = _file_ranges(zpath, "y")
    assert _n_intersecting(plain_ranges, *band) == len(plain_ranges)  # no y pruning
    assert _n_intersecting(z_ranges, *band) < 0.5 * len(z_ranges)
    # x predicates still prune on the sink's layout too
    assert _n_intersecting(_file_ranges(zpath, "x"), *band) < 0.5 * len(z_ranges)


def test_sink_zorder_with_hive_partitions(spark, tmp_path):
    """zorder_by composes with partition_cols: every hive directory's
    files are z-clustered (pruning holds inside each partition dir)."""
    import glob as _glob

    from iot_sensor_data_pipeline_spark.sources.sinks import (
        write_partitioned_parquet,
    )

    df = spark.range(60_000).select(
        (F.col("id") % 2).alias("part"),
        ((F.hash("id") % 256 + 256) % 256).alias("x"),
        ((F.hash(F.col("id") + 3) % 256 + 256) % 256).alias("y"),
    )
    path = str(tmp_path / "hp")
    write_partitioned_parquet(
        df, path, partition_cols=["part"], mode="overwrite",
        zorder_by=["x", "y"], zorder_files=16, max_records_per_file=None,
    )
    for d in sorted(_glob.glob(f"{path}/part=*")):
        ranges = _file_ranges(d, "y")
        assert len(ranges) >= 4, d  # the dir actually got multiple files
        assert _n_intersecting(ranges, 20, 29) < len(ranges), d
    # read back respects hive partitioning + values survive
    back = spark.read.parquet(path)
    assert back.count() == 60_000 and set(back.columns) == {"part", "x", "y"}
