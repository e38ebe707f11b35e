"""File source breadth: csv / json / parquet round-trips with explicit
schemas (no inference in the engine's read path)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("score", T.DoubleType()),
    ]
)

ROWS = [(1, "a", 1.5), (2, "b,with,commas", -2.0), (3, None, None)]


def test_csv_roundtrip_explicit_schema(spark, tmp_path):
    df = spark.createDataFrame(ROWS, SCHEMA)
    path = str(tmp_path / "csv")
    df.write.option("header", True).csv(path)
    back = spark.read.schema(SCHEMA).option("header", True).csv(path)
    assert sorted(back.collect()) == sorted(df.collect())
    assert back.schema == SCHEMA  # no inference drift


def test_json_roundtrip_explicit_schema(spark, tmp_path):
    df = spark.createDataFrame(ROWS, SCHEMA)
    path = str(tmp_path / "json")
    df.write.json(path)
    back = spark.read.schema(SCHEMA).json(path)
    assert sorted(back.collect()) == sorted(df.collect())


def test_orc_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(ROWS, SCHEMA)
    path = str(tmp_path / "orc")
    df.write.orc(path)
    back = spark.read.orc(path)
    assert sorted(back.collect()) == sorted(df.collect())
    assert back.schema == SCHEMA


def test_json_corrupt_line_permissive(spark, tmp_path):
    path = tmp_path / "data"
    path.mkdir()
    (path / "part.json").write_text('{"id": 1, "name": "x", "score": 2.0}\n{nope\n')
    back = spark.read.schema(SCHEMA).json(str(path))
    rows = back.collect()
    assert len(rows) == 2  # corrupt line kept as all-null row (PERMISSIVE)
    assert sorted([r.id for r in rows], key=lambda x: (x is None, x)) == [1, None]
