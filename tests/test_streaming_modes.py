"""Streaming output modes beyond append: update and complete, plus
corrupt-record handling options on the ingest path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iot_sensor_data_pipeline_spark.sources.json_ingest import ingest_readings, parse_json_column
from iot_sensor_data_pipeline_spark.schema import SENSOR_READING_SCHEMA
from tests.test_streaming import reading_json, write_batch


@pytest.fixture()
def stream_src(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    return src, tmp_path


def test_update_mode_reemits_changed_windows(spark, stream_src):
    """Update mode: a window's row is re-emitted whenever new data
    lands in it (vs append's emit-once-after-watermark)."""
    src, tmp = stream_src
    raw = spark.readStream.text(str(src))
    agg = (
        ingest_readings(raw)
        .groupBy(F.window("timestamp", "10 minutes"), "sensor_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    out = []
    q = (
        agg.writeStream.foreachBatch(lambda df, eid: out.append([(r["window"].start, r.n) for r in df.collect()]))
        .outputMode("update")
        .option("checkpointLocation", str(tmp / "chk_u"))
        .start()
    )
    try:
        write_batch(src, "b1.json", [reading_json("00:10", 22.0)])
        q.processAllAvailable()
        write_batch(src, "b2.json", [reading_json("00:20", 23.0)])
        q.processAllAvailable()
        emitted = [batch for batch in out if batch]
        assert len(emitted) == 2
        assert emitted[0][0][1] == 1 and emitted[1][0][1] == 2  # same window, updated count
    finally:
        q.stop()


def test_complete_mode_emits_full_result(spark, stream_src):
    src, tmp = stream_src
    raw = spark.readStream.text(str(src))
    agg = ingest_readings(raw).groupBy("sensor_type").agg(F.count(F.lit(1)).alias("n"))
    snapshots = []
    q = (
        agg.writeStream.foreachBatch(lambda df, eid: snapshots.append({r.sensor_type: r.n for r in df.collect()}))
        .outputMode("complete")
        .option("checkpointLocation", str(tmp / "chk_c"))
        .start()
    )
    try:
        write_batch(src, "b1.json", [reading_json("00:10", 22.0)])
        q.processAllAvailable()
        write_batch(src, "b2.json", [reading_json("00:20", 23.0)])
        q.processAllAvailable()
        assert snapshots[-1] == {"temperature": 2}  # complete = whole table every batch
    finally:
        q.stop()


def test_failfast_mode_raises_on_corrupt(spark):
    df = spark.createDataFrame([("{broken",)], "value string")
    parsed = parse_json_column(df, "value", SENSOR_READING_SCHEMA, mode="FAILFAST")
    with pytest.raises(Exception, match="(?i)malformed|failfast"):
        parsed.collect()


def test_permissive_plus_filter_is_the_dropmalformed_idiom(spark):
    # from_json supports only PERMISSIVE/FAILFAST (no DROPMALFORMED);
    # dropping corrupt rows = PERMISSIVE + filter on the null struct
    rows = [('{"sensor_id": "ok", "value": 1.0}',), ("{broken",)]
    df = spark.createDataFrame(rows, "value string")
    permissive = ingest_readings(df)
    assert permissive.count() == 2  # corrupt row kept as nulls
    # corrupt input yields a struct of all-null FIELDS (not a null
    # struct), so the filter keys on a required field
    parsed = parse_json_column(df, "value", SENSOR_READING_SCHEMA)
    assert parsed.where(F.col("data.sensor_id").isNotNull()).count() == 1
