"""Synthetic sensor source (S5): fleet layout, value ranges, wire format."""

from __future__ import annotations

import json

from iot_sensor_data_pipeline_spark.sources.json_ingest import ingest_readings
from iot_sensor_data_pipeline_spark.sources.synthetic import FLEET, reading_batch


def test_fleet_layout(spark):
    df = reading_batch(spark, FLEET * 4)
    ids = {r.sensor_id for r in df.select("sensor_id").distinct().collect()}
    assert len(ids) == FLEET  # 24 distinct sensors
    types = {r.sensor_type for r in df.select("sensor_type").distinct().collect()}
    assert types == {"temperature", "humidity", "pressure"}


def test_value_ranges_and_units(spark):
    rows = reading_batch(spark, FLEET * 40).collect()
    for r in rows:
        if r.sensor_type == "temperature":
            assert r.unit == "celsius" and 15 <= r.value <= 35
        elif r.sensor_type == "humidity":
            assert r.unit == "percent" and 30 <= r.value <= 80
        else:
            assert r.unit == "hPa" and 1000 <= r.value <= 1050


def test_wire_format_roundtrips_through_ingest(spark):
    from pyspark.sql import functions as F

    wire = reading_batch(spark, FLEET).select(F.to_json(F.struct("*")).alias("value"))
    flat = ingest_readings(wire).collect()
    assert len(flat) == FLEET
    assert all(r.sensor_id and r.value is not None and r.timestamp is not None for r in flat)
    payload = json.loads(wire.collect()[0].value)
    assert set(payload) == {
        "sensor_id", "sensor_type", "location", "timestamp", "value", "unit", "metadata",
    }

def test_reading_json_stream_feeds_ingest(spark, tmp_path):
    """The wire-format synthetic stream (one JSON `value` column —
    exactly what a Kafka topic delivers) parses through the standard
    ingest path in a real micro-batch run."""
    from iot_sensor_data_pipeline_spark.sources.json_ingest import ingest_readings
    from iot_sensor_data_pipeline_spark.sources.synthetic import reading_json_stream

    stream = reading_json_stream(spark, rows_per_second=50)
    parsed = ingest_readings(stream)
    q = (
        parsed.writeStream.format("memory")
        .queryName("wire_ingest")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        import time

        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.sql("SELECT * FROM wire_ingest").count() > 0:
                break
            time.sleep(1)
        rows = spark.sql("SELECT * FROM wire_ingest").collect()
        assert rows, "stream produced no parsed rows in 60s"
        assert rows[0].sensor_id is not None and rows[0].value is not None
    finally:
        q.stop()
