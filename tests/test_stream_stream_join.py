"""Stream-stream joins (absent from the reference, SURVEY.md §2.4):
watermarked interval join between the readings stream and the alerts
stream derived from it — e.g. enrich each alert with the reading that
preceded it within a time bound."""

from __future__ import annotations

from pyspark.sql import functions as F

from iot_sensor_data_pipeline_spark.functions.rules import detect_alerts
from iot_sensor_data_pipeline_spark.sources.json_ingest import ingest_readings
from tests.test_streaming import reading_json, write_batch


def test_stream_static_broadcast_enrichment(spark, tmp_path):
    """Stream-static join: enrich streaming readings with a static
    (broadcast) dimension table — no watermark needed on the static
    side, the standard reference-data pattern."""
    src = tmp_path / "src"
    src.mkdir()
    out: list = []

    rooms = spark.createDataFrame(
        [("100", "server-room"), ("101", "office")], "room string, room_kind string"
    )
    enriched = ingest_readings(spark.readStream.text(str(src))).join(
        F.broadcast(rooms), "room", "left"
    )
    q = (
        enriched.writeStream.foreachBatch(lambda df, eid: out.extend(df.collect()))
        .option("checkpointLocation", str(tmp_path / "chk_ss"))
        .start()
    )
    try:
        write_batch(src, "b1.json", [reading_json("00:10", 22.0)])
        q.processAllAvailable()
        assert len(out) == 1 and out[0].room_kind == "server-room"
    finally:
        q.stop()


def test_stream_stream_interval_join(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    out: list = []

    readings = ingest_readings(spark.readStream.text(str(src))).withWatermark(
        "timestamp", "1 minute"
    )
    alerts = (
        detect_alerts(ingest_readings(spark.readStream.text(str(src))))
        .select(
            F.col("sensor_id").alias("a_sensor_id"),
            F.col("alert_type"),
            F.col("triggered_at"),
        )
        .withWatermark("triggered_at", "1 minute")
    )
    # each alert joined to readings of the same sensor in the preceding 2 min
    joined = alerts.join(
        readings,
        (F.col("a_sensor_id") == F.col("sensor_id"))
        & (F.col("timestamp") >= F.col("triggered_at") - F.expr("INTERVAL 2 MINUTES"))
        & (F.col("timestamp") <= F.col("triggered_at")),
    )
    q = (
        joined.writeStream.foreachBatch(lambda df, eid: out.extend(df.collect()))
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "chk"))
        .start()
    )
    try:
        write_batch(
            src,
            "b1.json",
            [
                reading_json("00:30", 22.0),   # context reading, in-window
                reading_json("01:30", 31.0),   # the alert row (joins itself + context)
                reading_json("05:00", 23.0),   # out of the 2-min window
            ],
        )
        q.processAllAvailable()
        write_batch(src, "b2.json", [reading_json("09:00", 22.5)])  # advance watermarks
        q.processAllAvailable()

        rows = {(r.alert_type, r.value) for r in out}
        assert ("temperature_critical", 22.0) in rows  # context reading joined
        assert ("temperature_critical", 31.0) in rows  # the alert's own reading
        assert all(v != 23.0 for _, v in rows)         # outside interval excluded
    finally:
        q.stop()
