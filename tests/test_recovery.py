"""Checkpoint recovery: a restarted query resumes from committed
offsets — no re-emission of processed batches, no data loss, and
stateful aggregation state survives the restart.

(The reference loses data on restart: startingOffsets=latest with no
checkpoint on 3 of 4 queries — SURVEY.md §4 anti-pattern b. These
tests pin the fixed behavior.)
"""

from __future__ import annotations

from iot_sensor_data_pipeline_spark.streaming.jobs import start_aggregator, start_alerts
from tests.test_streaming import reading_json, write_batch


def test_alert_query_restart_no_reemission_no_loss(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    chk = str(tmp_path / "chk")
    out1: list = []

    raw = spark.readStream.text(str(src))
    q = start_alerts(raw, sinks=[lambda df: out1.extend(df.collect())], checkpoint=chk)
    write_batch(src, "b1.json", [reading_json("00:10", 31.0)])
    q.processAllAvailable()
    q.stop()
    assert [r.alert_type for r in out1] == ["temperature_critical"]

    # restart with the SAME checkpoint and a fresh sink; new file arrives
    out2: list = []
    raw2 = spark.readStream.text(str(src))
    q2 = start_alerts(raw2, sinks=[lambda df: out2.extend(df.collect())], checkpoint=chk)
    try:
        write_batch(src, "b2.json", [reading_json("01:00", 32.0), reading_json("01:10", 22.0)])
        q2.processAllAvailable()
        # only the post-restart alert: b1 is committed, not replayed; the
        # normal reading emits nothing
        assert [r.alert_type for r in out2] == ["temperature_critical"]
        assert out2[0].actual_value == 32.0
    finally:
        q2.stop()


def test_aggregator_state_survives_restart(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    chk = str(tmp_path / "chk")
    out: list = []

    raw = spark.readStream.text(str(src))
    q = start_aggregator(
        raw,
        sinks=[lambda df: out.extend(df.collect())],
        checkpoint=chk,
        window_duration="4 minutes",
        watermark="1 minute",
    )
    write_batch(src, "b1.json", [reading_json("00:10", 22.0), reading_json("01:10", 28.0)])
    q.processAllAvailable()
    q.stop()
    assert out == []  # window still open at shutdown

    raw2 = spark.readStream.text(str(src))
    q2 = start_aggregator(
        raw2,
        sinks=[lambda df: out.extend(df.collect())],
        checkpoint=chk,
        window_duration="4 minutes",
        watermark="1 minute",
    )
    try:
        # post-restart rows join the PRE-restart window state, then a
        # late-hour row closes it
        write_batch(src, "b2.json", [reading_json("02:10", 31.0)])
        q2.processAllAvailable()
        write_batch(src, "b3.json", [reading_json("10:00", 23.0)])
        q2.processAllAvailable()
        windows = [r for r in out if r.window_start.minute == 0]
        assert len(windows) == 1
        # n=3 proves the restored state store carried b1's two rows
        assert windows[0].n == 3 and windows[0].max_value == 31.0
    finally:
        q2.stop()
