"""Orchestrator lifecycle + partitioned parquet sink round-trip."""

from __future__ import annotations

from pyspark.sql import functions as F

from iot_sensor_data_pipeline_spark.sources.sinks import (
    parquet_batch_sink,
    with_date_partitions,
    write_partitioned_parquet,
)
from iot_sensor_data_pipeline_spark.streaming.orchestrator import Pipeline
from tests.test_streaming import reading_json, write_batch


def test_pipeline_three_jobs_end_to_end(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    readings, alerts, aggs = [], [], []

    with Pipeline() as p:
        p.start_standard_jobs(
            raw_factory=lambda: spark.readStream.text(str(src)),
            checkpoint_root=str(tmp_path / "chk"),
            readings_sinks=[lambda df: readings.extend(df.collect())],
            alerts_sinks=[lambda df: alerts.extend(df.collect())],
            agg_sinks=[lambda df: aggs.extend(df.collect())],
            window_duration="1 minute",
            watermark="30 seconds",
        )
        write_batch(src, "b1.json", [reading_json("00:10", 22.0), reading_json("00:20", 31.0)])
        p.process_all_available()
        write_batch(src, "b2.json", [reading_json("05:00", 23.0)])  # advance watermark
        p.process_all_available()
        assert len(p.queries) == 3 and all(q.isActive for q in p.queries.values())
        p.stop_all()
        p.await_all(poll_seconds=0.1, timeout=30)

    assert len(readings) == 3              # every reading persisted
    assert [a.alert_type for a in alerts] == ["temperature_critical"]
    assert any(r.n == 2 for r in aggs)      # first window finalized


def test_partitioned_parquet_roundtrip_and_pruning(spark, tmp_path):
    out = str(tmp_path / "lake")
    df = spark.createDataFrame(
        [(1, "2026-01-01 10:00:00", 1.0), (2, "2026-01-02 11:00:00", 2.0)],
        "id int, ts string, v double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    write_partitioned_parquet(with_date_partitions(df, "ts"), out, ["dt", "hour"], mode="overwrite")

    back = spark.read.parquet(out)
    assert back.count() == 2
    pruned = back.where(F.col("dt") == "2026-01-01")
    assert pruned.count() == 1
    # partition pruning visible in the scan (no dt filter left post-scan)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


def test_parquet_batch_sink_appends(spark, tmp_path):
    out = str(tmp_path / "sink")
    sink = parquet_batch_sink(out)
    df = spark.createDataFrame([(1,)], "id int")
    sink(df)
    sink(df)
    assert spark.read.parquet(out).count() == 2
