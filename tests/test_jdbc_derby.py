"""K1-K3 JDBC append path END-TO-END against embedded Derby.

The reference appends micro-batches to Postgres
(data_persistance.py:39-58); no Postgres ships in this image, but
PySpark bundles Apache Derby, so the real JDBC write path — Spark's
JDBC writer creating the table, executor-parallel appends, the epoch
stamp, and the reader-side dedup contract — is exercised against a
real database here, not a monkeypatched writer.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iot_sensor_data_pipeline_spark.sources.jdbc import jdbc_batch_sink

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture()
def derby_url(spark, tmp_path):
    # keep derby.log out of the repo root
    spark._jvm.System.setProperty("derby.stream.error.file", str(tmp_path / "derby.log"))
    return f"jdbc:derby:{tmp_path}/db;create=true"


def _read(spark, url, table):
    return (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", DERBY_DRIVER)
        .load()
    )


def test_jdbc_sink_end_to_end_epoch_idempotency(spark, derby_url):
    """Append two epochs, retry one: the raw table is at-least-once
    (duplicates present) but the documented reader contract — dedup on
    (epoch_id, key) — returns exactly-once rows."""
    batch1 = spark.createDataFrame(
        [(1, "temperature_alert", 93.5), (2, "humidity_alert", 18.0)],
        "alert_id int, alert_type string, value double",
    )
    batch2 = spark.createDataFrame(
        [(3, "battery_alert", 4.0)], "alert_id int, alert_type string, value double"
    )
    sink = jdbc_batch_sink(derby_url, "alerts", "app", "app", driver=DERBY_DRIVER)

    sink(batch1, epoch_id=1)
    sink(batch1, epoch_id=1)  # retried epoch (foreachBatch at-least-once)
    sink(batch2, epoch_id=2)

    raw = _read(spark, derby_url, "alerts")
    assert set(raw.columns) == {"alert_id", "alert_type", "value", "epoch_id"}
    assert raw.count() == 5  # 2 + 2 (retry) + 1: at-least-once visible

    deduped = raw.dropDuplicates(["epoch_id", "alert_id"])
    got = {(r.alert_id, r.alert_type, r.value, r.epoch_id) for r in deduped.collect()}
    assert got == {
        (1, "temperature_alert", 93.5, 1),
        (2, "humidity_alert", 18.0, 1),
        (3, "battery_alert", 4.0, 2),
    }


def test_jdbc_sink_no_stamp_matches_reference_shape(spark, derby_url):
    """stamp_epoch=False reproduces the reference's exact append shape
    (no extra column, duplicates on retry unrecoverable)."""
    batch = spark.createDataFrame([(1, 20.5)], "reading_id int, value double")
    sink = jdbc_batch_sink(
        derby_url, "readings", "app", "app", driver=DERBY_DRIVER, stamp_epoch=False
    )
    sink(batch, epoch_id=7)
    out = _read(spark, derby_url, "readings")
    assert out.columns == ["reading_id", "value"]
    assert out.count() == 1


def test_jdbc_roundtrip_types_survive(spark, derby_url):
    """Timestamps/strings/doubles round-trip through Derby unchanged —
    the typed path the aggregates table (K3) needs."""
    df = spark.createDataFrame(
        [("s1", 21.25, "2024-01-01 12:30:00")],
        "sensor_id string, avg_value double, window_start string",
    ).withColumn("window_start", F.col("window_start").cast("timestamp"))
    jdbc_batch_sink(derby_url, "aggs", "app", "app", driver=DERBY_DRIVER)(df, epoch_id=0)
    back = _read(spark, derby_url, "aggs")
    r = back.collect()[0]
    assert r.sensor_id == "s1" and r.avg_value == 21.25
    assert str(r.window_start) == "2024-01-01 12:30:00"
