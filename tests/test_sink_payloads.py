"""Sink payload pinning WITHOUT infrastructure (no Kafka broker, no
JDBC database ships in the test image): the exact (key, value) frame
the alert topic receives (reference alert_detector.py:216-241) and the
JDBC sink's epoch-stamp idempotency, captured via a recording writer
monkeypatched over DataFrame.write.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import DataFrame

from iot_sensor_data_pipeline_spark.functions.rules import detect_alerts
from iot_sensor_data_pipeline_spark.sources.jdbc import jdbc_batch_sink
from iot_sensor_data_pipeline_spark.sources.json_ingest import (
    ALERT_WIRE_FIELDS,
    alert_wire_frame,
)
from iot_sensor_data_pipeline_spark.sources.kafka import kafka_batch_sink
from tests.test_rules import reading


def _alerts(spark, rows):
    return detect_alerts(spark.createDataFrame(rows))


# --- the wire frame itself (pure DataFrame transform, no broker) -----


def test_alert_wire_frame_matches_reference_format(spark):
    """Key = sensor_id string; value = the reference's 12-field JSON
    with sensor_id ALSO in the payload, location/metadata re-nested,
    fields in the reference's order, and the database-only audit
    columns (resolved_at/created_at) absent."""
    wire = alert_wire_frame(_alerts(spark, [reading(0, 31.0)]))
    assert wire.columns == ["key", "value"]

    row = wire.collect()[0]
    assert row.key == "A_1_100_temperature"
    payload = json.loads(row.value)
    assert list(payload.keys()) == list(ALERT_WIRE_FIELDS)  # order pinned
    assert payload["sensor_id"] == row.key  # key duplicated in payload
    assert payload["location"] == {"building": "A", "floor": 1, "room": "100"}
    assert set(payload["metadata"]) == {"battery_level", "signal_strength"}
    assert payload["alert_type"] == "temperature_critical"
    assert payload["severity"] == "critical"
    assert payload["actual_value"] == 31.0
    assert payload["status"] == "active"
    assert "resolved_at" not in payload and "created_at" not in payload


def test_alert_wire_key_value_are_strings(spark):
    """Kafka writer contract: key and value must be string/binary."""
    wire = alert_wire_frame(_alerts(spark, [reading(0, 31.0)]))
    kinds = dict((f.name, f.dataType.simpleString()) for f in wire.schema.fields)
    assert kinds == {"key": "string", "value": "string"}


# --- recording writer: pins sink config/payload without executing ----


class _RecordingWriter:
    log: list = []

    def __init__(self, df: DataFrame):
        self.df = df
        self.fmt = None
        self.opts: dict = {}
        self.save_mode = None

    def format(self, fmt):
        self.fmt = fmt
        return self

    def option(self, k, v):
        self.opts[k] = v
        return self

    def mode(self, m):
        self.save_mode = m
        return self

    def save(self):
        _RecordingWriter.log.append(self)


@pytest.fixture()
def recorded_writes(monkeypatch, spark):
    # patch the CONCRETE DataFrame class (pyspark 4's classic.DataFrame
    # overrides the base's `write` property, so patching the re-export
    # in pyspark.sql would be shadowed)
    _RecordingWriter.log = []
    concrete = type(spark.range(1))
    monkeypatch.setattr(concrete, "write", property(_RecordingWriter))
    return _RecordingWriter.log


def test_kafka_batch_sink_write_config(spark, recorded_writes):
    wire = alert_wire_frame(_alerts(spark, [reading(0, 31.0)]))
    kafka_batch_sink("broker:9092", "iot-alert")(wire)

    (w,) = recorded_writes
    assert w.fmt == "kafka"
    assert w.opts == {
        "kafka.bootstrap.servers": "broker:9092",
        "topic": "iot-alert",
    }
    assert w.df.columns == ["key", "value"]


def test_jdbc_batch_sink_epoch_stamp_idempotent(spark, recorded_writes):
    """Replaying an epoch writes byte-identical (epoch_id, row) pairs —
    the dedup key downstream readers rely on (vs the reference's
    unstamped at-least-once append, data_persistance.py:39-58)."""
    alerts = _alerts(spark, [reading(0, 31.0), reading(1, 28.0)])
    stable = alerts.drop("created_at")  # current_timestamp() differs per run
    sink = jdbc_batch_sink("jdbc:postgresql://db/iot", "alerts", "u", "p")

    sink(stable, 7)
    sink(stable, 7)  # simulated foreachBatch replay of the same epoch

    first, second = recorded_writes
    for w in (first, second):
        assert w.fmt == "jdbc"
        assert w.save_mode == "append"
        assert w.opts["url"] == "jdbc:postgresql://db/iot"
        assert w.opts["dbtable"] == "alerts"
        assert w.opts["driver"] == "org.postgresql.Driver"
        assert "epoch_id" in w.df.columns

    rows1 = sorted(map(tuple, first.df.collect()), key=repr)
    rows2 = sorted(map(tuple, second.df.collect()), key=repr)
    assert rows1 == rows2  # replay-identical
    assert all(r[-1] == 7 for r in rows1)  # stamped with the epoch


def test_jdbc_batch_sink_distinct_epochs_distinguishable(spark, recorded_writes):
    alerts = _alerts(spark, [reading(0, 31.0)]).drop("created_at")
    sink = jdbc_batch_sink("jdbc:postgresql://db/iot", "alerts", "u", "p")
    sink(alerts, 1)
    sink(alerts, 2)
    stamps = [w.df.select("epoch_id").collect()[0][0] for w in recorded_writes]
    assert stamps == [1, 2]


def test_jdbc_batch_sink_stamp_disabled(spark, recorded_writes):
    alerts = _alerts(spark, [reading(0, 31.0)])
    jdbc_batch_sink("jdbc:postgresql://db/iot", "alerts", "u", "p", stamp_epoch=False)(
        alerts, 7
    )
    (w,) = recorded_writes
    assert "epoch_id" not in w.df.columns
