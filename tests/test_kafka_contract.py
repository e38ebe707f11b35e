"""Golden contract tests for the Kafka wrapper options (VERDICT r04 #7).

No broker or spark-sql-kafka jar exists in this sandbox, so S1-S3's
physical read stays untestable — but the OPTION CONSTRUCTION is where a
silent regression would hurt (a flipped failOnDataLoss or a dropped
maxOffsetsPerTrigger ships data loss / unbounded first batches to every
deployment). These goldens pin the full option dict for the three
reference jobs' subscriptions:

- persistence  (reference data_persistance.py:68-73)
- alerts       (reference alert_detector.py:71-79)
- aggregator   (reference data_agregator.py:57-62)

All three reference jobs subscribe to the same readings topic
(``iot-sensor-data``, env ``KAFKA_TOPIC_IOT_SENSOR`` /  a literal in
alert_detector). The engine's wrapper deliberately HARDENS two options
the reference gets wrong (SURVEY.md §3.3): ``startingOffsets`` is
``earliest`` (the reference's ``latest`` + no checkpoint loses data
across restarts) and ``maxOffsetsPerTrigger`` bounds the first batch
(the reference's unbounded backlog replay). These goldens pin the
HARDENED values on purpose — a drift back to the reference's defaults
is the regression class this file exists to catch.
"""

from __future__ import annotations

import pytest

from iot_sensor_data_pipeline_spark.sources.kafka import kafka_reader_options

#: the one hardened option set all three reference subscriptions map to
GOLDEN_READINGS_SUBSCRIPTION = {
    "kafka.bootstrap.servers": "broker:9092",
    "subscribe": "iot-sensor-data",
    "startingOffsets": "earliest",
    "failOnDataLoss": "false",
    "maxOffsetsPerTrigger": "100000",
}


@pytest.mark.parametrize("job", ["persistence", "alerts", "aggregator"])
def test_reference_job_subscription_golden(job):
    """Each reference job's subscription builds EXACTLY the golden
    dict — full equality, so an added/renamed/dropped key fails too."""
    assert (
        kafka_reader_options("broker:9092", "iot-sensor-data")
        == GOLDEN_READINGS_SUBSCRIPTION
    )


def test_option_values_are_strings():
    """DataStreamReader.options() stringifies loosely; the wrapper must
    emit proper lowercase-bool / decimal strings itself so the physical
    source config is deterministic."""
    opts = kafka_reader_options(
        "b:9092", "t", max_offsets_per_trigger=5, fail_on_data_loss=True
    )
    assert opts["failOnDataLoss"] == "true"
    assert opts["maxOffsetsPerTrigger"] == "5"
    assert all(isinstance(v, str) for v in opts.values())


def test_unbounded_trigger_omits_key_entirely():
    """``max_offsets_per_trigger=None`` must OMIT the key (Kafka source
    treats presence as a bound; an empty/zero string would error or
    stall the stream)."""
    opts = kafka_reader_options("b:9092", "t", max_offsets_per_trigger=None)
    assert "maxOffsetsPerTrigger" not in opts
    assert opts == {
        "kafka.bootstrap.servers": "b:9092",
        "subscribe": "t",
        "startingOffsets": "earliest",
        "failOnDataLoss": "false",
    }


def test_starting_offsets_override():
    """Operators replaying a bounded window pass explicit offsets
    through verbatim (JSON offset ranges are valid values here)."""
    explicit = '{"iot-sensor-data":{"0":42}}'
    opts = kafka_reader_options("b:9092", "iot-sensor-data", starting_offsets=explicit)
    assert opts["startingOffsets"] == explicit


def test_main_wiring_uses_alert_topic_for_sink():
    """main.py's env surface mirrors the reference deployment: readings
    from KAFKA_TOPIC (default iot-sensor-data), alerts to
    KAFKA_ALERT_TOPIC (default iot-alert — reference
    alert_detector.py:250 hardcodes it)."""
    import inspect

    from iot_sensor_data_pipeline_spark import main

    src = inspect.getsource(main)
    assert '"KAFKA_TOPIC", "iot-sensor-data"' in src
    assert '"KAFKA_ALERT_TOPIC", "iot-alert"' in src
