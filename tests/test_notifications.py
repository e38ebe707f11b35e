"""Notification sink: severity filter, formatting, overflow cap."""

from __future__ import annotations

import datetime as dt

from iot_sensor_data_pipeline_spark.functions.rules import detect_alerts
from iot_sensor_data_pipeline_spark.streaming.notifications import notification_sink
from tests.test_rules import reading


def _alerts_df(spark, rows):
    return detect_alerts(spark.createDataFrame(rows))


def test_notification_filter_format(spark):
    sent = []
    sink = notification_sink(lambda subj, body: sent.append((subj, body)))
    sink(
        _alerts_df(
            spark,
            [
                reading(0, 31.0),                  # critical -> notify
                reading(1, 28.0),                  # warning -> notify
                reading(2, 22.0),                  # no alert -> absent pre-sink
            ],
        )
    )
    assert len(sent) == 2
    subj_crit = [s for s, _ in sent if "CRITICAL" in s]
    assert subj_crit and "A_1_100_temperature" in subj_crit[0]
    body = dict(sent)["[IoT CRITICAL] A_1_100_temperature: temperature_critical"]
    assert "Valeur mesurée : 31.0 (seuil : 30.0)" in body
    assert "bâtiment A, étage 1, salle 100" in body


def test_notification_includes_low_battery_line(spark):
    sent = []
    notification_sink(lambda s, b: sent.append(b))(_alerts_df(spark, [reading(0, 22.0, battery=15)]))
    assert len(sent) == 1 and "Batterie : 15%" in sent[0]


def test_notification_overflow_cap(spark):
    sent = []
    sink = notification_sink(lambda s, b: sent.append(s), max_per_batch=3)
    sink(_alerts_df(spark, [reading(i, 31.0) for i in range(10)]))
    assert len(sent) == 4  # 3 alerts + 1 overflow summary
    assert sent[-1] == "[IoT] alert volume overflow"
