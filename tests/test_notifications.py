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


class _FakeSMTP:
    """Records the smtplib.SMTP call sequence (context-manager style,
    as smtp_transport uses it)."""

    instances: list = []

    def __init__(self, host, port, timeout=None):
        self.host, self.port = host, port
        self.calls: list = []
        _FakeSMTP.instances.append(self)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.calls.append(("quit",))
        return False

    def starttls(self):
        self.calls.append(("starttls",))

    def login(self, user, password):
        self.calls.append(("login", user, password))

    def sendmail(self, sender, recipients, payload):
        self.calls.append(("sendmail", sender, tuple(recipients)))
        self.payload = payload


def _patched_send(monkeypatch, **kw):
    import smtplib

    from iot_sensor_data_pipeline_spark.streaming.notifications import smtp_transport

    _FakeSMTP.instances = []
    monkeypatch.setattr(smtplib, "SMTP", _FakeSMTP)
    send = smtp_transport("mail.example.com", 587, "iot@example.com", **kw)
    send("subj", "body")
    return _FakeSMTP.instances[-1]


def test_smtp_starttls_login_when_credentials_set(monkeypatch):
    """Credentials configured -> STARTTLS upgrade then LOGIN before
    sendmail (the reference's port-587 deployment,
    gestionnaire_mail.py:22-26)."""
    smtp = _patched_send(
        monkeypatch, recipients=["ops@example.com"], username="u", password="p"
    )
    assert smtp.calls[:3] == [
        ("starttls",),
        ("login", "u", "p"),
        ("sendmail", "iot@example.com", ("ops@example.com",)),
    ]


def test_smtp_plain_relay_without_credentials(monkeypatch):
    """No credentials -> plain relay: neither starttls nor login."""
    smtp = _patched_send(monkeypatch, recipients=["ops@example.com"])
    ops = [c[0] for c in smtp.calls]
    assert "starttls" not in ops and "login" not in ops
    assert ops[0] == "sendmail"


def test_smtp_forced_tls_without_login(monkeypatch):
    """use_tls=True with no credentials -> starttls but no login."""
    smtp = _patched_send(monkeypatch, recipients=["ops@example.com"], use_tls=True)
    ops = [c[0] for c in smtp.calls]
    assert ops[:2] == ["starttls", "sendmail"]


def test_smtp_transport_rejects_empty_recipients():
    import pytest

    from iot_sensor_data_pipeline_spark.streaming.notifications import smtp_transport

    with pytest.raises(ValueError, match="recipient"):
        smtp_transport("mail.example.com", 25, "iot@example.com", recipients=["", None])


def test_main_exits_on_empty_smtp_recipients(monkeypatch, spark):
    """main.py's env validation: SMTP_HOST set but SMTP_RECIPIENTS
    empty/whitespace -> sys.exit before any query starts."""
    import pytest

    from iot_sensor_data_pipeline_spark import main as main_mod

    for k in ("SMTP_USER", "SMTP_PASS", "POSTGRES_URL", "MYSQL_URL"):
        monkeypatch.delenv(k, raising=False)
    monkeypatch.setenv("KAFKA_BOOTSTRAP_SERVER", "localhost:9092")
    monkeypatch.setenv("SMTP_HOST", "mail.example.com")
    monkeypatch.setenv("SMTP_RECIPIENTS", " , ,")
    with pytest.raises(SystemExit, match="SMTP_RECIPIENTS"):
        main_mod.main()
