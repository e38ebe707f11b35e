"""ab_test_report (operators/experiment.py): unit-grain Welch z lift
analysis — hand-computed goldens, per-event-vs-per-unit correctness,
NULL/degenerate semantics."""

from __future__ import annotations

import math

import pytest

from iot_sensor_data_pipeline_spark.operators.experiment import ab_test_report


def _report(spark, rows):
    df = spark.createDataFrame(rows, "u long, variant string, m double")
    return {
        r.variant: r
        for r in ab_test_report(df, "u", "variant", "m", "control").collect()
    }


def test_hand_computed_welch_z(spark):
    """control units: {1,3} mean 2 var 2; treatment: {4,6,8} mean 6
    var 4 -> lift 4, rel_lift 2, z = 4/sqrt(2/2 + 4/3)."""
    got = _report(spark, [
        (1, "control", 1.0), (2, "control", 3.0),
        (3, "t", 4.0), (4, "t", 6.0), (5, "t", 8.0),
    ])
    c, t = got["control"], got["t"]
    assert (c.n_units, c.mean, c.lift, c.z) == (2, 2.0, None, None)
    assert (t.n_units, t.mean, t.lift, t.rel_lift) == (3, 6.0, 4.0, 2.0)
    assert t.z == round(4.0 / math.sqrt(2.0 / 2 + 4.0 / 3), 6)


def test_unit_grain_not_event_grain(spark):
    """Multiple events of one user SUM into one unit value — a
    per-event analysis would treat them as independent samples and
    understate the variance."""
    got = _report(spark, [
        (1, "control", 1.0), (1, "control", 1.0),  # one unit, m=2
        (2, "control", 2.0),
        (3, "t", 5.0), (4, "t", 7.0),
    ])
    assert got["control"].n_units == 2 and got["control"].mean == 2.0
    assert got["t"].lift == 4.0


def test_degenerate_semantics(spark):
    # zero-variance arms: se == 0 -> z NULL (never fake certainty)
    got = _report(spark, [
        (1, "control", 2.0), (2, "control", 2.0),
        (3, "t", 5.0), (4, "t", 5.0),
    ])
    assert got["t"].lift == 3.0 and got["t"].z is None
    # single-unit treatment: variance undefined -> z NULL, lift reported
    got = _report(spark, [
        (1, "control", 1.0), (2, "control", 3.0), (3, "t", 9.0),
    ])
    assert got["t"].lift == 7.0 and got["t"].z is None
    # NULL unit/variant rows are excluded; NULL metric counts as 0
    got = _report(spark, [
        (1, "control", 1.0), (2, "control", None), (None, "t", 9.0),
        (3, "t", 4.0), (4, "t", 8.0),
    ])
    assert got["control"].n_units == 2 and got["control"].mean == 0.5
    assert got["t"].n_units == 2
    # missing control fails loudly
    df = spark.createDataFrame([(1, "t", 1.0)], "u long, variant string, m double")
    with pytest.raises(ValueError, match="control"):
        ab_test_report(df, "u", "variant", "m", "control")
