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


def test_multi_metric_single_pass_goldens(spark):
    """r12 (VERDICT r11 task 6): a conversion and a continuous metric
    in one report — hand-computed conversion rates and a Welch z that
    equals the unpooled two-proportion z on the 0/1 unit values."""
    from iot_sensor_data_pipeline_spark.operators.experiment import (
        Metric,
        ab_test_report_multi,
    )

    rows = [
        # control: u1 converts (two events, one >0), u2 never, u3 never
        (1, "control", 1.0, 0.0), (1, "control", 2.0, 1.0),
        (2, "control", 3.0, 0.0), (3, "control", 5.0, 0.0),
        # treatment: u4 and u5 convert, u6 not
        (4, "t", 4.0, 1.0), (5, "t", 6.0, 1.0), (6, "t", 8.0, 0.0),
    ]
    df = spark.createDataFrame(rows, "u long, variant string, m double, c double")
    out = ab_test_report_multi(
        df, "u", "variant",
        [Metric("spend", "m", "sum"), Metric("conv", "c", "conversion")],
        "control",
    ).collect()
    got = {(r.variant, r.metric): r for r in out}
    assert len(got) == 4  # 2 variants x 2 metrics
    # continuous: control unit sums {3,3,5}; treatment {4,6,8}
    assert got[("control", "spend")].mean == round(11.0 / 3, 6)
    assert got[("t", "spend")].mean == 6.0
    # conversion: control 1/3 convert, treatment 2/3
    cc, tc = got[("control", "conv")], got[("t", "conv")]
    assert cc.mean == round(1.0 / 3, 6) and tc.mean == round(2.0 / 3, 6)
    assert tc.lift == round(1.0 / 3, 6) and tc.rel_lift == 1.0
    # Welch z == unpooled two-proportion z with n-1 sample variances:
    # var_c = (1 - 1/3)/2 = 1/3; var_t = (2 - 4/3)/2 = 1/3
    se = math.sqrt((1.0 / 3) / 3 + (1.0 / 3) / 3)
    assert tc.z == round((1.0 / 3) / se, 6)
    # n_units shared across metrics (same grouping)
    assert cc.n_units == 3 and tc.n_units == 3
    # control rows never carry lift/z
    assert cc.lift is None and cc.z is None


def test_multi_metric_matches_single_metric_and_plan(spark):
    """Each metric's rows equal the single-metric report run alone,
    and the multi plan carries NO extra exchange — N metrics, one
    corpus shuffle."""
    from iot_sensor_data_pipeline_spark.operators.experiment import (
        Metric,
        ab_test_report_multi,
    )

    rows = [
        (u, "control" if u % 2 == 0 else "t", float(u % 7), float(u % 3))
        for u in range(1, 200) for _ in range(2)
    ]
    df = spark.createDataFrame(rows, "u long, variant string, m double, c double")
    multi = ab_test_report_multi(
        df, "u", "variant",
        [Metric("m_sum", "m"), Metric("c_conv", "c", "conversion")],
        "control",
    )
    single = ab_test_report(df, "u", "variant", "m", "control")
    m_rows = {
        r.variant: (r.n_units, r.mean, r.lift, r.rel_lift, r.z)
        for r in multi.where(multi.metric == "m_sum").collect()
    }
    s_rows = {
        r.variant: (r.n_units, r.mean, r.lift, r.rel_lift, r.z)
        for r in single.collect()
    }
    assert m_rows == s_rows
    def exchanges(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan  # literals, no join
        # an executed AQE plan prints Final + Initial sections — count
        # the physical exchanges of the (first) effective section only
        return plan.split("== Initial Plan ==")[0].count("Exchange")

    assert exchanges(multi) == exchanges(single) == 2


def test_multi_metric_validation(spark):
    from iot_sensor_data_pipeline_spark.operators.experiment import (
        Metric,
        ab_test_report_multi,
    )

    df = spark.createDataFrame([(1, "control", 1.0)], "u long, variant string, m double")
    with pytest.raises(ValueError, match="kind"):
        Metric("x", "m", "median")
    with pytest.raises(ValueError, match="duplicate"):
        ab_test_report_multi(
            df, "u", "variant", [Metric("a", "m"), Metric("a", "m")], "control"
        )
    with pytest.raises(ValueError, match="non-empty"):
        ab_test_report_multi(df, "u", "variant", [], "control")
    with pytest.raises(ValueError, match="control"):
        ab_test_report_multi(
            df, "u", "variant", [Metric("a", "m")], "nope"
        )


def test_cuped_python_mirror_and_theta(spark):
    """r12 CUPED: pooled theta = cov(m,x)/var(x) over the unit values,
    adjusted means/variances via the algebraic sum identities — the
    report matches an independent python computation exactly."""
    from iot_sensor_data_pipeline_spark.operators.experiment import (
        ab_test_report_cuped,
    )

    units = {
        ("control", 1): (2.0, 1.0), ("control", 2): (4.0, 3.0),
        ("t", 3): (6.0, 2.0), ("t", 4): (8.0, 4.0), ("t", 5): (10.0, 6.0),
    }
    rows = [(u, v, m, x) for (v, u), (m, x) in units.items()]
    df = spark.createDataFrame(rows, "u long, variant string, m double, x double")
    got = {
        r.variant: r
        for r in ab_test_report_cuped(
            df, "u", "variant", "m", "x", "control"
        ).collect()
    }

    ms = [m for m, _ in units.values()]
    xs = [x for _, x in units.values()]
    N = len(ms)
    xbar = sum(xs) / N
    var_x = (sum(x * x for x in xs) - sum(xs) ** 2 / N) / (N - 1)
    cov = (sum(m * x for m, x in zip(ms, xs))
           - sum(ms) * sum(xs) / N) / (N - 1)
    theta = cov / var_x

    def arm(v):
        vals = [m - theta * (x - xbar)
                for (vv, _u), (m, x) in units.items() if vv == v]
        n = len(vals)
        mean = sum(vals) / n
        var = (sum(a * a for a in vals) - sum(vals) ** 2 / n) / (n - 1)
        return n, mean, var

    nc, mc, vc = arm("control")
    nt, mt, vt = arm("t")
    assert got["control"].theta == round(theta, 6)
    assert got["control"].mean == round(mc, 6)
    assert got["t"].mean == round(mt, 6)
    assert got["t"].lift == round(mt - mc, 6)
    z = (mt - mc) / math.sqrt(vc / nc + vt / nt)
    assert got["t"].z == round(z, 6)
    assert got["control"].lift is None and got["control"].z is None


def test_cuped_degrades_to_plain_report(spark):
    """A zero-variance covariate gives theta = 0 and the UNADJUSTED
    analysis — never a division error."""
    from iot_sensor_data_pipeline_spark.operators.experiment import (
        ab_test_report_cuped,
    )

    rows = [
        (1, "control", 1.0, 5.0), (2, "control", 3.0, 5.0),
        (3, "t", 4.0, 5.0), (4, "t", 6.0, 5.0), (5, "t", 8.0, 5.0),
    ]
    df = spark.createDataFrame(rows, "u long, variant string, m double, x double")
    cuped = {
        r.variant: r
        for r in ab_test_report_cuped(
            df, "u", "variant", "m", "x", "control"
        ).collect()
    }
    plain = {
        r.variant: r
        for r in ab_test_report(df, "u", "variant", "m", "control").collect()
    }
    assert cuped["t"].theta == 0.0
    for v in ("control", "t"):
        for fld in ("n_units", "mean", "lift", "rel_lift", "z"):
            assert getattr(cuped[v], fld) == getattr(plain[v], fld), (v, fld)

    with pytest.raises(ValueError, match="control"):
        ab_test_report_cuped(df, "u", "variant", "m", "x", "nope")


def test_srm_check_goldens_and_guards(spark):
    """r12 SRM guardrail: chi-square statistic over unit counts vs the
    configured allocation; dead arms count 0, unknown arms raise."""
    from iot_sensor_data_pipeline_spark.operators.experiment import srm_check

    # 60/40 observed vs 50/50 expected over 100 units
    rows = [(u, "a" if u < 60 else "b", 1.0) for u in range(100)]
    # duplicate events for some units: the check is UNIT-grain
    rows += [(0, "a", 1.0), (99, "b", 1.0)]
    df = spark.createDataFrame(rows, "u long, variant string, m double")
    got = {r.variant: r for r in
           srm_check(df, "u", "variant", {"a": 0.5, "b": 0.5}).collect()}
    assert got["a"].n_units == 60 and got["b"].n_units == 40
    assert got["a"].observed_share == 0.6
    # chi2 = (60-50)^2/50 + (40-50)^2/50 = 4.0 (> 3.841 -> SRM!)
    assert got["a"].chi2 == 4.0 and got["a"].df_chi == 1
    assert got["a"].chi2_term == 2.0 and got["b"].chi2_term == 2.0

    # dead arm: expected but unobserved -> counted as 0, huge chi2
    got = {r.variant: r for r in
           srm_check(df, "u", "variant",
                     {"a": 0.4, "b": 0.4, "dead": 0.2}).collect()}
    assert got["dead"].n_units == 0 and got["dead"].chi2_term > 0
    assert got["dead"].df_chi == 2

    # unknown observed arm raises; bad shares raise
    with pytest.raises(ValueError, match="no expected"):
        srm_check(df, "u", "variant", {"a": 1.0})
    with pytest.raises(ValueError, match="sum"):
        srm_check(df, "u", "variant", {"a": 0.5, "b": 0.3})
    with pytest.raises(ValueError, match="> 0"):
        srm_check(df, "u", "variant", {"a": 1.5, "b": -0.5})
    with pytest.raises(ValueError, match="non-empty"):
        srm_check(df, "u", "variant", {})


def test_new_experiment_queries_plan_shapes(spark):
    """The r12 registered experiment queries keep the literal-injection
    discipline: no BroadcastNestedLoopJoin, no CartesianProduct in any
    executed plan (the control/pooled scalars ride as literals)."""
    from iot_sensor_data_pipeline_spark.plans import EXTENDED_REGISTRY

    sf = "/root/testdata/sf0.001"
    for name in ("events_ab_conversion_multi", "events_ab_cuped",
                 "events_srm_check"):
        plan = (
            EXTENDED_REGISTRY[name].fn(spark, sf)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "CartesianProduct" not in plan, name
