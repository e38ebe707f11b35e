"""Experiment (A/B) analysis at the randomization-unit grain — the
decision layer a behavioral pipeline feeds: funnels/retention describe
WHAT users did; this answers "did the treatment CHANGE it, and is the
difference bigger than noise".

Design rules that make it correct AND cross-engine exact:

- **Analyze at the UNIT grain.** Events within one user are correlated;
  a per-event comparison understates variance and over-calls wins (the
  classic A/B mistake). The metric aggregates per (variant, unit)
  FIRST; every statistic is over the unit-level values.
- **Welch z, not a pooled t.** Variants may have unequal variances and
  sizes; ``z = (mean_v - mean_c) / sqrt(var_c/n_c + var_v/n_v)`` makes
  no pooling assumption. The z-score is reported instead of a p-value
  on purpose: the normal CDF needs ``erf`` — a libm function whose
  last-bit behavior differs across engines — while +-1.96/2.58 cuts on
  z are exactly as decision-ready and keep the whole report pure
  arithmetic (sum/multiply/divide/sqrt are IEEE-deterministic), so a
  SQL oracle reproduces it digit for digit.
- **Variance via the sum-of-squares identity** computed with explicit
  ``sum``/``sum(m*m)`` expressions mirrored verbatim in the oracle;
  terminal rounding absorbs summation-order noise (the drift/AUC
  discipline).
- **Every metric rides ONE pass** (r12): an experiment read-out is
  rarely a single number — conversion plus several continuous metrics
  is the norm — and running the report per metric re-shuffles the
  event corpus N times. ``ab_test_report_multi`` aggregates ALL
  metrics inside the same (variant, unit) groupBy (one summed/flagged
  column per metric) and the same variant-grain rollup, then unpivots
  the variant-grain relation to long form via explode — the corpus is
  shuffled once no matter how many metrics the report carries.
- **Conversion metrics at the unit grain** are "did the unit EVER
  convert": the unit value is ``max(value > 0)`` in {0, 1}, its mean
  is the conversion rate, and the same Welch z applies — with the
  ``n-1`` sample variance of the 0/1 values this is the standard
  unpooled two-proportion z test, so no second code path (or oracle
  dialect) is needed.

Shuffle inventory: one (variant, unit) groupBy over the events (the
only corpus-scale shuffle, map-side combined, all metrics at once),
one variant-grain agg; the per-metric control scalars re-enter the
plan as literals (no join at all — see the in-function note); the
long-form unpivot explodes a variant-grain relation. No windows, no
UDFs.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "Metric",
    "ab_test_report",
    "ab_test_report_cuped",
    "ab_test_report_multi",
    "srm_check",
]


@dataclass(frozen=True)
class Metric:
    """One experiment metric: ``name`` labels the output row, ``col``
    is the event-level source column, ``kind`` the unit aggregation —
    ``'sum'`` (continuous: the unit's summed value, NULLs as 0) or
    ``'conversion'`` (binary: 1 iff ANY of the unit's events has
    ``col > 0``; booleans cast to 1.0/0.0, so a boolean flag column
    works directly)."""

    name: str
    col: str
    kind: str = "sum"

    def __post_init__(self) -> None:
        if self.kind not in ("sum", "conversion"):
            raise ValueError(
                f"Metric {self.name!r}: kind must be 'sum' or "
                f"'conversion', got {self.kind!r}"
            )

    def unit_expr(self, slot: str):
        v = F.col(self.col).cast("double")
        if self.kind == "sum":
            return F.coalesce(F.sum(v), F.lit(0.0)).alias(slot)
        return F.coalesce(
            F.max(F.when(v > 0, F.lit(1.0)).otherwise(F.lit(0.0))),
            F.lit(0.0),
        ).alias(slot)


def ab_test_report_multi(
    df: DataFrame,
    unit_col: str,
    variant_col: str,
    metrics,
    control: str,
    round_out: int = 6,
) -> DataFrame:
    """One row per (variant, metric): ``(variant, metric, n_units,
    mean, lift, rel_lift, z)`` — the same statistics as
    :func:`ab_test_report`, for every metric, from ONE corpus shuffle.
    ``metrics`` is a sequence of :class:`Metric` (duplicate names
    raise). Semantics per metric match the single-metric report
    exactly: rows with NULL unit or variant are excluded; ``lift`` /
    ``rel_lift`` / ``z`` are NULL on the control row; ``z`` is NULL
    for single-unit variants and when the Welch standard error is 0;
    ``rel_lift`` is NULL when the control mean is 0. ``n_units`` is
    the variant's exposed-unit count (shared by all metrics — it comes
    from the same grouping). Raises when ``control`` has no units."""
    metrics = list(metrics)
    if not metrics:
        raise ValueError("ab_test_report_multi: metrics must be non-empty")
    names = [m.name for m in metrics]
    if len(set(names)) != len(names):
        raise ValueError(
            f"ab_test_report_multi: duplicate metric names in {names}"
        )
    slots = [f"__m{i}" for i in range(len(metrics))]
    per_unit = (
        df.where(F.col(unit_col).isNotNull() & F.col(variant_col).isNotNull())
        .groupBy(variant_col, unit_col)
        .agg(*[m.unit_expr(s) for m, s in zip(metrics, slots)])
    )
    stats = per_unit.groupBy(variant_col).agg(
        F.count(F.lit(1)).alias("n_units"),
        *[F.sum(F.col(s)).alias(f"__s{i}") for i, s in enumerate(slots)],
        *[
            F.sum(F.col(s) * F.col(s)).alias(f"__ss{i}")
            for i, s in enumerate(slots)
        ],
    )
    n = F.col("n_units")

    def mean_i(i: int):
        return F.col(f"__s{i}") / n

    def var_i(i: int):
        return F.try_divide(
            F.col(f"__ss{i}") - F.col(f"__s{i}") * F.col(f"__s{i}") / n,
            (n - 1).cast("double"),
        )

    # the control stats are driver scalars (3 per metric); they
    # re-enter the plan as LITERALS (the drift reference-stats
    # discipline) — a crossJoin of the filtered-aggregate row would
    # plan as a BroadcastNestedLoopJoin (the optimizer cannot prove
    # that build side scalar) and a constant-key equi-join
    # constant-folds back into one; literals sidestep both. stats is
    # variant-grain (driver-small by definition of an experiment), so
    # the extra action costs one tiny job.
    ctrl_row = stats.where(F.col(variant_col) == control).first()
    if ctrl_row is None:
        raise ValueError(
            f"ab_test_report_multi: control variant {control!r} has no units"
        )
    nc = float(ctrl_row["n_units"])
    is_ctrl = F.col(variant_col) == control
    entries = []
    for i, m in enumerate(metrics):
        sc, ssc = ctrl_row[f"__s{i}"], ctrl_row[f"__ss{i}"]
        mc = F.lit(sc / nc)
        vc_val = (
            (ssc - sc * sc / nc) / (nc - 1.0) if nc > 1 else None
        )
        vc = (
            F.lit(vc_val)
            if vc_val is not None
            else F.lit(None).cast("double")
        )
        lift = mean_i(i) - mc
        se = F.sqrt(vc / F.lit(nc) + var_i(i) / n)
        entries.append(
            F.struct(
                F.lit(m.name).alias("metric"),
                F.round(mean_i(i), round_out).alias("mean"),
                F.when(~is_ctrl, F.round(lift, round_out)).alias("lift"),
                F.when(~is_ctrl, F.round(F.try_divide(lift, mc), round_out))
                .alias("rel_lift"),
                F.when(~is_ctrl & (se > 0), F.round(lift / se, round_out))
                .alias("z"),
            )
        )
    return stats.select(
        variant_col, "n_units", F.explode(F.array(*entries)).alias("__e")
    ).select(
        variant_col,
        F.col("__e.metric").alias("metric"),
        "n_units",
        F.col("__e.mean").alias("mean"),
        F.col("__e.lift").alias("lift"),
        F.col("__e.rel_lift").alias("rel_lift"),
        F.col("__e.z").alias("z"),
    )


def ab_test_report(
    df: DataFrame,
    unit_col: str,
    variant_col: str,
    metric_col: str,
    control: str,
    round_out: int = 6,
) -> DataFrame:
    """One row per variant: ``(variant, n_units, mean, lift, rel_lift,
    z)`` where ``mean`` is the unit-level mean of the summed metric,
    ``lift`` the absolute difference vs ``control``, ``rel_lift`` the
    ratio of that to the control mean (NULL when the control mean is
    0), and ``z`` the Welch z statistic (NULL for the control row, for
    single-unit variants, and when both variances are 0 — "no noise"
    has no z, and 0 would claim certainty). Rows whose unit or variant
    is NULL are excluded (no randomization unit — not analyzable);
    NULL metric values count as 0 for the unit sum (an exposed unit
    with no events is a zero, not a dropout — include such units in
    ``df`` as zero-metric rows when exposure logging is separate).
    Raises when ``control`` has no units. The single-metric special
    case of :func:`ab_test_report_multi` (same arithmetic, same plan
    shape minus the unpivot)."""
    return ab_test_report_multi(
        df, unit_col, variant_col,
        [Metric(metric_col, metric_col, "sum")], control, round_out,
    ).drop("metric")


def ab_test_report_cuped(
    df: DataFrame,
    unit_col: str,
    variant_col: str,
    metric_col: str,
    covariate_col: str,
    control: str,
    round_out: int = 6,
) -> DataFrame:
    """CUPED variance-reduced experiment read-out (Deng, Xu, Kohavi &
    Walker, WSDM 2013 — the industry-standard sensitivity boost): the
    unit metric is adjusted by a PRE-experiment covariate (typically
    the same metric over the pre-period, which treatment cannot have
    affected) before the Welch analysis runs. ``m_adj = m - theta *
    (x - mean_x)`` with ``theta = cov(m, x) / var(x)`` POOLED over all
    units — the population-level regression coefficient, computed once
    and applied identically to every arm, so the adjustment is
    treatment-independent and unbiased for the lift while shrinking
    the variance by the squared metric/covariate correlation (a 0.7
    correlation halves the sample a decision needs). Output matches
    :func:`ab_test_report` plus a constant ``theta`` column (after
    ``n_units`` — an analyst reads the adjustment strength right off
    the report); a zero-variance covariate degrades gracefully to
    ``theta = 0`` (the unadjusted analysis), never a division error.

    Scale shape: the SAME one corpus-scale (variant, unit) shuffle as
    the plain report — both the metric and the covariate sum inside
    it — followed by one variant-grain agg carrying six sums
    ``(n, sum m, sum x, sum m^2, sum x^2, sum m*x)``. Pooled theta and
    the control's ADJUSTED stats both derive algebraically from those
    sums (``sum(m_adj) = sum(m) - theta*sum(x) + n*theta*mean_x`` and
    the expanded square for ``sum(m_adj^2)``), so the unit relation is
    never rescanned for the adjustment and everything after the
    variant grain rides the plan as literals — no BNLJ, no second
    corpus pass, same discipline as :func:`ab_test_report_multi`. All
    arithmetic is sum/multiply/divide/sqrt, mirrored verbatim in the
    SQL oracle."""
    per_unit = (
        df.where(F.col(unit_col).isNotNull() & F.col(variant_col).isNotNull())
        .groupBy(variant_col, unit_col)
        .agg(
            F.coalesce(
                F.sum(F.col(metric_col).cast("double")), F.lit(0.0)
            ).alias("__m"),
            F.coalesce(
                F.sum(F.col(covariate_col).cast("double")), F.lit(0.0)
            ).alias("__x"),
        )
    )
    vstats = per_unit.groupBy(variant_col).agg(
        F.count(F.lit(1)).alias("n_units"),
        F.sum("__m").alias("__sm"),
        F.sum("__x").alias("__sx"),
        F.sum(F.col("__m") * F.col("__m")).alias("__smm"),
        F.sum(F.col("__x") * F.col("__x")).alias("__sxx"),
        F.sum(F.col("__m") * F.col("__x")).alias("__smx"),
    )
    # variant-grain: driver-small by definition of an experiment. One
    # collect funds pooled theta AND the control's adjusted scalars —
    # they re-enter the final plan as literals (no join of any kind)
    rows = sorted(vstats.collect(), key=lambda r: r[variant_col])
    if not any(r[variant_col] == control for r in rows):
        raise ValueError(
            f"ab_test_report_cuped: control variant {control!r} has no units"
        )
    nn = float(sum(r["n_units"] for r in rows))
    psm = sum(r["__sm"] for r in rows)
    psx = sum(r["__sx"] for r in rows)
    psxx = sum(r["__sxx"] for r in rows)
    psmx = sum(r["__smx"] for r in rows)
    xbar = psx / nn
    theta = 0.0
    if nn > 1:
        var_x = (psxx - psx * psx / nn) / (nn - 1.0)
        if var_x > 0:
            theta = ((psmx - psm * psx / nn) / (nn - 1.0)) / var_x
    c = theta * xbar

    def adj_sums(n, sm, sx, smm, sxx, smx):
        """(sum m_adj, sum m_adj^2) from the raw sums: m_adj =
        m - theta*x + c, so the square expands to six sum terms."""
        sadj = sm - theta * sx + n * c
        ssadj = (
            smm - 2.0 * theta * smx + theta * theta * sxx
            + 2.0 * c * sm - 2.0 * c * theta * sx + n * c * c
        )
        return sadj, ssadj

    ctrl = next(r for r in rows if r[variant_col] == control)
    nc = float(ctrl["n_units"])
    sc, ssc = adj_sums(
        nc, ctrl["__sm"], ctrl["__sx"], ctrl["__smm"], ctrl["__sxx"],
        ctrl["__smx"],
    )
    mc = F.lit(sc / nc)
    vc = (
        F.lit((ssc - sc * sc / nc) / (nc - 1.0))
        if nc > 1
        else F.lit(None).cast("double")
    )

    n = F.col("n_units")
    th = F.lit(theta)
    sadj = F.col("__sm") - th * F.col("__sx") + n * F.lit(c)
    ssadj = (
        F.col("__smm") - F.lit(2.0 * theta) * F.col("__smx")
        + F.lit(theta * theta) * F.col("__sxx")
        + F.lit(2.0 * c) * F.col("__sm")
        - F.lit(2.0 * c * theta) * F.col("__sx")
        + n * F.lit(c * c)
    )
    mean = sadj / n
    var = F.try_divide(ssadj - sadj * sadj / n, (n - 1).cast("double"))
    is_ctrl = F.col(variant_col) == control
    lift = mean - mc
    se = F.sqrt(vc / F.lit(nc) + var / n)
    return vstats.select(
        variant_col,
        "n_units",
        F.round(th, round_out).alias("theta"),
        F.round(mean, round_out).alias("mean"),
        F.when(~is_ctrl, F.round(lift, round_out)).alias("lift"),
        F.when(~is_ctrl, F.round(F.try_divide(lift, mc), round_out))
        .alias("rel_lift"),
        F.when(~is_ctrl & (se > 0), F.round(lift / se, round_out)).alias("z"),
    )


def srm_check(
    df: DataFrame,
    unit_col: str,
    variant_col: str,
    expected_shares: dict,
    round_out: int = 6,
) -> DataFrame:
    """Sample-ratio-mismatch guardrail — the FIRST thing to read on
    any experiment dashboard: when the realized unit split deviates
    from the configured allocation, the randomization (or the logging)
    is broken and every lift in the report is suspect (Fabijan et al.,
    KDD 2019, call SRM the most common invalidator in industry
    experimentation). One row per variant: ``(variant, n_units,
    expected_share, observed_share, chi2_term)`` plus each row carries
    the experiment-wide ``chi2`` statistic (sum of
    ``(observed - expected)^2 / expected`` unit counts) and ``df_chi``
    (variants - 1); compare chi2 against the chi-square critical value
    for that df (3.841 at df=1/alpha=.05; 5.991 at df=2) — the
    statistic is reported instead of a p-value for the same
    erf-free/cross-engine-exactness reason the Welch z is.

    Raises when ``expected_shares`` misses an observed variant (an
    UNKNOWN arm is itself an SRM-grade bug), when shares don't sum to
    ~1, or when any share is <= 0. Unobserved expected variants count
    as observed 0 (a dead arm is exactly what this must flag).
    Scale shape: the one (variant, unit) distinct + a variant-grain
    agg; the expected table enters as literal rows."""
    if not expected_shares:
        raise ValueError("srm_check: expected_shares must be non-empty")
    if any(s <= 0 for s in expected_shares.values()):
        raise ValueError("srm_check: every expected share must be > 0")
    total_share = sum(expected_shares.values())
    if abs(total_share - 1.0) > 1e-6:  # 1/3+1/3+1/3 != 1.0 in fp
        raise ValueError(
            f"srm_check: expected_shares sum to {total_share}, not 1"
        )
    counts = (
        df.where(F.col(unit_col).isNotNull() & F.col(variant_col).isNotNull())
        .select(variant_col, unit_col)
        .distinct()
        .groupBy(variant_col)
        .agg(F.count(F.lit(1)).alias("n_units"))
    )
    rows = counts.collect()  # variant-grain: driver-small
    unknown = sorted(
        r[variant_col] for r in rows if r[variant_col] not in expected_shares
    )
    if unknown:
        raise ValueError(
            f"srm_check: observed variants {unknown} have no expected "
            "share — an unknown arm is an assignment bug, not a zero"
        )
    observed = {r[variant_col]: r["n_units"] for r in rows}
    n_total = float(sum(observed.values()))
    out_rows = []
    chi2 = 0.0
    for v in sorted(expected_shares):
        exp_n = expected_shares[v] * n_total
        obs_n = float(observed.get(v, 0))
        term = (obs_n - exp_n) * (obs_n - exp_n) / exp_n if exp_n > 0 else 0.0
        chi2 += term
        out_rows.append((v, int(obs_n), expected_shares[v], term))
    spark = df.sparkSession
    return spark.createDataFrame(
        [
            (
                v, n, round(es, round_out),
                round(n / n_total, round_out) if n_total else None,
                round(term, round_out),
                round(chi2, round_out),
                len(expected_shares) - 1,
            )
            for v, n, es, term in out_rows
        ],
        "variant string, n_units long, expected_share double, "
        "observed_share double, chi2_term double, chi2 double, df_chi long",
    )
