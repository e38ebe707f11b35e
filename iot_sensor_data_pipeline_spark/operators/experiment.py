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

Shuffle inventory: one (variant, unit) groupBy over the events (the
only corpus-scale shuffle, map-side combined), one variant-grain agg;
the three control scalars re-enter the plan as literals (no join at
all — see the in-function note). No windows, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["ab_test_report"]


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
    Raises when ``control`` has no units."""
    per_unit = (
        df.where(F.col(unit_col).isNotNull() & F.col(variant_col).isNotNull())
        .groupBy(variant_col, unit_col)
        .agg(
            F.coalesce(
                F.sum(F.col(metric_col).cast("double")), F.lit(0.0)
            ).alias("__m")
        )
    )
    stats = per_unit.groupBy(variant_col).agg(
        F.count(F.lit(1)).alias("n_units"),
        F.sum("__m").alias("__s"),
        F.sum(F.col("__m") * F.col("__m")).alias("__ss"),
    )
    mean = F.col("__s") / F.col("n_units")
    var = F.try_divide(
        F.col("__ss") - F.col("__s") * F.col("__s") / F.col("n_units"),
        (F.col("n_units") - 1).cast("double"),
    )
    stats = stats.select(
        variant_col, "n_units", mean.alias("__mean"), var.alias("__var")
    )
    # the control stats are THREE driver scalars; they re-enter the
    # plan as literals (the drift reference-stats discipline) — a
    # crossJoin of the filtered-aggregate row would plan as a
    # BroadcastNestedLoopJoin (the optimizer cannot prove that build
    # side scalar) and a constant-key equi-join constant-folds back
    # into one; literals sidestep both. stats is variant-grain
    # (driver-small by definition of an experiment), so the extra
    # action costs one tiny job.
    ctrl_row = stats.where(F.col(variant_col) == control).first()
    if ctrl_row is None:
        raise ValueError(
            f"ab_test_report: control variant {control!r} has no units"
        )
    nc = F.lit(float(ctrl_row["n_units"]))
    mc = F.lit(ctrl_row["__mean"])
    vc = F.lit(ctrl_row["__var"]) if ctrl_row["__var"] is not None else (
        F.lit(None).cast("double")
    )
    joined = stats
    is_ctrl = F.col(variant_col) == control
    lift = F.col("__mean") - mc
    se = F.sqrt(vc / nc + F.col("__var") / F.col("n_units"))
    return joined.select(
        variant_col,
        "n_units",
        F.round(F.col("__mean"), round_out).alias("mean"),
        F.when(~is_ctrl, F.round(lift, round_out)).alias("lift"),
        F.when(~is_ctrl, F.round(F.try_divide(lift, mc), round_out))
        .alias("rel_lift"),
        F.when(
            ~is_ctrl & (se > 0), F.round(lift / se, round_out)
        ).alias("z"),
    )
