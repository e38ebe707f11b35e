"""Skew mitigation: salted joins and two-phase salted aggregation.

AQE's skew-join handling (on in session.py) covers sort-merge joins at
runtime; these operators are the EXPLICIT tools for cases AQE can't
fix — a broadcast-ineligible join with one pathological key, or an
aggregation whose hot key overwhelms a single reducer.

- ``salted_join``: left rows get a random-but-deterministic salt in
  [0, n); the right side is replicated n times (one per salt value);
  the join key becomes (key, salt), spreading a hot key over n tasks.
  Right-side replication cost: |right| * n — use for small-ish right
  sides or pre-filtered hot keys.
- ``salted_agg``: phase 1 aggregates on (keys, salt) — the hot key
  splits across n partial groups; phase 2 re-aggregates on keys.
  Works for any algebraic aggregate (sum/count/min/max); avg is
  composed as sum/count.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the key salted n ways (hot-key spreading).

    Only left-preserving joins are legal: the right side is replicated
    per salt value, so right/full-outer would emit every unmatched
    right row n_salts times.

    The salt is a deterministic function of the whole left row (not a
    random/partition-dependent id): task retries recompute the SAME
    salt, so no rows migrate between (key, salt) buckets mid-shuffle —
    the classic nondeterministic-shuffle-key hazard.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(f"salted_join supports left-preserving joins only, got {how!r}")
    on = list(on)
    salted_left = left.withColumn(
        "__salt", F.pmod(F.hash(*left.columns), F.lit(n_salts))
    )
    salt_values = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("__salt")
    salted_right = right.select("*", salt_values)
    out = salted_left.join(salted_right, [*on, "__salt"], how)
    return out.drop("__salt")


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str] = (),
    count: bool = True,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation: (keys, salt) partials -> keys totals.

    Output: keys + ``sum_{c}`` per sum column + ``n`` when ``count``.
    """
    keys = list(keys)
    salted = df.withColumn(
        "__salt", F.pmod(F.hash(*df.columns), F.lit(n_salts))
    )
    partial_aggs = [F.sum(c).alias(f"__p_sum_{c}") for c in sum_cols]
    if count:
        partial_aggs.append(F.count(F.lit(1)).alias("__p_n"))
    partial = salted.groupBy(*keys, "__salt").agg(*partial_aggs)

    final_aggs = [F.sum(f"__p_sum_{c}").alias(f"sum_{c}") for c in sum_cols]
    if count:
        final_aggs.append(F.sum("__p_n").alias("n"))
    return partial.groupBy(*keys).agg(*final_aggs)
