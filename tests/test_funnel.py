"""Funnel analysis (operators/funnel.py): latest-anchor matching
semantics, the greedy-trap case, plan shape, and a DuckDB differential
on the events table."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iot_sensor_data_pipeline_spark.operators.funnel import (
    funnel_counts,
    funnel_stages,
)


def _events(spark, rows):
    return spark.createDataFrame(rows, "user_id long, event_type string, ts double")


def test_basic_sequential_funnel(spark):
    rows = [
        (1, "A", 0.0), (1, "B", 5.0), (1, "C", 9.0),   # completes
        (2, "A", 0.0), (2, "C", 1.0),                   # skips B: stage 1
        (3, "B", 0.0), (3, "C", 1.0),                   # never A: stage 0... no rows? has relevant events -> stage 0
        (4, "A", 0.0), (4, "B", 100.0),                 # B too late under budget
    ]
    out = {r.user: r for r in funnel_stages(_events(spark, rows), ["A", "B", "C"], within_seconds=10).collect()}
    assert out[1].stage_reached == 3 and out[1].completed
    assert out[2].stage_reached == 1 and not out[2].completed
    assert out[3].stage_reached == 0
    assert out[4].stage_reached == 1


def test_latest_anchor_beats_greedy(spark):
    """A@0, A@50, B@60 with budget 20: greedy first-match anchors on
    A@0 and times out; latest-anchor completes via A@50."""
    rows = [(1, "A", 0.0), (1, "A", 50.0), (1, "B", 60.0)]
    out = funnel_stages(_events(spark, rows), ["A", "B"], within_seconds=20).collect()
    assert out[0].stage_reached == 2 and out[0].completed


def test_unbounded_budget_and_counts(spark):
    rows = [
        (1, "A", 0.0), (1, "B", 1e6),
        (2, "A", 0.0),
        (3, "A", 0.0), (3, "B", 1.0),
    ]
    stages = funnel_stages(_events(spark, rows), ["A", "B"])
    counts = {r.stage: r.n_users for r in funnel_counts(stages, 2).collect()}
    assert counts == {1: 3, 2: 2}


def test_funnel_rejects_empty_steps(spark):
    with pytest.raises(ValueError, match="non-empty"):
        funnel_stages(_events(spark, [(1, "A", 0.0)]), [])


def test_funnel_single_exchange_no_python(spark):
    df = _events(spark, [(1, "A", 0.0)])
    plan = (
        funnel_stages(df, ["A", "B"], within_seconds=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1  # the user groupBy only
    assert "EvalPython" not in plan


def test_funnel_differential_vs_duckdb_on_events(spark, sf_dir_mid):
    """3-step funnel over the real events table vs a per-step
    latest-anchor chain in DuckDB SQL (ASOF-style correlated maxes)."""
    from tests.oracle_harness import compare_query

    within = 600.0  # 10 minutes between steps
    oracle = f"""
WITH e AS (
  SELECT user_id, event_type, epoch(CAST(ts AS TIMESTAMP)) AS t FROM events
  WHERE event_type IN ('view', 'click', 'purchase')
), s1 AS (  -- latest completion time of prefix [view] per user, per anchor event
  SELECT user_id, max(t) AS t1 FROM e WHERE event_type = 'view' GROUP BY user_id
), s2 AS (  -- latest click within budget of ANY view before it
  SELECT c.user_id, max(c.t) AS t2
  FROM e c
  WHERE c.event_type = 'click'
    AND EXISTS (SELECT 1 FROM e v WHERE v.user_id = c.user_id AND v.event_type = 'view'
                AND v.t <= c.t AND c.t - v.t <= {within})
  GROUP BY c.user_id
), s3 AS (
  SELECT p.user_id, max(p.t) AS t3
  FROM e p
  WHERE p.event_type = 'purchase'
    AND EXISTS (
      SELECT 1 FROM e c WHERE c.user_id = p.user_id AND c.event_type = 'click'
        AND c.t <= p.t AND p.t - c.t <= {within}
        AND EXISTS (SELECT 1 FROM e v WHERE v.user_id = c.user_id AND v.event_type = 'view'
                    AND v.t <= c.t AND c.t - v.t <= {within})
    )
  GROUP BY p.user_id
)
SELECT
  u.user_id AS user,
  CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2
       WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS stage_reached,
  t3 IS NOT NULL AS completed
FROM (SELECT DISTINCT user_id FROM e) u
LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
"""

    def fn(spark_, sf_dir_):
        from iot_sensor_data_pipeline_spark.sources.tables import load_table

        # NTZ -> LTZ (session TZ pinned UTC) -> fractional epoch
        # seconds, matching DuckDB's epoch() over the naive timestamp
        ev = load_table(spark_, sf_dir_, "events").select(
            "user_id",
            "event_type",
            F.col("ts").cast("timestamp").cast("double").alias("ts"),
        )
        return funnel_stages(ev, ["view", "click", "purchase"], within_seconds=within)

    ok, msg = compare_query(spark, sf_dir_mid, fn, oracle)
    assert ok, msg


# ---------------------------------------------------------------------------
# cohort_retention
# ---------------------------------------------------------------------------


def test_cohort_retention_golden(spark):
    from iot_sensor_data_pipeline_spark.operators.funnel import cohort_retention

    w = 10.0  # period width
    rows = [
        (1, "x", 0.0), (1, "x", 12.0),            # cohort 0, back in period 1
        (2, "x", 3.0),                            # cohort 0, never back
        (3, "x", 11.0), (3, "x", 35.0),           # cohort 1, back in period 3 (since=2)
    ]
    ev = _events(spark, rows)
    got = {
        (r.cohort_period, r.periods_since): r.n_users
        for r in cohort_retention(ev, period_seconds=w).collect()
    }
    assert got == {(0, 0): 2, (0, 1): 1, (1, 0): 1, (1, 2): 1}


def test_cohort_retention_differential_vs_duckdb(spark, sf_dir_mid):
    from tests.oracle_harness import compare_query

    from iot_sensor_data_pipeline_spark.operators.funnel import cohort_retention

    w = 86400.0  # daily cohorts
    oracle = f"""
WITH e AS (
  SELECT user_id AS u, CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / {w}) AS BIGINT) AS p
  FROM events
), first AS (
  SELECT u, min(p) AS cp FROM e GROUP BY u
)
SELECT cp AS cohort_period, p - cp AS periods_since, count(DISTINCT u) AS n_users
FROM e JOIN first USING (u)
GROUP BY cp, p - cp
"""

    def fn(spark_, sf_dir_):
        from iot_sensor_data_pipeline_spark.sources.tables import load_table

        ev = load_table(spark_, sf_dir_, "events").select(
            "user_id", F.col("ts").cast("timestamp").cast("double").alias("ts")
        )
        return cohort_retention(ev, period_seconds=w)

    ok, msg = compare_query(spark, sf_dir_mid, fn, oracle)
    assert ok, msg


def test_funnel_counts_emits_zero_rows(spark):
    """Stages nobody reached still appear with n_users = 0."""
    from iot_sensor_data_pipeline_spark.operators.funnel import (
        funnel_counts,
        funnel_stages,
    )

    stages = funnel_stages(_events(spark, [(1, "A", 0.0)]), ["A", "B", "C"])
    counts = {r.stage: r.n_users for r in funnel_counts(stages, 3).collect()}
    assert counts == {1: 1, 2: 0, 3: 0}


# ---------------------------------------------------------------------------
# event_transitions
# ---------------------------------------------------------------------------


def test_event_transitions_golden_with_session_gap(spark):
    from iot_sensor_data_pipeline_spark.operators.funnel import event_transitions

    rows = [
        (1, "A", 0.0), (1, "B", 5.0), (1, "A", 100.0),  # gap splits B->A
        (2, "A", 0.0), (2, "B", 1.0),
    ]
    got = {
        (r.from_type, r.to_type): r.n
        for r in event_transitions(_events(spark, rows), session_gap_seconds=50).collect()
    }
    assert got == {("A", "B"): 2, ("B", "<end>"): 2, ("A", "<end>"): 1}
    # conservation: every event appears exactly once as from_type
    assert sum(got.values()) == 5


def test_event_transitions_differential_vs_duckdb(spark, sf_dir_mid):
    from tests.oracle_harness import compare_query

    from iot_sensor_data_pipeline_spark.operators.funnel import event_transitions

    oracle = """
WITH o AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM events
)
SELECT event_type AS from_type, coalesce(nxt, '<end>') AS to_type, count(*) AS n
FROM o GROUP BY 1, 2
"""

    def fn(spark_, sf_dir_):
        from iot_sensor_data_pipeline_spark.sources.tables import load_table

        return event_transitions(
            load_table(spark_, sf_dir_, "events"), id_col="event_id"
        )

    ok, msg = compare_query(spark, sf_dir_mid, fn, oracle)
    assert ok, msg


def test_event_transitions_null_types_dropped(spark):
    """A NULL-typed event must neither fabricate an '<end>' terminal
    nor emit a NULL from_type row — conservation holds over non-null
    events."""
    from iot_sensor_data_pipeline_spark.operators.funnel import event_transitions

    rows = [(1, "A", 0.0), (1, None, 1.0), (1, "B", 2.0)]
    got = {
        (r.from_type, r.to_type): r.n
        for r in event_transitions(_events(spark, rows)).collect()
    }
    assert got == {("A", "B"): 1, ("B", "<end>"): 1}


def test_funnel_hot_user_cap(spark):
    """VERDICT r9 minor 3: max_events_per_user bounds a bot user's
    timeline to their LATEST M funnel-relevant events — normal users'
    answers are unchanged, a completion inside the last M events still
    counts, and a completion that exists ONLY in pre-cutoff history is
    (documentedly) not credited, which proves the truncation actually
    bounds the collected array."""
    from pyspark.sql import functions as F

    from iot_sensor_data_pipeline_spark.operators.funnel import funnel_stages

    rows = []
    # normal user: completes A -> B at t = 10, 20
    rows += [("u_norm", "A", 10.0), ("u_norm", "B", 20.0)]
    # bot user 1: completes EARLY (A@0, B@1), then 5000 trailing A spam
    # events — under cap 100 only the spam survives, so the early
    # completion is out of scope and only stage 1 (A) is reached
    rows += [("u_bot1", "A", 0.0), ("u_bot1", "B", 1.0)]
    rows += [("u_bot1", "A", 100.0 + i) for i in range(5000)]
    # bot user 2: 5000 leading A spam events, completion at the END —
    # inside the last-100 window, so it still counts
    rows += [("u_bot2", "A", float(i)) for i in range(5000)]
    rows += [("u_bot2", "A", 9000.0), ("u_bot2", "B", 9001.0)]
    events = spark.createDataFrame(rows, "user_id string, event_type string, ts double")

    uncapped = {
        r.user: (r.stage_reached, r.completed)
        for r in funnel_stages(events, ["A", "B"]).collect()
    }
    capped = {
        r.user: (r.stage_reached, r.completed)
        for r in funnel_stages(
            events, ["A", "B"], max_events_per_user=100
        ).collect()
    }
    # normal user identical under the cap
    assert uncapped["u_norm"] == (2, True) == capped["u_norm"]
    # uncapped: both bots complete
    assert uncapped["u_bot1"] == (2, True) and uncapped["u_bot2"] == (2, True)
    # capped: bot1's completion predates its last 100 events -> gone;
    # bot2's completion is recent -> kept
    assert capped["u_bot1"] == (1, False)
    assert capped["u_bot2"] == (2, True)

    import pytest

    with pytest.raises(ValueError, match="max_events_per_user"):
        funnel_stages(events, ["A", "B"], max_events_per_user=0)
