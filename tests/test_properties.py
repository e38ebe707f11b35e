"""Property-based differential tests (hypothesis): the engine's
operators vs independent Python/pandas reference implementations on
randomized inputs. Complements the DuckDB oracle (fixed datasets) with
adversarial small cases: boundary values, ties, empty groups.

Examples are kept low (Spark round-trip per example) but each example
carries many rows.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from iot_sensor_data_pipeline_spark.functions.rules import SENSOR_RULES, detect_alerts
from iot_sensor_data_pipeline_spark.operators.joins import asof_join
from iot_sensor_data_pipeline_spark.operators.window_agg import windowed_agg

T0 = dt.datetime(2026, 1, 1)

SENSOR_KINDS = [
    ("temperature", "celsius"),
    ("humidity", "percent"),
    ("pressure", "hPa"),
]


def expected_alert(sensor_type, unit, value, battery, signal):
    """Independent Python mirror of SURVEY.md §2.6 (priority order,
    first match wins) — NOT derived from functions/rules.py."""
    if sensor_type == "temperature" and unit == "celsius":
        if value < 15 or value > 30:
            return "temperature_critical"
        if value > 27:
            return "temperature_warning"
    if sensor_type == "humidity" and unit == "percent":
        if value < 30 or value > 70:
            return "humidity_critical"
        if value < 35 or value > 60:
            return "humidity_warning"
    if sensor_type == "pressure" and unit == "hPa":
        if value < 980 or value > 1040:
            return "pressure_critical"
        if value < 995 or value > 1030:
            return "pressure_warning"
    if battery < 20:
        return "battery_critical"
    if battery < 40:
        return "battery_warning"
    if signal < -75:
        return "weak_signal_critical"
    if signal < -70:
        return "weak_signal_warning"
    return None


readings_strategy = st.lists(
    st.tuples(
        st.sampled_from(range(len(SENSOR_KINDS))),
        # boundary-heavy value distribution across all three domains
        st.one_of(
            st.sampled_from([14.9, 15.0, 27.0, 27.1, 30.0, 30.1, 29.9, 35.0, 60.0, 70.0, 980.0, 995.0, 1030.0, 1040.0]),
            st.floats(min_value=-10, max_value=1100, allow_nan=False, width=32),
        ),
        st.integers(min_value=0, max_value=100),      # battery
        st.integers(min_value=-95, max_value=-40),    # signal
    ),
    min_size=1,
    max_size=80,
)


@settings(max_examples=8, deadline=None, derandomize=True, suppress_health_check=[HealthCheck.too_slow])
@given(readings_strategy)
def test_rule_engine_matches_python_reference(spark, rows):
    data = []
    for i, (kind_i, value, battery, signal) in enumerate(rows):
        sensor_type, unit = SENSOR_KINDS[kind_i]
        data.append(
            (f"s{i}", sensor_type, "A", 1, "100", T0 + dt.timedelta(seconds=i),
             float(value), unit, battery, signal)
        )
    df = spark.createDataFrame(
        data,
        "sensor_id string, sensor_type string, building string, floor int, room string, "
        "timestamp timestamp, value double, unit string, battery_level int, signal_strength int",
    )
    got = {r.sensor_id: r.alert_type for r in detect_alerts(df).collect()}
    for row in data:
        want = expected_alert(row[1], row[7], row[6], row[8], row[9])
        assert got.get(row[0]) == want, (row, got.get(row[0]), want)


asof_strategy = st.tuples(
    st.lists(  # left: (key, ts_offset_s)
        st.tuples(st.integers(0, 3), st.integers(0, 10_000)), min_size=1, max_size=60
    ),
    st.lists(  # right: (key, ts_offset_s, value)
        st.tuples(st.integers(0, 3), st.integers(0, 10_000), st.integers(-1000, 1000)),
        min_size=0,
        max_size=60,
    ),
)


@settings(max_examples=8, deadline=None, derandomize=True, suppress_health_check=[HealthCheck.too_slow])
@given(asof_strategy)
def test_asof_join_matches_pandas_merge_asof(spark, data):
    left_rows, right_rows = data
    left = spark.createDataFrame(
        [(k, T0 + dt.timedelta(seconds=s), i) for i, (k, s) in enumerate(left_rows)],
        "k int, ts timestamp, row_id int",
    )
    right = spark.createDataFrame(
        [(k, T0 + dt.timedelta(seconds=s), float(v)) for k, s, v in right_rows],
        "k int, rts timestamp, rv double",
    ) if right_rows else spark.createDataFrame([], "k int, rts timestamp, rv double")

    got = {
        r.row_id: r.rv
        for r in asof_join(
            left, right, on=["k"], left_ts="ts", right_ts="rts", right_vals=["rv"]
        ).collect()
    }

    lp = pd.DataFrame(
        [(k, T0 + dt.timedelta(seconds=s), i) for i, (k, s) in enumerate(left_rows)],
        columns=["k", "ts", "row_id"],
    ).sort_values("ts", kind="stable")
    rp = pd.DataFrame(
        [(k, T0 + dt.timedelta(seconds=s), float(v)) for k, s, v in right_rows],
        columns=["k", "rts", "rv"],
    ).sort_values("rts", kind="stable")
    if len(rp):
        merged = pd.merge_asof(
            lp, rp, left_on="ts", right_on="rts", by="k", direction="backward"
        )
        want = {int(r.row_id): (None if pd.isna(r.rv) else r.rv) for r in merged.itertuples()}
    else:
        want = {int(r.row_id): None for r in lp.itertuples()}

    # ties: pandas merge_asof takes the LAST right row at equal ts for
    # the same key; our implementation takes the last in (ts, side)
    # order too (right rows sort before left, later right rows win)
    assert got == want


agg_strategy = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 7200), st.integers(-100, 100)),
    min_size=1,
    max_size=120,
)


@settings(max_examples=8, deadline=None, derandomize=True, suppress_health_check=[HealthCheck.too_slow])
@given(agg_strategy)
def test_windowed_agg_matches_pandas(spark, rows):
    df = spark.createDataFrame(
        [(f"k{k}", T0 + dt.timedelta(seconds=s), float(v)) for k, s, v in rows],
        "key string, ts timestamp, value double",
    )
    out = windowed_agg(df, "ts", ["key"], "value", "10 minutes")
    got = {
        (r.key, r.window_start): (r.n, r.min_value, r.max_value, round(r.avg_value, 9))
        for r in out.collect()
    }

    pdf = pd.DataFrame(
        [(f"k{k}", T0 + dt.timedelta(seconds=s), float(v)) for k, s, v in rows],
        columns=["key", "ts", "value"],
    )
    pdf["window_start"] = pdf["ts"].dt.floor("10min")
    want = {}
    for (key, ws), grp in pdf.groupby(["key", "window_start"]):
        want[(key, ws.to_pydatetime())] = (
            len(grp),
            grp["value"].min(),
            grp["value"].max(),
            round(grp["value"].mean(), 9),
        )
    assert got == want


# ---------------------------------------------------------------------------
# global ranking vs an independent Python sort (randomized ties)
# ---------------------------------------------------------------------------

ranking_strategy = st.lists(
    st.integers(min_value=0, max_value=9),  # heavy ties on the value
    min_size=1,
    max_size=120,
)


@settings(max_examples=8, deadline=None, derandomize=True, suppress_health_check=[HealthCheck.too_slow])
@given(ranking_strategy)
def test_global_row_number_matches_python_sort(spark, values):
    """operators.ranking.global_row_number vs plain Python sorted() on
    randomized tie-heavy data across partition counts (including more
    partitions than rows)."""
    from pyspark.sql import functions as F

    from iot_sensor_data_pipeline_spark.operators.ranking import global_row_number

    rows = [(i, v) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, "id long, v long")
    want = {
        rid: rank + 1
        for rank, (v, rid) in enumerate(sorted((v, i) for i, v in rows))
    }
    for parts in (1, 3, 64):
        out, n = global_row_number(
            df,
            [F.col("v").asc(), F.col("id").asc()],
            "rn",
            num_partitions=parts,
            return_count=True,
        )
        assert n == len(rows)
        got = {r.id: r.rn for r in out.collect()}
        assert got == want, f"num_partitions={parts}"


# ---------------------------------------------------------------------------
# weighted_mix keep-set vs an independent md5 computation
# ---------------------------------------------------------------------------

mix_strategy = st.lists(
    st.tuples(st.integers(min_value=0, max_value=10**6), st.sampled_from(["a", "b", "c"])),
    min_size=1,
    max_size=100,
    unique_by=lambda t: t[0],
)


@settings(max_examples=8, deadline=None, derandomize=True, suppress_health_check=[HealthCheck.too_slow])
@given(mix_strategy)
def test_weighted_mix_matches_python_md5(spark, rows):
    """The md5 mix bucket must equal an independent hashlib
    computation row-for-row (the cross-engine determinism claim)."""
    import hashlib

    from iot_sensor_data_pipeline_spark.operators.curation import (
        md5_mix_bucket_expr,
        weighted_mix,
    )

    rates = {"a": 1.0, "b": 0.5, "c": 0.0}

    def bucket(domain, i):
        h = hashlib.md5(f"{domain}:{i}".encode()).hexdigest()[:8]
        return int(h, 16) * 1_000_000 // 2**32

    want = {
        i for i, d in rows if bucket(d, i) < int(rates[d] * 1_000_000)
    }
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    got = {
        r.doc_id
        for r in weighted_mix(
            df, "lang", rates, "doc_id",
            bucket_expr=md5_mix_bucket_expr("lang", "doc_id"),
        ).collect()
    }
    assert got == want


# ---------------------------------------------------------------------------
# range_join vs a Python reference on randomized points/intervals
# ---------------------------------------------------------------------------


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    pts=st.lists(
        st.floats(min_value=-100, max_value=100, allow_nan=False), min_size=1, max_size=40
    ),
    ivs=st.lists(
        st.tuples(
            st.floats(min_value=-100, max_value=100, allow_nan=False),
            st.floats(min_value=0, max_value=30, allow_nan=False),
        ),
        min_size=1,
        max_size=25,
    ),
    width=st.sampled_from([0.5, 3.0, 17.0, 120.0]),
)
def test_range_join_property_vs_python(spark, pts, ivs, width):
    from iot_sensor_data_pipeline_spark.operators.joins import range_join

    points = spark.createDataFrame(list(enumerate(pts)), "pid long, x double")
    intervals = spark.createDataFrame(
        [(j, lo, lo + span) for j, (lo, span) in enumerate(ivs)],
        "iid long, lo double, hi double",
    )
    got = sorted(
        (r.pid, r.iid)
        for r in range_join(points, intervals, "x", "lo", "hi", width).collect()
    )
    want = sorted(
        (i, j)
        for i, x in enumerate(pts)
        for j, (lo, span) in enumerate(ivs)
        if lo <= x < lo + span
    )
    assert got == want


# ---------------------------------------------------------------------------
# chunk_documents coverage/reassembly property
# ---------------------------------------------------------------------------


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    n_tokens=st.integers(min_value=0, max_value=60),
    chunk=st.integers(min_value=1, max_value=12),
    overlap_frac=st.floats(min_value=0.0, max_value=0.9),
)
def test_chunk_documents_property_coverage(spark, n_tokens, chunk, overlap_frac):
    """No-overlap chunks concatenate back to the exact token list; with
    overlap, consecutive chunks start exactly `stride` tokens apart and
    jointly cover every token."""
    from iot_sensor_data_pipeline_spark.operators.curation import chunk_documents

    overlap = min(int(chunk * overlap_frac), chunk - 1)
    toks = [f"t{i}" for i in range(n_tokens)]
    docs = spark.createDataFrame([(1, " ".join(toks))], "doc_id long, text string")
    rows = sorted(
        chunk_documents(docs, chunk, overlap).collect(), key=lambda r: r.chunk_idx
    )
    stride = chunk - overlap
    chunks = [r.chunk_text.split() if r.chunk_text else [] for r in rows]
    if overlap == 0:
        assert [t for ch in chunks for t in ch] == toks
    covered = set()
    for idx, ch in enumerate(chunks):
        start = idx * stride
        assert ch == toks[start : start + chunk]
        covered.update(range(start, start + len(ch)))
    assert covered == set(range(len(toks)))


# ---------------------------------------------------------------------------
# remove_boilerplate_lines vs a Python reference
# ---------------------------------------------------------------------------


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    docs_lines=st.lists(
        st.lists(st.sampled_from(["shared", "common", "x", "y", "z", "unique"]), min_size=1, max_size=6),
        min_size=1,
        max_size=12,
    ),
    min_freq=st.integers(min_value=2, max_value=5),
)
def test_boilerplate_property_vs_python(spark, docs_lines, min_freq):
    from iot_sensor_data_pipeline_spark.operators.curation import (
        remove_boilerplate_lines,
    )

    docs = spark.createDataFrame(
        [(i, "\n".join(ls)) for i, ls in enumerate(docs_lines)],
        "doc_id long, text string",
    )
    # Python reference: document frequency per distinct line
    df_count: dict[str, set] = {}
    for i, ls in enumerate(docs_lines):
        for line in ls:
            df_count.setdefault(line, set()).add(i)
    boiler = {line for line, ids in df_count.items() if len(ids) >= min_freq}
    got = {r.id: r for r in remove_boilerplate_lines(docs, min_freq).collect()}
    for i, ls in enumerate(docs_lines):
        kept = [line for line in ls if line not in boiler]
        assert got[i].text_clean == "\n".join(kept)
        assert got[i].n_lines == len(ls)
        assert got[i].n_removed == len(ls) - len(kept)


# ---------------------------------------------------------------------------
# fuzzy_join vs naive levenshtein cross join — stresses the seams
# between the short stratum and the q-gram path
# ---------------------------------------------------------------------------


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    lefts=st.lists(st.text(alphabet="abcxy", min_size=0, max_size=10), min_size=1, max_size=15),
    rights=st.lists(st.text(alphabet="abcxy", min_size=0, max_size=10), min_size=1, max_size=15),
    d=st.integers(min_value=0, max_value=2),
)
def test_fuzzy_join_property_vs_naive(spark, lefts, rights, d):
    from pyspark.sql import functions as F

    from iot_sensor_data_pipeline_spark.operators.joins import fuzzy_join

    left = spark.createDataFrame([(s,) for s in lefts], "s string")
    right = spark.createDataFrame([(t,) for t in rights], "t string")
    got = {
        (r.a, r.b, r.distance)
        for r in fuzzy_join(left, right, "s", "t", max_distance=d, q=2).collect()
    }
    naive = {
        (r.a, r.b, r.dd)
        for r in left.distinct()
        .crossJoin(right.distinct())
        .select(
            F.col("s").alias("a"),
            F.col("t").alias("b"),
            F.levenshtein("s", "t").alias("dd"),
        )
        .where(F.col("dd") <= d)
        .collect()
    }
    assert got == naive


# ---------------------------------------------------------------------------
# funnel_stages latest-anchor DP vs brute-force chain existence
# ---------------------------------------------------------------------------

funnel_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),   # user
        st.integers(min_value=0, max_value=2),   # step index (A/B/C)
        st.integers(min_value=0, max_value=20),  # ts
    ),
    min_size=1,
    max_size=18,
)


def _brute_stage(events, k_steps, budget):
    """Deepest m such that a chain e_0..e_{m-1} exists with step(e_i)=i
    and 0 <= t_i - t_{i-1} <= budget — exhaustive search, no DP."""

    def extend(prefix_len, last_t):
        if prefix_len == k_steps:
            return k_steps
        best = prefix_len
        for (s, t) in events:
            if s == prefix_len and (prefix_len == 0 or 0 <= t - last_t <= budget):
                best = max(best, extend(prefix_len + 1, t))
        return best

    return extend(0, None)


@settings(max_examples=10, deadline=None, derandomize=True, suppress_health_check=[HealthCheck.too_slow])
@given(funnel_strategy, st.integers(min_value=0, max_value=6))
def test_funnel_stages_matches_brute_force_chain_search(spark, rows, budget):
    """The latest-anchor DP must agree with exhaustive chain search on
    tie-heavy tiny inputs — the greedy-trap, equal-timestamp, and
    zero-budget corners all live here."""
    from iot_sensor_data_pipeline_spark.operators.funnel import funnel_stages

    steps = ["A", "B", "C"]
    df = spark.createDataFrame(
        [(u, steps[s], float(t)) for u, s, t in rows],
        "user_id long, event_type string, ts double",
    )
    got = {
        r.user: r.stage_reached
        for r in funnel_stages(df, steps, within_seconds=float(budget)).collect()
    }
    by_user = {}
    for u, s, t in rows:
        by_user.setdefault(u, []).append((s, t))
    for u, events in by_user.items():
        want = _brute_stage(events, len(steps), budget)
        assert got.get(u, 0) == want, (u, sorted(events), budget, got.get(u), want)


@settings(max_examples=300, deadline=None, derandomize=True)
@given(
    st.lists(st.integers(min_value=0, max_value=5000), max_size=40),
    st.integers(min_value=1, max_value=2000),
    st.integers(min_value=1, max_value=5),
)
def test_pack_bins_invariants(sizes, target, min_bin_files):
    """plan_compaction's greedy split (r12 pure form): every file
    appears exactly once; compact bins hold >= min_bin_files files and
    never exceed target + one straddling file; keeps are exactly the
    big files plus downgraded small bins; binning is deterministic in
    name order."""
    from iot_sensor_data_pipeline_spark.sources.manifest import _pack_bins

    files = sorted((f"f{i:04d}.parquet", s) for i, s in enumerate(sizes))
    rows = _pack_bins(files, target, min_bin_files)
    assert sorted((f, s) for f, s, _a, _b in rows) == files  # partition

    bins: dict[int, list[int]] = {}
    for f, s, action, b in rows:
        if action == "compact":
            assert s < target and b is not None
            bins.setdefault(b, []).append(s)
        else:
            assert b is None
    for b, members in bins.items():
        assert len(members) >= min_bin_files
        # a bin exceeds target by at most its one straddling file
        assert sum(members) < target + max(members)

    # every small file in a keep row is there ONLY because its bin was
    # downgraded (under min_bin_files) — recompute the raw bin ids
    cum, raw = 0, {}
    for f, s in files:
        if s < target:
            raw[f] = cum // target
            cum += s
    from collections import Counter

    raw_counts = Counter(raw.values())
    for f, s, action, _b in rows:
        if s < target:
            want = "compact" if raw_counts[raw[f]] >= min_bin_files else "keep"
            assert action == want

    # determinism: same input -> identical output
    assert _pack_bins(files, target, min_bin_files) == rows
