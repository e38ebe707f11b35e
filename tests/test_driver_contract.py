"""Guards on the driver contract: __spark_entry__ shape, bench.py
output format. A regression here fails the external gate even when all
operators are correct, so it gets its own tests."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import __spark_entry__ as entry_mod

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_queries_and_oracles_align():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert qs, "registry must not be empty"
    assert set(oracles) <= set(qs)  # every oracle belongs to a query
    assert all(callable(fn) for fn in qs.values())
    assert all(isinstance(sql, str) and sql.strip() for sql in oracles.values())
    # the vast majority of queries must be oracle-checked
    assert len(oracles) / len(qs) >= 0.8
    # the driver's correctness gate covers at most 50 registered
    # queries; a 51st would silently escape the gate
    assert len(qs) <= 50


def test_entry_returns_dataframe(spark):
    df = entry_mod.entry(spark)
    assert not df.isStreaming
    assert len(df.schema.fields) > 0
    assert df.count() > 0


def test_bench_final_line_is_compact_headline_json():
    """The driver tail-captures ~2.2 KB of stdout and parses the LAST
    line as the round's bench record (r12 recorded ``parsed: null``
    when the single line outgrew that buffer — VERDICT r12 task 1).
    Contract now: the FINAL line is the compact headline record (hard
    size bound), preceded by a separate ``maintenance_anchors`` JSON
    line carrying the maintenance micro-benchmarks."""
    env = dict(os.environ, SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
               SPARK_GRAFT_CPUS="8", BENCH_REPEATS="1")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        timeout=420,
        env=env,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    json_lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    assert len(json_lines) >= 2  # maintenance line + headline line
    final = json_lines[-1]
    assert len(final) <= 1800, len(final)  # fits the driver's capture
    payload = json.loads(final)
    assert payload["metric"] == "headline_queries_total"
    assert payload["unit"] == "sec"
    assert payload["sf"] == 0.001
    assert payload["queries"] and all(v >= 0 for v in payload["queries"].values())
    maint = json.loads(json_lines[-2])
    # the maintenance anchors moved to their own line, not dropped
    if maint["metric"] == "headline_queries_min":
        maint = json.loads(json_lines[-3])
    assert maint["metric"] == "maintenance_anchors"
    assert maint["maintenance"]["mv_refresh_noop_sec"] >= 0
