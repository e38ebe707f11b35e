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


def test_bench_emits_one_json_line():
    env = dict(os.environ, SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001", SPARK_GRAFT_CPUS="8")
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
    assert len(json_lines) == 1
    payload = json.loads(json_lines[0])
    assert payload["metric"] and payload["unit"] == "sec"
    assert payload["sf"] == 0.001
    assert payload["queries"] and all(v >= 0 for v in payload["queries"].values())
