"""Differential correctness: every registered query with an oracle must
match DuckDB at sf0.01 — the same gate the driver applies."""

from __future__ import annotations

import pytest

from iot_sensor_data_pipeline_spark.plans import REGISTRY
from tests.oracle_harness import compare_query

ORACLE_QUERIES = sorted(name for name, q in REGISTRY.items() if q.oracle)
ROWS_ONLY_QUERIES = sorted(name for name, q in REGISTRY.items() if not q.oracle)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, sf_dir_mid, name):
    q = REGISTRY[name]
    ok, msg = compare_query(spark, sf_dir_mid, q.fn, q.oracle)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_query_runs(spark, sf_dir_mid, name):
    q = REGISTRY[name]
    df = q.fn(spark, sf_dir_mid)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
