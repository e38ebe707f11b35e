"""Local replica of the driver's DuckDB-oracle differential check.

Runs a registered query on Spark and its oracle SQL on DuckDB over the
same parquet tables, then compares row count, column names, and values
(order-insensitive, columns sorted by name) — the same contract the
driver's CORRECTNESS gate applies, so a green run here predicts a green
driver run.
"""

from __future__ import annotations

import math
import os
from datetime import datetime

import duckdb

from iot_sensor_data_pipeline_spark.schema import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm(v):
    """Normalize a cell for comparison across engines."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # absorb <1ulp representation noise; queries round explicitly
        return round(v, 9)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    # duckdb may return Decimal where spark returns int/float
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            f = float(v)
            return int(f) if f.is_integer() else round(f, 9)
    except ImportError:
        pass
    return v


def compare_query(spark, sf_dir: str, fn, oracle: str) -> tuple[bool, str]:
    """Return (ok, message). Mirrors driver: count + columns + multiset of
    rows with columns sorted by name."""
    sdf = fn(spark, sf_dir)
    spark_cols = sorted(sdf.columns)
    spark_rows = sdf.collect()

    con = duckdb_connection(sf_dir)
    ddf = con.execute(oracle)
    duck_cols_raw = [d[0] for d in ddf.description]
    duck_rows = ddf.fetchall()
    duck_cols = sorted(duck_cols_raw)

    if spark_cols != duck_cols:
        return False, f"columns differ: spark={spark_cols} duck={duck_cols}"
    if len(spark_rows) != len(duck_rows):
        return False, f"row count differs: spark={len(spark_rows)} duck={len(duck_rows)}"

    s_set = sorted(
        (tuple(_norm(row[c]) for c in spark_cols) for row in spark_rows), key=repr
    )
    idx = {c: i for i, c in enumerate(duck_cols_raw)}
    d_set = sorted(
        (tuple(_norm(row[idx[c]]) for c in duck_cols) for row in duck_rows), key=repr
    )
    if s_set != d_set:
        diffs = [(a, b) for a, b in zip(s_set, d_set) if a != b][:3]
        return False, f"values differ; first mismatches: {diffs}"
    return True, f"ok ({len(spark_rows)} rows)"
