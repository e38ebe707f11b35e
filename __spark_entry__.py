"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over the engine's query registry
(iot_sensor_data_pipeline_spark.plans): every implemented operator from
SURVEY.md §2 is a named query with a DuckDB oracle; the driver compares
the two at sf=0.01 (row-count + schema + order-insensitive value hash).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from iot_sensor_data_pipeline_spark.plans import REGISTRY

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: event-time tumbling-window aggregation over `events`
    (the batch analogue of the reference aggregator job,
    reference data_agregator.py:74-95)."""
    return REGISTRY["events_window_agg"].fn(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted -> rows-only check."""
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
