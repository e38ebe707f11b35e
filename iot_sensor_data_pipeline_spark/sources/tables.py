"""Batch table source: the driver's parquet star schema (TESTDATA.md).

Columnar parquet scans are the engine's batch ingest path — Catalyst
pushes filters and prunes columns into the scan, so operators should
filter/select as early as possible and let the optimizer do the rest.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iot_sensor_data_pipeline_spark.schema import TABLES

#: parquet TIMESTAMP(NANOS) is illegal for Spark's vectorized reader;
#: the legacy conf reads it as epoch-nanos long, which we convert below.
_NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"

#: epoch-anchored NTZ conversion — deliberately timezone-independent
#: (no session-TZ involvement), truncating ns -> us exactly like
#: DuckDB's TIMESTAMP_NS -> TIMESTAMP cast, so oracle values align.
_NS_TO_TS = "timestampadd(MICROSECOND, {col} div 1000, TIMESTAMP_NTZ '1970-01-01 00:00:00')"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one table; scan-level pushdown/pruning happens downstream.

    Normalizes nanosecond-precision timestamp columns (events.ts) to
    TIMESTAMP_NTZ microseconds, the engine's canonical event-time type.
    """
    spark.conf.set(_NANOS_CONF, "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.expr(_NS_TO_TS.format(col="ts")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """All driver tables keyed by name."""
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every table and register it as a temp view for spark.sql."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
