"""JSON schema-on-read ingest: parse + flatten.

The reference's P1-P4 (SURVEY.md §2.2): each job does
CAST(value AS STRING) -> from_json(schema) -> project nested fields ->
cast timestamp (reference data_persistance.py:75-89,
alert_detector.py:83-96, data_agregator.py:64-72). Here it is ONE
reusable transform used by every consumer, against the single canonical
schema (schema.py) instead of three conflicting per-job schemas.

from_json runs PERMISSIVE (corrupt JSON or type mismatch -> null struct
/ null fields) — same tolerant semantics the reference relies on
(SURVEY.md §1.2), made explicit here.

Scale notes: from_json is a codegen'd JVM expression; with an explicit
schema Catalyst prunes unreferenced struct fields out of the parse
(OptimizeJsonExprs), so downstream projections keep the parse cheap.
No Python in this path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from iot_sensor_data_pipeline_spark.schema import SENSOR_READING_SCHEMA


def parse_json_column(
    df: DataFrame,
    json_col: str,
    schema: T.StructType,
    out_col: str = "data",
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """Parse a string/binary JSON column into a typed struct column."""
    return df.withColumn(
        out_col,
        F.from_json(F.col(json_col).cast("string"), schema, {"mode": mode}),
    )


def flatten_reading(df: DataFrame, data_col: str = "data") -> DataFrame:
    """Flatten a parsed sensor-reading struct to the 10-column relation
    the reference persists (reference data_persistance.py:77-89)."""
    d = data_col
    return df.select(
        F.col(f"{d}.sensor_id").alias("sensor_id"),
        F.col(f"{d}.sensor_type").alias("sensor_type"),
        F.col(f"{d}.value").alias("value"),
        F.col(f"{d}.unit").alias("unit"),
        F.to_timestamp(F.col(f"{d}.timestamp")).alias("timestamp"),
        F.col(f"{d}.location.building").alias("building"),
        F.col(f"{d}.location.floor").alias("floor"),
        F.col(f"{d}.location.room").alias("room"),
        F.col(f"{d}.metadata.battery_level").alias("battery_level"),
        F.col(f"{d}.metadata.signal_strength").alias("signal_strength"),
    )


def ingest_readings(df: DataFrame, json_col: str = "value") -> DataFrame:
    """Full ingest path: raw JSON bytes/string -> flat typed readings.

    Works on a Kafka stream (json_col='value'), a file/memory stream,
    or a batch DataFrame — the transform is source-agnostic.
    """
    return flatten_reading(parse_json_column(df, json_col, SENSOR_READING_SCHEMA))


def renest_reading(df: DataFrame) -> DataFrame:
    """Inverse of flatten (reference alert_detector.py:222-231, P12):
    re-nest location/metadata structs for JSON wire output."""
    nested = df.withColumn(
        "location", F.struct("building", "floor", "room")
    ).withColumn("metadata", F.struct("battery_level", "signal_strength"))
    return nested.drop("building", "floor", "room", "battery_level", "signal_strength")


def serialize_json(df: DataFrame, key_col: str | None = None) -> DataFrame:
    """P13/P14: struct-of-all-columns -> JSON string `value` (+ string
    `key`) — the Kafka wire format (reference alert_detector.py:215-241)."""
    cols = [c for c in df.columns if c != key_col]
    out = df.select(
        *( [F.col(key_col).cast("string").alias("key")] if key_col else [] ),
        F.to_json(F.struct(*cols)).alias("value"),
    )
    return out
