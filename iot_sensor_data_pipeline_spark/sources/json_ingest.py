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

#: schema field that receives the raw text of malformed records when
#: quarantine is enabled (Spark's columnNameOfCorruptRecord contract)
CORRUPT_COL = "_corrupt_record"


def parse_json_column(
    df: DataFrame,
    json_col: str,
    schema: T.StructType,
    out_col: str = "data",
    mode: str = "PERMISSIVE",
    corrupt_col: str | None = None,
) -> DataFrame:
    """Parse a string/binary JSON column into a typed struct column.

    With ``corrupt_col`` set, malformed records are CAPTURED instead of
    silently nulled: the schema gains a string field of that name and
    ``columnNameOfCorruptRecord`` routes the raw text there (clean rows
    get null). The reference silently nulls corrupt rows
    (data_persistance.py:76); this keeps that default but offers the
    production-grade capture path — pair with :func:`split_quarantine`.
    """
    options = {"mode": mode}
    if corrupt_col is not None:
        schema = T.StructType(
            [*schema.fields, T.StructField(corrupt_col, T.StringType())]
        )
        options["columnNameOfCorruptRecord"] = corrupt_col
    return df.withColumn(
        out_col,
        F.from_json(F.col(json_col).cast("string"), schema, options),
    )


def split_quarantine(
    df: DataFrame,
    json_col: str = "value",
    data_col: str = "data",
    corrupt_col: str = CORRUPT_COL,
) -> tuple[DataFrame, DataFrame]:
    """Split a corrupt-capturing parse (``parse_json_column(...,
    corrupt_col=...)``) into (clean flat readings, dead-letter rows).

    Dead-letter rows carry the raw wire text plus a quarantine
    timestamp — enough to replay after a schema fix. A null parse
    result (null/empty input) is quarantined too: nothing is silently
    dropped. Both halves are narrow projections of the same parsed
    frame, so under foreachBatch a single persist serves both.
    """
    is_bad = F.col(f"{data_col}.{corrupt_col}").isNotNull() | F.col(
        data_col
    ).isNull()
    dead = df.filter(is_bad).select(
        F.col(json_col).cast("string").alias("raw_value"),
        F.current_timestamp().alias("quarantined_at"),
    )
    clean = flatten_reading(df.filter(~is_bad))
    return clean, dead


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


#: top-level fields of the reference's alert wire payload, IN ORDER
#: (reference alert_detector.py:216-241) — sensor_id appears in both
#: the Kafka key and the payload; resolved_at/created_at are
#: database-only audit columns and never go on the wire.
ALERT_WIRE_FIELDS = (
    "sensor_id",
    "sensor_type",
    "timestamp",
    "location",
    "metadata",
    "alert_type",
    "severity",
    "threshold_value",
    "actual_value",
    "message",
    "triggered_at",
    "status",
)


def alert_wire_frame(alerts: DataFrame) -> DataFrame:
    """The alert topic's exact (key, value) frame: key = sensor_id cast
    to string, value = to_json of the reference's 12-field struct with
    location/metadata re-nested (alert_detector.py:216-241). Field
    ORDER is preserved so payload bytes match a reference consumer's
    expectations; pinned by tests/test_sink_payloads.py."""
    nested = renest_reading(alerts)
    return nested.select(
        F.col("sensor_id").cast("string").alias("key"),
        F.to_json(F.struct(*ALERT_WIRE_FIELDS)).alias("value"),
    )


def ingest_readings_variant(df: DataFrame, json_col: str = "value") -> DataFrame:
    """Schema-LESS ingest of the sensor wire frame via Spark 4's
    VARIANT type: ``parse_json`` keeps the full semi-structured value
    (open content model — unknown producer fields survive instead of
    being silently projected away), and each persisted column is a
    typed ``variant_get`` path extraction. Same 10-column output as
    :func:`ingest_readings`, plus the raw variant as ``v``.

    Why it exists next to the StructType path: the reference declared
    THREE conflicting schemas for one topic (SURVEY.md §1.2) because
    from_json forces every consumer to commit to a projection upfront;
    VARIANT defers typing to the extraction site, so producer schema
    drift (new fields, widened types) needs no redeclaration — check
    ``schema_of_variant_agg`` over a sample to audit what a topic
    actually carries. Extraction is JVM-native over the binary
    variant encoding (no JSON re-parse per path).

    ``try_parse_json`` (not the strict ``parse_json``) and
    ``try_variant_get`` (not the strict ``variant_get``) together
    mirror the PERMISSIVE contract of the StructType path: malformed
    wire text yields a null variant, and a type-drifted field (a
    string where a number is expected) yields a null COLUMN — never a
    failed batch. The strict getters would abort the job on the exact
    drift this operator exists to tolerate."""
    v = df.select(F.try_parse_json(F.col(json_col).cast("string")).alias("v"))
    return v.select(
        F.try_variant_get("v", "$.sensor_id", "string").alias("sensor_id"),
        F.try_variant_get("v", "$.sensor_type", "string").alias("sensor_type"),
        F.try_variant_get("v", "$.value", "double").alias("value"),
        F.try_variant_get("v", "$.unit", "string").alias("unit"),
        F.to_timestamp(F.try_variant_get("v", "$.timestamp", "string")).alias("timestamp"),
        F.try_variant_get("v", "$.location.building", "string").alias("building"),
        F.try_variant_get("v", "$.location.floor", "int").alias("floor"),
        F.try_variant_get("v", "$.location.room", "string").alias("room"),
        F.try_variant_get("v", "$.metadata.battery_level", "int").alias("battery_level"),
        F.try_variant_get("v", "$.metadata.signal_strength", "int").alias("signal_strength"),
        "v",
    )
