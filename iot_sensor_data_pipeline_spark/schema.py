"""Canonical schemas.

The reference declares three mutually-inconsistent StructTypes for the
same Kafka topic (SURVEY.md §1.2: reference data_persistance.py:21-36,
alert_detector.py:20-35, data_agregator.py:20-25). The new engine has
ONE canonical sensor-reading schema, resolving the conflicts as decided
in SURVEY.md §7:

- value: double        (reference mixed Float/Double)
- timestamp: timestamp (parsed from the ISO-8601 string the simulator
  emits, reference sensor_simulator.py:108)
- location.room: string (ids like "100b" must not break; the reference
  mixed String/Integer)
- location.floor: int
- metadata.*: int
"""

from __future__ import annotations

from pyspark.sql import types as T

#: Canonical schema of one sensor reading, as JSON on the wire.
#: Mirrors the simulator payload (reference sensor_simulator.py:100-115,
#: readme.md:8-30) with the §7 canonical types.
SENSOR_READING_SCHEMA = T.StructType(
    [
        T.StructField("sensor_id", T.StringType()),
        T.StructField("sensor_type", T.StringType()),
        T.StructField(
            "location",
            T.StructType(
                [
                    T.StructField("building", T.StringType()),
                    T.StructField("floor", T.IntegerType()),
                    T.StructField("room", T.StringType()),
                ]
            ),
        ),
        T.StructField("timestamp", T.StringType()),  # ISO-8601; cast after parse
        T.StructField("value", T.DoubleType()),
        T.StructField("unit", T.StringType()),
        T.StructField(
            "metadata",
            T.StructType(
                [
                    T.StructField("battery_level", T.IntegerType()),
                    T.StructField("signal_strength", T.IntegerType()),
                ]
            ),
        ),
    ]
)

#: Flattened reading relation — the engine's `sensor_readings` table
#: (reference data_persistance.py:77-89 writes the same 10 columns).
FLAT_READING_SCHEMA = T.StructType(
    [
        T.StructField("sensor_id", T.StringType()),
        T.StructField("sensor_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("unit", T.StringType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("building", T.StringType()),
        T.StructField("floor", T.IntegerType()),
        T.StructField("room", T.StringType()),
        T.StructField("battery_level", T.IntegerType()),
        T.StructField("signal_strength", T.IntegerType()),
    ]
)

#: props payload carried by the driver's `events` table (TESTDATA.md).
EVENT_PROPS_SCHEMA = T.StructType([T.StructField("k", T.IntegerType())])

#: Names of the driver-provided parquet tables (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
