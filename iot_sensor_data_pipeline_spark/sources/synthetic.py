"""Synthetic sensor-reading stream (S5 in SURVEY.md §2.1).

The reference generates data with a separate kafka-python process
(reference sensor_simulator.py: 24 sensors = 1 building x 2 floors x
4 rooms x 3 types, sinusoidal base + noise + rare anomalies, fleet
sweep every 3 s). Here the generator is a Spark ``rate`` source plus
column expressions — no external process, no Kafka, works in batch
(``spark.range``) and streaming (``rate``) and scales to any events/sec
by raising ``rows_per_second``.

The signal model mirrors the simulator's distributions: per-type
sinusoid base + uniform noise, battery/signal anomalies at the
reference's documented rates (FIXTURES.md §1), all as deterministic
functions of the row id — reproducible without a seed exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: fleet layout (reference sensor_simulator.py:9-12)
BUILDINGS = ("A",)
FLOORS = (1, 2)
ROOMS = ("100", "101", "102", "103")
SENSOR_TYPES = ("temperature", "humidity", "pressure")
UNITS = {"temperature": "celsius", "humidity": "percent", "pressure": "hPa"}
FLEET = len(BUILDINGS) * len(FLOORS) * len(ROOMS) * len(SENSOR_TYPES)  # 24


def _reading_columns(df: DataFrame, id_col: str, ts_col) -> DataFrame:
    """Map a monotonically increasing id + timestamp to one reading."""
    i = F.col(id_col)
    sensor_idx = (i % FLEET).cast("int")
    type_idx = (sensor_idx % len(SENSOR_TYPES)).cast("int")
    room_idx = ((sensor_idx / len(SENSOR_TYPES)).cast("int") % len(ROOMS)).cast("int")
    floor = ((sensor_idx / (len(SENSOR_TYPES) * len(ROOMS))).cast("int") % len(FLOORS)) + 1

    sensor_type = F.element_at(F.array(*[F.lit(t) for t in SENSOR_TYPES]), type_idx + 1)
    unit = F.element_at(
        F.array(*[F.lit(UNITS[t]) for t in SENSOR_TYPES]), type_idx + 1
    )
    room = F.element_at(F.array(*[F.lit(r) for r in ROOMS]), room_idx + 1)

    # sinusoid base per type + deterministic pseudo-noise from the id
    phase = (i % 1000) / 1000.0 * 2 * 3.141592653589793
    noise = (F.hash(i) % 1000) / 1000.0  # in (-1, 1)
    base = (
        F.when(sensor_type == "temperature", 22.5 + 2.5 * F.sin(phase) + noise)
        .when(sensor_type == "humidity", 47.5 + 7.5 * F.sin(phase) + 2 * noise)
        .otherwise(1015.0 + 5.0 * F.sin(phase) + 3 * noise)
    )
    # rare anomalies (reference rates, FIXTURES.md §1) keyed off the hash
    h = F.abs(F.hash(i * 7919))
    battery = F.when(h % 1000 < 1, 5 + (h % 15)).when(h % 1000 < 3, 20 + (h % 20)).otherwise(40 + (h % 61))
    signal = F.when(h % 500 < 1, -90 + (h % 15)).when(h % 500 < 3, -75 + (h % 5)).otherwise(-70 + (h % 31))
    value = (
        F.when((sensor_type == "temperature") & (h % 997 == 0), 31.0 + noise)
        .when((sensor_type == "humidity") & (h % 991 == 0), 75.0 + noise)
        .when((sensor_type == "pressure") & (h % 983 == 0), 1045.0 + noise)
        .otherwise(base)
    )

    building = F.lit(BUILDINGS[0])
    return df.select(
        F.concat_ws(
            "_", building, floor.cast("string"), room, sensor_type
        ).alias("sensor_id"),
        sensor_type.alias("sensor_type"),
        F.struct(
            building.alias("building"), floor.alias("floor"), room.alias("room")
        ).alias("location"),
        ts_col.alias("timestamp"),
        F.round(value, 2).alias("value"),
        unit.alias("unit"),
        F.struct(
            battery.cast("int").alias("battery_level"),
            signal.cast("int").alias("signal_strength"),
        ).alias("metadata"),
    )


def reading_stream(spark: SparkSession, rows_per_second: int = 8) -> DataFrame:
    """Unbounded stream of canonical readings (streaming S5)."""
    rate = spark.readStream.format("rate").option("rowsPerSecond", rows_per_second).load()
    return _reading_columns(rate, "value", F.col("timestamp"))


def reading_batch(spark: SparkSession, n: int, start_ts: str = "2026-01-01 00:00:00") -> DataFrame:
    """Bounded batch of canonical readings (batch S5) — fleet sweep
    every 3 s like the reference's cadence."""
    df = spark.range(n)
    ts = F.lit(start_ts).cast("timestamp") + F.make_interval(
        secs=(F.col("id") / FLEET).cast("int") * 3
    )
    return _reading_columns(df, "id", ts)


def reading_json_stream(spark: SparkSession, rows_per_second: int = 8) -> DataFrame:
    """Wire-format variant: one JSON string column ``value`` — feeds the
    ingest path exactly like a Kafka topic would."""
    return reading_stream(spark, rows_per_second).select(
        F.to_json(F.struct("*")).alias("value")
    )
