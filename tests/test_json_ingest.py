"""JSON schema-on-read path (P1-P4, P12-P14): parse, flatten,
PERMISSIVE null semantics, re-nest + serialize roundtrip."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from iot_sensor_data_pipeline_spark.sources.json_ingest import (
    ingest_readings,
    renest_reading,
    serialize_json,
)

GOOD = {
    "sensor_id": "A_1_100_temperature",
    "sensor_type": "temperature",
    "location": {"building": "A", "floor": 1, "room": "100"},
    "timestamp": "2026-08-13T03:46:00.123456",
    "value": 22.47,
    "unit": "celsius",
    "metadata": {"battery_level": 87, "signal_strength": -55},
}


def _df(spark, payloads):
    return spark.createDataFrame([(p,) for p in payloads], "value string")


def test_parse_flatten_good_row(spark):
    row = ingest_readings(_df(spark, [json.dumps(GOOD)])).collect()[0]
    assert row.sensor_id == "A_1_100_temperature"
    assert row.value == 22.47
    assert row.building == "A" and row.floor == 1 and row.room == "100"
    assert row.battery_level == 87 and row.signal_strength == -55
    assert row.timestamp.isoformat().startswith("2026-08-13T03:46:00.123456")


def test_permissive_corrupt_json_yields_nulls(spark):
    # the reference's entire bad-record story (SURVEY.md §1.2): corrupt
    # JSON -> null struct -> null fields, no exception
    rows = ingest_readings(_df(spark, ["{not json", json.dumps(GOOD)])).collect()
    bad = [r for r in rows if r.sensor_id is None]
    good = [r for r in rows if r.sensor_id is not None]
    assert len(bad) == 1 and len(good) == 1
    assert all(v is None for v in bad[0].asDict().values())


def test_permissive_missing_fields_yield_nulls(spark):
    partial = {"sensor_id": "X", "value": 1.5}
    row = ingest_readings(_df(spark, [json.dumps(partial)])).collect()[0]
    assert row.sensor_id == "X" and row.value == 1.5
    assert row.unit is None and row.building is None and row.battery_level is None


def test_type_mismatch_nulls_only_that_field(spark):
    bad_value = dict(GOOD, value="not-a-number")
    row = ingest_readings(_df(spark, [json.dumps(bad_value)])).collect()[0]
    assert row.value is None
    assert row.sensor_id == "A_1_100_temperature"  # other fields survive


def test_renest_serialize_roundtrip(spark):
    flat = ingest_readings(_df(spark, [json.dumps(GOOD)]))
    wire = serialize_json(renest_reading(flat), key_col="sensor_id").collect()[0]
    assert wire.key == "A_1_100_temperature"
    payload = json.loads(wire.value)
    assert payload["location"] == {"building": "A", "floor": 1, "room": "100"}
    assert payload["metadata"] == {"battery_level": 87, "signal_strength": -55}
    assert payload["value"] == 22.47


def test_maptype_schema_on_read(spark):
    # schema-on-read into MapType: unknown/dynamic JSON keys land in a
    # map instead of a fixed struct — the other half of P2's surface
    from pyspark.sql import types as T

    payloads = ['{"a": 1.5, "b": 2.0}', '{"x": 9.0}']
    df = spark.createDataFrame([(p,) for p in payloads], "value string").select(
        F.from_json("value", T.MapType(T.StringType(), T.DoubleType())).alias("m")
    )
    rows = df.select(
        F.map_keys("m").alias("ks"),
        F.element_at("m", "a").alias("a"),
        F.size("m").alias("n"),
    ).collect()
    assert sorted(rows[0].ks) == ["a", "b"] and rows[0].a == 1.5 and rows[0].n == 2
    assert rows[1].ks == ["x"] and rows[1].a is None


def test_map_transform_functions(spark):
    df = spark.createDataFrame([({"a": 1, "b": 2},)], "m map<string,int>")
    out = df.select(
        F.map_filter("m", lambda k, v: v > 1).alias("big"),
        F.transform_values("m", lambda k, v: v * 10).alias("scaled"),
        F.explode("m"),  # -> key, value rows
    ).collect()
    assert out[0].big == {"b": 2}
    assert out[0].scaled == {"a": 10, "b": 20}


def test_ingest_collapses_to_single_projection(spark):
    # Catalyst collapses parse -> flatten -> select into ONE Project of
    # from_json(...).field extractions over the source: no intermediate
    # struct materialization, single parse per row
    df = ingest_readings(_df(spark, [json.dumps(GOOD)])).select("sensor_id")
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("from_json") == 1
    assert plan.count("Project") == 1


def test_variant_ingest_parity_with_struct_path(spark):
    """The VARIANT-based ingest produces the same 10 typed columns as
    the StructType path on valid wire JSON; unknown producer fields
    survive in the variant; malformed text nulls, never fails."""
    import json as _json

    from pyspark.sql import functions as F

    from iot_sensor_data_pipeline_spark.sources.json_ingest import (
        ingest_readings,
        ingest_readings_variant,
    )

    reading = {
        "sensor_id": "A_1_100_temperature",
        "sensor_type": "temperature",
        "location": {"building": "A", "floor": 1, "room": "100"},
        "timestamp": "2026-01-01T10:00:00",
        "value": 22.5,
        "unit": "celsius",
        "metadata": {"battery_level": 87, "signal_strength": -55},
        "future_field": {"added_by": "a newer producer"},  # unknown
    }
    raw = spark.createDataFrame(
        [(_json.dumps(reading),), ("{not json",)], "value string"
    )
    via_struct = ingest_readings(raw).collect()
    via_variant = ingest_readings_variant(raw).collect()
    cols = [
        "sensor_id", "sensor_type", "value", "unit", "timestamp",
        "building", "floor", "room", "battery_level", "signal_strength",
    ]
    s_rows = sorted((tuple(getattr(r, c) for c in cols) for r in via_struct), key=repr)
    v_rows = sorted((tuple(getattr(r, c) for c in cols) for r in via_variant), key=repr)
    assert s_rows == v_rows  # incl. the all-null malformed row
    good = next(r for r in via_variant if r.sensor_id is not None)
    # the open content model keeps what the schema path would drop
    kept = (
        ingest_readings_variant(raw)
        .where(F.col("sensor_id").isNotNull())
        .select(
            F.variant_get("v", "$.future_field.added_by", "string").alias("x")
        )
        .collect()
    )
    assert kept[0].x == "a newer producer"
    assert good.value == 22.5 and good.floor == 1


def test_variant_ingest_tolerates_type_drift(spark):
    """A producer that sends a string where a number is expected must
    null THAT column, never fail the batch (try_variant_get)."""
    import json as _json

    from iot_sensor_data_pipeline_spark.sources.json_ingest import (
        ingest_readings_variant,
    )

    drifted = {
        "sensor_id": "A_1_100_temperature",
        "value": "not-a-number",       # type drift
        "location": {"floor": "two"},  # type drift, nested
        "metadata": {"battery_level": 90},
    }
    raw = spark.createDataFrame([(_json.dumps(drifted),)], "value string")
    rows = ingest_readings_variant(raw).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.sensor_id == "A_1_100_temperature"
    assert r.value is None and r.floor is None  # drifted fields null
    assert r.battery_level == 90  # clean fields still extract
