"""iot_sensor_data_pipeline_spark — a PySpark-native analytics engine.

A brand-new engine with the query/data-processing capabilities of the
reference IoT sensor pipeline (oulrich-ops/iot-sensor-data-pipeline):
streaming ingest of semi-structured sensor readings, schema-on-read JSON
parsing, rule-based alert derivation, event-time windowed aggregation,
and multi-sink fan-out — re-expressed as composable, idiomatic Spark
(DataFrame/SQL + Structured Streaming), then extended with a general
relational operator surface and large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal columns).

Design rules (see SURVEY.md §7):
- declarative DataFrame/SQL everywhere; Catalyst does the optimizing
- batch and streaming share the same DataFrame -> DataFrame transforms
- rules are data (broadcast dim tables), not hand-written when-chains
- UDFs only where built-ins genuinely can't express the semantics,
  and then always Arrow-vectorized (pandas_udf / mapInPandas)
"""

from iot_sensor_data_pipeline_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
