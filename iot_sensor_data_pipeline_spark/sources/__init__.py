"""Sources: batch parquet tables, JSON schema-on-read ingest, and
(gated) Kafka/JDBC connectors plus a synthetic sensor-stream generator."""

from iot_sensor_data_pipeline_spark.sources.tables import load_table, load_tables, register_views

__all__ = ["load_table", "load_tables", "register_views"]
