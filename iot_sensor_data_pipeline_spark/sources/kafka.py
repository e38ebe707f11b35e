"""Kafka source/sink wrappers (S1-S4, K4 in SURVEY.md §2).

Thin, *configured* wrappers — the engine does not reimplement Kafka
plumbing (SURVEY.md §7 anti-goals). Differences from the reference's
raw readStream calls (data_persistance.py:68-73, alert_detector.py:71-79,
data_agregator.py:57-62):

- ``startingOffsets`` defaults to ``earliest`` — combined with a
  mandatory checkpoint this gives at-least-once across restarts
  instead of the reference's restart data loss (latest + no checkpoint).
- ``maxOffsetsPerTrigger`` bounds the first (and every) micro-batch;
  the reference's unbounded first batch OOMs on a backlogged topic.
- one reader is shared by all consumers of a topic (the engine fans
  out in foreachBatch) instead of one subscription per sink.

Requires the spark-sql-kafka package on the classpath; the local test
image has no Kafka jar or broker, so these are exercised only for
option construction (see tests) and in production deployments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def kafka_reader_options(
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = 100_000,
    fail_on_data_loss: bool = False,
) -> dict[str, str]:
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
        "failOnDataLoss": str(fail_on_data_loss).lower(),
    }
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    return opts


def read_stream(spark: SparkSession, bootstrap_servers: str, topic: str, **kw) -> DataFrame:
    """Kafka stream scan -> raw (key, value, topic, partition, offset,
    timestamp) rows; pair with sources.json_ingest for schema-on-read."""
    return (
        spark.readStream.format("kafka")
        .options(**kafka_reader_options(bootstrap_servers, topic, **kw))
        .load()
    )


def kafka_batch_sink(bootstrap_servers: str, topic: str):
    """foreachBatch sink writing (key, value) rows to a topic — used in
    the single-read multi-sink fan-out (streaming/jobs.py) instead of a
    second writeStream subscription."""

    def sink(batch_df: DataFrame) -> None:
        (
            batch_df.write.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("topic", topic)
            .save()
        )

    return sink
