"""SparkSession factory.

Replaces the reference's session builder (spark_processing/utils.py:4-14),
which configured only app name + Kafka/JDBC jars. Here the session is
tuned for analytics at scale:

- AQE on (runtime re-planning: partition coalescing, skew-join splitting,
  broadcast-join conversion after runtime stats).
- shuffle partitions sized to the local core count instead of the 200
  default (the reference left it untuned, SURVEY.md §4). On a real
  cluster this should be ~2-3x total executor cores or left to AQE
  with a high initial partition number.
- Arrow enabled for any pandas interchange (vectorized UDF path).
- session timezone pinned to UTC so event-time semantics are stable
  and comparable against external systems.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(
    app_name: str = "iot_sensor_data_pipeline_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    Local-mode testing uses ``local[$SPARK_GRAFT_CPUS]``; on a cluster,
    pass ``master=None`` with an externally-configured master URL and
    the same conf defaults apply.
    """
    cpus = int(DEFAULT_CPUS)
    master = master or f"local[{cpus}]"
    n_shuffle = shuffle_partitions if shuffle_partitions is not None else cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # streaming: RocksDB-backed state survives large keyspaces at
        # scale (in-memory HDFSBackedStateStore OOMs at 100TB cardinality)
        .config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)

    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
