"""Oracle-checked queries for the row-level mutation surface
(``sources/mutations.py``): each one copies a testdata table into a
scratch directory, runs the mutation THERE, and returns the mutated
table's content — which the DuckDB oracle re-derives as a pure SELECT
over the ORIGINAL table (``DELETE WHERE p`` == ``WHERE p IS NOT
TRUE``, ``UPDATE`` == ``CASE``, ``MERGE`` == ``CASE ... UNION ALL
inserts``). The differential harness hash-compares the two at two
scale points, so the copy-on-write machinery (probe, routed rewrite,
journaled swap, partition round-trip) is pinned against an engine that
never saw the mutation — only its relational meaning.

The scratch directory is NOT deleted by the query function: the
returned DataFrame is lazy and the caller (driver / harness) collects
it after we return, so the files must outlive this call. Scratch dirs
live under the system temp root and are per-call unique.

All mutations here are against the SCRATCH copy; the shared testdata
parquet is never touched.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iot_sensor_data_pipeline_spark.plans.registry import register, register_extended
from iot_sensor_data_pipeline_spark.sources.tables import load_table


def _scratch(prefix: str) -> str:
    return tempfile.mkdtemp(prefix=f"mutq_{prefix}_") + "/t"


_DEL_ORACLE = """
SELECT doc_id, text, lang, source, n_chars
FROM documents
WHERE (lang = 'de' OR n_chars < 120) IS NOT TRUE
"""


@register(  # rotated INTO the gate in r12 (second r12 rotation)
    "documents_delete_where", oracle=_DEL_ORACLE, tags=("mutation", "delete")
)
def documents_delete_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELETE FROM documents WHERE lang = 'de' OR n_chars < 120 — on a
    scratch copy; the oracle keeps rows where the predicate IS NOT
    TRUE (the exact three-valued complement)."""
    from iot_sensor_data_pipeline_spark.sources.mutations import delete_where

    path = _scratch("del")
    load_table(spark, sf_dir, "documents").repartition(6).write.parquet(path)
    delete_where(
        spark, path, (F.col("lang") == "de") | (F.col("n_chars") < 120)
    )
    return spark.read.parquet(path).select(
        "doc_id", "text", "lang", "source", "n_chars"
    )


_UPD_ORACLE = """
SELECT
  l_orderkey,
  l_linenumber,
  round(CASE WHEN l_returnflag = 'R' AND l_discount > 0.05
             THEN -l_quantity ELSE l_quantity END, 6) AS qty,
  round(CASE WHEN l_returnflag = 'R' AND l_discount > 0.05
             THEN l_tax + 0.01 ELSE l_tax END, 6) AS tax
FROM lineitem
"""


@register_extended(
    "lineitem_update_where", oracle=_UPD_ORACLE, tags=("mutation", "update")
)
def lineitem_update_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UPDATE lineitem SET l_quantity = -l_quantity, l_tax = l_tax +
    0.01 WHERE l_returnflag = 'R' AND l_discount > 0.05 — both RHS
    evaluate against the ORIGINAL row (simultaneous assignment), which
    is exactly the oracle's CASE over the untouched table."""
    from iot_sensor_data_pipeline_spark.sources.mutations import update_where

    path = _scratch("upd")
    load_table(spark, sf_dir, "lineitem").repartition(8).write.parquet(path)
    update_where(
        spark, path,
        (F.col("l_returnflag") == "R") & (F.col("l_discount") > 0.05),
        {"l_quantity": -F.col("l_quantity"),
         "l_tax": F.col("l_tax") + F.lit(0.01)},
    )
    t = spark.read.parquet(path)
    return t.select(
        "l_orderkey", "l_linenumber",
        F.round("l_quantity", 6).alias("qty"),
        F.round("l_tax", 6).alias("tax"),
    )


_MERGE_ORACLE = """
SELECT
  o_orderkey,
  o_custkey,
  CASE WHEN o_orderkey % 97 = 0 THEN '9-MERGED' ELSE o_orderpriority END
    AS o_orderpriority,
  round(CASE WHEN o_orderkey % 97 = 0 THEN o_totalprice + 1000.0
             ELSE o_totalprice END, 6) AS price
FROM orders
UNION ALL
SELECT o_orderkey + 10000000, CAST(NULL AS BIGINT), '9-NEW',
       round(0.0, 6)
FROM orders WHERE o_orderkey % 501 = 0
"""


@register(  # rotated INTO the gate in r12 (second r12 rotation)
    "orders_merge_upsert", oracle=_MERGE_ORACLE, tags=("mutation", "merge")
)
def orders_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO orders: every key divisible by 97 updates priority
    and price; synthetic keys (orderkey + 10M for keys divisible by
    501) insert with NULL o_custkey (a source column the table has but
    the source omits). The oracle re-derives both arms relationally."""
    from iot_sensor_data_pipeline_spark.sources.mutations import merge_into

    path = _scratch("mrg")
    orders = load_table(spark, sf_dir, "orders")
    orders.repartition(6).write.parquet(path)
    updates = orders.where(F.col("o_orderkey") % 97 == 0).select(
        "o_orderkey",
        F.lit("9-MERGED").alias("o_orderpriority"),
        (F.col("o_totalprice") + F.lit(1000.0)).alias("o_totalprice"),
    )
    inserts = orders.where(F.col("o_orderkey") % 501 == 0).select(
        (F.col("o_orderkey") + F.lit(10000000)).alias("o_orderkey"),
        F.lit("9-NEW").alias("o_orderpriority"),
        F.lit(0.0).alias("o_totalprice"),
    )
    merge_into(spark, path, updates.unionByName(inserts), on=["o_orderkey"])
    t = spark.read.parquet(path)
    return t.select(
        "o_orderkey", "o_custkey", "o_orderpriority",
        F.round("o_totalprice", 6).alias("price"),
    )


_DROP_ORACLE = """
SELECT l_orderkey, l_linenumber, l_returnflag
FROM lineitem
WHERE l_returnflag <> 'R'
"""


@register_extended(
    "lineitem_drop_partition", oracle=_DROP_ORACLE,
    tags=("mutation", "partition"),
)
def lineitem_drop_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALTER TABLE DROP PARTITION (l_returnflag='R') on a scratch copy
    hive-partitioned by return flag — the metadata-only retention
    delete; the oracle is the complementary partition filter."""
    from iot_sensor_data_pipeline_spark.sources.mutations import (
        drop_partitions,
    )

    path = _scratch("drop")
    load_table(spark, sf_dir, "lineitem").repartition(4) \
        .write.partitionBy("l_returnflag").parquet(path)
    drop_partitions(spark, path, {"l_returnflag": "R"})
    t = spark.read.parquet(path)
    return t.select(
        "l_orderkey", "l_linenumber",
        F.col("l_returnflag").cast("string").alias("l_returnflag"),
    )


_FILT_REPLICA_ORACLE = """
WITH t1 AS (
  SELECT doc_id, text,
         CASE WHEN source = 'src1' AND lang = 'de' THEN 'en'
              ELSE lang END AS lang,
         source, n_chars
  FROM documents
), t2 AS (
  SELECT doc_id, text,
         CASE WHEN lang = 'en' AND n_chars % 10 = 3 THEN 'xx'
              ELSE lang END AS lang,
         source, n_chars
  FROM t1
), t3 AS (
  SELECT * FROM t2 WHERE (n_chars < 100) IS NOT TRUE
), t4 AS (
  SELECT doc_id, lang, n_chars FROM t3
  UNION ALL
  SELECT doc_id + 10000000,
         CASE WHEN doc_id % 2 = 0 THEN 'en' ELSE 'de' END,
         doc_id % 500
  FROM documents WHERE doc_id % 301 = 0
)
SELECT doc_id, lang, n_chars FROM t4 WHERE lang = 'en'
"""


@register(  # rotated INTO the gate in r13 (VERDICT r12 task 3): the selection-view maintenance claim gets the driver's independent stamp
    "documents_filtered_replica", oracle=_FILT_REPLICA_ORACLE,
    tags=("mutation", "cdf", "replica", "ivm"),
)
def documents_filtered_replica(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A filtered+projected replica (``SELECT doc_id, lang, n_chars
    WHERE lang = 'en'``) follows the upstream through its change feed:
    an UPDATE that moves rows INTO 'en', an UPDATE that moves rows OUT
    of it, a DELETE, and a MERGE inserting a mix of languages — the
    replica gains the entrants, loses the leavers, and never sees the
    non-'en' inserts. The oracle re-derives the final replica as the
    same SELECT over the relationally-composed mutation chain; hash
    equality pins the selection-view maintenance exactly."""
    from iot_sensor_data_pipeline_spark.sources.mutations import (
        delete_where,
        merge_into,
        sync_from_change_feed,
        update_where,
    )

    src = _scratch("fr_src")
    dst = _scratch("fr_dst")
    docs = load_table(spark, sf_dir, "documents")
    docs.repartition(6).write.parquet(src)
    # baseline: the same filtered/projected SELECT, before any mutation
    docs.where(F.col("lang") == "en").select(
        "doc_id", "lang", "n_chars"
    ).repartition(4).write.parquet(dst)

    update_where(
        spark, src, (F.col("source") == "src1") & (F.col("lang") == "de"),
        {"lang": F.lit("en")}, change_feed=True,
    )
    update_where(
        spark, src, (F.col("lang") == "en") & (F.col("n_chars") % 10 == 3),
        {"lang": F.lit("xx")}, change_feed=True,
    )
    delete_where(spark, src, F.col("n_chars") < 100, change_feed=True)
    inserts = docs.where(F.col("doc_id") % 301 == 0).select(
        (F.col("doc_id") + F.lit(10_000_000)).alias("doc_id"),
        F.when(F.col("doc_id") % 2 == 0, "en").otherwise("de").alias("lang"),
        (F.col("doc_id") % 500).alias("n_chars"),
    )
    merge_into(spark, src, inserts, on=["doc_id"], change_feed=True)

    sync_from_change_feed(
        spark, src, dst, on=["doc_id"],
        where="lang = 'en'", columns=["doc_id", "lang", "n_chars"],
    )
    return spark.read.parquet(dst).select("doc_id", "lang", "n_chars")


_SCHEMA_EVO_ORACLE = """
SELECT o_orderkey, o_orderstatus,
       CASE WHEN o_orderkey % 97 = 0 THEN 'web' END AS o_channel
FROM orders
UNION ALL
SELECT o_orderkey + 10000000, CAST(NULL AS VARCHAR), 'api'
FROM orders WHERE o_orderkey % 501 = 0
"""


@register_extended(
    "orders_merge_schema_evolution", oracle=_SCHEMA_EVO_ORACLE,
    tags=("mutation", "merge", "schema-evolution"),
)
def orders_merge_schema_evolution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MERGE with ``allow_new_columns=True`` (r13): the source carries
    ``o_channel``, a column the table lacks — matched keys (%97) gain
    'web', inserted keys (+10M for %501) land with 'api', every
    untouched row reads the column as NULL through the union-schema
    read. The oracle is the additive ALTER TABLE's relational meaning
    over the original table; a hash match pins that widening touched
    exactly the merged rows and dropped nothing."""
    from iot_sensor_data_pipeline_spark.sources.mutations import merge_into

    path = _scratch("evo")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    orders.repartition(6).write.parquet(path)
    updates = orders.where(F.col("o_orderkey") % 97 == 0).select(
        "o_orderkey", F.lit("web").alias("o_channel")
    )
    inserts = orders.where(F.col("o_orderkey") % 501 == 0).select(
        (F.col("o_orderkey") + F.lit(10_000_000)).alias("o_orderkey"),
        F.lit("api").alias("o_channel"),
    )
    merge_into(
        spark, path, updates.unionByName(inserts), on=["o_orderkey"],
        allow_new_columns=True,
    )
    return spark.read.option("mergeSchema", "true").parquet(path).select(
        "o_orderkey", "o_orderstatus", "o_channel"
    )


_TIME_TRAVEL_ORACLE = """
SELECT o_orderkey, o_orderstatus, o_orderpriority,
       round(o_totalprice, 2) AS price
FROM orders
WHERE (o_orderstatus = 'O' AND o_totalprice > 250000) IS NOT TRUE
"""


@register(  # rotated INTO the gate in r13 (VERDICT r12 task 3): the feed-inversion claim gets the driver's independent stamp
    "orders_time_travel", oracle=_TIME_TRAVEL_ORACLE,
    tags=("mutation", "cdf", "time-travel"),
)
def orders_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feed-based time travel: three feed-carried mutations land
    (DELETE, then a price UPDATE, then a MERGE with update + insert
    arms), and ``read_table_as_of(version=1)`` reconstructs the state
    after ONLY the delete — the oracle is the delete's relational
    meaning over the original table, so a hash match proves the later
    two mutations were inverted exactly (update pre-images restored,
    merged updates reverted, inserts dropped) from the feed alone."""
    from iot_sensor_data_pipeline_spark.sources.mutations import (
        delete_where,
        merge_into,
        read_table_as_of,
        update_where,
    )

    path = _scratch("tt")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice"
    )
    orders.repartition(6).write.parquet(path)
    delete_where(
        spark, path,
        (F.col("o_orderstatus") == "O") & (F.col("o_totalprice") > 250000),
        change_feed=True,
    )
    update_where(
        spark, path, F.col("o_orderkey") % 7 == 0,
        {"o_totalprice": F.col("o_totalprice") + F.lit(111.0)},
        change_feed=True,
    )
    upd = orders.where(F.col("o_orderkey") % 97 == 0).select(
        "o_orderkey", F.lit("9-TT").alias("o_orderpriority")
    )
    ins = orders.where(F.col("o_orderkey") % 501 == 0).select(
        (F.col("o_orderkey") + F.lit(20_000_000)).alias("o_orderkey"),
        F.lit("9-TTNEW").alias("o_orderpriority"),
    )
    merge_into(
        spark, path, upd.unionByName(ins), on=["o_orderkey"],
        change_feed=True,
    )
    t = read_table_as_of(spark, path, ["o_orderkey"], 1)
    return t.select(
        "o_orderkey", "o_orderstatus", "o_orderpriority",
        F.round("o_totalprice", 2).alias("price"),
    )
