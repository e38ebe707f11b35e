"""Scalar function surface: datetime, string, math (SURVEY.md §7
milestone 2 "scalar string/date/math functions").

The reference's only scalar work is casts + CASE (SURVEY.md §2.2); a
same-capabilities engine needs the full scalar toolbox. All built-in
JVM expressions — fully codegen'd, no Python in the data path.

Oracle notes: function RETURN TYPES differ between engines even when
values agree (DuckDB year() -> BIGINT vs Spark INT; DuckDB floor() ->
DOUBLE vs Spark BIGINT), so the oracle casts to Spark's types.
Day-of-week numbering differs (DuckDB 0=Sunday, Spark 1=Sunday) — the
oracle compensates explicitly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iot_sensor_data_pipeline_spark.plans.registry import register
from iot_sensor_data_pipeline_spark.sources.tables import load_table

_DATETIME_ORACLE = """
SELECT
  event_id,
  CAST(year(ts)  AS INTEGER) AS y,
  CAST(month(ts) AS INTEGER) AS mo,
  CAST(day(ts)   AS INTEGER) AS d,
  CAST(hour(ts)  AS INTEGER) AS h,
  CAST(minute(ts) AS INTEGER) AS mi,
  CAST(second(ts) AS INTEGER) AS s,
  CAST(dayofweek(ts) + 1 AS INTEGER) AS dow,
  CAST(ts AS DATE) AS event_date,
  CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_start,
  CAST(ts AS TIMESTAMP) + INTERVAL '90 minutes' AS ts_plus,
  CAST(datediff('day', CAST(ts AS DATE), DATE '2030-01-01') AS INTEGER) AS days_to_2030,
  CAST(CAST(ts AS TIMESTAMP) + INTERVAL 3 MONTH AS TIMESTAMP) AS plus_3m,
  CAST(last_day(CAST(ts AS DATE)) AS DATE) AS month_end,
  CAST(date_trunc('quarter', ts) AS TIMESTAMP) AS quarter_start,
  CAST(quarter(ts) AS INTEGER) AS q
FROM events
"""


@register("events_datetime_scalars", oracle=_DATETIME_ORACLE, tags=("scalars", "P4", "datetime"))
def events_datetime_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime extraction/truncation/arithmetic over event time
    (absorbed the former orders_date_arithmetic surface: datediff,
    add_months, last_day, quarter truncation — one registry entry per
    grain keeps the registry inside the driver's 50-query gate)."""
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.year("ts").alias("y"),
        F.month("ts").alias("mo"),
        F.dayofmonth("ts").alias("d"),
        F.hour("ts").alias("h"),
        F.minute("ts").alias("mi"),
        F.second("ts").alias("s"),
        F.dayofweek("ts").alias("dow"),
        F.col("ts").cast("date").alias("event_date"),
        F.date_trunc("day", "ts").alias("day_start"),
        (F.col("ts") + F.expr("INTERVAL 90 MINUTES")).alias("ts_plus"),
        F.datediff(F.lit("2030-01-01").cast("date"), F.col("ts").cast("date")).alias(
            "days_to_2030"
        ),
        (F.col("ts") + F.expr("INTERVAL 3 MONTH")).alias("plus_3m"),
        F.last_day(F.col("ts").cast("date")).alias("month_end"),
        F.date_trunc("quarter", "ts").alias("quarter_start"),
        F.quarter("ts").alias("q"),
    )


_STRING_ORACLE = """
SELECT
  doc_id,
  length(text)                       AS n_len,
  upper(substr(text, 1, 12))         AS head_upper,
  lower(source) || '/' || lang       AS tag,
  replace(substr(text, 1, 20), ' ', '_') AS snake,
  CAST(strpos(text, 'data') AS INTEGER) AS data_pos,
  trim(substr(text, 1, 15))          AS trimmed,
  CASE WHEN text LIKE '%query%' THEN 1 ELSE 0 END AS has_query,
  lpad(lang, 5, '-')                 AS lang_padded,
  regexp_extract(text, '([a-z]+) ([a-z]+)', 2)             AS second_word,
  CAST(len(regexp_extract_all(text, 'da[a-z]+')) AS INTEGER) AS n_da_words,
  regexp_replace(text, '[aeiou]', '', 'g')[1:20]           AS devoweled_head,
  CASE WHEN regexp_matches(text, '^the ') THEN 1 ELSE 0 END AS starts_the
FROM documents
"""


@register("documents_string_scalars", oracle=_STRING_ORACLE, tags=("scalars", "regex"))
def documents_string_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String + regex function surface over documents.text (one entry
    per grain: absorbed the former documents_regex_scalars so the
    registry fits the driver's 50-query gate). Patterns kept to the
    RE2-and-Java-compatible subset."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.length("text").alias("n_len"),
        F.upper(F.substring("text", 1, 12)).alias("head_upper"),
        F.concat(F.lower("source"), F.lit("/"), F.col("lang")).alias("tag"),
        F.replace(F.substring("text", 1, 20), F.lit(" "), F.lit("_")).alias("snake"),
        F.instr("text", "data").alias("data_pos"),
        F.trim(F.substring("text", 1, 15)).alias("trimmed"),
        F.when(F.col("text").like("%query%"), 1).otherwise(0).alias("has_query"),
        F.lpad("lang", 5, "-").alias("lang_padded"),
        F.regexp_extract("text", r"([a-z]+) ([a-z]+)", 2).alias("second_word"),
        F.size(F.regexp_extract_all("text", F.lit(r"da[a-z]+"), 0)).alias("n_da_words"),
        F.substring(F.regexp_replace("text", r"[aeiou]", ""), 1, 20).alias("devoweled_head"),
        F.when(F.col("text").rlike(r"^the "), 1).otherwise(0).alias("starts_the"),
    )


_MATH_ORACLE = """
SELECT
  l_orderkey,
  l_linenumber,
  l_extendedprice * (1 - l_discount)          AS net_price,
  abs(l_discount - 0.05)                       AS disc_dev,
  CAST(floor(l_quantity) AS BIGINT)            AS qty_floor,
  CAST(ceil(l_quantity / 7) AS BIGINT)         AS qty_ceil7,
  sqrt(l_extendedprice)                        AS price_sqrt,
  ln(l_extendedprice + 1)                      AS price_ln,
  power(l_tax + 1, 2)                          AS tax_sq,
  CAST(l_partkey % 97 AS BIGINT)               AS pk_mod,
  greatest(l_discount, l_tax)                  AS max_rate,
  least(l_discount, l_tax)                     AS min_rate
FROM lineitem
"""


@register("lineitem_math_scalars", oracle=_MATH_ORACLE, tags=("scalars",))
def lineitem_math_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math function surface over lineitem."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.floor("l_quantity").alias("qty_floor"),
        F.ceil(F.col("l_quantity") / 7).alias("qty_ceil7"),
        F.sqrt("l_extendedprice").alias("price_sqrt"),
        F.log(F.col("l_extendedprice") + 1).alias("price_ln"),
        F.pow(F.col("l_tax") + 1, 2).alias("tax_sq"),
        (F.col("l_partkey") % 97).alias("pk_mod"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
    )
