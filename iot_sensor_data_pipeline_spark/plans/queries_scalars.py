"""Scalar function surface: datetime, string, math (SURVEY.md §7
milestone 2 "scalar string/date/math functions").

The reference's only scalar work is casts + CASE (SURVEY.md §2.2); a
same-capabilities engine needs the full scalar toolbox. All built-in
JVM expressions — fully codegen'd, no Python in the data path.

Registry economics: the driver gate caps at 50 queries, so the scalar
surface ships as TAGGED UNIONS — the datetime and math branches share
one entry (``scalar_functions_union``), and the string/regex branch
carries the token-explode branch (``documents_string_scalars``). Each
branch keeps its exact former projection; the other branch's columns
are typed NULLs on both engines, so nothing about the per-function
checking weakened — see COVERAGE.md's consolidation map.

Oracle notes: function RETURN TYPES differ between engines even when
values agree (DuckDB year() -> BIGINT vs Spark INT; DuckDB floor() ->
DOUBLE vs Spark BIGINT), so the oracle casts to Spark's types.
Day-of-week numbering differs (DuckDB 0=Sunday, Spark 1=Sunday) — the
oracle compensates explicitly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iot_sensor_data_pipeline_spark.plans.registry import register, register_extended
from iot_sensor_data_pipeline_spark.sources.tables import load_table

_SCALARS_ORACLE = """
SELECT
  'dt' AS src,
  event_id,
  CAST(NULL AS BIGINT) AS l_orderkey,
  CAST(NULL AS BIGINT) AS l_linenumber,
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
  CAST(quarter(ts) AS INTEGER) AS q,
  CAST(NULL AS DOUBLE) AS net_price,
  CAST(NULL AS DOUBLE) AS disc_dev,
  CAST(NULL AS BIGINT) AS qty_floor,
  CAST(NULL AS BIGINT) AS qty_ceil7,
  CAST(NULL AS DOUBLE) AS price_sqrt,
  CAST(NULL AS DOUBLE) AS price_ln,
  CAST(NULL AS DOUBLE) AS tax_sq,
  CAST(NULL AS BIGINT) AS pk_mod,
  CAST(NULL AS DOUBLE) AS max_rate,
  CAST(NULL AS DOUBLE) AS min_rate
FROM events
UNION ALL
SELECT
  'math' AS src,
  CAST(NULL AS BIGINT) AS event_id,
  l_orderkey,
  CAST(l_linenumber AS BIGINT) AS l_linenumber,
  CAST(NULL AS INTEGER) AS y,
  CAST(NULL AS INTEGER) AS mo,
  CAST(NULL AS INTEGER) AS d,
  CAST(NULL AS INTEGER) AS h,
  CAST(NULL AS INTEGER) AS mi,
  CAST(NULL AS INTEGER) AS s,
  CAST(NULL AS INTEGER) AS dow,
  CAST(NULL AS DATE) AS event_date,
  CAST(NULL AS TIMESTAMP) AS day_start,
  CAST(NULL AS TIMESTAMP) AS ts_plus,
  CAST(NULL AS INTEGER) AS days_to_2030,
  CAST(NULL AS TIMESTAMP) AS plus_3m,
  CAST(NULL AS DATE) AS month_end,
  CAST(NULL AS TIMESTAMP) AS quarter_start,
  CAST(NULL AS INTEGER) AS q,
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


@register_extended("scalar_functions_union", oracle=_SCALARS_ORACLE, tags=("scalars", "P4", "datetime"))
def scalar_functions_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime + math scalar surface as one tagged union (formerly
    the separate events_datetime_scalars and lineitem_math_scalars
    entries — merged to free registry slots for the analytics gate;
    both branches' projections are byte-identical to their former
    standalone forms, padded with typed NULLs)."""
    events = load_table(spark, sf_dir, "events")
    li = load_table(spark, sf_dir, "lineitem")

    null_l = F.lit(None).cast("long")
    null_i = F.lit(None).cast("int")
    null_d = F.lit(None).cast("double")
    null_date = F.lit(None).cast("date")
    null_ts = F.lit(None).cast("timestamp_ntz")

    dt = events.select(
        F.lit("dt").alias("src"),
        "event_id",
        null_l.alias("l_orderkey"),
        null_l.alias("l_linenumber"),
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
        null_d.alias("net_price"),
        null_d.alias("disc_dev"),
        null_l.alias("qty_floor"),
        null_l.alias("qty_ceil7"),
        null_d.alias("price_sqrt"),
        null_d.alias("price_ln"),
        null_d.alias("tax_sq"),
        null_l.alias("pk_mod"),
        null_d.alias("max_rate"),
        null_d.alias("min_rate"),
    )
    math = li.select(
        F.lit("math").alias("src"),
        null_l.alias("event_id"),
        "l_orderkey",
        F.col("l_linenumber").cast("long").alias("l_linenumber"),
        null_i.alias("y"),
        null_i.alias("mo"),
        null_i.alias("d"),
        null_i.alias("h"),
        null_i.alias("mi"),
        null_i.alias("s"),
        null_i.alias("dow"),
        null_date.alias("event_date"),
        null_ts.alias("day_start"),
        null_ts.alias("ts_plus"),
        null_i.alias("days_to_2030"),
        null_ts.alias("plus_3m"),
        null_date.alias("month_end"),
        null_ts.alias("quarter_start"),
        null_i.alias("q"),
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
    return dt.unionByName(math)


_STRING_ORACLE = """
SELECT
  'str' AS src,
  doc_id,
  CAST(NULL AS VARCHAR)              AS token,
  CAST(NULL AS BIGINT)               AS n,
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
UNION ALL
SELECT
  'tokens' AS src,
  CAST(NULL AS BIGINT) AS doc_id,
  token,
  count(*) AS n,
  CAST(NULL AS BIGINT)  AS n_len,
  CAST(NULL AS VARCHAR) AS head_upper,
  CAST(NULL AS VARCHAR) AS tag,
  CAST(NULL AS VARCHAR) AS snake,
  CAST(NULL AS INTEGER) AS data_pos,
  CAST(NULL AS VARCHAR) AS trimmed,
  CAST(NULL AS INTEGER) AS has_query,
  CAST(NULL AS VARCHAR) AS lang_padded,
  CAST(NULL AS VARCHAR) AS second_word,
  CAST(NULL AS INTEGER) AS n_da_words,
  CAST(NULL AS VARCHAR) AS devoweled_head,
  CAST(NULL AS INTEGER) AS starts_the
FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
GROUP BY token
"""


@register_extended("documents_string_scalars", oracle=_STRING_ORACLE, tags=("scalars", "regex", "array"))
def documents_string_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String + regex function surface over documents.text, plus the
    split -> explode -> re-aggregate token-count branch (formerly the
    separate documents_token_counts entry — merged to free a registry
    slot for the analytics gate). Patterns kept to the
    RE2-and-Java-compatible subset."""
    docs = load_table(spark, sf_dir, "documents")
    strs = docs.select(
        F.lit("str").alias("src"),
        "doc_id",
        F.lit(None).cast("string").alias("token"),
        F.lit(None).cast("long").alias("n"),
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
    tokens = (
        docs.select(F.explode(F.split("text", " ", -1)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.lit("tokens").alias("src"),
            F.lit(None).cast("long").alias("doc_id"),
            "token",
            "n",
            F.lit(None).cast("int").alias("n_len"),
            F.lit(None).cast("string").alias("head_upper"),
            F.lit(None).cast("string").alias("tag"),
            F.lit(None).cast("string").alias("snake"),
            F.lit(None).cast("int").alias("data_pos"),
            F.lit(None).cast("string").alias("trimmed"),
            F.lit(None).cast("int").alias("has_query"),
            F.lit(None).cast("string").alias("lang_padded"),
            F.lit(None).cast("string").alias("second_word"),
            F.lit(None).cast("int").alias("n_da_words"),
            F.lit(None).cast("string").alias("devoweled_head"),
            F.lit(None).cast("int").alias("starts_the"),
        )
    )
    return strs.unionByName(tokens)
