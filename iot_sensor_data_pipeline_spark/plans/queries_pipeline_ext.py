"""Extended LLM-pipeline queries (beyond the driver gate's 50 slots),
hash-checked against DuckDB by tests/test_span_dedup.py with the
driver's compare contract."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iot_sensor_data_pipeline_spark.operators.span_dedup import remove_duplicated_spans
from iot_sensor_data_pipeline_spark.plans.registry import register_extended
from iot_sensor_data_pipeline_spark.sources.tables import load_table

_K = 8

# DuckDB expresses the same algorithm on span STRINGS (no xxhash64 in
# DuckDB); Spark keys on 64-bit span hashes — the scale choice the
# operator documents — so a hash collision at sf0.01 (~23k spans,
# P ~ 2^-35) would surface here as a diff.
_SPAN_DEDUP_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS t
  FROM documents
), docs AS (
  SELECT doc_id, t, len(t) AS n FROM toks
), spans AS (
  SELECT doc_id, i, array_to_string(list_slice(t, i, i + {_K} - 1), chr(31)) AS span
  FROM (SELECT doc_id, t, unnest(generate_series(1, n - {_K} + 1)) AS i
        FROM docs WHERE n >= {_K})
), dup AS (
  SELECT span FROM spans GROUP BY span HAVING count(*) >= 2
), dup_starts AS (
  SELECT s.doc_id, s.i FROM spans s JOIN dup USING (span)
), tokpos AS (
  SELECT doc_id, j, t[j] AS tok
  FROM (SELECT doc_id, t, unnest(generate_series(1, n)) AS j FROM docs)
), kept AS (
  SELECT doc_id, j, tok FROM tokpos p
  WHERE NOT EXISTS (
    SELECT 1 FROM dup_starts d
    WHERE d.doc_id = p.doc_id AND d.i <= p.j AND p.j < d.i + {_K}
  )
)
SELECT d.doc_id,
       coalesce((SELECT string_agg(tok, ' ' ORDER BY j)
                 FROM kept x WHERE x.doc_id = d.doc_id), '') AS text_clean,
       cast(d.n AS BIGINT) AS n_tokens,
       cast(d.n - (SELECT count(*) FROM kept x WHERE x.doc_id = d.doc_id)
            AS BIGINT) AS n_removed
FROM docs d
"""


@register_extended(
    "documents_span_dedup", oracle=_SPAN_DEDUP_ORACLE, tags=("pipeline", "dedup")
)
def documents_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    out = remove_duplicated_spans(docs, id_col="doc_id", text_col="text", k=_K)
    return out.select(
        "doc_id",
        "text_clean",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_removed").cast("long").alias("n_removed"),
    )
