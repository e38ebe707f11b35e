"""Eval-set decontamination: remove (or scrub) training documents that
share long token n-grams with a held-out evaluation set — the standard
pre-training hygiene step (GPT-3's appendix C removes 13-gram overlaps
with its benchmarks; PaLM/Llama recipes do the same), without which
benchmark scores measure memorization, not capability.

Division of labor with ``curation.contamination_tags``: that operator
is the DETECTION METRIC (per-doc shared-shingle counts over the
string-shingle relations, for audit dashboards and threshold tuning);
this module is the ACTING GATE — it drops or surgically scrubs, keyed
on the span-dedup 8-byte window hashes so its evidence relation
(id, start, span_hash) composes directly with the interval-merge cut
and with persisted span indexes.

Spark-first shape — this is span_dedup's window machinery pointed at a
second relation instead of at the corpus itself:

1. eval k-gram keys   — every length-k token window of the eval set,
                        hashed to 8 bytes (xxhash64 over the
                        separator-joined slice, the exact
                        ``span_dedup._doc_spans`` construction, so the
                        two operators' keys are interchangeable);
2. contaminated spans — the training side windows semi-join the eval
                        key set. Eval sets are benchmark-sized
                        (thousands of documents), so the distinct eval
                        keys broadcast by PREMISE (``broadcast_eval``
                        opts out for a pathologically large eval
                        relation — then it's a plain shuffled
                        semi-join on 8-byte keys);
3a. drop mode         — any hit disqualifies the whole training doc
                        (GPT-3 semantics): one anti-join on the id;
3b. scrub mode        — only the overlapping spans are cut, the rest
                        of the document survives (PaLM-style section
                        removal): the positions feed span_dedup's
                        interval-merge cut, so overlapping hits
                        coalesce and the membership test is O(#regions)
                        per doc.

Everything is JVM-side (codegen transform/slice/xxhash64 + joins);
the shuffle carries 8-byte hashes and int positions, never text. At
100 TB the train side is one window pass — the same unavoidable
O(total tokens) as span dedup — and the eval side is constant.

A 64-bit collision can only over-remove (flag a clean span as
contaminated), never leak contamination through; odds are
~|train windows| x |eval keys| / 2^64 — negligible at any real size,
and the conservative direction for a decontamination gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from iot_sensor_data_pipeline_spark.operators.span_dedup import (
    _cut_documents,
    _doc_spans,
)


def eval_gram_keys(
    eval_docs: DataFrame, text_col: str = "text", k: int = 13
) -> DataFrame:
    """The distinct 8-byte k-gram keys of the eval set:
    ``(span_hash bigint)``. Persist this once per benchmark suite and
    reuse across training batches — the eval side never needs
    re-windowing."""
    return (
        _doc_spans(
            eval_docs.select(
                F.monotonically_increasing_id().alias("__eid"),
                F.col(text_col),
            ),
            "__eid",
            text_col,
            k,
        )
        .select("span_hash")
        .distinct()
    )


def contaminated_spans(
    train: DataFrame,
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 13,
    broadcast_eval: bool = True,
) -> DataFrame:
    """All (id, start, span_hash) training-side window positions whose
    k-gram also occurs in the eval set — the raw evidence relation
    (feed it to an audit report, or let :func:`decontaminate` act on
    it). ``eval_docs`` may also be an :func:`eval_gram_keys` output
    (any relation carrying ``span_hash`` is used as-is)."""
    if "span_hash" in eval_docs.columns and text_col not in eval_docs.columns:
        keys = eval_docs.select("span_hash").distinct()
    else:
        keys = eval_gram_keys(eval_docs, text_col, k)
    if broadcast_eval:
        keys = F.broadcast(keys)
    spans = _doc_spans(train, id_col, text_col, k)
    return spans.join(keys, "span_hash", "left_semi")


def decontaminate(
    train: DataFrame,
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 13,
    mode: str = "drop",
    broadcast_eval: bool = True,
    hits: DataFrame | None = None,
) -> DataFrame:
    """Remove eval-set contamination from a training corpus.

    - ``mode="drop"``: training documents sharing ANY k-gram with the
      eval set are removed whole; output is the surviving subset of
      ``train``, columns unchanged.
    - ``mode="scrub"``: only the overlapping token spans are cut;
      output is (id, text_clean, n_tokens, n_removed) for EVERY
      training doc (n_removed = 0 when clean), the
      ``remove_duplicated_spans`` contract.

    Drop is the benchmark-reporting default (a contaminated doc's
    remaining text still correlates with the eval target); scrub keeps
    more data when the corpus is precious.

    ``hits`` optionally passes a precomputed :func:`contaminated_spans`
    relation (the ``candidates`` pattern from ngram_jaccard_pairs) — a
    caller that also audits the hit positions computes the span scan
    ONCE (checkpoint it) instead of twice.
    """
    if mode not in ("drop", "scrub"):
        raise ValueError(f"decontaminate: mode must be 'drop' or 'scrub', got {mode!r}")
    if hits is None:
        hits = contaminated_spans(
            train, eval_docs, id_col, text_col, k, broadcast_eval
        )
    if mode == "drop":
        return train.join(
            hits.select(id_col).distinct(), id_col, "left_anti"
        )
    return _cut_documents(train, hits, id_col, text_col, k)
