"""End-to-end corpus curation: the engine's operators composed into
the standard LLM training-data pipeline, one call.

Stage order follows the production playbook — cheap scans first, then
the dedup tiers (each stage shrinks the input of the next, so ordering
is a cost statement, not just taste):

0. domain filter     — per-domain stats gate (mean quality /
                       intra-domain dup rate / min size); first
                       because it is the C4/RefinedWeb blocklist
                       analogue and cheapest per dropped row
1. quality gate      — heuristic ``quality_score`` floor (pure scan)
2. exact dedup       — one survivor (min id) per identical text
3. near-dup dedup    — MinHash/LSH pairs -> connected components ->
                       keep each cluster's canonical (min-id) doc
4. semantic dedup    — SemDeDup over an EMBEDDINGS relation keyed by
                       the doc id (cosine-similar groups keep their
                       min-id representative; documents without an
                       embedding pass through — the gate only drops
                       what it can judge)
5. perplexity gate   — stupid-backoff LM trained on a REFERENCE
                       corpus (CCNet trains on wikipedia), drop what
                       it finds surprising. Self-training is refused:
                       a document's own trigrams are in a self-trained
                       model with matching contexts, so even gibberish
                       scores perplexity ~1 and the gate is a no-op
6. decontamination   — drop documents sharing long k-grams with a
                       held-out EVAL set (GPT-3 appendix-C hygiene;
                       runs late because the eval key set is tiny and
                       the gate must see exactly the docs that would
                       otherwise ship)
7. span dedup        — cut corpus-duplicated k-token substrings from
                       the survivors' text (repairs, doesn't drop)
8. packing           — first-fit-decreasing into training sequences

Every stage is optional (None/False disables); the output is the
curated corpus plus, with ``report=True``, a per-stage row-count
report — the number a pipeline operator actually watches. The report
costs one count() action per enabled stage (rows_in carries the
previous stage's rows_out); stage boundaries are localCheckpointed so
counting never recomputes an earlier stage's dedup work.

Determinism: every stage's keep-decision is content- or id-keyed
(min-id survivors, md5 ordering, pinned tie-breaks) — the same corpus
curates identically on any partitioning (tested).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from iot_sensor_data_pipeline_spark.functions.text import quality_score, ws_tokens
from iot_sensor_data_pipeline_spark.operators.dedup import (
    duplicate_clusters,
    minhash_dedup_pairs,
)
from iot_sensor_data_pipeline_spark.operators.curation import pack_sequences
from iot_sensor_data_pipeline_spark.operators.ngram_lm import (
    perplexity_filter,
    train_ngram_lm,
)
from iot_sensor_data_pipeline_spark.operators.span_dedup import remove_duplicated_spans


def curate_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    domain_col: str | None = None,
    domain_min_quality: float | None = None,
    domain_max_dup_rate: float | None = None,
    domain_min_docs: int | None = None,
    min_quality: float | None = None,
    exact_dedup: bool = True,
    neardup_threshold: float | None = 0.5,
    semantic_threshold: float | None = None,
    embeddings: DataFrame | None = None,
    vec_col: str = "embedding",
    semantic_clusters: int | None = None,
    semantic_max_cluster_size: int | None = None,
    max_perplexity: float | None = None,
    lm_reference: DataFrame | None = None,
    decontaminate_against: DataFrame | None = None,
    decontaminate_k: int = 13,
    span_k: int | None = None,
    pack_max_tokens: int | None = None,
    shingle_n: int = 3,
    report: bool = True,
) -> tuple[DataFrame, list[dict]]:
    """Run the curation pipeline; returns ``(curated, stages)``.

    ``curated`` carries (id, text, n_tokens) — text is the span-cleaned
    version when ``span_k`` is set — plus (pack_id, pack_pos) when
    ``pack_max_tokens`` is set. ``stages`` is a list of
    ``{"stage", "rows_in", "rows_out"}`` dicts (empty when
    ``report=False``).
    """
    stages: list[dict] = []
    domain_gate = any(
        v is not None
        for v in (domain_min_quality, domain_max_dup_rate, domain_min_docs)
    )
    if domain_gate and domain_col is None:
        raise ValueError(
            "curate_corpus: domain_min_quality/domain_max_dup_rate/"
            "domain_min_docs need domain_col (the per-document "
            "domain/source column to aggregate by)"
        )
    cols = [F.col(id_col), F.col(text_col)]
    if domain_gate:
        cols.append(F.col(domain_col))
    cur = docs.select(*cols)
    prev_count: int | None = None  # carried forward: rows_in == last rows_out

    def _step(name: str, nxt: DataFrame) -> DataFrame:
        nonlocal cur, prev_count
        if report:
            nxt = nxt.localCheckpoint()
            rows_in = cur.count() if prev_count is None else prev_count
            prev_count = nxt.count()
            stages.append(
                {"stage": name, "rows_in": rows_in, "rows_out": prev_count}
            )
        cur = nxt
        return cur

    if domain_gate:
        from iot_sensor_data_pipeline_spark.operators.curation import (
            filter_by_domain_stats,
        )

        _step(
            "domain_filter",
            filter_by_domain_stats(
                cur,
                domain_col=domain_col,
                text_col=text_col,
                min_mean_quality=domain_min_quality,
                max_dup_rate=domain_max_dup_rate,
                min_docs=domain_min_docs,
            ),
        )
        # downstream stages are (id, text)-shaped; the domain column
        # served its purpose
        cur = cur.drop(domain_col)

    if min_quality is not None:
        _step(
            "quality_gate",
            cur.where(quality_score(F.col(text_col)) >= min_quality),
        )

    if exact_dedup:
        keepers = (
            cur.groupBy(text_col)
            .agg(F.min(id_col).alias("__keep"))
            .select(F.col("__keep").alias(id_col))
        )
        _step("exact_dedup", cur.join(keepers, id_col, "left_semi"))

    if neardup_threshold is not None:
        pairs = minhash_dedup_pairs(
            cur, id_col, text_col, threshold=neardup_threshold, shingle_n=shingle_n
        )
        ids = cur.select(F.col(id_col).alias("id"))
        clusters = duplicate_clusters(ids, pairs.select("i", "j"))
        survivors = clusters.where(F.col("id") == F.col("cluster")).select(
            F.col("id").alias(id_col)
        )
        _step("neardup_dedup", cur.join(survivors, id_col, "left_semi"))

    if semantic_threshold is not None:
        if embeddings is None:
            raise ValueError(
                "curate_corpus: semantic_threshold needs embeddings (a "
                f"relation carrying ({id_col}, {vec_col}) for the "
                "documents being curated)"
            )
        from iot_sensor_data_pipeline_spark.operators.similarity import (
            semantic_dedup,
        )

        # restrict the (possibly corpus-wide) embedding relation to the
        # current survivors BEFORE any pair generation — the same
        # probe-restriction discipline as the incremental dedup indexes
        emb_cur = embeddings.select(F.col(id_col), F.col(vec_col)).join(
            cur.select(id_col), id_col, "left_semi"
        )
        marks = semantic_dedup(
            emb_cur,
            semantic_threshold,
            id_col=id_col,
            vec_col=vec_col,
            n_clusters=semantic_clusters,
            max_cluster_size=semantic_max_cluster_size,
        )
        dups = marks.where(F.col("kept") == 0).select(F.col("id").alias(id_col))
        # anti-join: embedded near-duplicates drop, everything else —
        # including docs with NO embedding row — passes through
        _step("semantic_dedup", cur.join(dups, id_col, "left_anti"))

    if max_perplexity is not None:
        if lm_reference is None:
            raise ValueError(
                "curate_corpus: max_perplexity needs lm_reference (a "
                "held-out corpus to train the LM on) — a self-trained "
                "LM scores every document's own trigrams ~1, making "
                "the gate a silent no-op"
            )
        lm = train_ngram_lm(lm_reference, text_col)
        _step(
            "perplexity_gate",
            perplexity_filter(cur, lm, max_perplexity, id_col, text_col),
        )

    if decontaminate_against is not None:
        from iot_sensor_data_pipeline_spark.operators.decontamination import (
            decontaminate,
        )

        _step(
            "decontaminate",
            decontaminate(
                cur,
                decontaminate_against,
                id_col=id_col,
                text_col=text_col,
                k=decontaminate_k,
                mode="drop",
            ),
        )

    if span_k is not None:
        cleaned = remove_duplicated_spans(cur, id_col, text_col, k=span_k).select(
            F.col(id_col), F.col("text_clean").alias(text_col)
        )
        _step("span_dedup", cleaned)

    # ws_tokens: the SAME tokenizer the LM/BPE/span stages use, so
    # packing budgets count the tokens those stages counted
    with_tokens = cur.withColumn("n_tokens", F.size(ws_tokens(F.col(text_col))))
    if pack_max_tokens is not None:
        packs = pack_sequences(
            with_tokens, id_col, "n_tokens", max_tokens=pack_max_tokens
        )
        # pack_sequences normalizes its id column to "id"
        out = with_tokens.join(
            packs.select(F.col("id").alias(id_col), "pack_id", "pack_pos"), id_col
        )
        if report:
            out = out.localCheckpoint()
            stages.append(
                {
                    "stage": "pack_sequences",
                    "rows_in": cur.count() if prev_count is None else prev_count,
                    "rows_out": out.count(),
                }
            )
        return out, stages
    return with_tokens, stages
