"""End-to-end curation pipeline (pipeline.py): each stage removes
exactly its planted targets; the report tracks counts; the output is
partitioning-invariant."""

from __future__ import annotations

from pyspark.sql import functions as F

from iot_sensor_data_pipeline_spark.pipeline import curate_corpus

GOOD = (
    "the quick brown fox jumps over the lazy dog and then the dog "
    "chases the fox around the old barn while the farmer watches"
)
GOOD2 = (
    "a calm river flows past the village where the miller grinds "
    "grain for the baker and the baker sells bread to the town"
)
GOOD3 = (
    "deep in the winter forest the hunter follows the tracks of the "
    "red deer across the frozen stream and up the stony ridge at dusk"
)
GOOD4 = (
    "sailors from the harbor mend their nets beside the quay while "
    "gulls circle the tall mast and the tide slides over the dark sand"
)
NEAR_GOOD = GOOD + " extra tail words here"
SHARED = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"


def _corpus(spark):
    rows = [
        (1, GOOD),                        # survives everything
        (2, GOOD),                        # exact dup of 1 -> dropped
        (3, NEAR_GOOD),                   # near-dup of 1 -> dropped
        (4, GOOD2),                       # survives
        (5, "1 2 3 4 5 6 7 8 9 0 $$$"),   # low quality -> dropped
        (6, f"{GOOD3} {SHARED}"),         # span shared with 7
        (7, f"{SHARED} {GOOD4}"),          # span shared with 6
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_stages_remove_planted_targets(spark):
    out, stages = curate_corpus(
        _corpus(spark),
        min_quality=0.05,
        exact_dedup=True,
        neardup_threshold=0.5,
        span_k=10,
        pack_max_tokens=64,
    )
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {1, 4, 6, 7}
    # the shared 10-token span was cut from BOTH 6 and 7
    assert "alpha" not in rows[6]["text"] and "alpha" not in rows[7]["text"]
    assert "hunter" in rows[6]["text"]  # non-duplicated content kept
    by_name = {s["stage"]: s for s in stages}
    assert by_name["quality_gate"]["rows_out"] == 6
    assert by_name["exact_dedup"]["rows_out"] == 5
    assert by_name["neardup_dedup"]["rows_out"] == 4
    assert by_name["span_dedup"]["rows_in"] == 4
    # packing: every bin within budget, every survivor packed once
    assert by_name["pack_sequences"]["rows_out"] == 4
    bins = out.groupBy("pack_id").agg(F.sum("n_tokens").alias("t")).collect()
    assert all(b["t"] <= 64 for b in bins)


def test_perplexity_stage_drops_out_of_distribution(spark):
    reference = spark.createDataFrame(
        [(i, GOOD) for i in range(20)], "doc_id long, text string"
    )
    probe = [(0, GOOD), (99, "zz qq xx vv pp ww zz qq xx vv")]
    df = spark.createDataFrame(probe, "doc_id long, text string")
    out, stages = curate_corpus(
        df,
        exact_dedup=False,
        neardup_threshold=None,
        max_perplexity=50.0,
        lm_reference=reference,
    )
    assert 99 not in {r["doc_id"] for r in out.collect()}
    gate = [s for s in stages if s["stage"] == "perplexity_gate"][0]
    assert gate["rows_out"] == gate["rows_in"] - 1


def test_pipeline_is_partitioning_invariant(spark):
    def run(npart):
        out, _ = curate_corpus(
            _corpus(spark).repartition(npart),
            min_quality=0.05,
            neardup_threshold=0.5,
            span_k=10,
            pack_max_tokens=64,
            report=False,
        )
        return sorted(
            (r["doc_id"], r["text"], r["pack_id"], r["pack_pos"])
            for r in out.collect()
        )

    assert run(1) == run(7)


def test_disabled_stages_pass_through(spark):
    df = _corpus(spark)
    out, stages = curate_corpus(
        df, exact_dedup=False, neardup_threshold=None, report=True
    )
    assert out.count() == df.count()
    assert stages == []


def test_self_trained_perplexity_is_refused(spark):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="lm_reference"):
        curate_corpus(_corpus(spark), max_perplexity=10.0)


def test_semantic_dedup_stage_removes_planted_embedding_dups(spark):
    """VERDICT r6 item 7: planted semantic duplicates (near-identical
    embeddings, different text) collapse to the min-id representative;
    docs without an embedding row pass through; the stage reports."""
    import pytest

    docs = spark.createDataFrame(
        [(1, GOOD), (2, GOOD2), (3, GOOD3), (4, GOOD4)],
        "doc_id long, text string",
    )
    # 1 and 3 are semantic twins; 2 is far away; 4 has NO embedding
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),
            (2, [0.0, 1.0, 0.0]),
            (3, [0.999, 0.001, 0.0]),
        ],
        "doc_id long, embedding array<double>",
    )
    out, stages = curate_corpus(
        docs,
        exact_dedup=False,
        neardup_threshold=None,
        semantic_threshold=0.95,
        embeddings=emb,
    )
    assert {r["doc_id"] for r in out.collect()} == {1, 2, 4}
    by_name = {s["stage"]: s for s in stages}
    assert by_name["semantic_dedup"]["rows_in"] == 4
    assert by_name["semantic_dedup"]["rows_out"] == 3

    with pytest.raises(ValueError, match="needs embeddings"):
        curate_corpus(docs, semantic_threshold=0.9)


def test_semantic_stage_is_partitioning_invariant(spark):
    docs = spark.createDataFrame(
        [(i, f"{GOOD} variant {i}") for i in range(8)],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [(i, [1.0 if i % 2 else 0.99, 0.01 * i, 0.0]) for i in range(8)],
        "doc_id long, embedding array<double>",
    )

    def run(npart):
        out, _ = curate_corpus(
            docs.repartition(npart),
            exact_dedup=False,
            neardup_threshold=None,
            semantic_threshold=0.9,
            embeddings=emb.repartition(npart),
            report=False,
        )
        return sorted(r["doc_id"] for r in out.collect())

    assert run(1) == run(13)


def test_decontamination_stage_drops_eval_overlap(spark):
    eval_docs = spark.createDataFrame(
        [(900, GOOD)], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [(1, GOOD + " trailing banter"), (2, GOOD2)], "doc_id long, text string"
    )
    out, stages = curate_corpus(
        docs,
        exact_dedup=False,
        neardup_threshold=None,
        decontaminate_against=eval_docs,
        decontaminate_k=13,
    )
    assert {r["doc_id"] for r in out.collect()} == {2}
    by_name = {s["stage"]: s for s in stages}
    assert by_name["decontaminate"]["rows_out"] == 1


def test_domain_filter_stage_drops_spam_farm(spark):
    """A template-farm domain (intra-domain normalized dup_rate 1.0)
    is removed wholesale by the stage-0 domain gate; per-document
    stages then act on the survivors as before."""
    rows = [
        (1, "good", GOOD),
        (2, "good", GOOD2),
        (3, "good", GOOD3),
        (4, "farm", "Buy NOW for only 19 dollars call 555-0100 today"),
        (5, "farm", "buy now for only 99 dollars CALL 555-0199 today"),
        (6, "good", GOOD),  # exact dup of 1, different stage's job
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out, stages = curate_corpus(
        docs,
        domain_col="source",
        domain_max_dup_rate=0.5,
        exact_dedup=True,
        neardup_threshold=None,
    )
    got = sorted(r.doc_id for r in out.collect())
    assert got == [1, 2, 3]  # farm gone via domain gate, 6 via exact dedup
    by_name = {s["stage"]: s for s in stages}
    assert by_name["domain_filter"]["rows_in"] == 6
    assert by_name["domain_filter"]["rows_out"] == 4
    assert by_name["exact_dedup"]["rows_out"] == 3
    assert "source" not in out.columns


def test_domain_thresholds_require_domain_col(spark):
    import pytest

    with pytest.raises(ValueError, match="domain_col"):
        curate_corpus(_corpus(spark), domain_max_dup_rate=0.5)
