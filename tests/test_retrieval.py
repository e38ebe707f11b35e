"""BM25 ranked retrieval (operators/retrieval.py): hand-computed
golden, python-mirror differential, stopword cap, prebuilt-index
parity, guards, and the broadcast-probe plan shape."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from iot_sensor_data_pipeline_spark.operators.retrieval import (
    bm25_topk,
    build_inverted_index,
    tokenize_terms,
)

K1, B = 1.2, 0.75


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the dog chased the cat"),
            (3, "dogs and cats living together"),
            (4, "a completely unrelated document about spark"),
            (5, None),  # NULL text: dl 0, no postings, still counted in N
        ],
        "doc_id long, text string",
    )


def _py_bm25(docs, query_terms, k1=K1, b=B):
    """Independent python mirror of the documented BM25 algebra."""
    import re

    toks = {
        d: [t for t in re.split(r"[^a-z0-9]+", (txt or "").lower()) if t]
        for d, txt in docs
    }
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    scores = {}
    for term in set(query_terms):
        df = sum(1 for t in toks.values() if term in t)
        if not df:
            continue
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        for d, t in toks.items():
            tf = t.count(term)
            if tf:
                w = idf * tf * (k1 + 1) / (
                    tf + k1 * (1 - b + b * len(t) / avgdl)
                )
                scores[d] = scores.get(d, 0.0) + w
    return {d: round(s, 6) for d, s in scores.items()}


def test_tokenizer_portable_semantics(spark):
    got = spark.range(1).select(
        tokenize_terms(F.lit(" The  CAT, sat-on 2 mats!! ")).alias("t")
    ).first().t
    assert got == ["the", "cat", "sat", "on", "2", "mats"]
    # NULL propagates as NULL (build_inverted_index coalesces it)
    assert spark.range(1).select(
        tokenize_terms(F.lit(None).cast("string")).alias("t")
    ).first().t is None


def test_inverted_index_postings(spark):
    idx = {
        (r.term, r.doc_id): (r.tf, r.dl)
        for r in build_inverted_index(_docs(spark)).collect()
    }
    assert idx[("the", 1)] == (2, 6)  # tf counts repeats, dl is tokens
    assert idx[("cat", 2)] == (1, 5)
    assert ("cats", 3) in idx and ("cat", 3) not in idx  # no stemming
    assert not any(d == 5 for _t, d in idx)  # NULL doc: no postings


def test_bm25_matches_python_mirror(spark):
    docs = _docs(spark)
    queries = spark.createDataFrame(
        [(10, "cat dog"), (11, "spark"), (12, "the cat the")],
        "query_id int, query_text string",
    )
    got = {
        (r.query_id, r.doc_id): (r.score, r.rn)
        for r in bm25_topk(docs, queries, k=10).collect()
    }
    raw = [(r.doc_id, r.text) for r in docs.collect()]
    for qid, terms in ((10, ["cat", "dog"]), (11, ["spark"]),
                       (12, ["the", "cat"])):  # distinct query terms
        exp = _py_bm25(raw, terms)
        ranked = sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))
        for rn, (d, s) in enumerate(ranked, start=1):
            assert got[(qid, d)] == (pytest.approx(s, abs=1e-6), rn)
        # no extra docs beyond those sharing a term
        assert {d for (q, d) in got if q == qid} == set(exp)


def test_rarer_term_outranks_common_term(spark):
    """idf sanity on the synthetic corpus shape: a doc matching the
    rare term beats a doc matching only the ubiquitous one."""
    docs = spark.createDataFrame(
        [(i, "common filler words here") for i in range(20)]
        + [(100, "common rare")],
        "doc_id long, text string",
    )
    qs = spark.createDataFrame(
        [(1, "common rare")], "query_id int, query_text string"
    )
    top = bm25_topk(docs, qs, k=3).where("rn = 1").first()
    assert top.doc_id == 100


def test_max_df_frac_drops_stopwords(spark):
    docs = spark.createDataFrame(
        [
            (1, "the cat sat"),
            (2, "the dog ran"),
            (3, "the bird flew"),
            (4, "the fish swam and the cat watched"),
            (5, "spark shuffle"),
        ],
        "doc_id long, text string",
    )
    # 'the' is in 4/5 docs = 0.8; 'cat' in 2/5 = 0.4; cap at 0.5
    idx = build_inverted_index(docs, max_df_frac=0.5)
    assert idx.where("term = 'the'").count() == 0
    assert idx.where("term = 'cat'").count() == 2
    # scoring with the capped index simply never sees the stopword
    qs = spark.createDataFrame(
        [(1, "the cat")], "query_id int, query_text string"
    )
    got = bm25_topk(docs, qs, k=10, index=idx)
    raw = [(r.doc_id, r.text) for r in docs.collect()]
    exp = _py_bm25(raw, ["cat"])  # 'the' contributes nothing
    assert {
        r.doc_id: r.score for r in got.collect()
    } == {d: pytest.approx(s, abs=1e-6) for d, s in exp.items()}
    with pytest.raises(ValueError, match="max_df_frac"):
        build_inverted_index(docs, max_df_frac=0.0)


def test_prebuilt_index_equals_inline(spark):
    docs = _docs(spark)
    qs = spark.createDataFrame(
        [(1, "cat dog spark")], "query_id int, query_text string"
    )
    inline = sorted(map(tuple, bm25_topk(docs, qs, k=10).collect()))
    prebuilt = sorted(map(tuple, bm25_topk(
        docs, qs, k=10, index=build_inverted_index(docs)
    ).collect()))
    assert inline == prebuilt


def test_guards(spark):
    docs = _docs(spark)
    qs = spark.createDataFrame(
        [(1, "cat")], "query_id int, query_text string"
    )
    with pytest.raises(ValueError, match="k must be"):
        bm25_topk(docs, qs, k=0)
    with pytest.raises(ValueError, match="empty corpus"):
        bm25_topk(docs.limit(0), qs, k=5)


def test_probe_plan_broadcasts_queries_never_reshuffles_index(spark):
    """The posting joins must broadcast the (tiny) query-term side —
    a SortMergeJoin there would reshuffle the whole index per query."""
    docs = _docs(spark)
    qs = spark.createDataFrame(
        [(1, "cat dog")], "query_id int, query_text string"
    )
    plan = (
        bm25_topk(docs, qs, k=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_rrf_fuse_matches_python_mirror(spark):
    from iot_sensor_data_pipeline_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3), (2, 20, 1)],
        "query_id int, doc_id long, rn int",
    )
    b = spark.createDataFrame(
        [(1, 11, 1), (1, 13, 2), (2, 20, 1), (2, 21, 2)],
        "query_id int, doc_id long, rn int",
    )
    got = {
        (r.query_id, r.doc_id): (r.score, r.n_lists, r.rn)
        for r in rrf_fuse([a, b], k=10).collect()
    }
    exp_scores = {}
    for rel in ([(1, 10, 1), (1, 11, 2), (1, 12, 3), (2, 20, 1)],
                [(1, 11, 1), (1, 13, 2), (2, 20, 1), (2, 21, 2)]):
        for q, d, r in rel:
            s, n = exp_scores.get((q, d), (0.0, 0))
            exp_scores[(q, d)] = (s + 1.0 / (60 + r), n + 1)
    for q in (1, 2):
        ranked = sorted(
            ((d, v) for (qq, d), v in exp_scores.items() if qq == q),
            key=lambda kv: (-round(kv[1][0], 6), kv[0]),
        )
        for rn, (d, (s, n)) in enumerate(ranked, start=1):
            assert got[(q, d)] == (pytest.approx(round(s, 6)), n, rn)
    # doc 11 appears in both lists for q1 and must outrank everything
    assert got[(1, 11)][2] == 1 and got[(1, 11)][1] == 2


def test_rrf_fuse_guards(spark):
    from iot_sensor_data_pipeline_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame([(1, 10, 1)], "query_id int, doc_id long, rn int")
    with pytest.raises(ValueError, match="at least one ranking"):
        rrf_fuse([], k=5)
    with pytest.raises(ValueError, match="k must be"):
        rrf_fuse([a], k=0)
    with pytest.raises(ValueError, match="rrf_k"):
        rrf_fuse([a], k=5, rrf_k=0)


def test_sync_inverted_index_follows_mutations(spark, tmp_path):
    """The persisted inverted index follows the corpus through its
    change feed: after delete + text-update + insert mutations, one
    sync makes the index EQUAL a from-scratch rebuild of the current
    corpus; a steady-state sync is a no-op; losing the cursor replays
    the slice and still converges; BM25 over the synced index matches
    BM25 over the rebuilt one."""
    from iot_sensor_data_pipeline_spark.operators.retrieval import (
        sync_inverted_index,
    )
    from iot_sensor_data_pipeline_spark.sources.mutations import (
        delete_where,
        merge_into,
        update_where,
    )

    corpus = str(tmp_path / "corpus")
    idx = str(tmp_path / "idx")
    spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the dog chased the cat"),
            (3, "dogs and cats living together"),
            (4, "spark shuffles the data"),
        ],
        "doc_id long, text string",
    ).repartition(2).write.parquet(corpus)
    build_inverted_index(spark.read.parquet(corpus)) \
        .write.parquet(idx)

    delete_where(spark, corpus, "doc_id = 3", change_feed=True)
    update_where(spark, corpus, "doc_id = 1",
                 {"text": F.lit("the cat naps quietly")},
                 change_feed=True)
    merge_into(
        spark, corpus,
        spark.createDataFrame([(9, "fresh spark document")],
                              "doc_id long, text string"),
        on=["doc_id"], change_feed=True,
    )

    def idx_rows():
        return sorted(map(tuple, spark.read.parquet(idx)
                          .select("term", "doc_id", "tf", "dl").collect()))

    def rebuilt():
        return sorted(map(tuple, build_inverted_index(
            spark.read.parquet(corpus)
        ).select("term", "doc_id", "tf", "dl").collect()))

    res = sync_inverted_index(spark, corpus, idx)
    assert res["applied_versions"] == [1, 2, 3]
    assert res["n_docs_retired"] > 0 and res["n_postings_added"] > 0
    assert idx_rows() == rebuilt()

    # steady state
    res2 = sync_inverted_index(spark, corpus, idx)
    assert res2["applied_versions"] == [] and res2["to_version"] == 3

    # cursor loss -> full replay converges (retire sweeps re-appends)
    import os

    os.remove(os.path.join(idx, "_sync_state.json"))
    res3 = sync_inverted_index(spark, corpus, idx)
    assert res3["applied_versions"] == [1, 2, 3]
    assert idx_rows() == rebuilt()

    # BM25 through the synced index == through a fresh rebuild
    qs = spark.createDataFrame(
        [(1, "cat spark")], "query_id int, query_text string"
    )
    docs_now = spark.read.parquet(corpus)
    via_synced = sorted(map(tuple, bm25_topk(
        docs_now, qs, k=10, index=spark.read.parquet(idx)
    ).collect()))
    via_rebuilt = sorted(map(tuple, bm25_topk(docs_now, qs, k=10).collect()))
    assert via_synced == via_rebuilt


def test_sync_inverted_index_gap_and_consumer_clamp(spark, tmp_path):
    """The index's cursor sidecar makes it a first-class feed consumer:
    expire_change_feed clamps to it, and expiry past it raises the
    re-baseline error on the next sync."""
    from iot_sensor_data_pipeline_spark.operators.retrieval import (
        sync_inverted_index,
    )
    from iot_sensor_data_pipeline_spark.sources.mutations import (
        change_feed_versions,
        expire_change_feed,
        update_where,
    )

    corpus = str(tmp_path / "c")
    idx = str(tmp_path / "i")
    spark.createDataFrame(
        [(i, f"doc number {i} words") for i in range(10)],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(corpus)
    build_inverted_index(spark.read.parquet(corpus)).write.parquet(idx)

    for i in range(3):
        update_where(spark, corpus, f"doc_id = {i}",
                     {"text": F.lit(f"revised doc {i}")}, change_feed=True)
    sync_inverted_index(spark, corpus, idx)  # cursor -> 3
    update_where(spark, corpus, "doc_id = 5",
                 {"text": F.lit("revised doc 5")}, change_feed=True)
    update_where(spark, corpus, "doc_id = 7",
                 {"text": F.lit("revised doc 7")}, change_feed=True)

    # clamp: keep_versions=1 would doom v1..v4, but the index (cursor
    # 3) still needs v4 — expiry protects it
    exp = expire_change_feed(spark, corpus, keep_versions=1,
                             consumers=[idx])
    assert exp["clamped_by"]["consumer"] == idx
    assert exp["clamped_by"]["n_protected"] == 1
    assert 4 in change_feed_versions(spark, corpus)

    # force a gap (no consumers registered) -> next sync raises
    expire_change_feed(spark, corpus, keep_versions=1)
    update_where(spark, corpus, "doc_id = 6",
                 {"text": F.lit("revised doc 6")}, change_feed=True)
    expire_change_feed(spark, corpus, keep_versions=1)
    with pytest.raises(ValueError, match="re-baseline"):
        sync_inverted_index(spark, corpus, idx)


def test_phrase_search_goldens_and_mirror(spark):
    """Exact consecutive matching incl. OVERLAPPING occurrences and
    duplicate terms inside the phrase; differential vs an independent
    python scan."""
    from iot_sensor_data_pipeline_spark.operators.retrieval import (
        phrase_search,
    )

    docs = spark.createDataFrame(
        [
            (1, "a a a b"),          # 'a a' occurs twice (overlap)
            (2, "the cat sat on the cat mat"),
            (3, "cat the sat"),       # tokens present, order wrong
            (4, "batch batch batch stream batch batch"),
            (5, None),
        ],
        "doc_id long, text string",
    )
    phrases = spark.createDataFrame(
        [(10, "a a"), (11, "the cat"), (12, "cat sat"),
         (13, "batch batch"), (14, "Missing-Phrase!")],
        "phrase_id int, phrase_text string",
    )
    got = {
        (r.phrase_id, r.doc_id): r.n_occurrences
        for r in phrase_search(docs, phrases).collect()
    }

    import re

    def py_count(text, phrase):
        t = [x for x in re.split(r"[^a-z0-9]+", (text or "").lower()) if x]
        p = [x for x in re.split(r"[^a-z0-9]+", phrase.lower()) if x]
        return sum(
            1 for i in range(len(t) - len(p) + 1) if t[i:i + len(p)] == p
        )

    exp = {}
    for pid, phrase in [(10, "a a"), (11, "the cat"), (12, "cat sat"),
                        (13, "batch batch"), (14, "Missing-Phrase!")]:
        for r in docs.collect():
            n = py_count(r.text, phrase)
            if n:
                exp[(pid, r.doc_id)] = n
    assert got == exp
    assert got[(10, 1)] == 2          # overlap counts
    assert got[(13, 4)] == 3          # 'batch batch' in b b b + b b
    assert (12, 3) not in got         # order matters
    assert not any(p == 14 for p, _d in got)  # absent phrase: no rows


def test_phrase_search_prebuilt_index_and_empty_phrase_guard(spark):
    from iot_sensor_data_pipeline_spark.operators.retrieval import (
        phrase_search,
        positional_index,
    )

    docs = spark.createDataFrame(
        [(1, "x y z x y")], "doc_id long, text string"
    )
    phrases = spark.createDataFrame(
        [(1, "x y")], "phrase_id int, phrase_text string"
    )
    idx = positional_index(docs)
    inline = sorted(map(tuple, phrase_search(docs, phrases).collect()))
    prebuilt = sorted(map(tuple, phrase_search(
        docs, phrases, index=idx
    ).collect()))
    assert inline == prebuilt == [(1, 1, 2)]
    with pytest.raises(ValueError, match="no alphanumeric"):
        phrase_search(docs, spark.createDataFrame(
            [(9, "!!!")], "phrase_id int, phrase_text string"
        ))


def test_index_corpus_stats_maintained_and_probe_without_corpus(spark, tmp_path):
    """The tf index's sidecar carries (n_docs, sum_dl) from baseline on
    and every sync folds the slice into them exactly (delete + update +
    insert, including a doc updated to ZERO tokens — the case the index
    alone cannot see), so `bm25_topk(docs=None, index=..., stats=...)`
    probes with NO corpus relation at all and still equals the inline
    corpus-scanning probe."""
    from iot_sensor_data_pipeline_spark.operators.retrieval import (
        baseline_search_index,
        index_corpus_stats,
        sync_inverted_index,
    )
    from iot_sensor_data_pipeline_spark.sources.mutations import (
        delete_where,
        merge_into,
        update_where,
    )

    corpus = str(tmp_path / "corpus")
    idx = str(tmp_path / "idx")
    spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the dog chased the cat"),
            (3, "dogs and cats living together"),
            (4, "spark shuffles the data"),
        ],
        "doc_id long, text string",
    ).repartition(2).write.parquet(corpus)
    res = baseline_search_index(spark, corpus, idx, kind="tf")
    assert res["status"] == "created"

    def corpus_stats():
        rows = spark.read.parquet(corpus).select("text").collect()
        dls = [len([t for t in __import__("re").split(
            r"[^a-z0-9]+", (r.text or "").lower()) if t]) for r in rows]
        return len(dls), (sum(dls) / len(dls) if dls else 0.0)

    assert index_corpus_stats(spark, idx) == corpus_stats()

    delete_where(spark, corpus, "doc_id = 3", change_feed=True)
    update_where(spark, corpus, "doc_id = 1",
                 {"text": F.lit("the cat naps quietly by the window")},
                 change_feed=True)
    update_where(spark, corpus, "doc_id = 4",
                 {"text": F.lit("!!!")},  # zero tokens after tokenize
                 change_feed=True)
    merge_into(
        spark, corpus,
        spark.createDataFrame([(9, "fresh spark document")],
                              "doc_id long, text string"),
        on=["doc_id"], change_feed=True,
    )
    sync_inverted_index(spark, corpus, idx)
    n_docs, avgdl = index_corpus_stats(spark, idx)
    exp_n, exp_avg = corpus_stats()
    assert n_docs == exp_n
    assert math.isclose(avgdl, exp_avg, rel_tol=0, abs_tol=0)

    # probe with stats and NO docs: structurally cannot scan the corpus
    qs = spark.createDataFrame(
        [(1, "cat spark")], "query_id int, query_text string"
    )
    via_stats = sorted(map(tuple, bm25_topk(
        None, qs, k=10, index=spark.read.parquet(idx),
        stats=(n_docs, avgdl),
    ).collect()))
    via_inline = sorted(map(tuple, bm25_topk(
        spark.read.parquet(corpus), qs, k=10
    ).collect()))
    assert via_stats == via_inline and via_stats

    # steady-state sync leaves the stats untouched
    sync_inverted_index(spark, corpus, idx)
    assert index_corpus_stats(spark, idx) == (n_docs, avgdl)

    # guards: positional sidecars carry no stats; docs=None without
    # stats (or without index) is an error
    with pytest.raises(ValueError, match="stats"):
        bm25_topk(None, qs, k=10, index=spark.read.parquet(idx))
    with pytest.raises(ValueError, match="docs"):
        bm25_topk(None, qs, k=10)


def test_sync_stats_replay_convergent_after_crash(spark, tmp_path):
    """Crash-replay discipline for the stats sidecar: the retired dl
    mass is derived from the feed slice's PRE-IMAGES (immutable), not
    from the live postings — so a sync that crashed after the retire
    merge and append but BEFORE the cursor commit replays to exactly
    the same (n_docs, sum_dl). Simulated by restoring the pre-sync
    _sync_state.json over an index whose postings the first sync
    already mutated, then syncing again."""
    import os

    from iot_sensor_data_pipeline_spark.operators.retrieval import (
        baseline_search_index,
        index_corpus_stats,
        sync_inverted_index,
    )
    from iot_sensor_data_pipeline_spark.sources.mutations import (
        delete_where,
        update_where,
    )

    corpus = str(tmp_path / "corpus")
    idx = str(tmp_path / "idx")
    spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (2, "delta epsilon"),
            (3, "zeta eta theta iota"),
        ],
        "doc_id long, text string",
    ).repartition(2).write.parquet(corpus)
    baseline_search_index(spark, corpus, idx, kind="tf")
    state_p = os.path.join(idx, "_sync_state.json")
    with open(state_p) as fh:
        pre_state = fh.read()

    delete_where(spark, corpus, "doc_id = 3", change_feed=True)
    update_where(
        spark, corpus, "doc_id = 1",
        {"text": F.lit("alpha rewritten much longer text here")},
        change_feed=True,
    )
    sync_inverted_index(spark, corpus, idx)
    good = index_corpus_stats(spark, idx)

    # ground truth from the corpus itself
    rows = spark.read.parquet(corpus).select("text").collect()
    dls = [
        len([t for t in __import__("re").split(
            r"[^a-z0-9]+", (r.text or "").lower()) if t])
        for r in rows
    ]
    assert good == (len(dls), sum(dls) / len(dls))

    # crash replay: postings already mutated, cursor + stats rolled
    # back as if _write_sync_state never ran (drop the Hadoop local-FS
    # checksum sidecar — a plain rewrite would fail its CRC)
    with open(state_p, "w") as fh:
        fh.write(pre_state)
    crc = os.path.join(idx, "._sync_state.json.crc")
    if os.path.exists(crc):
        os.remove(crc)
    sync_inverted_index(spark, corpus, idx)
    assert index_corpus_stats(spark, idx) == good


def test_query_time_df_cap_equals_build_time_cap(spark):
    """r15 (VERDICT r14 task 9): `bm25_topk(max_df_frac=...)` applies
    the dynamic-stopword cap at query time on the probe's own df
    slice — over a static corpus it must equal probing a BUILD-time
    capped index, in all three probe shapes (inline, prebuilt
    unfiltered index, prebuilt index + sidecar-style stats)."""
    docs = spark.createDataFrame(
        [
            (1, "the cat sat"),
            (2, "the dog ran"),
            (3, "the bird flew"),
            (4, "the fish swam and the cat watched"),
            (5, "spark shuffle"),
        ],
        "doc_id long, text string",
    )
    qs = spark.createDataFrame(
        [(1, "the cat"), (2, "the spark")],
        "query_id int, query_text string",
    )

    def rows(df):
        return sorted(map(tuple, df.collect()))

    capped_idx = build_inverted_index(docs, max_df_frac=0.5)
    expected = rows(bm25_topk(docs, qs, k=10, index=capped_idx))

    # inline build with the query-time cap
    assert rows(bm25_topk(docs, qs, k=10, max_df_frac=0.5)) == expected
    # prebuilt UNFILTERED index (the only kind the sync maintains)
    unfiltered = build_inverted_index(docs)
    assert rows(
        bm25_topk(docs, qs, k=10, index=unfiltered, max_df_frac=0.5)
    ) == expected
    # stats path: no corpus relation at all
    n = docs.count()
    avgdl = sum(
        len(r.text.split()) for r in docs.collect()
    ) / n
    assert rows(
        bm25_topk(None, qs, k=10, index=unfiltered, stats=(n, avgdl),
                  max_df_frac=0.5)
    ) == expected
    assert expected  # the comparison is not vacuous

    with pytest.raises(ValueError, match="max_df_frac"):
        bm25_topk(docs, qs, k=10, max_df_frac=1.5)
