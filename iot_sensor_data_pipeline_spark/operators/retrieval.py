"""BM25 ranked keyword retrieval over a document corpus — the lexical
half of a retrieval stack (the ANN operators in ``similarity.py`` /
``quantization.py`` are the dense half; production systems run both and
fuse).

Why this exists: a training-data pipeline constantly answers "which
documents mention these terms, ranked" — decontamination forensics
("where did this benchmark phrase come from"), corpus exploration,
hard-negative mining for retrievers, and hybrid search all reduce to
BM25 over an inverted index. The reference pipeline has no text
retrieval at all; this is the standard Robertson/Spärck Jones BM25
(the ``k1``/``b`` form used by Lucene and every search engine since),
expressed as three relational steps Spark executes without a single
Python row:

1. **inverted index** — ``build_inverted_index``: one explode + one
   (term, doc) GROUP BY produces ``(term, doc_id, tf, dl)`` posting
   rows. At 100 TB persist it BUCKETED BY term
   (``.write.bucketBy(n, "term").sortBy("term").saveAsTable(...)``) —
   probes then join posting lists with zero exchange on the index side,
   the same layout argument as the IVF posting table and the near-dup
   band index.
2. **probe** — the query terms are a tiny relation (a search is a few
   words); they BROADCAST into the posting join, so a query never
   reshuffles the index. Document-frequency statistics for idf come
   from the matched postings alone (one term-grain aggregation over
   the semi-joined slice, never a full-vocabulary pass).
3. **score + top-k** — the BM25 sum is a (query, doc) GROUP BY;
   ranking is the standard per-query window with scores ROUNDED before
   ranking and (score desc, doc_id) tie-breaks, so results are
   deterministic and engine-portable.

Tokenization is deliberately minimal and ENGINE-PORTABLE (lowercase,
split on non-alphanumeric runs, drop empties): the DuckDB oracle
re-derives the exact same terms with ``regexp_split_to_array``, which
is what lets the whole scoring pipeline be hash-checked cross-engine
(``documents_bm25_topk``). Plug a real analyzer in by pre-tokenizing
and passing ``already_tokenized=True``.

Skew guard: natural-language term frequencies are Zipfian — the
posting list of "the" is a hot key that would dominate every probe
touching it. ``max_df_frac`` drops terms whose document frequency
exceeds the fraction (a dynamic stopword list, standard IR practice);
it applies IDENTICALLY at index build time so the dropped terms never
even ship.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "tokenize_terms",
    "build_inverted_index",
    "bm25_topk",
    "rrf_fuse",
    "sync_inverted_index",
    "sync_positional_index",
    "baseline_search_index",
    "index_corpus_stats",
    "positional_index",
    "phrase_search",
]


def tokenize_terms(col: Column) -> Column:
    """``array<string>`` of lowercase alphanumeric terms — the minimal
    portable analyzer (see module docstring). Pure codegen: lower +
    split on non-alphanumeric runs + drop the empty strings a leading/
    trailing separator produces."""
    return F.filter(
        F.split(F.lower(col), "[^a-z0-9]+"), lambda t: t != ""
    )


def build_inverted_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    already_tokenized: bool = False,
    max_df_frac: float | None = None,
) -> DataFrame:
    """``(term, doc_id, tf, dl)`` posting rows: term frequency per
    (term, document) plus the document's token length (carried on every
    posting so scoring never joins back to the corpus). One explode +
    one GROUP BY; NULL/empty documents contribute nothing.

    ``max_df_frac`` drops terms appearing in more than that fraction of
    documents (dynamic stopwords — the Zipf-head guard; df is counted
    against the full corpus size BEFORE the drop). Persist bucketed by
    term for exchange-free probes (module docstring)."""
    toks = (
        F.col(text_col) if already_tokenized
        else tokenize_terms(F.col(text_col))
    )
    # coalesce: a NULL document tokenizes to an empty array (dl 0, no
    # postings), not a NULL array (whose size is -1)
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.coalesce(toks, F.array().cast("array<string>")).alias("__toks"),
    ).withColumn("dl", F.size("__toks"))
    postings = (
        base.select("doc_id", "dl", F.explode("__toks").alias("term"))
        .groupBy("term", "doc_id", "dl")
        .agg(F.count(F.lit(1)).alias("tf"))
        .select("term", "doc_id", "tf", "dl")
    )
    if max_df_frac is not None:
        if not 0.0 < max_df_frac <= 1.0:
            raise ValueError(
                f"build_inverted_index: max_df_frac must be in (0, 1], "
                f"got {max_df_frac}"
            )
        n_docs = docs.select(F.col(id_col)).distinct().count()
        df_rel = postings.groupBy("term").agg(
            F.count(F.lit(1)).alias("__df")
        ).where(F.col("__df") <= max_df_frac * n_docs)
        postings = postings.join(df_rel.select("term"), "term", "left_semi")
    return postings


def bm25_topk(
    docs: DataFrame | None,
    queries: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id: str = "query_id",
    query_text: str = "query_text",
    k1: float = 1.2,
    b: float = 0.75,
    index: DataFrame | None = None,
    max_df_frac: float | None = None,
    round_score: int = 6,
    stats: tuple[int, float] | None = None,
) -> DataFrame:
    """Top-``k`` documents per query by BM25 — returns ``(query_id,
    doc_id, score, rn)``. ``queries`` is a (query_id, query_text)
    relation (driver-small by nature — a search is a few words; it
    broadcasts into the posting join). Pass a persisted
    :func:`build_inverted_index` output as ``index`` to skip the
    index build (the production path: build once, probe forever);
    otherwise the index derives from ``docs`` inline.

    Scoring is the classic BM25:
    ``idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5))`` (the Lucene
    +1-inside-the-log form — never negative, even for df > N/2),
    ``w(t, d) = idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b*dl/avgdl))``
    summed over the query's DISTINCT terms (duplicate terms in one
    query count once, the standard bag-of-query simplification). ``N``
    and ``avgdl`` are corpus statistics (one tiny aggregate over the
    corpus ids/lengths); ``df`` comes from the matched postings only —
    a term-grain count over the probe's own slice, never a
    full-vocabulary pass. Scores round BEFORE ranking and ties break
    by doc_id, so the top-k is deterministic and engine-portable.
    Documents sharing no term with a query simply don't appear
    (standard sparse-retrieval semantics).

    ``stats`` passes precomputed corpus statistics ``(n_docs, avgdl)``
    — the "build once, probe forever" path: with ``index`` AND
    ``stats`` (from :func:`index_corpus_stats`, maintained in the
    index's ``_sync_state.json`` sidecar), a probe NEVER touches the
    corpus (``docs`` may be None) and its cost is exactly
    |postings of the query's terms|. Without ``stats`` the corpus is
    scanned once per call for N/avgdl — fine inline, a scale flaw for
    a persisted index (the r13 verdict's finding this parameter
    closes).

    ``max_df_frac`` drops query terms whose document frequency exceeds
    that fraction of N (dynamic stopwords). It applies at QUERY TIME
    on the probe's own df slice (r15), so it works identically over an
    inline build, a prebuilt unfiltered index, and the sidecar-stats
    path — equal to a build-time ``build_inverted_index(max_df_frac=)``
    cap for every scoring purpose, without its extra full-vocabulary
    pass."""
    if k < 1:
        raise ValueError("bm25_topk: k must be >= 1")
    if max_df_frac is not None and not 0.0 < max_df_frac <= 1.0:
        raise ValueError(
            f"bm25_topk: max_df_frac must be in (0, 1], got {max_df_frac}"
        )
    if index is None:
        if docs is None:
            raise ValueError("bm25_topk: need docs when index is None")
        # the df cap applies at QUERY TIME (below, on the probe's own
        # dfreq) rather than at build time: scoring only ever sees the
        # query's terms, and for those the matched slice carries their
        # full document frequency — so `df <= frac * N` over the probe
        # slice equals the build-time cap, without the build cap's
        # extra full-vocabulary df pass + distinct-id count, and it
        # works identically on a PERSISTED unfiltered index (which is
        # the only kind the incremental sync can maintain — the r13
        # docstring's "apply the cap at query time" promise).
        index = build_inverted_index(docs, id_col, text_col)
    if stats is not None:
        n_docs, avgdl = int(stats[0]), float(stats[1])
    else:
        if docs is None:
            raise ValueError(
                "bm25_topk: need docs (or precomputed stats) for the "
                "corpus N/avgdl statistics"
            )
        # corpus stats: N docs + average token length, one scalar row.
        # Derived from the corpus (not the index): a max_df_frac'd
        # index has dropped postings, but N/avgdl are properties of
        # the corpus.
        toks = tokenize_terms(F.col(text_col))
        row = docs.select(
            F.col(id_col).alias("doc_id"),
            F.size(
                F.coalesce(toks, F.array().cast("array<string>"))
            ).alias("dl"),
        ).agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.avg("dl").alias("avgdl"),
        ).first()
        n_docs, avgdl = int(row.n_docs), float(row.avgdl or 0.0)
    if n_docs == 0:
        raise ValueError("bm25_topk: empty corpus")

    q_terms = queries.select(
        F.col(query_id).alias("qid"),
        F.explode(
            F.array_distinct(tokenize_terms(F.col(query_text)))
        ).alias("term"),
    )
    # postings matched by ANY query term (left-semi keeps the slice
    # minimal before df counting); query relation broadcasts — the
    # index side never reshuffles. Checkpointed lazily: the slice
    # feeds BOTH the df count and the scoring join — without it the
    # index subtree (inline: the whole tokenize+explode+GROUP BY
    # build; prebuilt: the posting scan + semi-join) executes twice
    # (r14: the inline plan scanned documents 3x per probe — 2
    # index-build subtrees + the stats pass; now once each).
    # CONSUME-ONCE CONTRACT: localCheckpoint pins the slice to
    # non-replicated executor-local blocks, so the returned DataFrame
    # should be executed promptly and not re-executed after the
    # underlying index parquet mutates (it would serve the
    # checkpointed postings, and on a multi-executor cluster an
    # executor loss fails the action instead of recomputing). Build
    # the plan per probe — it is cheap — rather than holding one
    # long-lived result handle.
    matched = index.join(
        F.broadcast(q_terms.select("term").distinct()), "term", "left_semi"
    ).localCheckpoint(eager=False)
    dfreq = matched.groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    )
    if max_df_frac is not None:
        # dynamic-stopword cap on the probe's own term slice: inner
        # joins below drop a capped term's postings from scoring —
        # probe-time cap == build-time cap (parity pinned in tests)
        dfreq = dfreq.where(F.col("df") <= max_df_frac * n_docs)
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    tf_part = (
        F.col("tf") * (F.lit(k1) + 1.0)
        / (
            F.col("tf")
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(avgdl))
        )
    )
    scored = (
        matched.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(q_terms), "term")
        .groupBy("qid", "doc_id")
        .agg(F.round(F.sum(idf * tf_part), round_score).alias("score"))
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select(
            F.col("qid").alias(query_id), "doc_id", "score", "rn"
        )
    )


def rrf_fuse(
    rankings,
    k: int,
    rrf_k: int = 60,
    query_id: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rn",
    round_score: int = 6,
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack/Clarke/Büttcher 2009) — the
    standard score-free way to combine heterogeneous rankers into
    hybrid search: ``fused(q, d) = sum over lists of 1 / (rrf_k +
    rank)``, summed over every input ranking where the document
    appears for that query. Using RANKS (not scores) sidesteps the
    incomparable-score problem entirely — BM25 sums and cosine
    similarities fuse without calibration, which is why RRF is the
    default hybrid fusion in production search engines.

    ``rankings`` is a sequence of DataFrames each carrying
    ``(query_id, doc_col, rank_col)`` — e.g. :func:`bm25_topk` output
    and ``similarity.cosine_topk``/``ivf_probe`` output (rename the id
    columns to match; extra columns are ignored). Inputs are already
    per-query top-k relations, so fusion is a UNION + one (query, doc)
    GROUP BY over a few hundred rows per query — trivially cheap at
    any corpus scale; the heavy lifting stayed in the rankers.

    Returns ``(query_id, doc_col, score, n_lists, rn)`` with the fused
    score ROUNDED before ranking and (score desc, doc) tie-breaks —
    deterministic and engine-portable (the hybrid oracle re-derives it
    in SQL). ``n_lists`` = how many rankers surfaced the doc (a useful
    confidence signal: 2-of-2 beats a lone high rank at equal score
    only through the score itself — RRF's documented behavior)."""
    rankings = list(rankings)
    if not rankings:
        raise ValueError("rrf_fuse: need at least one ranking")
    if k < 1:
        raise ValueError("rrf_fuse: k must be >= 1")
    if rrf_k < 1:
        raise ValueError("rrf_fuse: rrf_k must be >= 1")
    parts = [
        r.select(
            F.col(query_id).alias("qid"),
            F.col(doc_col).alias("doc"),
            F.col(rank_col).alias("r"),
        )
        for r in rankings
    ]
    allr = parts[0]
    for p in parts[1:]:
        allr = allr.unionByName(p)
    fused = allr.groupBy("qid", "doc").agg(
        F.round(
            F.sum(F.lit(1.0) / (F.lit(float(rrf_k)) + F.col("r"))),
            round_score,
        ).alias("score"),
        F.count(F.lit(1)).alias("n_lists"),
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("score").desc(), F.col("doc")
    )
    return (
        fused.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select(
            F.col("qid").alias(query_id),
            F.col("doc").alias(doc_col),
            "score",
            "n_lists",
            "rn",
        )
    )


def _write_sync_state(fs, jvm, index_path: str, state: dict) -> None:
    """Commit the index sidecar (``_sync_state.json``) atomically:
    write-then-rename, the same discipline every sidecar writer in the
    mutation layer uses."""
    import json

    state_p = jvm.org.apache.hadoop.fs.Path(
        f"{index_path}/_sync_state.json"
    )
    tmp = jvm.org.apache.hadoop.fs.Path(str(state_p) + ".tmp")
    out = fs.create(tmp, True)
    try:
        out.write(json.dumps(state).encode("utf-8"))
    finally:
        out.close()
    fs.delete(state_p, False)
    if not fs.rename(tmp, state_p):
        raise RuntimeError(f"sync state commit failed: {state_p}")


def index_corpus_stats(spark, index_path: str) -> tuple[int, float]:
    """``(n_docs, avgdl)`` for a persisted tf index, read from its
    ``_sync_state.json`` sidecar — metadata-grain, NO corpus or index
    scan. :func:`baseline_search_index` records the stats at build time
    and :func:`sync_inverted_index` folds every synced slice into them
    (+doc/+dl per surviving new image, −doc/−dl per retired one), so a
    probe passing ``bm25_topk(..., index=..., stats=...)`` never
    touches the corpus — the "build once, probe forever" contract.
    Raises on a positional index or a pre-stats baseline (re-baseline
    to adopt the sidecar stats)."""
    from iot_sensor_data_pipeline_spark.sources.manifest import (
        _fs_for,
        _read_json_file,
    )

    fs, _root, jvm = _fs_for(spark, index_path)
    state_p = jvm.org.apache.hadoop.fs.Path(
        f"{index_path}/_sync_state.json"
    )
    if not fs.exists(state_p):
        raise ValueError(
            f"index_corpus_stats: no _sync_state.json under {index_path}"
        )
    state = _read_json_file(fs, jvm, state_p)
    if "n_docs" not in state or "sum_dl" not in state:
        raise ValueError(
            f"index_corpus_stats: {index_path} carries no corpus stats "
            "(positional index, or a baseline predating stats "
            "maintenance) — re-baseline the index to adopt them"
        )
    n_docs = int(state["n_docs"])
    avgdl = (int(state["sum_dl"]) / n_docs) if n_docs else 0.0
    return n_docs, avgdl


def sync_inverted_index(
    spark,
    src_path: str,
    index_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    manifest_cols=None,
    bloom_cols=None,
) -> dict:
    """Keep a PERSISTED inverted index in step with a mutable corpus
    through its change data feed (``mutations.read_change_feed``) —
    the retrieval layer joining the engine's IVM story: a GDPR delete,
    a text correction, or a backfill lands on the corpus table, and the
    searchable index follows at O(changed documents), never a corpus
    re-tokenization.

    Baseline once (``build_inverted_index(corpus).write.parquet(
    index_path)``), then call this on a cadence. Each sync nets the
    unapplied feed slice to the NEWEST image per document (the
    ``sync_from_change_feed`` netting — last-writer-wins per key), then
    applies exactly two steps:

    1. **retire**: one key-grain ``merge_into(when_matched='delete')``
       removes EVERY posting of every touched document (a bloom index
       on the postings' doc_id makes the probe open a handful of
       files; pass ``bloom_cols=['doc_id']`` after
       ``write_bloom_index``).
    2. **re-post**: surviving newest images (insert/update_post)
       re-tokenize through :func:`build_inverted_index` and APPEND as
       new posting files. Appends are safe to replay because step 1
       always precedes them over the same doc set — a crash anywhere
       re-nets the slice, the retire sweeps any half-appended postings
       of touched docs, and the re-post restores them exactly
       (convergent, same discipline as the replica sync).

    The cursor persists in the index directory's ``_sync_state.json``
    (write-then-rename, AFTER the slice fully applied) — the SAME
    sidecar format the replica sync uses, so the index registers
    directly as a feed consumer: ``expire_change_feed(consumers=
    [index_path])`` clamps expiry to the slowest index exactly as it
    does for replicas, and a feed gap past the cursor raises the
    re-baseline error instead of silently diverging.

    The incremental path maintains the UNFILTERED index only: a
    ``max_df_frac`` stopword cap is a corpus-GLOBAL property (one new
    document can push a term over the cap everywhere), so df-capped
    indexes rebuild — apply the cap at query time instead when the
    corpus mutates. :func:`sync_positional_index` maintains a
    :func:`positional_index` the same way (phrase search stays fresh
    under mutations) — identical retire+re-post discipline, different
    row builder. Returns ``{"applied_versions", "n_docs_retired",
    "n_postings_added", "from_version", "to_version"}``."""
    return _sync_index(
        spark, src_path, index_path, id_col, text_col,
        manifest_cols, bloom_cols,
        builder=lambda df: build_inverted_index(
            df, id_col=id_col, text_col=text_col
        ),
    )


def sync_positional_index(
    spark,
    src_path: str,
    index_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    manifest_cols=None,
    bloom_cols=None,
) -> dict:
    """:func:`sync_inverted_index` for a persisted
    :func:`positional_index` — exact phrase search stays fresh as the
    corpus mutates, at O(changed documents). Same netting, same
    key-grain retire merge, same replay-convergent re-post append,
    same ``_sync_state.json`` consumer cursor (feed expiry clamps to
    the positional index too)."""
    return _sync_index(
        spark, src_path, index_path, id_col, text_col,
        manifest_cols, bloom_cols,
        builder=lambda df: positional_index(
            df, id_col=id_col, text_col=text_col
        ),
    )


def _sync_index(
    spark,
    src_path: str,
    index_path: str,
    id_col: str,
    text_col: str,
    manifest_cols,
    bloom_cols,
    builder,
) -> dict:
    """Shared feed-follow core of the index syncs (see
    :func:`sync_inverted_index` for the full contract): net the slice
    to newest-image-per-doc, retire every touched doc's rows with one
    key-grain delete merge, re-derive rows for surviving images via
    ``builder`` and append, commit the cursor last."""
    from pyspark.sql import Window as W

    from iot_sensor_data_pipeline_spark.sources.manifest import (
        _fs_for,
        _read_json_file,
    )
    from iot_sensor_data_pipeline_spark.sources.mutations import (
        _OP,
        change_feed_versions,
        merge_into,
        read_change_feed,
    )

    fs, _root, jvm = _fs_for(spark, index_path)
    state_p = jvm.org.apache.hadoop.fs.Path(
        f"{index_path}/_sync_state.json"
    )
    state: dict = {}
    if fs.exists(state_p):
        state = _read_json_file(fs, jvm, state_p)
    last = int(state.get("version", 0))
    # corpus stats (tf indexes baselined with them): folded exactly —
    # the same signed-moment algebra the matviews use, so a probe's
    # N/avgdl never needs a corpus scan (index_corpus_stats)
    has_stats = "n_docs" in state and "sum_dl" in state
    all_versions = change_feed_versions(spark, src_path)
    if all_versions and last + 1 < all_versions[0]:
        raise ValueError(
            f"change feed gap: the index's cursor is {last} but the "
            f"oldest retained feed version is {all_versions[0]} — "
            "re-baseline the index from the corpus, then resume"
        )
    versions = [v for v in all_versions if v > last]
    n_retired = n_added = 0
    if versions:
        feed = read_change_feed(spark, src_path, since_version=last)
        op_rank = F.when(F.col(_OP) == "update_post", 1).otherwise(0)
        newest = (
            feed.withColumn(
                "__rn",
                F.row_number().over(
                    W.partitionBy(id_col).orderBy(
                        F.col("__commit_version").desc(), op_rank.desc()
                    )
                ),
            )
            .where(F.col("__rn") == 1)
            .persist()
        )
        try:
            touched = newest.select(
                F.col(id_col).alias("doc_id")
            ).distinct()
            retired_docs = retired_dl = 0
            if has_stats:
                # existence-before per key from the slice's EARLIEST
                # event: CDC discipline makes 'insert' mean the key was
                # absent, anything else means present — exact even for
                # zero-token documents the index itself cannot see
                first_op = (
                    feed.withColumn(
                        "__rn1",
                        F.row_number().over(
                            W.partitionBy(id_col).orderBy(
                                F.col("__commit_version").asc(),
                                op_rank.asc(),
                            )
                        ),
                    )
                    .where(F.col("__rn1") == 1)
                )
                # dl mass leaving the index comes from the feed
                # slice's PRE-IMAGES, not from the live index: the
                # earliest non-insert event per doc (delete /
                # update_pre) carries the row exactly as it stood at
                # the cursor version, and the feed is immutable — so a
                # crash between the retire merge (or append) and the
                # cursor commit replays to the SAME retired mass,
                # where a read of the by-then-mutated postings would
                # see 0 (after retire) or the new dl (after append)
                # and skew sum_dl/avgdl for every future stats probe.
                # Re-tokenizing the pre-image equals the stored dl by
                # construction (the postings were built by the same
                # tokenizer from the same text), costs no index scan,
                # and zero-token docs contribute 0 either way.
                pre = first_op.where(F.col(_OP) != "insert")
                row = pre.agg(
                    F.count(F.lit(1)).alias("c"),
                    F.sum(
                        F.size(
                            F.coalesce(
                                tokenize_terms(F.col(text_col)),
                                F.array().cast("array<string>"),
                            )
                        )
                    ).alias("s"),
                ).first()
                retired_docs = int(row["c"] or 0)
                retired_dl = int(row["s"] or 0)
            if touched.limit(1).count():
                try:
                    r = merge_into(
                        spark, index_path, touched, on=["doc_id"],
                        when_matched="delete", insert=False,
                        manifest_cols=manifest_cols,
                        bloom_cols=bloom_cols,
                    )
                    n_retired = r["n_rows_deleted"]
                except ValueError as e:
                    # a fully-emptied index (every doc deleted earlier)
                    # has no data files to probe; nothing to retire
                    if "no parquet data files" not in str(e):
                        raise
            survivors = newest.where(
                F.col(_OP).isin("insert", "update_post")
            ).select(id_col, text_col)
            new_postings = builder(survivors).persist()
            try:
                n_added = new_postings.count()
                if n_added:
                    new_postings.write.mode("append").parquet(index_path)
                if has_stats:
                    n_after = survivors.count()
                    row = (
                        new_postings.select("doc_id", "dl").distinct()
                        .agg(F.sum("dl").alias("s"))
                        .first()
                    )
                    added_dl = int(row["s"] or 0)
                    state["n_docs"] = (
                        int(state["n_docs"]) - retired_docs + n_after
                    )
                    state["sum_dl"] = (
                        int(state["sum_dl"]) - retired_dl + added_dl
                    )
            finally:
                new_postings.unpersist()
        finally:
            newest.unpersist()
        state["version"] = versions[-1]
        _write_sync_state(fs, jvm, index_path, state)
    return {
        "applied_versions": versions,
        "n_docs_retired": n_retired,
        "n_postings_added": n_added,
        "from_version": last,
        "to_version": versions[-1] if versions else last,
    }


def positional_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(term, doc_id, pos)`` — one row per token OCCURRENCE with its
    0-based position; the positional sibling of
    :func:`build_inverted_index` and the substrate phrase queries run
    on. Same portable tokenizer, same bucket-by-term persistence
    advice. Bigger than the tf index by design (it keeps every
    occurrence), which is exactly the classic positional-index space
    trade every search engine makes for phrase support."""
    toks = tokenize_terms(F.col(text_col))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.coalesce(toks, F.array().cast("array<string>"))
        ).alias("pos", "term"),
    ).select("term", "doc_id", "pos")


def phrase_search(
    docs: DataFrame,
    phrases: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    phrase_id: str = "phrase_id",
    phrase_text: str = "phrase_text",
    index: DataFrame | None = None,
) -> DataFrame:
    """Exact phrase matching over the corpus — ``(phrase_id, doc_id,
    n_occurrences)`` for every document containing the phrase's tokens
    CONSECUTIVELY (overlapping occurrences each count: 'a a' occurs
    twice in 'a a a'). The workhorse of decontamination forensics
    ("which documents contain this benchmark sentence verbatim") and
    quote tracking, where BM25's bag-of-words is too loose.

    One relational step, any phrase length, no per-length plan: the
    phrase explodes to ``(pid, i, term)`` tokens (tiny — broadcasts),
    joins the positional postings on ``term``, and each joined row
    proposes an ANCHOR ``pos - i`` (where the phrase would have to
    start for this token to be its i-th word). A (pid, doc, anchor)
    group where EVERY phrase offset checked in — ``count(*) ==
    phrase_len``, exact because (doc, pos) is unique per token — is
    one occurrence. Duplicate terms inside a phrase need no special
    case: each occurrence slot is a distinct ``i``.

    Pass a persisted :func:`positional_index` as ``index`` for the
    build-once path. Phrases with no alphanumeric token raise (an
    empty phrase matches everything or nothing — force the caller to
    decide). Cost: |postings of the phrases' terms| — the broadcast
    semi-join prunes everything else before the anchor grouping."""
    if index is None:
        index = positional_index(docs, id_col, text_col)
    q = phrases.select(
        F.col(phrase_id).alias("pid"),
        F.posexplode(
            tokenize_terms(F.col(phrase_text))
        ).alias("i", "term"),
    )
    q_len = phrases.select(
        F.col(phrase_id).alias("pid"),
        F.size(tokenize_terms(F.col(phrase_text))).alias("plen"),
    )
    bad = q_len.where(
        F.col("plen").isNull() | (F.col("plen") < 1)
    ).limit(1).collect()
    if bad:
        raise ValueError(
            f"phrase_search: phrase {bad[0].pid!r} has no alphanumeric "
            "tokens — an empty phrase is ambiguous; drop it or fix it"
        )
    hits = (
        index.join(F.broadcast(q), "term")
        .select("pid", "doc_id", (F.col("pos") - F.col("i")).alias("anchor"))
        .groupBy("pid", "doc_id", "anchor")
        .agg(F.count(F.lit(1)).alias("n_aligned"))
        .join(F.broadcast(q_len), "pid")
        .where(F.col("n_aligned") == F.col("plen"))
        .groupBy("pid", "doc_id")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    return hits.select(
        F.col("pid").alias(phrase_id), "doc_id", "n_occurrences"
    )


def baseline_search_index(
    spark,
    src_path: str,
    index_path: str,
    kind: str = "tf",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict:
    """Build a search index's FIRST version from the corpus table and
    stamp its feed cursor — the baseline the sync functions resume
    from. ``kind``: ``"tf"`` (:func:`build_inverted_index`, BM25) or
    ``"positional"`` (:func:`positional_index`, phrase search). Reads
    the corpus under the mutation layer's rules (crash recovery first,
    union schema, verbatim partition strings) so the baseline sees
    exactly the relation the feed describes. The cursor is taken
    BEFORE the scan and VERIFIED unchanged after it (the
    ``create_agg_view`` discipline: an insert-only feed version
    committing mid-build would re-apply as silent double postings — a
    moved cursor deletes the suspect index and raises)."""
    from iot_sensor_data_pipeline_spark.sources.manifest import _fs_for
    from iot_sensor_data_pipeline_spark.sources.mutations import (
        _layout,
        _read_files,
        _read_schema_for,
        change_feed_versions,
        recover_optimize,
    )

    if kind not in ("tf", "positional"):
        raise ValueError(
            f"baseline_search_index: kind must be 'tf' or 'positional', "
            f"got {kind!r}"
        )
    fs, root, jvm = _fs_for(spark, index_path)
    if fs.exists(root):
        raise ValueError(
            f"baseline_search_index: {index_path} already exists — "
            "sync_*_index maintains it; delete it to re-baseline"
        )
    recover_optimize(spark, src_path)
    feed = change_feed_versions(spark, src_path)
    cursor = feed[-1] if feed else 0
    part_cols, files, _rel = _layout(spark, src_path)
    _ds, schema = _read_schema_for(spark, src_path, files, part_cols)
    corpus = _read_files(spark, src_path, files, schema).select(
        id_col, text_col
    )
    builder = (
        build_inverted_index if kind == "tf" else positional_index
    )
    builder(corpus, id_col=id_col, text_col=text_col) \
        .write.parquet(index_path)
    after = change_feed_versions(spark, src_path)
    if after and after[-1] > cursor:
        fs.delete(root, True)
        raise RuntimeError(
            f"baseline_search_index: feed version(s) "
            f"{[v for v in after if v > cursor]} committed on "
            f"{src_path} DURING the build scan — the index may have "
            "seen them partially and was deleted; rebuild under the "
            "single-maintenance-writer discipline"
        )
    state = {"version": cursor}
    if kind == "tf":
        # corpus stats ride the sidecar so probes never re-scan the
        # corpus (index_corpus_stats / bm25_topk stats=...): n_docs
        # from the corpus relation (counts zero-token docs the index
        # cannot see), sum_dl from the written postings' distinct
        # (doc_id, dl) pairs (zero-token docs contribute 0 exactly);
        # sync_inverted_index folds every slice into both.
        n_docs = corpus.count()
        row = (
            spark.read.parquet(index_path)
            .select("doc_id", "dl").distinct()
            .agg(F.sum("dl").alias("s")).first()
        )
        state["n_docs"] = int(n_docs)
        state["sum_dl"] = int(row["s"] or 0)
    _write_sync_state(fs, jvm, index_path, state)
    return {"status": "created", "kind": kind, "feed_version": cursor}
