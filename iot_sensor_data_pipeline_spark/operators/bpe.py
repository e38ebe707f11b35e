"""Corpus-scale BPE tokenizer induction (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units").

``functions.text.bpe_ish_token_count`` APPROXIMATES a subword
tokenizer's token count with a fixed regex; this module LEARNS the
actual merge table from the corpus — the missing piece for building a
tokenizer on the data the engine curates.

Spark-first shape: BPE statistics live on the WORD VOCABULARY, not the
corpus — the classic algorithm aggregates the corpus once into
(word, freq) and then iterates over that (much smaller) relation. Each
merge round is:

1. adjacent-pair counts: one explode + hash-aggregate over the vocab,
   weighted by word frequency (all codegen — no Python in training);
2. argmax pair with a DETERMINISTIC tie-break (count desc, then
   lexicographic (a, b)) — Sennrich's reference breaks ties by dict
   order, which is run-dependent; ours is pinned so training is
   reproducible across partitionings (tested);
3. apply the merge to every word's symbol array with a greedy
   leftmost fold (``aggregate``: push symbol; if the top two equal the
   pair, collapse) — the same greedy order the reference applies.

The driver sees ONE small collect per ROUND — and a round applies up
to ``batch_size`` merges, not one. From each round's pair-count
snapshot we accept the longest PREFIX of the (count desc, lexicographic)
ranking that provably equals what sequential BPE would pick next:

- prefix rule: accepted pairs are consecutive snapshot ranks — on the
  first conflict the batch stops there (singleton fallback is
  automatic: rank-1 is always exact);
- symbol-disjointness: each accepted pair's {a, b, a+b} is disjoint
  from every earlier accepted pair's — merging (a,b) then never
  changes a later accepted pair's count;
- new-pair domination: merging (a,b) creates pairs (x, ab)/(ab, y)
  whose counts are bounded by the SNAPSHOT counts of (x, a)/(b, y);
  a later pair is accepted only if its count STRICTLY exceeds every
  such source count (and the snapshot cutoff, so uncollected pairs
  can't outrank it either) — so no created pair can beat it at its
  sequential turn;
- no-collision: if an accepted pair's output string equals an
  already-existing symbol (a previous merge's output or the EOW
  marker), stale-count reasoning breaks for LATER picks, so the
  prefix freezes after that pair (it itself is still exact).

These conditions make batched training EXACTLY equal to singleton
training (tested for batch sizes 1/4/16/64 on conflict-rich fixtures).
The symbol relation is localCheckpointed every ``checkpoint_interval``
APPLIED MERGES — this keeps lineage flat AND bounds the nested-fold
depth a single projection ever compiles: a large batch is applied in
sub-chunks of at most ``checkpoint_interval`` folds per checkpoint, so
analysis/codegen cost stays constant as ``batch_size`` grows.

Above the batching sits the bigger lever: after the corpus pass, BPE
statistics live entirely on the DISTINCT-WORD frequency relation,
which is many orders of magnitude smaller than the corpus (100 TB of
web text has ~10^8-10^9 distinct "words", not 10^13). When that
relation fits under ``driver_vocab_cap`` rows, training collects it
ONCE and runs the exact incremental algorithm in memory (lazy max-heap
over pair counts + per-pair word index — the structure subword-nmt /
fastBPE use), with the SAME deterministic tie-break: zero cluster
actions per merge, ONE driver action total (the capped collect both
fetches the vocabulary and proves it fits). Only a corpus whose
distinct-word count exceeds the cap pays the distributed per-round
path — and there the batch prefix still cuts the driver cadence. At
100 TB the corpus pass is one shuffle of (word, 1) partials (map-side
combined); everything after is O(vocab), independent of corpus size.

``bpe_encode`` applies a learned merge table to new text. Encoding IS
sequential per word (each merge rewrites the symbol sequence the next
one sees), so it runs as an Arrow-batched pandas UDF over a
driver-small broadcast merge list — the documented Python-boundary
regime (vectorized batches, never row-at-a-time).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from iot_sensor_data_pipeline_spark.functions.text import ws_tokens as _words

#: end-of-word sentinel (classic BPE): lets merges distinguish
#: word-final from word-internal contexts and makes detokenization
#: unambiguous
EOW = "</w>"


def word_frequencies(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, freq) over the corpus — the one corpus-wide pass."""
    return (
        df.select(F.explode(_words(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _initial_symbols(word: Column) -> Column:
    """chars + end-of-word marker: 'low' -> [l, o, w, </w>]."""
    return F.concat(
        F.split(word, ""), F.array(F.lit(EOW))
    )


def _adjacent_pairs(syms: Column) -> Column:
    """[(s_i, s_i+1)] for a symbol array."""
    n = F.size(syms)
    return F.when(n < 2, F.array().cast("array<struct<a:string,b:string>>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), n - 2),
            lambda i: F.struct(
                F.element_at(syms, i + 1).alias("a"),
                F.element_at(syms, i + 2).alias("b"),
            ),
        )
    )


def _apply_merge(syms: Column, a: str, b: str) -> Column:
    """Greedy leftmost collapse of adjacent (a, b) into a+b."""
    merged = a + b
    empty = F.array().cast("array<string>")
    return F.aggregate(
        syms,
        empty,
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (s == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def _select_batch(
    top: list,
    exhausted: bool,
    budget: int,
    prior_outputs: set[str],
) -> list[tuple[str, str]]:
    """Longest prefix of the snapshot ranking ``top`` (rows of
    (a, b, n), sorted count desc then lexicographic) that provably
    equals sequential BPE's next picks — see the module docstring for
    the four conditions. ``exhausted`` means the snapshot holds EVERY
    eligible pair (so there is no unseen-pair cutoff); ``prior_outputs``
    are the symbol strings earlier merges already created (+ EOW)."""
    a0, b0 = top[0]["a"], top[0]["b"]
    accepted = [(a0, b0)]
    sym_sets = [{a0, b0, a0 + b0}]
    cutoff = 0 if exhausted else top[-1]["n"]
    # source-pair count bounds for new pairs: a merge (a_j, b_j) can
    # only create pairs counted at most max(count of (x, a_j)) /
    # max(count of (b_j, y)) over the SNAPSHOT
    max_as_second: dict[str, int] = {}
    max_as_first: dict[str, int] = {}
    for r in top:
        n = r["n"]
        if max_as_second.get(r["b"], 0) < n:
            max_as_second[r["b"]] = n
        if max_as_first.get(r["a"], 0) < n:
            max_as_first[r["a"]] = n
    for i in range(1, len(top)):
        if len(accepted) >= budget:
            break
        a_i, b_i, c_i = top[i]["a"], top[i]["b"], top[i]["n"]
        # uncollected pairs have count <= cutoff: require strict win
        if not exhausted and c_i <= cutoff:
            break
        # no-collision: every accepted output must be a brand-new
        # symbol, else counts of pairs touching it shift unpredictably
        if any((a + b) in prior_outputs for a, b in accepted):
            break
        s_i = {a_i, b_i, a_i + b_i}
        ok = True
        for (a_j, b_j), s_j in zip(accepted, sym_sets):
            if s_i & s_j:
                ok = False
                break
            # strict domination over any pair merge j could create
            if (
                max_as_second.get(a_j, 0) >= c_i
                or max_as_first.get(b_j, 0) >= c_i
            ):
                ok = False
                break
        if not ok:
            break
        accepted.append((a_i, b_i))
        sym_sets.append(s_i)
    return accepted


def _train_in_memory(
    word_freqs: list[tuple[str, int]],
    n_merges: int,
    min_pair_freq: int,
) -> list[tuple[str, str]]:
    """Exact BPE over a collected (word, freq) relation: incremental
    pair-count maintenance (only words CONTAINING the merged pair are
    rewritten, found via a per-pair word index) + a lazy max-heap for
    the argmax, so a merge costs O(affected words) not O(vocab).
    Tie-break identical to the distributed path: count desc, then
    lexicographic (a, b) — heap entries (-n, (a, b)) order exactly so.
    """
    import heapq
    from collections import defaultdict

    words = [list(w) + [EOW] for w, _ in word_freqs]
    freqs = [f for _, f in word_freqs]
    pair_counts: dict = defaultdict(int)
    pair_words: dict = defaultdict(set)
    for idx, syms in enumerate(words):
        f = freqs[idx]
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            pair_counts[p] += f
            pair_words[p].add(idx)
    heap = [(-n, p) for p, n in pair_counts.items()]
    heapq.heapify(heap)

    def push(p):
        heapq.heappush(heap, (-pair_counts[p], p))

    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges and heap:
        negn, best = heap[0]
        if pair_counts.get(best, 0) != -negn:
            heapq.heappop(heap)  # stale entry
            continue
        if -negn < min_pair_freq:
            break  # valid heap top IS the max -> corpus exhausted
        heapq.heappop(heap)
        a, b = best
        merges.append((a, b))
        for idx in sorted(pair_words[best]):
            syms, f = words[idx], freqs[idx]
            touched = set()
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pair_counts[p] -= f
                pair_words[p].discard(idx)
                touched.add(p)
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[idx] = out
            for i in range(len(out) - 1):
                p = (out[i], out[i + 1])
                pair_counts[p] += f
                pair_words[p].add(idx)
                touched.add(p)
            for p in touched:
                push(p)
    return merges


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 100,
    min_pair_freq: int = 2,
    checkpoint_interval: int = 10,
    batch_size: int = 32,
    driver_vocab_cap: int = 1_000_000,
    stats: dict | None = None,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus; returns the
    ordered merge list (the tokenizer model — apply with
    :func:`bpe_encode`). Stops early when no adjacent pair reaches
    ``min_pair_freq`` (corpus exhausted).

    Training runs on the distinct-word frequency relation. When it has
    at most ``driver_vocab_cap`` rows it is collected and trained
    in-memory (exact incremental algorithm, zero cluster actions per
    merge); larger vocabularies run distributed rounds where
    ``batch_size`` bounds how many merges one driver round-trip may
    apply. BOTH paths produce EXACTLY the ``batch_size=1`` distributed
    merge list (the batch is a provably-commuting prefix — see module
    docstring); only the driver cadence changes. Pass a dict as
    ``stats`` to receive ``{"rounds": driver actions used, "merges":
    merges learned, "mode": "driver" | "distributed"}``.
    """
    if n_merges < 1:
        raise ValueError("bpe_train: n_merges must be >= 1")
    if batch_size < 1:
        raise ValueError("bpe_train: batch_size must be >= 1")
    if min_pair_freq < 1:
        # the distributed path's `n >= min_pair_freq` filter only ever
        # sees pairs that EXIST (count >= 1), so freq <= 0 silently
        # behaves like 1 there — while the in-memory path's heap keeps
        # count-0 entries for fully-merged pairs, which a <= 0 floor
        # would let through as phantom merges; pin the shared domain
        raise ValueError("bpe_train: min_pair_freq must be >= 1")
    wf = word_frequencies(df, text_col)
    if driver_vocab_cap > 0:
        # capped collect: LIMIT cap+1 bounds the driver transfer AND
        # answers does-it-fit in the SAME corpus pass (a separate
        # count-probe would scan the corpus twice); one extra row
        # proves overflow without materializing the full vocabulary.
        # Persist first so the OVERFLOW path reuses the aggregated
        # relation instead of re-running the corpus pass from scratch
        # (at scale the probe is the expensive aggregation itself).
        wf = wf.persist()
        try:
            rows = wf.limit(driver_vocab_cap + 1).collect()
            if len(rows) <= driver_vocab_cap:
                merges = _train_in_memory(
                    [(r["word"], r["freq"]) for r in rows],
                    n_merges,
                    min_pair_freq,
                )
                if stats is not None:
                    stats["rounds"] = 1
                    stats["merges"] = len(merges)
                    stats["mode"] = "driver"
                return merges
            vocab = wf.select(
                _initial_symbols(F.col("word")).alias("syms"), "freq"
            )
            # eager localCheckpoint materializes from the persisted wf
            vocab = vocab.localCheckpoint()
        finally:
            wf.unpersist()
    else:
        vocab = wf.select(
            _initial_symbols(F.col("word")).alias("syms"), "freq"
        )
        vocab = vocab.localCheckpoint()
    merges: list[tuple[str, str]] = []
    prior_outputs = {EOW}
    rounds = 0
    since_ckpt = 0
    while len(merges) < n_merges:
        pair_counts = (
            vocab.select(F.explode(_adjacent_pairs(F.col("syms"))).alias("p"), "freq")
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("n"))
            .where(F.col("n") >= min_pair_freq)
        )
        # deterministic ranking: count desc, then lexicographic (a, b)
        fetch = max(batch_size, 2)
        top = pair_counts.orderBy(
            F.col("n").desc(), F.col("a"), F.col("b")
        ).limit(fetch).collect()
        rounds += 1
        if not top:
            break
        batch = _select_batch(
            top,
            len(top) < fetch,
            min(batch_size, n_merges - len(merges)),
            prior_outputs,
        )
        # apply the batch in sub-chunks so the UNCHECKPOINTED fold
        # depth never exceeds checkpoint_interval: nested F.aggregate
        # folds grow analysis/codegen cost linearly, and Catalyst's
        # CollapseProject re-inlines consecutive selects — only a
        # localCheckpoint truncates the expression tree, so a batch of
        # 64 must never compile as a 64-deep fold
        i = 0
        while i < len(batch):
            chunk = batch[i : i + max(1, checkpoint_interval - since_ckpt)]
            i += len(chunk)
            col = F.col("syms")
            for a, b in chunk:
                merges.append((a, b))
                prior_outputs.add(a + b)
                col = _apply_merge(col, a, b)
            vocab = vocab.select(col.alias("syms"), "freq")
            since_ckpt += len(chunk)
            if since_ckpt >= checkpoint_interval:
                vocab = vocab.localCheckpoint()
                since_ckpt = 0
    if stats is not None:
        stats["rounds"] = rounds
        stats["merges"] = len(merges)
        stats["mode"] = "distributed"
    return merges


def bpe_vocabulary(merges: list[tuple[str, str]]) -> list[str]:
    """The subword units the merge table can produce (merge results in
    learned order; base characters are implicit)."""
    return [a + b for a, b in merges]


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize ``text_col`` with a learned merge table: per word,
    apply every merge greedily in learned order; output is the
    flattened subword array (word-final units carry ``</w>``).

    Encoding is inherently sequential per word, so this is the
    documented Arrow/pandas boundary: the merge list broadcasts via
    closure (driver-small), batches vectorize over Arrow.
    """
    from pyspark.sql.functions import pandas_udf

    ranks = {pair: i for i, pair in enumerate(merges)}

    def encode_word(word: str) -> list[str]:
        syms = list(word) + [EOW]
        while len(syms) >= 2:
            best, best_rank = None, None
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best, best_rank = i, r
            if best is None:
                break
            a, b = merges[best_rank]
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    def encode_series(s):
        import re

        import pandas as pd

        # token boundaries MUST match training's ws_tokens (Java \s+,
        # which is ASCII [ \t\n\x0B\f\r] without UNICODE_CHARACTER_CLASS);
        # Python's str.split()/bare \s+ match Unicode whitespace (NBSP,
        # ideographic space) and would tokenize differently at encode
        # time — re.ASCII pins the same class Java uses
        split = re.compile(r"\s+", re.ASCII).split
        return pd.Series(
            [
                [t for w in split(x or "") if w for t in encode_word(w)]
                for x in s
            ]
        )

    enc = pandas_udf(encode_series, "array<string>")
    return df.withColumn(out_col, enc(F.col(text_col)))
