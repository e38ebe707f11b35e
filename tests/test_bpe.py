"""BPE tokenizer induction (operators/bpe.py): merge-table equality
with an independent Python reference (same deterministic tie-break),
partitioning invariance, encode semantics, training-path plan hygiene."""

from __future__ import annotations

from collections import Counter

import pytest

from iot_sensor_data_pipeline_spark.operators.bpe import (
    EOW,
    bpe_encode,
    bpe_train,
    bpe_vocabulary,
    word_frequencies,
)

CORPUS = (
    "low low low lower lower newest newest newest newest widest "
    "the cat sat on the mat the cat ran the low road"
)


def _ref_bpe(text: str, n_merges: int, min_pair_freq: int = 2):
    """Independent reference: Sennrich's algorithm with the pinned
    (count desc, lexicographic pair) tie-break."""
    vocab = Counter(text.split())
    words = {w: list(w) + [EOW] for w in vocab}
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for w, syms in words.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += vocab[w]
        eligible = [(n, p) for p, n in pairs.items() if n >= min_pair_freq]
        if not eligible:
            break
        # max by count then LEX SMALLEST pair
        top_n = max(n for n, _ in eligible)
        a, b = sorted(p for n, p in eligible if n == top_n)[0]
        merges.append((a, b))
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges


def _docs(spark, text=CORPUS, npart=1):
    return spark.createDataFrame([(1, text)], "id long, text string").repartition(npart)


def test_merges_match_python_reference(spark):
    got = bpe_train(_docs(spark), n_merges=12)
    want = _ref_bpe(CORPUS, 12)
    assert got == want


def test_training_is_partitioning_invariant(spark):
    many_docs = spark.createDataFrame(
        [(i, w) for i, w in enumerate(CORPUS.split())], "id long, text string"
    )
    a = bpe_train(_docs(spark, npart=1), n_merges=8)
    b = bpe_train(many_docs.repartition(13), n_merges=8)
    assert a == b  # corpus = same multiset of words either way


def test_early_stop_when_corpus_exhausted(spark):
    merges = bpe_train(_docs(spark, "aa aa bb"), n_merges=50, min_pair_freq=2)
    # only ('a','a') reaches freq 2 at char level; ('aa', EOW) then has
    # freq 2 as well; 'b' pairs have freq 1 -> early stop well below 50
    assert 0 < len(merges) < 50


def test_encode_matches_training_segmentation(spark):
    """Encoding the training corpus with the learned table reproduces
    the reference's final word segmentations."""
    n = 12
    merges = bpe_train(_docs(spark), n_merges=n)
    ref_merges = _ref_bpe(CORPUS, n)
    # reference final segmentation
    words = {w: list(w) + [EOW] for w in set(CORPUS.split())}
    for a, b in ref_merges:
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b); i += 2
                else:
                    out.append(syms[i]); i += 1
            words[w] = out
    df = bpe_encode(_docs(spark), merges)
    toks = df.collect()[0]["bpe_tokens"]
    want = [t for w in CORPUS.split() for t in words[w]]
    assert toks == want


def test_vocabulary_lists_merge_results(spark):
    merges = bpe_train(_docs(spark), n_merges=5)
    assert bpe_vocabulary(merges) == [a + b for a, b in merges]


def test_training_rounds_are_jvm_side(spark):
    """The pair-count aggregation (the per-round corpus-scale job)
    must contain no Python evaluation."""
    from pyspark.sql import functions as F

    from iot_sensor_data_pipeline_spark.operators.bpe import (
        _adjacent_pairs,
        _initial_symbols,
    )

    vocab = word_frequencies(_docs(spark)).select(
        _initial_symbols(F.col("word")).alias("syms"), "freq"
    )
    pair_counts = (
        vocab.select(F.explode(_adjacent_pairs(F.col("syms"))).alias("p"), "freq")
        .groupBy("p.a", "p.b")
        .agg(F.sum("freq").alias("n"))
    )
    plan = pair_counts._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_guards(spark):
    with pytest.raises(ValueError, match="n_merges"):
        bpe_train(_docs(spark), n_merges=0)
    with pytest.raises(ValueError, match="batch_size"):
        bpe_train(_docs(spark), n_merges=1, batch_size=0)
    # min_pair_freq <= 0 would let the in-memory path emit phantom
    # count-0 merges the distributed path can never see — rejected
    with pytest.raises(ValueError, match="min_pair_freq"):
        bpe_train(_docs(spark), n_merges=1, min_pair_freq=0)


# conflict-rich fixtures: count ties everywhere, pairs sharing symbols,
# chaining runs (aaa), abab overlap patterns, and a merge whose output
# string ("ab") collides with a pre-existing word's prefix path
CONFLICT_FIXTURES = [
    "aa aa aa aab aab ab ab ab b a aaa aaa abab abab ba ba",
    "xy xy xyz xyz xyzw xyzw zw zw wx wx yz yz x y z w",
    "the the then then them hem hem he he th th e t",
    "ab ab ab ab cd cd cd ef ef gh ij",  # disjoint pairs, decaying counts
    "aaaa aaaa aaa aa a",  # pure chaining
]


@pytest.mark.parametrize("text", CONFLICT_FIXTURES)
def test_batched_and_driver_paths_exact(spark, text):
    """All cadence regimes — singleton distributed, batched
    distributed, in-memory driver — produce the identical merge list,
    equal to the independent Python reference."""
    want = _ref_bpe(text, 20)
    docs = _docs(spark, text)
    # driver fast path (default cap)
    st = {}
    assert bpe_train(docs, n_merges=20, stats=st) == want
    assert st["mode"] == "driver" and st["rounds"] == 1
    # distributed paths (cap disabled)
    for bs in (1, 4, 64):
        st = {}
        got = bpe_train(
            docs, n_merges=20, batch_size=bs, driver_vocab_cap=0, stats=st
        )
        assert got == want, f"batch_size={bs}"
        assert st["mode"] == "distributed"


def test_driver_path_cuts_rounds_10x(spark):
    """The in-memory path learns the full merge table in 2 driver
    actions; singleton-distributed needs one per merge — >=10x fewer
    rounds whenever >=20 merges are learnable."""
    rich = CORPUS + (
        " stream stream streaming streaming streams window windows "
        "window partition partition partitions shuffle shuffles shuffle "
        "broadcast broadcasts broadcast cluster clusters clustering"
    )
    st_fast, st_slow = {}, {}
    fast = bpe_train(_docs(spark, rich), n_merges=60, stats=st_fast)
    slow = bpe_train(
        _docs(spark, rich),
        n_merges=60,
        batch_size=1,
        driver_vocab_cap=0,
        stats=st_slow,
    )
    assert fast == slow
    assert st_slow["merges"] >= 20
    assert st_fast["rounds"] * 10 <= st_slow["rounds"]


def test_distributed_batching_reduces_rounds(spark):
    """Even without the driver path, the commuting-prefix batch applies
    >1 merge per round on a corpus with decaying disjoint pair counts."""
    text = " ".join(["ab"] * 64 + ["cd"] * 32 + ["ef"] * 16 + ["gh"] * 8)
    st1, stb = {}, {}
    m1 = bpe_train(
        _docs(spark, text), n_merges=8, batch_size=1, driver_vocab_cap=0, stats=st1
    )
    mb = bpe_train(
        _docs(spark, text), n_merges=8, batch_size=32, driver_vocab_cap=0, stats=stb
    )
    assert m1 == mb
    assert stb["rounds"] < st1["rounds"]


def test_in_memory_trainer_hypothesis_differential():
    """The incremental in-memory trainer (lazy heap + per-pair word
    index) vs the naive recount reference, on randomized small-alphabet
    corpora where ties, chains, and collisions are dense. Pure Python on
    both sides — no Spark — so hypothesis can hammer it."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from iot_sensor_data_pipeline_spark.operators.bpe import _train_in_memory

    word = st.text(alphabet="abc", min_size=1, max_size=6)
    corpus = st.lists(word, min_size=1, max_size=40)

    @settings(max_examples=200, deadline=None)
    @given(corpus=corpus, n_merges=st.integers(1, 25),
           min_freq=st.integers(1, 3))
    def check(corpus, n_merges, min_freq):
        text = " ".join(corpus)
        wf = Counter(corpus)
        got = _train_in_memory(sorted(wf.items()), n_merges, min_freq)
        want = _ref_bpe(text, n_merges, min_freq)
        assert got == want, (text, n_merges, min_freq)

    check()
