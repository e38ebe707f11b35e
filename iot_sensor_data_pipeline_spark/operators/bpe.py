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

The driver sees ONE row per round (the winning pair) — the same
bounded-driver-action regime as pagerank — and the symbol relation is
localCheckpointed every ``checkpoint_interval`` rounds to keep lineage
flat. At 100 TB the corpus pass is one shuffle of (word, 1) partials
(map-side combined); rounds then cost O(vocab), independent of corpus
size.

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


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 100,
    min_pair_freq: int = 2,
    checkpoint_interval: int = 10,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus; returns the
    ordered merge list (the tokenizer model — apply with
    :func:`bpe_encode`). Stops early when no adjacent pair reaches
    ``min_pair_freq`` (corpus exhausted)."""
    if n_merges < 1:
        raise ValueError("bpe_train: n_merges must be >= 1")
    vocab = word_frequencies(df, text_col).select(
        _initial_symbols(F.col("word")).alias("syms"), "freq"
    )
    vocab = vocab.localCheckpoint()
    merges: list[tuple[str, str]] = []
    for r in range(n_merges):
        pair_counts = (
            vocab.select(F.explode(_adjacent_pairs(F.col("syms"))).alias("p"), "freq")
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("n"))
            .where(F.col("n") >= min_pair_freq)
        )
        # deterministic winner: count desc, then lexicographic (a, b)
        top = pair_counts.orderBy(
            F.col("n").desc(), F.col("a"), F.col("b")
        ).limit(1).collect()
        if not top:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        vocab = vocab.select(_apply_merge(F.col("syms"), a, b).alias("syms"), "freq")
        if (r + 1) % checkpoint_interval == 0:
            vocab = vocab.localCheckpoint()
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
        import pandas as pd

        return pd.Series(
            [
                [t for w in (x or "").split() for t in encode_word(w)]
                for x in s
            ]
        )

    enc = pandas_udf(encode_series, "array<string>")
    return df.withColumn(out_col, enc(F.col(text_col)))
