"""Exact-substring span deduplication (the ExactSubstr mode of
"Deduplicating Training Data Makes Language Models Better", Lee et al.
2022): find token spans of length >= k that occur more than once across
the corpus and cut every occurrence out of the text.

The paper builds a suffix array — inherently single-machine. The
Spark-first re-expression: every length-k token window is a corpus-wide
key; a window is duplicated iff its key occurs >= 2 times. A duplicated
substring of length >= k is exactly a maximal run of duplicated
length-k windows, so removing all tokens covered by a duplicated window
removes precisely the tokens inside duplicated substrings of length
>= k (the suffix-array semantics at granularity k).

Dataflow (everything JVM-side, no Python):

1. tokenize         — ``split`` + ``filter`` (codegen)
2. window keys      — ``transform(sequence(0, n-k), i ->
                      xxhash64(concat_ws(sep, slice(toks, i+1, k))))``:
                      the shuffle carries 8-byte hashes + int positions,
                      never text
3. corpus count     — hash-aggregate on the window key (map-side
                      partial combine), keep count >= 2
4. mark             — spans semi-join the duplicated-key set; per doc,
                      ``sort_array(collect_list(start))``
5. cut + reassemble — fold sorted starts into merged [s, e) intervals
                      (``aggregate``), keep tokens outside every
                      interval, ``concat_ws`` back to text

100 TB posture: steps 3 and 4 shuffle O(total tokens) fixed-width rows —
the unavoidable cost of corpus-wide exact matching — but only ints; the
interval merge makes the per-token membership test O(#dup regions), not
O(#dup windows). Keys are 64-bit hashes, so two distinct spans collide
with probability ~n^2/2^65 (documented, negligible; a collision can only
remove a non-duplicated span, never corrupt text outside it).

Whitespace is normalized to single spaces by reassembly (tokens are the
unit of the algorithm); ``n_removed`` reports cut tokens per doc.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: unit-separator: joins tokens inside a window key so token boundaries
#: cannot alias ("ab c" vs "a bc")
_SEP = "\x1f"


def _tokens(text: Column) -> Column:
    # NULL text -> empty token array (size(NULL) is -1, which would
    # otherwise poison n_tokens/n_removed downstream)
    return F.coalesce(
        F.filter(F.split(text, r"\s+"), lambda x: x != ""),
        F.array().cast("array<string>"),
    )


def duplicated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """All (doc, start) positions whose k-token window occurs at least
    ``min_count`` times corpus-wide (within-doc repeats count, as in the
    reference algorithm). Start positions are 0-based token offsets.

    Returns (id, start, span_hash, n_occurrences).
    """
    toks = df.select(F.col(id_col), _tokens(F.col(text_col)).alias("__toks"))
    n = F.size("__toks")
    spans = (
        toks.where(n >= k)
        .select(
            F.col(id_col),
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), n - k),
                    lambda i: F.struct(
                        i.alias("start"),
                        F.xxhash64(
                            F.concat_ws(_SEP, F.slice("__toks", i + 1, k))
                        ).alias("span_hash"),
                    ),
                )
            ).alias("s"),
        )
        .select(id_col, "s.start", "s.span_hash")
    )
    counts = (
        spans.groupBy("span_hash")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .where(F.col("n_occurrences") >= min_count)
    )
    return spans.join(counts, "span_hash").select(
        id_col, "start", "span_hash", "n_occurrences"
    )


def _merge_starts_to_intervals(starts: Column, k: int) -> Column:
    """Fold a SORTED array of 0-based window starts into merged
    [s, e) token intervals: window p covers [p, p+k)."""
    empty = F.array().cast("array<struct<s:int,e:int>>")
    iv = lambda s, e: F.struct(s.cast("int").alias("s"), e.cast("int").alias("e"))
    return F.aggregate(
        starts,
        empty,
        lambda acc, p: F.when(
            (F.size(acc) > 0) & (p <= F.element_at(acc, -1)["e"]),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(iv(F.element_at(acc, -1)["s"], p + k)),
            ),
        ).otherwise(F.concat(acc, F.array(iv(p, p + k)))),
    )


def remove_duplicated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """Cut every token covered by a corpus-duplicated k-window out of
    each document.

    Returns (id, text_clean, n_tokens, n_removed); docs shorter than k
    tokens pass through untouched (whitespace-normalized).
    """
    toks = df.select(F.col(id_col), _tokens(F.col(text_col)).alias("__toks"))
    dup = duplicated_spans(df, id_col, text_col, k, min_count)
    per_doc = dup.groupBy(id_col).agg(
        F.sort_array(F.collect_list("start")).alias("__starts")
    )
    joined = toks.join(per_doc, id_col, "left_outer").withColumn(
        "__iv",
        _merge_starts_to_intervals(
            F.coalesce("__starts", F.array().cast("array<int>")), k
        ),
    )
    n = F.size("__toks")
    kept = F.filter(
        F.sequence(F.lit(0), n - 1),
        lambda j: ~F.exists("__iv", lambda v: (v["s"] <= j) & (j < v["e"])),
    )
    # sequence(0, -1) on an empty doc yields [0, -1] descending — guard
    kept = F.when(n > 0, kept).otherwise(F.array().cast("array<int>"))
    return joined.select(
        F.col(id_col),
        F.concat_ws(
            " ", F.transform(kept, lambda j: F.element_at("__toks", j + 1))
        ).alias("text_clean"),
        n.alias("n_tokens"),
        (n - F.size(kept)).alias("n_removed"),
    )
