"""Count-based n-gram language model with stupid backoff — the
perplexity quality filter of the classic web-corpus pipelines (CCNet
trains a wiki LM and drops high-perplexity documents; Brants et al.
2007 showed "stupid backoff" matches smoothed LMs at corpus scale
precisely because it needs only raw counts, which distribute).

Training IS aggregation: one explode of the token stream per order,
hash-aggregated into (gram_h, count) relations — no iteration, fully
JVM-side, map-side combined. Grams are keyed by ``xxhash64`` of the
token-slice ARRAY (8 bytes), never the space-joined string: the
count-table groupBys and all five scoring joins shuffle fixed-width
longs instead of variable-length text — the same 8-byte-key
discipline as span_dedup's window hashes (a 64-bit collision rate is
negligible at any realistic gram cardinality, and identical trade to
the near-dup hash families). Scoring joins each document's trigrams
against the three count tables and applies the backoff cascade:

    S(w | a b) = count(a b w) / count(a b)           if trigram seen
               = 0.4 * count(b w) / count(b)         elif bigram seen
               = 0.4^2 * count(w) / total_tokens     elif unigram seen
               = 0.4^2 * alpha_unk / total_tokens    else (OOV floor)

Documents are padded with <s> <s> ... </s> so every token has a
trigram context and sentence length is modeled. Scores are exact
decimal-free ratios of BIGINT counts — deterministic across engines,
which is why the DuckDB oracle can hash-match the per-document
log-probabilities (rounded at 6 dp).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from iot_sensor_data_pipeline_spark.functions.text import ws_tokens as _tokens

BOS = "<s>"
EOS = "</s>"
BACKOFF = 0.4
UNK_ALPHA = 0.1  #: pseudo-count for OOV words, relative to total tokens


def _padded(text: Column) -> Column:
    return F.concat(
        F.array(F.lit(BOS), F.lit(BOS)), _tokens(text), F.array(F.lit(EOS))
    )


def _gram_hashes(toks: Column, n: int) -> Column:
    """All n-gram keys of a token array: xxhash64 of each length-n
    token slice (hashing the ARRAY directly — no string concat, and
    token boundaries stay unambiguous by construction)."""
    size = F.size(toks)
    return F.when(size < n, F.array().cast("array<bigint>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), size - n),
            lambda i: F.xxhash64(F.slice(toks, i + 1, n)),
        )
    )


def ngram_counts(df: DataFrame, text_col: str, n: int) -> DataFrame:
    """(gram_h, n_count) over BOS/EOS-padded documents — 8-byte hashed
    gram keys (see module docstring)."""
    return (
        df.select(
            F.explode(_gram_hashes(_padded(F.col(text_col)), n)).alias("gram_h")
        )
        .groupBy("gram_h")
        .agg(F.count(F.lit(1)).alias("n_count"))
    )


def train_ngram_lm(df: DataFrame, text_col: str = "text") -> dict:
    """Train the three count relations plus the unigram total.

    Returns {"uni": DF(gram_h, n_count), "bi": ..., "tri": ...,
    "total": DF(total_tokens)} — persist them as tables bucketed by
    ``gram_h`` for repeated scoring; the relations, not a driver
    object, ARE the model (vocabulary can exceed driver memory at
    corpus scale).
    """
    uni = ngram_counts(df, text_col, 1)
    bi = ngram_counts(df, text_col, 2)
    tri = ngram_counts(df, text_col, 3)
    # a zero-token reference would make total NULL and NULL-poison the
    # unigram/OOV tiers (every doc silently dropped by a perplexity
    # gate); assert_true keeps the check lazy but fails the job loudly.
    # BOS/EOS exclusion compares against constant-folded hashes of the
    # padding literals (Catalyst folds xxhash64-of-literal to a long)
    raw_total = F.sum("n_count")
    pad_hashes = [
        F.xxhash64(F.array(F.lit(BOS))),
        F.xxhash64(F.array(F.lit(EOS))),
    ]
    total = uni.where(
        (F.col("gram_h") != pad_hashes[0]) & (F.col("gram_h") != pad_hashes[1])
    ).agg(
        F.when(
            F.assert_true(
                raw_total.isNotNull() & (raw_total > 0),
                "train_ngram_lm: reference corpus has zero non-padding "
                "tokens — the model cannot score anything",
            ).isNull(),
            raw_total,
        ).alias("total_tokens")
    )
    return {"uni": uni, "bi": bi, "tri": tri, "total": total}


def score_perplexity(
    docs: DataFrame,
    lm: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
    backoff: float = BACKOFF,
    unk_alpha: float = UNK_ALPHA,
) -> DataFrame:
    """Per-document stupid-backoff score: (id, n_scored, avg_logprob,
    perplexity). ``avg_logprob`` is the mean natural-log score over the
    document's tokens (incl. EOS); ``perplexity = exp(-avg_logprob)``.
    An empty (or NULL) document scores its lone EOS trigram — the
    model's surprise at a document ending immediately.

    Dataflow — ONE lookup join, not five: each position explodes to
    five thin (role, order, key) probe rows (all 8-byte xxhash64 of
    token slices — never gram text), which join ONCE against an
    order-tagged UNION of the three count tables, then a conditional
    aggregation pivots the five counts back per position and the
    cascade applies. Five sequential left joins would re-shuffle the
    O(corpus tokens) position relation at every join (~5x the minimum
    shuffle volume at 100 TB); here the position relation crosses an
    exchange exactly twice — once into the lookup join (5x thinner
    rows: id, pos, role, order, key) and once into the per-position
    pivot — and each count table ships exactly once (the bigram table
    serves both its numerator and context roles from the same rows).
    At scale bucket all three count tables by gram_h.
    """
    toks = _padded(F.col(text_col))
    size = F.size(toks)
    # roles: 0=trigram numerator (order 3), 1=trigram context (order
    # 2), 2=bigram numerator (order 2), 3=bigram context (order 1),
    # 4=unigram numerator (order 1)
    role_specs = [
        (0, 3, lambda i: (i + 1, 3)),
        (1, 2, lambda i: (i + 1, 2)),
        (2, 2, lambda i: (i + 2, 2)),
        (3, 1, lambda i: (i + 2, 1)),
        (4, 1, lambda i: (i + 3, 1)),
    ]

    def lookups(i):
        return F.array(
            *[
                F.struct(
                    F.lit(role).cast("int").alias("role"),
                    F.lit(order).cast("int").alias("ord"),
                    F.xxhash64(F.slice(toks, *slc(i))).alias("key"),
                )
                for role, order, slc in role_specs
            ]
        )

    pos = (
        docs.select(
            F.col(id_col),
            F.posexplode(
                F.transform(F.sequence(F.lit(0), size - 3), lookups)
            ).alias("pos", "ls"),
        )
        .select(id_col, "pos", F.explode("ls").alias("l"))
        .select(id_col, "pos", "l.*")
    )

    def tagged(rel: DataFrame, order: int) -> DataFrame:
        return rel.select(
            F.lit(order).cast("int").alias("ord"),
            F.col("gram_h").alias("key"),
            F.col("n_count").alias("cnt"),
        )

    counts = (
        tagged(lm["tri"], 3)
        .unionByName(tagged(lm["bi"], 2))
        .unionByName(tagged(lm["uni"], 1))
    )
    roles = {
        "c_tri": 0, "c_ctx2": 1, "c_bi": 2, "c_ctx1": 3, "c_uni": 4,
    }
    j = (
        pos.join(counts, ["ord", "key"], "left")
        .groupBy(id_col, "pos")
        .agg(
            *[
                F.max(F.when(F.col("role") == r, F.col("cnt"))).alias(name)
                for name, r in roles.items()
            ]
        )
        .crossJoin(F.broadcast(lm["total"]))
    )
    score = (
        F.when(
            F.col("c_tri").isNotNull() & F.col("c_ctx2").isNotNull(),
            F.col("c_tri") / F.col("c_ctx2"),
        )
        .when(
            F.col("c_bi").isNotNull() & F.col("c_ctx1").isNotNull(),
            F.lit(backoff) * F.col("c_bi") / F.col("c_ctx1"),
        )
        .when(
            F.col("c_uni").isNotNull(),
            F.lit(backoff * backoff) * F.col("c_uni") / F.col("total_tokens"),
        )
        .otherwise(F.lit(backoff * backoff * unk_alpha) / F.col("total_tokens"))
    )
    per_doc = j.select(F.col(id_col), F.log(score).alias("lp")).groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_scored"), F.avg("lp").alias("avg_logprob")
    )
    # left join back so zero-token docs appear with NULL scores
    ids = docs.select(id_col).distinct()
    return ids.join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce("n_scored", F.lit(0)).alias("n_scored"),
        "avg_logprob",
        F.exp(-F.col("avg_logprob")).alias("perplexity"),
    )


def perplexity_filter(
    docs: DataFrame,
    lm: dict,
    max_perplexity: float,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """CCNet-style gate: keep documents the LM finds unsurprising
    (perplexity <= threshold). Join-back by id keeps full rows."""
    keep = score_perplexity(docs, lm, id_col, text_col).where(
        F.col("perplexity") <= max_perplexity
    )
    return docs.join(keep.select(id_col), id_col, "left_semi")
