"""Training-data mixing: compose a pre-training corpus from weighted
domains under a token budget, and split corpora deterministically —
the "data recipe" layer (GPT-3's weighted sampling across CommonCrawl/
WebText/Books/Wikipedia; DoReMi and every successor tune exactly these
domain weights).

Determinism is the design constraint: a mixture must be REPRODUCIBLE
(same corpus + same weights -> same training set, on any cluster, any
partitioning) and STABLE under corpus growth (adding documents must not
reshuffle which old documents were picked, or every experiment invalidates
the last one). Random sampling gives neither; content-keyed hashing
gives both:

- :func:`mixture_sample` orders each domain by ``md5(id)`` (a fixed
  pseudo-random permutation keyed by content id — documents don't move
  when OTHER documents arrive) and keeps the prefix whose cumulative
  token count fits the domain's share of the budget. One window
  cumsum per domain, partitioned by the domain column — a single
  shuffle of (domain, md5, n_tokens)-width rows.
- :func:`split_by_hash` assigns train/val/test by comparing ``md5(id)``
  against precomputed hex thresholds — a pure per-row projection (no
  shuffle, no sampling pass), the split every pipeline needs to be
  leak-proof: a document's split follows it forever, regardless of
  partitioning, corpus size, or engine (md5 is engine-portable, which
  is what makes the DuckDB oracles able to hash-match these operators
  exactly — xxhash64 exists only on the Spark side).

At 100 TB: the md5-order window is the only shuffle and it carries no
text; skew equals domain size (a giant domain is one partition's
window) — for pathological single-domain corpora, pre-aggregate or
range-partition by (domain, md5 prefix) and merge prefix sums; the
straddling document is EXCLUDED (budget is a hard cap, the
conservative direction for a token budget).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: md5 hex width (128 bits = 32 hex chars) — thresholds are compared
#: as fixed-width lowercase hex strings
_MD5_HEX_WIDTH = 32


def _hex_threshold(fraction: float) -> str:
    """The 32-hex-char string t such that P[md5(x) < t] == fraction
    for a uniform 128-bit hash: floor(fraction * 2^128) in hex."""
    f = min(max(fraction, 0.0), 1.0)
    return format(int(f * (1 << 128)), "032x")


def split_by_hash(
    df: DataFrame,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    out_col: str = "split",
) -> DataFrame:
    """Deterministic content-keyed split: adds ``out_col`` with the
    split label. ``fractions`` maps label -> fraction; they must sum
    to 1 (±1e-9). Labels are assigned by successive md5 thresholds in
    the dict's insertion order, so the SAME id always lands in the
    same split — across runs, partitionings, and corpus versions.

    Pure projection: no shuffle, no count, no sampling pass.
    """
    if not fractions:
        raise ValueError("split_by_hash: fractions must be non-empty")
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(
            f"split_by_hash: fractions must sum to 1, got {total}"
        )
    if any(v < 0 for v in fractions.values()):
        raise ValueError("split_by_hash: fractions must be non-negative")
    h = F.md5(F.col(id_col).cast("string"))
    labels = list(fractions)
    cum = 0.0
    expr = None
    for label in labels[:-1]:
        cum += fractions[label]
        cond = h < F.lit(_hex_threshold(cum))
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(
            cond, F.lit(label)
        )
    last = F.lit(labels[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, expr)


def mixture_sample(
    docs: DataFrame,
    weights: dict[str, float],
    token_budget: int,
    domain_col: str = "source",
    id_col: str = "doc_id",
    token_count_col: str | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Sample a token-budgeted training mix: per domain ``d``, keep the
    ``md5(id)``-ordered prefix of documents whose cumulative token
    count fits ``token_budget * weights[d] / sum(weights)``.

    Returns the kept rows of ``docs`` plus ``n_tokens`` (whitespace
    tokens of ``text_col``, or the caller's ``token_count_col``) and
    ``mix_rank`` (the doc's 1-based position in its domain's md5
    order — stable curriculum/replay order for the trainer). Domains
    absent from ``weights`` are excluded; a weight of 0 excludes
    explicitly. The straddling document (the one that would cross the
    budget) is excluded: the budget is a hard cap.

    Weights are RELATIVE (normalized internally), matching how data
    recipes are published ("67% CommonCrawl, 15% Books, ..." of the
    token total, not per-domain caps).
    """
    if token_budget < 0:
        raise ValueError("mixture_sample: token_budget must be >= 0")
    if not weights:
        raise ValueError("mixture_sample: weights must be non-empty")
    if any(v < 0 for v in weights.values()):
        raise ValueError("mixture_sample: weights must be non-negative")
    wsum = sum(weights.values())
    if wsum <= 0:
        raise ValueError("mixture_sample: at least one weight must be > 0")

    if token_count_col is None:
        from iot_sensor_data_pipeline_spark.functions.text import ws_tokens

        with_n = docs.withColumn("n_tokens", F.size(ws_tokens(F.col(text_col))))
        n_col = "n_tokens"
    else:
        with_n = docs
        n_col = token_count_col

    # per-domain budget as a broadcast dim (weights are driver-small by
    # construction — there are never many domains)
    spark = docs.sparkSession
    budgets = spark.createDataFrame(
        [
            (dom, int(token_budget * w / wsum))
            for dom, w in weights.items()
        ],
        f"{domain_col} string, __budget long",
    )
    w_order = Window.partitionBy(domain_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    ranked = (
        with_n.join(F.broadcast(budgets), domain_col)
        .withColumn("__cum", F.sum(n_col).over(w_order))
        .withColumn("mix_rank", F.row_number().over(w_order))
    )
    return ranked.where(F.col("__cum") <= F.col("__budget")).drop(
        "__cum", "__budget"
    )
