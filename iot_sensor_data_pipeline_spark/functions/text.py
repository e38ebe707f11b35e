"""Text analysis for training-data pipelines: tokenization, quality
scoring, language ID, document fingerprinting.

All pure built-in column expressions (split/filter/transform/regexp/
md5) — codegen'd, shuffle-free, embarrassingly parallel at 100 TB.
Every helper returns a Column so callers compose them into any
projection; the canonical "document features" relation is
``text_features``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: tiny built-in stopword lists for the language-ID heuristic.
#: Deliberately short (highest-frequency function words only): the
#: heuristic scores token overlap per language and picks the argmax.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "in", "to", "is", "that", "it", "for"),
    "de": ("der", "die", "das", "und", "ist", "von", "mit", "den", "nicht", "ein"),
    "fr": ("le", "la", "les", "de", "et", "est", "un", "une", "dans", "pour"),
    "es": ("el", "la", "los", "de", "y", "es", "un", "una", "en", "por"),
}

#: a BPE-ish token proxy: runs of word chars OR single non-space
#: symbols — approximates subword tokenizer counts within ~10% on
#: natural text without shipping a vocab file.
BPE_ISH_PATTERN = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"


def tokens(text: Column) -> Column:
    """Single-space tokens (empty-string artifacts filtered).

    NOTE: splits on the literal space character only — kept for
    backward compatibility with the oracle-checked text-feature
    queries. New operators should use :func:`ws_tokens`, which treats
    ALL whitespace as separators.
    """
    return F.filter(F.split(text, " ", -1), lambda t: t != "")


def ws_tokens(text: Column) -> Column:
    """Whitespace-run tokens (the tokenizer shared by span dedup, the
    n-gram LM, BPE induction, and the curation pipeline — one
    definition so their token accounting agrees). NULL text -> empty
    array."""
    return F.coalesce(
        F.filter(F.split(text, r"\s+"), lambda t: t != ""),
        F.array().cast("array<string>"),
    )


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """Count of BPE-ish tokens (regexp-based subword proxy)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), 0))


def stopword_hits(text: Column, lang: str) -> Column:
    words = STOPWORDS[lang]
    return F.size(F.filter(tokens(text), lambda t: t.isin(*words)))


def lang_id(text: Column) -> Column:
    """Argmax of per-language stopword hits; 'und' when nothing hits.

    Ties break in the fixed order en > de > fr > es (greatest-first
    CASE scan), so results are deterministic. A production system
    would swap in a trained classifier via pandas_udf; the Spark-side
    contract (one string column in, one out) is identical.
    """
    hits = {lang: stopword_hits(text, lang) for lang in STOPWORDS}
    best = F.greatest(*hits.values())
    expr = F.when(best <= 0, "und")
    for lang in STOPWORDS:  # insertion order = tie priority
        expr = expr.when(hits[lang] == best, lang)
    return expr


def punct_ratio(text: Column) -> Column:
    stripped = F.regexp_replace(text, r"[.,!?;:]", "")
    # nullif: empty text -> null ratio, not DIVIDE_BY_ZERO (ANSI mode)
    return (F.length(text) - F.length(stripped)) / F.nullif(F.length(text), F.lit(0))


def digit_ratio(text: Column) -> Column:
    stripped = F.regexp_replace(text, r"[0-9]", "")
    return (F.length(text) - F.length(stripped)) / F.nullif(F.length(text), F.lit(0))


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: length saturation x
    (1 - punctuation density) x (1 - digit density) x stopword
    presence — the standard cheap pre-filter before expensive dedup/
    classification stages in a data pipeline."""
    length_sat = F.least(token_count(text), F.lit(200)) / 200.0
    stop_sat = F.least(stopword_hits(text, "en"), F.lit(10)) / 10.0
    return length_sat * (1 - punct_ratio(text)) * (1 - digit_ratio(text)) * (0.5 + 0.5 * stop_sat)


def fingerprint(text: Column) -> Column:
    """Deterministic 128-bit content fingerprint (hex md5)."""
    return F.md5(text)


def normalize_text(text: Column) -> Column:
    """CCNet-style normalization for fuzzy-exact dedup: lowercase,
    every digit mapped to 0, punctuation/symbols stripped to spaces,
    whitespace collapsed, trimmed. Two documents differing only in
    case, numbers, or punctuation normalize to the same string, so
    ``md5(normalize_text(text))`` catches the near-duplicates exact
    dedup misses WITHOUT the cost of MinHash — the standard first
    escalation step (exact -> normalized-exact -> MinHash) in a
    dedup pipeline. ASCII-focused (non-ASCII symbols strip like
    punctuation); pure codegen regexps, RE2-compatible so the same
    patterns run in the DuckDB oracle."""
    t = F.lower(text)
    t = F.regexp_replace(t, r"[0-9]", "0")
    t = F.regexp_replace(t, r"[^a-z0\s]", " ")
    t = F.regexp_replace(t, r"\s+", " ")
    return F.trim(t)


def char_grams(text: Column, q: int) -> Column:
    """All character ``q``-grams of a string, in order (repeats kept;
    EMPTY array for strings shorter than ``q``). The ONE copy of the
    substr/sequence enumeration — ``sequence(1, n)`` DESCENDS for
    n < 1, hence the guard — shared by winnowing and the fuzzy join's
    q-gram blocking."""
    n = F.length(text) - (q - 1)
    return F.when(n < 1, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
            lambda i: F.substr(text, i, F.lit(q)),
        )
    )


def winnow_fingerprints(text: Column, k: int = 5, w: int = 4) -> Column:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD '03 — the MOSS algorithm): hash every character k-gram,
    slide a window of ``w`` hashes, keep each window's minimum; the
    distinct selected hashes are the document's fingerprint set
    (``array<long>``).

    Guarantee: any two documents sharing a substring of length
    >= w + k - 1 share at least one fingerprint, while only ~2/(w+1)
    of all k-gram hashes are kept. Pure JVM higher-order expressions
    (substr/xxhash64/slice/array_min) — no UDF, no shuffle; pair the
    exploded output with a group-by join for plagiarism-style overlap
    detection at corpus scale.
    """
    empty = F.array().cast("array<bigint>")
    gram_hashes = F.transform(char_grams(text, k), lambda g: F.xxhash64(g))
    n_windows = F.size(gram_hashes) - (w - 1)
    selected = F.when(n_windows < 1, empty).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.greatest(n_windows, F.lit(1))),
            lambda i: F.array_min(F.slice(gram_hashes, i, w)),
        )
    )
    return F.array_distinct(selected)


def text_features(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """The canonical per-document feature relation.

    Staged projections so each expensive primitive evaluates ONCE per
    row: the single-column helper composition re-ran ``split`` ~8x per
    row (token_count + 5x stopword_hits + quality_score's internal
    re-use) and each ratio's ``regexp_replace`` twice — higher-order
    filter/split expressions are interpreted, so codegen subexpression
    elimination does not merge them. Same expressions, same outputs
    (verified row-identical vs the composed form); ~1.2x on the
    features pass, linear in corpus size."""
    t = F.col(text_col)
    base = df.select(
        id_col,
        t.alias("__t"),
        tokens(t).alias("__toks"),
        F.length(t).alias("n_chars"),
        (F.length(t) - F.length(F.regexp_replace(t, r"[.,!?;:]", "")))
        .alias("__np"),
        (F.length(t) - F.length(F.regexp_replace(t, r"[0-9]", "")))
        .alias("__nd"),
    )
    staged = base.select(
        id_col,
        "__t",
        "n_chars",
        F.size("__toks").alias("n_tokens"),
        (F.col("__np") / F.nullif(F.col("n_chars"), F.lit(0))).alias("__pr"),
        (F.col("__nd") / F.nullif(F.col("n_chars"), F.lit(0))).alias("__dr"),
        *[
            F.size(F.filter(F.col("__toks"), lambda x: x.isin(*ws)))
            .alias(f"__h_{lang}")
            for lang, ws in STOPWORDS.items()
        ],
    )
    hits = {lang: F.col(f"__h_{lang}") for lang in STOPWORDS}
    best = F.greatest(*hits.values())
    lang_expr = F.when(best <= 0, "und")
    for lang in STOPWORDS:  # insertion order = tie priority (lang_id)
        lang_expr = lang_expr.when(hits[lang] == best, lang)
    quality = (
        (F.least(F.col("n_tokens"), F.lit(200)) / 200.0)
        * (1 - F.col("__pr"))
        * (1 - F.col("__dr"))
        * (0.5 + 0.5 * (F.least(hits["en"], F.lit(10)) / 10.0))
    )
    return staged.select(
        id_col,
        "n_tokens",
        bpe_ish_token_count(F.col("__t")).alias("n_bpe_tokens"),
        "n_chars",
        F.round("__pr", 6).alias("punct_ratio"),
        F.round("__dr", 6).alias("digit_ratio"),
        hits["en"].alias("en_stopwords"),
        lang_expr.alias("lang_pred"),
        F.round(quality, 6).alias("quality"),
        fingerprint(F.col("__t")).alias("fingerprint"),
        fingerprint(normalize_text(F.col("__t"))).alias("norm_fingerprint"),
    )
