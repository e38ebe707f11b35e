"""Training-data curation operators: the steps between "deduplicated
corpus" and "training-ready dataset" in an LLM data pipeline.

- PII redaction: regexp_replace chains, pure codegen — the standard
  pre-training scrub (emails, phones, IPs, SSNs, card numbers).
- Deterministic split: stable train/val/test assignment from a hash of
  the document id — reproducible across runs and cluster sizes, no
  sampling state.
- Exact stratified sampling: EXACTLY n rows per stratum, chosen by a
  deterministic hash order — per-stratum windows are hash-partitioned
  (one shuffle on the stratum key), never a global sort.
- Sequence packing: greedy first-fit of documents into fixed-token
  bins (the "packing" step before tokenized examples hit the trainer),
  partition-local via applyInPandas so no token text ever converges on
  one node.

Scale notes: redaction/split are narrow projections (zero shuffle);
stratified sampling shuffles once on the stratum; packing shuffles once
to spread documents, then packs within partitions (bin ids are globally
unique via spark_partition_id). Nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: conservative, precision-leaning PII patterns (Java regex). Kept
#: RE2-compatible (no backrefs/lookaround) so the same patterns run on
#: engines like DuckDB/Go for oracle checks and cross-system parity.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("card", r"\b(?:\d[ -]?){13,16}\b", "<CARD>"),
    ("phone", r"(?:\+?\d{1,2}[ .-]?)?\(?\d{3}\)?[ .-]?\d{3}[ .-]?\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
)


def pii_redact(text, patterns=PII_PATTERNS):
    """Replace PII spans with typed placeholder tokens. Order matters:
    longer/more-specific patterns run first (a card number would
    otherwise be eaten piecemeal by the phone pattern)."""
    out = text
    for _, pat, token in patterns:
        out = F.regexp_replace(out, pat, token)
    return out


def pii_hit_counts(text, patterns=PII_PATTERNS):
    """One count column per PII class — the audit/monitoring side of
    redaction (how much PII a source emits drives its trust score)."""
    return [
        F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0))).alias(f"n_{name}")
        for name, pat, _ in patterns
    ]


def deterministic_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    seed: int = 42,
    out_col: str = "split",
    bucket_expr=None,
) -> DataFrame:
    """Stable train/val/test assignment: bucket = xxhash64(id, seed)
    mod 1_000_000 mapped onto cumulative weight ranges. A document's
    split never changes with cluster size, partitioning, or the rest of
    the corpus — the property random() sampling loses. Zero shuffle.

    ``bucket_expr``: optional Column in [0, 1_000_000) overriding the
    xxhash64 bucket — e.g. an md5-prefix bucket when the assignment must
    be reproducible on engines without xxhash64 (see
    ``md5_bucket_expr``).
    """
    total = sum(weights.values())
    if bucket_expr is None:
        bucket_expr = F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(1_000_000))
    expr = None
    acc = 0.0
    for name, wt in weights.items():
        acc += wt / total
        cond = bucket_expr < int(round(acc * 1_000_000))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    # float rounding can leave the last bucket boundary < 1_000_000
    last = list(weights)[-1]
    return df.withColumn(out_col, expr.otherwise(last))


def _md5_bucket(key: "F.Column") -> "F.Column":
    """[0, 1_000_000) bucket from the first 8 hex chars of md5(key) —
    the ONE copy of the arithmetic both bucket expressions (and the
    DuckDB oracle SQL mirroring them) must stay in lockstep with."""
    hex8 = F.substring(F.md5(key), 1, 8)
    return (F.conv(hex8, 16, 10).cast("long") * 1_000_000 / F.lit(2**32)).cast("long")


def _domain_case_expr(domain_col: str, mapping: dict, default) -> "F.Column":
    """CASE over a domain column: per-domain literal with a default —
    the ONE copy of the construction weighted_mix and
    token_budget_sample both need (``default`` may be a value or
    None for SQL NULL)."""
    expr = None
    for name, val in mapping.items():
        lit = F.lit(val)
        expr = (
            F.when(F.col(domain_col) == name, lit)
            if expr is None
            else expr.when(F.col(domain_col) == name, lit)
        )
    default_lit = F.lit(default) if default is not None else F.lit(None)
    return default_lit if expr is None else expr.otherwise(default_lit)


def md5_bucket_expr(id_col: str) -> "F.Column":
    """Portable split bucket in [0, 1_000_000): the first 8 hex chars
    of md5(id) parsed as a 32-bit int, scaled down. Any engine with md5
    reproduces it exactly (the cross-engine variant of the xxhash64
    default — used by oracle-checked splits)."""
    return _md5_bucket(F.col(id_col).cast("string"))


def md5_mix_bucket_expr(domain_col: str, id_col: str) -> "F.Column":
    """Portable per-(domain, id) sampling bucket in [0, 1_000_000):
    md5 over ``domain || ':' || id`` so the mixing decision is
    independent of the split bucket (different hash input) and
    reproducible on any engine with md5 (see ``md5_bucket_expr``).

    NULL-propagating (F.concat, not concat_ws): a NULL domain or id
    yields a NULL bucket, so the row fails every ``bucket < threshold``
    comparison and is dropped — exactly what the SQL-standard
    ``domain || ':' || id`` does on any oracle engine. concat_ws would
    silently skip the NULL and keep the row under the default rate,
    breaking cross-engine exactness on NULL keys."""
    return _md5_bucket(
        F.concat(F.col(domain_col), F.lit(":"), F.col(id_col).cast("string"))
    )


def weighted_mix(
    df: DataFrame,
    domain_col: str,
    rates: dict[str, float],
    id_col: str,
    default_rate: float = 1.0,
    seed: int = 42,
    bucket_expr=None,
) -> DataFrame:
    """Data mixing: deterministic per-domain downsampling to the given
    keep-rates — the mixture-reweighting stage of a training-data
    pipeline (boost or suppress sources/languages to hit a target
    composition). A row survives iff ``bucket(domain, id) <
    rate[domain] * 1e6``; domains absent from ``rates`` use
    ``default_rate``.

    Properties a 100-TB pipeline needs and ``df.sample()`` lacks:
    ZERO shuffle (a pure filter, pushed to the scan), stable under
    repartitioning and corpus growth (a kept document stays kept when
    the corpus doubles — sampling decisions are per-row hashes, not
    positional), and exactly reproducible across engines when
    ``bucket_expr`` is the md5 variant (``md5_mix_bucket_expr``).

    The expected kept fraction per domain is rate +- the binomial
    deviation (hash buckets are uniform); for exact-count-per-stratum
    semantics use :func:`stratified_sample_exact` instead.
    """
    if bucket_expr is None:
        bucket_expr = F.pmod(
            F.xxhash64(F.col(domain_col), F.col(id_col), F.lit(seed)), F.lit(1_000_000)
        )
    threshold = _domain_case_expr(
        domain_col,
        {name: int(round(rate * 1_000_000)) for name, rate in rates.items()},
        int(round(default_rate * 1_000_000)),
    )
    return df.where(bucket_expr < threshold)


def weighted_sample_exact(
    df: DataFrame,
    weight_col: str,
    n: int,
    id_col: str,
) -> DataFrame:
    """EXACTLY min(n, |eligible|) rows sampled WITHOUT replacement
    with probability proportional to ``weight_col`` — Efraimidis &
    Spirakis 2006 ("Weighted random sampling with a reservoir"): each
    row gets key ``u^(1/w)`` (computed as ``ln(u)/w`` for stability)
    and the n LARGEST keys are the sample. The classic use: draw a
    token-weighted document subset whose inclusion odds track document
    length, without materializing per-token rows.

    Deterministic and ENGINE-REPRODUCIBLE by construction: ``u`` is
    the md5 id-bucket (``md5_bucket_expr`` arithmetic) shifted to the
    bin center, so the identical sample falls out of any engine with
    md5 — the mixing family's oracle discipline — and is stable under
    repartitioning and corpus growth of non-sampled rows. Rows with
    NULL or non-positive weight are ineligible and dropped (a zero
    weight has zero inclusion probability; ES keys are undefined
    there).

    Scale shape: a scan-side key projection + ``orderBy().limit(n)``,
    which Spark executes as TakeOrderedAndProject (per-partition
    top-n heaps, no global sort shuffle); ties (identical key AND
    weight) break by id on both engines.
    """
    if n < 1:
        raise ValueError("weighted_sample_exact: n must be >= 1")
    w = F.col(weight_col).cast("double")
    u = (_md5_bucket(F.col(id_col).cast("string")) + F.lit(0.5)) / F.lit(
        1_000_000.0
    )
    return (
        df.where(w.isNotNull() & (w > 0))
        .withColumn("__es_key", F.log(u) / w)
        .orderBy(F.col("__es_key").desc(), F.col(id_col))
        .limit(n)
        .drop("__es_key")
    )


def stratified_sample_exact(
    df: DataFrame,
    stratum_col: str,
    n_per_stratum: int,
    id_col: str,
) -> DataFrame:
    """EXACTLY min(n, |stratum|) rows per stratum, deterministically:
    rows are ranked inside each stratum by md5(id) (a stable
    pseudo-random order any engine can reproduce) and the first n kept.

    Skew-proof the same way as :func:`token_budget_sample` (it is the
    count-budget special case of that operator): a (stratum, md5-
    bucket) COUNT histogram, per-bucket cumulative offsets from a
    window over the aggregated histogram (bounded by the 64Ki bucket
    space, never by corpus size), a broadcast candidate-bucket prune
    (a bucket whose offset already reaches n cannot contribute), and
    a row_number window partitioned by (stratum, bucket) — a stratum
    holding 90% of the corpus ranks in 64Ki-way parallel slices, and
    only ~n rows per stratum ever reach the row-level window.
    Spark's WindowGroupLimit pre-prunes each slice to its local n
    before the exchange, so shuffle volume is O(strata x n)."""
    order_md5 = F.md5(F.col(id_col).cast("string"))
    # monotonic in order_md5 — see token_budget_sample
    bucket = F.conv(F.substring(order_md5, 1, 4), 16, 10).cast("long")

    work = df.withColumn("__b", bucket)
    hist = work.groupBy(stratum_col, "__b").agg(F.count(F.lit(1)).alias("__bn"))
    w_off = (
        Window.partitionBy(stratum_col)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cand = (
        hist.withColumn(
            "__boff",
            F.coalesce(F.sum("__bn").over(w_off), F.lit(0)).cast("long"),
        )
        .where(F.col("__boff") < n_per_stratum)
        .select(stratum_col, "__b", "__boff")
    )
    w_in = Window.partitionBy(stratum_col, "__b").orderBy(order_md5, F.col(id_col))
    return (
        work.join(F.broadcast(cand), [stratum_col, "__b"])
        .withColumn("__rn", F.row_number().over(w_in))
        # the bare `__rn <= n` conjunct is what lets Spark insert
        # WindowGroupLimit (each slice pre-prunes to its local n before
        # the exchange); the offset sum is the exact global cut
        .where(
            (F.col("__rn") <= n_per_stratum)
            & (F.col("__boff") + F.col("__rn") <= n_per_stratum)
        )
        .select(*df.columns)
    )


def token_budget_sample(
    df: DataFrame,
    domain_col: str,
    budgets: dict[str, int],
    id_col: str,
    tokens_col: str,
    default_budget: int | None = None,
) -> DataFrame:
    """Mixture construction by TOKEN budget, not document count:
    within each domain, documents are taken in deterministic
    md5-pseudo-random order until the domain's token budget is
    reached ("sample 10B tokens of web, 2B of code"). A document is
    kept iff the cumulative token count BEFORE it is still under the
    budget — so the budget is always reached (the crossing document
    is included) and the kept set is a deterministic prefix: stable
    under repartitioning and reproducible on any engine with md5.
    NOT append-consistent: a new document whose md5 sorts early
    shifts every later document's cumulative count and can push
    previously-kept docs past the budget — snapshot the kept set if
    the mixture must stay frozen across corpus refreshes (contrast
    ``weighted_mix``, whose per-row decisions never move).
    Domains without a budget are dropped unless ``default_budget``.

    Output: the kept rows plus ``cum_before`` (tokens accumulated
    before the doc — feeds budget-utilization accounting).

    SKEW-PROOF BY CONSTRUCTION (no per-domain single task anywhere —
    a domain holding 90% of a 100 TB corpus costs the same per task
    as any other):

    1. Every row gets a bucket: the first 4 hex chars of md5(id) —
       64Ki buckets, MONOTONIC in the md5 sort order, so bucket
       order + in-bucket (md5, id) order IS the global per-domain
       order.
    2. One map-side-combined aggregation builds the (domain, bucket)
       token histogram; a window over that HISTOGRAM (<= 65 536
       aggregated rows per domain — bounded by bucket-space
       cardinality, independent of corpus size) turns it into
       per-bucket cumulative offsets.
    3. Buckets whose offset already exceeds the budget cannot
       contain kept rows; the surviving candidate-bucket list
       (typically ~budget/bucket_mass rows, worst case 64Ki x
       #domains) broadcasts back — the corpus never shuffles for
       non-candidate rows, the join prunes them scan-side.
    4. The exact per-row running sum then runs partitioned by
       (domain, bucket) over candidate rows only: ~budget-mass rows
       spread across 64Ki-way partitions, instead of the whole
       domain in ONE window partition.
    """
    order_md5 = F.md5(F.col(id_col).cast("string"))
    # monotonic in order_md5 (fixed-width lowercase hex: lexicographic
    # order == numeric order), so bucket-major ordering preserves the
    # global (md5, id) prefix semantics exactly
    bucket = F.conv(F.substring(order_md5, 1, 4), 16, 10).cast("long")
    budget_expr = _domain_case_expr(domain_col, budgets, default_budget)

    work = df.withColumn("__b", bucket)
    hist = work.groupBy(domain_col, "__b").agg(
        F.sum(F.col(tokens_col)).alias("__bsum")
    )
    w_off = (
        Window.partitionBy(domain_col)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cand = (
        hist.withColumn(
            "__boff",
            F.coalesce(F.sum("__bsum").over(w_off), F.lit(0)).cast("long"),
        )
        # a NULL budget (unbudgeted domain, no default) fails the
        # comparison -> the domain's buckets vanish -> inner join
        # drops all its rows, same as before
        .where(F.col("__boff") < budget_expr)
        .select(domain_col, "__b", "__boff")
    )
    w_in = (
        Window.partitionBy(domain_col, "__b")
        .orderBy(order_md5, F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        work.join(F.broadcast(cand), [domain_col, "__b"])
        .withColumn(
            "cum_before",
            (
                F.col("__boff")
                + F.coalesce(F.sum(F.col(tokens_col)).over(w_in), F.lit(0))
            ).cast("long"),
        )
        .where(F.col("cum_before") < budget_expr)
        .select(*df.columns, "cum_before")
    )


def repetition_metrics(
    df: DataFrame, id_col: str, text_col: str, n: int = 2
) -> DataFrame:
    """Gopher-style within-document repetition signals over word
    n-grams (Rae et al. 2021 §A1.1 use these as quality filters):

    - ``n_grams``         total n-gram occurrences
    - ``top_gram_frac``   occurrences of the single most frequent
                          n-gram / total (catches "buy now buy now ...")
    - ``dup_gram_frac``   occurrences belonging to any n-gram seen more
                          than once / total
    - ``distinct_frac``   distinct n-grams / total (type-token ratio)

    Shape: explode n-grams -> count per (doc, gram) -> re-aggregate per
    doc. Both shuffles key on doc_id(+gram) — uniformly distributed, no
    hot keys, map-side partial aggregation; scales linearly in corpus
    size. Documents with fewer than ``n`` words produce no n-grams and
    are absent from the output (nothing to measure).
    """
    words = F.filter(F.split(F.col(text_col), " ", -1), lambda t: t != "")
    n_grams_in_doc = F.size(words) - (n - 1)
    # sequence(1, k) DESCENDS for k < 1 -> guard short docs with an
    # empty array instead of clamping (slice(words, 0, n) is an error)
    grams = F.when(n_grams_in_doc < 1, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.greatest(n_grams_in_doc, F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(words, i, n)),
        )
    )
    per_gram = (
        df.select(F.col(id_col).alias("id"), F.explode(grams).alias("gram"))
        .groupBy("id", "gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        per_gram.groupBy("id")
        .agg(
            F.sum("cnt").alias("n_grams"),
            F.max("cnt").alias("__top"),
            F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(0)).alias("__dup"),
            F.count(F.lit(1)).alias("__distinct"),
        )
        .select(
            "id",
            "n_grams",
            F.round(F.col("__top") / F.col("n_grams"), 6).alias("top_gram_frac"),
            F.round(F.col("__dup") / F.col("n_grams"), 6).alias("dup_gram_frac"),
            F.round(F.col("__distinct") / F.col("n_grams"), 6).alias("distinct_frac"),
        )
    )


def mixture_report(
    sampled: DataFrame,
    domain_col: str,
    budgets: dict[str, int],
    tokens_col: str,
) -> DataFrame:
    """Achieved-vs-target accounting for a :func:`token_budget_sample`
    output — the number a data-recipe owner actually watches: a domain
    whose corpus is SMALLER than its budget silently under-fills (the
    sampler can't invent tokens), and this surfaces the shortfall
    instead of letting the published mix proportions be fiction.

    One row per budgeted domain: (domain, target_tokens,
    achieved_tokens, achieved_docs, fill_ratio). fill_ratio < 1 means
    the domain exhausted before its budget (raise other budgets or
    up-sample that domain upstream); slightly > 1 is normal —
    token_budget_sample includes the budget-crossing document. Domains
    with zero sampled docs still appear (outer join against the
    driver-small budget dim).
    """
    spark = sampled.sparkSession
    targets = spark.createDataFrame(
        [(d, int(b)) for d, b in budgets.items()],
        f"{domain_col} string, target_tokens long",
    )
    achieved = sampled.groupBy(domain_col).agg(
        F.sum(tokens_col).cast("long").alias("achieved_tokens"),
        F.count(F.lit(1)).alias("achieved_docs"),
    )
    return targets.join(achieved, domain_col, "left_outer").select(
        domain_col,
        "target_tokens",
        F.coalesce("achieved_tokens", F.lit(0)).alias("achieved_tokens"),
        F.coalesce("achieved_docs", F.lit(0)).alias("achieved_docs"),
        F.round(
            F.coalesce("achieved_tokens", F.lit(0))
            / F.greatest(F.col("target_tokens"), F.lit(1)),
            6,
        ).alias("fill_ratio"),
    )


def contamination_tags(
    corpus_shingles: DataFrame,
    eval_shingles: DataFrame,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Benchmark decontamination: per corpus document, how many of its
    n-gram shingles also occur in the eval/benchmark set — train/test
    overlap detection before a training run (the n-gram-overlap
    procedure described in the GPT-3 and PaLM dataset cards).

    Inputs are (id, shingle) relations (see ``operators.dedup.shingles``).
    Output: (id, n_shared_grams) for every corpus id with >= 1 shared
    shingle, where shared means the shingle occurs in an eval document
    with a DIFFERENT id (so running the eval set against itself doesn't
    self-flag).

    Shape: distinct eval shingles (small side — eval sets are orders of
    magnitude smaller than the corpus) equi-joined on shingle, then one
    count-distinct per doc. ``max_shingle_freq`` drops boilerplate
    shingles on the corpus side first — same skew guard as LSH.

    This is the detection METRIC; to ACT on contamination (drop whole
    docs, or scrub just the overlapping spans with the interval-merge
    cut) use ``operators.decontamination.decontaminate``.
    """
    if max_shingle_freq is not None:
        freq = corpus_shingles.groupBy("shingle").agg(F.count(F.lit(1)).alias("__f"))
        corpus_shingles = (
            corpus_shingles.join(freq.where(F.col("__f") <= max_shingle_freq), "shingle")
            .drop("__f")
        )
    ev = eval_shingles.select(F.col("id").alias("eval_id"), "shingle").distinct()
    return (
        corpus_shingles.join(ev, "shingle")
        .where(F.col("id") != F.col("eval_id"))
        .groupBy("id")
        .agg(F.count_distinct("shingle").alias("n_shared_grams"))
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    n_tokens_col: str,
    max_tokens: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """Greedy first-fit-decreasing sequence packing: assign documents
    to bins of at most ``max_tokens`` tokens. Returns (id, n_tokens,
    pack_id, pack_pos).

    Packing is BUCKET-LOCAL: documents hash into ``num_partitions``
    deterministic buckets (one shuffle of two long columns), each
    bucket packs independently with first-fit-decreasing, and bin ids
    are globally unique as (bucket << 32) + local_bin. Cross-bucket
    packing would need a global sort for marginal density gain —
    bucket-local FFD already achieves >90% utilization for realistic
    length distributions, and it scales embarrassingly. Documents
    longer than ``max_tokens`` get a singleton bin (the trainer's
    truncation policy applies downstream). Deterministic end-to-end:
    bucket assignment, sort order, and fit order are all stable.
    """
    import pandas as pd

    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))

    # carry the caller's id type through (string ids are first-class
    # everywhere else in the pipeline, e.g. dedup/shingles) — a
    # hardcoded `id long` would dtype-error on non-numeric ids
    id_type = df.schema[id_col].dataType.simpleString()

    slim = df.select(
        F.col(id_col).alias("id"), F.col(n_tokens_col).cast("long").alias("n_tokens")
    ).withColumn(
        "__bucket",
        F.pmod(F.xxhash64(F.col("id")), F.lit(num_partitions)).cast("int"),
    )

    def pack(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["n_tokens", "id"], ascending=[False, True], kind="stable"
        )
        bins_rem: list[int] = []
        bins_len: list[int] = []
        ids, toks, local_bin, pos = [], [], [], []
        for doc_id, need in zip(pdf["id"], pdf["n_tokens"]):
            need = int(need)
            b = -1
            if need <= max_tokens:
                for i, rem in enumerate(bins_rem):
                    if need <= rem:
                        b = i
                        break
            if b < 0:
                bins_rem.append(max(max_tokens - need, 0))
                bins_len.append(0)
                b = len(bins_rem) - 1
            else:
                bins_rem[b] -= need
            ids.append(doc_id)
            toks.append(need)
            local_bin.append(b)
            pos.append(bins_len[b])
            bins_len[b] += 1
        return pd.DataFrame(
            {
                "id": pd.Series(ids),  # dtype inherited from the input column
                "n_tokens": pd.Series(toks, dtype="int64"),
                "local_bin": pd.Series(local_bin, dtype="int64"),
                "pack_pos": pd.Series(pos, dtype="int64"),
                "__bucket": pd.Series([key[0]] * len(ids), dtype="int32"),
            }
        )

    packed = slim.groupBy("__bucket").applyInPandas(
        pack, f"id {id_type}, n_tokens long, local_bin long, pack_pos long, __bucket int"
    )
    return packed.select(
        "id",
        "n_tokens",
        (F.col("__bucket").cast("long") * F.lit(2**32) + F.col("local_bin")).alias(
            "pack_id"
        ),
        "pack_pos",
    )


def remove_boilerplate_lines(
    docs: DataFrame,
    min_dup_freq: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """Corpus-wide line-level deduplication (the C4 / RefinedWeb
    boilerplate filter): any line whose EXACT text occurs in at least
    ``min_dup_freq`` DISTINCT documents (cookie banners, nav menus,
    license footers) is removed from every document; the remaining
    lines are reassembled in their original order. Document frequency,
    not occurrence count — a refrain repeated many times inside ONE
    document is that document's content, not corpus boilerplate, and
    stays. Returns one row per input document:
    ``(id, text_clean, n_lines, n_removed)`` — a document that was all
    boilerplate keeps its row with an empty ``text_clean``.

    Plan shape (scale argument): lines are counted and anti-joined on
    ``xxhash64(line)`` — an 8-byte key — so the frequency shuffle never
    carries line text; a 64-bit collision (probability ~n^2/2^64) could
    merge two distinct lines' counts, the standard trade for hashed
    line dedup at corpus scale. The boilerplate list itself is the
    high-frequency tail of the distinct-line distribution —
    orders-of-magnitude smaller than the corpus — so AQE turns the
    anti-join into a broadcast when it fits. Reassembly is one
    aggregation keyed by document id: collect (pos, line) structs,
    array_sort (structs order by first field), project the line, join.
    Order-preservation does NOT rely on collect_list input order —
    only on the explicit pos sort.
    """
    # \Q...\E: F.split's separator is a REGEX — quote it so callers can
    # pass regex metacharacters ('.', '|') as literal separators, and
    # the split pattern always mirrors the literal array_join below
    sep_pattern = "\\Q" + sep + "\\E"
    base = docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), sep_pattern)).alias("pos", "line"),
    ).withColumn("key", F.xxhash64("line"))
    freq = base.groupBy("key").agg(F.count_distinct(F.col("id")).alias("__f"))
    boiler = freq.where(F.col("__f") >= min_dup_freq).select("key")
    kept = base.join(boiler, "key", "left_anti")
    reassembled = kept.groupBy("id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s.getField("line"),
            ),
            sep,
        ).alias("text_clean"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    totals = docs.select(
        F.col(id_col).alias("id"),
        F.size(F.split(F.col(text_col), sep_pattern)).alias("n_lines"),
    )
    return totals.join(reassembled, "id", "left").select(
        "id",
        F.coalesce("text_clean", F.lit("")).alias("text_clean"),
        "n_lines",
        (F.col("n_lines") - F.coalesce("n_kept", F.lit(0))).alias("n_removed"),
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int,
    overlap_tokens: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document into fixed-size token-window chunks with
    optional overlap — the context-window preparation step of a
    training / retrieval pipeline (documents rarely fit a model's
    window; training packs fixed-length sequences, retrieval indexes
    overlapping chunks so answers spanning a boundary stay findable).

    Whitespace tokens; chunk i covers tokens
    ``[i * stride, i * stride + chunk_tokens)`` with
    ``stride = chunk_tokens - overlap_tokens``. The final chunk may be
    short; a document shorter than one chunk yields exactly one chunk.
    Returns ``(id, chunk_idx, chunk_text, n_tokens)``.

    Pure codegen (split -> sequence -> transform -> posexplode): the
    chunk table is produced in one shuffle-free scan, embarrassingly
    parallel at any corpus size — chunking never needs a UDF. Row
    growth is ~1/(1 - overlap/chunk) x the token volume; cap overlap
    well below chunk_tokens (enforced here) so the blowup is bounded.
    """
    if chunk_tokens <= 0:
        raise ValueError(f"chunk_documents: chunk_tokens must be positive, got {chunk_tokens}")
    if not (0 <= overlap_tokens < chunk_tokens):
        raise ValueError(
            "chunk_documents: overlap_tokens must satisfy "
            f"0 <= overlap < chunk_tokens, got {overlap_tokens}"
        )
    stride = chunk_tokens - overlap_tokens
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
    # number of chunks: ceil(max(n - overlap, 1) / stride), >= 1
    n_chunks = F.greatest(
        F.ceil((F.size(toks) - F.lit(overlap_tokens)) / F.lit(stride)).cast("int"),
        F.lit(1),
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.slice(toks, i * stride + 1, chunk_tokens),
    )
    return docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(chunks).alias("chunk_idx", "chunk_toks"),
    ).select(
        "id",
        "chunk_idx",
        F.array_join(F.col("chunk_toks"), " ").alias("chunk_text"),
        F.size(F.col("chunk_toks")).alias("n_tokens"),
    )


def domain_stats(
    df: DataFrame,
    domain_col: str = "source",
    text_col: str = "text",
    round_out: int = 6,
) -> DataFrame:
    """Per-domain health report — the aggregation level web-corpus
    curation actually filters at (C4's blocklists, RefinedWeb's
    per-URL rules, Gopher's per-source audits act on DOMAINS, not
    documents: a spam farm's individual pages each look plausible;
    the domain-level statistics give it away).

    One row per domain: ``n_docs``, ``total_chars``, ``mean_quality``
    (the shared :func:`~..functions.text.quality_score` heuristic) and
    ``dup_rate`` — the fraction of the domain's docs whose
    CCNet-normalized fingerprint (:func:`~..functions.text.normalize_text`)
    collides with another doc of the SAME domain (templated/mirrored
    content manifests as intra-domain duplication long before it is
    visible globally).

    Scale shape: one map-side-combinable aggregation per grain —
    (domain, fingerprint) then domain — both shuffling only 8/16-byte
    keys + counters; quality is a scan-side codegen expression. The
    output is domains (tiny: ~10^6 rows for a web corpus), safe to
    broadcast back against the corpus (:func:`filter_by_domain_stats`).
    """
    from iot_sensor_data_pipeline_spark.functions.text import (
        fingerprint,
        normalize_text,
        quality_score,
    )

    t = F.col(text_col)
    per_fp = (
        df.select(
            F.col(domain_col).alias("domain"),
            fingerprint(normalize_text(t)).alias("__fp"),
            F.length(t).alias("__chars"),
            quality_score(t).alias("__q"),
        )
        .groupBy("domain", "__fp")
        .agg(
            F.count(F.lit(1)).alias("__c"),
            F.sum("__chars").alias("__chars"),
            F.sum("__q").alias("__q"),
        )
    )
    return per_fp.groupBy("domain").agg(
        F.sum("__c").alias("n_docs"),
        F.sum("__chars").alias("total_chars"),
        F.round(F.sum("__q") / F.sum("__c"), round_out).alias("mean_quality"),
        F.round(
            F.sum(F.when(F.col("__c") > 1, F.col("__c")).otherwise(F.lit(0)))
            / F.sum("__c"),
            round_out,
        ).alias("dup_rate"),
    )


def filter_by_domain_stats(
    df: DataFrame,
    domain_col: str = "source",
    text_col: str = "text",
    min_mean_quality: float | None = None,
    max_dup_rate: float | None = None,
    min_docs: int | None = None,
    stats: DataFrame | None = None,
) -> DataFrame:
    """Drop every document of a domain that fails the thresholds —
    the act-on-:func:`domain_stats` step. Pass a precomputed ``stats``
    relation to reuse one report across several filters (and to keep
    the corpus single-scan); otherwise it is derived here.

    The surviving-domain relation is domain-grain (tiny), so the
    filter-back is a broadcast LEFT SEMI join — the corpus itself
    never shuffles.
    """
    if min_mean_quality is None and max_dup_rate is None and min_docs is None:
        raise ValueError(
            "filter_by_domain_stats: set at least one of "
            "min_mean_quality / max_dup_rate / min_docs"
        )
    if stats is None:
        stats = domain_stats(df, domain_col=domain_col, text_col=text_col)
    keep = stats
    if min_mean_quality is not None:
        keep = keep.where(F.col("mean_quality") >= float(min_mean_quality))
    if max_dup_rate is not None:
        keep = keep.where(F.col("dup_rate") <= float(max_dup_rate))
    if min_docs is not None:
        keep = keep.where(F.col("n_docs") >= int(min_docs))
    keep = F.broadcast(keep.select(F.col("domain").alias(domain_col)))
    return df.join(keep, domain_col, "left_semi")


def epoch_shuffle(
    df: DataFrame,
    seed: int,
    id_col: str = "doc_id",
    out_col: str = "shuffle_pos",
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic global training order for an epoch — the shuffle
    a data LOADER needs: every worker must agree on position i's
    example without coordination, re-runs must reproduce bit-for-bit,
    and epoch e+1 must be a DIFFERENT permutation of the same corpus.
    RNG-state shuffles give none of that; hashing gives all three:
    order by ``md5(seed || ':' || id)`` (engine-portable, same trick
    as the md5 split/mix buckets above), tie-broken by the id itself
    so the sort key is unique even under hash collisions.

    Output: the input plus ``out_col`` — the exact 1-based global
    position, computed by ``ranking.global_row_number`` (range
    partition + per-partition row_number + broadcast offsets), so no
    single-partition sort appears at ANY scale. Loaders that only need
    a shuffled ORDER (not positions) can stop at
    ``repartitionByRange + sortWithinPartitions`` over the same key;
    this materializes positions so downstream sharding (position %
    n_shards) is pure arithmetic.
    """
    from iot_sensor_data_pipeline_spark.operators.ranking import global_row_number

    key = F.md5(F.concat(F.lit(f"{int(seed)}:"), F.col(id_col).cast("string")))
    return global_row_number(
        df.withColumn("__sk", key),
        [F.col("__sk"), F.col(id_col)],
        out_col=out_col,
        num_partitions=num_partitions,
    ).drop("__sk")
