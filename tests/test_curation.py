"""Training-data curation operators: PII redaction, deterministic
splits, exact stratified sampling, sequence packing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iot_sensor_data_pipeline_spark.operators.curation import (
    PII_PATTERNS,
    deterministic_split,
    pack_sequences,
    pii_hit_counts,
    pii_redact,
    stratified_sample_exact,
)
from iot_sensor_data_pipeline_spark.sources.tables import load_table


def test_pii_redact_and_counts(spark):
    rows = [
        (0, "contact bob.smith+x@corp.example.com or 212-555-0187 today"),
        (1, "ssn 123-45-6789 card 4111 1111 1111 1111 ip 10.1.2.3"),
        (2, "nothing sensitive here"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = df.select(
        "id", pii_redact(F.col("text")).alias("clean"), *pii_hit_counts(F.col("text"))
    ).collect()
    by_id = {r.id: r for r in out}

    assert "<EMAIL>" in by_id[0].clean and "@" not in by_id[0].clean
    assert "<PHONE>" in by_id[0].clean and "0187" not in by_id[0].clean
    assert by_id[0].n_email == 1 and by_id[0].n_phone == 1

    assert "<SSN>" in by_id[1].clean and "6789" not in by_id[1].clean
    assert "<CARD>" in by_id[1].clean and "4111" not in by_id[1].clean
    assert "<IP>" in by_id[1].clean
    assert by_id[1].n_ssn == 1 and by_id[1].n_card == 1 and by_id[1].n_ipv4 == 1

    assert by_id[2].clean == "nothing sensitive here"
    assert all(by_id[2][f"n_{name}"] == 0 for name, _, _ in PII_PATTERNS)


def test_deterministic_split_stable_and_proportional(spark, sf_dir_mid):
    docs = load_table(spark, sf_dir_mid, "documents")
    weights = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = deterministic_split(docs, "doc_id", weights)
    b = deterministic_split(docs.orderBy(F.rand(7)).repartition(3), "doc_id", weights)

    fa = {r.doc_id: r.split for r in a.select("doc_id", "split").collect()}
    fb = {r.doc_id: r.split for r in b.select("doc_id", "split").collect()}
    assert fa == fb  # immune to row order and partitioning

    n = len(fa)
    counts = {s: sum(1 for v in fa.values() if v == s) for s in weights}
    assert set(counts) == set(weights)
    for name, wt in weights.items():
        assert abs(counts[name] / n - wt / 1.0) < 0.05  # hash-uniformity


def test_deterministic_split_seed_changes_assignment(spark, sf_dir_mid):
    docs = load_table(spark, sf_dir_mid, "documents")
    w = {"a": 0.5, "b": 0.5}
    s1 = {r.doc_id: r.split for r in deterministic_split(docs, "doc_id", w, seed=1).collect()}
    s2 = {r.doc_id: r.split for r in deterministic_split(docs, "doc_id", w, seed=2).collect()}
    assert s1 != s2


def test_stratified_sample_exact_counts_and_determinism(spark, sf_dir_mid):
    docs = load_table(spark, sf_dir_mid, "documents")
    out = stratified_sample_exact(docs, "lang", 20, "doc_id")
    sizes = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    avail = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert sizes == {lang: min(20, n) for lang, n in avail.items()}

    again = stratified_sample_exact(docs.repartition(5), "lang", 20, "doc_id")
    assert {r.doc_id for r in out.select("doc_id").collect()} == {
        r.doc_id for r in again.select("doc_id").collect()
    }


def test_pack_sequences_respects_capacity_and_covers_all(spark):
    rows = [(i, 100 + (i * 37) % 400) for i in range(200)] + [(900, 5000)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = pack_sequences(df, "doc_id", "n_tokens", max_tokens=1024, num_partitions=4)
    got = out.collect()

    assert len(got) == len(rows)  # every document assigned exactly once
    assert len({r.id for r in got}) == len(rows)

    fills = {}
    for r in got:
        fills.setdefault(r.pack_id, []).append(r)
    for pack_id, members in fills.items():
        total = sum(r.n_tokens for r in members)
        if len(members) > 1:
            assert total <= 1024  # capacity respected for packed bins
        positions = sorted(r.pack_pos for r in members)
        assert positions == list(range(len(members)))  # dense positions

    oversize = [r for r in got if r.id == 900]
    assert len(oversize) == 1
    assert len(fills[oversize[0].pack_id]) == 1  # singleton bin


def test_pack_sequences_utilization(spark):
    """FFD should keep multi-doc bins >70% full on a uniform mix."""
    rows = [(i, 50 + (i * 97) % 450) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = pack_sequences(df, "doc_id", "n_tokens", max_tokens=1024, num_partitions=4).collect()
    per_bin: dict = {}
    for r in out:
        per_bin[r.pack_id] = per_bin.get(r.pack_id, 0) + r.n_tokens
    fills = sorted(per_bin.values())
    # ignore each bucket's final partially-filled bin (up to 4 buckets)
    well_packed = fills[4:] if len(fills) > 4 else fills
    assert sum(well_packed) / (1024 * len(well_packed)) >= 0.7


def test_pack_sequences_deterministic(spark):
    rows = [(i, 64 + (i % 9) * 100) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    a = sorted(map(tuple, pack_sequences(df, "doc_id", "n_tokens", 512, 4).collect()))
    b = sorted(
        map(
            tuple,
            pack_sequences(
                df.orderBy(F.rand(3)).repartition(7), "doc_id", "n_tokens", 512, 4
            ).collect(),
        )
    )
    assert a == b


@pytest.mark.parametrize(
    "sf", ["/root/testdata/sf0.01", "/root/testdata/sf0.001"]
)
def test_stratified_sample_duckdb_differential(spark, sf):
    """The md5-order sampler is engine-reproducible: DuckDB computes
    the identical sample (same md5 hex, same tiebreak) — differential
    evidence at the same grade as the registry's oracle gate, at TWO
    scale points (the suite-wide convention — a query that only
    matches at one SF has a scale-dependent constant baked in)."""
    from tests.oracle_harness import compare_query

    oracle = """
    SELECT doc_id, lang FROM (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS rn
      FROM documents
    ) t WHERE rn <= 20
    """

    def q(spark, sf_dir):
        docs = load_table(spark, sf_dir, "documents")
        return stratified_sample_exact(docs, "lang", 20, "doc_id").select(
            "doc_id", "lang"
        )

    ok, msg = compare_query(spark, sf, q, oracle)
    assert ok, msg


def test_md5_bucket_matches_xxhash_split_api(spark, sf_dir_mid):
    """The md5 bucket override produces a valid split (all rows
    assigned, proportions near weights) and differs from the xxhash64
    default only in WHICH docs land where, not in the contract."""
    from iot_sensor_data_pipeline_spark.operators.curation import md5_bucket_expr

    docs = load_table(spark, sf_dir_mid, "documents")
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = deterministic_split(
        docs, "doc_id", w, bucket_expr=md5_bucket_expr("doc_id")
    )
    counts = {
        r.split: r.n
        for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    n = sum(counts.values())
    assert n == docs.count()
    for name, wt in w.items():
        assert abs(counts.get(name, 0) / n - wt) < 0.05


def test_repetition_metrics_golden(spark):
    from iot_sensor_data_pipeline_spark.operators.curation import repetition_metrics

    rows = [
        (0, "buy now buy now buy now"),           # 2-grams: bn,nb,bn,nb,bn
        (1, "all words here are unique tokens"),  # no repeated 2-gram
        (2, "x"),                                 # <2 words -> absent
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.id: r for r in repetition_metrics(df, "doc_id", "text", n=2).collect()}

    assert 2 not in out
    r0 = out[0]
    # 5 grams total: 'buy now' x3, 'now buy' x2 -> top 3/5, dup 5/5, distinct 2/5
    assert r0.n_grams == 5
    assert r0.top_gram_frac == pytest.approx(0.6)
    assert r0.dup_gram_frac == pytest.approx(1.0)
    assert r0.distinct_frac == pytest.approx(0.4)
    r1 = out[1]
    assert r1.top_gram_frac == pytest.approx(1 / r1.n_grams)
    assert r1.dup_gram_frac == 0.0
    assert r1.distinct_frac == pytest.approx(1.0)


def test_contamination_tags_self_excluded(spark):
    from iot_sensor_data_pipeline_spark.operators.curation import contamination_tags
    from iot_sensor_data_pipeline_spark.operators.dedup import shingles

    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "a quick brown fox appears in the benchmark set"),
        (2, "completely unrelated text with no overlap at all"),
        (3, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sh = shingles(df, "doc_id", "text", n=3)
    ev = sh.where(F.col("id") == 0)  # doc 0 is the eval set
    got = {r.id: r.n_shared_grams for r in contamination_tags(sh, ev).collect()}

    assert 0 not in got            # eval doc doesn't self-flag
    assert got[1] == 1             # shares exactly 'quick brown fox'
    assert 2 not in got            # clean doc untagged
    assert got[3] == 7             # exact dup shares every shingle


def test_contamination_max_shingle_freq_guard(spark):
    """Boilerplate shingles above the frequency cap stop generating
    candidate matches — the skew guard for 100 TB corpora."""
    from iot_sensor_data_pipeline_spark.operators.curation import contamination_tags
    from iot_sensor_data_pipeline_spark.operators.dedup import shingles

    boiler = "all rights reserved"
    rows = [(i, f"document number {i} says {boiler}") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sh = shingles(df, "doc_id", "text", n=3)
    ev = sh.where(F.col("id") == 0)

    with_guard = contamination_tags(sh, ev, max_shingle_freq=5).collect()
    assert with_guard == []  # every shared shingle occurs in all 10 docs

    without = contamination_tags(sh, ev).collect()
    assert len(without) == 9

def test_pack_sequences_string_ids(spark):
    """Non-numeric doc ids are first-class across the pipeline (dedup,
    shingles); packing must carry the input id type through instead of
    coercing to int64 (ADVICE r03)."""
    rows = [(f"doc-{i:03d}", 100 + (i * 37) % 400) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id string, n_tokens long")
    out = pack_sequences(df, "doc_id", "n_tokens", max_tokens=1024, num_partitions=4)
    assert out.schema["id"].dataType.simpleString() == "string"
    got = out.collect()
    assert {r.id for r in got} == {r[0] for r in rows}
    per_bin: dict = {}
    for r in got:
        per_bin[r.pack_id] = per_bin.get(r.pack_id, 0) + r.n_tokens
    assert all(
        tot <= 1024
        for pid, tot in per_bin.items()
        if sum(1 for r in got if r.pack_id == pid) > 1
    )

def test_weighted_mix_rates_and_determinism(spark):
    """Data-mixing filter: per-domain keep fraction tracks the rate,
    decisions are per-row deterministic (stable under repartitioning
    AND corpus growth), unlisted domains use default_rate."""
    from iot_sensor_data_pipeline_spark.operators.curation import weighted_mix

    rows = [(i, ["a", "b", "c"][i % 3]) for i in range(3000)]
    df = spark.createDataFrame(rows, "id long, domain string")
    rates = {"a": 1.0, "b": 0.5, "c": 0.0}
    kept = weighted_mix(df, "domain", rates, "id").collect()
    by_dom: dict = {}
    for r in kept:
        by_dom.setdefault(r.domain, set()).add(r.id)
    assert len(by_dom.get("a", ())) == 1000          # rate 1.0 keeps all
    assert "c" not in by_dom                          # rate 0.0 drops all
    frac_b = len(by_dom.get("b", ())) / 1000
    assert 0.4 < frac_b < 0.6                         # rate 0.5 +- binomial

    # determinism: repartitioned input and a grown corpus keep the
    # exact same ids for domain b
    again = {
        r.id
        for r in weighted_mix(df.repartition(7), "domain", rates, "id").collect()
        if r.domain == "b"
    }
    assert again == by_dom["b"]
    grown = df.union(
        spark.createDataFrame([(i, "b") for i in range(3000, 4000)], "id long, domain string")
    )
    grown_b = {
        r.id
        for r in weighted_mix(grown, "domain", rates, "id").collect()
        if r.domain == "b" and r.id < 3000
    }
    assert grown_b == by_dom["b"]

    # unlisted domain follows default_rate
    none_kept = weighted_mix(df, "domain", {"zzz": 1.0}, "id", default_rate=0.0)
    assert none_kept.count() == 0
    all_kept = weighted_mix(df, "domain", {"zzz": 0.0}, "id", default_rate=1.0)
    assert all_kept.count() == 3000


def test_weighted_mix_null_domain_matches_sql_semantics(spark):
    """ADVICE r04: the md5 mix bucket must NULL-propagate like the
    oracle's `domain || ':' || id` — a NULL domain (or id) yields a
    NULL bucket, which fails every `bucket < threshold` comparison, so
    the row is dropped EVEN under default_rate=1.0. concat_ws would
    silently keep it and diverge from any SQL engine."""
    from iot_sensor_data_pipeline_spark.operators.curation import (
        md5_mix_bucket_expr,
        weighted_mix,
    )

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a")], "id long, domain string"
    )
    kept = weighted_mix(
        df,
        "domain",
        {"a": 1.0},
        "id",
        default_rate=1.0,
        bucket_expr=md5_mix_bucket_expr("domain", "id"),
    ).collect()
    assert {r.id for r in kept} == {1, 3}


def test_weighted_mix_is_scan_side_filter(spark):
    """The mixing decision must be a pure filter — no Exchange in the
    plan (at 100 TB this is a pushdown-adjacent scan filter, not a
    sampling shuffle)."""
    from iot_sensor_data_pipeline_spark.operators.curation import weighted_mix

    df = spark.createDataFrame([(1, "a")], "id long, domain string")
    out = weighted_mix(df, "domain", {"a": 0.5}, "id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan

def test_token_budget_sample_prefix_semantics(spark):
    """Budget sampling: deterministic md5-order prefix per domain; a
    doc is kept iff tokens accumulated BEFORE it are under budget (the
    crossing doc is included, so the budget is always reached);
    partition-invariant; unbudgeted domains follow default_budget."""
    import hashlib

    from iot_sensor_data_pipeline_spark.operators.curation import token_budget_sample

    rows = [(i, ["a", "b"][i % 2], 100 + (i * 13) % 50) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_tokens long")
    budgets = {"a": 1500, "b": 700}
    out = token_budget_sample(df, "lang", budgets, "doc_id", "n_tokens").collect()

    # independent python mirror
    want = {}
    for lang in ("a", "b"):
        docs = sorted(
            (r for r in rows if r[1] == lang),
            key=lambda r: (hashlib.md5(str(r[0]).encode()).hexdigest(), r[0]),
        )
        acc = 0
        for i, _, tok in docs:
            if acc < budgets[lang]:
                want[i] = acc
            acc += tok
    got = {r.doc_id: r.cum_before for r in out}
    assert got == want
    # budget reached: kept tokens + crossing doc >= budget per domain
    for lang in ("a", "b"):
        kept = [r for r in out if r.lang == lang]
        assert max(r.cum_before + r.n_tokens for r in kept) >= budgets[lang]

    again = {
        r.doc_id
        for r in token_budget_sample(
            df.repartition(7), "lang", budgets, "doc_id", "n_tokens"
        ).collect()
    }
    assert again == set(want)

    # no default: unbudgeted domain dropped entirely
    only_a = token_budget_sample(df, "lang", {"a": 1500}, "doc_id", "n_tokens")
    assert {r.lang for r in only_a.collect()} == {"a"}
    # with default: it participates
    with_default = token_budget_sample(
        df, "lang", {"a": 1500}, "doc_id", "n_tokens", default_budget=700
    )
    assert {r.lang for r in with_default.collect()} == {"a", "b"}


def test_token_budget_sample_skewed_domain(spark):
    """VERDICT r04 #1: a dominant domain (>= 90% of rows) must produce
    the same exact prefix — correctness of the bucket-histogram path on
    the skew shape it exists for, including a domain whose budget
    exceeds its total tokens (every row kept) and a tiny domain."""
    import hashlib

    from iot_sensor_data_pipeline_spark.operators.curation import token_budget_sample

    rows = [(i, "web" if i % 10 else "code", 50 + (i * 7) % 100) for i in range(5000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_tokens long")
    # web ~ 4500 rows / ~450k tokens: budget cuts a prefix;
    # code budget exceeds its total: everything kept, cum_before exact
    budgets = {"web": 30_000, "code": 10**9}
    out = token_budget_sample(df, "lang", budgets, "doc_id", "n_tokens").collect()

    want = {}
    for lang in ("web", "code"):
        docs = sorted(
            (r for r in rows if r[1] == lang),
            key=lambda r: (hashlib.md5(str(r[0]).encode()).hexdigest(), r[0]),
        )
        acc = 0
        for i, _, tok in docs:
            if acc < budgets[lang]:
                want[i] = acc
            acc += tok
    got = {r.doc_id: r.cum_before for r in out}
    assert got == want
    assert sum(1 for r in out if r.lang == "code") == 500  # all kept


def test_token_budget_sample_no_per_domain_window(spark):
    """VERDICT r04 #1 (plan shape): the exact per-row running sum must
    NEVER run in one window partition per domain — every Window that
    orders by the md5 row order must partition on (domain, bucket), so
    a 90%-of-corpus domain spreads over the bucket space instead of one
    task. (The only domain-partitioned window allowed is the one over
    the 64Ki-row aggregated HISTOGRAM, which orders by bucket, not
    md5.)"""
    import re

    from iot_sensor_data_pipeline_spark.operators.curation import token_budget_sample

    rows = [(i, "web" if i % 20 else "rare", 100) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_tokens long")
    out = token_budget_sample(df, "lang", {"web": 5000, "rare": 2000}, "doc_id", "n_tokens")
    plan = out._jdf.queryExecution().executedPlan().toString()

    # physical Window nodes print as: Window [fns], [partition spec],
    # [order spec]. NOTE: the md5 sort expression is projected to a
    # `_w0` alias in the physical plan, so the rule is structural: a
    # single-key window is allowed ONLY for the bucket-histogram
    # offsets pass (recognizable by ordering on the bucket column) —
    # the per-row window must partition on (domain, bucket).
    windows = re.findall(r"Window (\[[^\]]*\]), (\[[^\]]*\]), (\[[^\]]*\])", plan)
    assert windows, f"no Window nodes found in plan:\n{plan}"
    assert any("__b" not in order for _f, _p, order in windows), (
        f"expected a row-level (md5-ordered) window in plan:\n{plan}"
    )
    for _fns, part, order in windows:
        n_part_cols = len([c for c in part.strip("[]").split(",") if c.strip()])
        if n_part_cols < 2:
            assert "__b" in order, (
                f"single-key window that is NOT the bucket histogram "
                f"(per-domain single task at scale): {part} {order}\n{plan}"
            )
    # the candidate-bucket prune must reach the row side as a broadcast
    # join (the corpus side must not shuffle to discover candidacy)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_stratified_sample_no_per_stratum_window(spark):
    """Round 5: stratified_sample_exact shares token_budget_sample's
    bucket-histogram plan — every md5-ordered window partitions on
    (stratum, bucket), and the `rn <= n` filter still triggers
    WindowGroupLimit so each slice pre-prunes to its local n before
    the exchange."""
    import re

    from iot_sensor_data_pipeline_spark.operators.curation import (
        stratified_sample_exact,
    )

    rows = [(i, "web" if i % 20 else "rare") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = stratified_sample_exact(df, "lang", 10, "doc_id")
    plan = out._jdf.queryExecution().executedPlan().toString()

    assert "WindowGroupLimit" in plan
    # same structural rule as the token-budget plan test: single-key
    # windows only for the bucket-histogram pass (ordered on __b)
    windows = re.findall(r"Window (\[[^\]]*\]), (\[[^\]]*\]), (\[[^\]]*\])", plan)
    assert windows, f"no Window nodes found in plan:\n{plan}"
    assert any("__b" not in order for _f, _p, order in windows), (
        f"expected a row-level (md5-ordered) window in plan:\n{plan}"
    )
    for _fns, part, order in windows:
        n_part_cols = len([c for c in part.strip("[]").split(",") if c.strip()])
        if n_part_cols < 2:
            assert "__b" in order, (
                f"single-key window that is NOT the bucket histogram "
                f"(per-stratum single task at scale): {part} {order}\n{plan}"
            )


# ---------------------------------------------------------------------------
# remove_boilerplate_lines (C4 / RefinedWeb line-level dedup)
# ---------------------------------------------------------------------------


def _boiler_docs(spark):
    footer = "COPYRIGHT 2026 EXAMPLE CORP"
    rows = [(i, f"unique line {i} alpha\n{footer}\nunique line {i} beta") for i in range(10)]
    rows.append((100, footer))  # all-boilerplate document
    rows.append((101, "rare line\nanother rare line"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_boilerplate_lines_removed_order_preserved(spark):
    from iot_sensor_data_pipeline_spark.operators.curation import (
        remove_boilerplate_lines,
    )

    out = {r.id: r for r in remove_boilerplate_lines(_boiler_docs(spark), 10).collect()}
    assert len(out) == 12
    for i in range(10):
        r = out[i]
        # footer (11 occurrences >= 10) stripped; unique lines keep order
        assert r.text_clean == f"unique line {i} alpha\nunique line {i} beta"
        assert r.n_lines == 3 and r.n_removed == 1


def test_boilerplate_all_boiler_doc_keeps_row_empty_text(spark):
    from iot_sensor_data_pipeline_spark.operators.curation import (
        remove_boilerplate_lines,
    )

    out = {r.id: r for r in remove_boilerplate_lines(_boiler_docs(spark), 10).collect()}
    assert out[100].text_clean == ""
    assert out[100].n_lines == 1 and out[100].n_removed == 1
    assert out[101].text_clean == "rare line\nanother rare line"
    assert out[101].n_removed == 0


def test_boilerplate_threshold_boundary(spark):
    """freq == min_dup_freq is removed; freq == min_dup_freq - 1 kept."""
    from iot_sensor_data_pipeline_spark.operators.curation import (
        remove_boilerplate_lines,
    )

    rows = [(i, "three times\ntwo times" if i < 2 else "three times\nsolo") for i in range(3)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.id: r for r in remove_boilerplate_lines(docs, 3).collect()}
    # "three times" occurs 3x -> removed everywhere; "two times" 2x -> kept
    assert out[0].text_clean == "two times"
    assert out[2].text_clean == "solo"


def test_boilerplate_separator_is_literal_not_regex(spark):
    """A '.' separator must split on literal dots, not every char."""
    from iot_sensor_data_pipeline_spark.operators.curation import (
        remove_boilerplate_lines,
    )

    docs = spark.createDataFrame(
        [(1, "keep me.SPAM"), (2, "also kept.SPAM"), (3, "third doc.SPAM")],
        "doc_id long, text string",
    )
    out = {r.id: r for r in remove_boilerplate_lines(docs, 3, sep=".").collect()}
    assert out[1].text_clean == "keep me"
    assert out[1].n_lines == 2 and out[1].n_removed == 1


def test_boilerplate_uses_document_frequency_not_occurrences(spark):
    """A refrain repeated inside ONE document is content, not corpus
    boilerplate — only lines shared by >= min_dup_freq DISTINCT
    documents are stripped (C4/RefinedWeb semantics)."""
    from iot_sensor_data_pipeline_spark.operators.curation import (
        remove_boilerplate_lines,
    )

    refrain = "\n".join(["la la la"] * 5)
    docs = spark.createDataFrame(
        [(1, refrain), (2, "normal text"), (3, "other text")],
        "doc_id long, text string",
    )
    out = {r.id: r for r in remove_boilerplate_lines(docs, 3).collect()}
    assert out[1].text_clean == refrain  # 5 occurrences, 1 document: kept
    assert out[1].n_removed == 0


# ---------------------------------------------------------------------------
# chunk_documents
# ---------------------------------------------------------------------------


def test_chunk_documents_covers_all_tokens_no_overlap(spark):
    from iot_sensor_data_pipeline_spark.operators.curation import chunk_documents

    text = " ".join(f"w{i}" for i in range(10))
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        chunk_documents(docs, chunk_tokens=4).collect(), key=lambda r: r.chunk_idx
    )
    assert [r.chunk_text for r in rows] == [
        "w0 w1 w2 w3", "w4 w5 w6 w7", "w8 w9",
    ]
    assert [r.n_tokens for r in rows] == [4, 4, 2]


def test_chunk_documents_overlap_and_short_doc(spark):
    from iot_sensor_data_pipeline_spark.operators.curation import chunk_documents

    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "only two")], "doc_id long, text string"
    )
    rows = chunk_documents(docs, chunk_tokens=3, overlap_tokens=1).collect()
    by_doc = {}
    for r in sorted(rows, key=lambda r: (r.id, r.chunk_idx)):
        by_doc.setdefault(r.id, []).append(r.chunk_text)
    # stride 2: [a b c], [c d e] — boundary token c appears in both
    assert by_doc[1] == ["a b c", "c d e"]
    # shorter than one chunk: exactly one chunk
    assert by_doc[2] == ["only two"]


def test_chunk_documents_rejects_bad_params(spark):
    import pytest as _pytest

    from iot_sensor_data_pipeline_spark.operators.curation import chunk_documents

    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="chunk_tokens"):
        chunk_documents(docs, 0)
    with _pytest.raises(ValueError, match="overlap"):
        chunk_documents(docs, 4, overlap_tokens=4)


def test_chunk_documents_plan_is_shuffle_free(spark):
    from iot_sensor_data_pipeline_spark.operators.curation import chunk_documents

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = (
        chunk_documents(docs, 2)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "EvalPython" not in plan  # chunking never needs a UDF


def test_chunker_udtf_matches_native_operator(spark):
    """Python UDTF surface (Spark 4 arrow-optimized table function):
    a UDTF chunker cross-checked against the native codegen operator —
    pins the UDTF API end to end (lateral join, multi-row yield) while
    documenting that the native path is the production one."""
    from pyspark.sql import functions as F

    from iot_sensor_data_pipeline_spark.operators.curation import chunk_documents

    @F.udtf(returnType="chunk_idx int, chunk_text string, n_tokens int")
    class Chunker:
        def eval(self, text: str, chunk_tokens: int):
            toks = [t for t in (text or "").split() if t]
            if not toks:
                toks = []
            chunks = [toks[i : i + chunk_tokens] for i in range(0, max(len(toks), 1), chunk_tokens)]
            for idx, ch in enumerate(chunks):
                yield idx, " ".join(ch), len(ch)

    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(7))), (2, "a b")],
        "doc_id long, text string",
    )
    spark.udtf.register("chunker", Chunker)
    docs.createOrReplaceTempView("chunk_in")
    got = spark.sql(
        "SELECT doc_id AS id, c.chunk_idx, c.chunk_text, c.n_tokens "
        "FROM chunk_in, LATERAL chunker(text, 3) c"
    )
    want = chunk_documents(docs, chunk_tokens=3)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_curation_pipeline_composition_end_to_end(spark):
    """The full curation chain composes: boilerplate removal ->
    normalized-fingerprint dedup -> chunking -> sequence packing.
    Asserts cross-operator invariants: boilerplate never reaches
    chunks, normalized duplicates collapse to one survivor, every
    surviving token lands in exactly one chunk, and packing covers
    every chunk exactly once within capacity."""
    from pyspark.sql import functions as F

    from iot_sensor_data_pipeline_spark.functions.text import normalize_text
    from iot_sensor_data_pipeline_spark.operators.curation import (
        chunk_documents,
        pack_sequences,
        remove_boilerplate_lines,
    )

    footer = "COPYRIGHT FOOTER LINE"
    # bodies must differ by LETTERS: normalize_text maps every digit to
    # 0, so digit-only differences would (by design) collapse them all
    bodies = [
        f"unique body {'abcdefghij'[i]} alpha beta gamma delta" for i in range(10)
    ]
    rows = [(i, f"{b}\n{footer}") for i, b in enumerate(bodies)]
    # doc 100: case/punctuation variant of doc 0's body -> same normalized fp
    rows.append((100, f"UNIQUE body A alpha, beta. GAMMA delta!\n{footer}"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    cleaned = remove_boilerplate_lines(docs, min_dup_freq=10)
    assert not any(
        footer in r.text_clean for r in cleaned.collect()
    ), "boilerplate leaked through"

    deduped = (
        cleaned.withColumn("norm_fp", F.md5(normalize_text(F.col("text_clean"))))
        .withColumn(
            "rn",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"]).Window.partitionBy(
                    "norm_fp"
                ).orderBy("id")
            ),
        )
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    ids = {r.id for r in deduped.collect()}
    assert 0 in ids and 100 not in ids  # variant collapsed onto min id
    assert len(ids) == 10

    chunks = chunk_documents(
        deduped.select("id", F.col("text_clean").alias("text")),
        chunk_tokens=4,
        id_col="id",
    )
    per_doc = {}
    for r in chunks.collect():
        per_doc.setdefault(r.id, []).append((r.chunk_idx, r.chunk_text))
    for i in ids:
        toks = [t for t in dict(rows)[i].split("\n")[0].split() if t]
        reassembled = " ".join(
            t for _, text in sorted(per_doc[i]) for t in text.split()
        )
        assert reassembled == " ".join(toks)

    sized = chunks.select(
        F.concat_ws("#", F.col("id").cast("string"), F.col("chunk_idx").cast("string")).alias("id"),
        F.col("n_tokens"),
    )
    packed = pack_sequences(sized, "id", "n_tokens", max_tokens=8)
    prows = packed.collect()
    assert {r.id for r in prows} == {
        f"{r.id}#{r.chunk_idx}" for rs in [chunks.collect()] for r in rs
    }
    bins = {}
    for r in prows:
        bins.setdefault(r.pack_id, 0)
        bins[r.pack_id] += r.n_tokens
    assert all(total <= 8 for total in bins.values())


def test_mixture_report_shortfall_and_crossing_doc(spark):
    from iot_sensor_data_pipeline_spark.operators.curation import (
        mixture_report,
        token_budget_sample,
    )

    rows = [(i, "a" if i < 10 else "b", 10) for i in range(20)]
    df = spark.createDataFrame(rows, "id long, dom string, n long")
    budgets = {"a": 1_000, "b": 25, "z": 50}  # a under-fills, z empty
    mix = token_budget_sample(df, "dom", budgets, "id", "n")
    rep = {r.dom: r for r in mixture_report(mix, "dom", budgets, "n").collect()}
    assert set(rep) == {"a", "b", "z"}
    assert rep["z"].achieved_docs == 0 and rep["z"].fill_ratio == 0.0
    # "a" has only 100 tokens against a 1000 budget
    assert rep["a"].achieved_tokens == 100 and rep["a"].fill_ratio == 0.1
    # "b": budget 25, docs of 10 -> crossing doc included -> 30 tokens
    assert rep["b"].achieved_tokens == 30 and rep["b"].fill_ratio == 1.2


# ---------------------------------------------------------------------------
# weighted_sample_exact (Efraimidis-Spirakis over md5 uniforms)
# ---------------------------------------------------------------------------


def _es_python_mirror(rows, n):
    """Exact python mirror of the operator's key formula."""
    import hashlib
    import math

    def key(i, w):
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
        b = (h * 1_000_000) // 2**32
        return math.log((b + 0.5) / 1_000_000.0) / w

    elig = [(i, w) for i, w in rows if w is not None and w > 0]
    return sorted(
        (i for i, _ in sorted(elig, key=lambda t: (-key(*t), t[0]))[:n])
    )


def test_weighted_sample_matches_python_mirror(spark):
    from iot_sensor_data_pipeline_spark.operators.curation import (
        weighted_sample_exact,
    )

    rows = [(i, float(1 + (i * 7) % 40)) for i in range(300)] + [
        (900, None), (901, 0.0), (902, -3.0),
    ]
    df = spark.createDataFrame(rows, "id long, w double")
    got = sorted(
        r["id"] for r in weighted_sample_exact(df, "w", 60, "id").collect()
    )
    assert got == _es_python_mirror(rows, 60)
    # ineligible rows never sampled
    assert not {900, 901, 902} & set(got)


def test_weighted_sample_biases_toward_heavy_rows(spark):
    from iot_sensor_data_pipeline_spark.operators.curation import (
        weighted_sample_exact,
    )

    # 50 heavy rows (w=500) among 500 light (w=1): the heavy class
    # dominates the sample far beyond its 10% population share
    rows = [(i, 500.0 if i < 50 else 1.0) for i in range(550)]
    df = spark.createDataFrame(rows, "id long, w double")
    got = {r["id"] for r in weighted_sample_exact(df, "w", 50, "id").collect()}
    assert len(got) == 50
    assert sum(1 for i in got if i < 50) >= 40


def test_weighted_sample_partitioning_and_growth_stable(spark):
    from iot_sensor_data_pipeline_spark.operators.curation import (
        weighted_sample_exact,
    )

    rows = [(i, float(1 + i % 9)) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, w double")

    def run(d, npart):
        return sorted(
            r["id"]
            for r in weighted_sample_exact(d.repartition(npart), "w", 30, "id").collect()
        )

    assert run(df, 1) == run(df, 11)
    # growth: adding rows whose keys all lose cannot evict winners
    # (per-row hash keys, not positional) — append tiny-weight rows
    grown = df.unionByName(
        spark.createDataFrame([(1000 + i, 1e-6) for i in range(50)], "id long, w double")
    )
    assert run(df, 4) == run(grown, 4)


def test_weighted_sample_plan_is_top_n_not_global_sort(spark):
    from iot_sensor_data_pipeline_spark.operators.curation import (
        weighted_sample_exact,
    )

    df = spark.createDataFrame(
        [(i, float(i + 1)) for i in range(100)], "id long, w double"
    )
    plan = (
        weighted_sample_exact(df, "w", 10, "id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    with pytest.raises(ValueError, match="n must be"):
        weighted_sample_exact(df, "w", 0, "id")


# ---------------------------------------------------------------------------
# domain_stats / filter_by_domain_stats
# ---------------------------------------------------------------------------


# 'good': varied text; 'spam': one template repeated (dup_rate 1.0)
# differing only by digits/case so only NORMALIZED dedup sees it;
# 'tiny': a single doc (min_docs casualty)
_DOMAIN_ROWS = [
    (1, "good", "the cat sat on the mat and it was a fine day for all of them"),
    (2, "good", "a completely different sentence about the weather in the north"),
    (3, "good", "this is the third document and it is also unique in this set"),
    (4, "spam", "Buy NOW for only 19 dollars call 555-0100 today"),
    (5, "spam", "buy now for only 99 dollars CALL 555-0199 today"),
    (6, "spam", "BUY now for only 42 dollars call 555-0142 TODAY"),
    (7, "tiny", "one lonely document is all this domain has to offer the set"),
]


def _domain_fixture(spark):
    return spark.createDataFrame(
        _DOMAIN_ROWS, "doc_id long, source string, text string"
    )


def test_domain_stats_counts_and_dup_rate(spark):
    from iot_sensor_data_pipeline_spark.operators.curation import domain_stats

    stats = {r.domain: r for r in domain_stats(_domain_fixture(spark)).collect()}
    assert stats["good"].n_docs == 3 and stats["good"].dup_rate == 0.0
    assert stats["spam"].n_docs == 3 and stats["spam"].dup_rate == 1.0
    assert stats["tiny"].n_docs == 1 and stats["tiny"].dup_rate == 0.0
    for d, r in stats.items():
        total = sum(len(t) for i, s, t in _DOMAIN_ROWS if s == d)
        assert r.total_chars == total, d
    assert 0.0 <= stats["good"].mean_quality <= 1.0


def test_filter_by_domain_stats_drops_failing_domains(spark):
    from iot_sensor_data_pipeline_spark.operators.curation import (
        filter_by_domain_stats,
    )

    df = _domain_fixture(spark)
    # dup_rate gate removes the template farm
    kept = filter_by_domain_stats(df, max_dup_rate=0.5)
    assert sorted(r.source for r in kept.select("source").distinct().collect()) == [
        "good", "tiny",
    ]
    # min_docs gate removes the singleton domain
    kept2 = filter_by_domain_stats(df, min_docs=2)
    assert sorted(r.source for r in kept2.select("source").distinct().collect()) == [
        "good", "spam",
    ]
    # composed gates
    kept3 = filter_by_domain_stats(df, max_dup_rate=0.5, min_docs=2)
    assert [r.source for r in kept3.select("source").distinct().collect()] == ["good"]
    # docs of surviving domains come through untouched
    assert kept3.count() == 3


def test_filter_by_domain_stats_guard_and_broadcast_plan(spark):
    import pytest

    from iot_sensor_data_pipeline_spark.operators.curation import (
        domain_stats,
        filter_by_domain_stats,
    )

    df = _domain_fixture(spark)
    with pytest.raises(ValueError, match="at least one"):
        filter_by_domain_stats(df)

    # precomputed-stats reuse path + broadcast semi join (the corpus
    # side must NOT shuffle for the filter-back)
    stats = domain_stats(df)
    plan = (
        filter_by_domain_stats(df, min_docs=2, stats=stats)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ---------------------------------------------------------------------------
# epoch_shuffle
# ---------------------------------------------------------------------------


def test_epoch_shuffle_exact_permutation_and_determinism(spark, sf_dir_mid):
    from iot_sensor_data_pipeline_spark.operators.curation import epoch_shuffle

    docs = load_table(spark, sf_dir_mid, "documents").select("doc_id")
    n = docs.count()

    def run(seed, nparts):
        out = epoch_shuffle(docs.repartition(nparts), seed)
        return {r.doc_id: r.shuffle_pos for r in out.collect()}

    a = run(7, 3)
    # exactly the positions 1..n, each once
    assert sorted(a.values()) == list(range(1, n + 1))
    # partitioning-invariant and rerun-stable
    assert a == run(7, 11)
    # a different seed is a DIFFERENT permutation of the same corpus
    b = run(8, 3)
    assert set(a) == set(b)
    assert a != b


def test_epoch_shuffle_no_single_partition_sort(spark, sf_dir_mid):
    from iot_sensor_data_pipeline_spark.operators.curation import epoch_shuffle

    docs = load_table(spark, sf_dir_mid, "documents").select("doc_id")
    plan = (
        epoch_shuffle(docs, 3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange SinglePartition" not in plan
