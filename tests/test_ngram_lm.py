"""n-gram LM with stupid backoff (operators/ngram_lm.py): cascade
goldens vs a Python reference, discrimination property, DuckDB
differential, plan hygiene."""

from __future__ import annotations

import pytest

import math

from iot_sensor_data_pipeline_spark.operators.ngram_lm import (
    BOS,
    EOS,
    perplexity_filter,
    score_perplexity,
    train_ngram_lm,
)
from iot_sensor_data_pipeline_spark.plans import EXTENDED_REGISTRY
from tests.conftest import SF_SMALL
from tests.oracle_harness import compare_query

SF = "/root/testdata/sf0.01"


def _ref_scores(train_texts, score_texts, backoff=0.4, unk_alpha=0.1):
    from collections import Counter

    uni, bi, tri = Counter(), Counter(), Counter()
    total = 0
    for t in train_texts:
        toks = [BOS, BOS] + t.split() + [EOS]
        total += len([x for x in toks if x not in (BOS, EOS)])
        # unigram total excludes padding but the count tables include it
        for i, w in enumerate(toks):
            uni[w] += 1
            if i + 1 < len(toks):
                bi[(toks[i], toks[i + 1])] += 1
            if i + 2 < len(toks):
                tri[(toks[i], toks[i + 1], toks[i + 2])] += 1
    out = []
    for t in score_texts:
        toks = [BOS, BOS] + t.split() + [EOS]
        lps = []
        for i in range(len(toks) - 2):
            a, b, w = toks[i], toks[i + 1], toks[i + 2]
            if (a, b, w) in tri and (a, b) in bi:
                s = tri[(a, b, w)] / bi[(a, b)]
            elif (b, w) in bi and b in uni:
                s = backoff * bi[(b, w)] / uni[b]
            elif w in uni:
                s = backoff * backoff * uni[w] / total
            else:
                s = backoff * backoff * unk_alpha / total
            lps.append(math.log(s))
        out.append(sum(lps) / len(lps))
    return out


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_scores_match_python_reference(spark):
    train = ["the cat sat", "the cat ran", "a dog sat", "the dog sat here"]
    df = _df(spark, train)
    lm = train_ngram_lm(df)
    got = {
        r["doc_id"]: r["avg_logprob"]
        for r in score_perplexity(df, lm).collect()
    }
    want = _ref_scores(train, train)
    for i, w in enumerate(want):
        assert abs(got[i] - w) < 1e-9, (i, got[i], w)


def test_fluent_beats_scrambled(spark):
    """The model must assign lower perplexity to text matching its
    training distribution than to scrambled/OOV text."""
    train = ["the cat sat on the mat"] * 5 + ["the dog ran to the cat"] * 5
    lm = train_ngram_lm(_df(spark, train))
    probe = _df(spark, ["the cat sat on the mat", "mat zzz cat qqq the xyzzy"])
    rows = {r["doc_id"]: r["perplexity"] for r in score_perplexity(probe, lm).collect()}
    assert rows[0] < rows[1]


def test_perplexity_filter_keeps_in_distribution_docs(spark):
    train = ["alpha beta gamma delta"] * 6
    lm = train_ngram_lm(_df(spark, train))
    docs = _df(spark, ["alpha beta gamma delta", "zz yy xx ww vv uu"])
    kept = perplexity_filter(docs, lm, max_perplexity=5.0)
    assert [r["doc_id"] for r in kept.collect()] == [0]


def test_empty_doc_scores_eos_only(spark):
    lm = train_ngram_lm(_df(spark, ["a b", ""]))
    rows = {r["doc_id"]: r for r in
            score_perplexity(_df(spark, ["", None]), lm).collect()}
    assert rows[0]["n_scored"] == 1 and rows[1]["n_scored"] == 1


@pytest.mark.parametrize("sf", [SF, SF_SMALL])
def test_matches_duckdb_oracle(spark, sf):
    q = EXTENDED_REGISTRY["documents_lm_perplexity"]
    ok, msg = compare_query(spark, sf, q.fn, q.oracle)
    assert ok, msg


def test_scoring_plan_stays_jvm_side(spark):
    from iot_sensor_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents")
    lm = train_ngram_lm(docs)
    plan = (
        score_perplexity(docs, lm)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_scoring_is_single_lookup_join(spark):
    """Scoring must probe the count tables through ONE join against
    the order-tagged union (five sequential left joins would shuffle
    the O(corpus tokens) position relation five times): exactly one
    non-broadcast join in the plan, and the position relation crosses
    an exchange at most twice (lookup join + per-position pivot)
    before the per-document aggregate."""
    import re

    from iot_sensor_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents")
    lm = train_ngram_lm(docs)
    plan = (
        score_perplexity(docs, lm)
        ._jdf.queryExecution().executedPlan().toString()
    )
    shuffled_joins = len(re.findall(r"SortMergeJoin|ShuffledHashJoin", plan))
    assert shuffled_joins <= 1, plan
    # exchanges: 3 count-table aggs + 1 total agg feed the union /
    # broadcast; the position side contributes the lookup-join
    # exchange, the pivot exchange, and the final doc agg — pin the
    # ceiling so a regression back to sequential joins (4 extra
    # position-relation exchanges) fails loudly
    assert plan.count("Exchange hashpartitioning") <= 8, plan
