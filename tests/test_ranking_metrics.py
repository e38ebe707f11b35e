"""ranking_metrics_report (operators/ranking.py): hand-computed
goldens, undefined-metric NULL semantics, guard; the full DuckDB
differential runs via the extended registry (embeddings_ranking_metrics,
tests/test_tpch_full.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from iot_sensor_data_pipeline_spark.operators.ranking import ranking_metrics_report


def _fixture(spark):
    # q1: relevant items 10, 11, 12 (3 total); top-3 ranking hits 11
    #     at rank 2 and 10 at rank 3 -> rr=1/2, p@3=2/3, recall=2/3
    # q2: no relevant items at all -> rr=0, p=0, recall/ndcg NULL
    # q3: graded relevance (2.0 beats 1.0) with the 1.0 ranked first
    results = spark.createDataFrame(
        [
            (1, 99, 1), (1, 11, 2), (1, 10, 3),
            (2, 50, 1), (2, 51, 2), (2, 52, 3),
            (3, 30, 1), (3, 31, 2), (3, 98, 3),
        ],
        "qid long, nid long, rn int",
    )
    relevance = spark.createDataFrame(
        [
            (1, 10, 1.0), (1, 11, 1.0), (1, 12, 1.0),
            (3, 30, 1.0), (3, 31, 2.0),
        ],
        "qid long, nid long, rel double",
    )
    return results, relevance


def test_golden_metrics(spark):
    results, relevance = _fixture(spark)
    rep = {r.qid: r for r in ranking_metrics_report(results, relevance, k=3).collect()}

    r1 = rep[1]
    assert r1.rr == 0.5
    assert r1.precision_at_k == round(2 / 3, 6)
    assert r1.recall_at_k == round(2 / 3, 6)
    # dcg = 1/log2(3) + 1/log2(4); idcg = 1/log2(2) + 1/log2(3) + 1/log2(4)
    dcg = 1 / math.log2(3) + 1 / math.log2(4)
    idcg = 1.0 + 1 / math.log2(3) + 1 / math.log2(4)
    assert r1.ndcg_at_k == pytest.approx(dcg / idcg, abs=1e-6)

    r2 = rep[2]
    assert r2.rr == 0.0 and r2.precision_at_k == 0.0
    assert r2.recall_at_k is None and r2.ndcg_at_k is None

    r3 = rep[3]
    assert r3.rr == 1.0 and r3.recall_at_k == 1.0
    # got: 1.0@1 + 2.0@2; ideal: 2.0@1 + 1.0@2
    dcg3 = 1.0 / math.log2(2) + 2.0 / math.log2(3)
    idcg3 = 2.0 / math.log2(2) + 1.0 / math.log2(3)
    assert r3.ndcg_at_k == pytest.approx(dcg3 / idcg3, abs=1e-6)


def test_k_truncation_and_total_recall_denominator(spark):
    results, relevance = _fixture(spark)
    # k=2 drops q1's rank-3 hit: p@2=1/2, recall 1/3; ideal also
    # truncates at 2 of 3 relevant
    rep = {r.qid: r for r in ranking_metrics_report(results, relevance, k=2).collect()}
    assert rep[1].precision_at_k == 0.5
    assert rep[1].recall_at_k == round(1 / 3, 6)

    with pytest.raises(ValueError, match="k must be"):
        ranking_metrics_report(results, relevance, k=0)


def test_every_result_query_reports_even_without_judgments(spark):
    results, relevance = _fixture(spark)
    rep = ranking_metrics_report(results, relevance, k=3)
    assert sorted(r.qid for r in rep.collect()) == [1, 2, 3]
    # nonpositive grades are ignored, not treated as relevant
    rel2 = relevance.union(
        relevance.sparkSession.createDataFrame(
            [(2, 50, 0.0)], "qid long, nid long, rel double"
        )
    )
    rep2 = {r.qid: r for r in ranking_metrics_report(results, rel2, k=3).collect()}
    assert rep2[2].rr == 0.0 and rep2[2].recall_at_k is None


def test_duplicate_judgments_collapse_to_max_grade(spark):
    """Duplicate (query, item) judgment rows (multiple raters) must not
    multiply the join — hits/precision/DCG/n_rel count ITEMS."""
    results, relevance = _fixture(spark)
    dup = relevance.union(relevance).union(
        spark.createDataFrame(
            # a second, lower grade for an already-judged pair
            [(1, 10, 1.0)], "qid long, nid long, rel double"
        )
    )
    base = {r.qid: r.asDict() for r in ranking_metrics_report(results, relevance, k=3).collect()}
    dedup = {r.qid: r.asDict() for r in ranking_metrics_report(results, dup, k=3).collect()}
    assert base == dedup


# ---------------------------------------------------------------------------
# binary_classification_report (r11): tie-aware AUC + Brier + ECE
# ---------------------------------------------------------------------------


def _bcr(spark, rows):
    from iot_sensor_data_pipeline_spark.operators.ranking import (
        binary_classification_report,
    )

    df = spark.createDataFrame(rows, "g string, s double, y int")
    return {
        r.g: r
        for r in binary_classification_report(df, "s", "y", by=["g"]).collect()
    }


def test_bcr_hand_computed_with_ties(spark):
    """Group 'a': ranks 1, {2,3}->2.5 tied, 4; pos ranks 2.5+4=6.5 ->
    AUC (6.5-3)/4 = 0.875. Brier and 10-bin ECE hand-checked."""
    got = _bcr(spark, [
        ("a", 0.1, 0), ("a", 0.2, 0), ("a", 0.2, 1), ("a", 0.8, 1),
    ])["a"]
    assert got.n == 4 and got.n_pos == 2
    assert got.auc == 0.875
    assert got.brier == round(0.73 / 4, 6)
    assert got.ece == round((0.1 + 0.6 + 0.2) / 4, 6)


def test_bcr_perfect_and_inverted_separation(spark):
    got = _bcr(spark, [
        ("c", 0.1, 0), ("c", 0.9, 1),
        ("d", 0.9, 0), ("d", 0.1, 1),
    ])
    assert got["c"].auc == 1.0
    assert got["d"].auc == 0.0


def test_bcr_single_class_auc_is_null_not_half(spark):
    """No negatives -> no ranking question; AUC must be NULL (the
    ranking_metrics NULL discipline), while brier/ece still report."""
    got = _bcr(spark, [("b", 0.3, 1), ("b", 0.7, 1)])["b"]
    assert got.auc is None
    assert got.brier == round((0.49 + 0.09) / 2, 6)
    assert got.ece == 0.5


def test_bcr_score_one_folds_into_last_bin(spark):
    """score == 1.0 must land in bin 9 of 10 (closed top), not a
    phantom bin 10."""
    got = _bcr(spark, [("e", 1.0, 1), ("e", 0.0, 0)])["e"]
    assert got.auc == 1.0 and got.ece == 0.0 and got.brier == 0.0


def test_bcr_validation_raises(spark):
    """Action-time inline validation (raise_error on the projection —
    the apply_cdc discipline): every bad row class raises with the
    offending values in the message; no eager validation job."""
    import pytest as _pytest

    from iot_sensor_data_pipeline_spark.operators.ranking import (
        binary_classification_report,
    )

    for rows in (
        [("a", 1.5, 0)],            # score out of range
        [("a", 0.5, 2)],            # non-binary label
        [("a", None, 1)],           # NULL score
        [("a", 0.5, None)],         # NULL label
    ):
        df = spark.createDataFrame(rows, "g string, s double, y int")
        with _pytest.raises(Exception, match="binary_classification_report"):
            binary_classification_report(df, "s", "y", by=["g"]).collect()
    with _pytest.raises(ValueError, match="by must be non-empty"):
        binary_classification_report(
            spark.createDataFrame([("a", 0.5, 1)], "g string, s double, y int"),
            "s", "y", by=[],
        )
