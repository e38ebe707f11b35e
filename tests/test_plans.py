"""Physical-plan shape assertions: the scale properties SCALE.md
promises must be visible in the executed plans, not just intended."""

from __future__ import annotations

import pytest

from iot_sensor_data_pipeline_spark.plans import REGISTRY

SF = "/root/testdata/sf0.01"


def plan_of(spark, name: str) -> str:
    return REGISTRY[name].fn(spark, SF)._jdf.queryExecution().executedPlan().toString()


def test_q6_filters_reach_the_scan(spark):
    plan = plan_of(spark, "tpch_q6_forecast_revenue")
    assert "PushedFilters:" in plan
    # every predicate pushed: shipdate range, discount range, quantity
    for frag in ("l_shipdate", "l_discount", "l_quantity"):
        assert f"IsNotNull({frag})" in plan or frag in plan.split("PushedFilters")[1][:400]
    # projection pruned to the 4 referenced columns
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_extendedprice" in read_schema and "l_orderkey" not in read_schema


def test_q1_single_exchange(spark):
    plan = plan_of(spark, "tpch_q1_pricing_summary")
    assert plan.count("Exchange") == 1  # partial -> final agg only


def test_q3_take_ordered_no_global_sort(spark):
    plan = plan_of(spark, "tpch_q3_top_orders")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan


def test_topk_per_group_window_group_limit(spark):
    plan = plan_of(spark, "orders_topk_per_customer")
    assert "WindowGroupLimit" in plan  # partitions prune to k pre-window


def test_asof_join_single_exchange(spark):
    plan = plan_of(spark, "events_asof_join")
    assert plan.count("Exchange") == 1  # one shuffle on the equi-key


def test_knn_broadcasts_queries_not_corpus(spark):
    plan = plan_of(spark, "embeddings_knn_brute_force")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_rules_classification_stays_codegen(spark):
    plan = plan_of(spark, "events_alert_rules")
    # the generated CASE chain compiles into the scan-side projection:
    # no exchange, no join, no python evals
    assert plan.count("Exchange") == 0
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_text_features_no_shuffle_no_python(spark):
    plan = plan_of(spark, "documents_text_features")
    assert plan.count("Exchange") == 0
    assert "EvalPython" not in plan
