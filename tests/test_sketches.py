"""Mergeable HLL distinct sketches (operators/sketches.py): accuracy,
merge==rebuild equivalence, append-only incremental refresh, and
idempotence under re-added values."""

from __future__ import annotations

from pyspark.sql import functions as F

from iot_sensor_data_pipeline_spark.operators.sketches import (
    distinct_sketches,
    merge_distinct_counts,
)


def _data(spark, days=4, per_day=5000, overlap=1000):
    """Each day shares `overlap` users with the previous day."""
    rows = []
    for d in range(days):
        base = d * (per_day - overlap)
        rows.extend((f"d{d}", base + i) for i in range(per_day))
    return spark.createDataFrame(rows, "day string, user_id long")


def test_estimate_within_hll_error_bound(spark):
    df = _data(spark)
    true = df.select("user_id").distinct().count()
    est = merge_distinct_counts(
        distinct_sketches(df, ["day"], "user_id", lg_k=12)
    ).collect()[0].approx_distinct
    assert abs(est - true) / true < 0.05  # lg_k=12 -> ~1.6% typical


def test_union_of_partition_sketches_equals_global_sketch(spark):
    """Merging per-day sketches must give the SAME estimate as one
    sketch built over all days — the mergeability contract that makes
    persisted sketch tables trustworthy."""
    df = _data(spark)
    merged = merge_distinct_counts(
        distinct_sketches(df, ["day"], "user_id")
    ).collect()[0].approx_distinct
    direct = df.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(12))).alias("e")
    ).collect()[0].e
    assert merged == direct


def test_incremental_append_equals_recompute(spark):
    """The 100 TB point: yesterday's sketch rows + today's NEW sketch
    row answer the all-time question without rescanning history."""
    df = _data(spark, days=4)
    old = distinct_sketches(df.where(F.col("day") != "d3"), ["day"], "user_id")
    new_day = distinct_sketches(df.where(F.col("day") == "d3"), ["day"], "user_id")
    incremental = merge_distinct_counts(old.unionByName(new_day)).collect()[0].approx_distinct
    recomputed = merge_distinct_counts(
        distinct_sketches(df, ["day"], "user_id")
    ).collect()[0].approx_distinct
    assert incremental == recomputed


def test_reprocessed_day_does_not_inflate(spark):
    """Re-appending a replayed day's sketch (at-least-once pipelines)
    cannot raise the estimate: union is idempotent over identical
    value sets."""
    df = _data(spark, days=3)
    sk = distinct_sketches(df, ["day"], "user_id")
    replay = sk.where(F.col("day") == "d1")
    once = merge_distinct_counts(sk).collect()[0].approx_distinct
    twice = merge_distinct_counts(sk.unionByName(replay)).collect()[0].approx_distinct
    assert twice == once


def test_rollup_grains_from_same_sketches(spark):
    """Any grouping coarser than the build partitioning is answerable
    from the stored sketches: per-day counts and the global count from
    ONE relation."""
    df = _data(spark, days=3)
    sk = distinct_sketches(df, ["day"], "user_id")
    per_day = {r.day: r.approx_distinct for r in merge_distinct_counts(sk, ["day"]).collect()}
    assert set(per_day) == {"d0", "d1", "d2"}
    for day, est in per_day.items():
        true = df.where(F.col("day") == day).select("user_id").distinct().count()
        assert abs(est - true) / true < 0.05


# ---------------------------------------------------------------------------
# heavy_hitters (Misra-Gries candidates + exact recount)
# ---------------------------------------------------------------------------


def test_heavy_hitters_guarantee_and_exact_counts(spark):
    """Every item with true count > n/k is returned, with its EXACT
    count — checked against a full groupBy on a skewed corpus."""
    import random

    from iot_sensor_data_pipeline_spark.operators.sketches import heavy_hitters

    rnd = random.Random(9)
    rows = []
    for _ in range(20_000):
        r = rnd.random()
        if r < 0.3:
            rows.append(("popular-0",))
        elif r < 0.45:
            rows.append(("popular-1",))
        elif r < 0.55:
            rows.append(("popular-2",))
        else:
            rows.append((f"tail-{rnd.randrange(5000)}",))
    df = spark.createDataFrame(rows, "item string").repartition(16)
    k = 50
    got = {r.item: r.n for r in heavy_hitters(df, "item", k_counters=k).collect()}
    exact = {
        r.item: r.n
        for r in df.groupBy("item").agg(__import__("pyspark.sql.functions", fromlist=["F"]).count("*").alias("n")).collect()
    }
    n = sum(exact.values())
    for item, cnt in exact.items():
        if cnt > n / k:
            assert got.get(item) == cnt, (item, cnt, got.get(item))


def test_heavy_hitters_min_count_and_nulls(spark):
    from pyspark.sql import functions as F

    from iot_sensor_data_pipeline_spark.operators.sketches import heavy_hitters

    rows = [("a",)] * 10 + [("b",)] * 3 + [(None,)] * 5
    df = spark.createDataFrame(rows, "item string")
    got = {r.item: r.n for r in heavy_hitters(df, "item", k_counters=4, min_count=5).collect()}
    assert got.get("a") == 10
    assert "b" not in got  # below min_count
    assert None not in got  # nulls ignored


def test_heavy_hitters_candidate_volume_is_bounded(spark):
    """The summary relation ships at most partitions x k rows — the
    whole point vs a full distinct-item shuffle."""
    from iot_sensor_data_pipeline_spark.operators.sketches import heavy_hitters

    df = (
        spark.range(50_000)
        .selectExpr("concat('u-', id) AS item")  # all unique: worst case
        .repartition(8)
    )
    out = heavy_hitters(df, "item", k_counters=20, min_count=2)
    # no item repeats, so nothing passes min_count — and the pipeline
    # never shuffled 50k distinct keys to find that out
    assert out.count() == 0


def test_heavy_hitters_numeric_column_with_nulls(spark):
    """Nullable numeric columns: nulls must not corrupt counter state
    (NaN coercion) and heavy numeric items keep exact counts."""
    from iot_sensor_data_pipeline_spark.operators.sketches import heavy_hitters

    rows = [(7,)] * 50 + [(None,)] * 30 + [(i,) for i in range(40)]
    df = spark.createDataFrame(rows, "item bigint").repartition(4)
    got = {r.item: r.n for r in heavy_hitters(df, "item", k_counters=10).collect()}
    assert got.get(7) == 51  # 50 planted + one from range(40)
    assert None not in got


# ---------------------------------------------------------------------------
# partial_aggregates / merge_aggregates (continuous-aggregate algebra)
# ---------------------------------------------------------------------------


def test_merged_partials_equal_direct_aggregate(spark):
    import math
    import random

    from iot_sensor_data_pipeline_spark.operators.sketches import (
        merge_aggregates,
        partial_aggregates,
    )

    rnd = random.Random(17)
    rows = [(f"d{i % 5}", f"s{i % 3}", rnd.gauss(10, 4)) for i in range(9000)]
    df = spark.createDataFrame(rows, "day string, source string, v double")
    partials = partial_aggregates(df, ["day", "source"], "v")  # 15 rows
    # merged at a COARSER grain (per source) vs direct aggregation
    merged = {r.source: r for r in merge_aggregates(partials, ["source"]).collect()}
    direct = {
        r.source: r
        for r in df.groupBy("source")
        .agg(
            F.sum("v").alias("s"),
            F.count("v").alias("n"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
            F.avg("v").alias("m"),
            F.stddev_pop("v").alias("sd"),
        )
        .collect()
    }
    for src, d in direct.items():
        m = merged[src]
        assert m.n_v == d.n and m.min_v == d.lo and m.max_v == d.hi
        assert math.isclose(m.sum_v, d.s, rel_tol=1e-9)
        assert math.isclose(m.avg_v, d.m, rel_tol=1e-9)
        assert math.isclose(m.stddev_pop_v, d.sd, rel_tol=1e-6)


def test_incremental_partial_append_equals_recompute(spark):
    """Yesterday's partial rows + today's new partial row answer the
    all-time aggregate without rescanning history — and the answer is
    IDENTICAL to a full recompute."""
    from iot_sensor_data_pipeline_spark.operators.sketches import (
        merge_aggregates,
        partial_aggregates,
    )

    rows = [(f"d{i % 4}", float(i % 97)) for i in range(4000)]
    df = spark.createDataFrame(rows, "day string, v double")
    old = partial_aggregates(df.where(F.col("day") != "d3"), ["day"], "v")
    new = partial_aggregates(df.where(F.col("day") == "d3"), ["day"], "v")
    inc = merge_aggregates(old.unionByName(new)).collect()[0]
    full = merge_aggregates(partial_aggregates(df, ["day"], "v")).collect()[0]
    assert inc == full


# ---------------------------------------------------------------------------
# profile_columns
# ---------------------------------------------------------------------------


def test_profile_columns_one_pass_exactness(spark):
    from iot_sensor_data_pipeline_spark.operators.sketches import profile_columns

    rows = [(1, "a", 1.5), (2, None, 2.5), (3, "c", None), (4, "a", 0.5)]
    df = spark.createDataFrame(rows, "id long, s string, v double")
    prof = {r.column: r for r in profile_columns(df).collect()}
    assert set(prof) == {"id", "s", "v"}
    assert prof["s"].n_rows == 4 and prof["s"].n_null == 1
    assert prof["s"].null_frac == 0.25
    assert prof["id"].min_str == "1" and prof["id"].max_str == "4"
    assert prof["v"].min_str == "0.5" and prof["v"].max_str == "2.5"
    assert prof["id"].approx_distinct == 4  # HLL exact at tiny cardinality
    assert prof["s"].approx_distinct == 2


def test_profile_columns_single_job_plan(spark, sf_dir_mid):
    """All columns' stats come from ONE aggregation — one scan, not a
    scan per column."""
    from iot_sensor_data_pipeline_spark.operators.sketches import profile_columns

    from iot_sensor_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir_mid, "documents")
    prof = profile_columns(docs)
    plan = prof._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") <= 1
    out = {r.column: r for r in prof.collect()}
    # approx_count_distinct default rsd ~5%: 500 true distinct
    assert out["doc_id"].n_rows == 500
    assert abs(out["doc_id"].approx_distinct - 500) <= 50


def test_profile_columns_skips_complex_types(spark):
    import pytest as _pytest

    from iot_sensor_data_pipeline_spark.operators.sketches import profile_columns

    df = spark.createDataFrame([(1, [1, 2])], "id long, arr array<int>")
    assert [r.column for r in profile_columns(df).collect()] == ["id"]
    with _pytest.raises(ValueError, match="no profilable"):
        profile_columns(df.select("arr"))


def test_merge_aggregates_all_null_group_reports_null_stats(spark):
    """A group whose partials saw only NULL values (n_v = 0) must
    report NULL avg AND NULL stddev — greatest(NULL, 0.0) = 0.0 used
    to leak a definite zero spread for a group with no data."""
    from iot_sensor_data_pipeline_spark.operators.sketches import (
        merge_aggregates,
        partial_aggregates,
    )

    rows = [("a", 1.0), ("a", 3.0), ("b", None), ("b", None)]
    df = spark.createDataFrame(rows, "g string, v double")
    partials = partial_aggregates(df, ["g"], "v")
    merged = {r.g: r for r in merge_aggregates(partials, ["g"]).collect()}
    assert merged["a"].n_v == 2 and merged["a"].avg_v == 2.0
    b = merged["b"]
    assert b.n_v == 0
    assert b.avg_v is None and b.stddev_pop_v is None and b.sum_v is None


def test_profile_columns_empty_table_does_not_crash(spark):
    """ANSI mode throws DIVIDE_BY_ZERO on n_rows = 0 unless null_frac
    is try_divide-guarded — profiling a zero-row landing must work."""
    from iot_sensor_data_pipeline_spark.operators.sketches import profile_columns

    df = spark.createDataFrame([], "a int, b string")
    prof = {r.column: r for r in profile_columns(df).collect()}
    assert set(prof) == {"a", "b"}
    assert prof["a"].n_rows == 0 and prof["a"].n_null == 0
    assert prof["a"].null_frac is None  # no rows -> no fraction, not a crash
    assert prof["a"].min_str is None and prof["a"].approx_distinct == 0


def test_profile_columns_wide_table_chunks(spark):
    """Above max_cols_per_scan the aggregation chunks: a 120-column
    frame at max_cols_per_scan=50 profiles correctly in ceil(120/50)=3
    scans — never one job per column, never one 480-aggregate
    projection."""
    from pyspark.sql import functions as F

    from iot_sensor_data_pipeline_spark.operators.sketches import profile_columns

    n_cols = 120
    base = spark.range(200)
    df = base.select(
        *[
            F.when(F.col("id") % (i + 2) != 0, F.col("id") + i).alias(f"c{i}")
            for i in range(n_cols)
        ]
    )
    prof = {r.column: r for r in profile_columns(df, max_cols_per_scan=50).collect()}
    assert len(prof) == n_cols
    for i in (0, 49, 50, 99, 100, 119):  # chunk seams
        r = prof[f"c{i}"]
        assert r.n_rows == 200
        exp_null = sum(1 for x in range(200) if x % (i + 2) == 0)
        assert r.n_null == exp_null, (i, r.n_null, exp_null)
        assert r.null_frac == round(exp_null / 200, 6)
        assert r.min_str is not None


# ---------------------------------------------------------------------------
# histogram_partials / merge_histogram_quantiles (mergeable quantiles)
# ---------------------------------------------------------------------------


def test_histogram_quantiles_accuracy_vs_exact(spark):
    """Quantiles estimated from merged histogram rows land within ~one
    bin of rank of the exact percentiles."""
    import random

    from iot_sensor_data_pipeline_spark.operators.sketches import (
        histogram_bins,
        histogram_partials,
        merge_histogram_quantiles,
    )

    rnd = random.Random(11)
    vals = sorted(rnd.lognormvariate(0, 1.2) for _ in range(20000))  # skewed
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    bins = histogram_bins(df, "v", n_bins=128)
    partials = histogram_partials(df, [], "v", bins)
    got = merge_histogram_quantiles(partials, [0.1, 0.5, 0.9, 0.99]).collect()[0]
    assert got.n == 20000
    for q, col in [(0.1, "q_0_1"), (0.5, "q_0_5"), (0.9, "q_0_9"), (0.99, "q_0_99")]:
        est = got[col]
        # rank of the estimate in the exact sorted data
        import bisect

        r = bisect.bisect_right(vals, est) / len(vals)
        assert abs(r - q) <= 2.5 / 128, (q, est, r)


def test_histogram_partials_append_equals_recompute(spark):
    """Yesterday's histogram rows + today's new rows answer the same
    quantiles as a full rebuild — the continuous-aggregate property
    (identical, not just close: same bins, counts add exactly)."""
    from pyspark.sql import functions as F

    from iot_sensor_data_pipeline_spark.operators.sketches import (
        histogram_bins,
        histogram_partials,
        merge_histogram_quantiles,
    )

    df = spark.range(10000).select((F.hash("id") % 1000).cast("double").alias("v"),
                                   (F.col("id") % 4).alias("day"))
    bins = histogram_bins(df, "v", n_bins=64)
    old = histogram_partials(df.where(F.col("day") != 3), ["day"], "v", bins)
    new = histogram_partials(df.where(F.col("day") == 3), ["day"], "v", bins)
    inc = merge_histogram_quantiles(old.unionByName(new), [0.25, 0.75]).collect()[0]
    full = merge_histogram_quantiles(
        histogram_partials(df, ["day"], "v", bins), [0.25, 0.75]
    ).collect()[0]
    assert inc == full


def test_histogram_quantiles_grouped_and_null_excluded(spark):
    from pyspark.sql import functions as F

    from iot_sensor_data_pipeline_spark.operators.sketches import (
        histogram_partials,
        merge_histogram_quantiles,
    )

    rows = [("a", float(i)) for i in range(100)] + [("b", float(i * 10)) for i in range(100)]
    rows += [("a", None)] * 5  # nulls never counted
    df = spark.createDataFrame(rows, "g string, v double")
    bins = [float(x) for x in range(10, 1000, 10)]
    partials = histogram_partials(df, ["g"], "v", bins)
    out = {r.g: r for r in merge_histogram_quantiles(partials, [0.5], ["g"]).collect()}
    assert out["a"].n == 100 and out["b"].n == 100
    assert abs(out["a"].q_0_5 - 50) <= 2
    assert abs(out["b"].q_0_5 - 500) <= 20  # same rank, 10x scale


def test_histogram_quantiles_validates_qs(spark):
    import pytest as _pytest

    from iot_sensor_data_pipeline_spark.operators.sketches import (
        merge_histogram_quantiles,
    )

    df = spark.createDataFrame([(0, 1, 0.0, 1.0)], "bin int, n long, lo double, hi double")
    with _pytest.raises(ValueError, match="qs must be"):
        merge_histogram_quantiles(df, [1.5])


def test_grouped_quantiles_exact_goldens_and_guards(spark):
    import pytest

    from iot_sensor_data_pipeline_spark.operators.sketches import (
        grouped_quantiles_exact,
    )

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),
         ("b", 10.0),                       # singleton group
         ("c", 5.0), ("c", None)],          # NULL excluded (ANSI)
        "g string, v double",
    )
    out = {
        (r.g, r.q): r.value
        for r in grouped_quantiles_exact(df, ["g"], "v", [0.0, 0.5, 1.0]).collect()
    }
    # a: pos(0.5) = 1 + .5*3 = 2.5 -> 2 + .5*(3-2) = 2.5
    assert out[("a", 0.0)] == 1.0 and out[("a", 1.0)] == 4.0
    assert out[("a", 0.5)] == 2.5
    assert out[("b", 0.0)] == out[("b", 0.5)] == out[("b", 1.0)] == 10.0
    assert out[("c", 0.5)] == 5.0  # the NULL never participates

    with pytest.raises(ValueError, match="non-empty"):
        grouped_quantiles_exact(df, ["g"], "v", [])
    with pytest.raises(ValueError, match="in \\[0, 1\\]"):
        grouped_quantiles_exact(df, ["g"], "v", [1.5])


def test_grouped_quantiles_no_single_partition_window(spark, sf_dir_mid):
    from iot_sensor_data_pipeline_spark.operators.sketches import (
        grouped_quantiles_exact,
    )
    from iot_sensor_data_pipeline_spark.sources.tables import load_table

    li = load_table(spark, sf_dir_mid, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    plan = (
        grouped_quantiles_exact(li, ["l_returnflag"], "l_extendedprice", [0.5])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange SinglePartition" not in plan


def test_grouped_quantiles_exact_null_group_key(spark):
    """A NULL group key is a real GROUP BY group; the rank join must be
    null-safe or the group silently vanishes."""
    from iot_sensor_data_pipeline_spark.operators.sketches import (
        grouped_quantiles_exact,
    )

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), (None, 10.0), (None, 30.0)],
        "g string, v double",
    )
    out = {
        (r.g, r.q): r.value
        for r in grouped_quantiles_exact(df, ["g"], "v", [0.5]).collect()
    }
    assert out == {("a", 0.5): 2.0, (None, 0.5): 20.0}


# ---------------------------------------------------------------------------
# grouped_robust_stats / robust_outliers (r11)
# ---------------------------------------------------------------------------


def test_robust_stats_hand_computed(spark):
    from iot_sensor_data_pipeline_spark.operators.sketches import (
        grouped_robust_stats,
    )

    df = spark.createDataFrame(
        [("g", v) for v in (1.0, 2.0, 3.0, 4.0, 100.0)]
        + [("h", 5.0), ("h", None)],
        "k string, v double",
    )
    got = {r.k: r for r in grouped_robust_stats(df, ["k"], "v").collect()}
    g = got["g"]
    assert (g.n, g.median, g.q1, g.q3, g.iqr, g.mad) == (5, 3.0, 2.0, 4.0, 2.0, 1.0)
    h = got["h"]  # NULL excluded; singleton group well-defined
    assert (h.n, h.median, h.mad, h.iqr) == (1, 5.0, 0.0, 0.0)


def test_robust_outliers_flags_and_zero_mad_guard(spark):
    from iot_sensor_data_pipeline_spark.operators.sketches import (
        robust_outliers,
    )

    df = spark.createDataFrame(
        [("g", v) for v in (1.0, 2.0, 3.0, 4.0, 100.0)]
        # zero-MAD group: over half identical -> no defined scale, the
        # deviant row must NOT be flagged (documented)
        + [("z", 5.0), ("z", 5.0), ("z", 5.0), ("z", 9.0)],
        "k string, v double",
    )
    out = robust_outliers(df, ["k"], "v").collect()
    assert [(r.k, r.v) for r in out] == [("g", 100.0)]
    assert out[0].robust_z == round(0.6745 * 97 / 1.0, 6)
    # the outlier's own magnitude did not drag the baseline: 4.0 is
    # well inside (a mean/std z-score would have been diluted instead)
    assert all(r.v != 4.0 for r in out)


def test_robust_outliers_survives_median_mad_input_columns(spark):
    """ADVICE r11: a caller whose frame already carries 'median'/'mad'
    columns must join cleanly (stats ride in under reserved __rs_*
    names); only a 'robust_z' input column raises."""
    import pytest

    from iot_sensor_data_pipeline_spark.operators.sketches import (
        robust_outliers,
    )

    df = spark.createDataFrame(
        [("g", v, 0.0, 0.0) for v in (1.0, 2.0, 3.0, 4.0, 100.0)],
        "k string, v double, median double, mad double",
    )
    out = robust_outliers(df, ["k"], "v").collect()
    assert [(r.k, r.v) for r in out] == [("g", 100.0)]
    # the caller's own columns survive untouched
    assert out[0].median == 0.0 and out[0].mad == 0.0

    clash = df.withColumnRenamed("median", "robust_z")
    with pytest.raises(ValueError, match="robust_z"):
        robust_outliers(clash, ["k"], "v")
