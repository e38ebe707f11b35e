"""Incrementally-maintained aggregate materialized views
(sources/matview.py): refresh == full recompute after every mutation
kind, min/max dirty-group recompute, key-moving updates, group death
and birth, cursor atomicity with the committed version, feed-gap and
desync loudness, NULL keys/values, coarser-grain reads, and the
partitioned-source path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iot_sensor_data_pipeline_spark.sources.matview import (
    create_agg_view,
    read_agg_partials,
    read_agg_view,
    refresh_agg_view,
)
from iot_sensor_data_pipeline_spark.sources.mutations import (
    delete_where,
    expire_change_feed,
    merge_into,
    update_where,
)


def _mk(spark, path, n=300, files=6):
    df = spark.range(0, n).select(
        F.col("id"),
        F.concat(F.lit("g"), (F.col("id") % 5).cast("string")).alias("grp"),
        F.when(F.col("id") % 11 == 0, None)
        .otherwise((F.col("id") % 97).cast("double") + 0.25)
        .alias("v"),
    )
    df.repartition(files).write.parquet(path)
    return df


def _expected(spark, path, keys=("grp",)):
    """Ground truth: full GROUP BY over the CURRENT table state."""
    t = spark.read.parquet(path)
    v = F.col("v").cast("double")
    return {
        tuple(r[k] for k in keys): (
            r["n_rows"], r["n_v"],
            round(r["sum_v"], 6),
            r["min_v"], r["max_v"],
        )
        for r in t.groupBy(*keys).agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count(v).alias("n_v"),
            F.coalesce(F.sum(v), F.lit(0.0)).alias("sum_v"),
            F.min(v).alias("min_v"),
            F.max(v).alias("max_v"),
        ).collect()
    }


def _mv_state(spark, mv):
    return {
        tuple([r["grp"]]): (
            r["n_rows"], r["n_v"], round(r["sum_v"], 6),
            r["min_v"], r["max_v"],
        )
        for r in read_agg_partials(spark, mv).collect()
    }


def test_refresh_matches_full_recompute_mixed_mutations(spark, tmp_path):
    """DELETE + key-moving UPDATE + MERGE (update/insert arms), one
    refresh applying all feed versions: MV == full GROUP BY rebuild."""
    path, mv = str(tmp_path / "t"), str(tmp_path / "mv")
    _mk(spark, path)
    r = create_agg_view(spark, path, mv, ["grp"], "v")
    assert r["status"] == "created" and r["n_groups"] == 5
    assert r["feed_version"] == 0

    delete_where(
        spark, path, (F.col("grp") == "g1") & (F.col("v") < 40),
        change_feed=True,
    )
    # key move: rows leave g2 for g9 (pre-image subtracts, post adds)
    update_where(
        spark, path, F.col("id") % 10 == 2,
        {"grp": F.lit("g9"), "v": F.col("v") + 1000.0},
        change_feed=True,
    )
    src = spark.range(0, 20).select(
        (F.col("id") + 10_000).alias("id"),
        F.lit("gNEW").alias("grp"),
        (F.col("id") * 1.5).alias("v"),
    )
    merge_into(spark, path, src, on=["id"], change_feed=True)

    r = refresh_agg_view(spark, path, mv)
    assert r["status"] == "refreshed"
    assert r["applied_versions"] == [1, 2, 3]
    assert _mv_state(spark, mv) == _expected(spark, path)
    # derived stats agree with a direct aggregate
    direct = {
        r2["grp"]: (round(r2["avg"], 9), round(r2["sd"], 9))
        for r2 in spark.read.parquet(path).groupBy("grp").agg(
            F.avg("v").alias("avg"), F.stddev_pop("v").alias("sd")
        ).collect()
    }
    got = {
        r2["grp"]: (
            round(r2["avg_v"], 9) if r2["avg_v"] is not None else None,
            round(r2["stddev_pop_v"], 9)
            if r2["stddev_pop_v"] is not None else None,
        )
        for r2 in read_agg_view(spark, mv).collect()
    }
    for k, (avg, sd) in direct.items():
        assert got[k][0] == pytest.approx(avg, abs=1e-6)
        assert got[k][1] == pytest.approx(sd, abs=1e-6)


def test_min_max_dirty_recompute_on_extreme_delete(spark, tmp_path):
    """Deleting a group's exact minimum forces the recompute path and
    the refreshed min is the true new minimum (not the stale one)."""
    path, mv = str(tmp_path / "t"), str(tmp_path / "mv")
    _mk(spark, path)
    create_agg_view(spark, path, mv, ["grp"], "v")
    g0_min = (
        spark.read.parquet(path).where("grp = 'g0'")
        .agg(F.min("v")).first()[0]
    )
    delete_where(
        spark, path,
        (F.col("grp") == "g0") & (F.col("v") == g0_min),
        change_feed=True,
    )
    r = refresh_agg_view(spark, path, mv)
    assert r["n_dirty_recomputed"] >= 1
    assert _mv_state(spark, mv) == _expected(spark, path)


def test_interior_delete_skips_recompute(spark, tmp_path):
    """A removal strictly inside a group's extremes stays on the pure
    incremental path (n_dirty_recomputed == 0) and is still exact."""
    path, mv = str(tmp_path / "t"), str(tmp_path / "mv")
    _mk(spark, path)
    create_agg_view(spark, path, mv, ["grp"], "v")
    # v in (40, 60): strictly inside every group's (0.25, 96.25) range
    delete_where(
        spark, path,
        (F.col("v") > 40) & (F.col("v") < 60), change_feed=True,
    )
    r = refresh_agg_view(spark, path, mv)
    assert r["n_dirty_recomputed"] == 0
    assert _mv_state(spark, mv) == _expected(spark, path)


def test_group_death_and_birth(spark, tmp_path):
    """A group whose every row is deleted leaves the MV; a later insert
    into a brand-new group enters it."""
    path, mv = str(tmp_path / "t"), str(tmp_path / "mv")
    _mk(spark, path)
    create_agg_view(spark, path, mv, ["grp"], "v")
    delete_where(spark, path, F.col("grp") == "g3", change_feed=True)
    refresh_agg_view(spark, path, mv)
    state = _mv_state(spark, mv)
    assert ("g3",) not in state
    assert state == _expected(spark, path)

    src = spark.range(0, 5).select(
        (F.col("id") + 50_000).alias("id"),
        F.lit("gBORN").alias("grp"),
        F.lit(7.0).alias("v"),
    )
    merge_into(spark, path, src, on=["id"], change_feed=True)
    refresh_agg_view(spark, path, mv)
    state = _mv_state(spark, mv)
    assert state[("gBORN",)][0] == 5
    assert state == _expected(spark, path)


def test_insert_then_delete_same_window(spark, tmp_path):
    """Rows inserted and then deleted across feed versions applied in
    ONE refresh cancel exactly — including the case where the deleted
    value was the would-be new minimum (ins/rm interplay)."""
    path, mv = str(tmp_path / "t"), str(tmp_path / "mv")
    _mk(spark, path)
    create_agg_view(spark, path, mv, ["grp"], "v")
    src = spark.range(0, 3).select(
        (F.col("id") + 70_000).alias("id"),
        F.lit("g0").alias("grp"),
        F.lit(-500.0).alias("v"),  # far below g0's current min
    )
    merge_into(spark, path, src, on=["id"], change_feed=True)
    delete_where(spark, path, F.col("v") < -100, change_feed=True)
    refresh_agg_view(spark, path, mv)
    assert _mv_state(spark, mv) == _expected(spark, path)


def test_null_keys_and_null_values(spark, tmp_path):
    """NULL is a legitimate group key (eqNullSafe merge) and NULL
    values count in n_rows but not n_v/sum/min/max."""
    path, mv = str(tmp_path / "t"), str(tmp_path / "mv")
    df = spark.range(0, 100).select(
        F.col("id"),
        F.when(F.col("id") % 4 == 0, None)
        .otherwise(F.concat(F.lit("g"), (F.col("id") % 3).cast("string")))
        .alias("grp"),
        F.when(F.col("id") % 5 == 0, None)
        .otherwise(F.col("id").cast("double"))
        .alias("v"),
    )
    df.repartition(4).write.parquet(path)
    create_agg_view(spark, path, mv, ["grp"], "v")
    # mutate inside the NULL-key group too
    delete_where(
        spark, path, F.col("grp").isNull() & (F.col("id") < 40),
        change_feed=True,
    )
    update_where(
        spark, path, F.col("id") % 7 == 0, {"v": F.col("v") * 2},
        change_feed=True,
    )
    refresh_agg_view(spark, path, mv)
    got = {
        r["grp"]: (r["n_rows"], r["n_v"],
                   round(r["sum_v"], 6), r["min_v"], r["max_v"])
        for r in read_agg_partials(spark, mv).collect()
    }
    exp = {
        r["grp"]: (r["n_rows"], r["n_v"],
                   round(r["sum_v"], 6), r["min_v"], r["max_v"])
        for r in spark.read.parquet(path).groupBy("grp").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("v").alias("n_v"),
            F.coalesce(F.sum("v"), F.lit(0.0)).alias("sum_v"),
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
        ).collect()
    }
    assert got == exp


def test_noop_refresh_mints_no_version(spark, tmp_path):
    """Refresh with nothing new returns noop and does not bump the MV
    version — including on a table that has never had a feed."""
    from iot_sensor_data_pipeline_spark.sources.manifest import _versions_in

    path, mv = str(tmp_path / "t"), str(tmp_path / "mv")
    _mk(spark, path)
    create_agg_view(spark, path, mv, ["grp"], "v")
    r = refresh_agg_view(spark, path, mv)  # no feed at all yet
    assert r["status"] == "noop"
    delete_where(spark, path, F.col("grp") == "g4", change_feed=True)
    refresh_agg_view(spark, path, mv)
    vs = _versions_in(spark, mv)
    r = refresh_agg_view(spark, path, mv)
    assert r["status"] == "noop"
    assert _versions_in(spark, mv) == vs


def test_cursor_rides_the_version_commit(spark, tmp_path):
    """The feed cursor lives inside the committed version dir, so
    re-running a refresh that 'crashed' after commit is a no-op, and a
    staged-but-uncommitted refresh replays exactly (idempotent)."""
    path, mv = str(tmp_path / "t"), str(tmp_path / "mv")
    _mk(spark, path)
    create_agg_view(spark, path, mv, ["grp"], "v")
    delete_where(spark, path, F.col("v") < 10, change_feed=True)
    refresh_agg_view(spark, path, mv)
    # replay (the crash-after-commit case): cursor came from v2's own
    # _meta.json, so nothing re-applies
    r = refresh_agg_view(spark, path, mv)
    assert r["status"] == "noop"
    assert _mv_state(spark, mv) == _expected(spark, path)


def test_feed_gap_raises_rebaseline(spark, tmp_path):
    """Expiring feed versions past the MV's cursor makes the next
    refresh raise the re-create error instead of silently skipping."""
    path, mv = str(tmp_path / "t"), str(tmp_path / "mv")
    _mk(spark, path)
    create_agg_view(spark, path, mv, ["grp"], "v")
    for lo in (10, 20, 30):
        delete_where(
            spark, path, (F.col("v") >= lo) & (F.col("v") < lo + 3),
            change_feed=True,
        )
    expire_change_feed(spark, path, keep_versions=1)
    with pytest.raises(ValueError, match="re-create the view"):
        refresh_agg_view(spark, path, mv)


def test_desync_raises_on_unfed_mutation(spark, tmp_path):
    """A mutation WITHOUT change_feed=True starves the MV; the next
    dirty-group recompute catches the disagreement and raises rather
    than committing a wrong answer."""
    path, mv = str(tmp_path / "t"), str(tmp_path / "mv")
    _mk(spark, path)
    create_agg_view(spark, path, mv, ["grp"], "v")
    # unfed: deletes half of g0, MV never hears about it
    delete_where(
        spark, path, (F.col("grp") == "g0") & (F.col("id") < 150)
    )
    # fed: delete g0's (current) minimum -> dirty recompute on g0
    g0_min = (
        spark.read.parquet(path).where("grp = 'g0'")
        .agg(F.min("v")).first()[0]
    )
    delete_where(
        spark, path,
        (F.col("grp") == "g0") & (F.col("v") == g0_min),
        change_feed=True,
    )
    with pytest.raises(Exception, match="recount disagrees"):
        refresh_agg_view(spark, path, mv)


def test_recompute_all_heals_drift(spark, tmp_path):
    """recompute_all=True rebuilds every group's moments from the base
    table (the drift-healing maintenance pass) while keeping the cursor
    discipline — a second refresh is still a no-op."""
    path, mv = str(tmp_path / "t"), str(tmp_path / "mv")
    _mk(spark, path)
    create_agg_view(spark, path, mv, ["grp"], "v")
    update_where(
        spark, path, F.col("id") % 3 == 0, {"v": F.col("v") + 0.1},
        change_feed=True,
    )
    r = refresh_agg_view(spark, path, mv, recompute_all=True)
    assert r["n_dirty_recomputed"] == r["n_groups"]
    assert _mv_state(spark, mv) == _expected(spark, path)
    assert refresh_agg_view(spark, path, mv)["status"] == "noop"


def test_create_detects_mid_build_feed_commit(spark, tmp_path):
    """ADVICE r12: a feed version committing DURING the build scan may
    be partially visible to it — and an insert-only version re-applied
    by refresh would silently double-count (no dirty group heals an
    insert). create_agg_view re-checks the feed after the commit,
    deletes the suspect view, and raises."""
    from iot_sensor_data_pipeline_spark.sources import matview as MV

    path = str(tmp_path / "t")
    mv = str(tmp_path / "mv")
    _mk(spark, path)
    delete_where(spark, path, "id = 0", change_feed=True)  # feed exists

    real_commit = MV._commit_version_in

    def mutate_then_commit(spark_, mv_path, df, **kw):
        # the concurrent writer the single-writer discipline forbids: an
        # INSERT-ONLY merge lands while the build scan runs — the
        # nastiest case, because it rewrites no file (nothing crashes),
        # dirties no group (nothing heals), and re-application would
        # just double-count silently
        ins = spark.createDataFrame([(9_000_001, "g0", 1.0)],
                                    "id long, grp string, v double")
        merge_into(spark, path, ins, on=["id"], change_feed=True)
        return real_commit(spark_, mv_path, df, **kw)

    MV._commit_version_in = mutate_then_commit
    try:
        with pytest.raises(RuntimeError, match="DURING the build"):
            create_agg_view(spark, path, mv, ["grp"], "v")
    finally:
        MV._commit_version_in = real_commit
    import os

    assert not os.path.exists(mv)  # the suspect view was deleted
    # a clean rebuild afterwards works and matches ground truth
    create_agg_view(spark, path, mv, ["grp"], "v")
    assert _mv_state(spark, mv) == _expected(spark, path)


def test_dirty_recompute_reuses_refresh_listing(spark, tmp_path):
    """ADVICE r12: the dirty-group exact recompute scans EXACTLY the
    files the refresh's incremental fold saw — one listing per refresh,
    not a second one that could race an epoch sealing in between (the
    recount cross-check would then raise spuriously)."""
    from iot_sensor_data_pipeline_spark.sources import matview as MV

    path = str(tmp_path / "t")
    mv = str(tmp_path / "mv")
    _mk(spark, path)
    create_agg_view(spark, path, mv, ["grp"], "v")
    # delete a group minimum -> the refresh MUST take the dirty path
    victim = spark.read.parquet(path).where("v IS NOT NULL") \
        .orderBy("v").first()
    delete_where(spark, path, F.col("id") == victim.id, change_feed=True)

    listings = []
    real_list = MV._list_files

    def counting_list(*a, **kw):
        out = real_list(*a, **kw)
        listings.append(out)
        return out

    MV._list_files = counting_list
    try:
        res = refresh_agg_view(spark, path, mv)
    finally:
        MV._list_files = real_list
    assert res["n_dirty_recomputed"] >= 1  # the dirty path actually ran
    assert len(listings) == 1  # refresh listed once; recompute reused it
    assert _mv_state(spark, mv) == _expected(spark, path)


def test_coarser_grain_read_merges_partials(spark, tmp_path):
    """A two-key MV answers a one-key rollup from partials alone
    (merge_aggregates discipline), matching a direct aggregate."""
    path, mv = str(tmp_path / "t"), str(tmp_path / "mv")
    df = spark.range(0, 200).select(
        F.col("id"),
        F.concat(F.lit("g"), (F.col("id") % 4).cast("string")).alias("grp"),
        F.concat(F.lit("s"), (F.col("id") % 3).cast("string")).alias("sub"),
        (F.col("id") % 13).cast("double").alias("v"),
    )
    df.repartition(4).write.parquet(path)
    create_agg_view(spark, path, mv, ["grp", "sub"], "v")
    got = {
        r["grp"]: (r["n_rows"], round(r["sum_v"], 6),
                   r["min_v"], r["max_v"], round(r["avg_v"], 9))
        for r in read_agg_view(spark, mv, group_keys=["grp"]).collect()
    }
    exp = {
        r["grp"]: (r["n"], round(r["s"], 6), r["mn"], r["mx"],
                   round(r["a"], 9))
        for r in df.groupBy("grp").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"),
            F.min("v").alias("mn"), F.max("v").alias("mx"),
            F.avg("v").alias("a"),
        ).collect()
    }
    assert got == exp
    with pytest.raises(ValueError, match="not MV key columns"):
        read_agg_view(spark, mv, group_keys=["nope"])


def test_partitioned_source_with_partition_key(spark, tmp_path):
    """MV keyed by a hive partition column (verbatim-string semantics)
    stays exact through a partition-crossing delete."""
    path, mv = str(tmp_path / "t"), str(tmp_path / "mv")
    spark.range(0, 240).select(
        F.col("id"),
        (F.col("id") % 3).cast("string").alias("pk"),
        (F.col("id") % 29).cast("double").alias("v"),
    ).repartition(4).write.partitionBy("pk").parquet(path)
    create_agg_view(spark, path, mv, ["pk"], "v")
    delete_where(spark, path, F.col("v") < 5, change_feed=True)
    refresh_agg_view(spark, path, mv)
    got = {
        r["pk"]: (r["n_rows"], r["n_v"], round(r["sum_v"], 6))
        for r in read_agg_partials(spark, mv).collect()
    }
    exp = {
        r["pk"]: (r["n"], r["nv"], round(r["s"], 6))
        for r in spark.read.parquet(path).groupBy(
            F.col("pk").cast("string").alias("pk")
        ).agg(
            F.count(F.lit(1)).alias("n"), F.count("v").alias("nv"),
            F.coalesce(F.sum("v"), F.lit(0.0)).alias("s"),
        ).collect()
    }
    assert got == exp


def test_create_guards(spark, tmp_path):
    """Reserved-name keys, value-as-key, missing columns, and
    double-create all fail loudly before any write."""
    path, mv = str(tmp_path / "t"), str(tmp_path / "mv")
    _mk(spark, path)
    with pytest.raises(ValueError, match="generated moment columns"):
        create_agg_view(spark, path, mv, ["sum_v"], "v")
    with pytest.raises(ValueError, match="are also keys"):
        create_agg_view(spark, path, mv, ["v"], "v")
    with pytest.raises(ValueError, match="lacks columns"):
        create_agg_view(spark, path, mv, ["grp"], "nope")
    with pytest.raises(ValueError, match="at least one key"):
        create_agg_view(spark, path, mv, [], "v")
    create_agg_view(spark, path, mv, ["grp"], "v")
    with pytest.raises(ValueError, match="already exists"):
        create_agg_view(spark, path, mv, ["grp"], "v")
    with pytest.raises(ValueError, match="no materialized view"):
        refresh_agg_view(spark, path, str(tmp_path / "nomv"))


def test_all_groups_die_reads_empty_via_sidecar_schema(spark, tmp_path):
    """An MV whose every group dies commits a ZERO-row version; the
    meta sidecar's explicit schema keeps it readable (Spark cannot
    infer a schema from an empty directory) and a later refresh is a
    clean no-op."""
    path, mv = str(tmp_path / "t"), str(tmp_path / "mv")
    spark.range(0, 40).select(
        F.col("id"), F.lit("only").alias("grp"),
        F.col("id").cast("double").alias("v"),
    ).repartition(2).write.parquet(path)
    create_agg_view(spark, path, mv, ["grp"], "v")
    delete_where(spark, path, F.lit(True), change_feed=True)
    refresh_agg_view(spark, path, mv)
    assert read_agg_partials(spark, mv).count() == 0
    assert read_agg_view(spark, mv).count() == 0
    assert refresh_agg_view(spark, path, mv)["status"] == "noop"


def test_recompute_plan_is_pruned_broadcast_semi(spark, tmp_path):
    """The dirty-group recompute's executed plan: broadcast LeftSemi
    hash join (no cartesian/BNLJ), scan reading ONLY key + value
    columns — the shape that keeps a few dirty groups from costing a
    wide scan at 100 TB."""
    from iot_sensor_data_pipeline_spark.sources.matview import _exact_groups

    path = str(tmp_path / "t")
    # extra wide columns that must NOT appear in the recompute scan
    spark.range(0, 500).select(
        F.col("id"),
        F.concat(F.lit("g"), (F.col("id") % 5).cast("string")).alias("grp"),
        (F.col("id") % 17).cast("double").alias("v"),
        F.repeat(F.lit("x"), 100).alias("payload"),
        (F.col("id") * 3).alias("other"),
    ).repartition(4).write.parquet(path)
    dirty = spark.createDataFrame([("g1",), ("g3",)], "grp string")
    df = _exact_groups(spark, path, ["grp"], "v", dirty, broadcast=True)
    assert df.count() == 2
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    import re

    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    read_cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert read_cols == {"grp", "v"}, read_cols
    # the shuffled degrade path computes the same relation
    df2 = _exact_groups(spark, path, ["grp"], "v", dirty, broadcast=False)
    assert sorted(map(tuple, df2.collect())) == sorted(map(tuple, df.collect()))


def test_multi_measure_single_fold(spark, tmp_path):
    """Several measure columns share one MV: one feed fold maintains
    all of them (suffixed moment families), exact vs a direct
    aggregate after a delete + update; coarser-grain read and the
    suffix/guard surfaces hold."""
    path, mv = str(tmp_path / "t"), str(tmp_path / "mv")
    df = spark.range(0, 240).select(
        F.col("id"),
        F.concat(F.lit("g"), (F.col("id") % 4).cast("string")).alias("grp"),
        F.concat(
            F.lit("s"), ((F.col("id") / 4).cast("long") % 2).cast("string")
        ).alias("sub"),
        (F.col("id") % 19).cast("double").alias("price"),
        F.when(F.col("id") % 9 == 0, None)
        .otherwise((F.col("id") % 7).cast("double"))
        .alias("qty"),
    )
    df.repartition(4).write.parquet(path)
    r = create_agg_view(
        spark, path, mv, ["grp", "sub"], ["price", "qty"]
    )
    assert r["n_groups"] == 8
    parts = read_agg_partials(spark, mv)
    assert {"n_price", "sum_price", "n_qty", "min_qty"} <= set(parts.columns)

    delete_where(spark, path, F.col("price") < 2, change_feed=True)
    update_where(
        spark, path, F.col("id") % 5 == 0,
        {"qty": F.col("qty") + 100.0}, change_feed=True,
    )
    rr = refresh_agg_view(spark, path, mv)
    assert rr["status"] == "refreshed"

    got = {
        (r2["grp"], r2["sub"]): (
            r2["n_rows"], r2["n_price"], round(r2["sum_price"], 6),
            r2["min_price"], r2["max_price"],
            r2["n_qty"], round(r2["sum_qty"], 6), r2["min_qty"],
            r2["max_qty"],
        )
        for r2 in read_agg_partials(spark, mv).collect()
    }
    exp = {
        (r2["grp"], r2["sub"]): (
            r2["n_rows"], r2["n_price"], round(r2["sum_price"], 6),
            r2["min_price"], r2["max_price"],
            r2["n_qty"], round(r2["sum_qty"], 6), r2["min_qty"],
            r2["max_qty"],
        )
        for r2 in spark.read.parquet(path).groupBy("grp", "sub").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("price").alias("n_price"),
            F.coalesce(F.sum("price"), F.lit(0.0)).alias("sum_price"),
            F.min("price").alias("min_price"),
            F.max("price").alias("max_price"),
            F.count("qty").alias("n_qty"),
            F.coalesce(F.sum("qty"), F.lit(0.0)).alias("sum_qty"),
            F.min("qty").alias("min_qty"),
            F.max("qty").alias("max_qty"),
        ).collect()
    }
    assert got == exp

    # coarser grain across both measures, derived avg checked
    roll = {
        r2["grp"]: (r2["n_rows"], round(r2["avg_price"], 9),
                    round(r2["avg_qty"], 9))
        for r2 in read_agg_view(spark, mv, group_keys=["grp"]).collect()
    }
    droll = {
        r2["grp"]: (r2["n"], round(r2["ap"], 9), round(r2["aq"], 9))
        for r2 in spark.read.parquet(path).groupBy("grp").agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("price").alias("ap"), F.avg("qty").alias("aq"),
        ).collect()
    }
    for k in droll:
        assert roll[k][0] == droll[k][0]
        assert roll[k][1] == pytest.approx(droll[k][1], abs=1e-6)
        assert roll[k][2] == pytest.approx(droll[k][2], abs=1e-6)

    with pytest.raises(ValueError, match="duplicate value columns"):
        create_agg_view(
            spark, path, str(tmp_path / "mv3"), ["grp"], ["price", "price"]
        )


# ---------------------------------------------------------------------------
# streaming appends (epoch-sink absorption)
# ---------------------------------------------------------------------------


def _epoch_sink(spark, path, ckpt, epoch, lo, hi):
    from iot_sensor_data_pipeline_spark.sources.sinks import (
        parquet_batch_sink,
    )

    sink = parquet_batch_sink(path, checkpoint=ckpt)
    sink(
        spark.range(lo, hi).select(
            F.col("id"),
            F.concat(F.lit("g"), (F.col("id") % 3).cast("string"))
            .alias("grp"),
            (F.col("id") % 23).cast("double").alias("v"),
        ).coalesce(1),
        epoch,
    )


def test_appends_absorb_without_feed(spark, tmp_path):
    """Epoch-sink batches landing after the build absorb as insert
    deltas with no change feed anywhere; a second refresh is a noop."""
    path, mv = str(tmp_path / "t"), str(tmp_path / "mv")
    ckpt = "/ckpt/MVAPPEND1"
    _epoch_sink(spark, path, ckpt, 0, 0, 100)
    _epoch_sink(spark, path, ckpt, 1, 100, 200)
    create_agg_view(spark, path, mv, ["grp"], "v")
    _epoch_sink(spark, path, ckpt, 2, 200, 300)
    _epoch_sink(spark, path, ckpt, 3, 300, 420)
    r = refresh_agg_view(spark, path, mv)
    assert r["status"] == "refreshed"
    assert r["n_epoch_files_absorbed"] == 2
    assert r["applied_versions"] == []
    assert _mv_state(spark, mv) == _expected(spark, path)
    assert refresh_agg_view(spark, path, mv)["status"] == "noop"


def test_appends_and_mutations_one_refresh(spark, tmp_path):
    """A feed-carrying delete over the ABSORBED epoch plus a newly
    appended epoch fold in one refresh; recount stays consistent. (The
    delete runs BEFORE the append on purpose: a mutation may only
    rewrite files the MV has absorbed — rewriting an un-absorbed epoch
    arms the compaction watermark past the cursor, which the epoch-gap
    guard rejects, pinned by
    test_optimize_before_refresh_raises_epoch_gap.)"""
    path, mv = str(tmp_path / "t"), str(tmp_path / "mv")
    ckpt = "/ckpt/MVAPPEND2"
    _epoch_sink(spark, path, ckpt, 0, 0, 150)
    create_agg_view(spark, path, mv, ["grp"], "v")
    delete_where(spark, path, F.col("v") <= 1, change_feed=True)
    _epoch_sink(spark, path, ckpt, 1, 150, 260)
    r = refresh_agg_view(spark, path, mv)
    assert r["status"] == "refreshed"
    assert r["n_epoch_files_absorbed"] == 1
    assert r["applied_versions"] == [1]
    assert _mv_state(spark, mv) == _expected(spark, path)


def test_live_newest_epoch_excluded_until_sealed(spark, tmp_path):
    """With live_checkpoints the newest epoch waits: the build and
    every refresh exclude it, it absorbs once a newer epoch lands, and
    a final refresh WITHOUT the live exclusion drains the tail."""
    path, mv = str(tmp_path / "t"), str(tmp_path / "mv")
    ckpt = "/ckpt/MVLIVE"
    _epoch_sink(spark, path, ckpt, 0, 0, 80)
    _epoch_sink(spark, path, ckpt, 1, 80, 160)
    create_agg_view(spark, path, mv, ["grp"], "v", live_checkpoints=[ckpt])
    # epoch 1 (newest at build) is NOT in the MV yet
    assert sum(s[0] for s in _mv_state(spark, mv).values()) == 80
    r = refresh_agg_view(spark, path, mv, live_checkpoints=[ckpt])
    assert r["status"] == "noop"  # nothing sealed since the build
    _epoch_sink(spark, path, ckpt, 2, 160, 250)
    r = refresh_agg_view(spark, path, mv, live_checkpoints=[ckpt])
    assert r["status"] == "refreshed"  # epoch 1 sealed by epoch 2
    assert sum(s[0] for s in _mv_state(spark, mv).values()) == 160
    # stream stopped: drain without the exclusion
    r = refresh_agg_view(spark, path, mv)
    assert r["status"] == "refreshed"
    assert _mv_state(spark, mv) == _expected(spark, path)


def test_optimize_before_refresh_raises_epoch_gap(spark, tmp_path):
    """An OPTIMIZE that compacts epochs the MV has not absorbed makes
    the next refresh raise the re-create error (the watermark proves
    the missed appends are no longer enumerable); the benign order —
    refresh, then optimize, then refresh — stays clean."""
    from iot_sensor_data_pipeline_spark.sources.manifest import (
        optimize_table,
    )

    path, mv = str(tmp_path / "t"), str(tmp_path / "mv")
    ckpt = "/ckpt/MVOPT"
    _epoch_sink(spark, path, ckpt, 0, 0, 60)
    create_agg_view(spark, path, mv, ["grp"], "v")
    _epoch_sink(spark, path, ckpt, 1, 60, 140)
    # benign: absorb first, compact second
    refresh_agg_view(spark, path, mv)
    optimize_table(spark, path, target_bytes=1 << 30)
    assert refresh_agg_view(spark, path, mv)["status"] == "noop"
    # hostile: append, compact BEFORE the MV sees it
    _epoch_sink(spark, path, ckpt, 2, 140, 200)
    optimize_table(spark, path, target_bytes=1 << 30)
    with pytest.raises(ValueError, match="re-create the view"):
        refresh_agg_view(spark, path, mv)


def test_new_lineage_appears_after_create(spark, tmp_path):
    """A second stream (new checkpoint/lineage) starting AFTER the
    build absorbs from its first epoch."""
    path, mv = str(tmp_path / "t"), str(tmp_path / "mv")
    _epoch_sink(spark, path, "/ckpt/MVLINA", 0, 0, 90)
    create_agg_view(spark, path, mv, ["grp"], "v")
    _epoch_sink(spark, path, "/ckpt/MVLINB", 0, 90, 170)
    r = refresh_agg_view(spark, path, mv)
    assert r["status"] == "refreshed"
    assert r["n_epoch_files_absorbed"] == 1
    assert _mv_state(spark, mv) == _expected(spark, path)


def test_distinct_measures_incremental_equals_rebuild(spark, tmp_path):
    """HLL distinct measures: insert-only maintenance yields the EXACT
    same estimate as a rebuilt sketch (register-state max is lossless
    under union); any removal recomputes the group and the estimate
    tracks exact distinct counts within HLL error."""
    path, mv = str(tmp_path / "t"), str(tmp_path / "mv")
    spark.range(0, 300).select(
        F.col("id"),
        F.concat(F.lit("g"), (F.col("id") % 3).cast("string")).alias("grp"),
        (F.col("id") % 41).cast("double").alias("v"),
        F.concat(F.lit("u"), (F.col("id") % 53).cast("string")).alias("user"),
    ).repartition(4).write.parquet(path)
    create_agg_view(
        spark, path, mv, ["grp"], "v", distinct_cols=["user"]
    )
    # insert-only growth: new users + repeat users
    src = spark.range(0, 80).select(
        (F.col("id") + 20_000).alias("id"),
        F.lit("g1").alias("grp"),
        F.lit(5.0).alias("v"),
        F.concat(F.lit("u"), (F.col("id") % 120).cast("string"))
        .alias("user"),
    )
    merge_into(spark, path, src, on=["id"], change_feed=True)
    r = refresh_agg_view(spark, path, mv)
    assert r["n_dirty_recomputed"] == 0  # inserts never dirty
    got = {
        r2["grp"]: r2["distinct_user"]
        for r2 in read_agg_view(spark, mv).collect()
    }
    rebuilt = {
        r2["grp"]: r2["d"]
        for r2 in spark.read.parquet(path).groupBy("grp").agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("user")).alias("d")
        ).collect()
    }
    assert got == rebuilt  # exact sketch equality, not approx

    # removal dirties and recomputes; estimate follows the shrink
    delete_where(
        spark, path, (F.col("grp") == "g0") & (F.col("id") < 150),
        change_feed=True,
    )
    r = refresh_agg_view(spark, path, mv)
    assert r["n_dirty_recomputed"] >= 1
    got = {
        r2["grp"]: r2["distinct_user"]
        for r2 in read_agg_view(spark, mv).collect()
    }
    rebuilt = {
        r2["grp"]: r2["d"]
        for r2 in spark.read.parquet(path).groupBy("grp").agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("user")).alias("d")
        ).collect()
    }
    assert got == rebuilt
    # sanity: estimates near exact distincts at this tiny cardinality
    exact = {
        r2["grp"]: r2["d"]
        for r2 in spark.read.parquet(path).groupBy("grp").agg(
            F.countDistinct("user").alias("d")
        ).collect()
    }
    for g, d in exact.items():
        assert abs(got[g] - d) <= max(2, 0.05 * d)

    # coarser grain: sketches union across MV rows
    total = read_agg_view(spark, mv, group_keys=[]).collect()
    # (empty group_keys -> a single global rollup row)
    full = spark.read.parquet(path).agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user")).alias("d")
    ).first()["d"]
    assert len(total) == 1 and total[0]["distinct_user"] == full


def test_histogram_measures_subtract_exactly(spark, tmp_path):
    """Fixed-bin histogram measures: counts match a direct binning
    after delete + update + insert, the whole mutation chain stays on
    the pure incremental path (integer counts subtract exactly — zero
    dirty recomputes when extremes are untouched), and the quantile
    derivation tracks exact percentile_cont within one bin width."""
    path, mv = str(tmp_path / "t"), str(tmp_path / "mv")
    spark.range(0, 400).select(
        F.col("id"),
        F.concat(F.lit("g"), (F.col("id") % 2).cast("string")).alias("grp"),
        F.when(F.col("id") % 13 == 0, None)
        .otherwise((F.col("id") % 100).cast("double"))
        .alias("v"),
    ).repartition(4).write.parquet(path)
    create_agg_view(
        spark, path, mv, ["grp"], "v",
        histogram_cols={"v": (0.0, 100.0, 10)},
    )
    # interior delete + update (moves values between bins) + inserts,
    # including out-of-range values for the overflow bins
    delete_where(
        spark, path, (F.col("v") >= 43) & (F.col("v") < 57),
        change_feed=True,
    )
    update_where(
        spark, path, (F.col("v") >= 20) & (F.col("v") < 25),
        {"v": F.col("v") + 10.0}, change_feed=True,
    )
    src = spark.range(0, 30).select(
        (F.col("id") + 40_000).alias("id"),
        F.lit("g0").alias("grp"),
        (F.col("id").cast("double") * 10 - 40.0).alias("v"),  # some < 0, some >= 100
    )
    merge_into(spark, path, src, on=["id"], change_feed=True)
    r = refresh_agg_view(spark, path, mv)
    assert r["status"] == "refreshed"
    assert r["n_dirty_recomputed"] == 0  # histograms never dirty

    # counts == direct binning of the current table, bin by bin
    parts = read_agg_partials(spark, mv)
    hist_cols = [f"hist_v_{i}" for i in range(12)]
    got = {r2["grp"]: [r2[c] for c in hist_cols]
           for r2 in parts.collect()}
    t = spark.read.parquet(path)
    v = F.col("v")
    direct_bin = (
        F.when(v.isNull(), None).when(v < 0, 0).when(v >= 100, 11)
        .otherwise(F.least(F.floor(v / 10), F.lit(9)).cast("int") + 1)
    )
    exp = {}
    for row in t.select("grp", direct_bin.alias("b")).groupBy(
        "grp", "b"
    ).count().collect():
        exp.setdefault(row["grp"], [0] * 12)
        if row["b"] is not None:
            exp[row["grp"]][row["b"]] = row["count"]
    assert got == exp

    # read_agg_view exposes the packed array
    arr = {r2["grp"]: r2["hist_v"]
           for r2 in read_agg_view(spark, mv).collect()}
    assert arr == got

    # quantiles within one bin width of exact percentile_cont
    qdf = {
        (r2["grp"], r2["q"]): r2["v_q"]
        for r2 in __import__(
            "iot_sensor_data_pipeline_spark.sources.matview",
            fromlist=["read_agg_quantiles"],
        ).read_agg_quantiles(
            spark, mv, "v", [0.1, 0.5, 0.9]
        ).collect()
    }
    exact = {
        (r2["grp"], q): r2[f"p{int(q*100)}"]
        for r2 in t.groupBy("grp").agg(
            *[F.expr(
                f"percentile_cont({q}) WITHIN GROUP (ORDER BY v)"
            ).alias(f"p{int(q*100)}") for q in (0.1, 0.5, 0.9)]
        ).collect()
        for q in (0.1, 0.5, 0.9)
    }
    for k, est in qdf.items():
        assert abs(est - exact[k]) <= 10.0 + 1e-9, (k, est, exact[k])

    # guards
    with pytest.raises(ValueError, match="outside"):
        __import__(
            "iot_sensor_data_pipeline_spark.sources.matview",
            fromlist=["read_agg_quantiles"],
        ).read_agg_quantiles(spark, mv, "v", [1.5])
    with pytest.raises(ValueError, match="not a histogram measure"):
        __import__(
            "iot_sensor_data_pipeline_spark.sources.matview",
            fromlist=["read_agg_quantiles"],
        ).read_agg_quantiles(spark, mv, "nope", [0.5])
    with pytest.raises(ValueError, match="lo < hi"):
        create_agg_view(
            spark, path, str(tmp_path / "mv2"), ["grp"], "v",
            histogram_cols={"v": (5.0, 5.0, 4)},
        )


def test_filtered_view_boundary_crossing(spark, tmp_path):
    """A filtered MV (WHERE lang = 'en') follows boundary-crossing
    updates exactly — entrants add, leavers subtract, out-of-view
    churn is invisible — through feed mutations AND epoch appends; the
    predicate may use a column the MV does not keep."""
    from iot_sensor_data_pipeline_spark.sources.sinks import (
        parquet_batch_sink,
    )

    path, mv = str(tmp_path / "t"), str(tmp_path / "mv")
    ckpt = "/ckpt/MVFILT"
    sink = parquet_batch_sink(path, checkpoint=ckpt)

    def batch(lo, hi):
        return spark.range(lo, hi).select(
            F.col("id"),
            F.concat(F.lit("g"), (F.col("id") % 3).cast("string"))
            .alias("grp"),
            F.when(F.col("id") % 4 == 0, "en").otherwise("de").alias("lang"),
            (F.col("id") % 37).cast("double").alias("v"),
        )

    sink(batch(0, 200).coalesce(1), 0)
    create_agg_view(
        spark, path, mv, ["grp"], "v", where="lang = 'en'"
    )

    def expected():
        return {
            r["grp"]: (r["n"], round(r["s"], 6))
            for r in spark.read.parquet(path).where("lang = 'en'")
            .groupBy("grp").agg(
                F.count(F.lit(1)).alias("n"),
                F.coalesce(F.sum("v"), F.lit(0.0)).alias("s"),
            ).collect()
        }

    def got():
        return {
            r["grp"]: (r["n_rows"], round(r["sum_v"], 6))
            for r in read_agg_partials(spark, mv).collect()
        }

    assert got() == expected()

    # appends: only the 'en' slice absorbs
    sink(batch(200, 320).coalesce(1), 1)
    sink(batch(320, 400).coalesce(1), 2)
    refresh_agg_view(spark, path, mv)
    assert got() == expected()

    # entrants (de -> en) and leavers (en -> fr), plus out-of-view
    # churn (de value changes must be invisible to the view)
    update_where(
        spark, path, (F.col("lang") == "de") & (F.col("id") % 5 == 1),
        {"lang": F.lit("en")}, change_feed=True,
    )
    update_where(
        spark, path, (F.col("lang") == "en") & (F.col("id") % 8 == 0),
        {"lang": F.lit("fr")}, change_feed=True,
    )
    update_where(
        spark, path, F.col("lang") == "de", {"v": F.col("v") + 1000.0},
        change_feed=True,
    )
    r = refresh_agg_view(spark, path, mv)
    assert r["status"] == "refreshed"
    assert got() == expected()

    # delete that takes a view-member minimum -> filtered recompute
    en_min = (
        spark.read.parquet(path).where("lang = 'en'")
        .agg(F.min("v")).first()[0]
    )
    delete_where(
        spark, path, (F.col("lang") == "en") & (F.col("v") == en_min),
        change_feed=True,
    )
    r = refresh_agg_view(spark, path, mv)
    assert r["n_dirty_recomputed"] >= 1
    assert got() == expected()


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_quantiles_error_contract_vs_duckdb(spark, tmp_path, sf_dir):
    """VERDICT r12 task 5 — the matview quantile's error CONTRACT,
    pinned cross-engine at two SFs (the HLL-floor pattern): for every
    (group, q), |read_agg_quantiles − DuckDB percentile_cont| <= one
    bin width, on real testdata (lineitem.l_quantity per return flag).
    The estimate interpolates inside frozen bins (documented accuracy:
    one bin width for in-range data); percentile_cont is the exact
    oracle an analyst would reach for."""
    import duckdb

    from iot_sensor_data_pipeline_spark.sources.matview import (
        read_agg_quantiles,
    )
    from iot_sensor_data_pipeline_spark.sources.tables import load_table

    path, mv = str(tmp_path / "li"), str(tmp_path / "mv")
    load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_quantity"
    ).repartition(4).write.parquet(path)
    lo, hi, nbins = 0.0, 51.0, 64  # l_quantity spans 1..50
    width = (hi - lo) / nbins
    create_agg_view(
        spark, path, mv, ["l_returnflag"], "l_quantity",
        histogram_cols={"l_quantity": (lo, hi, nbins)},
    )
    qs = [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
    got = {
        (r["l_returnflag"], r["q"]): r["l_quantity_q"]
        for r in read_agg_quantiles(spark, mv, "l_quantity", qs).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW li AS SELECT * FROM read_parquet("
        f"'{sf_dir}/lineitem.parquet')"
    )
    exact = {}
    for q in qs:
        for flag, val in con.execute(
            f"SELECT l_returnflag, percentile_cont({q}) WITHIN GROUP "
            "(ORDER BY l_quantity) FROM li GROUP BY 1"
        ).fetchall():
            exact[(flag, q)] = val
    assert set(got) == set(exact)
    for key, est in got.items():
        assert abs(est - exact[key]) <= width + 1e-9, (
            key, est, exact[key], width
        )


def test_quantiles_at_coarser_grain(spark, tmp_path):
    """read_agg_quantiles over a COARSER grouping merges bin counts
    across MV rows before interpolating — the global median of a
    two-key MV tracks the exact percentile within one bin width."""
    from iot_sensor_data_pipeline_spark.sources.matview import (
        read_agg_quantiles,
    )

    path, mv = str(tmp_path / "t"), str(tmp_path / "mv")
    spark.range(0, 600).select(
        F.col("id"),
        (F.col("id") % 3).cast("string").alias("a"),
        (F.col("id") % 2).cast("string").alias("b"),
        (F.col("id") % 200).cast("double").alias("v"),
    ).repartition(3).write.parquet(path)
    create_agg_view(
        spark, path, mv, ["a", "b"], "v",
        histogram_cols={"v": (0.0, 200.0, 20)},
    )
    got = {
        (r["a"], r["q"]): r["v_q"]
        for r in read_agg_quantiles(
            spark, mv, "v", [0.5], group_keys=["a"]
        ).collect()
    }
    exact = {
        r["a"]: r["p50"]
        for r in spark.read.parquet(path).groupBy("a").agg(
            F.expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY v)")
            .alias("p50")
        ).collect()
    }
    for a, p50 in exact.items():
        assert abs(got[(a, 0.5)] - p50) <= 10.0 + 1e-9
