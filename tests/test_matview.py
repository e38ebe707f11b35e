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
    with pytest.raises(ValueError, match="reserved moment columns"):
        create_agg_view(spark, path, mv, ["sum_v"], "v")
    with pytest.raises(ValueError, match="also a key"):
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
