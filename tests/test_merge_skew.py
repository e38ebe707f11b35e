"""MERGE/SCD2 emulation and skew-mitigation operators."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from iot_sensor_data_pipeline_spark.operators.merge import scd2_apply, upsert_snapshot
from iot_sensor_data_pipeline_spark.operators.skew import salted_agg, salted_join

T0 = dt.datetime(2026, 1, 1)


def test_upsert_snapshot(spark):
    current = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    updates = spark.createDataFrame([(2, "B"), (3, "c")], "id int, v string")
    out = {r.id: r.v for r in upsert_snapshot(current, updates, ["id"]).collect()}
    assert out == {1: "a", 2: "B", 3: "c"}


def test_scd2_apply_closes_and_appends(spark):
    history = spark.createDataFrame(
        [(1, "x", T0, None, True), (2, "y", T0, None, True)],
        "id int, v string, valid_from timestamp, valid_to timestamp, is_current boolean",
    )
    updates = spark.createDataFrame(
        [(1, "x2", T0 + dt.timedelta(days=5))], "id int, v string, ts timestamp"
    )
    out = scd2_apply(history, updates, ["id"], "ts")
    rows = {(r.id, r.v): r for r in out.collect()}
    assert len(rows) == 3
    old = rows[(1, "x")]
    assert old.is_current is False and old.valid_to == T0 + dt.timedelta(days=5)
    new = rows[(1, "x2")]
    assert new.is_current is True and new.valid_from == T0 + dt.timedelta(days=5)
    assert rows[(2, "y")].is_current is True  # untouched key unchanged


def test_scd2_multiple_updates_sequence(spark):
    history = spark.createDataFrame(
        [(1, "x", T0, None, True)],
        "id int, v string, valid_from timestamp, valid_to timestamp, is_current boolean",
    )
    updates = spark.createDataFrame(
        [(1, "x2", T0 + dt.timedelta(days=1)), (1, "x3", T0 + dt.timedelta(days=2))],
        "id int, v string, ts timestamp",
    )
    out = scd2_apply(history, updates, ["id"], "ts").orderBy("valid_from").collect()
    assert [(r.v, r.is_current) for r in out] == [("x", False), ("x2", False), ("x3", True)]
    assert out[1].valid_to == T0 + dt.timedelta(days=2)  # chained close-out


def test_salted_join_matches_plain_join(spark, sf_dir):
    from iot_sensor_data_pipeline_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    plain = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
    salted = salted_join(
        li.withColumnRenamed("l_orderkey", "k"),
        orders.withColumnRenamed("o_orderkey", "k"),
        ["k"],
        n_salts=4,
    ).count()
    assert salted == plain


def test_salted_agg_matches_plain_agg(spark, sf_dir):
    from iot_sensor_data_pipeline_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    plain = {
        r.l_returnflag: (round(r.s, 4), r.n)
        for r in li.groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    salted = {
        r.l_returnflag: (round(r.sum_l_quantity, 4), r.n)
        for r in salted_agg(li, ["l_returnflag"], sum_cols=["l_quantity"]).collect()
    }
    assert salted == plain


def test_skew_report_sizes_the_hot_key(spark):
    """A planted 10x hot key must rank first with suggested_salts that
    levels it back to mean-sized buckets; uniform keys suggest 1."""
    from iot_sensor_data_pipeline_spark.operators.skew import skew_report

    rows = [("hot",)] * 1000 + [(f"k{i}",) for i in range(9) for _ in range(100)]
    df = spark.createDataFrame(rows, "key_col string")
    rep = skew_report(df, ["key_col"], top_k=3).collect()
    assert [r.key for r in rep] == ["hot", "k0", "k1"]  # count desc, key asc ties
    # mean key size = 1900/10 = 190; hot = 1000 -> ceil(1000/190) = 6
    assert rep[0].suggested_salts == 6
    assert rep[0].n_rows == 1000
    assert abs(rep[0].row_share - 1000 / 1900) < 1e-9
    assert rep[1].suggested_salts == 1  # uniform keys need no salting


def test_skew_report_null_keys_stay_distinct(spark):
    """NULL components must not merge distinct composite keys: NULL is
    itself a classic hot join key, and ('a', NULL) != (NULL, 'a')."""
    from iot_sensor_data_pipeline_spark.operators.skew import skew_report

    rows = [("a", None)] * 5 + [(None, "a")] * 3 + [("a", "a")] * 2 + [(None, None)]
    df = spark.createDataFrame(rows, "x string, y string")
    rep = {r.key: r.n_rows for r in skew_report(df, ["x", "y"], top_k=10).collect()}
    assert rep == {
        "a|<NULL>": 5,
        "<NULL>|a": 3,
        "a|a": 2,
        "<NULL>|<NULL>": 1,
    }


def test_skew_report_topk_is_take_ordered_not_global_sort(spark):
    """The report must plan as TakeOrderedAndProject (per-partition
    heaps), never a global Sort (rangepartitioning) — a diagnostic
    that globally sorts the key histogram is itself a scale hazard.
    The fact table must be scanned ONCE (the totals and the report
    both consume the checkpointed per-key aggregation)."""
    from iot_sensor_data_pipeline_spark.operators.skew import skew_report
    from iot_sensor_data_pipeline_spark.sources.tables import load_table

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    plan = (
        skew_report(li, ["l_returnflag", "l_linestatus"], top_k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    # no global sort anywhere in the tree (the only sanctioned
    # SinglePartition exchange is the 1-row totals two-phase agg,
    # which carries no Sort)
    assert "Sort " not in plan and "rangepartitioning" not in plan
    # the fact scan lives INSIDE the checkpointed per-key relation —
    # both consumers (totals + report) read the RDD scan, so the
    # visible plan has zero FileScans and the table is read once
    assert plan.count("FileScan parquet") == 0
    assert "Scan ExistingRDD" in plan


# ---------------------------------------------------------------------------
# snapshot_diff / diff_summary
# ---------------------------------------------------------------------------


def test_snapshot_diff_all_change_kinds(spark):
    from iot_sensor_data_pipeline_spark.operators.merge import (
        diff_summary,
        snapshot_diff,
    )

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (None, "nk", 40)],
        "id int, s string, v int",
    )
    new = spark.createDataFrame(
        [(1, "a", 10), (2, "B", 20), (4, "d", 40), (None, "nk", 40)],
        "id int, s string, v int",
    )
    got = {
        r.id: r.change
        for r in snapshot_diff(old, new, ["id"], include_unchanged=True).collect()
    }
    assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added", None: "unchanged"}
    # default: unchanged excluded
    assert {r.id for r in snapshot_diff(old, new, ["id"]).collect()} == {2, 3, 4}
    counts = {r.change: r.n for r in diff_summary(old, new, ["id"]).collect()}
    assert counts == {"unchanged": 2, "changed": 1, "removed": 1, "added": 1}


def test_snapshot_diff_null_transitions_are_changes(spark):
    from iot_sensor_data_pipeline_spark.operators.merge import snapshot_diff

    old = spark.createDataFrame([(1, None), (2, "x")], "id int, s string")
    new = spark.createDataFrame([(1, "y"), (2, None)], "id int, s string")
    got = {r.id: r.change for r in snapshot_diff(old, new, ["id"]).collect()}
    assert got == {1: "changed", 2: "changed"}


def test_snapshot_diff_same_lineage_self_join(spark, sf_dir):
    """Both versions derived from ONE source DataFrame (the common
    production shape) must not trip the ambiguous-self-join analyzer."""
    from iot_sensor_data_pipeline_spark.operators.merge import snapshot_diff
    from iot_sensor_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    new = docs.where(F.col("doc_id") % 2 == 0)
    d = snapshot_diff(docs, new, ["doc_id"])
    assert d.where(F.col("change") == "removed").count() == docs.count() - new.count()
    assert d.where(F.col("change") != "removed").count() == 0


def test_snapshot_diff_compare_cols_subset(spark):
    from iot_sensor_data_pipeline_spark.operators.merge import snapshot_diff

    old = spark.createDataFrame([(1, "a", 1)], "id int, s string, noise int")
    new = spark.createDataFrame([(1, "a", 2)], "id int, s string, noise int")
    assert snapshot_diff(old, new, ["id"], ["s"]).count() == 0  # noise ignored
    assert snapshot_diff(old, new, ["id"]).count() == 1  # default: all shared cols
    import pytest as _pytest

    with _pytest.raises(ValueError, match="keys"):
        snapshot_diff(old, new, [])


# ---------------------------------------------------------------------------
# apply_cdc
# ---------------------------------------------------------------------------


def test_apply_cdc_latest_wins_delete_beats_update(spark):
    from iot_sensor_data_pipeline_spark.operators.merge import apply_cdc

    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], "k long, v string"
    )
    changes = spark.createDataFrame(
        [
            (1, "a1", "update", 1),
            (1, "a2", "update", 2),      # latest seq wins
            (2, None, "delete", 5),
            (2, "zombie", "update", 4),  # older than the delete -> ignored
            (3, None, "delete", 7),
            (3, "tie", "update", 7),     # SAME seq: delete wins
            (5, "new", "insert", 1),     # unseen key appends
        ],
        "k long, v string, op string, seq int",
    )
    out = {r.k: r.v for r in apply_cdc(base, changes, ["k"], "seq").collect()}
    assert out == {1: "a2", 4: "d", 5: "new"}


def test_apply_cdc_unknown_op_fails_loudly_and_partitioning_invariant(spark):
    import pytest

    from iot_sensor_data_pipeline_spark.operators.merge import apply_cdc

    base = spark.createDataFrame([(1, "a")], "k long, v string")
    bad = spark.createDataFrame(
        [(1, "x", "upsert??", 1)], "k long, v string, op string, seq int"
    )
    # validation is inline (raise_error on the main path — exactly one
    # job per call), so the failure surfaces at action time
    with pytest.raises(Exception, match="unknown op 'upsert\\?\\?'"):
        apply_cdc(base, bad, ["k"], "seq").collect()
    # NULL ops must not slip through isin()'s three-valued logic and
    # silently retire the base row
    null_op = spark.createDataFrame(
        [(1, "x", None, 1)], "k long, v string, op string, seq int"
    )
    with pytest.raises(Exception, match="unknown op 'NULL'"):
        apply_cdc(base, null_op, ["k"], "seq").collect()

    big_base = spark.range(200).select(
        F.col("id").alias("k"), F.concat(F.lit("v"), F.col("id")).alias("v")
    )
    changes = spark.range(0, 200, 3).select(
        F.col("id").alias("k"),
        F.lit("upd").alias("v"),
        F.lit("update").alias("op"),
        F.lit(1).alias("seq"),
    )
    a = sorted(map(tuple, apply_cdc(big_base, changes, ["k"], "seq").collect()))
    b = sorted(
        map(
            tuple,
            apply_cdc(
                big_base.repartition(7), changes.repartition(3), ["k"], "seq"
            ).collect(),
        )
    )
    assert a == b


def test_apply_cdc_randomized_python_differential(spark):
    """Random change logs vs a pure-python fold of the same ordering
    rule (seq desc, delete beats upsert at equal seq) — catches
    precedence/retirement drift the goldens might miss. The (key, seq,
    is_delete) triple is kept unique per the operator's contract."""
    import random

    from iot_sensor_data_pipeline_spark.operators.merge import apply_cdc

    rnd = random.Random(59)
    base_rows = [(k, f"base{k}") for k in range(30)]
    log_rows = []
    used = set()
    for _ in range(120):
        k = rnd.randrange(45)  # keys beyond the base exercise inserts
        seq = rnd.randrange(8)
        is_del = rnd.random() < 0.3
        if (k, seq, is_del) in used:
            continue
        used.add((k, seq, is_del))
        if is_del:
            log_rows.append((k, None, "delete", seq))
        else:
            op = "insert" if rnd.random() < 0.5 else "update"
            log_rows.append((k, f"v{k}_{seq}", op, seq))

    base = spark.createDataFrame(base_rows, "k long, v string")
    changes = spark.createDataFrame(log_rows, "k long, v string, op string, seq int")

    # python mirror: pick each key's winning log row, then fold
    winners: dict = {}
    for k, v, op, seq in log_rows:
        cur = winners.get(k)
        cand = (seq, 1 if op == "delete" else 0, v, op)
        if cur is None or cand[:2] > cur[:2]:
            winners[k] = cand
    want = dict(base_rows)
    for k, (seq, _d, v, op) in winners.items():
        if op == "delete":
            want.pop(k, None)
        else:
            want[k] = v

    got = {r.k: r.v for r in apply_cdc(base, changes, ["k"], "seq").collect()}
    assert got == want


def test_salt_cols_spreads_and_stays_deterministic(spark):
    """VERDICT r9 minor 2: salt_cols narrows the salt-hash input so
    wide-payload tables don't hash full rows per row. The distribution
    property (hot key spread over salts) and the retry-stability
    property (same row -> same salt, always) must both hold, and a
    MapType payload column — unhashable by F.hash — must not break the
    salt when excluded via salt_cols."""
    from pyspark.sql import functions as F

    n = 4000
    left = spark.range(n).select(
        F.lit("hot").alias("k"),
        F.col("id").alias("disc"),
        F.create_map(F.lit("a"), F.col("id")).alias("payload"),  # MapType
    )
    right = spark.createDataFrame([("hot", 1)], "k string, dim int")

    out = salted_join(left, right, ["k"], n_salts=8, salt_cols=["k", "disc"])
    assert out.count() == n
    # spread: the hot key's rows occupy every salt bucket
    salts = (
        left.withColumn("__s", F.pmod(F.hash("k", "disc"), F.lit(8)))
        .select("__s").distinct().count()
    )
    assert salts == 8
    # determinism: recomputation yields the identical assignment
    a = left.withColumn("__s", F.pmod(F.hash("k", "disc"), F.lit(8))).collect()
    b = left.withColumn("__s", F.pmod(F.hash("k", "disc"), F.lit(8))).collect()
    assert {r.disc: r["__s"] for r in a} == {r.disc: r["__s"] for r in b}

    # salted_agg with salt_cols: exact totals
    got = salted_agg(
        left, ["k"], sum_cols=["disc"], n_salts=8, salt_cols=["disc"]
    ).collect()
    assert len(got) == 1 and got[0].sum_disc == sum(range(n)) and got[0].n == n

    # unknown salt column fails loudly
    import pytest

    with pytest.raises(ValueError, match="salt_cols not in"):
        salted_join(left, right, ["k"], salt_cols=["nope"])
