"""Distribution-drift report (operators/drift.py): identical
distributions score ~0, a known shift matches an independent python
mirror, range escape surfaces in the overflow bins, and NULL/degenerate
inputs follow the undefined-is-NULL discipline."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from iot_sensor_data_pipeline_spark.operators.drift import PSI_EPS, drift_report


def _mirror(ref: list[float], cur: list[float], n_bins: int):
    """Independent python PSI/TVD over the same binning rule."""
    lo, hi = min(ref), max(ref)
    width = (hi - lo) / n_bins

    def bin_of(v):
        if width > 0:
            if v == hi:
                return n_bins - 1
            return min(max(math.floor((v - lo) / width), -1), n_bins)
        return -1 if v < lo else (n_bins if v > hi else 0)

    bins = list(range(-1, n_bins + 1))
    rc = {b: 0 for b in bins}
    cc = {b: 0 for b in bins}
    for v in ref:
        rc[bin_of(v)] += 1
    for v in cur:
        cc[bin_of(v)] += 1
    psi = tvd = 0.0
    for b in bins:
        p = max(rc[b] / len(ref), PSI_EPS)
        q = max(cc[b] / len(cur), PSI_EPS)
        psi += (p - q) * math.log(p / q)
        tvd += abs(rc[b] / len(ref) - cc[b] / len(cur))
    esc = (cc[-1] + cc[n_bins]) / len(cur)
    return round(psi, 6), round(0.5 * tvd, 6), round(esc, 6)


def test_identical_distributions_score_zero(spark):
    df = spark.range(1000).select((F.col("id") % 37).cast("double").alias("x"))
    got = {r.col: r for r in drift_report(df, df, ["x"]).collect()}
    assert got["x"].psi == pytest.approx(0.0, abs=1e-9)
    assert got["x"].tvd == 0.0
    assert got["x"].escaped_share == 0.0
    assert got["x"].n_ref == got["x"].n_cur == 1000


def test_shifted_distribution_matches_python_mirror(spark):
    ref_vals = [float((i * 7) % 100) for i in range(2000)]
    cur_vals = [float(((i * 7) % 100) + 30) for i in range(1500)]  # shift +30
    ref = spark.createDataFrame([(v,) for v in ref_vals], "x double")
    cur = spark.createDataFrame([(v,) for v in cur_vals], "x double")
    got = drift_report(ref, cur, ["x"], n_bins=16).collect()[0]
    psi, tvd, esc = _mirror(ref_vals, cur_vals, 16)
    assert got.psi == pytest.approx(psi, abs=1e-6)
    assert got.tvd == pytest.approx(tvd, abs=1e-6)
    assert got.escaped_share == pytest.approx(esc, abs=1e-6)
    assert got.psi > 0.2  # a +30% range shift is actionable drift
    assert got.escaped_share > 0  # part of cur escapes the ref range


def test_multi_column_one_report(spark):
    ref = spark.range(500).select(
        (F.col("id") % 10).cast("double").alias("a"),
        (F.col("id") % 3).cast("double").alias("b"),
    )
    cur = spark.range(500).select(
        (F.col("id") % 10).cast("double").alias("a"),  # unchanged
        ((F.col("id") % 3) + 100).cast("double").alias("b"),  # escaped
    )
    got = {r.col: r for r in drift_report(ref, cur, ["a", "b"]).collect()}
    assert set(got) == {"a", "b"}
    assert got["a"].psi == pytest.approx(0.0, abs=1e-9)
    assert got["b"].escaped_share == 1.0
    assert got["b"].psi > 1.0  # total separation


def test_constant_reference_column(spark):
    ref = spark.createDataFrame([(5.0,)] * 100, "x double")
    cur_same = spark.createDataFrame([(5.0,)] * 50, "x double")
    cur_off = spark.createDataFrame([(6.0,)] * 50, "x double")
    same = drift_report(ref, cur_same, ["x"]).collect()[0]
    assert same.psi == pytest.approx(0.0, abs=1e-9) and same.escaped_share == 0.0
    off = drift_report(ref, cur_off, ["x"]).collect()[0]
    assert off.escaped_share == 1.0 and off.psi > 1.0


def test_null_semantics(spark):
    ref = spark.createDataFrame([(1.0,), (2.0,), (None,)], "x double")
    cur_null = spark.createDataFrame([(None,)], "x double")
    row = drift_report(ref, cur_null, ["x"]).collect()[0]
    # no current distribution -> NULL metrics, never "0 = stable"
    assert row.n_cur == 0
    assert row.psi is None and row.tvd is None and row.escaped_share is None
    # NULLs excluded from counts on both sides
    assert row.n_ref == 2


def test_guards(spark):
    df = spark.createDataFrame([(1.0,)], "x double")
    with pytest.raises(ValueError, match="cols"):
        drift_report(df, df, [])
    with pytest.raises(ValueError, match="n_bins"):
        drift_report(df, df, ["x"], n_bins=1)
    allnull = spark.createDataFrame([(None,)], "x double")
    with pytest.raises(ValueError, match="non-null"):
        drift_report(allnull, df, ["x"])


def test_persisted_reference_matches_direct_report(spark, tmp_path):
    """build_drift_reference + drift_against_reference == drift_report:
    the persisted-histogram path (the per-micro-batch monitor form)
    must score identically to the two-scan form, and re-building the
    reference commits a new version without breaking a reader."""
    from iot_sensor_data_pipeline_spark.operators.drift import (
        build_drift_reference,
        drift_against_reference,
    )

    ref = spark.range(2000).select(
        ((F.col("id") * 7) % 100).cast("double").alias("x"),
        ((F.col("id") * 3) % 50).cast("double").alias("y"),
    )
    cur = spark.range(1500).select(
        (((F.col("id") * 7) % 100) + 30).cast("double").alias("x"),
        ((F.col("id") * 3) % 50).cast("double").alias("y"),
    )
    ref_dir = str(tmp_path / "drift_ref")
    build_drift_reference(ref, ["x", "y"], ref_dir, n_bins=16)

    direct = {r.col: r for r in drift_report(ref, cur, ["x", "y"], 16).collect()}
    stored = {r.col: r for r in drift_against_reference(cur, ref_dir).collect()}
    assert set(direct) == set(stored) == {"x", "y"}
    for c in ("x", "y"):
        assert stored[c].psi == direct[c].psi
        assert stored[c].tvd == direct[c].tvd
        assert stored[c].escaped_share == direct[c].escaped_share
        assert stored[c].n_ref == direct[c].n_ref

    # columns missing from current are omitted, not zero-scored
    only_x = drift_against_reference(cur.select("x"), ref_dir).collect()
    assert [r.col for r in only_x] == ["x"]

    # rebuilding commits a new version; scoring still works
    build_drift_reference(ref, ["x"], ref_dir, n_bins=8)
    again = drift_against_reference(cur, ref_dir).collect()
    assert [r.col for r in again] == ["x"]

    with pytest.raises(ValueError, match="no reference column"):
        drift_against_reference(cur.selectExpr("x AS zzz"), ref_dir)


def test_column_all_null_in_reference_is_omitted(spark):
    """Review regression: a column that is all-NULL in the reference
    but populated in the current snapshot must be OMITTED (documented —
    no distribution to drift from), not crash with DIVIDE_BY_ZERO under
    ANSI mode or emit a spurious n_ref=0 row."""
    ref = spark.createDataFrame(
        [(1.0, None), (2.0, None), (3.0, None)], "x double, y double"
    )
    cur = spark.createDataFrame([(1.5, 9.0), (2.5, 10.0)], "x double, y double")
    got = drift_report(ref, cur, ["x", "y"]).collect()
    assert [r.col for r in got] == ["x"]
    assert got[0].n_ref == 3 and got[0].n_cur == 2


def test_schema_drift(spark):
    from iot_sensor_data_pipeline_spark.operators.drift import schema_drift

    ref = spark.createDataFrame([(1.0, "a", 1)], "x double, s string, gone int")
    cur = spark.createDataFrame([(1.0, 2, 5.0)], "x double, s int, fresh double")
    got = {r.col: r for r in schema_drift(ref, cur).collect()}
    assert set(got) == {"s", "gone", "fresh"}
    assert got["gone"].change == "removed" and got["gone"].ref_type == "int"
    assert got["fresh"].change == "added" and got["fresh"].cur_type == "double"
    assert got["s"].change == "retyped" and (got["s"].ref_type, got["s"].cur_type) == ("string", "int")
    # agreeing schemas -> empty relation with the report schema
    same = schema_drift(ref, ref)
    assert same.count() == 0
    assert same.columns == ["col", "change", "ref_type", "cur_type"]


def test_categorical_drift(spark):
    """Python-mirror differential plus the bucket semantics: top-K
    reference categories, <OTHER> fold, <NULL> as a real bucket, and
    unseen_share counting exact-value novelty."""
    from iot_sensor_data_pipeline_spark.operators.drift import (
        drift_report_categorical,
    )

    ref_vals = ["en"] * 60 + ["fr"] * 30 + ["de"] * 8 + ["it", "pt"] + [None] * 5
    cur_vals = ["en"] * 30 + ["fr"] * 50 + ["zz"] * 15 + [None] * 10
    ref = spark.createDataFrame([(v,) for v in ref_vals], "lang string")
    cur = spark.createDataFrame([(v,) for v in cur_vals], "lang string")
    got = drift_report_categorical(ref, cur, ["lang"], top_k=3).collect()[0]

    # python mirror over the same bucketing rule
    import math
    from collections import Counter

    rc = Counter("<NULL>" if v is None else v for v in ref_vals)
    cc = Counter("<NULL>" if v is None else v for v in cur_vals)
    top = [v for v, _ in sorted(rc.items(), key=lambda kv: (-kv[1], kv[0]))[:3]]
    top = set(top) | {"<NULL>"}  # <NULL> is always its own bucket
    buckets = set(top) | {"<OTHER>"}
    rb = Counter({b: 0 for b in buckets})
    cb = Counter({b: 0 for b in buckets})
    for v, n in rc.items():
        rb[v if v in top else "<OTHER>"] += n
    for v, n in cc.items():
        cb[v if v in top else "<OTHER>"] += n
    n_ref, n_cur = sum(rc.values()), sum(cc.values())
    psi = tvd = 0.0
    for b in sorted(set(rb) | set(cb)):
        p = max(rb[b] / n_ref, PSI_EPS)
        q = max(cb[b] / n_cur, PSI_EPS)
        psi += (p - q) * math.log(p / q)
        tvd += abs(rb[b] / n_ref - cb[b] / n_cur)
    unseen = sum(
        n for v, n in cc.items() if v not in rc and v != "<NULL>"
    ) / n_cur

    assert got.n_ref == n_ref and got.n_cur == n_cur
    assert got.psi == pytest.approx(round(psi, 6), abs=1e-6)
    assert got.tvd == pytest.approx(round(0.5 * tvd, 6), abs=1e-6)
    assert got.unseen_share == pytest.approx(round(unseen, 6), abs=1e-6)
    assert got.unseen_share == pytest.approx(15 / 105, abs=1e-6)  # 'zz' only
    assert got.psi > 0.2  # the en->fr share flip is actionable

    # identical snapshots score zero across the board
    same = drift_report_categorical(ref, ref, ["lang"], top_k=3).collect()[0]
    assert same.psi == pytest.approx(0.0, abs=1e-9)
    assert same.tvd == 0.0 and same.unseen_share == 0.0


def test_reference_rebuild_mid_stream_is_atomic(spark, tmp_path):
    """VERDICT r10 task 8: a reference rebuild between micro-batches is
    picked up ATOMICALLY — every epoch's score rows come from exactly
    one committed reference version (the scorer re-resolves the newest
    v<N> per batch; the versioned commit guarantees a concurrent reader
    never sees a half-written one). Epoch 0 scores against v1, the
    rebuild commits v2 with different bin geometry, epoch 1 scores
    against v2 — for BOTH columns, never a mix."""
    import json as _json

    from iot_sensor_data_pipeline_spark.operators.drift import (
        build_drift_reference,
        drift_against_reference,
    )
    from iot_sensor_data_pipeline_spark.streaming.jobs import start_drift_monitor

    ref_dir = str(tmp_path / "ref")
    # v1 reference: x in [0, 100), y in [0, 10)
    ref_v1 = spark.range(2000).selectExpr(
        "CAST(id % 100 AS DOUBLE) AS x", "CAST(id % 10 AS DOUBLE) AS y"
    )
    build_drift_reference(ref_v1, ["x", "y"], ref_dir, n_bins=16)

    src = tmp_path / "src"
    src.mkdir()
    scores = str(tmp_path / "scores")
    ckpt = str(tmp_path / "ckpt")

    def run():
        stream = spark.readStream.schema("x double, y double").json(str(src))
        q = start_drift_monitor(stream, ref_dir, scores, ckpt,
                                available_now=True)
        q.awaitTermination(120)

    batch_rows = [
        _json.dumps({"x": float((i * 7) % 100 + 30), "y": float(i % 10)})
        for i in range(1000)
    ]
    batch_df = spark.createDataFrame(
        [(float((i * 7) % 100 + 30), float(i % 10)) for i in range(1000)],
        "x double, y double",
    )
    # expected per-version reports for the SAME batch content, computed
    # through the identical scoring path (newest version at call time)
    expect_v1 = {r.col: r for r in
                 drift_against_reference(batch_df, ref_dir).collect()}

    (src / "b0.json").write_text("\n".join(batch_rows))
    run()  # epoch 0 scores against v1

    # rebuild mid-stream: v2 shifts BOTH columns' reference ranges, so
    # every column's psi/escaped_share changes measurably
    ref_v2 = spark.range(2000).selectExpr(
        "CAST(id % 100 + 30 AS DOUBLE) AS x", "CAST(id % 10 + 5 AS DOUBLE) AS y"
    )
    build_drift_reference(ref_v2, ["x", "y"], ref_dir, n_bins=16)
    expect_v2 = {r.col: r for r in
                 drift_against_reference(batch_df, ref_dir).collect()}

    (src / "b1.json").write_text("\n".join(batch_rows))
    run()  # epoch 1 scores against v2

    got = spark.read.parquet(scores).collect()
    by_epoch = {}
    for r in got:
        by_epoch.setdefault(r.epoch, {})[r.col] = r
    assert set(by_epoch) == {0, 1}
    for col in ("x", "y"):
        # the two versions genuinely disagree (else the test proves
        # nothing) ...
        assert expect_v1[col].psi != expect_v2[col].psi, col
        # ... and each epoch matches exactly one version, both columns
        assert by_epoch[0][col].psi == expect_v1[col].psi, col
        assert by_epoch[0][col].escaped_share == expect_v1[col].escaped_share
        assert by_epoch[1][col].psi == expect_v2[col].psi, col
        assert by_epoch[1][col].escaped_share == expect_v2[col].escaped_share


def test_categorical_reference_stored_equals_direct(spark, tmp_path):
    """r11: a persisted categorical reference scores a current batch
    IDENTICALLY to the direct drift_report_categorical (shared
    bucketing/finalize helpers), including unseen-value shares and the
    always-present <NULL> bucket when the reference had no NULLs."""
    from iot_sensor_data_pipeline_spark.operators.drift import (
        build_drift_reference_categorical,
        drift_against_reference,
        drift_report_categorical,
    )

    ref = spark.createDataFrame(
        [("en", "web")] * 50 + [("fr", "web")] * 30 + [("de", "books")] * 15
        + [("es", "books")] * 5,
        "lang string, source string",
    )
    cur = spark.createDataFrame(
        [("en", "web")] * 20 + [("fr", None)] * 25 + [("zz", "books")] * 10
        + [("de", "crawl")] * 5,
        "lang string, source string",
    )
    direct = {
        r.col: r
        for r in drift_report_categorical(ref, cur, ["lang", "source"],
                                          top_k=3).collect()
    }
    ref_dir = str(tmp_path / "cref")
    build_drift_reference_categorical(ref, ["lang", "source"], ref_dir, top_k=3)
    stored = {
        r.col: r for r in drift_against_reference(cur, ref_dir).collect()
    }
    assert set(stored) == set(direct) == {"lang", "source"}
    for c in direct:
        for f in ("n_ref", "n_cur", "psi", "tvd", "unseen_share"):
            assert stored[c][f] == direct[c][f], (c, f)
    # sanity on the semantics themselves
    assert stored["lang"].unseen_share == round(10 / 60, 6)  # 'zz'
    assert stored["source"].unseen_share == round(5 / 60, 6)  # 'crawl'


def test_categorical_reference_buckets_frozen_at_build(spark, tmp_path):
    """The stored top-K is frozen at build time: two different current
    batches score against the SAME bucket set (a per-batch re-rank
    would make monitor scores incomparable across batches)."""
    from iot_sensor_data_pipeline_spark.operators.drift import (
        build_drift_reference_categorical,
        drift_against_reference,
    )

    ref = spark.createDataFrame(
        [("a",)] * 40 + [("b",)] * 30 + [("c",)] * 2, "lab string"
    )
    ref_dir = str(tmp_path / "cref2")
    build_drift_reference_categorical(ref, ["lab"], ref_dir, top_k=2)

    same = spark.createDataFrame(
        [("a",)] * 40 + [("b",)] * 30 + [("c",)] * 2, "lab string"
    )
    skew = spark.createDataFrame([("c",)] * 70, "lab string")
    r_same = drift_against_reference(same, ref_dir).first()
    r_skew = drift_against_reference(skew, ref_dir).first()
    assert r_same.psi < 0.01 and r_same.unseen_share == 0.0
    # 'c' is NOT top-2: its mass lands in <OTHER>, psi explodes, and it
    # is NOT unseen (the exact vocab remembers it)
    assert r_skew.psi > 1.0 and r_skew.unseen_share == 0.0


def test_drift_monitor_dispatches_on_categorical_reference(spark, tmp_path):
    """start_drift_monitor works unchanged over a categorical
    reference — the scorer detects the stored relation's flavor."""
    import json as _json

    from iot_sensor_data_pipeline_spark.operators.drift import (
        build_drift_reference_categorical,
    )
    from iot_sensor_data_pipeline_spark.streaming.jobs import start_drift_monitor

    ref = spark.createDataFrame(
        [("en",)] * 80 + [("fr",)] * 20, "lang string"
    )
    ref_dir = str(tmp_path / "cref3")
    build_drift_reference_categorical(ref, ["lang"], ref_dir, top_k=5)

    src = tmp_path / "src"
    src.mkdir()
    scores = str(tmp_path / "scores")
    ckpt = str(tmp_path / "ckpt")
    alerts = []

    def run():
        q = start_drift_monitor(
            spark.readStream.schema("lang string").json(str(src)),
            ref_dir, scores, ckpt, psi_threshold=0.2,
            on_drift=lambda e, rows: alerts.append(e), available_now=True,
        )
        q.awaitTermination(120)

    (src / "b0.json").write_text(
        "\n".join(_json.dumps({"lang": "en" if i % 5 else "fr"})
                  for i in range(500))
    )
    run()
    (src / "b1.json").write_text(
        "\n".join(_json.dumps({"lang": "xx"}) for i in range(500))
    )
    run()
    got = {r.epoch: r for r in spark.read.parquet(scores).collect()}
    assert got[0].psi < 0.05 and got[0].unseen_share == 0.0
    assert got[1].psi > 0.2 and got[1].unseen_share == 1.0
    assert alerts == [1]
