"""Distribution-drift report between two snapshots of a table — the
statistical complement to row-level ``operators/merge.snapshot_diff``
(which tells you WHICH rows changed; this tells you whether the
DISTRIBUTION moved). The standard gate in a training-data pipeline:
before a new crawl/refresh replaces the reference corpus, score each
feature column's Population Stability Index and total-variation
distance against the reference; a quality score whose PSI jumps past
~0.2 means the upstream changed and the mixing weights/filters need
re-tuning (PSI thresholds are the published credit-scoring convention:
<0.1 stable, 0.1-0.2 moderate, >0.2 action).

Design (engine-exact on purpose, so the DuckDB oracle hash-matches):

- **Fixed-width bins over the REFERENCE's [min, max]**, not quantile
  edges — quantile edges are engine-specific (interpolation, sampling)
  while ``(v - min) / width`` is pure arithmetic that any engine
  reproduces bit-for-bit. Two OVERFLOW bins (-1 and n_bins) catch
  current values outside the reference range — range escape IS drift
  and must not silently clamp into the edge bins.
- **One scan per side for every column**: the wide table unpivots to
  (col, value) long form (``stack``), so adding columns adds zero
  scans. The reference min/max per column is ONE aggregated row
  collected to the driver (2 x n_cols scalars — metadata grain) and
  re-enters the plan as literals.
- **PSI with explicit epsilon flooring** (``max(share, 1e-6)``): the
  conventional guard against empty-bin log blowups, chosen as a pure
  expression both engines evaluate identically (Laplace smoothing
  would couple the result to bin counts). TVD needs no smoothing and
  is reported alongside: ``0.5 * sum(|p - q|)``.

Shuffle inventory: two scans (ref, cur), each feeding ONE map-side
combined groupBy on (col, bin) — at most ``n_cols * (n_bins + 2)``
grouped rows — then a tiny full-outer join and a per-col re-agg. No
windows, no driver loops over data, no UDFs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "drift_report",
    "build_drift_reference",
    "drift_against_reference",
    "schema_drift",
    "drift_report_categorical",
    "build_drift_reference_categorical",
]

#: empty-bin share floor for the PSI log ratio (engine-portable pure
#: expression; the conventional epsilon guard)
PSI_EPS = 1e-6


def _quoted(c: str) -> str:
    """Backtick-quoted identifier for the generated stack/CAST SQL —
    names with spaces, dots, or reserved words must parse as ONE
    column reference, not misparse the expression (ADVICE r10).
    Backticks and single quotes are rejected (the name doubles as a
    string literal label in the same expression)."""
    if "`" in c or "'" in c:
        raise ValueError(
            f"drift: column name {c!r} contains a quote character — "
            "rename the column before building a drift report"
        )
    return f"`{c}`"


def _long_form(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """(col, value) long form: one output row per non-null cell."""
    pairs = ", ".join(f"'{c}', CAST({_quoted(c)} AS DOUBLE)" for c in cols)
    return df.selectExpr(
        f"stack({len(cols)}, {pairs}) AS (col, value)"
    ).where(F.col("value").isNotNull())


def _binned_counts(
    long: DataFrame, stats: dict[str, tuple[float, float]], n_bins: int
) -> DataFrame:
    """(col, bin, n) with bin in [-1, n_bins]: fixed-width bins over
    the reference [min, max]; -1 / n_bins are the overflow bins; a
    zero-width (constant) reference column maps in-range values to bin
    0. The bin rule is plain arithmetic so DuckDB reproduces it."""
    bin_expr = F.lit(None).cast("long")
    for c, (lo, hi) in stats.items():
        width = (hi - lo) / n_bins
        if width > 0:
            e = F.least(
                F.greatest(
                    F.floor((F.col("value") - F.lit(lo)) / F.lit(width)),
                    F.lit(-1).cast("long"),
                ),
                F.lit(n_bins).cast("long"),
            )
            # v == hi lands on floor == n_bins: in-range by definition,
            # fold into the last real bin (overflow is STRICTLY > hi)
            e = F.when(F.col("value") == F.lit(hi), F.lit(n_bins - 1)).otherwise(e)
        else:
            e = (
                F.when(F.col("value") < F.lit(lo), F.lit(-1))
                .when(F.col("value") > F.lit(hi), F.lit(n_bins))
                .otherwise(F.lit(0))
            ).cast("long")
        bin_expr = F.when(F.col("col") == c, e).otherwise(bin_expr)
    return long.select("col", bin_expr.alias("bin")).groupBy("col", "bin").agg(
        F.count(F.lit(1)).alias("n")
    )


def _reference_stats(
    reference: DataFrame, cols: Sequence[str]
) -> dict[str, tuple[float, float]]:
    """Per-column reference (min, max) from ONE aggregated row
    (metadata-grain driver collect, 2 x n_cols scalars); columns with
    no non-null reference rows are dropped — there is no distribution
    to drift from. Shared by the direct and persisted-reference paths
    so the two can never disagree on stats semantics."""
    row = reference.agg(
        *[F.min(F.col(_quoted(c)).cast("double")).alias(f"lo_{c}") for c in cols],
        *[F.max(F.col(_quoted(c)).cast("double")).alias(f"hi_{c}") for c in cols],
    ).first()
    stats = {
        c: (row[f"lo_{c}"], row[f"hi_{c}"])
        for c in cols
        if row[f"lo_{c}"] is not None
    }
    if not stats:
        raise ValueError("no reference column has non-null rows")
    return stats


def drift_report(
    reference: DataFrame,
    current: DataFrame,
    cols: Sequence[str],
    n_bins: int = 16,
) -> DataFrame:
    """Per-column drift of ``current`` against ``reference``.

    Returns one row per column: ``(col, n_ref, n_cur, psi, tvd,
    escaped_share)`` where ``psi`` is the Population Stability Index
    over ``n_bins`` fixed-width reference bins plus two overflow bins,
    ``tvd`` the total-variation distance (0.5 * L1) over the same
    bins, and ``escaped_share`` the fraction of current rows outside
    the reference [min, max] (range escape reported explicitly, not
    hidden inside edge bins). NULLs are excluded on both sides
    (``n_ref``/``n_cur`` count non-null cells); a column with no
    non-null reference rows is omitted — there is no distribution to
    drift from. Floats are rounded to 6dp so cross-engine summation
    order cannot flip the hash."""
    cols = list(cols)
    if not cols:
        raise ValueError("drift_report: cols must be non-empty")
    if n_bins < 2:
        raise ValueError("drift_report: n_bins must be >= 2")
    stats = _reference_stats(reference, cols)
    # both long forms cover only the stats-bearing columns: a column
    # that is all-NULL in the reference is OMITTED (documented) — the
    # current side must not smuggle it back in as an n_ref=0 row
    ref_long = _long_form(reference, list(stats))
    cur_long = _long_form(current, list(stats))
    ref_counts = _binned_counts(ref_long, stats, n_bins).withColumnRenamed(
        "n", "n_ref_bin"
    )
    cur_counts = _binned_counts(cur_long, stats, n_bins).withColumnRenamed(
        "n", "n_cur_bin"
    )
    return _report_from_counts(ref_counts, cur_counts, n_bins)


def _report_from_counts(
    ref_counts: DataFrame,
    cur_counts: DataFrame,
    n_bins: int | None = None,
    key_col: str = "bin",
) -> DataFrame:
    """(col, n_ref, n_cur, psi, tvd[, escaped_share]) from the two
    (col, key)-grain count relations. ONE implementation for the
    numeric (key='bin', escaped = overflow-bin mass when ``n_bins`` is
    given) and categorical (key='bucket', no escaped column) reports —
    the PSI/TVD formulas, the coalesce-to-0 merge, and the
    undefined-is-NULL guard must never drift between the two."""
    # union + re-aggregate instead of a FULL OUTER join: each side is
    # (col, key)-unique (groupBy outputs), so summing the zero-padded
    # union is exactly the coalesce-to-0 outer merge — but it is ONE
    # hash aggregate instead of a sort-merge join (full outer cannot
    # broadcast), and the per-col totals come from a window over the
    # already-merged rows instead of a second aggregate + join back
    # (r14: 2 SortMergeJoins + 3 Exchanges -> 2 Exchanges on this path)
    zero = F.lit(0).cast("long")
    merged = (
        ref_counts.select(
            "col", key_col, F.col("n_ref_bin"), zero.alias("n_cur_bin")
        )
        .unionByName(
            cur_counts.select(
                "col", key_col, zero.alias("n_ref_bin"), F.col("n_cur_bin")
            )
        )
        .groupBy("col", key_col)
        .agg(
            F.sum("n_ref_bin").alias("n_ref_bin"),
            F.sum("n_cur_bin").alias("n_cur_bin"),
        )
    )
    w_col = Window.partitionBy("col")
    merged = merged.select(
        "col",
        key_col,
        "n_ref_bin",
        "n_cur_bin",
        F.sum("n_ref_bin").over(w_col).alias("n_ref"),
        F.sum("n_cur_bin").over(w_col).alias("n_cur"),
    )
    # try_divide: either side may be empty and ANSI mode rejects /0;
    # the guard below turns the metrics NULL anyway
    p = F.greatest(
        F.try_divide(F.col("n_ref_bin"), F.col("n_ref")), F.lit(PSI_EPS)
    )
    q = F.greatest(
        F.try_divide(F.col("n_cur_bin"), F.col("n_cur")), F.lit(PSI_EPS)
    )
    aggs = [
        F.first("n_ref").alias("n_ref"),
        F.first("n_cur").alias("n_cur"),
        F.round(F.sum((p - q) * F.log(p / q)), 6).alias("psi"),
        F.round(
            F.lit(0.5)
            * F.sum(
                F.abs(
                    F.try_divide(F.col("n_ref_bin"), F.col("n_ref"))
                    - F.try_divide(F.col("n_cur_bin"), F.col("n_cur"))
                )
            ),
            6,
        ).alias("tvd"),
    ]
    metrics = ["psi", "tvd"]
    if n_bins is not None:
        escaped = F.when(
            (F.col(key_col) == -1) | (F.col(key_col) == n_bins),
            F.col("n_cur_bin"),
        ).otherwise(F.lit(0))
        aggs.append(
            F.round(
                F.try_divide(F.sum(escaped), F.first("n_cur")), 6
            ).alias("escaped_share")
        )
        metrics.append("escaped_share")
    # the window above hash-partitioned merged by col, so this final
    # aggregate reuses that partitioning (no new Exchange)
    out = merged.groupBy("col").agg(*aggs)
    # an empty side has no distribution to compare: metrics are NULL
    # (undefined), never 0 (stable) — the ranking_metrics
    # NULL-semantics discipline
    guard = (F.col("n_cur") > 0) & (F.col("n_ref") > 0)
    return out.select(
        "col",
        "n_ref",
        "n_cur",
        *[F.when(guard, F.col(m)).alias(m) for m in metrics],
    )


# ---------------------------------------------------------------------------
# persisted drift reference: build the reference histogram ONCE, score
# any number of later batches against it without rescanning the
# reference — the streaming-monitor form of drift_report
# ---------------------------------------------------------------------------


def build_drift_reference(
    reference: DataFrame, cols: Sequence[str], ref_dir: str, n_bins: int = 16
) -> None:
    """Persist the reference side of :func:`drift_report` at
    ``ref_dir``: one denormalized parquet relation ``(col, bin, n,
    lo, hi, n_bins)`` — counts plus the bin geometry in one place, so a
    scorer needs no side-channel metadata. Build cost is one scan of
    the reference; every later :func:`drift_against_reference` call
    pays only the CURRENT side's scan (the reference never rescans),
    which is what a per-micro-batch monitor needs. Committed via the
    versioned-metadata discipline (``v<N>`` dirs) so re-building a
    reference never races a concurrent scorer."""
    from iot_sensor_data_pipeline_spark.sources.manifest import (
        _commit_version_in,
    )

    cols = list(cols)
    if not cols:
        raise ValueError("build_drift_reference: cols must be non-empty")
    if n_bins < 2:
        raise ValueError("build_drift_reference: n_bins must be >= 2")
    stats = _reference_stats(reference, cols)
    counts = _binned_counts(_long_form(reference, list(stats)), stats, n_bins)
    geom = F.lit(None).cast("double")
    lo_expr, hi_expr = geom, geom
    for c, (lo, hi) in stats.items():
        lo_expr = F.when(F.col("col") == c, F.lit(lo)).otherwise(lo_expr)
        hi_expr = F.when(F.col("col") == c, F.lit(hi)).otherwise(hi_expr)
    rel = counts.select(
        "col", "bin", "n",
        lo_expr.alias("lo"), hi_expr.alias("hi"),
        F.lit(n_bins).cast("int").alias("n_bins"),
    )
    _commit_version_in(reference.sparkSession, ref_dir, rel)


def drift_against_reference(current: DataFrame, ref_dir: str) -> DataFrame:
    """Score ``current`` against a persisted reference: same output
    contract as :func:`drift_report` (numeric references —
    :func:`build_drift_reference`) or
    :func:`drift_report_categorical` (categorical references —
    :func:`build_drift_reference_categorical`; detected by the stored
    relation's schema), but the reference side is the stored relation —
    cost is one scan of ``current`` plus the tiny count relation.
    Columns absent from ``current`` are omitted (a SCHEMA drift —
    detect it by diffing ``df.columns``, not distributions)."""
    from iot_sensor_data_pipeline_spark.sources.manifest import (
        _read_versioned_in,
    )

    spark = current.sparkSession
    ref = _read_versioned_in(spark, ref_dir)
    if "is_top" in ref.columns:
        return _categorical_against_reference(current, ref, ref_dir)
    meta = ref.select("col", "lo", "hi", "n_bins").distinct().collect()
    if not meta:
        raise ValueError(f"empty drift reference at {ref_dir}")
    n_bins = int(meta[0]["n_bins"])
    stats = {
        r["col"]: (r["lo"], r["hi"]) for r in meta if r["col"] in current.columns
    }
    if not stats:
        raise ValueError(
            "drift_against_reference: no reference column present in the "
            f"current DataFrame (reference has {sorted(r['col'] for r in meta)})"
        )
    ref_counts = (
        ref.where(F.col("col").isin(list(stats)))
        .select("col", "bin", F.col("n").alias("n_ref_bin"))
    )
    cur_counts = _binned_counts(
        _long_form(current, list(stats)), stats, n_bins
    ).withColumnRenamed("n", "n_cur_bin")
    return _report_from_counts(ref_counts, cur_counts, n_bins)


def schema_drift(reference: DataFrame, current: DataFrame) -> DataFrame:
    """Schema-level drift between two snapshots: one row per column
    whose presence or type changed — ``(col, change, ref_type,
    cur_type)`` with change in {'added', 'removed', 'retyped'}.
    Unchanged columns are omitted (empty result == schemas agree).

    The complement :func:`drift_report` assumes: distribution drift is
    only defined for columns both sides HAVE; a column that vanished or
    changed type is upstream breakage the distribution gate would
    silently omit (documented there). Pure metadata — no jobs, no
    scans; the result is a local relation so it composes with the
    report tables."""
    ref_t = {f.name: f.dataType.simpleString() for f in reference.schema.fields}
    cur_t = {f.name: f.dataType.simpleString() for f in current.schema.fields}
    rows = []
    for c in sorted(set(ref_t) | set(cur_t)):
        if c not in cur_t:
            rows.append((c, "removed", ref_t[c], None))
        elif c not in ref_t:
            rows.append((c, "added", None, cur_t[c]))
        elif ref_t[c] != cur_t[c]:
            rows.append((c, "retyped", ref_t[c], cur_t[c]))
    return reference.sparkSession.createDataFrame(
        rows, "col string, change string, ref_type string, cur_type string"
    )


def drift_report_categorical(
    reference: DataFrame,
    current: DataFrame,
    cols: Sequence[str],
    top_k: int = 100,
) -> DataFrame:
    """Categorical drift — the share-shift counterpart of
    :func:`drift_report` for label-like columns (language, source
    domain, event type): the distributions a curation pipeline actually
    tracks between corpus refreshes. Per column: the reference's top-K
    categories (deterministic rank: count desc, then value asc) each
    form a bucket, everything else folds into ``<OTHER>``, NULL is
    ALWAYS its own ``<NULL>`` bucket — rank-independent (a NULL-share
    jump is real drift — the numeric report's exclude-NULLs rule does
    not fit labels; a genuine label string equal to '<NULL>'/'<OTHER>'
    aliases with the sentinels, acceptable at report grain exactly as
    skew_report documents), and the
    same epsilon-floored PSI / TVD formulas apply over the bucket
    shares. ``unseen_share`` additionally reports the fraction of
    current rows whose exact value never occurs in the reference — a
    stronger upstream-change signal than OTHER growth (OTHER also
    absorbs known-but-rare categories).

    Intended for LOW-cardinality categorical columns: the per-(col,
    value) count relations are vocabulary-sized (a groupBy, map-side
    combined — never a value collapse), and top_k bounds the compared
    bucket set. Deterministic end to end, so the whole pipeline
    hash-matches a SQL oracle cross-engine. Floats round to 6dp."""
    cols = list(cols)
    if not cols:
        raise ValueError("drift_report_categorical: cols must be non-empty")
    if top_k < 1:
        raise ValueError("drift_report_categorical: top_k must be >= 1")
    # each side's vocabulary-grain count relation is referenced 2-3x
    # downstream (top ranking, bucket fold, unseen check) — checkpoint
    # lazily so the full-table scan+aggregate runs ONCE per side, not
    # per reference (r14: 5 table scans -> 2; lazy RDD storage is
    # reclaimed by the ContextCleaner, the minhash/span-dedup
    # discipline). The relation itself is vocabulary-sized.
    ref_counts = _cat_long_counts(reference, cols).localCheckpoint(eager=False)
    cur_counts = _cat_long_counts(current, cols).localCheckpoint(eager=False)
    top = _cat_top(
        ref_counts,
        ref_counts.select("col").unionByName(cur_counts.select("col")),
        top_k,
    )
    report = _report_from_counts(
        _cat_bucketed(ref_counts, top, "n_ref_bin"),
        _cat_bucketed(cur_counts, top, "n_cur_bin"),
        key_col="bucket",
    )
    return _cat_finalize(report, cur_counts, ref_counts.select("col", "val"))


def _cat_long_counts(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """(col, val, n) vocabulary-grain counts; NULL renders as the
    '<NULL>' sentinel (the always-own-bucket rule)."""
    pairs = ", ".join(
        f"'{c}', coalesce(CAST({_quoted(c)} AS STRING), '<NULL>')"
        for c in cols
    )
    return (
        df.selectExpr(f"stack({len(cols)}, {pairs}) AS (col, val)")
        .groupBy("col", "val")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _cat_top(ref_counts: DataFrame, col_source: DataFrame, top_k: int) -> DataFrame:
    """The bucket vocabulary: the reference's deterministic top-K
    (count desc, value asc) plus an ALWAYS-present '<NULL>' bucket per
    column of ``col_source`` — '<NULL>' is rank-independent (a
    NULL-share jump diluted inside <OTHER> would hide exactly the
    drift that bucket exists to surface)."""
    from pyspark.sql import Window

    w = Window.partitionBy("col").orderBy(F.col("n").desc(), F.col("val").asc())
    nulls = (
        col_source.select("col").distinct()
        .select("col", F.lit("<NULL>").alias("val"))
    )
    return (
        ref_counts.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= top_k)
        .select("col", "val")
        .unionByName(nulls)
        .distinct()
    )


def _cat_bucketed(counts: DataFrame, top: DataFrame, n_col: str) -> DataFrame:
    """Fold vocabulary counts into bucket counts: top values keep
    their own bucket, everything else sums into '<OTHER>'.

    ``top`` is at most (top_k + 1) rows per column by construction, so
    it broadcasts — the counts side (vocabulary-grain, unbounded for a
    high-cardinality column) never reshuffles for this join."""
    return (
        counts.join(
            F.broadcast(top.withColumn("__is_top", F.lit(True))),
            ["col", "val"],
            "left",
        )
        .select(
            "col",
            F.when(F.col("__is_top"), F.col("val"))
            .otherwise(F.lit("<OTHER>"))
            .alias("bucket"),
            "n",
        )
        .groupBy("col", "bucket")
        .agg(F.sum("n").alias(n_col))
    )


def _cat_finalize(
    report: DataFrame, cur_counts: DataFrame, ref_vocab: DataFrame
) -> DataFrame:
    """Attach ``unseen_share``: current VALUES with no reference
    occurrence at all (exact value, not bucket). '<NULL>' is excluded —
    NULL is not a novel label; its movement is the <NULL> bucket's
    job. Shared by the direct and persisted-reference paths so the two
    cannot diverge (the _report_from_counts discipline)."""
    unseen = (
        cur_counts.where(F.col("val") != "<NULL>")
        .join(ref_vocab, ["col", "val"], "left_anti")
        .groupBy("col")
        .agg(F.sum("n").alias("__unseen"))
    )
    guard = (F.col("n_cur") > 0) & (F.col("n_ref") > 0)
    # unseen is one row per column — always broadcastable
    return report.join(F.broadcast(unseen), "col", "left").select(
        "col",
        "n_ref",
        "n_cur",
        "psi",
        "tvd",
        F.when(
            guard,
            F.round(
                F.coalesce(F.col("__unseen"), F.lit(0)) / F.col("n_cur"), 6
            ),
        ).alias("unseen_share"),
    )


def build_drift_reference_categorical(
    reference: DataFrame, cols: Sequence[str], ref_dir: str, top_k: int = 100
) -> None:
    """Persist the reference side of :func:`drift_report_categorical`
    at ``ref_dir``: the full vocabulary-grain count relation ``(col,
    val, n, is_top)`` — exact counts (so unseen-value detection stays
    exact) plus the deterministic top-K flag (so the bucket set is
    frozen at build time, not re-derived per batch). '<NULL>' is
    materialized as an ``is_top`` row (n=0 when the reference had no
    NULLs) because the sentinel bucket must exist regardless of rank.
    Same versioned-commit discipline as :func:`build_drift_reference`;
    :func:`drift_against_reference` detects which flavor a directory
    holds and scores accordingly — one monitor entry point for numeric
    and categorical columns."""
    from iot_sensor_data_pipeline_spark.sources.manifest import (
        _commit_version_in,
    )

    cols = list(cols)
    if not cols:
        raise ValueError(
            "build_drift_reference_categorical: cols must be non-empty"
        )
    if top_k < 1:
        raise ValueError("build_drift_reference_categorical: top_k must be >= 1")
    ref_counts = _cat_long_counts(reference, cols)
    top = _cat_top(ref_counts, ref_counts.select("col"), top_k)
    # every column must surface even if the reference df is empty for
    # it — stack always emits the col, so ref_counts covers all cols
    # with at least the '<NULL>' row when rows exist; an entirely empty
    # reference is a caller bug caught by the scorer's n_ref guard
    rel = (
        ref_counts.join(
            top.withColumn("__t", F.lit(True)), ["col", "val"], "left"
        )
        .select(
            "col", "val", "n",
            F.coalesce(F.col("__t"), F.lit(False)).alias("is_top"),
        )
        .unionByName(
            # '<NULL>' top rows absent from the counts (reference had
            # no NULLs): materialize with n=0 so the bucket exists
            top.where(F.col("val") == "<NULL>")
            .join(ref_counts.select("col", "val"), ["col", "val"], "left_anti")
            .select("col", "val", F.lit(0).cast("long").alias("n"),
                    F.lit(True).alias("is_top"))
        )
    )
    _commit_version_in(reference.sparkSession, ref_dir, rel)


def _categorical_against_reference(
    current: DataFrame, ref: DataFrame, ref_dir: str
) -> DataFrame:
    """Categorical arm of :func:`drift_against_reference`: the stored
    ``(col, val, n, is_top)`` relation IS the reference vocabulary —
    the bucket set was frozen at build time (never re-ranked per
    batch, so two batches always score against identical buckets), the
    exact vocab powers unseen-value detection, and the shared
    ``_cat_bucketed`` / ``_cat_finalize`` keep this path equal to the
    direct :func:`drift_report_categorical` by construction."""
    cols_rows = ref.select("col").distinct().collect()
    if not cols_rows:
        raise ValueError(f"empty drift reference at {ref_dir}")
    cols = sorted(r["col"] for r in cols_rows if r["col"] in current.columns)
    if not cols:
        raise ValueError(
            "drift_against_reference: no reference column present in the "
            f"current DataFrame (reference has "
            f"{sorted(r['col'] for r in cols_rows)})"
        )
    ref = ref.where(F.col("col").isin(cols))
    top = ref.where(F.col("is_top")).select("col", "val")
    # referenced twice (bucket fold + unseen check): checkpoint so the
    # current batch is scanned once per monitor tick, not twice
    cur_counts = _cat_long_counts(current, cols).localCheckpoint(eager=False)
    report = _report_from_counts(
        _cat_bucketed(ref.select("col", "val", "n"), top, "n_ref_bin"),
        _cat_bucketed(cur_counts, top, "n_cur_bin"),
        key_col="bucket",
    )
    # the n=0 materialized '<NULL>' rows are vocabulary bookkeeping,
    # not observed reference values — exclude them from the unseen
    # check's vocab (harmless either way: unseen already skips <NULL>)
    return _cat_finalize(
        report, cur_counts, ref.where(F.col("n") > 0).select("col", "val")
    )
