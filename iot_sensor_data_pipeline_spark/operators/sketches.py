"""Mergeable distinct-count sketches (Apache DataSketches HLL via
Spark's built-in ``hll_sketch_agg`` family) — the incremental-analytics
pattern exact COUNT(DISTINCT) cannot give you at 100 TB: persist ONE
small sketch row per partition of data (day, source, tenant...), and
every later question — rolling 30-day uniques, all-time uniques, any
group-by rollup — is a union over sketch rows instead of a rescan of
history. Sketch union is associative, commutative, and idempotent-ish
(re-adding the same values never inflates the estimate), which is what
makes the incremental refresh append-only.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def distinct_sketches(
    df: DataFrame,
    partition_keys: Sequence[str],
    value_col: str,
    lg_k: int = 12,
    sketch_col: str = "sketch",
) -> DataFrame:
    """One HLL sketch row per ``partition_keys`` group over
    ``value_col`` — the build side. Persist this relation (a few KB
    per group at lg_k=12, ~1.6% relative error) instead of raw
    values; append new partitions' rows as data arrives. One
    aggregation with map-side partial sketching — raw values never
    leave their executor, only sketch buffers shuffle.

    ``lg_k`` must be identical across every sketch you intend to
    union (stored sketches pin it for the table's lifetime).
    """
    return df.groupBy(*partition_keys).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lg_k)).alias(sketch_col)
    )


def merge_distinct_counts(
    sketches: DataFrame,
    group_keys: Sequence[str] = (),
    sketch_col: str = "sketch",
    out_col: str = "approx_distinct",
) -> DataFrame:
    """Union persisted sketch rows into approximate distinct counts
    per ``group_keys`` (empty = one global row). The union reads ONLY
    the sketch relation — cost is #sketch-rows, independent of the
    raw history size; any rollup grain coarser than the build
    partitioning is answerable from the same stored sketches."""
    grouped = (
        sketches.groupBy(*group_keys) if group_keys else sketches.groupBy()
    )
    return grouped.agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col(sketch_col))).alias(out_col)
    )


def heavy_hitters(
    df: DataFrame,
    item_col: str,
    k_counters: int = 1000,
    min_count: int | None = None,
) -> DataFrame:
    """Exact frequent items in two passes, scaled by a Misra-Gries
    candidate sketch: every item whose true count exceeds ``n /
    k_counters`` is GUARANTEED returned with its EXACT count (the
    mergeable-summaries bound, Agarwal et al.: per-partition MG
    summaries undercount by at most n_p / k each, so a globally-heavy
    item survives in at least one summary). Items below the guarantee
    line may appear too; ``min_count`` filters the output.

    Why not groupBy(item).count() directly? Over a high-cardinality
    column (URLs, user agents, shingles) that shuffles one row PER
    DISTINCT ITEM — at corpus scale, billions of rows of mostly-ones.
    Here pass 1 runs Misra-Gries inside each partition (vectorized:
    per Arrow batch a value_counts at C speed merges into a dict that
    is reduced back to ``k_counters`` entries by subtracting the
    (k+1)-th largest count — the batched MG step, same undercount
    bound) and ships only <= partitions x k summary rows; pass 2
    exactly recounts ONLY the candidate items via a semi-join (AQE
    picks broadcast when the candidate set fits — at extreme
    partition counts the summary can outgrow a broadcast, so the
    strategy is not forced). Returns ``(item, n)``, exact counts.

    Nulls are dropped SPARK-side before the sketch: besides matching
    count semantics, this keeps a nullable int64 column from arriving
    in pandas as float64 (NaN-coerced), which would both corrupt the
    counter state (every NaN looks distinct) and lose precision for
    ids above 2^53.
    """
    import pandas as pd

    def mg(it):
        # fully vectorized MG merge: the counter table is a pandas
        # Series (index = item, value = count); each Arrow batch folds
        # in via concat + groupby-sum and trims via nlargest — all
        # C-speed. A per-item Python dict loop here would BE the
        # stage's wall-clock on the high-cardinality columns this
        # operator exists for (URLs, shingles).
        counters = pd.Series(dtype="int64")
        for pdf in it:
            vc = pdf[item_col].value_counts(dropna=True)
            if not len(vc):
                continue
            counters = (
                vc
                if counters.empty
                else pd.concat([counters, vc]).groupby(level=0).sum()
            )
            if len(counters) > k_counters:
                # batched MG: subtract the (k+1)-th largest count from
                # every counter, drop non-positives — at most k survive,
                # and each subtraction is matched by >= k+1 counters
                # losing it, so total undercount stays <= n / (k+1)
                t = counters.nlargest(k_counters + 1).iloc[-1]
                counters = counters[counters > t] - t
        if len(counters):
            yield pd.DataFrame({item_col: counters.index.to_numpy()})

    item_type = dict(df.dtypes)[item_col]
    non_null = df.select(item_col).where(F.col(item_col).isNotNull())
    candidates = non_null.mapInPandas(mg, f"{item_col} {item_type}").distinct()
    return (
        non_null.join(candidates, item_col, "left_semi")
        .groupBy(item_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= (min_count if min_count is not None else 1))
    )


#: the partial-aggregate columns `partial_aggregates` emits and
#: `merge_aggregates` consumes — the mergeable-state contract
PARTIAL_AGG_COLS = ("sum_v", "n_v", "min_v", "max_v", "sumsq_v")


def partial_aggregates(
    df: DataFrame, partition_keys: Sequence[str], value_col: str
) -> DataFrame:
    """Mergeable standard-aggregate partials — the non-sketch sibling
    of :func:`distinct_sketches` for continuous-aggregate maintenance:
    persist ONE row of (sum, count, min, max, sum-of-squares) per
    ``partition_keys`` group (per ingest batch / day / source), and
    every later sum/count/avg/min/max/stddev question at ANY coarser
    grain — including incremental refreshes as new partial rows append
    — is answered by :func:`merge_aggregates` over the partial rows,
    never by rescanning raw history. The five moments are each
    associative-commutative, which is the whole trick; avg/stddev are
    derived at merge time (deriving them per partial and averaging
    would be wrong — means of means weight groups, not rows)."""
    v = F.col(value_col).cast("double")
    return df.groupBy(*partition_keys).agg(
        F.sum(v).alias("sum_v"),
        F.count(v).alias("n_v"),
        F.min(v).alias("min_v"),
        F.max(v).alias("max_v"),
        F.sum(v * v).alias("sumsq_v"),
    )


def merge_aggregates(
    partials: DataFrame, group_keys: Sequence[str] = ()
) -> DataFrame:
    """Fold persisted partial rows into final aggregates per
    ``group_keys`` (empty = one global row): exact sum/n/min/max, avg
    and population stddev derived from the merged moments. Cost is
    #partial-rows, independent of raw history size."""
    grouped = partials.groupBy(*group_keys) if group_keys else partials.groupBy()
    merged = grouped.agg(
        F.sum("sum_v").alias("sum_v"),
        F.sum("n_v").alias("n_v"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
        F.sum("sumsq_v").alias("sumsq_v"),
    )
    mean = F.try_divide(F.col("sum_v"), F.col("n_v"))
    # clamp: float cancellation can push E[x^2]-E[x]^2 a hair negative
    var = F.greatest(
        F.try_divide(F.col("sumsq_v"), F.col("n_v")) - mean * mean, F.lit(0.0)
    )
    # gate derived stats on n_v > 0: a group whose merged n_v is 0
    # (every partial saw only NULLs) has NULL moments, and
    # greatest(NULL, 0.0) = 0.0 would otherwise report a DEFINITE zero
    # spread for a group with no data — stddev must be NULL alongside avg
    has_data = F.col("n_v") > 0
    return merged.select(
        *group_keys,
        "sum_v",
        "n_v",
        "min_v",
        "max_v",
        F.when(has_data, mean).alias("avg_v"),
        F.when(has_data, F.sqrt(var)).alias("stddev_pop_v"),
    )


def profile_columns(
    df: DataFrame,
    cols: Sequence[str] | None = None,
    max_cols_per_scan: int = 256,
) -> DataFrame:
    """Data profiling in ONE scan: for every requested column a row of
    ``(column, n_rows, n_null, null_frac, approx_distinct, min_str,
    max_str)`` — the first thing to run against an unfamiliar or
    newly-landed table (schema drift shows up as null_frac jumps,
    key-ness as approx_distinct ~ n_rows, truncation as min/max
    collapse). All columns' statistics are computed inside a single
    aggregation (one job, one pass over the data, map-side combined)
    and then unpivoted to the long form — never one job per column,
    which is how naive profilers turn a wide table into 100 scans.

    min/max are projected as strings so heterogeneous column types fit
    one output schema; approx_distinct is HLL (~2% at the default
    precision). Complex-typed columns (array/map/struct/variant) are
    skipped unless explicitly listed — their min/max has no useful
    ordering.

    null_frac uses ``try_divide``: on an empty table n_rows = 0 and
    Spark 4's default ANSI mode would otherwise throw DIVIDE_BY_ZERO —
    exactly when a landing produced zero rows, the moment you most
    want the profile to succeed. Empty table → null_frac NULL.

    Wide-table guard: 4 aggregates x 1000+ columns in one projection
    stresses codegen (and can fall back to interpreted mode); above
    ``max_cols_per_scan`` the aggregation is chunked — each chunk is
    still a full-width single-pass agg, so a 1200-column table costs
    ceil(1200/256) = 5 scans, never 1200.
    """
    if cols is None:
        cols = [
            f.name
            for f in df.schema.fields
            if f.dataType.typeName()
            not in ("array", "map", "struct", "variant", "binary")
        ]
    cols = list(cols)
    if not cols:
        raise ValueError("profile_columns: no profilable columns")

    def one_scan(chunk: list[str]) -> DataFrame:
        aggs = [F.count(F.lit(1)).alias("__n")]
        for c in chunk:
            aggs.extend(
                [
                    F.count(F.col(c)).alias(f"__nn_{c}"),
                    F.approx_count_distinct(F.col(c)).alias(f"__d_{c}"),
                    F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
                    F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
                ]
            )
        wide = df.select(*chunk).agg(*aggs)
        rows = [
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").alias("n_rows"),
                (F.col("__n") - F.col(f"__nn_{c}")).alias("n_null"),
                F.round(
                    F.try_divide(F.col("__n") - F.col(f"__nn_{c}"), F.col("__n")), 6
                ).alias("null_frac"),
                F.col(f"__d_{c}").alias("approx_distinct"),
                F.col(f"__min_{c}").alias("min_str"),
                F.col(f"__max_{c}").alias("max_str"),
            )
            for c in chunk
        ]
        return wide.select(F.explode(F.array(*rows)).alias("p")).select("p.*")

    chunks = [
        cols[i : i + max_cols_per_scan] for i in range(0, len(cols), max_cols_per_scan)
    ]
    out = one_scan(chunks[0])
    for chunk in chunks[1:]:
        out = out.unionByName(one_scan(chunk))
    return out


def histogram_bins(
    df: DataFrame, value_col: str, n_bins: int = 128, rel_err: float = 0.001
) -> list[float]:
    """Quantile-spaced bin edges for :func:`histogram_partials` — ONE
    approxQuantile pass over a representative slice of the data.
    Quantile spacing (not uniform width) keeps the per-bin mass even
    under skew, which is what bounds the later quantile-estimation
    error; like a sketch's lg_k, the edges are pinned for the table's
    lifetime (every partial row must use the same edges to merge).
    Returns len == n_bins - 1 strictly increasing interior edges
    (duplicates from discrete data are collapsed)."""
    probs = [i / n_bins for i in range(1, n_bins)]
    cuts = df.selectExpr(f"CAST({value_col} AS DOUBLE) AS __v").approxQuantile(
        "__v", probs, rel_err
    )
    out: list[float] = []
    for c in cuts:
        if not out or c > out[-1]:
            out.append(c)
    if not out:
        raise ValueError("histogram_bins: no non-null values to bin")
    return out


def histogram_partials(
    df: DataFrame,
    partition_keys: Sequence[str],
    value_col: str,
    bins: Sequence[float],
) -> DataFrame:
    """Mergeable histogram rows — the quantile sibling of
    :func:`partial_aggregates`: per ``partition_keys`` group (ingest
    day / source / tenant), one row per occupied bin with
    ``(bin, n, lo, hi)``: the searchsorted bin index over the shared
    ``bins`` edges, the count, and the EXACT min/max of the bin's
    values (tightening interpolation at the unbounded edge bins).
    Bin assignment is a pure codegen fold (count of edges <= value —
    the same expression as the Z-order bucketizer), so the build is
    one aggregation with map-side combine; rows shuffle as
    (keys, bin) pairs, never values. NULLs are excluded (quantiles of
    nothing), matching percentile semantics.

    Histograms over FIXED edges are trivially mergeable (counts add,
    min/lo and max/hi fold), so any coarser rollup or incremental
    refresh is :func:`merge_histogram_quantiles` over the partial
    rows — history is never rescanned."""
    edges = F.array(*[F.lit(float(x)) for x in bins])
    v = F.col(value_col).cast("double")
    bin_idx = F.aggregate(
        F.filter(edges, lambda e: e <= v),
        F.lit(0).cast("int"),
        lambda acc, _: acc + 1,
    )
    return (
        df.where(v.isNotNull())
        .select(*partition_keys, v.alias("__v"), bin_idx.alias("bin"))
        .groupBy(*partition_keys, "bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("__v").alias("lo"),
            F.max("__v").alias("hi"),
        )
    )


def merge_histogram_quantiles(
    partials: DataFrame,
    qs: Sequence[float],
    group_keys: Sequence[str] = (),
) -> DataFrame:
    """Estimate quantiles per ``group_keys`` from persisted
    :func:`histogram_partials` rows (empty keys = one global row):
    merge bin counts, walk the cumulative mass to the target rank,
    and linearly interpolate inside the located bin between its exact
    (lo, hi) bounds. Returns one row per group with a ``q_<...>``
    column per requested quantile.

    Cost is #partial-rows (a groupBy on (keys, bin) then one small
    per-group fold over <= n_bins rows via collect_list of structs —
    bounded by the bin count, NOT the data), independent of history
    size. Rank error <= one bin of mass; with quantile-spaced edges
    from :func:`histogram_bins` that is ~1/n_bins of the build
    distribution, plus drift if the live distribution wanders from
    the edge-fitting slice."""
    qs = list(qs)
    if not qs or not all(0.0 <= q <= 1.0 for q in qs):
        raise ValueError("merge_histogram_quantiles: qs must be in [0, 1]")
    merged = partials.groupBy(*group_keys, "bin").agg(
        F.sum("n").alias("n"), F.min("lo").alias("lo"), F.max("hi").alias("hi")
    )
    grouped = (
        merged.groupBy(*group_keys) if group_keys else merged.groupBy()
    )
    hist = grouped.agg(
        F.array_sort(F.collect_list(F.struct("bin", "n", "lo", "hi"))).alias("h"),
        F.sum("n").alias("__total"),
    )

    def one_quantile(q: float):
        # target rank in [1, total]; walk bins accumulating mass, emit
        # the interpolated value inside the bin where it lands
        rank = F.greatest(F.ceil(F.lit(q) * F.col("__total")), F.lit(1))
        # fold state: (cum mass so far, answer or null)
        init = F.named_struct(
            F.lit("cum"), F.lit(0).cast("long"),
            F.lit("ans"), F.lit(None).cast("double"),
        )
        step = lambda acc, b: F.named_struct(  # noqa: E731
            F.lit("cum"), acc.getField("cum") + b.getField("n"),
            F.lit("ans"),
            F.when(acc.getField("ans").isNotNull(), acc.getField("ans")).when(
                acc.getField("cum") + b.getField("n") >= rank,
                # position of the target rank inside THIS bin, linear
                # between the bin's exact observed lo/hi
                b.getField("lo")
                + (b.getField("hi") - b.getField("lo"))
                * (
                    (rank - acc.getField("cum")).cast("double")
                    / b.getField("n").cast("double")
                ),
            ),
        )
        return F.aggregate(F.col("h"), init, step).getField("ans")

    return hist.select(
        *group_keys,
        F.col("__total").alias("n"),
        *[one_quantile(q).alias(f"q_{str(q).replace('.', '_')}") for q in qs],
    )


def grouped_quantiles_exact(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    qs: list[float],
    round_out: int = 6,
) -> DataFrame:
    """EXACT per-group percentile_cont (linear interpolation between
    closest ranks — the ANSI/DuckDB ``quantile_cont`` definition)
    computed rank-wise: Spark's exact ``percentile`` aggregate buffers
    every group's values in one task's memory (OOM at 100 TB group
    sizes), and ``approx_percentile`` trades the answer away; this
    ranks within each group (partitioned window — parallel across
    groups, a sort within), picks ONLY the two neighbor ranks each
    requested quantile interpolates between, and reduces those — so
    per-task state is the sort spill, never a group-sized array, and
    the output is exactly ``percentile_cont``.

    Tie handling is value-deterministic: equal values make rank order
    among them ambiguous, but the VALUE at any rank — hence the
    quantile — is unchanged. NULL values are excluded (ANSI). Groups
    arrive from one shuffle; the quantile spec is a broadcast literal
    relation. Output: group_cols, ``q``, ``value``.
    """
    if not qs:
        raise ValueError("grouped_quantiles_exact: qs must be non-empty")
    for q in qs:
        if not (0.0 <= q <= 1.0):
            raise ValueError(f"grouped_quantiles_exact: q must be in [0, 1], got {q}")
    v = F.col(value_col).cast("double")
    base = df.where(v.isNotNull()).select(*group_cols, v.alias("__v"))
    w = Window.partitionBy(*group_cols).orderBy(F.col("__v"))
    ranked = base.withColumn("__rn", F.row_number().over(w))
    # per-group n from the SAME window partitioning (an unordered
    # count-over-partition rides the ranking exchange) instead of a
    # second full input scan + aggregate — the rank-1 row carries the
    # group's count, so the group-grain relation needs no extra pass
    counts = (
        ranked.withColumn(
            "__n", F.count(F.lit(1)).over(Window.partitionBy(*group_cols))
        )
        .where(F.col("__rn") == 1)
        .select(*group_cols, "__n")
    )
    # target position pos = 1 + q*(n-1); the quantile spec is a literal
    # array exploded onto the group-grain counts — a projection, not a
    # join, so no nested-loop shape exists anywhere in the plan
    grid = counts.select(
        *group_cols,
        "__n",
        F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q"),
    ).select(
        *group_cols,
        "q",
        (F.lit(1.0) + F.col("q") * (F.col("__n") - 1)).alias("__pos"),
    )
    grid = grid.select(
        *group_cols,
        "q",
        F.floor("__pos").cast("int").alias("__lo"),
        F.ceil("__pos").cast("int").alias("__hi"),
        (F.col("__pos") - F.floor("__pos")).alias("__frac"),
    )
    # each (group, q) needs ranks lo and hi: explode to (group, rank,
    # role) and equi-join the ranked relation ONCE
    need = grid.select(
        *group_cols,
        "q",
        "__frac",
        F.explode(
            F.array(
                F.struct(F.col("__lo").alias("__rn"), F.lit("lo").alias("__role")),
                F.struct(F.col("__hi").alias("__rn"), F.lit("hi").alias("__role")),
            )
        ).alias("__t"),
    ).select(*group_cols, "q", "__frac", "__t.__rn", "__t.__role")
    # null-safe group-key equality (<=>): a NULL group key is a real
    # group for GROUP BY / percentile_cont, and a plain equi-join would
    # silently drop it (NULL != NULL); the ranked side is prefix-renamed
    # so the same-lineage self-join stays unambiguous
    r = ranked.select(
        *[F.col(c).alias(f"__r_{c}") for c in group_cols],
        F.col("__rn").alias("__r_rn"),
        "__v",
    )
    cond = F.col("__rn") == F.col("__r_rn")
    for c in group_cols:
        cond = cond & F.col(c).eqNullSafe(F.col(f"__r_{c}"))
    joined = need.join(r, cond)
    return (
        joined.groupBy(*group_cols, "q")
        .agg(
            F.first("__frac").alias("__frac"),
            F.min(F.when(F.col("__role") == "lo", F.col("__v"))).alias("__vlo"),
            F.min(F.when(F.col("__role") == "hi", F.col("__v"))).alias("__vhi"),
        )
        .select(
            *group_cols,
            "q",
            F.round(
                F.col("__vlo") + F.col("__frac") * (F.col("__vhi") - F.col("__vlo")),
                round_out,
            ).alias("value"),
        )
    )


def grouped_robust_stats(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    round_out: int = 6,
) -> DataFrame:
    """Per-group ROBUST location/scale summary — the outlier-resistant
    complement to the mean/stddev aggregates (one contaminated sensor
    shifts a mean arbitrarily; the median and MAD have a 50% breakdown
    point, which is why robust thresholds are the anomaly-baseline
    convention): ``(group_cols..., n, median, q1, q3, iqr, mad)``.

    Built entirely on :func:`grouped_quantiles_exact` (the rank-wise
    percentile_cont — no group-sized buffers at any scale): one pass
    for Q1/median/Q3, then the per-group median re-enters as a JOINED
    column and a second quantile pass over ``|v - median|`` yields the
    MAD. The median is rounded to ``round_out`` BEFORE the deviation
    pass — deterministic cross-engine, so a SQL oracle mirrors the
    identical pipeline digit for digit. NULL values are excluded
    (ANSI); a group of all-NULLs is absent. Two key-shuffles + the
    quantile machinery's windows; no UDFs, no collects."""
    if not group_cols:
        raise ValueError(
            "grouped_robust_stats: group_cols must be non-empty (use a "
            "constant column for one global summary)"
        )
    q3p = grouped_quantiles_exact(
        df, group_cols, value_col, [0.25, 0.5, 0.75], round_out=round_out
    )
    stats = q3p.groupBy(*group_cols).agg(
        F.max(F.when(F.col("q") == 0.25, F.col("value"))).alias("q1"),
        F.max(F.when(F.col("q") == 0.5, F.col("value"))).alias("median"),
        F.max(F.when(F.col("q") == 0.75, F.col("value"))).alias("q3"),
    )
    v = F.col(value_col).cast("double")
    dev = (
        df.where(v.isNotNull())
        .select(*group_cols, v.alias("__v"))
        .join(stats.select(*group_cols, "median"), group_cols)
        .select(*group_cols, F.abs(F.col("__v") - F.col("median")).alias("__d"))
    )
    mad = (
        grouped_quantiles_exact(dev, group_cols, "__d", [0.5],
                                round_out=round_out)
        .select(*group_cols, F.col("value").alias("mad"))
    )
    counts = (
        df.where(v.isNotNull())
        .groupBy(*group_cols)
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        counts.join(stats, group_cols)
        .join(mad, group_cols)
        .select(
            *group_cols,
            "n",
            "median",
            "q1",
            "q3",
            F.round(F.col("q3") - F.col("q1"), round_out).alias("iqr"),
            "mad",
        )
    )


def robust_outliers(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    z_threshold: float = 3.5,
    round_out: int = 6,
    stats: DataFrame | None = None,
) -> DataFrame:
    """Rows whose MODIFIED z-score (Iglewicz-Hoaglin:
    ``0.6745 * (v - median) / MAD``) exceeds ``z_threshold`` within
    their group — the published robust-outlier rule (3.5 is its
    conventional cut): unlike mean/stddev z-scores, the outliers
    themselves cannot inflate the baseline that judges them. Returns
    the original columns plus ``robust_z``. A zero-MAD group (over
    half the values identical) has no defined scale — its rows are NOT
    flagged (robust_z NULL would be a lie either way; use an exact-
    value change detector there). Cost: one
    :func:`grouped_robust_stats` pass + one key-shuffle join back.

    The stats ride in under reserved ``__rs_*`` names so a caller
    whose frame already carries ``median``/``mad`` columns joins
    cleanly instead of hitting an ambiguous-column AnalysisException
    (ADVICE r11); only the ``robust_z`` OUTPUT name must be free —
    collision raises loudly, same discipline as the ``__violated`` /
    ``__src_file`` guards elsewhere.

    ``stats`` optionally passes a precomputed
    :func:`grouped_robust_stats` output (the ``candidates``/``hits``
    reuse pattern): a caller that also reports the stats then pays the
    median/MAD quantile machinery ONCE instead of twice."""
    reserved = {"robust_z", "__rs_median", "__rs_mad"}
    clash = sorted(reserved & set(df.columns))
    if clash:
        raise ValueError(
            f"robust_outliers: input columns {clash} collide with the "
            "output/internal columns — rename them first"
        )
    if stats is None:
        stats = grouped_robust_stats(df, group_cols, value_col, round_out)
    stats = stats.select(
        *group_cols,
        F.col("median").alias("__rs_median"),
        F.col("mad").alias("__rs_mad"),
    )
    v = F.col(value_col).cast("double")
    z = F.round(
        F.lit(0.6745) * (v - F.col("__rs_median")) / F.col("__rs_mad"),
        round_out,
    )
    return (
        df.join(stats, group_cols)
        .withColumn("robust_z", z)
        .where(
            (F.col("__rs_mad") > 0)
            & (F.abs(F.col("robust_z")) > z_threshold)
        )
        .drop("__rs_median", "__rs_mad")
    )
