"""Join operators.

The reference contains ZERO joins (SURVEY.md §2.4 gap list); a
same-capabilities engine needs the full join surface. Everything here
is built-in DataFrame joins — Catalyst + AQE pick broadcast vs
sort-merge vs shuffled-hash at runtime — plus one genuinely missing
operator (as-of join) composed from built-ins.

Scale notes:
- `broadcast_join` pins the small side as a broadcast hash join: no
  shuffle of the big side. Use for dimension tables (region, nation,
  part at 100 TB fact scale).
- semi/anti joins ship only the join keys of the right side — prefer
  them over inner-join+distinct for existence checks.
- the as-of join is ONE shuffle (by the equi-key) + ONE sort within
  partitions — the same cost profile as a sort-merge join, with no
  Python in the path. This beats the per-group `merge_asof` pandas
  approach (which pays Arrow serialization) and is skew-tolerant via
  AQE like any other exchange.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def broadcast_join(
    big: DataFrame, small: DataFrame, on, how: str = "inner"
) -> DataFrame:
    """Equi-join with the small side broadcast (no big-side shuffle)."""
    return big.join(F.broadcast(small), on, how)


def semi_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """EXISTS: rows of ``left`` with at least one match in ``right``."""
    return left.join(right, on, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """NOT EXISTS: rows of ``left`` with no match in ``right``."""
    return left.join(right, on, "left_anti")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_vals: Sequence[str],
    how: str = "left",
    direction: str = "backward",
    tolerance: float | None = None,
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    ``right_ts <= left_ts`` within the same ``on`` keys (inclusive,
    matching DuckDB/kdb ASOF semantics). ``direction`` extends this to
    the full pandas ``merge_asof`` surface:

    - ``'backward'`` (default) — latest right with right_ts <= left_ts;
    - ``'forward'``  — earliest right with right_ts >= left_ts;
    - ``'nearest'``  — whichever of the two is closer in time, ties to
      backward (pandas semantics).

    ``tolerance`` drops matches farther than that from the left
    timestamp (in the ts column's own numeric unit). ``nearest`` and
    ``tolerance`` need a NUMERIC ts (distances must be computable) —
    convert timestamps with a TZ-independent ``timestampdiff`` in a
    prior select, as the engine's other time operators do.

    Spark has no native as-of join; this composes one from a union +
    ordered window with `last(..., ignorenulls)`:

    1. tag both inputs and union them (right rows carry their values,
       left rows carry nulls),
    2. per equi-key, order by (ts, side) — right rows sort before left
       rows at equal timestamps so `<=` is inclusive,
    3. `last(value, ignorenulls=True)` over rows-unbounded-preceding
       propagates the most recent right value onto every left row,
    4. keep only left rows.

    Cost: one shuffle on ``on`` + one sort — identical to sort-merge
    join, fully JVM-side, streaming-friendly frame (no full-partition
    buffering).

    Ties: multiple RIGHT rows with the same (key, right_ts) resolve to
    an arbitrary one of them (same ambiguity as pandas merge_asof,
    which silently takes input order) — dedupe the right side first if
    that matters.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"asof_join: direction must be 'backward', 'forward' or "
            f"'nearest', got {direction!r}"
        )
    if tolerance is not None and tolerance < 0:
        raise ValueError(f"asof_join: tolerance must be >= 0, got {tolerance}")
    needs_distance = direction == "nearest" or tolerance is not None
    if needs_distance and not isinstance(
        left.schema[left_ts].dataType, T.NumericType
    ):
        raise ValueError(
            "asof_join: nearest/tolerance need a numeric ts column "
            "(convert timestamps with timestampdiff in a prior select)"
        )
    on = list(on)
    lcols = left.columns
    # right values travel as ONE struct: last(ignorenulls) then skips
    # whole unmatched (left) rows but keeps matched rows even when
    # individual value columns are NULL — per-column propagation would
    # skip NULL VALUES and blend columns from different right rows.
    # The matched right timestamp rides along as __mts for the
    # distance-based modes.
    rstruct_type = T.StructType(
        [right.schema[c] for c in right_vals]
        + [T.StructField("__mts", right.schema[right_ts].dataType)]
    )
    tagged_left = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.col(c).alias(f"__l_{c}") for c in lcols if c not in on],
        F.lit(None).cast(rstruct_type).alias("__rvals"),
    )
    tagged_right = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}") for c in lcols if c not in on],
        F.struct(*right_vals, F.col(right_ts).alias("__mts")).alias("__rvals"),
    )

    # backward: right rows sort BEFORE left at equal ts (side 0 < 1),
    # so the unbounded-preceding frame makes <= inclusive. forward
    # mirrors it: side DESC puts left first at equal ts, so the
    # unbounded-following frame makes >= inclusive. Both windows share
    # one partitioning — nearest pays one extra SORT, never an extra
    # shuffle.
    wb = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # the forward lookup runs as a RUNNING frame over the REVERSED
    # order (first over [current, +inf) ascending == last over
    # [-inf, current] descending — identical values): Spark executes
    # [unboundedPreceding, current] frames as an O(n) accumulating
    # scan per partition, while a [current, unboundedFollowing] frame
    # re-aggregates the tail PER ROW — O(n^2) in the hottest key's
    # row count (the gapfill operator hit 12 s vs 0.4 s on exactly
    # this frame shape at sf0.1).
    wf = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").desc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = tagged_left.unionByName(tagged_right)
    if direction == "backward":
        rv = F.last("__rvals", ignorenulls=True).over(wb)
    elif direction == "forward":
        rv = F.last("__rvals", ignorenulls=True).over(wf)
    else:  # nearest
        b = F.last("__rvals", ignorenulls=True).over(wb)
        fw = F.last("__rvals", ignorenulls=True).over(wf)
        dts = F.col("__ts").cast("double")
        rv = (
            F.when(b.isNull(), fw)
            .when(fw.isNull(), b)
            .when(
                (dts - b["__mts"].cast("double"))
                <= (fw["__mts"].cast("double") - dts),
                b,
            )
            .otherwise(fw)
        )
    merged = merged.withColumn("__rvals", rv)
    if tolerance is not None:
        dist = F.abs(
            F.col("__ts").cast("double") - F.col("__rvals.__mts").cast("double")
        )
        merged = merged.withColumn(
            "__rvals",
            F.when(dist <= float(tolerance), F.col("__rvals")),
        )

    out = merged.where(F.col("__side") == 1)
    if how == "inner":
        out = out.where(F.col("__rvals").isNotNull())
    return out.select(
        *on,
        F.col("__ts").alias(left_ts),
        *[F.col(f"__l_{c}").alias(c) for c in lcols if c not in on and c != left_ts],
        *[F.col(f"__rvals.{c}").alias(c) for c in right_vals],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_lo: str,
    right_hi: str,
    bucket_width: float | None = None,
    extra_on: Sequence[str] = (),
    long_span_buckets: int | None = None,
    tune_sample_rows: int = 100_000,
    tuned: dict | None = None,
) -> DataFrame:
    """Scale-safe interval join: pairs every left row with the right
    rows whose half-open interval ``[lo, hi)`` contains its point
    value. Spark plans a bare non-equi join as a broadcast-nested-loop
    or cartesian product — O(|L| x |R|) and a cluster-killer at any
    real size. This operator makes it an EQUI-join by binning:

    - each left row gets ONE bucket, ``floor(point / width)``;
    - each right interval explodes to the buckets it covers
      (``sequence(floor(lo/w), floor(hi/w))``);
    - equi-join on the bucket (plus ``extra_on`` keys), then the exact
      residual predicate ``lo <= point < hi``.

    Every matching pair survives exactly once (the left row's single
    bucket is covered by the right interval at most once), so no
    distinct pass is needed. Shuffle volume is |L| + |R| x (mean
    interval span / width): pick ``bucket_width`` near the MEDIAN
    interval length — too small multiplies right rows, too large packs
    unrelated rows into one bucket and pushes work into the residual
    filter. A long-tail interval (>> width) multiplies accordingly;
    split pathological spans into a separate branch if the tail is
    heavy — ``long_span_buckets`` does exactly that: intervals covering
    MORE than that many buckets skip the explode and instead broadcast
    into a nested-loop branch against the points (union with the
    bucketed branch; each pair still matches exactly once since every
    interval takes exactly one branch). The long stratum must be
    broadcast-small — that is the premise (a heavy tail of wide spans
    means the bucket width is wrong, not that this branch should
    grow). Columns are numeric; join on timestamps by passing epoch
    expressions (``F.unix_timestamp``) in a prior select.

    ``bucket_width=None`` AUTO-TUNES both knobs from the data instead
    of asking the user to guess: a hash-ordered capped sample of the
    interval spans (``tune_sample_rows``, TakeOrderedAndProject — no
    full sort, layout-independent) feeds ``approxQuantile``; the width
    becomes the median span (p90, then 1.0, when degenerate
    zero-length spans drag the median to 0), and — unless the caller
    pinned ``long_span_buckets`` — the long stratum cut becomes
    ``ceil(p99 span / width)`` (min 2), so the per-row explode factor
    is bounded by the p99/p50 span ratio and at most ~1% of intervals
    take the broadcast branch. Pass a dict as ``tuned`` to receive the
    chosen ``{"bucket_width", "long_span_buckets"}``.

    Column names must be disjoint apart from ``extra_on`` (both
    sides' columns pass through unprefixed); overlapping names raise
    here at plan-build time instead of surfacing as an
    AMBIGUOUS_REFERENCE from the residual predicate.
    """
    if bucket_width is None:
        spans = (
            right.select(
                (F.col(right_hi) - F.col(right_lo)).cast("double").alias("__span"),
                # order by a hash of DATA columns, not row position:
                # monotonically_increasing_id encodes partition id +
                # offset, so it would make the sample (hence the tuned
                # knobs) vary with layout and stage retries; endpoint
                # hashes are layout-independent, and hash-ties are
                # exact duplicate intervals whose spans are identical
                # — the sampled span multiset is deterministic
                F.xxhash64(
                    F.col(right_lo),
                    F.col(right_hi),
                    *[F.col(c) for c in extra_on],
                ).alias("__h"),
            )
            .orderBy("__h")
            .limit(tune_sample_rows)
            .drop("__h")
        )
        qs = spans.approxQuantile("__span", [0.5, 0.9, 0.99], 0.01)
        if not qs:
            raise ValueError(
                "range_join: cannot auto-tune bucket_width on an empty "
                "right side — pass it explicitly"
            )
        p50, p90, p99 = qs
        bucket_width = next((v for v in (p50, p90) if v > 0.0), 1.0)
        if long_span_buckets is None:
            long_span_buckets = max(2, math.ceil(p99 / bucket_width))
        if tuned is not None:
            tuned["bucket_width"] = bucket_width
            tuned["long_span_buckets"] = long_span_buckets
    w = float(bucket_width)
    if not (w > 0.0) or math.isinf(w):
        # w=0 would floor every value into one bucket (Infinity /
        # Long.MaxValue) — the single-partition quadratic join this
        # operator exists to prevent, with CORRECT output masking it
        raise ValueError(f"range_join: bucket_width must be a positive finite number, got {bucket_width}")
    overlap = (set(left.columns) & set(right.columns)) - set(extra_on)
    if overlap:
        raise ValueError(
            "range_join: left and right share non-key columns "
            f"{sorted(overlap)} — rename or drop them (output columns "
            "pass through unprefixed), or list join keys in extra_on"
        )
    lb = left.withColumn("__bucket", F.floor(F.col(left_point) / w))
    span_buckets = F.floor(F.col(right_hi) / w) - F.floor(F.col(right_lo) / w) + 1
    narrow = right
    if long_span_buckets is not None:
        if long_span_buckets < 1:
            raise ValueError("range_join: long_span_buckets must be >= 1")
        narrow = right.where(span_buckets <= long_span_buckets)
    rb = narrow.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(right_lo) / w), F.floor(F.col(right_hi) / w)
            )
        ),
    )
    on = ["__bucket", *extra_on]
    residual = (F.col(right_lo) <= F.col(left_point)) & (
        F.col(left_point) < F.col(right_hi)
    )
    bucketed = lb.join(rb, on).where(residual).drop("__bucket")
    if long_span_buckets is None:
        return bucketed
    wide = right.where(span_buckets > long_span_buckets)
    cond = residual
    for c in extra_on:
        cond = cond & (lb[c] == wide[c])
    broadcast_branch = lb.drop("__bucket").join(F.broadcast(wide), cond)
    # the equi branch merges each extra_on pair into one column; drop
    # the wide side's copies so both branches align for the union
    for c in extra_on:
        broadcast_branch = broadcast_branch.drop(wide[c])
    return bucketed.unionByName(broadcast_branch.select(bucketed.columns))


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_text: str,
    right_text: str,
    max_distance: int,
    q: int = 3,
    max_gram_freq: int | None = None,
    left_id: str | None = None,
    right_id: str | None = None,
) -> DataFrame:
    """Edit-distance join without a cross join: pairs every left row
    with the right rows whose string is within ``max_distance``
    Levenshtein edits — the entity-resolution / typo-matching
    primitive (device names, user-entered cities, product titles).

    Plan: q-gram blocking. Each side explodes to its character
    ``q``-grams, candidates are pairs sharing at least one gram
    (equi-join on the gram — never all-pairs), the length filter
    ``abs(len(a) - len(b)) <= d`` prunes before verification, and
    only candidates pay the exact ``levenshtein`` check (which Spark
    evaluates with the distance threshold pushed in).

    Completeness: d edits destroy at most ``d * q`` grams, so two
    strings BOTH of length >= ``q * (d + 1)`` within distance d are
    guaranteed to share a gram. Shorter strings fall into a separate
    short-stratum branch comparing sub-floor strings against only the
    other side's strings the length filter could accept (length <
    floor + d) — both sides of that cross join are length-bounded, so
    a single short code can never nested-loop a full relation; with a
    normal length distribution the stratum is tiny (audit it if your
    data is all two-character codes). ``max_gram_freq`` is the usual
    banded-join skew guard, applied PER SIDE (this is a two-relation
    join, so a left-only stopgram still multiplies candidates): a
    gram over the cap in EITHER relation ('ing', ' th') is dropped
    from candidate generation; pairs sharing ONLY stopgrams are lost
    (recall trade, documented) unless they fall in the short stratum.

    Output (text mode, the default): the left row's and right row's
    text columns (aliased ``a``, ``b``) plus ``distance``; join back
    on these to recover full rows (texts may repeat — dedup upstream
    if ids matter).

    Id mode (``left_id``/``right_id`` set, both or neither): output is
    ``(left_id, right_id, a, b, distance)`` and — the scale point —
    the candidate dedup shuffles ONLY fixed-width id pairs, never the
    strings (the same id-only-shuffle fix the LSH pair path uses):
    candidates reduce to (left_id, right_id) before the distinct, and
    texts are re-attached by two equi-joins on the (deduped) id
    relations just for the final levenshtein verify. This also removes
    the caller's join-back, and ids that share equal text are distinct
    output rows. Ids must be unique per row (enforced via
    dropDuplicates on the id).
    """
    from iot_sensor_data_pipeline_spark.functions.text import char_grams

    if max_distance < 0:
        raise ValueError("fuzzy_join: max_distance must be >= 0")
    if (left_id is None) != (right_id is None):
        raise ValueError("fuzzy_join: pass both left_id and right_id, or neither")
    id_mode = left_id is not None
    floor = q * (max_distance + 1)

    if id_mode:
        a = left.select(
            F.col(left_id).alias("left_id"), F.col(left_text).alias("a")
        ).dropDuplicates(["left_id"])
        b = right.select(
            F.col(right_id).alias("right_id"), F.col(right_text).alias("b")
        ).dropDuplicates(["right_id"])
        pair_cols = ["left_id", "right_id"]
    else:
        a = left.select(F.col(left_text).alias("a")).distinct()
        b = right.select(F.col(right_text).alias("b")).distinct()
        pair_cols = ["a", "b"]
    # checkpointed (lazily) because each deduped side fans out to 3-4
    # consumers (long/short strata, the optional frequency cap, the
    # id-mode rejoin) and each gram relation to 2 (the rarity count
    # and the candidate join): without the cut the source scan +
    # dedup replays per consumer — the r15 before-plan carried 24
    # parquet scans / 44 exchanges of the same tiny relations, and
    # plan fan-out, not data, dominated the operator (guide §3.3 wide
    # plans; same fail-fast localCheckpoint trade as minhash's
    # shingle/candidate cuts). Relations are input-bounded: |L|+|R|
    # rows and their q-gram explosions.
    a = a.localCheckpoint(eager=False)
    b = b.localCheckpoint(eager=False)
    a_long = a.where(F.length("a") >= floor)
    b_long = b.where(F.length("b") >= floor)
    ga = a_long.select("*", F.explode(F.array_distinct(char_grams(F.col("a"), q))).alias("g"))
    gb = b_long.select("*", F.explode(F.array_distinct(char_grams(F.col("b"), q))).alias("g"))
    if max_gram_freq is not None:
        # the cap must hold PER SIDE: this is a two-relation join (not
        # a self-join like RP-LSH), so a gram that floods only the
        # left still multiplies candidates — drop grams exceeding the
        # cap in EITHER relation. Frequency counts DISTINCT STRINGS,
        # not id rows: in id mode one text value repeated across many
        # ids would otherwise push every one of its grams over the cap
        # and silently un-block the whole corpus (id mode must equal
        # text mode + join-back). The flip side — repeated texts DO
        # multiply id-grain candidates — is the documented dedup trade.
        fa = a_long.select("a").distinct() if id_mode else a_long.select("a")
        fb = b_long.select("b").distinct() if id_mode else b_long.select("b")
        fga = fa.select(F.explode(F.array_distinct(char_grams(F.col("a"), q))).alias("g"))
        fgb = fb.select(F.explode(F.array_distinct(char_grams(F.col("b"), q))).alias("g"))
        bad = (
            fga.groupBy("g").agg(F.count(F.lit(1)).alias("__f"))
            .where(F.col("__f") > max_gram_freq)
            .select("g")
            .unionByName(
                fgb.groupBy("g").agg(F.count(F.lit(1)).alias("__f"))
                .where(F.col("__f") > max_gram_freq)
                .select("g")
            )
            .distinct()
        )
        ga = ga.join(F.broadcast(bad), "g", "left_anti")
        gb = gb.join(F.broadcast(bad), "g", "left_anti")
    # PREFIX FILTERING (the Ed-Join principle, Xiao/Wang/Lin VLDB'08):
    # one edit disturbs at most q distinct grams, so within distance d
    # the right string shares a gram with the left among ANY
    # q*d + 1 of its grams — in particular its q*d + 1 RAREST under a
    # global frequency order. The right side therefore emits only that
    # prefix into the candidate join (the left side stays full — the
    # asymmetric form needs no prefix-vs-prefix theorem). EXACT: no
    # pair within max_distance can be lost. This is what keeps
    # low-entropy corpora (shared prefixes/templates: 'Customer#0000…')
    # from degenerating to an all-pairs gram join — every gram of such
    # strings is corpus-hot, and hot x hot was quadratic (measured 33 s
    # -> 2.8 s on the 3k-name fuzzy branch at sf0.1); the rarest-gram
    # prefix joins through the DISCRIMINATIVE grams only.
    prefix_n = q * max_distance + 1
    gfreq = (
        ga.select("g")
        .unionAll(gb.select("g"))
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("__gf"))
    )
    # one partition per right-side string: right_id in id mode (unique
    # by construction), the text itself otherwise (distinct'd above)
    w_rare = Window.partitionBy(pair_cols[1]).orderBy(
        F.col("__gf").asc(), F.col("g").asc()
    )
    gb_pref = (
        gb.join(gfreq, "g")
        .withColumn("__gr", F.row_number().over(w_rare))
        .where(F.col("__gr") <= prefix_n)
        .drop("__gf", "__gr")
    )
    # no distinct here: the union's final distinct dedups gram
    # collisions with map-side partial aggregation — an inner distinct
    # would exchange the largest intermediate twice
    cand = (
        ga.join(gb_pref, "g")
        .where(F.abs(F.length("a") - F.length("b")) <= max_distance)
        .select(*pair_cols)
    )
    # short stratum: the OTHER side only needs strings the length
    # filter could accept (< floor + d) — without this prefilter one
    # sub-floor string would nested-loop the entire other relation
    len_ok = F.abs(F.length("a") - F.length("b")) <= max_distance
    short_pairs = (
        a.where(F.length("a") < floor)
        .crossJoin(b.where(F.length("b") < floor + max_distance))
        .where(len_ok)
        .unionByName(
            a_long.where(F.length("a") < floor + max_distance)
            .crossJoin(b.where(F.length("b") < floor))
            .where(len_ok)
        )
        .select(*pair_cols)
    )
    # in id mode this distinct exchanges fixed-width id pairs only —
    # the strings rejoin afterwards, partitioned by id, for the verify
    pairs = cand.unionByName(short_pairs).distinct()
    if id_mode:
        pairs = pairs.join(a, "left_id").join(b, "right_id").select(
            "left_id", "right_id", "a", "b"
        )
    return pairs.withColumn(
        "distance", F.levenshtein("a", "b", max_distance)
    ).where(F.col("distance") >= 0)  # threshold form returns -1 beyond it


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_lo: str,
    left_hi: str,
    right_lo: str,
    right_hi: str,
    bucket_width: float,
    extra_on: Sequence[str] = (),
) -> DataFrame:
    """Interval x interval overlap join (half-open: ``[lo, hi)``
    overlap iff ``l_lo < r_hi AND r_lo < l_hi``) — downtime
    attribution, session-vs-outage overlap, concurrent-activity
    detection. The interval sibling of :func:`range_join`, and like it
    an EQUI-join by binning where the naive formulation is a
    nested-loop O(|L| x |R|).

    Both sides explode to the buckets their interval covers and
    equi-join on the bucket (plus ``extra_on``). Two overlapping
    intervals share every bucket in [max(lo buckets), min(hi
    buckets)] — to emit the pair exactly ONCE without a distinct
    shuffle, the join keeps only the FIRST shared bucket:
    ``bucket == greatest(floor(l_lo/w), floor(r_lo/w))``, which both
    sides cover whenever they overlap. Shuffle volume is
    (|L| + |R|) x (mean span / width): pick ``bucket_width`` near the
    MEDIAN interval length of the finer side; split pathological
    long-tail spans into their own branch as with :func:`range_join`.

    Column names must be disjoint apart from ``extra_on`` (both sides
    pass through unprefixed).
    """
    w = float(bucket_width)
    if not (w > 0.0) or math.isinf(w):
        raise ValueError(
            f"interval_overlap_join: bucket_width must be a positive finite number, got {bucket_width}"
        )
    overlap = (set(left.columns) & set(right.columns)) - set(extra_on)
    if overlap:
        raise ValueError(
            "interval_overlap_join: left and right share non-key columns "
            f"{sorted(overlap)} — rename or drop them, or list join keys in extra_on"
        )
    lb = left.withColumn(
        "__bucket",
        F.explode(
            F.sequence(F.floor(F.col(left_lo) / w), F.floor(F.col(left_hi) / w))
        ),
    )
    rb = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence(F.floor(F.col(right_lo) / w), F.floor(F.col(right_hi) / w))
        ),
    )
    on = ["__bucket", *extra_on]
    first_shared = F.greatest(
        F.floor(F.col(left_lo) / w), F.floor(F.col(right_lo) / w)
    )
    return (
        lb.join(rb, on)
        .where(
            (F.col("__bucket") == first_shared)
            & (F.col(left_lo) < F.col(right_hi))
            & (F.col(right_lo) < F.col(left_hi))
            # an empty interval (lo >= hi, incl. reversed bounds from a
            # swapped-column bug upstream) overlaps NOTHING under the
            # half-open semantics — without these conjuncts a reversed
            # interval can still satisfy the pairwise predicate
            & (F.col(left_lo) < F.col(left_hi))
            & (F.col(right_lo) < F.col(right_hi))
        )
        .drop("__bucket")
    )
