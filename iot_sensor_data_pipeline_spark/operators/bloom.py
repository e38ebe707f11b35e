"""Bloom-filter join pruning: shrink the shuffled side of a selective
semi/anti join BEFORE the shuffle.

The 100 TB problem: ``fact JOIN keys`` where only a small fraction of
fact rows survive. A plain semi join shuffles (or at best scans and
hashes) every fact row; a broadcast of the raw key set dies once the
key relation outgrows the broadcast limit. A Bloom filter of the keys
is hundreds of times smaller than the keys themselves (~1.2 bytes/key
at 1% FPP vs. 8+ bytes/key raw), never produces false NEGATIVES, and
lets each scan task discard non-matching rows locally — the exact
equi-join afterwards only pays for the (small) surviving fraction.
Spark's own runtime bloom pushdown (`spark.sql.optimizer.runtime.
bloomFilter.enabled`) triggers only for its own cost-model window;
these operators make the plan explicit and composable.

Everything here is exact-result: ``bloom_semi_join`` / ``bloom_anti_join``
compose the probabilistic prune with a real equi-join, so the output is
identical to the plain join (oracle-checkable SQL), only the data
volume reaching the join differs.

Design:

- **Build is a relation, not a driver object.** ``bloom_bits`` hashes
  each key ``n_hashes`` ways (``xxhash64(key, i) mod m_bits``), packs
  positions into 64-bit words, and ``groupBy(word).agg(bit_or)`` — the
  filter is a DataFrame of at most ``m_bits/64`` (word, bits) rows,
  built with one map-side-combined aggregation over the key relation.
  Driver memory is O(m_bits), never O(keys).
- **Probe path "join" (default): zero collect anywhere.** The probe
  side computes its ``n_hashes`` word indices and joins the words
  relation ``n_hashes`` times with broadcast hash joins (the same tiny
  exchange, reused) — no shuffle of the probe side, whole-stage
  codegen, no Python. A row is a HIT iff every probed word has its bit
  set.
- **Probe path "pandas": O(m_bits) driver + Arrow.** The packed words
  collect into a numpy uint64 bitset (<= m_bits/8 bytes, e.g. 2 MiB at
  m=2^24), broadcast once, and ``mapInPandas`` tests all positions
  vectorized. Use when ``n_hashes`` chained joins are undesirable
  (very wide probe rows) or the filter feeds many queries.

Null semantics: an equi-join never matches a NULL key, so rows with any
NULL join column are definite misses — excluded by ``bloom_prune`` /
``bloom_semi_join``, kept (without an exact-join pass) by
``bloom_anti_join``. This matches plain semi/anti join semantics
exactly.

Sizing: ``bloom_params(expected_keys, fpp)`` gives the information-
theoretic optimum m = -n*ln(p)/ln(2)^2, g = (m/n)*ln(2).

Reference scope: the reference engine has no bloom join (its joins are
single-node lookups, /root/reference/spark_processing/alert_detector.py
reads whole tables); this is part of the at-scale join toolkit
alongside operators/skew.py and operators/joins.py.
"""

from __future__ import annotations

import math
from collections.abc import Iterator, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "bloom_params",
    "bloom_bits",
    "bloom_prune",
    "bloom_semi_join",
    "bloom_anti_join",
]


def bloom_params(expected_keys: int, fpp: float = 0.01) -> tuple[int, int]:
    """Optimal (m_bits, n_hashes) for ``expected_keys`` distinct keys at
    false-positive rate ``fpp``. m_bits is rounded up to a multiple of
    64 (whole packed words)."""
    if expected_keys <= 0:
        raise ValueError(f"expected_keys must be positive, got {expected_keys}")
    if not (0.0 < fpp < 1.0):
        raise ValueError(f"fpp must be in (0, 1), got {fpp}")
    m = math.ceil(-expected_keys * math.log(fpp) / (math.log(2) ** 2))
    m = ((m + 63) // 64) * 64
    g = max(1, round(m / expected_keys * math.log(2)))
    return m, min(g, 16)


def _positions(on: Sequence[str], m_bits: int, n_hashes: int) -> list[F.Column]:
    """The i-th probe position: xxhash64(key..., i) mod m_bits.

    The seed column ``lit(i)`` makes the n_hashes functions independent
    while staying inside Spark's single JVM xxhash64 kernel; pmod keeps
    positions non-negative."""
    cols = [F.col(c) for c in on]
    return [
        F.pmod(F.xxhash64(*cols, F.lit(i)), F.lit(m_bits)) for i in range(n_hashes)
    ]


def _resolve_params(
    m_bits: int | None,
    n_hashes: int | None,
    expected_keys: int | None,
    fpp: float,
) -> tuple[int, int]:
    if m_bits is None:
        if expected_keys is None:
            raise ValueError("pass m_bits or expected_keys")
        m_bits, auto_g = bloom_params(expected_keys, fpp)
        n_hashes = n_hashes or auto_g
    if m_bits < 64:
        raise ValueError(f"m_bits must be >= 64, got {m_bits}")
    m_bits = ((m_bits + 63) // 64) * 64
    n_hashes = n_hashes or 5
    if not (1 <= n_hashes <= 16):
        raise ValueError(f"n_hashes must be in [1, 16], got {n_hashes}")
    return m_bits, n_hashes


def bloom_bits(
    keys: DataFrame,
    on: Sequence[str],
    m_bits: int,
    n_hashes: int = 5,
) -> DataFrame:
    """Build the packed Bloom bitset as a DataFrame (word long, bits long).

    One pass over ``keys``: explode each key into its n_hashes bit
    positions, pack into (word = pos >> 6, mask = 1 << (pos & 63)), and
    bit_or-aggregate per word. Partial aggregation combines map-side,
    so the shuffle carries at most ``min(probes, m_bits/64)`` rows per
    task. Absent words are all-zero (left join at probe time yields
    null -> miss). NULL keys contribute no probes."""
    m_bits, n_hashes = _resolve_params(m_bits, n_hashes, None, 0.0)
    on = list(on)
    if not on:
        raise ValueError("on must name at least one key column")
    not_null = F.lit(True)
    for c in on:
        not_null = not_null & F.col(c).isNotNull()
    probes = (
        keys.where(not_null)
        .select(F.explode(F.array(*_positions(on, m_bits, n_hashes))).alias("__pos"))
        .select(
            F.shiftright(F.col("__pos"), 6).alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(__pos & 63 AS INT))").alias(
                "__mask"
            ),
        )
    )
    return probes.groupBy("word").agg(F.bit_or("__mask").alias("bits"))


def _with_hit(
    df: DataFrame,
    keys: DataFrame,
    on: Sequence[str],
    m_bits: int | None,
    n_hashes: int | None,
    expected_keys: int | None,
    fpp: float,
    method: str,
) -> tuple[DataFrame, str]:
    """Tag each df row with a boolean hit column (True = possibly in
    keys; False = definitely not, including NULL-key rows). Returns
    (tagged_df, hit_col_name); caller filters and drops."""
    if method not in ("join", "pandas"):
        raise ValueError(f"method must be 'join' or 'pandas', got {method!r}")
    m_bits, n_hashes = _resolve_params(m_bits, n_hashes, expected_keys, fpp)
    on = list(on)
    missing = [c for c in on if c not in df.columns]
    if missing:
        raise ValueError(f"join columns absent from probe side: {missing}")
    words = bloom_bits(keys, on, m_bits, n_hashes)
    hit_col = "__bloom_hit"
    not_null = F.lit(True)
    for c in on:
        not_null = not_null & F.col(c).isNotNull()
    pos = _positions(on, m_bits, n_hashes)

    if method == "join":
        out = df
        hit = not_null
        for i in range(n_hashes):
            w = words.select(
                F.col("word").alias(f"__w{i}"), F.col("bits").alias(f"__b{i}")
            )
            out = (
                out.withColumn(f"__pp{i}", pos[i])
                .withColumn(f"__bw{i}", F.shiftright(F.col(f"__pp{i}"), 6))
                .withColumn(
                    f"__bm{i}",
                    F.expr(
                        f"shiftleft(CAST(1 AS BIGINT), CAST(__pp{i} & 63 AS INT))"
                    ),
                )
            )
            out = out.join(F.broadcast(w), out[f"__bw{i}"] == w[f"__w{i}"], "left")
            hit = hit & (F.col(f"__b{i}").bitwiseAND(F.col(f"__bm{i}")) != 0)
        out = out.withColumn(hit_col, F.coalesce(hit, F.lit(False)))
        temp = [
            c
            for i in range(n_hashes)
            for c in (f"__pp{i}", f"__bw{i}", f"__bm{i}", f"__w{i}", f"__b{i}")
        ]
        return out.drop(*temp), hit_col

    # method == "pandas": collect the packed words (<= m_bits/64 rows)
    # into a numpy bitset, broadcast, probe with Arrow batches.
    import numpy as np

    arr = np.zeros(m_bits // 64, dtype=np.uint64)
    for row in words.collect():
        arr[row["word"]] = np.uint64(row["bits"] & 0xFFFFFFFFFFFFFFFF)
    bc = df.sparkSession.sparkContext.broadcast(arr)

    pos_cols = [f"__p{i}" for i in range(n_hashes)]
    tagged = df.select(
        "*",
        *[p.alias(n) for p, n in zip(pos, pos_cols)],
        not_null.alias("__nn"),
    )
    from pyspark.sql.types import BooleanType, StructField, StructType

    out_schema = StructType(
        list(df.schema.fields) + [StructField(hit_col, BooleanType(), False)]
    )
    orig = [f.name for f in df.schema.fields]

    def probe(batches: Iterator) -> Iterator:
        bits = bc.value
        one = np.uint64(1)
        six = np.uint64(6)
        m63 = np.uint64(63)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            hit = pdf["__nn"].to_numpy(dtype=bool)
            for n in pos_cols:
                p = pdf[n].to_numpy(dtype=np.uint64)
                hit &= ((bits[(p >> six).astype(np.int64)] >> (p & m63)) & one) != 0
            res = pdf[orig].copy()
            res[hit_col] = hit
            yield res

    return tagged.mapInPandas(probe, out_schema), hit_col


def bloom_prune(
    df: DataFrame,
    keys: DataFrame,
    on: Sequence[str],
    m_bits: int | None = None,
    n_hashes: int | None = None,
    expected_keys: int | None = None,
    fpp: float = 0.01,
    method: str = "join",
) -> DataFrame:
    """Rows of ``df`` that MIGHT equi-match ``keys`` on ``on``.

    Superset guarantee: every row that a semi join would keep passes
    (no false negatives); an ~fpp fraction of non-matching rows also
    pass. NULL-key rows are dropped (they cannot equi-match). Pair with
    an exact join (``bloom_semi_join``) when exact results are needed;
    use alone when a bounded false-positive rate is acceptable (e.g.
    pre-shuffle reduction feeding a downstream exact aggregate)."""
    tagged, hit = _with_hit(df, keys, on, m_bits, n_hashes, expected_keys, fpp, method)
    return tagged.where(F.col(hit)).drop(hit)


def bloom_semi_join(
    df: DataFrame,
    keys: DataFrame,
    on: Sequence[str],
    m_bits: int | None = None,
    n_hashes: int | None = None,
    expected_keys: int | None = None,
    fpp: float = 0.01,
    method: str = "join",
) -> DataFrame:
    """EXACT ``df LEFT SEMI JOIN keys ON on`` with bloom pre-pruning.

    Identical output to ``df.join(keys, on, "semi")`` — the filter only
    cuts what the exact join must process: survivors are the true
    matches plus an fpp-fraction of false positives, so the join's
    shuffle reads |matches| + fpp*|df| rows instead of |df|."""
    pruned = bloom_prune(df, keys, on, m_bits, n_hashes, expected_keys, fpp, method)
    return pruned.join(keys.select(*on), list(on), "semi")


def bloom_anti_join(
    df: DataFrame,
    keys: DataFrame,
    on: Sequence[str],
    m_bits: int | None = None,
    n_hashes: int | None = None,
    expected_keys: int | None = None,
    fpp: float = 0.01,
    method: str = "join",
) -> DataFrame:
    """EXACT ``df LEFT ANTI JOIN keys ON on`` with bloom short-circuit.

    A bloom MISS is definitive (no false negatives), so missing rows —
    typically the overwhelming majority in decontamination-style
    anti joins — enter the result with NO join at all; only the hit
    fraction (true matches + fpp false positives) pays the exact anti
    join. ``df`` is traversed once: the tagged relation forks into the
    miss branch and the hit branch (persist upstream if the scan is
    expensive and the source is not a columnar file format)."""
    tagged, hit = _with_hit(df, keys, on, m_bits, n_hashes, expected_keys, fpp, method)
    misses = tagged.where(~F.col(hit)).drop(hit)
    hits = tagged.where(F.col(hit)).drop(hit)
    checked = hits.join(keys.select(*on), list(on), "anti")
    return misses.unionByName(checked)
