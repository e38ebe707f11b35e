"""Batch sinks: partitioned parquet (data-lake layout) and console.

The reference's only batch outputs are JDBC appends; a general engine
also needs columnar table output. ``parquet_sink`` writes
date/hour-partitioned parquet — the layout that makes downstream
partition pruning work (queries on a time range touch only those
directories).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_partitioned_parquet(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str] = (),
    mode: str = "append",
    max_records_per_file: int | None = 1_000_000,
    zorder_by: Sequence[str] = (),
    zorder_files: int | None = None,
    zorder_bits: int = 7,
) -> None:
    """Partitioned parquet write. ``max_records_per_file`` bounds file
    size so one skewed partition value doesn't produce a 100 GB file.

    ``zorder_by`` (two or more columns) lays the files out along a
    Z-order curve over those columns before writing: each column is
    rank-bucketed into ``2^zorder_bits`` quantile buckets
    (operators/layout.bucketize_for_zorder — one approxQuantile pass,
    skew-proof), the buckets Morton-interleave into one codegen sort
    key (zorder_key), and rows are range-partitioned + sorted on it —
    so parquet min/max footers prune predicates on EVERY z-ordered
    dimension, not only a leading sort column. ``zorder_files``
    fixes the number of output files (defaults to the session's
    shuffle parallelism). Combine with ``partition_cols``: the range
    partitioning leads with the hive partition columns so each
    directory's files stay z-clustered.
    """
    zorder_by = list(zorder_by)
    if zorder_by:
        from iot_sensor_data_pipeline_spark.operators.layout import (
            bucketize_for_zorder,
            zorder_key,
        )

        bucket_cols = [f"__zb_{c}" for c in zorder_by]
        df = bucketize_for_zorder(df, zorder_by, bits=zorder_bits).withColumn(
            "__zk", zorder_key(bucket_cols, bits=zorder_bits)
        )
        range_cols = [*partition_cols, "__zk"]
        df = (
            df.repartitionByRange(zorder_files, *range_cols)
            if zorder_files
            else df.repartitionByRange(*range_cols)
        )
        df = df.sortWithinPartitions(*range_cols).drop("__zk", *bucket_cols)
    writer = df.write.mode(mode)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)


def with_date_partitions(df: DataFrame, ts_col: str) -> DataFrame:
    """Add dt/hour partition columns derived from event time — the
    standard lake layout for time-series tables."""
    return df.withColumn("dt", F.to_date(ts_col)).withColumn("hour", F.hour(ts_col))


def _lineage_of(checkpoint: str) -> str:
    import hashlib

    return hashlib.sha256(checkpoint.encode("utf-8")).hexdigest()[:8]


def parse_epoch_name(name: str, lineage: str) -> int | None:
    """Epoch id from an ``e<N>-<lineage>-...`` data-file name, or None
    when the name is not this lineage's. THE one parser for the sink's
    naming convention — the guard, the as-of reader, and the
    compaction planner's live-epoch exclusion all route through it
    (like ``manifest.is_data_file``, two drifting copies would fail
    OPEN: a parser matching nothing excludes nothing, and the planner
    would retire a replayable epoch)."""
    marker = f"-{lineage}-"
    if not name.startswith("e") or marker not in name:
        return None
    head = name[1:name.index(marker)]
    return int(head) if head.isdigit() else None


def parse_epoch_file(name: str) -> tuple[int, str] | None:
    """(epoch, lineage) from an epoch-scoped data-file name WITHOUT
    knowing the lineage up front — ``e<N>-<8-hex-lineage>-...``. The
    lineage-agnostic sibling of :func:`parse_epoch_name` (consistent by
    construction: a name this parser accepts, parse_epoch_name accepts
    for the same lineage). OPTIMIZE uses it to discover WHICH lineages'
    epochs it is retiring so it can persist the ``compacted_through``
    watermark the as-of reader refuses below (VERDICT r10 task 1)."""
    import re

    m = re.match(r"^e(\d+)-([0-9a-f]{8})-", name)
    if m is None:
        return None
    return int(m.group(1)), m.group(2)


def _compacted_marker_path(path: str, lineage: str, jvm):
    return jvm.org.apache.hadoop.fs.Path(
        f"{path}/_compacted_through_{lineage}.json"
    )


def _read_compacted_through(fs, jvm, path: str, lineage: str) -> int | None:
    """Highest epoch id of this lineage whose files an OPTIMIZE has
    retired into lineage-less ``c<token>-`` compacted files, or None
    when the lineage's history is fully intact."""
    import json

    p = _compacted_marker_path(path, lineage, jvm)
    if not fs.exists(p):
        return None
    stream = fs.open(p)
    try:
        state = json.loads(
            jvm.org.apache.commons.io.IOUtils.toString(
                stream, jvm.java.nio.charset.StandardCharsets.UTF_8
            )
        )
    finally:
        stream.close()
    return int(state["compacted_through"])


def _write_compacted_through(fs, jvm, path: str, lineage: str, epoch: int) -> None:
    """Monotone (max-of) write of the lineage's compaction watermark —
    write-then-rename, idempotent, so the forward arm of
    ``manifest.recover_optimize`` can re-run it safely."""
    import json

    existing = _read_compacted_through(fs, jvm, path, lineage)
    if existing is not None and existing >= epoch:
        return
    p = _compacted_marker_path(path, lineage, jvm)
    tmp = jvm.org.apache.hadoop.fs.Path(str(p) + ".tmp")
    out = fs.create(tmp, True)
    try:
        out.write(json.dumps({"compacted_through": epoch}).encode("utf-8"))
    finally:
        out.close()
    fs.delete(p, False)
    if not fs.rename(tmp, p):
        raise RuntimeError(f"compacted-through watermark swap failed: {p}")


def read_compacted_through(spark, path: str, checkpoint: str) -> int | None:
    """Public form of the compaction watermark: the highest epoch of
    ``checkpoint``'s lineage that an OPTIMIZE has absorbed into
    compacted files (None = history intact; see
    :func:`read_sink_as_of` for why as-of reads refuse below it)."""
    jvm = spark._jvm
    root = jvm.org.apache.hadoop.fs.Path(path)
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
    return _read_compacted_through(fs, jvm, path, _lineage_of(checkpoint))


def _iter_lineage_files(spark, path: str, lineage: str):
    """(hadoop Path, epoch) for every committed e<N>-<lineage>- data
    file under the table, RECURSIVE (partition subdirs included)."""
    from iot_sensor_data_pipeline_spark.sources.manifest import is_data_file

    jvm = spark._jvm
    root = jvm.org.apache.hadoop.fs.Path(path)
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
    it = fs.listFiles(root, True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if not is_data_file(name):
            continue
        epoch = parse_epoch_name(name, lineage)
        if epoch is not None:
            yield st.getPath(), epoch


def list_sink_epochs(spark, path: str, checkpoint: str) -> list[int]:
    """Sorted distinct epoch ids committed by ``checkpoint``'s lineage
    whose files are STILL epoch-named on disk. After an OPTIMIZE of the
    table, epochs at/below the lineage's ``compacted_through`` watermark
    (:func:`read_compacted_through`) no longer appear here — their files
    were absorbed into ``c<token>-`` compacted files."""
    return sorted({e for _, e in _iter_lineage_files(spark, path, _lineage_of(checkpoint))})


def newest_epoch_files(spark, path: str, checkpoint: str) -> list[str]:
    """Base names of the NEWEST epoch's files for ``checkpoint``'s
    lineage — the files a compaction must NOT retire while the stream
    is live (that epoch's offsets may be uncommitted; a replay would
    re-add rows already absorbed into the compacted file — see
    ``streaming.orchestrator.plan_maintenance``). Diagnostic/manual
    use; for a LIVE stream prefer ``optimize_table(...,
    live_checkpoints=[checkpoint])``, which derives the same exclusion
    from the planner's own listing — a precomputed list from here races
    an epoch committed between the two listings. Empty when the lineage
    never wrote."""
    lineage = _lineage_of(checkpoint)
    pairs = [(p.getName(), e) for p, e in _iter_lineage_files(spark, path, lineage)]
    if not pairs:
        return []
    newest = max(e for _, e in pairs)
    return sorted(n for n, e in pairs if e == newest)


def read_sink_as_of(
    spark,
    path: str,
    checkpoint: str,
    as_of_epoch: int | None = None,
    allow_compacted: bool = False,
):
    """Time-travel read of an epoch-idempotent sink table: the rows ONE
    lineage (identified by its ``checkpoint`` path, exactly as the sink
    was configured) had committed as of ``as_of_epoch`` (inclusive;
    None = every committed epoch). The epoch-scoped file names ARE the
    version metadata — no extra bookkeeping to maintain — so this reads
    files ``e<N>-<lineage>-*`` with N <= as_of_epoch and nothing else.

    COMPACTION ERASES HISTORY: ``manifest.optimize_table`` (and its
    partitioned sibling) rewrite settled epochs' files into lineage-less
    ``c<token>-`` names and persist the max retired epoch per lineage as
    a ``compacted_through`` watermark on the table. Once the watermark
    exists, NO epoch-scoped answer is reconstructible — the compacted
    files merge this lineage's retired epochs with whatever else was
    small (other lineages, plain appends) — so this function RAISES for
    any ``as_of_epoch`` on a compacted lineage, and for ``None`` too
    unless ``allow_compacted=True``, which opts into CURRENT-STATE
    semantics instead: the full merged table (all lineages — the only
    consistent read that remains). A silent partial answer (only the
    still-epoch-named files) is exactly the failure this guard exists
    to prevent (VERDICT r10 task 1).

    Foreign lineages' files and non-epoch appends are EXCLUDED by
    design: epoch ids are only meaningful within one checkpoint, so
    cross-lineage "as of" has no consistent definition (read the plain
    table for the merged current state). Hive-partitioned layouts keep
    their inferred partition columns (``basePath``). Raises when the
    lineage has no committed files at all — an empty answer to "as of"
    on a lineage that never wrote is a caller bug, not an empty table.
    Cost: one recursive listing (metadata-grain) + a scan of the
    selected files only."""
    lineage = _lineage_of(checkpoint)
    jvm = spark._jvm
    root = jvm.org.apache.hadoop.fs.Path(path)
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
    watermark = _read_compacted_through(fs, jvm, path, lineage)
    if watermark is not None:
        if as_of_epoch is None and allow_compacted:
            # opt-in current-state semantics: epoch scoping is gone, the
            # merged table is the one consistent answer left
            return spark.read.parquet(path)
        raise ValueError(
            f"history compacted away — epochs <= {watermark} of "
            f"{checkpoint!r}'s lineage were absorbed into compacted "
            f"(c<token>-) files by optimize_table, so no as-of answer "
            f"is reconstructible from {path}. Pass allow_compacted=True "
            "with as_of_epoch=None for the merged current state, or "
            "exclude the table from OPTIMIZE to keep time travel."
        )
    # ONE recursive listing, reused for the selection, the existence
    # check, and the schema probe — on an object store the listing is
    # the dominant metadata cost and must not triple
    all_files = [
        (p.toString(), e) for p, e in _iter_lineage_files(spark, path, lineage)
    ]
    if not all_files:
        raise ValueError(
            f"no committed files for lineage of {checkpoint!r} under {path}"
        )
    files = [
        f for f, e in all_files if as_of_epoch is None or e <= as_of_epoch
    ]
    if not files:
        # the lineage exists but nothing at/before as_of_epoch: an
        # empty-but-typed frame (schema from the lineage's own files)
        return (
            spark.read.option("basePath", path).parquet(all_files[0][0]).limit(0)
        )
    return spark.read.option("basePath", path).parquet(*files)


def parquet_batch_sink(
    path: str,
    partition_cols: Sequence[str] = (),
    manifest_cols: Sequence[str] = (),
    bloom_cols: Sequence[str] = (),
    checkpoint: str | None = None,
):
    """foreachBatch-compatible sink: append each micro-batch to a
    partitioned parquet table.

    REPLAY IDEMPOTENCE (opt in by passing the query's ``checkpoint``
    path): the sink declares the (batch, epoch) signature, so the
    streaming fan-out passes the epoch id, and flat-layout writes
    become replay-safe. The batch lands in a hidden staging dir, the
    staged files move in under lineage-scoped names
    (``e<epoch>-<lineage>-<token>-<i>.parquet``), and THEN any files of
    the same (epoch, lineage) from a previous attempt are deleted — a
    replayed epoch (foreachBatch is at-least-once) converges to exactly
    one copy instead of appending duplicates, and the
    rename-before-delete order means a crash can leave duplicates
    (healed by the guaranteed replay) but never a window where
    committed rows are missing.

    The ``lineage`` tag is a hash of the checkpoint path: epoch ids are
    only unique WITHIN a checkpoint, so cleanup keyed on the bare epoch
    would let a fresh/foreign checkpoint's epoch 0 silently delete
    another lineage's committed files — scoping both the names and the
    delete to (epoch, lineage) makes a foreign writer merely additive
    (the pre-existing at-least-once behavior), never destructive.
    Without ``checkpoint`` (or when called directly with one argument),
    the sink is a plain at-least-once append. Fresh names per attempt
    keep the skipping manifest honest: a replay's files enter as new
    files (footer-read) while the dead attempt's rows drop as deleted
    files — same-name rewrites would leave stale min/max stats behind.
    Hive-partitioned layouts (``partition_cols``) get the same
    idempotence (VERDICT r9 task 3): the batch stages partitionBy'd,
    each partition subdirectory's files move in under the same
    lineage-scoped names, and the dead-attempt sweep walks the table
    RECURSIVELY — so a replay whose rows land in DIFFERENT partitions
    (repartitioned batch, changed partition expression) still retires
    every file of the dead attempt wherever it lives. The sweep cost is
    one recursive listing per batch — metadata-grain, same order as the
    listing any reader pays.

    ``manifest_cols`` keeps a footer-stats skipping manifest
    (sources/manifest.py) FRESH as the stream writes: after each batch
    commit, :func:`~.manifest.update_manifest` footer-reads ONLY the
    batch's new files (the incremental path) so downstream
    ``read_pruned`` queries never see a stale manifest and never pay a
    full rebuild. ``bloom_cols`` does the same for the per-file Bloom
    point-lookup index (sources/bloom_index.py) — the index must exist
    (``write_bloom_index`` once at table creation fixes its sizing);
    the refresh bloom-reads only the batch's new files. This is
    exactly the small-file/stale-stats loop a micro-batch sink creates
    — the matching compaction half surfaces through
    ``streaming.orchestrator.Pipeline.plan_maintenance``. Index scope
    is flat parquet directories, so both are mutually exclusive with
    ``partition_cols`` (hive layouts get directory pruning from Spark
    itself). Maintenance failures never poison data: a stale
    manifest/index is conservative by design, so refresh errors are
    logged and skipped (the parquet append is not idempotent — an
    escaping exception would replay the batch into duplicates)."""
    manifest_cols = list(manifest_cols)
    bloom_cols = list(bloom_cols)
    # hive layouts keep their indexes too (r11 — the manifest/bloom
    # listings cover k=v partition subdirs): footer skipping on
    # NON-partition columns composes with Spark's directory pruning.
    # Indexing a PARTITION column is rejected — its values live in dir
    # names, not footers (manifest rows would be no-stats noise; bloom
    # would silently index all-NULL keys and prune wrongly)
    overlap = sorted((set(manifest_cols) | set(bloom_cols)) & set(partition_cols))
    if overlap:
        raise ValueError(
            f"parquet_batch_sink: {overlap} are partition columns — "
            "index data columns only; partition columns already get "
            "directory-level pruning"
        )
    def _refresh(fn, what: str, spark) -> None:
        # The parquet append is NOT idempotent: letting a maintenance
        # failure (rename race, transient remote-FS error) escape
        # foreachBatch makes Spark replay the batch and append the same
        # rows AGAIN. A stale manifest/index is safe by design (files
        # it does not cover are conservatively kept, the next
        # successful refresh self-heals), so log and move on.
        import logging

        try:
            fn(spark)
        except Exception:  # noqa: BLE001 — maintenance must not poison data
            logging.getLogger(__name__).warning(
                "parquet_batch_sink: %s refresh for %s failed; continuing "
                "stale (self-heals on the next refresh)",
                what,
                path,
                exc_info=True,
            )

    import hashlib

    lineage = (
        hashlib.sha256(checkpoint.encode("utf-8")).hexdigest()[:8]
        if checkpoint
        else None
    )

    def _iter_table_files(fs, jvm):
        """All files under the table, RECURSIVE (partition subdirs
        included), as (hadoop Path, name) pairs. Staging dirs are
        skipped by name — their contents are part-* files that never
        match an e<N>-<lineage>- prefix anyway."""
        it = fs.listFiles(jvm.org.apache.hadoop.fs.Path(path), True)
        while it.hasNext():
            st = it.next()
            p = st.getPath()
            yield p, p.getName()

    def _infer_max_epoch(fs, jvm) -> int:
        """Largest epoch id among this lineage's committed file names.
        The fallback authority when the lineage state file is missing
        (crash between its delete and rename, manual cleanup): the
        epoch-regression guard must stay armed on what is actually on
        disk, not silently pass (ADVICE r9 item 1). The lineage's
        ``compacted_through`` watermark joins the max: after an
        OPTIMIZE absorbed old epochs' files into c<token>- names, the
        file names alone UNDERSTATE the max epoch and a wiped-checkpoint
        replay could slip past the guard."""
        best = -1
        for p, name in _iter_table_files(fs, jvm):
            epoch = parse_epoch_name(name, lineage)
            if epoch is not None:
                best = max(best, epoch)
        watermark = _read_compacted_through(fs, jvm, path, lineage)
        if watermark is not None:
            best = max(best, watermark)
        return best

    def _guard_epoch_regression(fs, jvm, epoch_id: int) -> None:
        """Fail loudly when this lineage's epochs go BACKWARD: epoch
        ids restart at 0 when a checkpoint is wiped and recreated at
        the SAME path (same lineage hash), and letting the new run's
        epoch k delete the old run's e<k>- files would destroy
        committed rows covering different offsets. Same discipline as
        the bucketed CDC's stale-checkpoint guard. A MISSING state file
        does not disarm the guard — max_epoch is re-inferred from the
        e<N>-<lineage>- file names on disk; adopt a wiped-checkpoint
        table explicitly by writing ``{"max_epoch": -1}`` into the
        lineage state file."""
        import json

        p = jvm.org.apache.hadoop.fs.Path(f"{path}/_sink_lineage_{lineage}.json")
        if fs.exists(p):
            stream = fs.open(p)
            try:
                state = json.loads(
                    jvm.org.apache.commons.io.IOUtils.toString(
                        stream, jvm.java.nio.charset.StandardCharsets.UTF_8
                    )
                )
            finally:
                stream.close()
            max_epoch = state["max_epoch"]
            source = f"lineage state {p}"
        else:
            max_epoch = _infer_max_epoch(fs, jvm)
            source = "file names on disk (lineage state file missing)"
        if epoch_id < max_epoch:
            raise ValueError(
                f"epoch {epoch_id} is older than this lineage's last "
                f"written epoch {max_epoch} (from {source}) — the "
                f"checkpoint at {checkpoint!r} was wiped/recreated; "
                "replaying restarted epoch ids would DELETE committed "
                "rows. Adopt the table explicitly by writing "
                f'{{"max_epoch": -1}} to {p}'
            )

    def _commit_epoch_state(fs, jvm, epoch_id: int) -> None:
        import json

        p = jvm.org.apache.hadoop.fs.Path(f"{path}/_sink_lineage_{lineage}.json")
        tmp = jvm.org.apache.hadoop.fs.Path(str(p) + ".tmp")
        out = fs.create(tmp, True)
        try:
            out.write(json.dumps({"max_epoch": epoch_id}).encode("utf-8"))
        finally:
            out.close()
        fs.delete(p, False)
        if not fs.rename(tmp, p):
            raise RuntimeError(f"parquet_batch_sink: lineage-state swap failed: {p}")

    def _write_epoch_idempotent(batch_df: DataFrame, epoch_id: int) -> None:
        import uuid

        from iot_sensor_data_pipeline_spark.sources.manifest import is_data_file

        spark = batch_df.sparkSession
        jvm = spark._jvm
        root = jvm.org.apache.hadoop.fs.Path(path)
        fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
        token = uuid.uuid4().hex[:8]
        # lineage+token-scoped staging: a concurrent writer at the same
        # epoch id (foreign lineage, or a zombie attempt of this one)
        # must never share a staging dir — a shared dir would let one
        # attempt's overwrite/rename claim the other's staged files
        staging = f"{path}/_staging_e{epoch_id}_{lineage}_{token}"
        if fs.exists(root):
            _guard_epoch_regression(fs, jvm, epoch_id)
        # routed through write_partitioned_parquet so epoch writes keep
        # the maxRecordsPerFile bound (one skewed batch must not
        # produce a 100 GB file); hive layouts stage partitionBy'd so
        # the relative partition subpaths move in verbatim
        write_partitioned_parquet(
            batch_df, staging, partition_cols, mode="overwrite"
        )
        # (epoch, lineage) scope; trailing '-' makes prefixes exact
        # ('e1-' never matches 'e10-...')
        prefix = f"e{epoch_id}-{lineage}-"
        # rename the new attempt IN first — preserving each staged
        # file's partition subpath (dt=.../hour=...) so hive partition
        # inference sees the same layout a plain append would produce
        i = 0
        spath = jvm.org.apache.hadoop.fs.Path(staging)
        # listFiles yields scheme-qualified paths (file:/x); qualify the
        # staging root the same way or the relative-subpath slice is
        # computed at the wrong offset
        staging_uri = fs.makeQualified(spath).toString().rstrip("/")
        it = fs.listFiles(spath, True)
        made_dirs: set[str] = set()
        while it.hasNext():
            st = it.next()
            name = st.getPath().getName()
            if not is_data_file(name):
                continue
            parent = st.getPath().getParent().toString().rstrip("/")
            rel = parent[len(staging_uri):].strip("/")  # '' for flat
            dst_dir = f"{path}/{rel}".rstrip("/")
            if rel and dst_dir not in made_dirs:
                fs.mkdirs(jvm.org.apache.hadoop.fs.Path(dst_dir))
                made_dirs.add(dst_dir)
            dst = jvm.org.apache.hadoop.fs.Path(
                f"{dst_dir}/{prefix}{token}-{i}.parquet"
            )
            if not fs.rename(st.getPath(), dst):
                raise RuntimeError(
                    f"parquet_batch_sink: rename {name} -> {dst} failed"
                )
            i += 1
        fs.delete(spath, True)
        # ...THEN drop dead attempts of this (epoch, lineage),
        # RECURSIVELY: a replay may land rows in different partition
        # dirs than the dead attempt did, so the sweep must cover the
        # whole table, not the root listing. A crash between the two
        # phases leaves duplicates, which the guaranteed replay (the
        # batch's offsets were not committed) converges — never a
        # window with committed rows missing
        marker = f"-{token}-"
        dead = [
            fpath
            for fpath, name in _iter_table_files(fs, jvm)
            if name.startswith(prefix) and marker not in name
        ]  # materialize before deleting: never mutate under the iterator
        for fpath in dead:
            fs.delete(fpath, False)
        _commit_epoch_state(fs, jvm, epoch_id)

    def sink(batch_df: DataFrame, epoch_id: int | None = None) -> None:
        if epoch_id is not None and lineage is not None:
            _write_epoch_idempotent(batch_df, epoch_id)
        else:
            write_partitioned_parquet(batch_df, path, partition_cols)
        if manifest_cols:
            from iot_sensor_data_pipeline_spark.sources.manifest import (
                update_manifest,
            )

            _refresh(
                lambda s: update_manifest(s, path, manifest_cols),
                "manifest",
                batch_df.sparkSession,
            )
        if bloom_cols:
            from iot_sensor_data_pipeline_spark.sources.bloom_index import (
                update_bloom_index,
            )

            _refresh(
                lambda s: update_bloom_index(s, path, bloom_cols),
                "bloom index",
                batch_df.sparkSession,
            )

    return sink
