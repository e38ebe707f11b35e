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
    Hive-partitioned layouts (``partition_cols``) keep the plain append
    (cross-partition epoch cleanup is the table format's job — use a
    transactional format there).

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
    if (manifest_cols or bloom_cols) and partition_cols:
        raise ValueError(
            "parquet_batch_sink: manifest_cols/bloom_cols require a flat "
            "layout — hive-partitioned tables (partition_cols) already "
            "get directory-level pruning"
        )
    if checkpoint and partition_cols:
        # same construction-time loudness as manifest_cols: silently
        # downgrading an explicitly requested idempotence to
        # at-least-once would surface as duplicate rows much later
        raise ValueError(
            "parquet_batch_sink: replay idempotence (checkpoint=...) "
            "requires a flat layout — cross-partition epoch cleanup is a "
            "transactional table format's job"
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

    def _guard_epoch_regression(fs, jvm, epoch_id: int) -> None:
        """Fail loudly when this lineage's epochs go BACKWARD: epoch
        ids restart at 0 when a checkpoint is wiped and recreated at
        the SAME path (same lineage hash), and letting the new run's
        epoch k delete the old run's e<k>- files would destroy
        committed rows covering different offsets. Same discipline as
        the bucketed CDC's stale-checkpoint guard; adopt the table
        explicitly by removing the lineage state file."""
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
            if epoch_id < state["max_epoch"]:
                raise ValueError(
                    f"epoch {epoch_id} is older than this lineage's last "
                    f"written epoch {state['max_epoch']} — the checkpoint "
                    f"at {checkpoint!r} was wiped/recreated; replaying "
                    "restarted epoch ids would DELETE committed rows. "
                    f"Adopt the table explicitly by removing {p}"
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
        # routed through write_partitioned_parquet so flat epoch writes
        # keep the maxRecordsPerFile bound (one skewed batch must not
        # produce a 100 GB file)
        write_partitioned_parquet(batch_df, staging, (), mode="overwrite")
        # (epoch, lineage) scope; trailing '-' makes prefixes exact
        # ('e1-' never matches 'e10-...')
        prefix = f"e{epoch_id}-{lineage}-"
        # rename the new attempt IN first...
        i = 0
        spath = jvm.org.apache.hadoop.fs.Path(staging)
        for st in fs.listStatus(spath):
            name = st.getPath().getName()
            if st.isFile() and is_data_file(name):
                dst = jvm.org.apache.hadoop.fs.Path(
                    f"{path}/{prefix}{token}-{i}.parquet"
                )
                if not fs.rename(st.getPath(), dst):
                    raise RuntimeError(
                        f"parquet_batch_sink: rename {name} -> {dst} failed"
                    )
                i += 1
        fs.delete(spath, True)
        # ...THEN drop dead attempts of this (epoch, lineage): a crash
        # between the two phases leaves duplicates, which the
        # guaranteed replay (the batch's offsets were not committed)
        # converges — never a window with committed rows missing
        marker = f"-{token}-"
        for st in fs.listStatus(root):
            name = st.getPath().getName()
            if st.isFile() and name.startswith(prefix) and marker not in name:
                fs.delete(st.getPath(), False)
        _commit_epoch_state(fs, jvm, epoch_id)

    def sink(batch_df: DataFrame, epoch_id: int | None = None) -> None:
        if epoch_id is not None and lineage is not None and not partition_cols:
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
