"""Pipeline orchestrator — the reference's main.py re-done correctly.

The reference starts its four jobs then blocks forever inside the mail
consumer's ``for msg in consumer`` loop, so its liveness poll is
unreachable (reference main.py:40-53, SURVEY.md §3.1 step 4). Here
every job is a StreamingQuery handle; the orchestrator owns a single
poll loop, propagates the first failure, and stops everything cleanly.

The notification sink (the reference's SMTP consumer) is just another
foreachBatch sink on the alert stream — in-process, checkpointed,
restart-safe — not an out-of-band Kafka consumer.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from iot_sensor_data_pipeline_spark.streaming.jobs import (
    BatchSink,
    start_aggregator,
    start_alerts,
    start_persistence,
)


class Pipeline:
    """Owns the engine's streaming queries; context-manager lifecycle."""

    def __init__(self) -> None:
        self.queries: dict[str, StreamingQuery] = {}

    def add(self, name: str, query: StreamingQuery) -> None:
        self.queries[name] = query

    def start_standard_jobs(
        self,
        raw_factory: Callable[[], DataFrame],
        checkpoint_root: str,
        readings_sinks: Sequence[BatchSink],
        alerts_sinks: Sequence[BatchSink],
        agg_sinks: Sequence[BatchSink],
        **agg_kw,
    ) -> "Pipeline":
        """Start the reference's three jobs. ``raw_factory`` builds one
        source DataFrame per job — separate checkpointed subscriptions,
        each reading the source exactly once for ALL its sinks."""
        self.add(
            "persistence",
            start_persistence(raw_factory(), readings_sinks, f"{checkpoint_root}/persistence"),
        )
        self.add(
            "alerts",
            start_alerts(raw_factory(), alerts_sinks, f"{checkpoint_root}/alerts"),
        )
        self.add(
            "aggregator",
            start_aggregator(raw_factory(), agg_sinks, f"{checkpoint_root}/aggregator", **agg_kw),
        )
        return self

    def await_all(self, poll_seconds: float = 1.0, timeout: float | None = None) -> None:
        """Liveness loop (the one the reference never reaches): returns
        when every query stops; raises the first query exception."""
        deadline = None if timeout is None else time.monotonic() + timeout
        while True:
            active = [q for q in self.queries.values() if q.isActive]
            for name, q in self.queries.items():
                if not q.isActive and q.exception() is not None:
                    self.stop_all()
                    raise RuntimeError(f"query '{name}' failed") from q.exception()
            if not active:
                return
            if deadline is not None and time.monotonic() > deadline:
                return
            time.sleep(poll_seconds)

    def plan_maintenance(
        self,
        spark,
        tables: dict[str, str],
        target_bytes: int,
        manifest_cols: dict[str, Sequence[str]] | None = None,
        bloom_cols: dict[str, Sequence[str]] | None = None,
    ) -> dict[str, DataFrame]:
        """Maintenance planning for the parquet tables the pipeline's
        sinks feed — the OPTIMIZE loop a micro-batch writer needs:
        every foreachBatch append is one file per partition per batch,
        so file counts grow linearly with uptime and footer manifests
        go stale. For each ``name -> path``: refresh the skipping
        manifest incrementally (when ``manifest_cols[name]`` is given —
        footer-reads only files added since the last refresh), refresh
        the per-file Bloom point-lookup index the same way (when
        ``bloom_cols[name]`` is given — bloom-reads only new files;
        both refreshes are zero-job no-ops when the file set is
        unchanged), and return the table's
        :func:`~.manifest.plan_compaction` plan (file-metadata grain —
        one listing, no data reads). The caller executes chosen plans
        via ``sources.manifest.optimize_table`` (the in-place journaled
        swap, which also refreshes the manifest/bloom index
        INCREMENTALLY — the swap is just new files + dropped files to
        them) or the lower-level ``compact_files`` /
        ``compact_clustered`` during a low-traffic window; nothing is
        rewritten here.

        EPOCH-IDEMPOTENT SINK TABLES (``parquet_batch_sink`` with
        ``checkpoint=``): STOP the stream before executing a compaction
        plan against the table, or exclude the newest epoch's
        ``e<N>-<lineage>-`` files from retirement. Retiring originals
        must not race a live stream: if the newest epoch's files are
        compacted+retired and that epoch is then REPLAYED (its offsets
        were uncommitted at a crash), the replay re-adds rows already
        absorbed into the compacted file — duplicates that never
        converge, because the replay's dead-attempt sweep only matches
        epoch-named files, not the compacted one. Same discipline as
        :func:`~.jobs.rebucket_cdc_snapshot` documents for the bucketed
        CDC layout."""
        from iot_sensor_data_pipeline_spark.sources.bloom_index import (
            update_bloom_index,
        )
        from iot_sensor_data_pipeline_spark.sources.manifest import (
            plan_compaction,
            update_manifest,
        )

        import logging

        log = logging.getLogger(__name__)
        plans: dict[str, DataFrame] = {}
        for name, path in tables.items():
            # per-table isolation: one table's broken/missing index must
            # not abort maintenance planning for every healthy table —
            # stale skipping state is conservative by design
            cols = (manifest_cols or {}).get(name)
            if cols:
                try:
                    update_manifest(spark, path, cols)
                except Exception:  # noqa: BLE001
                    log.warning(
                        "plan_maintenance: manifest refresh failed for %s "
                        "(%s); continuing stale", name, path, exc_info=True,
                    )
            bcols = (bloom_cols or {}).get(name)
            if bcols:
                try:
                    update_bloom_index(spark, path, bcols)
                except Exception:  # noqa: BLE001
                    log.warning(
                        "plan_maintenance: bloom refresh failed for %s (%s) "
                        "— rebuild with write_bloom_index if the index dir "
                        "is missing (e.g. after compaction); continuing "
                        "stale", name, path, exc_info=True,
                    )
            try:
                plans[name] = plan_compaction(spark, path, target_bytes)
            except Exception:  # noqa: BLE001
                # e.g. a table whose stream has not committed its first
                # batch yet (directory missing) — skip it, plan the rest
                log.warning(
                    "plan_maintenance: compaction planning failed for %s "
                    "(%s); skipping this table", name, path, exc_info=True,
                )
        return plans

    def recover_on_start(self, spark, tables: dict[str, str]) -> dict[str, str]:
        """Run :func:`~.manifest.recover_optimize` over every table the
        pipeline's sinks feed, BEFORE any query starts — closing the
        duplicate window an interrupted OPTIMIZE swap leaves open
        (VERDICT r10 task 6): the journal's retire list may still be on
        disk next to all the adds, so readers see every row twice until
        recovery rolls the swap forward (or back, when any add is
        missing). Without this hook, recovery only ran when the NEXT
        optimize started — on a table optimized weekly, a crash leaves
        duplicates visible for up to a week. Call it in the same boot
        step that starts the queries (a crashed maintenance writer is
        exactly the case where the orchestrator restarts).

        Returns ``{name: 'forward' | 'back' | 'clean'}``. A table whose
        recovery fails (directory vanished, FS hiccup) is reported as
        ``'error'`` and the rest still recover — a missed recovery is
        the status quo ante, never new corruption."""
        import logging

        from iot_sensor_data_pipeline_spark.sources.manifest import (
            recover_optimize,
        )

        log = logging.getLogger(__name__)
        out: dict[str, str] = {}
        for name, path in tables.items():
            try:
                out[name] = recover_optimize(spark, path)
            except Exception:  # noqa: BLE001 — per-table isolation
                log.warning(
                    "recover_on_start: recovery failed for %s (%s); "
                    "reads may see an interrupted swap's duplicates "
                    "until the next successful optimize",
                    name, path, exc_info=True,
                )
                out[name] = "error"
        return out

    def health(
        self, spark, tables: dict[str, str], target_bytes: int | None = None
    ) -> dict[str, dict]:
        """Per-table :func:`~.manifest.table_health` probe — the
        scheduled heartbeat companion to :meth:`plan_maintenance`
        (plan_maintenance REFRESHES and PLANS; this only OBSERVES:
        metadata-grain, zero mutation, zero data reads). A table whose
        probe fails (not created yet, FS hiccup) reports
        ``{"error": <message>}`` and the rest still report."""
        from iot_sensor_data_pipeline_spark.sources.manifest import (
            table_health,
        )

        out: dict[str, dict] = {}
        for name, path in tables.items():
            try:
                out[name] = table_health(spark, path, target_bytes)
            except Exception as e:  # noqa: BLE001 — per-table isolation
                out[name] = {"error": str(e)}
        return out

    def process_all_available(self) -> None:
        """Drain every query synchronously (test/batch-drive mode)."""
        for q in self.queries.values():
            q.processAllAvailable()

    def stop_all(self) -> None:
        for q in self.queries.values():
            if q.isActive:
                q.stop()

    def __enter__(self) -> "Pipeline":
        return self

    def __exit__(self, *exc) -> None:
        self.stop_all()
