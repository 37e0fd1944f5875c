"""Streaming sinks beyond the built-ins.

``start_upsert_sink`` wires Structured Streaming to the batch upsert
(sources/upsert.py) via foreachBatch: each micro-batch MERGEs into a
keyed parquet target instead of blind-appending.  With the batch
first deduped on the key, replayed micro-batches (checkpoint
recovery) converge to the same target state — the standard
idempotent-sink recipe for exactly-once-to-storage on plain parquet.

Scale: each micro-batch's merge cost is bounded by the batch size
plus the touched partitions (partition-scoped rewrite), never the
whole target.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..sources.upsert import upsert_parquet


def start_upsert_sink(
    stream: DataFrame,
    target_path: str,
    key: str | list[str],
    checkpoint: str,
    partition_by: str | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Run a stream into a keyed parquet target via MERGE-per-batch."""
    keys = [key] if isinstance(key, str) else key

    def merge_batch(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        # last-writer-wins inside a batch: one row per key
        deduped = batch.dropDuplicates(keys)
        upsert_parquet(spark, deduped, target_path, keys, partition_by=partition_by)

    writer = (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_tablelog_sink(
    stream: DataFrame,
    table_path: str,
    checkpoint: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Stream into a tablelog table with EXACTLY-ONCE commits.

    Each micro-batch appends one table version whose manifest records
    the batch id — the manifest commit IS the transaction log.  On
    checkpoint replay (crash between sink commit and checkpoint
    write) the batch id is already present, so the batch is skipped;
    a crash BEFORE the manifest claim leaves only unreferenced
    staging files, which readers never see.  That is stronger than
    the idempotent-MERGE recipe: no key column is needed, blind
    appends are safe.

    Scale: commit cost is O(batch files) + one manifest write; the
    already-landed check is O(versions) manifest reads (a head-side
    cache or meta index removes even that at very long histories)."""
    from ..sources import tablelog

    def commit_batch(batch: DataFrame, batch_id: int) -> None:
        if not tablelog.versions(table_path):
            files = tablelog._write_commit_data(batch, table_path, 0)
            tablelog._commit(table_path, 0, files, "create", {"batch_id": batch_id})
            return
        if batch_id in tablelog.committed_meta_values(table_path, "batch_id"):
            return  # replayed batch — already durably committed
        tablelog.append(batch, table_path, meta={"batch_id": batch_id})

    writer = (
        stream.writeStream.foreachBatch(commit_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
