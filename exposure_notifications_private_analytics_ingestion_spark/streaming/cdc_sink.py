"""Streaming CDC upsert sink: a correction stream MERGEs into a keyed table.

The batch engine already has the MERGE INTO analog
(``plans/tables.py::TableProvider.merge_upsert`` — real ``MERGE INTO`` under
Iceberg, partition-scoped copy-on-write on the parquet fallback). This module
wires it under Structured Streaming's ``foreachBatch`` so a live stream of
re-delivered / edited transcript turns lands as UPDATES on (conv_id,
turn_idx) instead of duplicates — the reference pipeline's
re-uploaded-DataShare overwrite semantics (``BatchWriterFn.java:135-150``)
generalized to arbitrary keyed tables.

Exactly-once story: Structured Streaming replays a failed epoch with the
SAME rows, and upsert is idempotent under replay-of-identical-rows (a key
re-merged with the same content is a no-op), so the sink is exactly-once
without epoch bookkeeping. Ordering is by ``seq_col``, NOT arrival: the
merge only updates a matched row when the incoming seq is >= the stored
one, so a stale re-delivered correction landing in a LATER epoch cannot
revert newer data (file-source epochs are mtime-ordered, which real CDC
feeds don't guarantee). WITHIN one epoch several versions of a key may
arrive together — ``seq_col`` is therefore required here (unlike the batch
API): the greatest sequence wins deterministically; a non-CDC stream
without a real version column can pass its event-time column.

Scale: each epoch's merge touches only the partitions the epoch's keys live
in (``partition_col``), so a micro-batch updating 3 hot hours rewrites 3
directories of a 10^5-partition table — bounded work per trigger regardless
of table size. State is the TABLE, not the stream: no watermark or state
store is needed, so arbitrarily late corrections still apply — provided
they are newer (by ``seq_col``) than what the table already holds.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.types import StructType

from ..plans.tables import TableProvider

__all__ = ["start_cdc_upsert_stream"]


def start_cdc_upsert_stream(
    spark: SparkSession,
    input_path: str,
    provider: TableProvider,
    table: str,
    keys: list[str],
    seq_col: str,
    checkpoint: str,
    schema: StructType | None = None,
    partition_col: str | None = None,
    max_files_per_trigger: int = 16,
    available_now: bool = True,
):
    """readStream(parquet) → foreachBatch(merge_upsert). Returns the query.

    ``schema`` defaults to the current schema of ``input_path`` (file
    streams need an explicit schema; inferring from the existing files is
    the common bootstrap). The target table must already exist — create it
    with ``provider.replace`` so the first epoch has something to merge
    into, mirroring MERGE INTO's own requirement.
    """
    if seq_col in keys:
        raise ValueError(f"seq_col {seq_col!r} cannot be one of keys {keys}")
    if schema is None:
        schema = spark.read.parquet(input_path).schema
    missing = [c for c in [*keys, seq_col] if c not in schema.fieldNames()]
    if missing:
        raise ValueError(f"stream schema lacks {missing}")

    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(input_path)
    )

    def _apply(batch_df, epoch_id):
        # an empty trigger (possible under availableNow catch-up) must not
        # pay a merge's target scan
        if batch_df.isEmpty():
            return
        provider.merge_upsert(
            batch_df,
            table,
            keys=keys,
            partition_col=partition_col,
            seq_col=seq_col,
        )

    writer = (
        src.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
