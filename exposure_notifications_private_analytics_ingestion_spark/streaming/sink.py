"""Exactly-once dual-destination sink for the streaming CEP core.

The reference achieves retry-idempotence with deterministic file UUIDs so a
rerun overwrites the same destination (``BatchWriterFn.java:135-150``). Spark
foreachBatch gives a stronger primitive: the epoch id is stable across
micro-batch retries, so writing each epoch's output under an epoch-keyed
partition with overwrite makes the whole sink exactly-once — a retried epoch
replaces exactly its own files.

On Iceberg this is one ``MERGE INTO``/``overwriteByFilter`` transaction; on
the parquet stand-in it's dynamic partition overwrite on ``epoch=<id>``.

Each epoch writes:
- ``packets/`` — ×2 fan-out rows (pha + facilitator)
- ``batch_headers/`` — per-(batch, destination) manifest with sha256 digest
- ``lineage/`` — per-epoch provenance: epoch id, batch ids, row counts,
  ts bounds (the north_rule's per-partition lineage record)

Plan shape (the scaling-critical part): ONE shuffle per epoch — the closed
TURN rows are repartitioned by batch_id with an EXPLICIT partition count
(AQE would otherwise coalesce the repartition-by-column to a handful of
partitions and cap the downstream parquet/digest parallelism — measured as a
flat ~25 s sink at every core count) and cached PRE-explode. The ×2
destination fan-out is a narrow Generate on top of that cache, so the
parquet write inherits the batch_id partitioning; the header digest
aggregates the cached turn rows exchange-free and is computed ONCE per batch
— both destinations of a transcript-mode packet carry the same
(uuid, payload) bytes by construction (``_split_packets_streamed``), so the
per-destination digests are identical and the destination column is fanned
out AFTER the aggregation. Relative to digesting the exploded packets this
halves the cache bytes, the digest input, and the aggregate group count.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DESTINATIONS = ("pha", "facilitator")


def _closed_turns(batch_df: DataFrame) -> DataFrame:
    """One row per closed turn, with the packet uuid and payload bytes —
    the pre-explode form both the packet write and the header digest share."""
    return batch_df.select(
        "batch_id",
        F.concat_ws("#", "conv_id", F.col("turn_idx").cast("string")).alias("uuid"),
        F.encode("text", "UTF-8").alias("encrypted_payload"),
        "conv_id",
        "turn_idx",
        "ts_ms",
        "window_start_s",
        "batch_ordinal",
        "close_reason",
    )


def _split_packets_streamed(closed: DataFrame) -> DataFrame:
    """X1 fan-out over closed turn rows: narrow Generate, preserves the
    batch_id partitioning of its input."""
    exploded = closed.select(
        "*", F.posexplode(F.array(F.lit(0), F.lit(1))).alias("_pos", "_i")
    )
    dest = F.when(F.col("_pos") == 0, F.lit(DESTINATIONS[0])).otherwise(
        F.lit(DESTINATIONS[1])
    )
    cols = [c for c in closed.columns if c not in ("_pos", "_i")]
    front = ["batch_id", "uuid", "encrypted_payload"]
    rest = [c for c in cols if c not in front]
    return exploded.select(
        "batch_id",
        dest.alias("destination"),
        "uuid",
        "encrypted_payload",
        *rest,
    )


def _headers(closed: DataFrame) -> DataFrame:
    """Per-(batch, destination) manifest. Digest = sha256 over
    ``uuid:hex(payload)`` sorted — computed once per batch over the TURN
    rows (both destinations carry identical bytes in transcript mode), then
    fanned out per destination. Exchange-free on batch_id partitioning."""
    per_batch = (
        closed.select(
            "batch_id",
            "conv_id",
            "window_start_s",
            "uuid",
            F.hex("encrypted_payload").alias("ph"),
            "ts_ms",
        )
        .groupBy("batch_id")
        .agg(
            F.first("conv_id").alias("name"),
            F.first("window_start_s").alias("batch_start_time"),
            F.count("*").alias("n_packets"),
            F.min("ts_ms").alias("min_ts_ms"),
            F.max("ts_ms").alias("max_ts_ms"),
            F.sha2(
                F.concat_ws(
                    "",
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("uuid", "ph"))),
                        lambda s: F.concat(s["uuid"], F.lit(":"), s["ph"]),
                    ),
                ),
                256,
            ).alias("packet_file_digest"),
        )
    )
    dest = F.explode(
        F.array(*[F.lit(d) for d in DESTINATIONS])
    ).alias("destination")
    return per_batch.select(
        "batch_id",
        dest,
        "name",
        "batch_start_time",
        "n_packets",
        "min_ts_ms",
        "max_ts_ms",
        "packet_file_digest",
    )


def make_epoch_sink(output_root: str):
    """foreachBatch callable: idempotent epoch-partitioned write + lineage."""

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        # NOTE: no isEmpty() pre-check — in foreachBatch EVERY action on
        # batch_df re-executes the stateful microbatch plan, so an emptiness
        # probe would run the whole assembler once just to answer a boolean
        # (measured: ~2× epoch cost). Persist first, count the cache instead.
        # The EXPLICIT partition count pins the shuffle width (AQE coalesces
        # a repartition-by-column, capping downstream parallelism).
        n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
        closed = (
            _closed_turns(batch_df)
            .repartition(n_part, "batch_id")
            .persist()
        )
        if closed.count() == 0:
            closed.unpersist()
            return
        # exactly-once via DIRECT epoch-directory overwrite: the write targets
        # .../packets/epoch=<id> itself, so a retried epoch replaces exactly
        # its own subtree with the plain (non-dynamic) committer — no
        # staging-and-move pass over the whole table, no driver-side serial
        # file shuffling across epochs. Readers see the identical hive layout
        # (epoch=<id>/destination=<d>) via partition discovery.
        (
            _split_packets_streamed(closed)
            .write.mode("overwrite")
            .partitionBy("destination")
            .parquet(f"{output_root}/packets/epoch={epoch_id}")
        )
        headers = _headers(closed)
        headers.write.mode("overwrite").parquet(
            f"{output_root}/batch_headers/epoch={epoch_id}"
        )
        # lineage: one JSON record per epoch (atomic rename for idempotence);
        # turn-level rows, so each turn counts once
        stats = closed.agg(
            F.count("*").alias("n_rows"),
            F.approx_count_distinct("batch_id").alias("n_batches"),
            F.min("ts_ms").alias("min_ts_ms"),
            F.max("ts_ms").alias("max_ts_ms"),
            F.approx_count_distinct("conv_id").alias("n_convs"),
        ).collect()[0]
        os.makedirs(f"{output_root}/lineage", exist_ok=True)
        rec = {
            "epoch": epoch_id,
            "n_rows": stats["n_rows"],
            "n_batches": stats["n_batches"],
            "n_convs": stats["n_convs"],
            "min_ts_ms": stats["min_ts_ms"],
            "max_ts_ms": stats["max_ts_ms"],
            "wall_time": time.time(),
        }
        tmp = f"{output_root}/lineage/.epoch-{epoch_id}.tmp"
        with open(tmp, "w") as f:
            json.dump(rec, f)
        os.replace(tmp, f"{output_root}/lineage/epoch-{epoch_id}.json")
        closed.unpersist()

    return sink
