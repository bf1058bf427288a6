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
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _split_packets_streamed(batch_df: DataFrame) -> DataFrame:
    """X1 fan-out over closed-batch rows (columns per BATCH_OUT_SCHEMA)."""
    exploded = batch_df.select(
        "*", F.posexplode(F.array(F.lit(0), F.lit(1))).alias("_pos", "_i")
    )
    dest = F.when(F.col("_pos") == 0, F.lit("pha")).otherwise(F.lit("facilitator"))
    return exploded.select(
        "batch_id",
        dest.alias("destination"),
        F.concat_ws("#", "conv_id", F.col("turn_idx").cast("string")).alias("uuid"),
        F.encode("text", "UTF-8").alias("encrypted_payload"),
        "conv_id",
        "turn_idx",
        "ts_ms",
        "window_start_s",
        "batch_ordinal",
        "close_reason",
    )


def _headers(packets: DataFrame) -> DataFrame:
    return (
        packets.select(
            "batch_id",
            "destination",
            "conv_id",
            "window_start_s",
            "uuid",
            F.hex("encrypted_payload").alias("ph"),
            "ts_ms",
        )
        .groupBy("batch_id", "destination")
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


def make_epoch_sink(output_root: str):
    """foreachBatch callable: idempotent epoch-partitioned write + lineage."""

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        # one explode, one shuffle: packets land partitioned by batch_id and
        # STAY that way — the header aggregation groups on
        # (batch_id, destination), whose clustering is satisfied by the
        # batch_id hash partitioning (subset rule), so it runs exchange-free
        # over the cached partitions.
        # NOTE: no isEmpty() pre-check — in foreachBatch EVERY action on
        # batch_df re-executes the stateful microbatch plan, so an emptiness
        # probe would run the whole assembler once just to answer a boolean
        # (measured: ~2× epoch cost). Persist first, count the cache instead.
        packets = (
            _split_packets_streamed(batch_df)
            .withColumn("epoch", F.lit(epoch_id))
            .repartition("batch_id")
            .persist()
        )
        if packets.count() == 0:
            packets.unpersist()
            return
        (
            packets.write.mode("overwrite")
            .partitionBy("epoch", "destination")
            .parquet(f"{output_root}/packets")
        )
        headers = _headers(packets).withColumn("epoch", F.lit(epoch_id))
        headers.write.mode("overwrite").partitionBy("epoch").parquet(
            f"{output_root}/batch_headers"
        )
        # lineage: one JSON record per epoch (atomic rename for idempotence);
        # derived from the pha fork so each turn counts once
        stats = packets.filter(F.col("destination") == "pha").agg(
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
        packets.unpersist()

    return sink
