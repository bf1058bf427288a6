"""Streaming windowed sketch profiles: per-(window, role) HLL distinct-conv
counts maintained inside Structured Streaming's windowed-aggregate state.

Why this exists at 10^12 turns: the ops question "how many distinct
conversations did each hourly window see, per role?" is an exact
COUNT(DISTINCT conv_id) — which in streaming means keeping every conv_id in
state until the window closes (state ∝ distinct keys, unbounded for hot
windows). The HLL sketch version keeps a FIXED 2^lgK-register array per
(window, role) group regardless of cardinality, merges partials
associatively across triggers (Spark's ``hll_sketch_agg`` is a
TypedImperativeAggregate, so partial-merge is exactly the streaming state
update), and emits each finalized window once the watermark passes — fully
JVM-side, no Python in the stream.

The emitted rows carry the sketch BYTES as well as the estimate, so
downstream rollups (``operators.sketches.merge_profiles``) can union
finalized windows into daily/weekly profiles without re-reading the stream —
the same mergeability law the batch side pins byte-exactly.

Reference parity: the reference's metrics are exact counters per batch
(``pipeline/DataProcessorMetrics.java``); a streaming cardinality profile is
driver-brief scale breadth on the same windowed-state machinery as the CEP
assembler (``ingest_stream.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..model.schema import TURNS_SCHEMA
from ..operators.sketches import DEFAULT_LGK


def windowed_profile(
    turns: DataFrame, window_s: int = 3600, lgk: int = DEFAULT_LGK
) -> DataFrame:
    """The profile aggregation, mode-agnostic: works on a static DataFrame
    (batch twin / backfill) and on a streaming one (state-backed). One
    hash-aggregate; on a stream the watermark must already be assigned by
    the caller (``windowed_profile_stream`` does)."""
    return (
        turns.groupBy(
            F.window(F.col("ts"), f"{window_s} seconds").alias("w"),
            F.col("role"),
        )
        .agg(
            F.hll_sketch_agg(F.col("conv_id"), lgk).alias("hll"),
            F.count("*").alias("n_rows"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "role",
            "hll",
            "n_rows",
            F.hll_sketch_estimate(F.col("hll")).cast("long").alias("distinct_convs"),
        )
    )


def windowed_profile_stream(
    spark: SparkSession,
    input_path: str,
    window_s: int = 3600,
    watermark: str = "30 minutes",
    lgk: int = DEFAULT_LGK,
    max_files_per_trigger: int = 8,
) -> DataFrame:
    """readStream → watermark → windowed HLL aggregate. Append output mode:
    each (window, role) profile row is emitted exactly once, when the
    watermark passes window end — late rows inside the horizon still merge
    into the register array before emission."""
    raw = (
        spark.readStream.schema(TURNS_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(input_path)
    )
    turns = raw.filter(F.col("ts").isNotNull()).withWatermark("ts", watermark)
    return windowed_profile(turns, window_s=window_s, lgk=lgk)


def start_profile_stream(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint: str,
    window_s: int = 3600,
    watermark: str = "30 minutes",
    lgk: int = DEFAULT_LGK,
    available_now: bool = True,
    max_files_per_trigger: int = 8,
):
    """Run the profile stream into a parquet sink (append: one row per
    finalized window — safe to tail from a dashboard or roll up later)."""
    profiles = windowed_profile_stream(
        spark,
        input_path,
        window_s=window_s,
        watermark=watermark,
        lgk=lgk,
        max_files_per_trigger=max_files_per_trigger,
    )
    writer = (
        profiles.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
