"""Streaming windowed HLL sketch profiles (streaming/sketch_stream.py):
append-mode emission on watermark close, batch-twin equality per emitted
window, mergeable rollup of emitted sketches, and estimate accuracy vs the
exact distinct count."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from exposure_notifications_private_analytics_ingestion_spark.model.schema import TURNS_SCHEMA
from exposure_notifications_private_analytics_ingestion_spark.operators.sketches import (
    merge_profiles,
)
from exposure_notifications_private_analytics_ingestion_spark.sources import generate_turns
from exposure_notifications_private_analytics_ingestion_spark.streaming import (
    start_profile_stream,
    windowed_profile,
)


@pytest.mark.slow
def test_windowed_profile_stream_matches_batch_twin(spark, tmp_path):
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ck")

    # turns across ~4 hourly windows, written as ts-ordered files with
    # increasing mtimes so the file source's trigger order advances the
    # watermark monotonically (as a live stream would)
    pdf = generate_turns(n_convs=400, seed=11, hours=4, dup_frac=0.0).sort_values(
        "ts", kind="stable"
    )
    n_chunks = 6
    chunk = (len(pdf) + n_chunks - 1) // n_chunks
    seen: set[str] = set()
    chunk_files: list[list[str]] = []
    for i in range(n_chunks):
        part = pdf.iloc[i * chunk : (i + 1) * chunk]
        spark.createDataFrame(part, schema=TURNS_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(inp)
        files = {
            f
            for f in os.listdir(inp)
            if f.startswith("part-") and f.endswith(".parquet")
        }
        chunk_files.append(sorted(files - seen))
        seen = files
    # parquet part-file mtimes govern the file source's trigger order (names
    # carry random UUIDs, so name order is meaningless); align mtimes with
    # the ts-ordered chunk sequence so the watermark advances monotonically
    now = time.time()
    i = 0
    for files in chunk_files:
        for f in files:
            os.utime(os.path.join(inp, f), (now + i, now + i))
            i += 1

    q = start_profile_stream(
        spark,
        inp,
        out,
        ckpt,
        window_s=3600,
        watermark="10 minutes",
        max_files_per_trigger=1,
    )
    q.awaitTermination(240)

    emitted = spark.read.parquet(out)
    # append mode + multi-trigger availableNow: every window whose end the
    # final watermark passed must be emitted; at least the first hours close
    assert emitted.count() > 0

    turns = spark.createDataFrame(pdf, schema=TURNS_SCHEMA)
    twin = windowed_profile(turns, window_s=3600)

    # each emitted (window, role) row equals the batch twin: same n_rows and
    # the SAME estimate (HLL union at one lgK is lossless, so the
    # partial-merge path through streaming state and the batch hash-agg land
    # on identical register contents)
    joined = emitted.alias("s").join(
        twin.alias("b"),
        on=["window_start", "window_end", "role"],
        how="left",
    )
    bad = joined.filter(
        F.col("b.n_rows").isNull()
        | (F.col("s.n_rows") != F.col("b.n_rows"))
        | (F.col("s.distinct_convs") != F.col("b.distinct_convs"))
    )
    assert bad.count() == 0, bad.limit(5).toPandas().to_dict("records")

    # emitted rows are exactly once: no duplicate (window, role) keys
    n_keys = emitted.select("window_start", "role").distinct().count()
    assert n_keys == emitted.count()

    # mergeability: roll emitted per-role sketches up to per-window and
    # compare against the batch twin built directly at that grain
    rolled = merge_profiles(
        emitted.select(
            "window_start", "hll", F.col("n_rows").cast("long").alias("n_rows")
        ),
        ["window_start"],
    )
    direct = (
        turns.groupBy(F.window("ts", "3600 seconds").alias("w"))
        .agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("conv_id", 12))
            .cast("long")
            .alias("distinct_est"),
            F.count("*").alias("n_rows"),
        )
        .select(F.col("w.start").alias("window_start"), "distinct_est", "n_rows")
    )
    cmp = rolled.alias("r").join(direct.alias("d"), "window_start")
    mismatch = cmp.filter(
        (F.col("r.distinct_est") != F.col("d.distinct_est"))
        | (F.col("r.n_rows") != F.col("d.n_rows"))
    )
    assert mismatch.count() == 0

    # accuracy: estimate within 5% of the exact distinct count per emitted key
    exact = turns.groupBy(
        F.window("ts", "3600 seconds").alias("w"), "role"
    ).agg(F.countDistinct("conv_id").alias("exact_distinct"))
    acc = emitted.join(
        exact.select(
            F.col("w.start").alias("window_start"), "role", "exact_distinct"
        ),
        ["window_start", "role"],
    )
    off = acc.filter(
        F.abs(F.col("distinct_convs") - F.col("exact_distinct"))
        > F.greatest(F.lit(2), F.col("exact_distinct") * 0.05)
    )
    assert off.count() == 0


def test_metrics_listener_surfaces_watermark_drops():
    """late_rows_dropped totals numRowsDroppedByWatermark across batches —
    the signal that a watermark tighter than real lateness is LOSING data."""
    from exposure_notifications_private_analytics_ingestion_spark.streaming.metrics import (
        MetricsListener,
    )

    ml = MetricsListener()
    ml.progress = [
        {"num_input_rows": 10, "batch_duration_ms": 5, "late_rows_dropped": 3},
        {"num_input_rows": 5, "batch_duration_ms": 5, "late_rows_dropped": 0},
        {"num_input_rows": 0, "batch_duration_ms": 1},  # pre-upgrade record
    ]
    assert ml.late_rows_dropped() == 3
