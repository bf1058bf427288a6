"""Exactly-once sink semantics: a retried epoch (same epoch id) must replace
its own output, never duplicate it — the property the reference approximates
with deterministic file UUIDs (BatchWriterFn.java:135-150) and foreachBatch
delivers exactly."""

from __future__ import annotations

from datetime import datetime, timezone

import pandas as pd

from exposure_notifications_private_analytics_ingestion_spark.streaming.sink import (
    make_epoch_sink,
)

JAN = 1704067200

BATCH_COLS = [
    "conv_id", "turn_idx", "text", "ts_ms", "window_start_s",
    "batch_ordinal", "batch_id", "close_reason",
]


def _batch_rows(spark, n=20):
    rows = [
        ("c1", i, f"t{i}", (JAN + i) * 1000, JAN, 0, "batch-aaaa", "size")
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, text string, ts_ms long, "
        "window_start_s long, batch_ordinal int, batch_id string, "
        "close_reason string",
    )


def test_epoch_retry_overwrites_not_duplicates(spark, tmp_path):
    out = str(tmp_path / "out")
    sink = make_epoch_sink(out)
    df = _batch_rows(spark)

    sink(df, epoch_id=7)
    first = spark.read.parquet(f"{out}/packets").count()
    # retry of the SAME epoch (Spark replays foreachBatch with the same id)
    sink(df, epoch_id=7)
    again = spark.read.parquet(f"{out}/packets").count()
    assert first == again == 40  # 20 turns × 2 destinations, no duplication

    # a NEW epoch appends alongside, untouched by the retry
    sink(_batch_rows(spark, n=5), epoch_id=8)
    total = spark.read.parquet(f"{out}/packets").count()
    assert total == 40 + 10
    epochs = {
        r["epoch"]
        for r in spark.read.parquet(f"{out}/packets").select("epoch").distinct().collect()
    }
    assert epochs == {7, 8}


def test_empty_epoch_writes_nothing(spark, tmp_path):
    out = str(tmp_path / "out")
    sink = make_epoch_sink(out)
    empty = _batch_rows(spark).limit(0)
    sink(empty, epoch_id=1)
    import os

    assert not os.path.exists(f"{out}/packets")
