"""Heavy hitters (operators/heavy_hitters.py + streaming/hh_stream.py).

The extended-registry oracle certifies heavy_hitters_hourly exactly (events
stay far under the sketch's tracking capacity); these tests pin what the
oracle can't see: the over-capacity space-saving bound, deterministic
boundary ties, and stream ≡ batch twin under multi-epoch input.
"""

from __future__ import annotations

import os
import time
from datetime import datetime, timedelta, timezone

import pandas as pd
import pytest
from pyspark.sql import functions as F

from exposure_notifications_private_analytics_ingestion_spark.operators.heavy_hitters import (
    heavy_hitters,
    windowed_heavy_hitters,
)
from exposure_notifications_private_analytics_ingestion_spark.streaming import (
    start_heavy_hitters_stream,
)

T0 = datetime(2024, 1, 1, tzinfo=timezone.utc)


def test_exact_within_capacity_and_tie_break(spark):
    rows = [("g", "b")] * 5 + [("g", "a")] * 5 + [("g", "c")] * 2
    df = spark.createDataFrame(rows, "grp string, item string")
    out = heavy_hitters(df, ["grp"], "item", k=2, track=64).orderBy("rank").collect()
    # a and b tie at 5: item asc wins -> a rank 1, b rank 2
    assert [(r["item"], r["cnt"], r["rank"]) for r in out] == [("a", 5, 1), ("b", 5, 2)]


def test_over_capacity_keeps_true_heavy_hitter(spark):
    # 1 dominant item + 500 singletons through a 16-slot sketch: space-saving
    # must keep the dominant item at rank 1 with count error <= n/track
    rows = [("g", "HOT")] * 300 + [("g", f"u{i}") for i in range(500)]
    df = spark.createDataFrame(rows, "grp string, item string").repartition(8)
    out = heavy_hitters(df, ["grp"], "item", k=1, track=16).collect()
    assert out[0]["item"] == "HOT"
    n = len(rows)
    assert abs(out[0]["cnt"] - 300) <= n / 16


def test_windowed_matches_exact_counts(spark):
    rows = []
    for h in range(3):
        for i, it in enumerate(["x"] * 4 + ["y"] * 2 + ["z"]):
            rows.append((T0 + timedelta(hours=h, seconds=i), it))
    df = spark.createDataFrame(rows, "ts timestamp, item string")
    out = windowed_heavy_hitters(df, "ts", "item", window_s=3600, k=2)
    got = {(r["window_start_ms"], r["rank"]): (r["item"], r["cnt"]) for r in out.collect()}
    for h in range(3):
        wms = int((T0 + timedelta(hours=h)).timestamp() * 1000)
        assert got[(wms, 1)] == ("x", 4)
        assert got[(wms, 2)] == ("y", 2)


@pytest.mark.slow
def test_stream_equals_batch_twin(spark, tmp_path):
    inp, out, ck = (str(tmp_path / d) for d in ("in", "out", "ck"))
    import random

    rnd = random.Random(7)
    rows = []
    for i in range(4000):
        ts = T0 + timedelta(seconds=i * 10)
        rows.append((ts, rnd.choice(["a", "b", "c", "d", "e"])))
    pdf = pd.DataFrame(rows, columns=["ts", "item"]).sort_values("ts", kind="stable")
    n_chunks, chunk = 5, 800
    seen: set[str] = set()
    chunk_files = []
    for i in range(n_chunks):
        part = pdf.iloc[i * chunk : (i + 1) * chunk]
        spark.createDataFrame(part, "ts timestamp, item string").coalesce(1).write.mode(
            "append"
        ).parquet(inp)
        files = {f for f in os.listdir(inp) if f.startswith("part-")}
        chunk_files.append(sorted(files - seen))
        seen = files
    now = time.time()
    j = 0
    for files in chunk_files:
        for f in files:
            os.utime(os.path.join(inp, f), (now + j, now + j))
            j += 1

    mode_before = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    q = start_heavy_hitters_stream(
        spark, inp, out, ck, ts_col="ts", item_col="item",
        window_s=3600, k=3, watermark="10 minutes", max_files_per_trigger=1,
    )
    q.awaitTermination(300)
    # the epoch sink's dynamic overwrite must be SCOPED: leaking it would
    # turn later full-table overwrites on this shared session into partial ones
    assert (
        spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        == mode_before
    )

    emitted = spark.read.parquet(out)
    assert emitted.count() > 0
    twin = windowed_heavy_hitters(
        spark.createDataFrame(pdf, "ts timestamp, item string"),
        "ts", "item", window_s=3600, k=3,
    )
    joined = emitted.alias("s").join(
        twin.alias("b"), on=["window_start_ms", "rank"], how="left"
    )
    bad = joined.filter(
        F.col("b.cnt").isNull()
        | (F.col("s.item") != F.col("b.item"))
        | (F.col("s.cnt") != F.col("b.cnt"))
    )
    assert bad.count() == 0, bad.limit(5).toPandas().to_dict("records")
    # exactly once per (window, rank)
    assert (
        emitted.select("window_start_ms", "rank").distinct().count()
        == emitted.count()
    )
