"""Streaming CEP (streaming/cep_stream.py) vs its batch twin
(operators/cep.py::episode_pattern_match).

Multi-epoch by construction (ts-ordered single-file chunks with aligned
mtimes, maxFilesPerTrigger=1) so the watermark advances across triggers and
episodes actually close mid-stream — single-epoch runs would sort all rows
in one microbatch and hide split/bridge bugs (see the verify skill note).
"""

from __future__ import annotations

import os
import time
from datetime import datetime, timedelta, timezone

import pandas as pd
import pytest
from pyspark.sql import functions as F

from exposure_notifications_private_analytics_ingestion_spark.operators.cep import (
    episode_pattern_match,
)
from exposure_notifications_private_analytics_ingestion_spark.streaming import (
    start_pattern_stream,
)

SYMBOLS = {"view": "v", "click": "c", "purchase": "p", "signup": "s", "error": "e"}
PATTERN = "v[ce]*p"
GAP_S = 1800
T0 = datetime(2024, 1, 1, tzinfo=timezone.utc)


def _gen_events(n_users=60, n_events=1200, seed=3):
    """Deterministic event stream with inter-event gaps that straddle the
    session gap so every user gets several episodes."""
    import random

    rnd = random.Random(seed)
    types = list(SYMBOLS) + ["refund"]  # one unmapped type in the mix
    rows = []
    t = {u: T0 + timedelta(seconds=rnd.randrange(0, 600)) for u in range(n_users)}
    for i in range(n_events):
        u = rnd.randrange(n_users)
        # 1 in 6 jumps past the gap -> new episode
        step = rnd.choice([5, 30, 90, 200, 400, GAP_S + 120])
        t[u] = t[u] + timedelta(seconds=step)
        rows.append((str(u), t[u], i, rnd.choice(types)))
    return pd.DataFrame(rows, columns=["user_id", "ts", "event_id", "event_type"])


def _write_ts_ordered_chunks(spark, pdf, inp, n_chunks=6):
    pdf = pdf.sort_values("ts", kind="stable")
    chunk = (len(pdf) + n_chunks - 1) // n_chunks
    seen: set[str] = set()
    chunk_files = []
    for i in range(n_chunks):
        part = pdf.iloc[i * chunk : (i + 1) * chunk]
        spark.createDataFrame(
            part, "user_id string, ts timestamp, event_id long, event_type string"
        ).coalesce(1).write.mode("append").parquet(inp)
        files = {f for f in os.listdir(inp) if f.startswith("part-")}
        chunk_files.append(sorted(files - seen))
        seen = files
    now = time.time()
    i = 0
    for files in chunk_files:  # mtimes govern the file-source trigger order
        for f in files:
            os.utime(os.path.join(inp, f), (now + i, now + i))
            i += 1
    return pdf


@pytest.mark.slow
def test_stream_episodes_equal_batch_twin(spark, tmp_path):
    inp, out, ck = (str(tmp_path / d) for d in ("in", "out", "ck"))
    pdf = _write_ts_ordered_chunks(spark, _gen_events(), inp)

    q = start_pattern_stream(
        spark, inp, out, ck,
        key="user_id", ts_col="ts", tiebreak="event_id", type_col="event_type",
        symbols=SYMBOLS, pattern=PATTERN, gap_s=GAP_S,
        watermark="10 minutes", max_files_per_trigger=1,
    )
    q.awaitTermination(300)

    emitted = spark.read.parquet(out)
    assert emitted.count() > 0

    twin = episode_pattern_match(
        spark.createDataFrame(
            pdf, "user_id string, ts timestamp, event_id long, event_type string"
        ),
        key="user_id",
        ts_ms=F.expr("unix_micros(ts) div 1000"),
        tiebreak=F.col("event_id"),
        type_col="event_type",
        symbols=SYMBOLS,
        pattern=PATTERN,
        gap_s=GAP_S,
    ).withColumnRenamed("user_id", "key")

    # every emitted (closed) episode must equal the batch twin's row exactly
    on = ["key", "episode_start_ms"]
    joined = emitted.alias("s").join(twin.alias("b"), on=on, how="left")
    bad = joined.filter(
        F.col("b.episode_end_ms").isNull()
        | (F.col("s.episode_end_ms") != F.col("b.episode_end_ms"))
        | (F.col("s.n_matches") != F.col("b.n_matches"))
        | (F.col("s.first_match") != F.col("b.first_match"))
        | (F.col("s.seq_len") != F.col("b.seq_len"))
    )
    assert bad.count() == 0, bad.limit(5).toPandas().to_dict("records")

    # exactly-once: no duplicate episode keys
    assert emitted.select(*on).distinct().count() == emitted.count()

    # the stream must have closed a substantial share of the twin's episodes
    # (trailing episodes stay open under the final watermark — that's
    # correct, not a loss)
    assert emitted.count() >= twin.count() * 0.5


@pytest.mark.slow
def test_late_rows_beyond_watermark_cannot_reopen_closed_episodes(spark, tmp_path):
    """A row arriving with a ts older than the watermark is dropped by the
    watermark operator (standard streaming semantics): an episode already
    emitted stays emitted exactly once and is not extended or duplicated."""
    inp, out, ck = (str(tmp_path / d) for d in ("in", "out", "ck"))
    t = lambda s: T0 + timedelta(seconds=s)
    # epoch 1: a complete episode for u1 at t0..t0+60
    f1 = [("u1", t(0), 1, "view"), ("u1", t(60), 2, "purchase")]
    # epoch 2: far-future event pushes the watermark way past u1's episode
    f2 = [("u2", t(100_000), 3, "view")]
    # epoch 3: a LATE u1 click at t+30 — behind the watermark, must be dropped
    f3 = [("u1", t(30), 4, "click")]
    seen: set[str] = set()
    now = time.time()
    j = 0
    for rows in (f1, f2, f3):  # one file per epoch, mtimes in write order
        spark.createDataFrame(
            rows, "user_id string, ts timestamp, event_id long, event_type string"
        ).coalesce(1).write.mode("append").parquet(inp)
        for f in sorted(
            {f for f in os.listdir(inp) if f.startswith("part-")} - seen
        ):
            os.utime(os.path.join(inp, f), (now + j, now + j))
            seen.add(f)
            j += 1

    q = start_pattern_stream(
        spark, inp, out, ck,
        key="user_id", ts_col="ts", tiebreak="event_id", type_col="event_type",
        symbols=SYMBOLS, pattern="vc*p", gap_s=GAP_S,
        watermark="1 minute", max_files_per_trigger=1,
    )
    q.awaitTermination(300)
    rows = sorted(
        (r["key"], r["episode_start_ms"], r["n_matches"], r["seq_len"])
        for r in spark.read.parquet(out).collect()
    )
    # exactly ONE u1 episode: 2 events (vp), matched once; the late click
    # neither extended it (seq_len still 2) nor spawned a duplicate
    u1 = [r for r in rows if r[0] == "u1"]
    assert u1 == [("u1", int(T0.timestamp() * 1000), 1, 2)]


def test_non_integral_tiebreak_rejected_at_plan_time(spark):
    """State buffers the tiebreak as array<long>; a string column would cast
    to null/NaN only INSIDE the state function (past the null filter), so
    the plan must refuse it up front. Validation runs before any streaming
    construct, so a batch frame exercises it."""
    from exposure_notifications_private_analytics_ingestion_spark.streaming.cep_stream import (
        pattern_match_stream,
    )

    df = spark.createDataFrame(
        [("u1", T0, "e-0012", "view")],
        "user_id string, ts timestamp, msg_id string, event_type string",
    )
    with pytest.raises(ValueError, match="integral"):
        pattern_match_stream(
            df, key="user_id", ts_col="ts", tiebreak="msg_id",
            type_col="event_type", symbols=SYMBOLS, pattern="vp",
        )
    with pytest.raises(ValueError, match="not in"):
        pattern_match_stream(
            df, key="user_id", ts_col="ts", tiebreak="nope",
            type_col="event_type", symbols=SYMBOLS, pattern="vp",
        )


@pytest.mark.slow
def test_resume_emits_no_duplicates(spark, tmp_path):
    inp, out, ck = (str(tmp_path / d) for d in ("in", "out", "ck"))
    pdf = _gen_events(n_users=20, n_events=300, seed=9)
    first = pdf.sort_values("ts", kind="stable").iloc[:150]
    rest = pdf.sort_values("ts", kind="stable").iloc[150:]

    _write_ts_ordered_chunks(spark, first, inp, n_chunks=2)
    q = start_pattern_stream(
        spark, inp, out, ck,
        key="user_id", ts_col="ts", tiebreak="event_id", type_col="event_type",
        symbols=SYMBOLS, pattern=PATTERN, gap_s=GAP_S,
        watermark="10 minutes", max_files_per_trigger=1,
    )
    q.awaitTermination(300)
    n1 = spark.read.parquet(out).count()

    _write_ts_ordered_chunks(spark, rest, inp, n_chunks=2)
    q = start_pattern_stream(
        spark, inp, out, ck,
        key="user_id", ts_col="ts", tiebreak="event_id", type_col="event_type",
        symbols=SYMBOLS, pattern=PATTERN, gap_s=GAP_S,
        watermark="10 minutes", max_files_per_trigger=1,
    )
    q.awaitTermination(300)

    emitted = spark.read.parquet(out)
    assert emitted.count() >= n1
    on = ["key", "episode_start_ms"]
    assert emitted.select(*on).distinct().count() == emitted.count()
