"""Stateful stream-stream join: watermarked, time-range-bounded, and
equal to the batch join on the same input (exactly-once), including under
multi-epoch availableNow runs where rows arrive out of order across
microbatches."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest

from exposure_notifications_private_analytics_ingestion_spark.streaming.joins import (
    time_bounded_stream_join,
)

JAN = 1704067200
TURNS = "conv_id string, turn_idx int, text string, ts timestamp"
FACTS = "conv_id string, fact_id int, fact_ts timestamp"


def _t(sec: int):
    return datetime.fromtimestamp(JAN + sec, tz=timezone.utc).replace(tzinfo=None)


def _mk_input(spark, tmp_path):
    """Three single-file epochs per side; facts for epoch 2 land in a LATER
    file than the turns they must join to (cross-epoch state buffering)."""
    turn_files = [
        [("c1", 0, "a", _t(100)), ("c1", 1, "b", _t(700)), ("c2", 0, "x", _t(400))],
        [("c1", 2, "c", _t(1400)), ("c3", 0, "y", _t(1500))],
        [("c2", 1, "z", _t(4000))],
    ]
    fact_files = [
        [("c1", 10, _t(50))],
        [("c2", 20, _t(350)), ("c1", 11, _t(1300))],
        # late-arriving fact for c3 (turn came in file 2); plus a watermark
        # advancer fact far ahead so pending state can evict
        [("c3", 30, _t(1450)), ("c9", 99, _t(20000))],
    ]
    tdir, fdir = str(tmp_path / "turns"), str(tmp_path / "facts")
    for rows in turn_files:
        spark.createDataFrame(rows, TURNS).coalesce(1).write.mode("append").parquet(tdir)
    for rows in fact_files:
        spark.createDataFrame(rows, FACTS).coalesce(1).write.mode("append").parquet(fdir)
    return tdir, fdir


def _key_set(df):
    return {
        (r["conv_id"], r["turn_idx"], r["fact_id"]) for r in df.collect()
    }


@pytest.mark.slow
def test_stream_join_matches_batch(spark, tmp_path):
    tdir, fdir = _mk_input(spark, tmp_path)
    bound = 600

    batch = time_bounded_stream_join(
        spark.read.parquet(tdir), spark.read.parquet(fdir), bound_s=bound
    )
    expected = _key_set(batch)
    # sanity on the fixture: joins exist, and at least one crosses files
    assert ("c1", 0, 10) in expected and ("c3", 0, 30) in expected
    assert ("c1", 1, 10) not in expected  # outside the 600 s bound

    out = str(tmp_path / "out")
    q = (
        time_bounded_stream_join(
            spark.readStream.schema(TURNS).option("maxFilesPerTrigger", "1").parquet(tdir),
            spark.readStream.schema(FACTS).option("maxFilesPerTrigger", "1").parquet(fdir),
            bound_s=bound,
        )
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    got = _key_set(spark.read.parquet(out))
    assert got == expected

    # exactly-once on restart: rerunning over the same input adds nothing
    q2 = (
        time_bounded_stream_join(
            spark.readStream.schema(TURNS).option("maxFilesPerTrigger", "1").parquet(tdir),
            spark.readStream.schema(FACTS).option("maxFilesPerTrigger", "1").parquet(fdir),
            bound_s=bound,
        )
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(240)
    assert _key_set(spark.read.parquet(out)) == expected


@pytest.mark.slow
def test_stream_join_left_outer_emits_unmatched(spark, tmp_path):
    tdir, fdir = _mk_input(spark, tmp_path)
    out = str(tmp_path / "out_lo")
    q = (
        time_bounded_stream_join(
            spark.readStream.schema(TURNS).option("maxFilesPerTrigger", "1").parquet(tdir),
            spark.readStream.schema(FACTS).option("maxFilesPerTrigger", "1").parquet(fdir),
            bound_s=600,
            turns_watermark="10 minutes",
            facts_watermark="10 minutes",
            how="left_outer",
        )
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck_lo"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    res = spark.read.parquet(out)
    rows = {(r["conv_id"], r["turn_idx"]): r["fact_id"] for r in res.collect()}
    # c1 turn 1 has no fact within bound → must still appear, fact NULL
    assert rows[("c1", 1)] is None
    assert rows[("c1", 0)] == 10
