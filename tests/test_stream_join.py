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
        [("c1", 0, "a", _t(100)), ("c1", 1, "b", _t(700)), ("c2", 0, "x", _t(400)),
         ("c1", 3, "d", _t(150))],  # second match in c1's first window
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


@pytest.mark.slow
def test_ingestion_with_facts_stream_filters_unattested(spark, tmp_path):
    """facts_path wires the stream-stream join into the CEP loop: only turns
    whose conversation has a fact within the bound survive to packets, and
    join fan-out (several facts matching one turn) never duplicates turns."""
    from exposure_notifications_private_analytics_ingestion_spark.streaming import (
        StreamOptions,
        start_stream_ingestion,
    )

    TURNS_FULL = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    tdir, fdir = str(tmp_path / "turns"), str(tmp_path / "facts")
    # attested conv c1 (two facts inside the bound → fan-out), unattested c2;
    # multi-epoch: turn files and fact files land separately
    turn_files = [
        [("c1", 0, "user", "t0", "", _t(100)), ("c2", 0, "user", "x0", "", _t(110))],
        [("c1", 1, "user", "t1", "", _t(200)), ("c2", 1, "user", "x1", "", _t(210))],
        # watermark advancer on the TURNS side (the join's output watermark is
        # the min across inputs); no fact within bound → filtered out itself
        [("c9", 0, "user", "adv", "", _t(60_000))],
    ]
    fact_files = [
        [("c1", 1, _t(50)), ("c1", 2, _t(60))],
        [("c8", 9, _t(60_000))],  # watermark advancer, facts side
    ]
    for rows in turn_files:
        spark.createDataFrame(rows, TURNS_FULL).coalesce(1).write.mode("append").parquet(tdir)
    for rows in fact_files:
        spark.createDataFrame(rows, FACTS).coalesce(1).write.mode("append").parquet(fdir)

    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    q = start_stream_ingestion(
        spark, tdir, out, ck,
        StreamOptions(batch_size=10, max_files_per_trigger=1,
                      facts_path=fdir, facts_bound_s=600),
    )
    q.awaitTermination(240)

    pk = spark.read.parquet(f"{out}/packets")
    convs = {r["conv_id"] for r in pk.select("conv_id").distinct().collect()}
    assert convs == {"c1"}
    dups = (
        pk.groupBy("conv_id", "turn_idx", "destination").count().filter("count>1")
    )
    assert dups.count() == 0
    assert pk.filter("destination='pha'").count() == 2  # both c1 turns, once


@pytest.mark.slow
def test_chained_join_then_window_agg_stream_matches_batch(spark, tmp_path):
    """Stream-stream join feeding a tumbling window count (chained stateful
    operators) must equal the batch run of the same function."""
    from exposure_notifications_private_analytics_ingestion_spark.streaming.joins import (
        attested_turn_counts_stream,
    )

    tdir, fdir = _mk_input(spark, tmp_path)
    # 10-min watermarks: the fixture spans ~4000 s, so the 1-h default would
    # leave every window open and the append-mode agg would emit nothing
    kw = dict(bound_s=600, window_s=600,
              turns_watermark="10 minutes", facts_watermark="10 minutes")

    batch = attested_turn_counts_stream(
        spark.read.parquet(tdir), spark.read.parquet(fdir), **kw
    )
    expected = {
        (r["window_start_ms"], r["conv_id"]): r["n_matches"] for r in batch.collect()
    }
    assert expected and any(v > 1 for v in expected.values())

    out = str(tmp_path / "out_agg")
    q = (
        attested_turn_counts_stream(
            spark.readStream.schema(TURNS).option("maxFilesPerTrigger", "1").parquet(tdir),
            spark.readStream.schema(FACTS).option("maxFilesPerTrigger", "1").parquet(fdir),
            **kw,
        )
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck_agg"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    got = {
        (r["window_start_ms"], r["conv_id"]): r["n_matches"]
        for r in spark.read.parquet(out).collect()
    }
    # the advancer rows' own windows may still be open at stream end (the
    # watermark never passes them); every CLOSED window must match batch
    assert got
    for k, v in got.items():
        assert expected[k] == v
    closed_horizon = max(ms for ms, _ in expected) # advancer windows
    core = {k: v for k, v in expected.items() if k[0] < closed_horizon - 600_000}
    assert set(core) <= set(got)


@pytest.mark.slow
def test_facts_gated_stream_resumes_from_checkpoint(spark, tmp_path):
    """Stopping and resuming the facts-gated pipeline must pick up new turn
    AND fact files exactly once — join state and assembler state both live
    in the one checkpoint."""
    from exposure_notifications_private_analytics_ingestion_spark.streaming import (
        StreamOptions,
        start_stream_ingestion,
    )

    TURNS_FULL = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    tdir, fdir = str(tmp_path / "turns"), str(tmp_path / "facts")
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    opts = StreamOptions(batch_size=10, max_files_per_trigger=1,
                         facts_path=fdir, facts_bound_s=600)

    spark.createDataFrame(
        [("c1", 0, "user", "t0", "", _t(100)),
         ("adv1", 0, "user", "a", "", _t(50_000))], TURNS_FULL
    ).coalesce(1).write.mode("append").parquet(tdir)
    spark.createDataFrame(
        [("c1", 1, _t(50)), ("advf", 1, _t(50_000))], FACTS
    ).coalesce(1).write.mode("append").parquet(fdir)
    q = start_stream_ingestion(spark, tdir, out, ck, opts)
    q.awaitTermination(240)
    pk1 = spark.read.parquet(f"{out}/packets")
    assert {r["conv_id"] for r in pk1.select("conv_id").distinct().collect()} == {"c1"}
    n1 = pk1.count()

    # phase 2: new attested conversation beyond the old watermark
    spark.createDataFrame(
        [("c2", 0, "user", "x0", "", _t(60_000)),
         ("adv2", 0, "user", "a", "", _t(120_000))], TURNS_FULL
    ).coalesce(1).write.mode("append").parquet(tdir)
    spark.createDataFrame(
        [("c2", 7, _t(59_900)), ("advf", 2, _t(120_000))], FACTS
    ).coalesce(1).write.mode("append").parquet(fdir)
    q2 = start_stream_ingestion(spark, tdir, out, ck, opts)
    q2.awaitTermination(240)

    pk2 = spark.read.parquet(f"{out}/packets")
    assert {r["conv_id"] for r in pk2.select("conv_id").distinct().collect()} == {"c1", "c2"}
    dups = pk2.groupBy("conv_id", "turn_idx", "destination").count().filter("count>1")
    assert dups.count() == 0
    assert pk2.filter("conv_id='c1'").count() == n1  # old output untouched
