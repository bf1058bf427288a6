"""Round-5 self-review regressions: seq-path merge with a self-referential
source, and stale avro-manifest partitions surviving a window rewrite."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from exposure_notifications_private_analytics_ingestion_spark.plans.ingestion import (
    IngestionOptions,
    run_ingestion,
)
from exposure_notifications_private_analytics_ingestion_spark.plans.tables import (
    TableProvider,
)


def test_seq_merge_with_source_derived_from_target(spark, tmp_path):
    """The correction batch is computed FROM a read of the target table —
    the classic backfill shape. The seq-path COW overwrite truncates the
    very files such a source's lazy plan would re-read, so merge_upsert
    must sever the source lineage too (round-5 review finding #1); without
    that this test dies with FAILED_READ_FILE or silently corrupts."""
    tp = TableProvider(spark, str(tmp_path))
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 10), (3, "c", 10)], ["k", "v", "seq"]
    )
    tp.replace(base, "t")
    # source derived from the target itself, NOT materialized by the caller
    src = (
        tp.read("t")
        .filter(F.col("k") <= 2)
        .withColumn("v", F.concat(F.col("v"), F.lit("-fixed")))
        .withColumn("seq", F.col("seq") + 10)
    )
    tp.merge_upsert(src, "t", keys=["k"], seq_col="seq")
    rows = {r["k"]: (r["v"], r["seq"]) for r in tp.read("t").collect()}
    assert rows == {1: ("a-fixed", 20), 2: ("b-fixed", 20), 3: ("c", 10)}
    # and replaying the identical (now-stale vs the table) correction is a
    # no-op, not a duplicate-key insert
    tp.merge_upsert(
        spark.createDataFrame([(1, "stale", 15)], ["k", "v", "seq"]),
        "t", keys=["k"], seq_col="seq",
    )
    rows = {r["k"]: (r["v"], r["seq"]) for r in tp.read("t").collect()}
    assert rows[1] == ("a-fixed", 20) and len(rows) == 3


def test_window_rewrite_clears_stale_manifest_partitions(spark, tmp_path):
    """Re-running a window clears THAT window's manifest partition wholesale
    (round-5 review finding #2): a destination present in an earlier run
    but absent from the rewrite must not leave manifest rows pointing at
    container files the W4 cleanup deleted — the manifest-driven read fast
    path would fail on ghosts."""
    from exposure_notifications_private_analytics_ingestion_spark.sources import (
        generate_turns,
        read_packet_containers,
        write_turns_table,
    )

    JAN = 1704067200
    pdf = generate_turns(n_convs=6, seed=3, hours=1)
    write_turns_table(spark, pdf, str(tmp_path / "turns"))
    opts = IngestionOptions(
        window_start_s=JAN, duration_s=7200, batch_size=8,
        emit_avro_containers=True,
    )
    run_ingestion(spark, str(tmp_path / "turns"), str(tmp_path / "out"), opts)
    man_dir = str(tmp_path / f"out/avro_manifest/window_start_s={JAN}")
    # plant a ghost destination partition (as if a prior run had routed to
    # a destination this rewrite no longer produces)
    shutil.copytree(f"{man_dir}/destination=pha", f"{man_dir}/destination=ghost")
    run_ingestion(spark, str(tmp_path / "turns"), str(tmp_path / "out"), opts)
    assert not os.path.exists(f"{man_dir}/destination=ghost")
    # the manifest fast path reads clean and matches the parquet leg
    pk = spark.read.parquet(str(tmp_path / "out/packets")).count()
    assert read_packet_containers(spark, str(tmp_path / "out/avro")).count() == pk
