"""Streaming CDC upsert sink (streaming/cdc_sink.py): a correction stream
MERGEs into a keyed table via foreachBatch → TableProvider.merge_upsert.

Multi-epoch by construction: each CDC batch is one parquet file and the
stream runs with maxFilesPerTrigger=1, so corrections arrive across ≥3
separate epochs — cross-epoch ordering (later corrections supersede
earlier ones) is actually exercised, not collapsed into one microbatch.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from exposure_notifications_private_analytics_ingestion_spark.plans.tables import TableProvider
from exposure_notifications_private_analytics_ingestion_spark.streaming import (
    start_cdc_upsert_stream,
)

SCHEMA = "conv_id string, turn_idx int, text string, seq int"


@pytest.fixture()
def dirs():
    d = tempfile.mkdtemp(prefix="enpa-cdc-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _write_one_file(spark, rows, path):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)


def _run(spark, dirs, provider):
    q = start_cdc_upsert_stream(
        spark,
        f"{dirs}/cdc",
        provider,
        "turns",
        keys=["conv_id", "turn_idx"],
        seq_col="seq",
        checkpoint=f"{dirs}/ck",
        max_files_per_trigger=1,
    )
    q.awaitTermination(300)


def _table(provider):
    return {
        (r["conv_id"], r["turn_idx"]): (r["text"], r["seq"])
        for r in provider.read("turns").collect()
    }


def test_multi_epoch_corrections_latest_wins(spark, dirs):
    provider = TableProvider(spark, f"{dirs}/wh")
    base = [("c1", 0, "hello", 0), ("c1", 1, "world", 0), ("c2", 0, "base", 0)]
    provider.replace(spark.createDataFrame(base, SCHEMA), "turns")

    # three single-file CDC batches -> three epochs under maxFilesPerTrigger=1
    _write_one_file(spark, [("c1", 1, "world-edit-1", 1)], f"{dirs}/cdc")
    _write_one_file(spark, [("c1", 1, "world-edit-2", 2), ("c3", 0, "new conv", 1)], f"{dirs}/cdc")
    _write_one_file(spark, [("c2", 0, "base-edit", 1)], f"{dirs}/cdc")
    _run(spark, dirs, provider)

    assert _table(provider) == {
        ("c1", 0): ("hello", 0),
        ("c1", 1): ("world-edit-2", 2),  # epoch-2 correction supersedes epoch-1
        ("c2", 0): ("base-edit", 1),
        ("c3", 0): ("new conv", 1),      # unmatched key inserts
    }


def test_resume_applies_only_new_files_and_replay_is_idempotent(spark, dirs):
    provider = TableProvider(spark, f"{dirs}/wh")
    provider.replace(
        spark.createDataFrame([("c1", 0, "orig", 0)], SCHEMA), "turns"
    )
    _write_one_file(spark, [("c1", 0, "edit-a", 1)], f"{dirs}/cdc")
    _run(spark, dirs, provider)
    snap1 = _table(provider)
    assert snap1[("c1", 0)] == ("edit-a", 1)

    # resume with no new files: no change
    _run(spark, dirs, provider)
    assert _table(provider) == snap1

    # resume with one new correction: applied on top
    _write_one_file(spark, [("c1", 0, "edit-b", 2)], f"{dirs}/cdc")
    _run(spark, dirs, provider)
    assert _table(provider)[("c1", 0)] == ("edit-b", 2)

    # full replay from a FRESH checkpoint (epoch retry in the large):
    # re-merging already-applied rows converges to the same table
    shutil.rmtree(f"{dirs}/ck")
    _run(spark, dirs, provider)
    assert _table(provider)[("c1", 0)] == ("edit-b", 2)


def test_within_epoch_seq_resolves_duplicate_keys(spark, dirs):
    provider = TableProvider(spark, f"{dirs}/wh")
    provider.replace(spark.createDataFrame([("c1", 0, "orig", 0)], SCHEMA), "turns")
    # one file = one epoch carrying THREE versions of the same key
    _write_one_file(
        spark,
        [("c1", 0, "v1", 1), ("c1", 0, "v3", 3), ("c1", 0, "v2", 2)],
        f"{dirs}/cdc",
    )
    _run(spark, dirs, provider)
    tbl = _table(provider)
    assert tbl == {("c1", 0): ("v3", 3)}


def test_stale_redelivery_in_later_epoch_does_not_revert(spark, dirs):
    """A re-delivered OLD correction arriving in a later epoch (out-of-order
    CDC feed) must not overwrite the newer stored version: the merge is
    seq-guarded, not arrival-ordered."""
    provider = TableProvider(spark, f"{dirs}/wh")
    provider.replace(spark.createDataFrame([("c1", 0, "orig", 0)], SCHEMA), "turns")
    # epoch 1 applies seq=2; epoch 2 re-delivers the older seq=1 edit
    _write_one_file(spark, [("c1", 0, "edit-b", 2)], f"{dirs}/cdc")
    _write_one_file(spark, [("c1", 0, "edit-a", 1)], f"{dirs}/cdc")
    _run(spark, dirs, provider)
    assert _table(provider) == {("c1", 0): ("edit-b", 2)}


def test_error_contracts(spark, dirs):
    provider = TableProvider(spark, f"{dirs}/wh")
    _write_one_file(spark, [("c1", 0, "x", 1)], f"{dirs}/cdc")
    with pytest.raises(ValueError, match="cannot be one of keys"):
        start_cdc_upsert_stream(
            spark, f"{dirs}/cdc", provider, "turns",
            keys=["conv_id", "seq"], seq_col="seq", checkpoint=f"{dirs}/ck",
        )
    with pytest.raises(ValueError, match="lacks"):
        start_cdc_upsert_stream(
            spark, f"{dirs}/cdc", provider, "turns",
            keys=["conv_id", "turn_idx"], seq_col="version",
            checkpoint=f"{dirs}/ck",
        )
