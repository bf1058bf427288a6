"""Small-file compaction (plans/compaction.py): metadata-only planning,
content-preserving in-place rewrite of only the oversplit partitions,
idempotence, and the unpartitioned staged-swap path."""

from __future__ import annotations

import glob
import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from exposure_notifications_private_analytics_ingestion_spark.plans.compaction import (  # noqa: E402
    compact_table,
    compaction_plan,
    compaction_report,
)


def _data_files(path: str) -> list[str]:
    return [
        f
        for f in glob.glob(f"{path}/**/*.parquet", recursive=True)
        if not Path(f).name.startswith(("_", "."))
    ]


def _content_hash(spark, path: str):
    df = spark.read.parquet(path)
    return (
        df.count(),
        df.select(
            F.sum(
                F.xxhash64(*[F.col(c) for c in sorted(df.columns)]).cast(
                    "decimal(38,0)"
                )
            ).alias("h")
        ).collect()[0].h,
    )


@pytest.fixture()
def oversplit_table(spark, tmp_path):
    """3 hour partitions: hour 0 and 1 shattered into ~40 files each, hour 2
    already a single file."""
    path = str(tmp_path / "tbl")
    df = spark.range(30_000).select(
        F.col("id").alias("row_id"),
        (F.col("id") % 3).alias("hour"),
        (F.col("id") * 17 % 1000).alias("v"),
    )
    df.filter("hour < 2").repartition(40).write.partitionBy("hour").mode(
        "overwrite"
    ).parquet(path)
    df.filter("hour = 2").coalesce(1).write.partitionBy("hour").mode(
        "append"
    ).parquet(path)
    return path


def test_plan_is_metadata_only(spark, oversplit_table):
    plan = compaction_plan(spark, oversplit_table, target_file_bytes=1 << 30)
    by_part = {p.partition: p for p in plan}
    assert set(by_part) == {"hour=0", "hour=1", "hour=2"}
    assert by_part["hour=0"].n_files == 40 and by_part["hour=0"].oversplit
    assert by_part["hour=2"].n_files == 1 and not by_part["hour=2"].oversplit
    assert all(p.target_files == 1 for p in plan)  # tiny data, huge target
    rep = compaction_report(spark, plan)
    assert rep.filter("oversplit").count() == 2


def test_compact_preserves_content_and_skips_ok_partitions(
    spark, oversplit_table
):
    before = _content_hash(spark, oversplit_table)
    h2_files_before = set(_data_files(f"{oversplit_table}/hour=2"))
    compact_table(spark, oversplit_table, target_file_bytes=1 << 30)
    after = _content_hash(spark, oversplit_table)
    assert after == before
    # oversplit partitions collapsed to their target (1 file each)
    assert len(_data_files(f"{oversplit_table}/hour=0")) == 1
    assert len(_data_files(f"{oversplit_table}/hour=1")) == 1
    # the already-compact partition was NOT rewritten (same physical files)
    assert set(_data_files(f"{oversplit_table}/hour=2")) == h2_files_before


def test_compact_is_idempotent(spark, oversplit_table):
    compact_table(spark, oversplit_table, target_file_bytes=1 << 30)
    files1 = set(_data_files(oversplit_table))
    plan2 = compact_table(spark, oversplit_table, target_file_bytes=1 << 30)
    assert set(_data_files(oversplit_table)) == files1
    assert not any(p.oversplit for p in plan2)


def test_target_respects_file_size(spark, tmp_path):
    """With a small byte target, a partition splits into multiple right-sized
    files instead of one jumbo file."""
    path = str(tmp_path / "tbl2")
    spark.range(60_000).select(
        (F.col("id") % 2).alias("hour"), F.col("id").alias("v"),
        F.sha2(F.col("id").cast("string"), 256).alias("pad"),
    ).repartition(50).write.partitionBy("hour").mode("overwrite").parquet(path)
    plan = compaction_plan(spark, path, target_file_bytes=512 * 1024)
    by_part = {p.partition: p for p in plan}
    assert by_part["hour=0"].target_files > 1
    compact_table(spark, path, target_file_bytes=512 * 1024)
    got = len(_data_files(f"{path}/hour=0"))
    # within slack of the plan (hash salting is approximate, never 50 files)
    assert 1 < got <= by_part["hour=0"].target_files + 2


def test_unpartitioned_staged_swap(spark, tmp_path):
    path = str(tmp_path / "flat")
    spark.range(10_000).repartition(30).write.mode("overwrite").parquet(path)
    before = _content_hash(spark, path)
    compact_table(spark, path, target_file_bytes=1 << 30)
    assert _content_hash(spark, path) == before
    assert len(_data_files(path)) == 1
    assert not glob.glob(f"{path}._compacting*")
