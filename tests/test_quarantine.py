"""Corrupt-file tolerance (sources/quarantine.py): resilient scans skip bad
files without dying, the inventory names exactly the skipped files (and
distinguishes valid-empty from corrupt), quarantine restores strict reads."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from exposure_notifications_private_analytics_ingestion_spark.model.schema import TURNS_SCHEMA
from exposure_notifications_private_analytics_ingestion_spark.sources import generate_turns
from exposure_notifications_private_analytics_ingestion_spark.sources.quarantine import (
    corrupt_file_inventory,
    quarantine_corrupt_files,
    read_resilient,
)


@pytest.fixture()
def damaged_table(spark, tmp_path):
    path = str(tmp_path / "turns")
    pdf = generate_turns(n_convs=40, seed=13, hours=2, dup_frac=0.0)
    spark.createDataFrame(pdf, schema=TURNS_SCHEMA).repartition(4).write.parquet(path)
    # a truncated upload: valid parquet magic, garbage after
    bad = os.path.join(path, "part-corrupt-000.snappy.parquet")
    with open(bad, "wb") as f:
        f.write(b"PAR1" + os.urandom(256))
    # a legitimately empty (zero-row) but VALID file
    empty = str(tmp_path / "emptysrc")
    spark.createDataFrame([], schema=TURNS_SCHEMA).coalesce(1).write.parquet(empty)
    src = next(
        f for f in os.listdir(empty) if f.startswith("part-") and f.endswith(".parquet")
    )
    os.rename(os.path.join(empty, src), os.path.join(path, "part-empty-000.parquet"))
    return path, len(pdf), bad


def test_read_resilient_survives_and_inventory_names_the_file(spark, damaged_table):
    path, n_rows, bad = damaged_table
    # strict scan dies on the corrupt file
    with pytest.raises(Exception):
        spark.read.schema(TURNS_SCHEMA).parquet(path).count()
    got = read_resilient(spark, path, TURNS_SCHEMA)
    assert got.count() == n_rows  # every good row, no crash

    inv = {r["file_path"].rsplit("/", 1)[-1]: r["reason"]
           for r in corrupt_file_inventory(spark, path, TURNS_SCHEMA).collect()}
    assert inv == {
        "part-corrupt-000.snappy.parquet": "corrupt",
        "part-empty-000.parquet": "empty",
    }


def test_quarantine_restores_strict_reads(spark, damaged_table, tmp_path):
    path, n_rows, bad = damaged_table
    qdir = str(tmp_path / "quarantine")
    moved = quarantine_corrupt_files(spark, path, TURNS_SCHEMA, qdir)
    assert [m.rsplit("/", 1)[-1] for m in moved] == ["part-corrupt-000.snappy.parquet"]
    assert not os.path.exists(bad)
    assert os.path.exists(os.path.join(qdir, "part-corrupt-000.snappy.parquet"))
    # manifest records the move
    with open(os.path.join(qdir, "_manifest.jsonl")) as f:
        manifest = [json.loads(line) for line in f if line.strip()]
    assert len(manifest) == 1 and manifest[0]["file"].endswith(
        "part-corrupt-000.snappy.parquet"
    )
    # the valid-empty file stays; strict scan now succeeds with all rows
    assert spark.read.schema(TURNS_SCHEMA).parquet(path).count() == n_rows
    # idempotent: nothing left to quarantine
    assert quarantine_corrupt_files(spark, path, TURNS_SCHEMA, qdir) == []


def test_manifest_appends_across_runs(spark, tmp_path):
    """A second quarantine run must not clobber the forensic record of the
    first (manifest is append-semantics)."""
    path = str(tmp_path / "turns")
    pdf = generate_turns(n_convs=10, seed=3, hours=1, dup_frac=0.0)
    spark.createDataFrame(pdf, schema=TURNS_SCHEMA).coalesce(1).write.parquet(path)
    qdir = str(tmp_path / "q")

    with open(os.path.join(path, "part-badA.parquet"), "wb") as f:
        f.write(b"PAR1" + b"\x01" * 64)
    assert len(quarantine_corrupt_files(spark, path, TURNS_SCHEMA, qdir)) == 1

    with open(os.path.join(path, "part-badB.parquet"), "wb") as f:
        f.write(b"PAR1" + b"\x02" * 64)
    assert len(quarantine_corrupt_files(spark, path, TURNS_SCHEMA, qdir)) == 1

    with open(os.path.join(qdir, "_manifest.jsonl")) as f:
        names = [json.loads(line)["file"].rsplit("/", 1)[-1] for line in f if line.strip()]
    assert names == ["part-badA.parquet", "part-badB.parquet"]


def test_inflight_temporary_files_are_not_suspects(spark, tmp_path):
    """Files under a hidden _temporary/ commit dir (concurrent writer) must
    not appear in the inventory — quarantining them would break the
    in-flight commit."""
    path = str(tmp_path / "turns")
    pdf = generate_turns(n_convs=10, seed=4, hours=1, dup_frac=0.0)
    spark.createDataFrame(pdf, schema=TURNS_SCHEMA).coalesce(1).write.parquet(path)
    tdir = os.path.join(path, "_temporary", "0")
    os.makedirs(tdir)
    with open(os.path.join(tdir, "part-inflight.parquet"), "wb") as f:
        f.write(b"PAR1" + b"\x03" * 64)  # looks corrupt; must be ignored
    inv = corrupt_file_inventory(spark, path, TURNS_SCHEMA).collect()
    assert inv == []
