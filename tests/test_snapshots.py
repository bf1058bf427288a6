"""Snapshot/time-travel layer (plans/snapshots.py): isolation, as-of reads,
zero-copy rollback, expiry, atomic commit contract."""

from __future__ import annotations

import shutil
import tempfile
import time

import pytest
from pyspark.sql import functions as F

from exposure_notifications_private_analytics_ingestion_spark.plans.snapshots import (
    SnapshotError,
    SnapshotTable,
)


@pytest.fixture()
def snap(spark):
    wh = tempfile.mkdtemp(prefix="enpa-snap-")
    yield SnapshotTable(spark, wh)
    shutil.rmtree(wh, ignore_errors=True)


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id"), (F.col("id") * 10).alias("v"))


def test_versions_isolate_and_time_travel(spark, snap):
    v1 = snap.replace(_df(spark, 0, 10), "t")
    v2 = snap.append(_df(spark, 10, 15), "t")
    v3 = snap.replace(_df(spark, 100, 103), "t")
    assert (v1, v2, v3) == (1, 2, 3)
    assert snap.read("t").count() == 3  # latest = the replace
    assert snap.read("t", version=1).count() == 10
    assert snap.read("t", version=2).count() == 15
    # snapshot isolation: a frozen v2 plan still reads 15 rows after v3
    frozen = snap.read("t", version=2)
    snap.append(_df(spark, 200, 210), "t")
    assert frozen.count() == 15
    # history chain
    ops = [m["operation"] for m in snap.history("t")]
    assert ops == ["replace", "append", "replace", "append"]
    assert [m["parent"] for m in snap.history("t")] == [None, 1, 2, 3]


def test_read_asof(spark, snap):
    snap.replace(_df(spark, 0, 5), "t")
    cut = int(time.time())
    time.sleep(1.2)
    snap.append(_df(spark, 5, 9), "t")
    assert snap.read_asof("t", cut).count() == 5
    assert snap.read_asof("t", int(time.time()) + 10).count() == 9
    with pytest.raises(SnapshotError):
        snap.read_asof("t", cut - 3600)


def test_rollback_is_zero_copy_and_keeps_history(spark, snap):
    snap.replace(_df(spark, 0, 10), "t")
    snap.replace(_df(spark, 0, 2), "t")  # a bad deploy
    v = snap.rollback("t", 1)
    assert v == 3
    assert snap.read("t").count() == 10
    # zero-copy: the rolled-back version references v1's files verbatim
    h = snap.history("t")
    assert h[-1]["files"] == h[0]["files"]
    # the bad version is still readable (history kept)
    assert snap.read("t", version=2).count() == 2


def test_expire_snapshots_deletes_only_unreferenced_files(spark, snap):
    snap.replace(_df(spark, 0, 10), "t")
    snap.append(_df(spark, 10, 12), "t")  # v2 shares v1's files
    snap.replace(_df(spark, 50, 53), "t")  # v3: fresh files
    deleted = snap.expire_snapshots("t", keep_last=2)
    # v1 dropped; its files survive (v2 references them) — nothing deleted
    assert deleted == []
    assert snap._versions("t") == [2, 3]
    assert snap.read("t", version=2).count() == 12

    snap.replace(_df(spark, 60, 61), "t")  # v4
    deleted = snap.expire_snapshots("t", keep_last=2)
    # now v2 is dropped and v1/v2's files are unreferenced → deleted
    assert len(deleted) > 0
    assert snap._versions("t") == [3, 4]
    assert snap.read("t", version=3).count() == 3
    with pytest.raises(SnapshotError):
        snap.read("t", version=2)


def test_empty_table_raises(spark, snap):
    with pytest.raises(SnapshotError):
        snap.read("nope")
