"""Round-4 ADVICE regressions: null-safe left interval join (no double
emission of matched events carrying NULLs), reserved-name validation in
interval_join_binned, guard_quadratic short-circuit scan, and a consistent
odd/even median expression across both scaling_bench leg templates."""

from __future__ import annotations

import re
from datetime import datetime, timezone
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from exposure_notifications_private_analytics_ingestion_spark.operators.guards import (
    QuadraticPlanError,
    guard_quadratic,
)
from exposure_notifications_private_analytics_ingestion_spark.operators.temporal_join import (
    interval_join_binned,
)


def _ts(s: int):
    return datetime.fromtimestamp(s, tz=timezone.utc).replace(tzinfo=None)


@pytest.fixture(scope="module")
def null_events(spark):
    """Events where the MATCHED rows carry a NULL column — the case where a
    bare-column anti-join (null-unsafe `=`) fails to recognize a matched row
    as its own copy and re-emits it as unmatched."""
    ev = spark.createDataFrame(
        [
            (1, None, _ts(100)),   # inside interval A, NULL payload
            (2, "x", _ts(150)),    # inside interval A
            (3, None, _ts(900)),   # outside every interval, NULL payload
        ],
        "event_id int, payload string, ts timestamp",
    )
    iv = spark.createDataFrame(
        [("A", 0, 200_000)], "iv_id string, start_ms long, end_ms long"
    )
    return ev, iv


def test_interval_left_join_null_safe(null_events):
    ev, iv = null_events
    out = interval_join_binned(ev, iv, bin_s=60, how="left").collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r.event_id, []).append(r.iv_id)
    # matched events appear EXACTLY once (no duplicate unmatched echo), even
    # with a NULL column; the genuinely unmatched NULL-payload event appears
    # once with NULL interval columns
    assert by_id[1] == ["A"]
    assert by_id[2] == ["A"]
    assert by_id[3] == [None]
    assert len(out) == 3


def test_interval_left_join_inner_unchanged(null_events):
    ev, iv = null_events
    inner = interval_join_binned(ev, iv, bin_s=60, how="inner").collect()
    assert sorted(r.event_id for r in inner) == [1, 2]


def test_interval_join_reserved_names(spark, null_events):
    _, iv = null_events
    bad_ev = spark.createDataFrame(
        [(1, 5, _ts(100))], "event_id int, _bin int, ts timestamp"
    )
    with pytest.raises(ValueError, match="_bin"):
        interval_join_binned(bad_ev, iv, bin_s=60)
    ok_ev = spark.createDataFrame([(1, _ts(100))], "event_id int, ts timestamp")
    bad_iv = iv.withColumn("_ev_ms", F.lit(0))
    with pytest.raises(ValueError, match="_ev_ms"):
        interval_join_binned(ok_ev, bad_iv, bin_s=60)


def test_guard_quadratic_short_circuits(spark):
    # guard must trip without scanning the whole input: a 10^6-row range
    # with limit=10 returns fast because limit(11).count() short-circuits
    big = spark.range(1_000_000)
    with pytest.raises(QuadraticPlanError, match="brute_op"):
        guard_quadratic(big, "brute_op", "bucketed_twin", limit=10)
    # under the limit: passes
    guard_quadratic(spark.range(5), "brute_op", "bucketed_twin", limit=10)
    # flag bypasses entirely (no action at all)
    guard_quadratic(big, "brute_op", "bucketed_twin", allow_quadratic=True)


def test_scaling_bench_median_expressions_consistent():
    """Both leg templates must compute the same statistic for even rep
    counts (ADVICE r4: the fleet template took the upper-middle value while
    the single-JVM template averaged the two middle values)."""
    src = (Path(__file__).resolve().parents[1] / "tools" / "scaling_bench.py").read_text()
    medians = re.findall(r"secs = times\[.*", src)
    assert len(medians) >= 2
    # every median line must carry the even-rep average branch
    for line in medians:
        assert "sum(times[" in line and "/ 2" in line, line
