"""Unit tests for the temporal join operators (as-of + interval join).

The semantics target pandas ``merge_asof`` / DuckDB ``ASOF JOIN``:
backward-inclusive by default, left rows without a match keep NULLs,
tolerance voids stale matches. The interval join must agree with the
naive theta-join it replaces.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from exposure_notifications_private_analytics_ingestion_spark.operators.temporal_join import (
    asof_join,
    interval_join_binned,
)

UTC = dt.timezone.utc


def _ts(s: int):
    return dt.datetime.fromtimestamp(s, tz=UTC).replace(tzinfo=None)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, "a", _ts(100)),
            (2, "a", _ts(205)),
            (3, "a", _ts(200)),  # tie with a right row: inclusive match
            (4, "b", _ts(50)),   # before any right row for b
            (5, "c", _ts(999)),  # key with no right rows at all
        ],
        "event_id int, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("a", 10, _ts(90)),
            ("a", 11, _ts(200)),
            ("a", 12, _ts(200)),  # duplicate (k, ts): max payload wins
            ("b", 20, _ts(60)),
        ],
        "k string, rid int, ts timestamp",
    )
    return left, right


def _rows(df):
    return {r["event_id"]: (r["rid"], r["_asof_ts_ms"]) for r in df.collect()}


def test_asof_backward_inclusive_and_nulls(spark):
    left, right = _frames(spark)
    out = _rows(asof_join(left, right, on=["k"], right_cols=["rid"]))
    assert out[1] == (10, 90_000)      # latest right at-or-before 100
    assert out[2] == (12, 200_000)     # most recent, dup resolved to max rid
    assert out[3] == (12, 200_000)     # equal ts matches (inclusive)
    assert out[4] == (None, None)      # right exists for b but only later
    assert out[5] == (None, None)      # no right rows for key c


def test_asof_forward(spark):
    left, right = _frames(spark)
    out = _rows(
        asof_join(left, right, on=["k"], right_cols=["rid"], direction="forward")
    )
    assert out[1] == (11, 200_000) or out[1] == (12, 200_000)
    assert out[1][0] == 12  # dedup keeps max payload per (k, ts)
    assert out[3] == (12, 200_000)     # inclusive at equal ts
    assert out[4] == (20, 60_000)      # next right row after 50
    assert out[2] == (None, None)      # nothing at-or-after 205
    assert out[5] == (None, None)


def test_asof_tolerance_voids_stale(spark):
    left, right = _frames(spark)
    out = _rows(
        asof_join(left, right, on=["k"], right_cols=["rid"], tolerance_ms=5_000)
    )
    assert out[2] == (12, 200_000)     # 5s gap: kept
    assert out[1] == (None, None)      # 10s gap: voided
    assert out[3] == (12, 200_000)     # 0 gap: kept


def test_asof_matches_pandas_merge_asof(spark):
    """Randomized cross-check against pandas' reference implementation."""
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(7)
    lpdf = pd.DataFrame(
        {
            "event_id": np.arange(200),
            "k": rng.randint(0, 5, 200).astype(str),
            "ts": pd.to_datetime(rng.randint(0, 10_000, 200), unit="s"),
        }
    )
    rts = rng.choice(rng.randint(0, 10_000, 60), 60)  # includes duplicates
    rpdf = pd.DataFrame(
        {
            "k": rng.randint(0, 6, 60).astype(str),
            "rid": np.arange(60),
            "ts": pd.to_datetime(rts, unit="s"),
        }
    )
    out = (
        asof_join(
            spark.createDataFrame(lpdf),
            spark.createDataFrame(rpdf),
            on=["k"],
            right_cols=["rid"],
        )
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    # pandas keeps the LAST right row among ties, so emulate the operator's
    # deterministic max-payload rule by sorting right by (ts, rid)
    expected = pd.merge_asof(
        lpdf.sort_values("ts", kind="stable"),
        rpdf.sort_values(["ts", "rid"], kind="stable"),
        on="ts",
        by="k",
        direction="backward",
    ).sort_values("event_id").reset_index(drop=True)
    assert out["rid"].fillna(-1).tolist() == expected["rid"].fillna(-1).tolist()


def test_interval_join_matches_theta_join(spark):
    import numpy as np

    rng = np.random.RandomState(11)
    ev = spark.createDataFrame(
        [(int(i), _ts(int(t))) for i, t in enumerate(rng.randint(0, 5_000, 300))],
        "event_id int, ts timestamp",
    )
    iv_rows = []
    for j in range(40):
        s = int(rng.randint(0, 5_000)) * 1000
        iv_rows.append((j, s, s + int(rng.randint(1, 2_000)) * 1000))
    iv = spark.createDataFrame(iv_rows, "iid int, start_ms long, end_ms long")

    got = {
        (r["event_id"], r["iid"])
        for r in interval_join_binned(ev, iv, bin_s=600).collect()
    }
    naive = {
        (r["event_id"], r["iid"])
        for r in ev.withColumn("ms", F.expr("unix_micros(ts) div 1000"))
        .crossJoin(iv)
        .filter((F.col("ms") >= F.col("start_ms")) & (F.col("ms") < F.col("end_ms")))
        .collect()
    }
    assert got == naive and len(got) > 0


def test_interval_join_left_keeps_unmatched(spark):
    ev = spark.createDataFrame(
        [(1, _ts(100)), (2, _ts(5_000))], "event_id int, ts timestamp"
    )
    iv = spark.createDataFrame([(7, 90_000, 110_000)], "iid int, start_ms long, end_ms long")
    out = {
        r["event_id"]: r["iid"]
        for r in interval_join_binned(ev, iv, bin_s=60, how="left").collect()
    }
    assert out == {1: 7, 2: None}


def test_interval_join_inverted_interval_matches_nothing(spark):
    """end <= start must match nothing — sequence() would run DESCENDING on
    an inverted range and fabricate bins if not filtered."""
    ev = spark.createDataFrame([(1, _ts(100))], "event_id int, ts timestamp")
    iv = spark.createDataFrame(
        [(7, 200_000, 90_000), (8, 100_000, 100_000)],
        "iid int, start_ms long, end_ms long",
    )
    assert interval_join_binned(ev, iv, bin_s=60).count() == 0
    out = interval_join_binned(ev, iv, bin_s=60, how="left").collect()
    assert len(out) == 1 and out[0]["iid"] is None


def test_interval_join_no_bnl_in_plan(spark):
    """The physical plan must be a hash equi-join on the bin id, never a
    BroadcastNestedLoopJoin."""
    ev = spark.createDataFrame([(1, _ts(100))], "event_id int, ts timestamp")
    iv = spark.createDataFrame([(7, 0, 10**9)], "iid int, start_ms long, end_ms long")
    plan = (
        interval_join_binned(ev, iv, bin_s=3600)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan
