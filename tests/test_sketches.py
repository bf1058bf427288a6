"""Sketch summaries (operators/sketches.py): HLL estimates within relative
error of exact distinct counts, lossless union-rollup consistency, quantile
sanity, and a JVM-only plan (no Python stages)."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from exposure_notifications_private_analytics_ingestion_spark.operators.sketches import (  # noqa: E402
    merge_profiles,
    sketch_profile,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet")


def test_hll_estimate_within_error(spark, events):
    prof = sketch_profile(events, ["event_type"], "user_id").collect()
    exact = {
        r.event_type: r.n
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert len(prof) == len(exact)
    for r in prof:
        rel = abs(r.distinct_est - exact[r.event_type]) / max(exact[r.event_type], 1)
        assert rel < 0.05, (r.event_type, r.distinct_est, exact[r.event_type])


def test_hll_union_rollup_is_lossless(spark, events):
    """Rolling fine-grained sketches up via hll_union_agg must give the SAME
    estimate as sketching the raw data at the coarse grain — HLL union at
    equal lgK is exact over register arrays, not an approximation of an
    approximation."""
    fine = sketch_profile(events, ["event_type"], "user_id")
    rolled = merge_profiles(fine.withColumn("all", F.lit(1)), ["all"]).collect()[0]
    direct = (
        sketch_profile(events.withColumn("all", F.lit(1)), ["all"], "user_id")
        .collect()[0]
    )
    assert rolled.distinct_est == direct.distinct_est
    assert rolled.n_rows == direct.n_rows == events.count()


def test_quantiles_sane(spark, events):
    prof = sketch_profile(
        events.withColumn("all", F.lit(1)), ["all"], "user_id", quantile_col="value"
    ).collect()[0]
    p50, p95, p99 = prof.quantiles
    assert p50 <= p95 <= p99
    lo, hi = events.agg(F.min("value"), F.max("value")).collect()[0]
    assert lo <= p50 and p99 <= hi


def test_sketch_plan_is_jvm_only(spark, events):
    plan = (
        sketch_profile(events, ["event_type"], "user_id", quantile_col="value")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan
    assert "hll_sketch_agg" in plan or "HllSketchAgg" in plan
