"""Bloom-filter join pruning (operators/bloom.py): no false negatives ever,
bounded false-positive rate, exactness of the chained semi-join, JVM-side
hashing, and the small-build-side guard."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from exposure_notifications_private_analytics_ingestion_spark.operators.bloom import (  # noqa: E402
    build_bloom,
    bloom_prefilter,
    bloom_semi_join,
)


@pytest.fixture(scope="module")
def spec(spark):
    keys = spark.range(0, 1000).select(F.col("id").alias("k"))
    return build_bloom(keys, "k", num_bits=1 << 16)


def test_bloom_no_false_negatives(spark, spec):
    """Every built key must pass the prefilter — bloom guarantees this by
    construction; the test pins the build/probe hash pipelines agree."""
    members = spark.range(0, 1000).select(F.col("id").alias("k"))
    kept = bloom_prefilter(members, "k", spec).count()
    assert kept == 1000


def test_bloom_fpp_bounded(spark, spec):
    """A disjoint probe set passes only at ~the predicted false-positive
    rate. With m=65536 bits, n=1000 keys, k≈ln2·m/n (capped at 8) the
    theoretical fpp is well under 1%; assert a generous 3% ceiling so the
    test never flakes on hash luck."""
    probe = spark.range(10_000, 60_000).select(F.col("id").alias("k"))
    fp = bloom_prefilter(probe, "k", spec).count()
    assert fp / 50_000 < 0.03
    # the driver-side estimate agrees in magnitude
    assert spec.fpp_estimate < 0.03


def test_bloom_semi_join_exact(spark):
    """The chained broadcast left_semi removes every false positive: output
    equals a plain semi-join, row for row (nulls dropped like semi-join)."""
    fact = spark.createDataFrame(
        [(i, i % 7) for i in range(500)] + [(999, None)], "row_id int, k int"
    )
    keys = spark.createDataFrame([(0,), (3,), (5,)], "k int")
    got = {r.row_id for r in bloom_semi_join(fact, keys, "k").collect()}
    want = {
        r.row_id
        for r in fact.join(keys, "k", "left_semi").collect()
    }
    assert got == want and len(got) > 0


def test_bloom_hashing_is_jvm_side(spark, spec):
    """The k probe positions are xxhash64 expressions in the plan (codegen),
    not Python — only the final bitmap test is a pandas UDF."""
    probe = spark.range(100).select(F.col("id").alias("k"))
    plan = bloom_prefilter(probe, "k", spec)._jdf.queryExecution().executedPlan().toString()
    assert "xxhash64" in plan
    assert "ArrowEvalPython" in plan or "BatchEvalPython" in plan


def test_bloom_build_side_guard(spark):
    with pytest.raises(ValueError, match="bloom build side"):
        build_bloom(
            spark.range(6_000_000).select(F.col("id").alias("k")), "k"
        )
