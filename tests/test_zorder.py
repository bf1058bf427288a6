"""Z-order clustering (operators/zorder.py): bit-exact Morton interleave vs
a Python reference, bucketize clamping, data-skipping effectiveness of the
layout on BOTH dimensions, and a codegen-only plan."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from exposure_notifications_private_analytics_ingestion_spark.operators.zorder import (  # noqa: E402
    bucketize,
    zorder_layout,
    zvalue,
)


def _morton_ref(vals: list[int], bits: int) -> int:
    out = 0
    nd = len(vals)
    for j, v in enumerate(vals):
        v &= (1 << bits) - 1
        for i in range(bits):
            out |= ((v >> i) & 1) << (i * nd + j)
    return out


def test_zvalue_bit_exact(spark):
    rows = [(0, 0), (1, 0), (0, 1), (1023, 1023), (5, 1024 + 5), (700, 33)]
    df = spark.createDataFrame(rows, "x long, y long").withColumn(
        "z", zvalue(["x", "y"], bits=10)
    )
    for r in df.collect():
        assert r.z == _morton_ref([r.x, r.y], 10), (r.x, r.y)


def test_zvalue_three_dims_and_overflow_guard(spark):
    df = spark.createDataFrame([(3, 5, 7)], "a long, b long, c long").withColumn(
        "z", zvalue(["a", "b", "c"], bits=8)
    )
    assert df.collect()[0].z == _morton_ref([3, 5, 7], 8)
    with pytest.raises(ValueError, match="exceeds a signed long"):
        zvalue(["a", "b", "c", "a"], bits=16)


def test_bucketize_clamps(spark):
    df = spark.createDataFrame(
        [(-5.0,), (0.0,), (50.0,), (100.0,), (999.0,)], "v double"
    ).withColumn("b", bucketize("v", 0.0, 100.0, bits=8))
    vals = [r.b for r in df.collect()]
    assert vals[0] == 0 and vals[1] == 0 and vals[3] == 255 and vals[4] == 255
    assert 0 < vals[2] < 255


def test_zorder_layout_skips_on_both_dims(spark):
    """Per-partition min/max ranges under the z-layout must prune a box
    predicate on EITHER dimension; a single-column sort only prunes its own
    column. Deterministic grid input, fixed partition count."""
    n = 64
    grid = spark.range(n * n).select(
        (F.col("id") % n).alias("x"), (F.col("id") / n).cast("long").alias("y")
    )

    def overlap_fraction(df, col, lo, hi, parts=16):
        stats = (
            df.withColumn("pid", F.spark_partition_id())
            .groupBy("pid")
            .agg(F.min(col).alias("mn"), F.max(col).alias("mx"))
            .collect()
        )
        hit = sum(1 for r in stats if not (r.mx < lo or r.mn > hi))
        return hit / len(stats)

    zed = zorder_layout(grid, ["x", "y"], bits=6, num_partitions=16)
    xsorted = grid.repartitionByRange(16, "x").sortWithinPartitions("x")

    # the x-sorted layout prunes x but reads EVERY partition for a y-box
    assert overlap_fraction(xsorted, "y", 10, 17) == 1.0
    # the z-layout prunes substantially on both dimensions
    assert overlap_fraction(zed, "x", 10, 17) <= 0.5
    assert overlap_fraction(zed, "y", 10, 17) <= 0.5
    # and loses no rows
    assert zed.count() == n * n


def test_zorder_plan_is_jvm_only(spark):
    df = spark.range(100).select(
        (F.col("id") % 32).alias("x"), (F.col("id") % 17).alias("y")
    )
    plan = (
        zorder_layout(df, ["x", "y"], bits=5, num_partitions=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan
