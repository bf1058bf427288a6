"""Physical-plan audit, pinned: the scale-critical plan shapes PLANS.md
documents must survive refactors. Each assertion encodes a property whose
loss is a silent 100 TB regression long before it is a local-test failure —
a missing broadcast, a lost map-side partial aggregate, a window smuggled
back into a de-skewed path, a nested-loop join appearing in a registry
query."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from exposure_notifications_private_analytics_ingestion_spark import queries as q

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_no_registry_query_plans_a_nested_loop_or_cartesian(spark):
    """Sweep: none of the 50 driver-checked queries may plan a
    BroadcastNestedLoopJoin or CartesianProduct — the two shapes that turn
    O(n) work into O(n²) silently. (The guarded quadratic baselines live in
    the retired registry, excluded by design.)"""
    offenders = []
    for name, (fn, _sql) in q.registry().items():
        plan = _plan(fn(spark, SF))
        if "BroadcastNestedLoopJoin" in plan or "CartesianProduct" in plan:
            offenders.append(name)
    assert offenders == []


def test_span_dedup_first_occurrence_is_partial_agg_not_window(spark):
    """The round-3 de-skew fix, pinned: span first-occurrence must be a
    hash-aggregate (map-side partial absorbs a 10^8-occurrence boilerplate
    span) — never a row_number window partitioned by raw span text."""
    fn, _ = q.registry()["span_dedup_docs"]
    plan = _plan(fn(spark, SF))
    assert "Window" not in plan
    # partial + final pair on the span key
    assert plan.count("HashAggregate") >= 2


def test_contamination_benchmark_side_is_broadcast(spark):
    """The eval-set shingle dictionary must broadcast; a shuffle of the
    corpus-side text against a thousands-row benchmark is the bug."""
    fn, _ = q.registry()["contamination_check"]
    plan = _plan(fn(spark, SF))
    assert "BroadcastHashJoin" in plan


def test_stratified_sample_plans_zero_exchanges(spark):
    """Deterministic Bernoulli-by-hash sampling is a pure filter: any
    Exchange appearing here means it stopped being shuffle-free."""
    fn, _ = q.registry()["stratified_sample_docs"]
    plan = _plan(fn(spark, SF))
    assert "Exchange" not in plan


def test_window_filter_pushes_predicates_to_scan(spark):
    """The ingestion scan must push the time-window bounds into the parquet
    reader (PushedFilters), not filter post-materialization."""
    fn, _ = q.registry()["window_filter"]
    plan = _plan(fn(spark, SF))
    assert "PushedFilters: [" in plan
    assert "PushedFilters: []" not in plan


def test_exact_dedup_has_map_side_partial_agg(spark):
    fn, _ = q.registry()["exact_dedup_docs"]
    plan = _plan(fn(spark, SF))
    assert plan.count("HashAggregate") >= 2


def test_salted_agg_is_two_stage(spark):
    """Hot-key salting = two aggregation levels (salted partial, then
    final); collapsing to one means the salt stopped doing anything."""
    fn, _ = q.registry()["hot_key_salted_agg"]
    plan = _plan(fn(spark, SF))
    assert plan.count("HashAggregate") >= 4  # partial+final × two stages


def test_merge_upsert_source_keys_broadcast(spark, tmp_path):
    """The CDC upsert's anti-join must broadcast the (small) source key
    set, not shuffle the target table."""
    from exposure_notifications_private_analytics_ingestion_spark.plans.tables import (
        TableProvider,
    )

    prov = TableProvider(spark, str(tmp_path))
    target = spark.createDataFrame(
        [(f"c{i}", 0, "t", i % 2) for i in range(100)],
        "conv_id string, turn_idx int, text string, hour int",
    )
    prov.replace(target, "t")
    src = spark.createDataFrame(
        [("c1", 0, "x", 1)], "conv_id string, turn_idx int, text string, hour int"
    )
    kept = prov.read("t").join(
        F.broadcast(src.select("conv_id", "turn_idx").distinct()),
        ["conv_id", "turn_idx"],
        "left_anti",
    )
    assert "BroadcastHashJoin" in _plan(kept)
