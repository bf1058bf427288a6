"""Round-5 ADVICE regressions: stream-canary timeout sentinel must not
divide by zero, CEP other_symbol must be disjoint from the symbol map,
and the COW merge_upsert fallback must match keys NULL-safely (the mirror
of the Iceberg path's ``t.k <=> s.k``), including partition scoping of a
NULL partition value.
"""

from __future__ import annotations

import re
import shutil
import tempfile
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from exposure_notifications_private_analytics_ingestion_spark.operators.cep import (
    pattern_match,
)
from exposure_notifications_private_analytics_ingestion_spark.plans.tables import (
    TableProvider,
)

REPO = Path(__file__).resolve().parents[1]


@pytest.fixture()
def provider(spark):
    wh = tempfile.mkdtemp(prefix="enpa-advice5-")
    yield TableProvider(spark, wh)
    shutil.rmtree(wh, ignore_errors=True)


def test_stream_canary_timeout_sentinel_no_division():
    """canary_tps returns rate 0.0 when the stream times out; the gate
    script must route that through classify() as DEGRADED, never divide
    n/rate. Pin both the source guard and the classifier behavior."""
    src = (REPO / "tools" / "stream_canary.py").read_text()
    assert re.search(r"if rate > 0 else", src), (
        "stream_canary.py must guard the n/rate division against the 0.0 "
        "timeout sentinel"
    )
    from exposure_notifications_private_analytics_ingestion_spark.streaming.canary import (
        classify,
    )

    assert classify(0.0) == "DEGRADED"


def test_cep_other_symbol_collision_rejected(spark):
    ev = spark.createDataFrame(
        [("c1", 1000, 1, "click")], "conv_id string, ms long, i int, etype string"
    )
    with pytest.raises(ValueError, match="collides"):
        pattern_match(
            ev, "conv_id", F.col("ms"), F.col("i"), "etype",
            symbols={"click": "c"}, pattern="c+", other_symbol="c",
        )


def test_cep_stream_other_symbol_collision_rejected(spark):
    from exposure_notifications_private_analytics_ingestion_spark.streaming.cep_stream import (
        pattern_match_stream,
    )

    src = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        .select(
            F.lit("c").alias("conv_id"),
            F.col("timestamp").alias("ts"),
            F.col("value").cast("int").alias("i"),
            F.lit("click").alias("etype"),
        )
    )
    with pytest.raises(ValueError, match="collides"):
        pattern_match_stream(
            src, "conv_id", "ts", "i", "etype",
            symbols={"click": "c"}, pattern="c+", gap_s=60, other_symbol="c",
        )


def test_merge_upsert_null_key_updates_not_duplicates(spark, provider):
    """A NULL key value must behave like the Iceberg MERGE's `<=>`: the
    matched target row is REPLACED, not kept alongside an inserted twin."""
    tgt = spark.createDataFrame(
        [("c1", None, "old"), ("c1", 2, "keep")],
        "conv_id string, turn_idx int, text string",
    )
    provider.replace(tgt, "nk1")
    src = spark.createDataFrame(
        [("c1", None, "new")], "conv_id string, turn_idx int, text string"
    )
    provider.merge_upsert(src, "nk1", keys=["conv_id", "turn_idx"])
    rows = {(r.conv_id, r.turn_idx): r.text for r in provider.read("nk1").collect()}
    assert rows == {("c1", None): "new", ("c1", 2): "keep"}


def test_merge_upsert_null_key_seq_guard(spark, provider):
    """seq_col path with a NULL key: newer source seq updates the NULL-key
    row; a stale seq leaves it untouched — and never duplicates."""
    tgt = spark.createDataFrame(
        [("c1", None, 5, "v5")], "conv_id string, turn_idx int, seq int, text string"
    )
    provider.replace(tgt, "nk2")
    newer = spark.createDataFrame(
        [("c1", None, 7, "v7")], "conv_id string, turn_idx int, seq int, text string"
    )
    provider.merge_upsert(newer, "nk2", keys=["conv_id", "turn_idx"], seq_col="seq")
    rows = provider.read("nk2").collect()
    assert len(rows) == 1 and rows[0].text == "v7" and rows[0].seq == 7
    stale = spark.createDataFrame(
        [("c1", None, 3, "v3")], "conv_id string, turn_idx int, seq int, text string"
    )
    provider.merge_upsert(stale, "nk2", keys=["conv_id", "turn_idx"], seq_col="seq")
    rows = provider.read("nk2").collect()
    assert len(rows) == 1 and rows[0].text == "v7" and rows[0].seq == 7


def test_merge_upsert_null_partition_value_scoped(spark, provider):
    """Partition-scoped COW with a NULL partition value in the source: the
    affected filter must include the default partition (isin alone never
    matches NULL), so the matched row updates instead of duplicating."""
    tgt = spark.createDataFrame(
        [("c1", 1, None, "old"), ("c2", 1, "h1", "other")],
        "conv_id string, turn_idx int, hour string, text string",
    )
    # lay the table out hive-partitioned so the scoped path (layout_ok) runs;
    # the NULL hour lands in hour=__HIVE_DEFAULT_PARTITION__
    tgt.write.mode("overwrite").partitionBy("hour").parquet(provider._ident("nk3"))
    src = spark.createDataFrame(
        [("c1", 1, None, "new")],
        "conv_id string, turn_idx int, hour string, text string",
    )
    provider.merge_upsert(src, "nk3", keys=["conv_id", "turn_idx"],
                          partition_col="hour")
    rows = {(r.conv_id, r.turn_idx): r.text for r in provider.read("nk3").collect()}
    assert rows == {("c1", 1): "new", ("c2", 1): "other"}
