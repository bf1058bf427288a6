"""Incremental hour-partition ingestion (plans/incremental.py): metadata-only
discovery, settlement against the data's max hour, per-window state
checkpointing with crash resume, and no-op idempotence."""

from __future__ import annotations

import json
import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from exposure_notifications_private_analytics_ingestion_spark.model.schema import TURNS_SCHEMA  # noqa: E402
from exposure_notifications_private_analytics_ingestion_spark.plans import incremental as inc  # noqa: E402
from exposure_notifications_private_analytics_ingestion_spark.plans.incremental import (  # noqa: E402
    discover_hours,
    plan_incremental,
    run_incremental,
)
from exposure_notifications_private_analytics_ingestion_spark.plans.ingestion import (  # noqa: E402
    IngestionOptions,
)
from exposure_notifications_private_analytics_ingestion_spark.sources import (  # noqa: E402
    generate_turns,
    write_turns_table,
)


@pytest.fixture()
def turns_table(spark, tmp_path):
    path = str(tmp_path / "turns")
    pdf = generate_turns(n_convs=150, seed=5, hours=4, dup_frac=0.0)
    write_turns_table(spark, pdf, path, partition_by_hour=True)
    return path


def _opts():
    return IngestionOptions(batch_size=50)


def test_discover_and_plan(spark, turns_table, tmp_path):
    state = str(tmp_path / "state.json")
    hours = discover_hours(spark, turns_table)
    assert len(hours) >= 4 and hours == sorted(hours)
    plan = plan_incremental(spark, turns_table, state, settle_hours=1)
    # newest hour withheld as unsettled, everything else pending
    assert plan.skipped_unsettled == [hours[-1]]
    assert plan.pending == hours[:-1]
    assert plan.already_processed == []


def test_run_checkpoint_and_catchup(spark, turns_table, tmp_path):
    state = str(tmp_path / "state.json")
    out = str(tmp_path / "out")
    done1 = run_incremental(spark, turns_table, out, state, _opts())
    hours = discover_hours(spark, turns_table)
    assert done1 == hours[:-1]
    st = json.load(open(state))
    assert sorted(st["processed"]) == done1
    assert all(v["packets_written"] > 0 for v in st["processed"].values())
    # output has one window partition per processed hour
    pk = spark.read.parquet(f"{out}/packets")
    wins = {r.window_start_s for r in pk.select("window_start_s").distinct().collect()}
    assert wins == {inc._hour_to_epoch(h) for h in done1}

    # immediate rerun: nothing to do
    assert run_incremental(spark, turns_table, out, state, _opts()) == []

    # a new hour of data arrives → exactly the newly settled hour is processed
    last_epoch = inc._hour_to_epoch(hours[-1])
    late = generate_turns(n_convs=40, seed=9, hours=1, dup_frac=0.0)
    import pandas as pd

    late["ts"] = late["ts"] + pd.to_timedelta(
        last_epoch + inc.HOUR_S - 1704067200, unit="s"
    )
    df = spark.createDataFrame(late, schema=TURNS_SCHEMA).withColumn(
        "ts_hour", F.date_format("ts", "yyyy-MM-dd-HH")
    )
    df.write.mode("append").partitionBy("ts_hour").parquet(turns_table)

    done2 = run_incremental(spark, turns_table, out, state, _opts())
    new_hours = discover_hours(spark, turns_table)
    assert done2 == [h for h in new_hours[:-1] if h not in set(done1)]
    assert hours[-1] in done2  # the previously-unsettled hour settled


def test_crash_resume(spark, turns_table, tmp_path, monkeypatch):
    """A failure mid-backlog loses nothing: completed windows are in state,
    the rerun picks up at the failed window."""
    state = str(tmp_path / "state.json")
    out = str(tmp_path / "out")
    real = inc.run_ingestion
    calls = []

    def boom(spark_, in_, out_, opts):
        calls.append(opts.window_start_s)
        if len(calls) == 2:
            raise RuntimeError("executor lost")
        return real(spark_, in_, out_, opts)

    monkeypatch.setattr(inc, "run_ingestion", boom)
    with pytest.raises(RuntimeError, match="executor lost"):
        run_incremental(spark, turns_table, out, state, _opts())
    st = json.load(open(state))
    assert len(st["processed"]) == 1  # only the completed window committed

    monkeypatch.setattr(inc, "run_ingestion", real)
    done = run_incremental(spark, turns_table, out, state, _opts())
    hours = discover_hours(spark, turns_table)
    assert sorted(json.load(open(state))["processed"]) == hours[:-1]
    assert done[0] == hours[1]  # resumed at the window that failed
