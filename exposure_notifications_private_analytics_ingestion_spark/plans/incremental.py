"""Incremental hour-partition ingestion: process only the windows that are
new AND settled since the last run.

The reference runs as scheduler-triggered per-window batch jobs — each
invocation gets ``--startTime``/``--duration`` and processes exactly one
window (``IngestionPipelineOptions.java:131-177``; the terraform deploy
wires a cron scheduler to it). This module is that operational loop as a
library: discover the input table's hour partitions through the Hadoop
FileSystem API, consult a committed state file, and run the (idempotent)
``run_ingestion`` once per unprocessed window, checkpointing state after
EVERY window so a crash resumes where it stopped instead of reprocessing
the backlog.

Settlement: the newest ``settle_hours`` hours present in the input are NOT
eligible — late events for those hours may still arrive (the batch analog
of a watermark; ``run_ingestion``'s ± grace scan handles stragglers that
land in neighbor partitions). Eligibility is judged against the MAX hour
present in the data, not wall clock, so replays and tests are
deterministic.

Crash safety / idempotence contract:
- state updates are atomic (tmp file + rename) and happen only AFTER a
  window's write completed;
- ``run_ingestion`` itself overwrites exactly its own window's partitions,
  so re-running a window that crashed mid-write replaces the partial
  output — no duplicates, no manual cleanup;
- re-running on an unchanged table is a no-op (empty plan).

At 10^12-turn scale this is the batch backfill / catch-up path beside the
always-on structured stream (``streaming/ingest_stream.py``): same core,
same output contract, driven by partition metadata instead of a
checkpointed file source.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from datetime import datetime, timezone

from pyspark.sql import SparkSession

from .compaction import _fs_and_path
from .ingestion import IngestionOptions, run_ingestion

HOUR_FMT = "%Y-%m-%d-%H"
HOUR_S = 3600


def _hour_to_epoch(hour: str) -> int:
    return int(
        datetime.strptime(hour, HOUR_FMT).replace(tzinfo=timezone.utc).timestamp()
    )


@dataclass(frozen=True)
class IncrementalPlan:
    """What a run would do: the settled-but-unprocessed hours, in order."""

    pending: list[str]
    skipped_unsettled: list[str]
    already_processed: list[str]


def discover_hours(spark: SparkSession, input_path: str) -> list[str]:
    """List the ``ts_hour=`` partition values of the input table — pure
    directory metadata, no data read, no Spark job."""
    fs, root = _fs_and_path(spark, input_path)
    hours = []
    for status in fs.listStatus(root):
        name = status.getPath().getName()
        if status.isDirectory() and name.startswith("ts_hour="):
            hours.append(name.split("=", 1)[1])
    return sorted(hours)


def load_state(state_path: str) -> dict:
    try:
        with open(state_path) as f:
            return json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        return {"processed": {}}


def _save_state(state_path: str, state: dict) -> None:
    tmp = state_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(state, f, indent=1, sort_keys=True)
    os.replace(tmp, state_path)  # atomic on POSIX


def plan_incremental(
    spark: SparkSession,
    input_path: str,
    state_path: str,
    settle_hours: int = 1,
) -> IncrementalPlan:
    """Compute the run plan without executing anything."""
    hours = discover_hours(spark, input_path)
    if not hours:
        return IncrementalPlan([], [], [])
    done = set(load_state(state_path)["processed"])
    cutoff = _hour_to_epoch(hours[-1]) - (settle_hours - 1) * HOUR_S
    pending, unsettled = [], []
    for h in hours:
        if h in done:
            continue
        (pending if _hour_to_epoch(h) < cutoff else unsettled).append(h)
    return IncrementalPlan(
        pending=pending,
        skipped_unsettled=unsettled,
        already_processed=sorted(done),
    )


def run_incremental(
    spark: SparkSession,
    input_path: str,
    output_root: str,
    state_path: str,
    opts: IngestionOptions | None = None,
    settle_hours: int = 1,
) -> list[str]:
    """Execute the plan: one ``run_ingestion`` window per pending hour
    (window_start = the hour, duration = 1h), state checkpointed after each.
    Returns the hours processed this run."""
    template = opts or IngestionOptions()
    plan = plan_incremental(spark, input_path, state_path, settle_hours)
    state = load_state(state_path)
    for hour in plan.pending:
        win = IngestionOptions(
            **{
                **template.__dict__,
                "window_start_s": _hour_to_epoch(hour),
                "duration_s": HOUR_S,
            }
        )
        stats = run_ingestion(spark, input_path, output_root, win)
        state["processed"][hour] = {
            "window_start_s": win.window_start_s,
            "packets_written": int(stats.get("packets_written", 0)),
        }
        _save_state(state_path, state)
    return plan.pending
