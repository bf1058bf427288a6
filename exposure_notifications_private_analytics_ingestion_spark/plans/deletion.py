"""DEL1 — the deletion/retention pipeline.

Reference: ``DeletionPipeline`` re-scans 2 windows back with name-only
projection and issues rate-limited batched deletes
(``pipeline/DeletionPipeline.java:40-68``, lookback ``:47-49``, batch size 100
— ``IngestionPipelineOptions.java:179-184``).

Spark shape: on Iceberg this is ``DELETE FROM turns WHERE ts < cutoff`` (+
``expire_snapshots``); on the parquet stand-in it's a partition-level prune —
drop whole hour partitions older than the cutoff, which is metadata-only and
exactly what the hourly-collection deletes amount to. Name-only projection ≡
column pruning (reads only ``ts_hour`` from partition metadata, zero data IO).
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def expired_turns(df: DataFrame, cutoff_s: int, ts_col: str = "ts") -> DataFrame:
    """Rows the retention job would delete (projection-pushed: only the key
    columns + ts are read)."""
    key = [c for c in ("conv_id", "turn_idx") if c in df.columns] or df.columns[:1]
    return df.select(*key, ts_col).filter(
        F.expr(f"unix_micros({ts_col}) div 1000") < cutoff_s * 1000
    )


def run_deletion(
    spark: SparkSession,
    table_path: str,
    window_start_s: int,
    duration_s: int = 43200,
    lookback_windows: int = 2,
) -> list[str]:
    """Delete hour partitions fully older than start − lookback·duration
    (DeletionPipeline.java:47-49 semantics). Returns deleted partition names."""
    from datetime import datetime, timezone

    cutoff_s = window_start_s - lookback_windows * duration_s
    cutoff = datetime.fromtimestamp(cutoff_s, tz=timezone.utc).strftime("%Y-%m-%d-%H")
    root = Path(table_path)
    deleted = []
    for part in sorted(root.glob("ts_hour=*")):
        hour = part.name.split("=", 1)[1]
        if hour < cutoff:
            shutil.rmtree(part)
            deleted.append(hour)
    return deleted
