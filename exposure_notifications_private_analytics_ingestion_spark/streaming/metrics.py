"""Streaming metrics: the M2 counter surface (``model/DataShare.java:46-55``,
``pipeline/IngestionPipeline.java:140-155``) as a StreamingQueryListener.

Captures per-microbatch progress — input rows, processed rows/sec, state
rows, batch duration — into an in-memory list and an optional JSONL file.
Batch-close latency p95 (the driver's headline latency metric) is derived
from ``batchDuration`` across epochs.
"""

from __future__ import annotations

import json

from pyspark.sql.streaming import StreamingQueryListener


class MetricsListener(StreamingQueryListener):
    def __init__(self, jsonl_path: str | None = None):
        self.progress: list[dict] = []
        self.jsonl_path = jsonl_path

    def onQueryStarted(self, event):  # noqa: N802
        pass

    def onQueryProgress(self, event):  # noqa: N802
        p = event.progress
        rec = {
            "batch_id": p.batchId,
            "num_input_rows": p.numInputRows,
            "processed_rows_per_sec": p.processedRowsPerSecond,
            "batch_duration_ms": p.batchDuration,
            "state_rows": sum(
                s.numRowsTotal for s in (p.stateOperators or [])
            ),
            # rows the watermark silently discarded as too-late — the
            # streaming analog of the batch validator's drop counters; a
            # nonzero steady-state value means the watermark is tighter
            # than the source's actual lateness and data is being LOST
            "late_rows_dropped": sum(
                s.numRowsDroppedByWatermark for s in (p.stateOperators or [])
            ),
        }
        self.progress.append(rec)
        if self.jsonl_path:
            with open(self.jsonl_path, "a") as f:
                f.write(json.dumps(rec) + "\n")

    def onQueryTerminated(self, event):  # noqa: N802
        pass

    def late_rows_dropped(self) -> int:
        """Total watermark-discarded rows across observed microbatches."""
        return sum(r.get("late_rows_dropped", 0) for r in self.progress)

    def batch_close_p95_ms(self) -> float | None:
        ds = sorted(r["batch_duration_ms"] for r in self.progress if r["num_input_rows"])
        if not ds:
            return None
        return ds[min(len(ds) - 1, int(0.95 * len(ds)))]
