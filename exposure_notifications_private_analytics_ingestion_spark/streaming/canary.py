"""Shared streaming-window canary: one miniature of the steady-state job,
one floor, used by BOTH ``tools/stream_canary.py`` (the gate) and
``bench.py`` (the per-run window classifier) so the calibration-coupled
engine options and threshold cannot drift between them.

Why a streaming-job canary at all: round 4 found host windows where the
integer-CPU canary and sequential-I/O probes were healthy while the real
streaming job ran 2.4× below its reference rate on old and new code alike
(BENCH/BASELINE.md round-4 addendum). Only a small run of the streaming job
itself classifies a window for streaming measurements.

The floor is calibrated for the STARTUP-INCLUSIVE rate of this exact
configuration: healthy windows land ~55k turns/s, degraded windows measured
9-21k — 2.6× separation around the 40k floor. Retune the floor HERE and
both consumers follow.
"""

from __future__ import annotations

import time

from pyspark.sql import SparkSession

STREAM_CANARY_FLOOR = 40000.0

# the steady-job options the floor was calibrated against — change these and
# the floor must be re-measured (tools/stream_canary.py --floor to probe)
_CANARY_OPTS = dict(batch_size=5000, window_s=7200, watermark="1 hour",
                    bucket_by=4096)


def canary_tps(
    spark: SparkSession, workdir: str, n_convs: int = 15000, width: int = 32
) -> tuple[int, float]:
    """Run the miniature steady job under ``workdir``; returns
    (n_turns, startup-inclusive turns/s). Caller owns ``workdir`` cleanup."""
    from ..model.schema import TURNS_SCHEMA
    from ..sources import generate_turns
    from . import StreamOptions, start_stream_ingestion

    pdf = generate_turns(n_convs=n_convs, seed=7, hours=6, dup_frac=0.02)
    spark.createDataFrame(pdf, schema=TURNS_SCHEMA).repartition(width).write.mode(
        "overwrite"
    ).parquet(f"{workdir}/canary-t")
    t0 = time.time()
    q = start_stream_ingestion(
        spark,
        f"{workdir}/canary-t",
        f"{workdir}/canary-o",
        f"{workdir}/canary-c",
        StreamOptions(**_CANARY_OPTS),
    )
    finished = q.awaitTermination(600)
    if not finished:
        # pathologically degraded window: stop the stream so it cannot keep
        # competing for cores during the measurements this canary gates, and
        # report a rate that cannot pass the floor instead of pretending all
        # turns completed inside the timeout
        q.stop()
        q.awaitTermination(60)
        return len(pdf), 0.0
    return len(pdf), len(pdf) / (time.time() - t0)


def classify(rate: float, floor: float = STREAM_CANARY_FLOOR) -> str:
    return "HEALTHY" if rate >= floor else "DEGRADED"
