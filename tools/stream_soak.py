"""Continuous-mode soak: files arrive in waves while the CEP stream runs on a
processing-time trigger; reports sustained throughput and batch-close latency
p95 (the BASELINE.json latency metric).

Batch-close latency here = micro-batch duration from the engine's own
progress events (time from trigger start to sink commit for each epoch that
closed batches) — the driver-facing definition of "how long after its window
can a batch be read downstream".

Usage: python tools/stream_soak.py [n_convs_per_wave] [n_waves] [cores] [bucket_by] [p95_budget_ms]

With a p95 budget the tool is a REGRESSION GATE: exit code 1 when the
measured batch-close p95 exceeds the budget. Documented budgets at 4k-conv
waves / bucket_by=256: 6000 ms at 32 cores (measured p95 ~3.9 s over 23
data epochs), 9000 ms at 8 cores (measured ~7.6 s) — ~1.5-2x headroom for
host noise. Use ≥~25 waves: with fewer data epochs the p95 index collapses
onto the max, i.e. the one JIT-warm-up epoch, which a long-running stream
never re-pays.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")


def main():
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    n_waves = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    cores = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    bucket_by = int(sys.argv[4]) if len(sys.argv) > 4 else 256
    p95_budget = int(sys.argv[5]) if len(sys.argv) > 5 else None

    from exposure_notifications_private_analytics_ingestion_spark.model.schema import (
        TURNS_SCHEMA,
    )
    from exposure_notifications_private_analytics_ingestion_spark.session import get_spark
    from exposure_notifications_private_analytics_ingestion_spark.sources import (
        generate_turns,
    )
    from exposure_notifications_private_analytics_ingestion_spark.streaming import (
        MetricsListener,
        StreamOptions,
        start_stream_ingestion,
    )

    spark = get_spark(app_name="soak", cores=cores, shuffle_partitions=32,
                  extra_conf={"spark.sql.streaming.maxBatchesToRetainInMemory": "1"})
    ml = MetricsListener()
    spark.streams.addListener(ml)

    root = tempfile.mkdtemp(prefix="enpa-soak-")
    inp = f"{root}/turns"

    # pre-generate the waves; each wave advances event time by one hour so
    # watermarks keep closing earlier windows while new data arrives
    waves = []
    for i in range(n_waves):
        pdf = generate_turns(n_convs=n_convs, seed=100 + i, hours=1, dup_frac=0.02)
        import pandas as pd

        pdf["ts"] = pdf["ts"] + pd.Timedelta(hours=i)
        waves.append(pdf)

    # seed wave 0 so the source has a schema
    spark.createDataFrame(waves[0], schema=TURNS_SCHEMA).write.mode(
        "overwrite"
    ).parquet(inp)

    q = start_stream_ingestion(
        spark,
        inp,
        f"{root}/out",
        f"{root}/ck",
        StreamOptions(batch_size=1000, window_s=3600, watermark="30 minutes",
                      bucket_by=bucket_by or None),
        available_now=False,
        rocksdb_state=False,
    )
    t0 = time.time()
    total = len(waves[0])
    try:
        for i, pdf in enumerate(waves[1:], start=1):
            spark.createDataFrame(pdf, schema=TURNS_SCHEMA).write.mode(
                "append"
            ).parquet(inp)
            total += len(pdf)
            time.sleep(3)
        # drain
        deadline = time.time() + 120
        while time.time() < deadline:
            p = q.lastProgress
            if p and p["numInputRows"] == 0 and len(ml.progress) > n_waves:
                break
            time.sleep(2)
    finally:
        q.stop()
    wall = time.time() - t0

    data_epochs = [r for r in ml.progress if r["num_input_rows"] > 0]
    durations = sorted(r["batch_duration_ms"] for r in data_epochs)
    p95 = durations[min(len(durations) - 1, int(0.95 * len(durations)))] if durations else None
    p50 = durations[len(durations) // 2] if durations else None
    busy_s = sum(r["batch_duration_ms"] for r in data_epochs) / 1000
    out = {
        "metric": "streaming soak: sustained turns/sec + batch-close latency",
        "turns_ingested": total,
        "wall_sec": round(wall, 2),
        "sustained_turns_per_sec": round(total / wall, 1),  # arrival-throttled
        "processing_turns_per_sec": round(total / busy_s, 1) if busy_s else None,
        "epochs": len(ml.progress),
        "data_epochs": len(data_epochs),
        "batch_close_p50_ms": p50,
        "batch_close_p95_ms": p95,
        "max_state_rows": max((r["state_rows"] for r in ml.progress), default=0),
    }
    out["cores"] = cores
    out["bucket_by"] = bucket_by
    out["p95_budget_ms"] = p95_budget
    print(json.dumps(out))
    shutil.rmtree(root, ignore_errors=True)
    if p95_budget is not None and p95 is not None and p95 > p95_budget:
        print(f"REGRESSION: batch-close p95 {p95} ms > budget {p95_budget} ms",
              file=sys.stderr)
        raise SystemExit(1)


if __name__ == "__main__":
    main()
