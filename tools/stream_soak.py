"""Continuous-mode soak: files arrive in waves while the CEP stream runs on a
processing-time trigger; reports sustained throughput and batch-close latency
p95 (the BASELINE.json latency metric).

Batch-close latency here = micro-batch duration from the engine's own
progress events (time from trigger start to sink commit for each epoch that
closed batches) — the driver-facing definition of "how long after its window
can a batch be read downstream".

Usage: python tools/stream_soak.py [n_convs_per_wave] [n_waves]
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

    spark = get_spark(app_name="soak", cores=32, shuffle_partitions=64)
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
        StreamOptions(batch_size=1000, window_s=3600, watermark="30 minutes"),
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
    print(json.dumps(out))
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
