"""One-variable sweep for the 32-core streaming collapse: each config runs
the bucketed CEP job on the 9.6M-turn input in a fresh JVM and reports wall,
tps, per-batch timings, and JVM GC totals.

Usage: python tools/stream_sweep.py <config_name> [cores]
"""

from __future__ import annotations

import json
import shutil
import sys
import time

REPO = "/root/repo"
sys.path.insert(0, REPO)

from exposure_notifications_private_analytics_ingestion_spark.session import get_spark  # noqa: E402
from exposure_notifications_private_analytics_ingestion_spark.streaming import (  # noqa: E402
    StreamOptions,
    start_stream_ingestion,
)

WORKDIR = "/tmp/enpa-scaling4"

CONFIGS = {
    "base": {},
    "rocksdb_changelog": {
        "rocksdb": True,
        "conf": {
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": "true",
        },
    },
    "retain1": {
        "conf": {"spark.sql.streaming.maxBatchesToRetainInMemory": "1"}
    },
    "shuffle32": {"shuffle": 32},
    "shuffle128": {"shuffle": 128},
    "bucket2048": {"bucket_by": 2048},
    "unsafe_off": {
        "conf": {"spark.sql.streaming.stateStore.formatValidation.enabled": "false"}
    },
    "combo": {
        "bucket_by": 2048, "shuffle": 32,
        "conf": {"spark.sql.streaming.maxBatchesToRetainInMemory": "1"},
    },
    "combo16": {
        "bucket_by": 2048, "shuffle": 16,
        "conf": {"spark.sql.streaming.maxBatchesToRetainInMemory": "1"},
    },
    "combo1024": {
        "bucket_by": 1024, "shuffle": 32,
        "conf": {"spark.sql.streaming.maxBatchesToRetainInMemory": "1"},
    },
    # storage-isolated: sink output + checkpoint on tmpfs (each executor of a
    # real 4x cluster brings its own disks); input stays on the data disk
    "combo1024_tmpfs": {
        "bucket_by": 1024, "shuffle": 32, "out_root": "/dev/shm/enpa-sweep",
        "conf": {"spark.sql.streaming.maxBatchesToRetainInMemory": "1"},
    },
    "combo1024_noop": {
        "bucket_by": 1024, "shuffle": 32, "noop_sink": True,
        "conf": {"spark.sql.streaming.maxBatchesToRetainInMemory": "1"},
    },
    "combo1024_zstd": {
        "bucket_by": 1024, "shuffle": 32,
        "conf": {"spark.sql.streaming.maxBatchesToRetainInMemory": "1",
                 "spark.sql.parquet.compression.codec": "zstd"},
    },
}


def _noop_sink_factory(output_root):
    from pyspark.sql import functions as F

    def sink(batch_df, epoch_id):
        spark = batch_df.sparkSession
        n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
        closed = batch_df.repartition(n_part, "batch_id").persist()
        closed.count()
        closed.unpersist()

    return sink


def gc_ms(spark):
    beans = spark.sparkContext._jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
    total = 0
    for i in range(beans.size()):
        total += beans.get(i).getCollectionTime()
    return total


def main():
    name = sys.argv[1]
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    cfg = CONFIGS[name]
    if cfg.get("noop_sink"):
        import exposure_notifications_private_analytics_ingestion_spark.streaming.sink as _sm
        import exposure_notifications_private_analytics_ingestion_spark.streaming.ingest_stream  # noqa
        _sm.make_epoch_sink = _noop_sink_factory
    spark = get_spark(
        app_name=f"sweep-{name}",
        cores=cores,
        shuffle_partitions=cfg.get("shuffle", 64),
        extra_conf=cfg.get("conf"),
    )
    turns = f"{WORKDIR}/turns"
    warm = spark.read.parquet(turns)
    warm.write.format("noop").mode("overwrite").save()
    n = warm.count()
    root = cfg.get("out_root", WORKDIR)
    import os as _os
    _os.makedirs(root, exist_ok=True)
    out, ck = f"{root}/sw-out-{name}-{cores}", f"{root}/sw-ck-{name}-{cores}"
    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(ck, ignore_errors=True)
    g0 = gc_ms(spark)
    t0 = time.time()
    q = start_stream_ingestion(
        spark, turns, out, ck,
        StreamOptions(batch_size=5000, window_s=6 * 3600, watermark="1 hour",
                      bucket_by=cfg.get("bucket_by", 8192)),
        rocksdb_state=cfg.get("rocksdb", False),
    )
    q.awaitTermination(3600)
    wall = time.time() - t0
    g1 = gc_ms(spark)
    batches = []
    for p in q.recentProgress:
        st = (p.get("stateOperators") or [{}])[0]
        batches.append({
            "id": p.get("batchId"),
            "trigger": (p.get("durationMs") or {}).get("triggerExecution"),
            "upd": st.get("allUpdatesTimeMs"),
            "commit": st.get("commitTimeMs"),
        })
    print("SWEEP " + json.dumps({
        "name": name, "cores": cores, "wall": round(wall, 2),
        "tps": round(n / wall, 1), "gc_ms": g1 - g0, "batches": batches,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
