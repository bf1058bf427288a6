"""Two-cluster-size scaling evidence (BASELINE.md protocol): run the
identical ingestion job on the same generated input at local[N] and
local[4N], report throughput at both + scaling efficiency (T_4N/T_N)/4.

Each parallelism level runs in its own subprocess (fresh JVM) so executor
thread counts are honest. Writes BENCH/BASELINE.md and prints JSON.

Usage: python tools/scaling_bench.py [n_convs] [N]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, shutil, sys, time
sys.path.insert(0, {repo!r})
from exposure_notifications_private_analytics_ingestion_spark.session import get_spark
from exposure_notifications_private_analytics_ingestion_spark.model.schema import TURNS_SCHEMA
from exposure_notifications_private_analytics_ingestion_spark.plans.ingestion import IngestionOptions, run_ingestion
from exposure_notifications_private_analytics_ingestion_spark.streaming import StreamOptions, start_stream_ingestion

cores = {cores}
spark = get_spark(app_name=f"scaling-{{cores}}", cores=cores, shuffle_partitions=cores)
turns_path = {turns_path!r}
workdir = {workdir!r}

# warm-up scan (exclude JVM/file-cache noise from the measurement)
n_turns = spark.read.parquet(turns_path).count()

# measured leg 1: batch ingestion e2e
t0 = time.time()
run_ingestion(spark, turns_path, f"{{workdir}}/out-batch-{{cores}}",
              IngestionOptions(window_start_s=1704067200, duration_s=12*3600,
                               batch_size=1000))
batch_s = time.time() - t0

# measured leg 2: streaming CEP ingestion e2e
t0 = time.time()
q = start_stream_ingestion(spark, turns_path, f"{{workdir}}/out-stream-{{cores}}",
                           f"{{workdir}}/ck-{{cores}}",
                           StreamOptions(batch_size=1000, window_s=3600,
                                         watermark="1 hour"))
q.awaitTermination(900)
stream_s = time.time() - t0

print(json.dumps({{"cores": cores, "n_turns": n_turns,
                   "batch_s": round(batch_s, 2),
                   "batch_tps": round(n_turns / batch_s, 1),
                   "stream_s": round(stream_s, 2),
                   "stream_tps": round(n_turns / stream_s, 1)}}))
"""


def run_level(cores: int, turns_path: str, workdir: str) -> dict:
    code = WORKER.format(repo=REPO, cores=cores, turns_path=turns_path, workdir=workdir)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=1800,
        cwd=REPO,
    )
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(f"worker[{cores}] failed:\n{out.stderr[-3000:]}")
    return json.loads(lines[-1])


def main():
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 6000
    n_small = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    # generate once, shared by both levels
    import numpy  # noqa: F401  (import check before heavy work)

    gen_code = f"""
import sys; sys.path.insert(0, {REPO!r})
from exposure_notifications_private_analytics_ingestion_spark.session import get_spark
from exposure_notifications_private_analytics_ingestion_spark.model.schema import TURNS_SCHEMA
from exposure_notifications_private_analytics_ingestion_spark.sources import generate_turns
spark = get_spark(cores=8)
pdf = generate_turns(n_convs={n_convs}, seed=42, hours=8, dup_frac=0.02)
spark.createDataFrame(pdf, schema=TURNS_SCHEMA).repartition(64).write.mode("overwrite").parquet(sys.argv[1])
print(len(pdf))
"""
    workdir = tempfile.mkdtemp(prefix="enpa-scaling-")
    turns_path = f"{workdir}/turns"
    gen = subprocess.run(
        [sys.executable, "-c", gen_code, turns_path],
        capture_output=True, text=True, timeout=900, cwd=REPO,
    )
    print(f"generated turns: {gen.stdout.strip().splitlines()[-1]}", file=sys.stderr)

    small = run_level(n_small, turns_path, workdir)
    big = run_level(n_small * 4, turns_path, workdir)

    eff_batch = round((big["batch_tps"] / small["batch_tps"]) / 4, 3)
    eff_stream = round((big["stream_tps"] / small["stream_tps"]) / 4, 3)
    result = {
        "N": small, "4N": big,
        "scaling_efficiency_batch": eff_batch,
        "scaling_efficiency_stream": eff_stream,
    }
    print(json.dumps(result, indent=2))

    md = f"""# BENCH/BASELINE — two-cluster-size scaling evidence

Protocol (BASELINE.md): the identical ingestion job on the same generated
transcript input at two parallelism levels — local[{n_small}] (N) and
local[{n_small * 4}] (4N) — fresh JVM per level, measured after a warm-up scan.
Input: {small["n_turns"]} turns (seeded generator, skewed conv sizes, 2% dups).

| leg | local[{n_small}] (N) | local[{n_small * 4}] (4N) | efficiency (T_4N/T_N)/4 |
| --- | --- | --- | --- |
| batch ingestion e2e | {small["batch_tps"]} turns/s ({small["batch_s"]} s) | {big["batch_tps"]} turns/s ({big["batch_s"]} s) | **{eff_batch}** |
| streaming CEP e2e | {small["stream_tps"]} turns/s ({small["stream_s"]} s) | {big["stream_tps"]} turns/s ({big["stream_s"]} s) | **{eff_stream}** |

Target (north_rule): efficiency ≥ 0.8 from N → 4N.

Caveats: single-host local mode shares one disk + page cache, so shuffle and
sink IO do not scale with cores the way a real 4× executor fleet's disks and
NICs would; these numbers are a lower bound on cluster scaling for the
CPU-bound legs and noisy for the IO-bound tail.
"""
    os.makedirs(f"{REPO}/BENCH", exist_ok=True)
    with open(f"{REPO}/BENCH/BASELINE.md", "w") as f:
        f.write(md)
    print(f"wrote {REPO}/BENCH/BASELINE.md", file=sys.stderr)


if __name__ == "__main__":
    main()
