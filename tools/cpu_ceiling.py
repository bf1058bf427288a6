"""Host CPU scaling envelope: measures per-core throughput of pure-CPU
Python work (no Spark, no shared state, no IO) at increasing active-core
counts. On shared/virtualized hosts per-core speed DROPS as more cores go
active (all-core turbo / hypervisor contention); the ratio
``per_task(N) / per_task(4N)`` is the hard ceiling any 4×-parallelism
efficiency measurement can reach on this machine, before a single line of
engine code runs. The scaling protocol reports this envelope next to the
measured efficiencies so the reader can separate engine behavior from host
physics.

Usage: python tools/cpu_ceiling.py [reps]   → one JSON line
"""

from __future__ import annotations

import hashlib
import json
import multiprocessing as mp
import sys
import time


def _work(_):
    t0 = time.time()
    h = b"x"
    for _ in range(1_200_000):
        h = hashlib.md5(h).digest()
    return time.time() - t0


def measure(nproc: int, reps: int) -> float:
    """Median per-task seconds with nproc cores busy (2 waves per rep)."""
    meds = []
    with mp.Pool(nproc) as p:
        for _ in range(reps):
            times = sorted(p.map(_work, range(nproc * 2)))
            meds.append(times[len(times) // 2])
    meds.sort()
    return meds[len(meds) // 2]


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    per_task = {n: round(measure(n, reps), 4) for n in (2, 4, 8, 16, 32)}
    out = {
        "per_task_sec": per_task,
        "ceiling_4_to_16": round(per_task[4] / per_task[16], 3),
        "ceiling_8_to_32": round(per_task[8] / per_task[32], 3),
    }
    print("CEILING " + json.dumps(out))


if __name__ == "__main__":
    main()
