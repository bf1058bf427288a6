"""Sustained-load canary: decide whether THIS measurement window can
express multi-core scaling before burning an hour measuring it.

Short CPU probes (cpu_ceiling.py, ~1 s tasks) cannot detect the host's
burst-credit throttle — it only engages under SUSTAINED multi-core load
(observed round 3: single 4-core executors at full speed while concurrent
16-core fleet legs collapsed 4-15×). This tool runs the same pure-CPU
kernel for ``--secs`` seconds at ``--cores`` parallelism TWICE and
compares throughput: a healthy window holds ≥ ``--hold`` of the first
run's rate in the second. Exit 0 = proceed with scaling measurement,
exit 1 = the window is throttled; do not measure scaling now.

Usage: python tools/load_canary.py [--cores 16] [--secs 60] [--hold 0.85]
"""

from __future__ import annotations

import argparse
import multiprocessing as mp
import time


def _burn(stop_at: float, out):
    # integer-heavy kernel, no shared state, no IO
    acc, n = 1, 0
    while time.time() < stop_at:
        for _ in range(10_000):
            acc = (acc * 1103515245 + 12345) % (1 << 31)
        n += 1
    out.put(n)


def run_leg(cores: int, secs: float) -> float:
    q = mp.Queue()
    stop_at = time.time() + secs
    procs = [mp.Process(target=_burn, args=(stop_at, q)) for _ in range(cores)]
    t0 = time.time()
    for p in procs:
        p.start()
    total = sum(q.get() for _ in procs)
    for p in procs:
        p.join()
    return total / (time.time() - t0)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--secs", type=float, default=60.0)
    ap.add_argument("--hold", type=float, default=0.85)
    a = ap.parse_args()

    r1 = run_leg(a.cores, a.secs)
    r2 = run_leg(a.cores, a.secs)
    ratio = r2 / r1
    verdict = "HEALTHY" if ratio >= a.hold else "THROTTLED"
    print(
        f"CANARY {{\"cores\": {a.cores}, \"secs\": {a.secs}, "
        f"\"rate1\": {r1:.0f}, \"rate2\": {r2:.0f}, "
        f"\"hold_ratio\": {ratio:.3f}, \"verdict\": \"{verdict}\"}}"
    )
    return 0 if verdict == "HEALTHY" else 1


if __name__ == "__main__":
    raise SystemExit(main())
