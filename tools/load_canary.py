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

Round-4 addendum: CPU health is NOT sufficient. A window was observed
(2026-08-17 ~19:00) where this integer kernel held 0.95+ while the
streaming job ran 2.4× slower than its reference window ON OLD AND NEW
CODE ALIKE — the degradation was in the I/O path (state store + shuffle +
parquet all hit /tmp). The ``--io`` leg measures sustained write+read
bandwidth against a reference floor (``--io-floor`` MB/s) so those
windows are rejected too. Bench/scaling records should only be taken when
BOTH verdicts are healthy.

Usage: python tools/load_canary.py [--cores 16] [--secs 60] [--hold 0.85]
                                   [--io] [--io-mb 1024] [--io-floor 400]
"""

from __future__ import annotations

import argparse
import multiprocessing as mp
import os
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


def io_leg(mb: int, path: str = "/tmp") -> float:
    """Sustained write+fsync+read MB/s on the filesystem the engine's
    shuffle/state/output actually use. O_DIRECT isn't portable; the fsync
    plus a fresh read of more data than fits the touched cache window gives
    a serviceable sustained-bandwidth proxy."""
    fn = os.path.join(path, f".canary-io-{os.getpid()}")
    blk = b"\xa5" * (1 << 20)
    t0 = time.time()
    fd = os.open(fn, os.O_WRONLY | os.O_CREAT | os.O_TRUNC)
    try:
        for _ in range(mb):
            os.write(fd, blk)
        os.fsync(fd)
    finally:
        os.close(fd)
    read = 0
    with open(fn, "rb", buffering=0) as f:
        while True:
            b = f.read(1 << 20)
            if not b:
                break
            read += len(b)
    os.unlink(fn)
    return (mb + read / (1 << 20)) / (time.time() - t0)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--secs", type=float, default=60.0)
    ap.add_argument("--hold", type=float, default=0.85)
    ap.add_argument("--io", action="store_true",
                    help="also run the I/O bandwidth leg")
    ap.add_argument("--io-mb", type=int, default=1024)
    ap.add_argument("--io-floor", type=float, default=400.0,
                    help="minimum healthy sustained MB/s (write+read)")
    a = ap.parse_args()

    r1 = run_leg(a.cores, a.secs)
    r2 = run_leg(a.cores, a.secs)
    ratio = r2 / r1
    verdict = "HEALTHY" if ratio >= a.hold else "THROTTLED"
    io_part = ""
    if a.io:
        bw = io_leg(a.io_mb)
        io_verdict = "HEALTHY" if bw >= a.io_floor else "IO_DEGRADED"
        io_part = f", \"io_mb_per_s\": {bw:.0f}, \"io_verdict\": \"{io_verdict}\""
        if io_verdict != "HEALTHY":
            verdict = "IO_DEGRADED"
    print(
        f"CANARY {{\"cores\": {a.cores}, \"secs\": {a.secs}, "
        f"\"rate1\": {r1:.0f}, \"rate2\": {r2:.0f}, "
        f"\"hold_ratio\": {ratio:.3f}{io_part}, \"verdict\": \"{verdict}\"}}"
    )
    return 0 if verdict == "HEALTHY" else 1


if __name__ == "__main__":
    raise SystemExit(main())
