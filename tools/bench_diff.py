"""Compare two bench records (BENCH/bench_full.json) query by query.

Usage:
  python tools/bench_diff.py                      # working tree vs HEAD~1's copy
  python tools/bench_diff.py old.json             # working tree vs a file
  python tools/bench_diff.py old.json new.json    # two files

Prints per-query wall-time ratios (new/old) sorted worst-first, the
geometric-mean ratio over common queries, and flags regressions beyond
THRESHOLD. Remember the host caveat (BENCH/BASELINE.md): this VM's per-core
speed swings between windows — confirm any flagged regression with
tools/load_canary.py before believing it, and only compare records taken in
canary-HEALTHY windows.
"""

from __future__ import annotations

import json
import math
import subprocess
import sys

THRESHOLD = 1.3  # new/old ratio above this is flagged


def _load(ref: str) -> dict:
    if ref.endswith(".json"):
        with open(ref) as f:
            return json.load(f)
    out = subprocess.run(
        ["git", "show", f"{ref}:BENCH/bench_full.json"],
        capture_output=True,
        text=True,
        check=True,
    )
    return json.loads(out.stdout)


def main() -> int:
    args = sys.argv[1:]
    if len(args) == 2:
        old, new = _load(args[0]), _load(args[1])
    elif len(args) == 1:
        old, new = _load(args[0]), _load("BENCH/bench_full.json")
    else:
        old, new = _load("HEAD~1"), _load("BENCH/bench_full.json")

    oq, nq = old["queries"], new["queries"]
    common = sorted(set(oq) & set(nq), key=lambda k: nq[k] / max(oq[k], 1e-9),
                    reverse=True)
    if not common:
        print("no common queries")
        return 1
    flagged = []
    print(f"{'query':40s} {'old':>8s} {'new':>8s} {'ratio':>7s}")
    for k in common:
        r = nq[k] / max(oq[k], 1e-9)
        mark = " <-- REGRESSION" if r > THRESHOLD else ""
        if mark:
            flagged.append(k)
        print(f"{k:40s} {oq[k]:8.2f} {nq[k]:8.2f} {r:7.2f}{mark}")
    gm = math.exp(sum(math.log(nq[k] / max(oq[k], 1e-9)) for k in common) / len(common))
    print(f"\ngeomean ratio over {len(common)} common queries: {gm:.3f} "
          f"({'faster' if gm < 1 else 'slower'})")
    print(f"flagged >{THRESHOLD}x: {flagged or 'none'}")
    print("caveat: confirm flags with tools/load_canary.py (host drift)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
