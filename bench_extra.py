"""Per-query isolation bench (guide §1.4): time ANY registry query with the
noop sink, optionally dump its ``explain("formatted")`` plan, without
touching the frozen driver-facing ``bench.py``.

Usage:
  python bench_extra.py q1 q2 ...             # time named queries at $SPARK_GRAFT_SF_DIR
  python bench_extra.py --explain-dir plans/r06 --suffix before q1 ...
  python bench_extra.py --repeat 2 q1         # report min of N runs
  python bench_extra.py --list                # print registry names

Timings print one line per query (and a JSON map at the end) — cited from
OPTIMIZATION_r06.md; the driver never parses this file.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--list", action="store_true")
    ap.add_argument("--sf-dir", default=SF_DIR)
    args = ap.parse_args()

    from exposure_notifications_private_analytics_ingestion_spark import queries as q
    from exposure_notifications_private_analytics_ingestion_spark.session import get_spark

    reg: dict = {}
    for r in (q.registry(), q.retired_registry(), q.extended_registry(),
              q.approx_registry()):
        reg.update(r)
    if args.list:
        print("\n".join(reg))
        return

    spark = get_spark(app_name="enpa-bench-extra", cores=CPUS,
                      shuffle_partitions=CPUS)
    spark.read.parquet(f"{args.sf_dir}/events.parquet").count()  # warm FS/JVM

    out: dict[str, float] = {}
    for name in args.queries:
        fn, _sql = reg[name]
        df = fn(spark, args.sf_dir)
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(f"{args.explain_dir}/{name}_{args.suffix}.txt", "w") as f:
                f.write(plan)
        best = None
        for _ in range(args.repeat):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        spark.sparkContext.setJobDescription(None)
        if best is None:  # --repeat 0: plan capture only
            print(f"{name}: plan captured", flush=True)
            continue
        out[name] = round(best, 3)
        print(f"{name}: {out[name]} s", flush=True)
    print(json.dumps({"sf_dir": args.sf_dir, "cpus": CPUS, "timings": out}))
    spark.stop()


if __name__ == "__main__":
    main()
