"""Scale-step evidence (VERDICT r4 #5): run the flagship + the most
expensive registry queries at sf1 (10x the bench's sf0.1 input) and record
wall-time ratios in BENCH/bench_sf1.json.

The sf1 input is generated deterministically from the sf0.1 parquet by
10-way replication with per-replica isomorphic perturbations, so each
query's WORK scales like a real 10x corpus instead of a pathological one:

- integer keys are offset per replica (joins stay consistent, no key
  collisions across replicas);
- text columns are Caesar-shifted per replica (``F.translate`` — length,
  word shape, within-replica shingle/trigram structure all preserved;
  cross-replica n-gram overlap ~0, so dedup/fuzzy pair counts grow
  linearly, not quadratically);
- embeddings get a per-replica deterministic sign-flip mask (an orthogonal
  transform: norms and within-replica cosine geometry exact; cross-replica
  cosines ~random, so ANN/near-dup candidate sets scale linearly);
- dimension tables (region, nation) stay fixed, as in TPC-H scaling.

Interpretation: a scale-safe plan shows <=~10x wall growth on linear ops
and sub-linear growth on pruned/top-k ops; super-linear growth is a real
finding. Ratios are recorded per query with the anomaly line summarized in
BENCH/BASELINE.md.

Usage: python tools/bench_sf1.py [--factor 10] [--out BENCH/bench_sf1.json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

SF01 = "/root/testdata/sf0.1"

# the 10 most expensive driver-registry queries in the round-4 bench, by
# wall time (BENCH/bench_full.json) — the plans whose scale behavior matters
TOP_QUERIES = [
    "fuzzy_part_match",
    "near_dup_verified_components",
    "ivf_topk",
    "lsh_ann_topk",
    "cosine_near_dup_lsh",
    "batch_headers",
    "incremental_dedup",
    "repetition_stats",
    "minhash_lsh_pairs",
    "span_dedup_docs",
]

# Per-query expected growth class (VERDICT r5 #5): the anomaly check flags
# against EACH query's expected exponent, not one global 1.5x-factor bar —
# a genuinely O(n^1.3) op at 13x/10x must not hide behind a threshold meant
# for linear plans. ``max_ratio`` is the allowed sf1/sf0.1 wall ratio as a
# multiple of --factor.
#   pruned:  partition pruning / persisted index / fixed window — sub-linear,
#            allowed up to 1.0x factor
#   linear:  one pass + hash-aggs over the grown input — up to 1.5x factor
#   kn:      top-k search where query set AND corpus grow (k·n per cluster /
#            bucket with fixed cluster count in this generator) — up to
#            2.0x factor
EXPECTED = {
    "fuzzy_part_match": ("pruned", 1.0),   # distinct-name proxy + prefix cap
    "near_dup_verified_components": ("linear", 1.5),
    "ivf_topk": ("kn", 2.0),
    "lsh_ann_topk": ("kn", 2.0),
    "cosine_near_dup_lsh": ("kn", 2.0),
    "batch_headers": ("pruned", 1.0),      # fixed window + hour pruning
    "incremental_dedup": ("pruned", 1.0),  # signature-only corpus scan
    "repetition_stats": ("linear", 1.5),
    "minhash_lsh_pairs": ("linear", 1.5),
    "span_dedup_docs": ("linear", 1.5),
    "ingestion_e2e": ("pruned", 1.0),      # fixed window + hour pruning
}

LOWER = "abcdefghijklmnopqrstuvwxyz"
UPPER = LOWER.upper()

# (int-key column -> per-replica offset) per table; text columns shifted
KEYS = {
    "supplier": {"s_suppkey": 10**7},
    "part": {"p_partkey": 10**7},
    "customer": {"c_custkey": 10**7},
    "orders": {"o_orderkey": 10**8, "o_custkey": 10**7},
    "lineitem": {"l_orderkey": 10**8, "l_partkey": 10**7, "l_suppkey": 10**7},
    "events": {"event_id": 10**8, "user_id": 10**7},  # int32-safe: downstream plans cast ids
    "documents": {"doc_id": 10**7},
    "embeddings": {"vec_id": 10**7},
}
TEXT = {"part": ["p_name"], "documents": ["text"]}
COPY_AS_IS = ["region", "nation"]


def _shifted(r: int) -> tuple[str, str]:
    s = r % 26
    return (
        LOWER + UPPER,
        LOWER[s:] + LOWER[:s] + UPPER[s:] + UPPER[:s],
    )


def generate(spark, out_dir: str, factor: int) -> None:
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)
    for t in COPY_AS_IS:
        spark.read.parquet(f"{SF01}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/{t}.parquet")
    for t, offs in KEYS.items():
        base = spark.read.parquet(f"{SF01}/{t}.parquet")
        reps = []
        for r in range(factor):
            df = base
            for col, step in offs.items():
                df = df.withColumn(col, F.col(col) + F.lit(r * step))
            if r > 0:
                for col in TEXT.get(t, []):
                    m, repl = _shifted(r)
                    df = df.withColumn(col, F.translate(F.col(col), m, repl))
                if t == "embeddings":
                    # per-replica sign-flip mask: orthogonal, deterministic
                    df = df.withColumn(
                        "embedding",
                        F.transform(
                            "embedding",
                            lambda x, i: F.when(
                                ((i * 2654435761 + F.lit(r)) % 7) < 3, -x
                            ).otherwise(x),
                        ),
                    )
            reps.append(df)
        out = reps[0]
        for df in reps[1:]:
            out = out.unionAll(df)
        out.write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--out", default="BENCH/bench_sf1.json")
    ap.add_argument("--keep-dir", default=None,
                    help="reuse/keep the generated sf1 dir at this path")
    args = ap.parse_args()

    from exposure_notifications_private_analytics_ingestion_spark import queries as q
    from exposure_notifications_private_analytics_ingestion_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="bench-sf1", cores=cpus, shuffle_partitions=cpus)

    sf1_dir = args.keep_dir or tempfile.mkdtemp(prefix="enpa-sf1-")
    made_tmp = args.keep_dir is None
    if not os.path.exists(f"{sf1_dir}/documents.parquet"):
        t0 = time.time()
        generate(spark, sf1_dir, args.factor)
        gen_s = round(time.time() - t0, 1)
    else:
        gen_s = 0.0

    def _noop(df):
        df.write.format("noop").mode("overwrite").save()

    # warm the JVM once
    spark.read.parquet(f"{SF01}/events.parquet").count()

    reg = q.registry()
    rows = {}
    for name in TOP_QUERIES:
        fn = reg[name][0]
        t0 = time.time()
        _noop(fn(spark, SF01))
        base_s = time.time() - t0
        t0 = time.time()
        _noop(fn(spark, sf1_dir))
        big_s = time.time() - t0
        tag, mult = EXPECTED.get(name, ("linear", 1.5))
        rows[name] = {
            "sf0.1_sec": round(base_s, 3),
            "sf1_sec": round(big_s, 3),
            "ratio": round(big_s / base_s, 2),
            "expected": tag,
            "max_ratio": round(mult * args.factor, 1),
        }
        print(f"{name}: {base_s:.2f}s -> {big_s:.2f}s  ({big_s/base_s:.1f}x)")

    t0 = time.time()
    _noop(q.flagship(spark, SF01))
    base_s = time.time() - t0
    t0 = time.time()
    _noop(q.flagship(spark, sf1_dir))
    big_s = time.time() - t0
    tag, mult = EXPECTED["ingestion_e2e"]
    rows["ingestion_e2e"] = {
        "sf0.1_sec": round(base_s, 3),
        "sf1_sec": round(big_s, 3),
        "ratio": round(big_s / base_s, 2),
        "expected": tag,
        "max_ratio": round(mult * args.factor, 1),
    }
    print(f"ingestion_e2e: {base_s:.2f}s -> {big_s:.2f}s ({big_s/base_s:.1f}x)")

    # flag against each query's OWN expected-growth ceiling
    anomalies = sorted(
        (n for n, r in rows.items() if r["ratio"] > r["max_ratio"]),
        key=lambda n: -rows[n]["ratio"],
    )
    out = {
        "metric": f"wall-time ratio sf1/sf0.1 (factor {args.factor}; "
                  "<=~factor = linear, less = pruned/sub-linear)",
        "factor": args.factor,
        "cpus": cpus,
        "generation_sec": gen_s,
        "queries": rows,
        "superlinear": anomalies,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"superlinear": anomalies,
                      "worst": max((r["ratio"] for r in rows.values()),
                                   default=None)}))
    if made_tmp:
        shutil.rmtree(sf1_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
