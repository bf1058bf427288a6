"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The headline ``value`` is wall-seconds of the flagship end-to-end ingestion
(validate → dedup → window → batch → split → headers) over the sf events
stream; ``queries`` carries per-query seconds including a streaming-CEP
throughput run (turns/sec reported separately in ``extra``).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _noop_write(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    from exposure_notifications_private_analytics_ingestion_spark import queries as q
    from exposure_notifications_private_analytics_ingestion_spark.session import get_spark

    spark = get_spark(app_name="enpa-bench", cores=CPUS, shuffle_partitions=CPUS)
    sf = SF_DIR.rstrip("/").split("sf")[-1]

    timings: dict[str, float] = {}

    def bench(name, fn):
        t0 = time.time()
        _noop_write(fn(spark, SF_DIR))
        timings[name] = round(time.time() - t0, 3)

    # warm the JVM + file cache once
    spark.read.parquet(f"{SF_DIR}/events.parquet").count()

    reg = q.registry()
    headline = [
        "validate_filter",
        "dedup_exact",
        "window_filter",
        "tumbling_window_counts",
        "sliding_window_counts",
        "session_windows",
        "group_batches",
        "packet_split",
        "batch_headers",
        "deletion_retention",
        "hot_key_salted_agg",
        "lineitem_pricing_summary",
        "token_count",
        "quality_score",
        "lang_id",
        "fingerprint",
        "ngram_doc_frequency",
        "corpus_stats_by_lang",
        "length_percentiles",
        "exact_dedup_docs",
        "minhash_lsh_pairs",
        "simhash_docs",
        "ngram_jaccard_pairs",
        "near_dup_components",
        "near_dup_verified_components",
        "revenue_by_nation",
        "part_revenue_by_region",
        "top_spenders_per_type",
        "distinct_users_hourly",
        "cosine_near_dup_pairs",
        "cosine_near_dup_lsh",
        "ivf_topk",
        "lsh_ann_topk",
        "multimodal_features",
    ]
    for name in headline:
        bench(name, reg[name][0])

    # flagship e2e (the headline value)
    t0 = time.time()
    _noop_write(q.flagship(spark, SF_DIR))
    e2e = round(time.time() - t0, 3)
    timings["ingestion_e2e"] = e2e

    # streaming CEP throughput: generated transcript stream through the
    # stateful assembler + exactly-once sink
    from exposure_notifications_private_analytics_ingestion_spark.model.schema import (
        TURNS_SCHEMA,
    )
    from exposure_notifications_private_analytics_ingestion_spark.sources import (
        generate_turns,
    )
    from exposure_notifications_private_analytics_ingestion_spark.streaming import (
        MetricsListener,
        StreamOptions,
        start_stream_ingestion,
    )

    ml = MetricsListener()
    spark.streams.addListener(ml)
    tmp = tempfile.mkdtemp(prefix="enpa-bench-")
    try:
        # large enough that steady-state throughput dominates the stream's
        # fixed startup/microbatch overhead (~190k turns)
        pdf = generate_turns(n_convs=16000, seed=42, hours=4, dup_frac=0.02)
        n_turns = len(pdf)
        spark.createDataFrame(pdf, schema=TURNS_SCHEMA).repartition(CPUS).write.mode(
            "overwrite"
        ).parquet(f"{tmp}/turns")
        t0 = time.time()
        sq = start_stream_ingestion(
            spark,
            f"{tmp}/turns",
            f"{tmp}/out",
            f"{tmp}/ck",
            StreamOptions(batch_size=1000, window_s=3600, watermark="1 hour"),
        )
        sq.awaitTermination(600)
        stream_s = time.time() - t0
        timings["streaming_ingest"] = round(stream_s, 3)
        turns_per_sec = round(n_turns / stream_s, 1)
        p95 = ml.batch_close_p95_ms()
    finally:
        # The Python listener must be deregistered before the JVM shuts down,
        # otherwise AsyncEventQueue calls back into a closed py4j gateway at
        # teardown and sprays a stack trace over stdout/stderr (corrupting the
        # driver's JSON parse of our output line).
        spark.streams.removeListener(ml)
        shutil.rmtree(tmp, ignore_errors=True)

    out = {
        "metric": "flagship ingestion e2e wall time at sf (lower is better)",
        "value": e2e,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "extra": {
            "streaming_turns_per_sec": turns_per_sec,
            "streaming_n_turns": n_turns,
            "batch_close_p95_ms": p95,
            "cpus": CPUS,
        },
    }
    # Stop the JVM cleanly BEFORE printing so no late log line can land after
    # (or interleave with) the one JSON line the driver parses.
    spark.stop()
    sys.stdout.flush()
    sys.stderr.flush()
    print(json.dumps(out))
    sys.stdout.flush()


if __name__ == "__main__":
    main()
