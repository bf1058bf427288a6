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
    # timing coverage == oracle coverage: EVERY registry query is timed (the
    # explicit list keeps the r1/r2-comparable ordering; anything newly added
    # to the registry is appended automatically so the two can't drift)
    headline = [
        "validate_filter",
        "dedup_exact",
        "window_filter",
        "tumbling_window_counts",
        "sliding_window_counts",
        "session_windows",
        "group_batches",
        "batch_assembly_stateful",
        "packet_split",
        "batch_headers",
        "deletion_retention",
        "metrics_rollup",
        "batch_size_distribution",
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
        "cosine_topk",
        "cosine_near_dup_pairs",
        "cosine_near_dup_lsh",
        "ivf_topk",
        "lsh_ann_topk",
        "multimodal_features",
    ]
    headline += sorted(k for k in reg if k not in headline)
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

        # steady-state streaming leg: ~1M turns through the bucketed-state
        # assembler (the blessed scale path) so the reported throughput is
        # dominated by steady-state work, not the stream's fixed startup —
        # this is the figure comparable to the scaling protocol's
        p95_steady = None
        ml.progress.clear()  # p95 per leg, not pooled across legs
        pdf2 = generate_turns(n_convs=84000, seed=7, hours=6, dup_frac=0.02)
        n_steady = len(pdf2)
        spark.createDataFrame(pdf2, schema=TURNS_SCHEMA).repartition(
            CPUS
        ).write.mode("overwrite").parquet(f"{tmp}/turns-steady")
        t0 = time.time()
        sq = start_stream_ingestion(
            spark,
            f"{tmp}/turns-steady",
            f"{tmp}/out-steady",
            f"{tmp}/ck-steady",
            StreamOptions(batch_size=5000, window_s=7200, watermark="1 hour",
                          bucket_by=4096),
        )
        sq.awaitTermination(900)
        steady_s = time.time() - t0
        timings["streaming_steady"] = round(steady_s, 3)
        steady_tps = round(n_steady / steady_s, 1)
        p95_steady = ml.batch_close_p95_ms()

        # Avro object-container leg (W1 native format): full run_ingestion
        # with emit_avro_containers=True, then read the containers back and
        # verify the round-trip count
        from exposure_notifications_private_analytics_ingestion_spark.plans.ingestion import (
            IngestionOptions,
            run_ingestion,
        )
        from exposure_notifications_private_analytics_ingestion_spark.sources.avro_packets import (
            read_packet_containers,
        )

        t0 = time.time()
        run_ingestion(
            spark,
            f"{tmp}/turns",
            f"{tmp}/avro-out",
            IngestionOptions(window_start_s=1704067200, duration_s=6 * 3600,
                             batch_size=1000, emit_avro_containers=True),
        )
        timings["avro_container_e2e"] = round(time.time() - t0, 3)
        avro_rows = read_packet_containers(spark, f"{tmp}/avro-out/avro").count()
        parquet_rows = spark.read.parquet(f"{tmp}/avro-out/packets").count()
        avro_roundtrip_ok = bool(avro_rows == parquet_rows and avro_rows > 0)
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
            "streaming_steady_turns_per_sec": steady_tps,
            "streaming_steady_n_turns": n_steady,
            "batch_close_p95_ms": p95,
            "batch_close_p95_ms_steady": p95_steady,
            "avro_roundtrip_ok": avro_roundtrip_ok,
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
