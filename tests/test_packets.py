"""X1 packet split + fork consistency (PrioSerializationHelperTest.java:125-152,
IngestionPipelineIT.java:601-630) and the E2E ingestion job (W4 idempotence)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from exposure_notifications_private_analytics_ingestion_spark.model.schema import (
    TURNS_WITH_PAYLOAD_SCHEMA,
)
from exposure_notifications_private_analytics_ingestion_spark.operators.batching import (
    assign_batches,
)
from exposure_notifications_private_analytics_ingestion_spark.operators.packets import (
    split_packets,
)
from exposure_notifications_private_analytics_ingestion_spark.plans.ingestion import (
    IngestionOptions,
    run_ingestion,
)
from exposure_notifications_private_analytics_ingestion_spark.sources import (
    generate_turns,
    generate_turns_with_payload,
    write_turns_table,
)

JAN = 1704067200


@pytest.fixture(scope="module")
def payload_packets(spark):
    pdf = generate_turns_with_payload(n_convs=4, seed=5)
    df = spark.createDataFrame(pdf, schema=TURNS_WITH_PAYLOAD_SCHEMA)
    batched = assign_batches(df, batch_size=10, window_start_s=JAN)
    return split_packets(batched).toPandas(), pdf


def test_exactly_two_packets_per_share(payload_packets):
    pk, pdf = payload_packets
    assert len(pk) == 2 * len(pdf)
    per_uuid = pk.groupby("uuid")["destination"].apply(set)
    assert all(s == {"pha", "facilitator"} for s in per_uuid)


def test_key_ids_nulled(payload_packets):
    # PrioSerializationHelper.java:106-121: encryption_key_id,
    # version_configuration, device_nonce nulled on output
    pk, _ = payload_packets
    assert pk["encryption_key_id"].isna().all()
    assert pk["version_configuration"].isna().all()
    assert pk["device_nonce"].isna().all()


def test_fork_routing(payload_packets):
    # share[0] → pha, share[1] → facilitator (BatchWriterFn.java:130-132)
    pk, pdf = payload_packets
    row = pdf.iloc[0]
    uuid = f"{row['conv_id']}#{row['turn_idx']}"
    mine = pk[pk["uuid"] == uuid].set_index("destination")
    import base64

    assert bytes(mine.loc["pha", "encrypted_payload"]) == base64.b64decode(
        row["encrypted_shares"][0]["payload"]
    )
    assert bytes(mine.loc["facilitator", "encrypted_payload"]) == base64.b64decode(
        row["encrypted_shares"][1]["payload"]
    )


def test_run_ingestion_idempotent(spark, tmp_path):
    pdf = generate_turns(n_convs=30, seed=9, hours=2, dup_frac=0.05)
    write_turns_table(spark, pdf, str(tmp_path / "turns"))
    opts = IngestionOptions(window_start_s=JAN, duration_s=7200, batch_size=16)
    run_ingestion(spark, str(tmp_path / "turns"), str(tmp_path / "out"), opts)
    h1 = (
        spark.read.parquet(str(tmp_path / "out/batch_headers"))
        .select("batch_id", "packet_file_digest")
        .toPandas()
        .sort_values("batch_id")
        .reset_index(drop=True)
    )
    run_ingestion(spark, str(tmp_path / "turns"), str(tmp_path / "out"), opts)
    h2 = (
        spark.read.parquet(str(tmp_path / "out/batch_headers"))
        .select("batch_id", "packet_file_digest")
        .toPandas()
        .sort_values("batch_id")
        .reset_index(drop=True)
    )
    assert h1.equals(h2)
    pk = spark.read.parquet(str(tmp_path / "out/packets"))
    dup = pk.groupBy("conv_id", "turn_idx", "destination").count().filter("count > 1")
    assert dup.count() == 0


def test_header_digest_matches_recomputation(spark, tmp_path):
    """Manifest verification analog (IngestionPipelineIT.java:632-721):
    recompute the digest from the packet rows and compare to the header."""
    pdf = generate_turns(n_convs=10, seed=13, hours=1, dup_frac=0.0)
    write_turns_table(spark, pdf, str(tmp_path / "t"))
    opts = IngestionOptions(window_start_s=JAN, duration_s=3600, batch_size=8)
    run_ingestion(spark, str(tmp_path / "t"), str(tmp_path / "o"), opts)
    pk = spark.read.parquet(str(tmp_path / "o/packets"))
    hd = spark.read.parquet(str(tmp_path / "o/batch_headers"))
    recomputed = (
        pk.select("batch_id", "destination", "uuid", F.hex("encrypted_payload").alias("ph"))
        .groupBy("batch_id", "destination")
        .agg(
            F.sha2(
                F.concat_ws(
                    "",
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("uuid", "ph"))),
                        lambda s: F.concat(s["uuid"], F.lit(":"), s["ph"]),
                    ),
                ),
                256,
            ).alias("recomputed")
        )
    )
    joined = hd.join(recomputed, ["batch_id", "destination"]).toPandas()
    assert len(joined) == hd.count()
    assert (joined["packet_file_digest"] == joined["recomputed"]).all()


def test_payload_variant_end_to_end(spark):
    """Nested-document input (turns_with_payload) through the full core:
    validate → fused dedup/window/chunk (xxhash64 over struct+array columns)
    → fork routing from the real encrypted shares."""
    import base64

    import pandas as pd

    from exposure_notifications_private_analytics_ingestion_spark.model.schema import (
        TURNS_WITH_PAYLOAD_SCHEMA,
    )
    from exposure_notifications_private_analytics_ingestion_spark.plans.ingestion import (
        process_turns,
    )
    from exposure_notifications_private_analytics_ingestion_spark.sources import (
        generate_turns_with_payload,
        invalid_fixture_rows,
    )

    good = generate_turns_with_payload(n_convs=6, seed=3)
    bad = invalid_fixture_rows()
    pdf = pd.concat([good, bad], ignore_index=True)
    df = spark.createDataFrame(pdf, schema=TURNS_WITH_PAYLOAD_SCHEMA)
    from exposure_notifications_private_analytics_ingestion_spark.plans.ingestion import (
        IngestionOptions,
    )

    opts = IngestionOptions(window_start_s=JAN, duration_s=12 * 3600, batch_size=20)
    packets, headers, counters = process_turns(df, opts)
    pk = packets.toPandas()
    # invalid rows all dropped with the right counters; valid rows ×2 forks
    cts = {r["invalid_reason"]: r["n"] for r in counters.collect()}
    assert sum(cts.values()) == len(bad)
    n_good_in_window = len(good)  # generator keeps all rows inside 12 h
    assert len(pk) == 2 * n_good_in_window
    # payloads come from the per-fork encrypted share, not the turn text
    row = good.iloc[0]
    uuid = f"{row['conv_id']}#{row['turn_idx']}"
    mine = pk[pk["uuid"] == uuid].set_index("destination")
    assert bytes(mine.loc["pha", "encrypted_payload"]) == base64.b64decode(
        row["encrypted_shares"][0]["payload"]
    )


def test_rpit_fork_consistent_and_nontrivial(spark):
    """IngestionPipelineIT.java:601-630: both destinations carry the SAME
    non-null r_pit per share; values lie in [1, PRIME) and are not n-th roots
    of unity; deterministic across reruns (our strengthening)."""
    from exposure_notifications_private_analytics_ingestion_spark.model.schema import (
        PRIME,
    )
    from exposure_notifications_private_analytics_ingestion_spark.plans.ingestion import (
        process_turns,
    )

    pdf = generate_turns_with_payload(n_convs=5, seed=11)
    df = spark.createDataFrame(pdf, schema=TURNS_WITH_PAYLOAD_SCHEMA)
    opts = IngestionOptions(window_start_s=JAN, duration_s=12 * 3600, batch_size=20)
    pk1 = process_turns(df, opts)[0].toPandas()
    assert pk1["r_pit"].notna().all()
    assert ((pk1["r_pit"] >= 1) & (pk1["r_pit"] < PRIME)).all()
    # fork-equal: exactly one distinct r_pit per uuid across both destinations
    assert (pk1.groupby("uuid")["r_pit"].nunique() == 1).all()
    # n = nextPow2(bins+1) = 4 for bins=2: r_pit^4 mod PRIME != 1
    for v in pk1["r_pit"].head(50):
        assert pow(int(v), 4, PRIME) != 1
    # deterministic under replay
    pk2 = process_turns(df, opts)[0].toPandas()
    a = pk1.sort_values(["uuid", "destination"])["r_pit"].reset_index(drop=True)
    b = pk2.sort_values(["uuid", "destination"])["r_pit"].reset_index(drop=True)
    assert a.equals(b)


def test_headers_reflect_input_prio_params(spark):
    """ADVICE r1: header metadata must derive from the batch's own
    prio_params, and distinct prio_params must never co-batch
    (IngestionPipeline.java:78-88 keys by full DataShareMetadata)."""
    from exposure_notifications_private_analytics_ingestion_spark.plans.ingestion import (
        process_turns,
    )

    pdf = generate_turns_with_payload(n_convs=4, seed=21)
    # half the conversations use a different epsilon + bins
    alt = {"prime": 4293918721, "epsilon": 8.0, "bins": 4, "number_servers": 2,
           "hamming_weight": 2}
    convs = sorted(pdf["conv_id"].unique())
    mask = pdf["conv_id"].isin(convs[:2])
    pdf.loc[mask, "prio_params"] = pd.Series([alt] * int(mask.sum()), index=pdf.index[mask])
    df = spark.createDataFrame(pdf, schema=TURNS_WITH_PAYLOAD_SCHEMA)
    opts = IngestionOptions(window_start_s=JAN, duration_s=12 * 3600, batch_size=1000)
    packets, headers, _ = process_turns(df, opts)
    hd = headers.toPandas()
    # every header's (bins, epsilon, hamming_weight) matches its batch's data
    assert set(map(tuple, hd[["bins", "epsilon", "hamming_weight"]].values)) == {
        (4, 8.0, 2),
        (2, 5.2933, 1),
    }
    # no batch mixes prio params: packets of one batch_id share one bins value
    pk = packets.toPandas()
    assert (pk.groupby("batch_id")["bins"].nunique() == 1).all()


def test_run_ingestion_empty_window_readable(spark, tmp_path):
    """All-pruned window: job succeeds, reports zero stats, and every output
    leg reads back as an EMPTY frame with full schema (no
    UNABLE_TO_INFER_SCHEMA)."""
    pdf = generate_turns(n_convs=5, seed=7, hours=1)
    write_turns_table(spark, pdf, str(tmp_path / "turns"))
    # window in 1970: everything pruned at the scan
    opts = IngestionOptions(window_start_s=0, duration_s=3600, batch_size=10)
    stats = run_ingestion(spark, str(tmp_path / "turns"), str(tmp_path / "out"), opts)
    assert stats["packets_written"] == "0"
    for leg in ("packets", "batch_headers", "signatures"):
        df = spark.read.parquet(str(tmp_path / "out" / leg))
        assert df.count() == 0
        assert len(df.columns) > 3
