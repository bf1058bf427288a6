"""W1/W3/M1: Avro packet round-trip (PrioSerializationHelperTest.java:44-152),
signature triplet, manifest config (DataProcessorManifestTest.java:30-53)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from exposure_notifications_private_analytics_ingestion_spark.functions.avro_codec import (
    decode_packet,
    encode_packet,
    serialize_packets,
)
from exposure_notifications_private_analytics_ingestion_spark.plans.ingestion import (
    IngestionOptions,
    build_signatures,
    run_ingestion,
)
from exposure_notifications_private_analytics_ingestion_spark.plans.manifest import (
    DataProcessorManifest,
    merge_manifest_options,
)


def test_avro_codec_roundtrip_pure():
    rec = dict(
        uuid="conv-1#7",
        encryption_key_id=None,
        r_pit=123456789,
        version_configuration=None,
        device_nonce=None,
        encrypted_payload=b"\x00\x01hello\xff",
    )
    raw = encode_packet(**rec)
    back = decode_packet(raw)
    assert back == rec
    # negative r_pit (zigzag) and non-null unions
    rec2 = dict(
        uuid="",
        encryption_key_id="key-1",
        r_pit=-1,
        version_configuration="v2",
        device_nonce=b"\x01\x02",
        encrypted_payload=b"",
    )
    assert decode_packet(encode_packet(**rec2)) == rec2


def test_serialize_packets_dataframe(spark):
    df = spark.createDataFrame(
        [
            ("b1", "pha", "c#0", 42, None, None, None, b"payload-a"),
            ("b1", "facilitator", "c#0", 42, None, None, None, b"payload-b"),
        ],
        "batch_id string, destination string, uuid string, r_pit long, "
        "encryption_key_id string, version_configuration string, "
        "device_nonce binary, encrypted_payload binary",
    )
    rows = serialize_packets(df).select("uuid", "avro").collect()
    decoded = [decode_packet(bytes(r["avro"])) for r in rows]
    assert {d["uuid"] for d in decoded} == {"c#0"}
    assert {bytes(d["encrypted_payload"]) for d in decoded} == {
        b"payload-a",
        b"payload-b",
    }
    assert all(d["r_pit"] == 42 for d in decoded)
    assert all(d["encryption_key_id"] is None for d in decoded)


def test_signatures_deterministic(spark):
    hd = spark.createDataFrame(
        [("b1", "pha", "d" * 64), ("b2", "facilitator", "e" * 64)],
        "batch_id string, destination string, packet_file_digest string",
    )
    s1 = {r["batch_id"]: r["batch_header_signature"] for r in build_signatures(hd).collect()}
    s2 = {r["batch_id"]: r["batch_header_signature"] for r in build_signatures(hd).collect()}
    assert s1 == s2
    assert len(set(s1.values())) == 2  # different digests → different sigs
    assert all(len(v) == 64 for v in s1.values())


def test_manifest_load_and_merge(tmp_path):
    p = tmp_path / "m.json"
    p.write_text(
        json.dumps(
            {
                "ingestion-bucket": "/data/ingestion",
                "ingestion-identity": "arn:aws:iam::123:role/x",
                "ingestion-bucket-region": "us-east-1",
            }
        )
    )
    m = DataProcessorManifest.load(str(p))
    assert m.ingestion_bucket == "/data/ingestion"
    assert m.aws_bucket_role.endswith("role/x")
    # precedence: explicit wins, manifest fills
    assert merge_manifest_options("/explicit", str(p)) == "/explicit"
    assert merge_manifest_options(None, str(p)) == "/data/ingestion"
    bad = tmp_path / "bad.json"
    bad.write_text("{}")
    with pytest.raises(ValueError):
        DataProcessorManifest.load(str(bad))


def test_container_roundtrip_pure():
    """Object-container framing: write N records, read back identical;
    metadata carries the schema; corrupt sync detected."""
    import json as _json

    from exposure_notifications_private_analytics_ingestion_spark.functions.avro_codec import (
        PACKET_AVRO_SCHEMA_JSON,
        container_sync_marker,
        encode_packet,
        read_container,
        write_container,
    )

    recs = [
        {
            "uuid": f"conv-{i}#{i}",
            "encryption_key_id": None,
            "r_pit": 1000 + i,
            "version_configuration": None,
            "device_nonce": None,
            "encrypted_payload": bytes([i % 256]) * (i + 1),
        }
        for i in range(100)
    ]
    raw = [
        encode_packet(
            r["uuid"], r["encryption_key_id"], r["r_pit"],
            r["version_configuration"], r["device_nonce"], r["encrypted_payload"],
        )
        for r in recs
    ]
    blob = write_container(raw, sync=container_sync_marker("t"), records_per_block=32)
    assert blob[:4] == b"Obj\x01"
    meta, back = read_container(blob)
    assert _json.loads(meta["avro.schema"]) == _json.loads(PACKET_AVRO_SCHEMA_JSON)
    assert meta["avro.codec"] == b"null"
    assert back == recs
    # deterministic framing: same inputs -> same bytes
    assert blob == write_container(raw, sync=container_sync_marker("t"), records_per_block=32)
    # fastavro cross-check when available (not in this container)
    try:
        import fastavro  # noqa: F401
        import io as _io

        got = list(fastavro.reader(_io.BytesIO(blob)))
        assert [g["uuid"] for g in got] == [r["uuid"] for r in recs]
    except ImportError:
        pass
    # corruption detection
    import pytest as _pytest

    bad = bytearray(blob)
    bad[-1] ^= 0xFF  # flip a sync byte
    with _pytest.raises(ValueError, match="sync"):
        read_container(bytes(bad))


def test_write_batch_containers_idempotent(spark, tmp_path):
    """Executor-side container sink: files exist per (batch, destination),
    re-run produces byte-identical files, manifest counts match packets."""
    import hashlib

    from exposure_notifications_private_analytics_ingestion_spark.functions.avro_codec import (
        read_container,
        write_batch_containers,
    )
    from exposure_notifications_private_analytics_ingestion_spark.operators.batching import (
        assign_batches,
    )
    from exposure_notifications_private_analytics_ingestion_spark.operators.packets import (
        split_packets,
    )
    from exposure_notifications_private_analytics_ingestion_spark.model.schema import (
        TURNS_WITH_PAYLOAD_SCHEMA,
    )
    from exposure_notifications_private_analytics_ingestion_spark.sources import (
        generate_turns_with_payload,
    )

    pdf = generate_turns_with_payload(n_convs=3, seed=4)
    df = spark.createDataFrame(pdf, schema=TURNS_WITH_PAYLOAD_SCHEMA)
    pk = split_packets(assign_batches(df, batch_size=10, window_start_s=1704067200))
    man1 = write_batch_containers(pk, str(tmp_path / "avro")).toPandas()
    assert len(man1) == pk.select("batch_id", "destination").distinct().count()
    digests1 = {}
    total = 0
    for r in man1.itertuples():
        blob = open(r.path, "rb").read()
        assert hashlib.sha256(blob).hexdigest() == r.file_sha256
        _meta, recs = read_container(blob)
        assert len(recs) == r.n_records
        total += len(recs)
        digests1[(r.batch_id, r.destination)] = r.file_sha256
    assert total == pk.count()
    man2 = write_batch_containers(pk, str(tmp_path / "avro")).toPandas()
    digests2 = {(r.batch_id, r.destination): r.file_sha256 for r in man2.itertuples()}
    assert digests1 == digests2


def test_read_packet_containers_roundtrip(spark, tmp_path):
    """Full round trip: pipeline → write_batch_containers → binaryFile scan +
    mapInPandas decode → identical packet set."""
    from exposure_notifications_private_analytics_ingestion_spark.functions.avro_codec import (
        write_batch_containers,
    )
    from exposure_notifications_private_analytics_ingestion_spark.model.schema import (
        TURNS_WITH_PAYLOAD_SCHEMA,
    )
    from exposure_notifications_private_analytics_ingestion_spark.operators.batching import (
        assign_batches,
    )
    from exposure_notifications_private_analytics_ingestion_spark.operators.packets import (
        split_packets,
    )
    from exposure_notifications_private_analytics_ingestion_spark.sources import (
        generate_turns_with_payload,
        read_packet_containers,
    )

    pdf = generate_turns_with_payload(n_convs=4, seed=31)
    df = spark.createDataFrame(pdf, schema=TURNS_WITH_PAYLOAD_SCHEMA)
    pk = split_packets(assign_batches(df, batch_size=8, window_start_s=1704067200))
    write_batch_containers(pk, str(tmp_path / "avro")).count()

    back = read_packet_containers(spark, str(tmp_path / "avro")).toPandas()
    orig = pk.select(
        "batch_id", "destination", "uuid", "r_pit", "encrypted_payload"
    ).toPandas()
    key = ["batch_id", "destination", "uuid"]
    back_s = back[key + ["r_pit", "encrypted_payload"]].sort_values(key).reset_index(drop=True)
    orig_s = orig.sort_values(key).reset_index(drop=True)
    assert len(back_s) == len(orig_s)
    assert back_s[key].equals(orig_s[key])
    assert [bytes(b) for b in back_s["encrypted_payload"]] == [
        bytes(b) for b in orig_s["encrypted_payload"]
    ]
    # r_pit null in orig (no rpit stage here) decodes as 0 via the codec
    assert (back_s["r_pit"] == orig_s["r_pit"].fillna(0).astype("int64")).all()


def test_run_ingestion_emits_containers_at_reference_layout(spark, tmp_path):
    """emit_avro_containers: files land at the header's deterministic path
    layout {dest}/{name}/YYYY/MM/dd/HH/mm/{batch_id}.batch.avro
    (BatchWriterFn.java:135-150) and round-trip through the container source."""
    import os

    from exposure_notifications_private_analytics_ingestion_spark.sources import (
        generate_turns,
        read_packet_containers,
        write_turns_table,
    )

    JAN = 1704067200
    pdf = generate_turns(n_convs=6, seed=3, hours=1)
    write_turns_table(spark, pdf, str(tmp_path / "turns"))
    opts = IngestionOptions(
        window_start_s=JAN, duration_s=7200, batch_size=8, emit_avro_containers=True
    )
    run_ingestion(spark, str(tmp_path / "turns"), str(tmp_path / "out"), opts)
    man = spark.read.parquet(str(tmp_path / "out/avro_manifest")).toPandas()
    assert len(man) > 0
    for r in man.itertuples():
        assert os.path.exists(r.path)
        # layout: .../avro/{dest}/{conv}/2024/01/01/00/00/{batch_id}.batch.avro
        rel = os.path.relpath(r.path, str(tmp_path / "out/avro"))
        parts = rel.split(os.sep)
        assert parts[0] == r.destination
        assert parts[2:7] == ["2024", "01", "01", "00", "00"]
        assert parts[7] == f"{r.batch_id}.batch.avro"
    # container files re-read to the same packet set as the parquet leg —
    # including the DESTINATION recovered from the windowed layout
    pk = spark.read.parquet(str(tmp_path / "out/packets"))
    back = read_packet_containers(spark, str(tmp_path / "out/avro"))
    assert back.count() == pk.count()
    back_d = dict(
        (r["destination"], r["count"])
        for r in back.groupBy("destination").count().collect()
    )
    pk_d = dict(
        (r["destination"], r["count"])
        for r in pk.groupBy("destination").count().collect()
    )
    assert back_d == pk_d and set(back_d) == {"pha", "facilitator"}

    # W4 idempotence under CHANGED batch membership: re-run the same window
    # with a different batch_size (new batch ids) — no stale files survive
    pk_count = pk.count()  # materialize before the rerun replaces the files
    opts2 = IngestionOptions(
        window_start_s=JAN, duration_s=7200, batch_size=5, emit_avro_containers=True
    )
    run_ingestion(spark, str(tmp_path / "turns"), str(tmp_path / "out"), opts2)
    man2 = spark.read.parquet(str(tmp_path / "out/avro_manifest")).toPandas()
    import glob

    on_disk = sorted(
        glob.glob(str(tmp_path / "out/avro") + "/**/*.batch.avro", recursive=True)
    )
    assert sorted(man2["path"]) == on_disk
    assert (
        read_packet_containers(spark, str(tmp_path / "out/avro")).count() == pk_count
    )


def test_asymmetric_header_signing_roundtrip(spark, tmp_path):
    """W3 verdict item: signatures written by run_ingestion verify against
    the published public key; a tampered digest fails verification."""
    import json

    from exposure_notifications_private_analytics_ingestion_spark.functions.signing import (
        generate_signing_key_pem,
        verify_header_signature,
    )
    from exposure_notifications_private_analytics_ingestion_spark.plans.ingestion import (
        IngestionOptions,
        run_ingestion,
    )
    from exposure_notifications_private_analytics_ingestion_spark.sources import (
        generate_turns,
        write_turns_table,
    )

    pem = generate_signing_key_pem("test-w3-key")
    pdf = generate_turns(n_convs=8, seed=21, dup_frac=0.0)
    inp = write_turns_table(spark, pdf, str(tmp_path / "turns"))
    out = str(tmp_path / "out")
    run_ingestion(
        spark, inp, out,
        IngestionOptions(window_start_s=1704067200, duration_s=48 * 3600,
                         batch_size=20, signing_key_pem=pem,
                         signing_key_id="test-w3-key-id"),
    )
    key_info = json.load(open(f"{out}/signing_key.json"))
    assert key_info["key_identifier"] == "test-w3-key-id"
    pub = key_info["public_key_der_b64"]
    sigs = spark.read.parquet(f"{out}/signatures").toPandas()
    heads = spark.read.parquet(f"{out}/batch_headers").toPandas()
    joined = sigs.merge(heads, on=["batch_id", "destination"])
    assert len(joined) == len(sigs) > 0
    assert (joined["key_identifier"] == "test-w3-key-id").all()
    for _, r in joined.iterrows():
        assert verify_header_signature(
            r["packet_file_digest"], r["batch_header_signature"], pub
        )
    # tampered header digest must NOT verify
    r0 = joined.iloc[0]
    tampered = ("0" if r0["packet_file_digest"][0] != "0" else "1") + r0[
        "packet_file_digest"
    ][1:]
    assert not verify_header_signature(
        tampered, r0["batch_header_signature"], pub
    )


def test_manifest_http_fetch_and_invalid_url_contract(tmp_path):
    """Verdict r3 #6: HTTP manifest fetch (DataProcessorManifest.java:79-112)
    with the invalid-URL error contract (DataProcessorManifestTest.java:30-53)."""
    import http.server
    import json as _json
    import threading

    import pytest

    from exposure_notifications_private_analytics_ingestion_spark.plans.manifest import (
        DataProcessorManifest,
        ManifestFetchError,
    )

    payload = {
        "ingestion-bucket": "gs://bucket-from-http",
        "ingestion-identity": "arn:aws:iam::1:role/r",
        "ingestion-bucket-region": "us-east-1",
    }

    class H(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path == "/manifest.json":
                body = _json.dumps(payload).encode()
                self.send_response(200)
            elif self.path == "/notjson":
                body = b"<html>oops</html>"
                self.send_response(200)
            else:
                body = b"nope"
                self.send_response(404)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), H)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        m = DataProcessorManifest.load(f"http://127.0.0.1:{port}/manifest.json")
        assert m.ingestion_bucket == "gs://bucket-from-http"
        assert m.aws_bucket_role == "arn:aws:iam::1:role/r"
        assert m.aws_bucket_region == "us-east-1"
        with pytest.raises(ManifestFetchError):
            DataProcessorManifest.load(f"http://127.0.0.1:{port}/missing.json")
        with pytest.raises(ManifestFetchError, match="not JSON"):
            DataProcessorManifest.load(f"http://127.0.0.1:{port}/notjson")
    finally:
        srv.shutdown()
    # unreachable host / malformed URL → same contract
    with pytest.raises(ManifestFetchError):
        DataProcessorManifest.load("http://127.0.0.1:1/manifest.json")
    with pytest.raises(ManifestFetchError):
        DataProcessorManifest.load(str(tmp_path / "does-not-exist.json"))


def test_manifest_fast_path_equals_directory_scan(spark, tmp_path):
    """read_packet_containers has two planners: the manifest fast path (paths
    from the writer's avro_manifest parquet, executor-side open) and the
    binaryFile directory scan (for reference-produced trees with no
    manifest). Both must decode the identical packet set — pinned here by
    copying the container tree away from its manifest sibling."""
    import shutil

    from exposure_notifications_private_analytics_ingestion_spark.sources import (
        generate_turns,
        read_packet_containers,
        write_turns_table,
    )

    pdf = generate_turns(n_convs=8, seed=11, hours=1)
    write_turns_table(spark, pdf, str(tmp_path / "turns"))
    opts = IngestionOptions(
        window_start_s=1704067200,
        duration_s=7200,
        batch_size=6,
        emit_avro_containers=True,
    )
    run_ingestion(spark, str(tmp_path / "turns"), str(tmp_path / "out"), opts)
    # manifest sibling exists here -> fast path
    via_manifest = read_packet_containers(spark, str(tmp_path / "out/avro"))
    # same tree without the sibling -> binaryFile fallback
    shutil.copytree(str(tmp_path / "out/avro"), str(tmp_path / "bare/avro"))
    via_scan = read_packet_containers(spark, str(tmp_path / "bare/avro"))
    cols = via_manifest.columns
    assert via_scan.columns == cols
    assert via_manifest.count() > 0
    assert (
        via_manifest.exceptAll(via_scan).count()
        + via_scan.exceptAll(via_manifest).count()
        == 0
    )
