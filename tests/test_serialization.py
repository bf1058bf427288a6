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
    build_signatures,
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
