"""Property-based tests (hypothesis) for the pure-Python codec layer —
hundreds of adversarial examples per run at zero Spark cost. The Avro
binary/container codec is the one component whose correctness is a byte
contract with EXTERNAL readers (the reference's DataFileReader), so fuzzing
its round-trip is worth more than any fixed fixture.

SURVEY §5 parity: the reference fuzzes its serialization helpers with
fixed fixture matrices (``PrioSerializationHelperTest.java``); hypothesis
subsumes those with generated ones."""

from __future__ import annotations

import io

from hypothesis import given, settings, strategies as st

from exposure_notifications_private_analytics_ingestion_spark.functions.avro_codec import (
    _rv,
    _wv,
    container_sync_marker,
    decode_packet,
    encode_packet,
    read_container,
    write_container,
)

# avro long is zigzag-varint over int64
INT64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)

packet_strategy = st.fixed_dictionaries(
    {
        "uuid": st.text(min_size=0, max_size=80),  # incl. unicode, empty
        "encryption_key_id": st.one_of(st.none(), st.text(max_size=40)),
        "r_pit": INT64,
        "version_configuration": st.one_of(st.none(), st.text(max_size=40)),
        "device_nonce": st.one_of(st.none(), st.binary(max_size=64)),
        "encrypted_payload": st.binary(min_size=0, max_size=512),
    }
)


@settings(max_examples=300, deadline=None)
@given(INT64)
def test_zigzag_varint_roundtrip(n):
    buf = io.BytesIO()
    _wv(buf, n)
    buf.seek(0)
    assert _rv(buf) == n


@settings(max_examples=200, deadline=None)
@given(packet_strategy)
def test_packet_roundtrip(p):
    raw = encode_packet(
        p["uuid"],
        p["encryption_key_id"],
        p["r_pit"],
        p["version_configuration"],
        p["device_nonce"],
        p["encrypted_payload"],
    )
    assert decode_packet(raw) == p


@settings(max_examples=50, deadline=None)
@given(st.lists(packet_strategy, min_size=0, max_size=20), st.text(max_size=20))
def test_container_roundtrip_and_determinism(packets, seed):
    recs = [
        encode_packet(
            p["uuid"],
            p["encryption_key_id"],
            p["r_pit"],
            p["version_configuration"],
            p["device_nonce"],
            p["encrypted_payload"],
        )
        for p in packets
    ]
    sync = container_sync_marker(seed)
    blob = write_container(recs, sync=sync)
    # byte-identical re-write (idempotent sink contract)
    assert write_container(recs, sync=sync) == blob
    meta, out = read_container(blob)
    assert out == packets
    assert meta["avro.codec"] == b"null"


@settings(max_examples=50, deadline=None)
@given(
    st.lists(packet_strategy, min_size=1, max_size=8),
    st.integers(min_value=0, max_value=15),
)
def test_container_detects_sync_corruption(packets, flip_pos):
    recs = [
        encode_packet(
            p["uuid"],
            p["encryption_key_id"],
            p["r_pit"],
            p["version_configuration"],
            p["device_nonce"],
            p["encrypted_payload"],
        )
        for p in packets
    ]
    blob = write_container(recs, sync=container_sync_marker("x"))
    # flip one byte inside the trailing block-sync marker
    pos = len(blob) - 16 + flip_pos
    mutated = blob[:pos] + bytes([blob[pos] ^ 0xFF]) + blob[pos + 1 :]
    try:
        read_container(mutated)
        raise AssertionError("corrupted sync marker was not detected")
    except ValueError:
        pass
