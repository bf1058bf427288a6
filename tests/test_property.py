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

import pytest
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


# --------------------------------------------------------- media decoders

from exposure_notifications_private_analytics_ingestion_spark.operators.multimodal import (  # noqa: E402
    decode_audio,
    decode_media,
    decode_video,
    encode_gif,
    encode_jpeg_header,
    encode_png,
    encode_wav,
)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_magic_prefix = st.sampled_from(
    [b"", _PNG_SIG, b"\xff\xd8", b"GIF89a", b"RIFF", b"RIFFxxxxWAVE"]
)


@settings(max_examples=200, deadline=None)
@given(_magic_prefix, st.binary(max_size=128))
def test_decoders_are_total_in_nonstrict_mode(prefix, junk):
    """Arbitrary bytes — including valid magics followed by garbage (the
    truncated-upload case) — must NEVER raise in non-strict mode: an
    uncaught parse error inside mapInPandas kills the whole task at corpus
    scale. The sniffed format survives into the stub row."""
    buf = prefix + junk
    for dec in (decode_media, decode_audio, decode_video):
        out = dec(buf, strict=False)
        assert isinstance(out, dict) and "ok" in out


@settings(max_examples=100, deadline=None)
@given(
    st.integers(min_value=1, max_value=4096),
    st.integers(min_value=1, max_value=4096),
)
def test_image_decoders_roundtrip_dimensions(w, h):
    assert decode_media(encode_png(w, h), strict=True)["width"] == w
    assert decode_media(encode_jpeg_header(w, h), strict=True)["height"] == h
    g = decode_media(encode_gif(min(w, 65535), min(h, 65535)), strict=True)
    assert (g["width"], g["height"]) == (min(w, 65535), min(h, 65535))


@settings(max_examples=50, deadline=None)
@given(
    st.integers(min_value=1, max_value=4),
    st.sampled_from([8000, 16000, 44100, 48000]),
    st.integers(min_value=0, max_value=5000),
)
def test_wav_roundtrip_frames(channels, rate, n_frames):
    buf = encode_wav(sample_rate=rate, n_frames=n_frames, channels=channels)
    out = decode_audio(buf, strict=True)
    assert out["ok"] and out["channels"] == channels
    assert out["sample_rate"] == rate and out["n_frames"] == n_frames


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=256))
def test_read_container_error_contract(junk):
    """Arbitrary bytes (with or without the magic) either parse or raise
    ValueError — never IndexError/UnicodeDecodeError: lake-scan callers
    route on 'ValueError = corrupt file, quarantine' vs 'anything else =
    engine bug'."""
    blob = b"Obj\x01" + junk
    for candidate in (junk, blob):
        try:
            read_container(candidate)
        except ValueError:
            pass


def test_read_container_huge_varint_length_quarantined():
    """Round-5 falsifying example: a metadata-key length varint decoding to
    ~2^63 must raise ValueError (quarantine), not leak OverflowError or
    attempt a giant allocation (VERDICT r5 #1)."""
    blob = b"Obj\x01" + b"\x02" + b"\x80" * 9 + b"\x02"
    with pytest.raises(ValueError):
        read_container(blob)


def test_read_container_negative_length_quarantined():
    """A negative decoded length (zigzag of an odd varint) for a
    metadata-key read must raise ValueError, never be passed to read()."""
    # varint 0x01 unzigzags to -1: count=1 entry, then key length -1
    blob = b"Obj\x01" + b"\x02" + b"\x01" + b"abc"
    with pytest.raises(ValueError):
        read_container(blob)
    # negative block count after valid metadata + sync
    base = write_container([], sync=container_sync_marker("t"))
    with pytest.raises(ValueError):
        read_container(base + b"\x01" + b"\x02" + b"x" + container_sync_marker("t"))


@settings(max_examples=100, deadline=None)
@given(st.lists(packet_strategy, min_size=1, max_size=6), st.integers(min_value=1))
def test_truncated_container_raises_valueerror(packets, cut):
    recs = [
        encode_packet(
            p["uuid"], p["encryption_key_id"], p["r_pit"],
            p["version_configuration"], p["device_nonce"], p["encrypted_payload"],
        )
        for p in packets
    ]
    blob = write_container(recs, sync=container_sync_marker("t"))
    cut = cut % (len(blob) - 1) + 1  # strictly shorter, non-empty
    try:
        meta, out = read_container(blob[:cut])
        # a short prefix that still parses must not fabricate records
        assert len(out) <= len(packets)
    except ValueError:
        pass


# ------------------------------------------------------------- rpit kernel

import pandas as pd  # noqa: E402

from exposure_notifications_private_analytics_ingestion_spark.model.schema import PRIME  # noqa: E402
from exposure_notifications_private_analytics_ingestion_spark.model.validate import (  # noqa: E402
    _rpit_udf,
)

_rpit = _rpit_udf.func  # the raw pandas kernel under the pandas_udf wrapper


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.text(min_size=1, max_size=40), min_size=1, max_size=16),
    st.integers(min_value=0, max_value=4096),
)
def test_rpit_contract(uuids, bins):
    """For arbitrary uuid strings and bin counts: deterministic, in
    [1, PRIME), never an n-th root of unity for n = nextPow2(bins+1) —
    the DataShare.java:319-349 contract the packets carry downstream."""
    u = pd.Series(uuids)
    b = pd.Series([bins] * len(uuids))
    r1 = _rpit(u, b)
    r2 = _rpit(u.sample(frac=1, random_state=7).sort_index(), b)
    assert list(r1) == list(r2)  # deterministic, order-independent
    n = 1
    while n < bins + 1:
        n *= 2
    for v in r1:
        assert 0 < v < PRIME
        assert pow(int(v), n, PRIME) != 1  # not an n-th root of unity
