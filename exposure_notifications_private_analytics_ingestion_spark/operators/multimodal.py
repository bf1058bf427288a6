"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with struct metadata; decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas UDFs over
``mapInPandas`` so each task processes whole record batches (the only sane
shape for CPU-bound media work on Spark).

The container has no image libraries (PIL/libvips), but the decode kernel is
REAL where the stdlib suffices: ``decode_media`` parses PNG IHDR chunks
(``struct`` + ``zlib.crc32`` verification) and walks JPEG marker segments to
the SOF0/1/2 frame header, returning actual width / height / bit depth /
channel count from the bytes. ``encode_png`` emits spec-valid PNG files
(signature + IHDR + zlib-deflated scanlines + IEND, all CRC'd) and
``encode_jpeg_header`` emits a real JFIF marker stream through SOF0 — the
deterministic fixture generators for ``attach_media``. Only genuinely unknown
formats fall back to a clearly-marked stub row (``ok=False``); full
pixel-level decode of arbitrary images would still need PIL/libvips.

Reference parity: the reference pipeline (Java/Beam, 1,852 LoC) has no media
operators at all — this is driver-brief engine breadth, not parity.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = "doc_id long, media binary, media_type string, n_bytes long"
FEATURES_SCHEMA = (
    "doc_id long, format string, width int, height int, "
    "bit_depth int, channels int, ok boolean"
)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# PNG color type → samples per pixel (spec §11.2.2)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
# JPEG baseline/extended/progressive frame markers carrying the size header
_JPEG_SOF = {0xC0, 0xC1, 0xC2}


# --------------------------------------------------------------- encoders


def _png_chunk(ctype: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + ctype
        + payload
        + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
    )


def encode_png(width: int, height: int, gray: int = 0) -> bytes:
    """Spec-valid 8-bit grayscale PNG filled with one gray level: signature,
    IHDR, one zlib-deflated IDAT of filter-0 scanlines, IEND — every chunk
    CRC32'd, so any conforming reader (including ``decode_media``) accepts
    it."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = (b"\x00" + bytes([gray & 0xFF]) * width) * height
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def encode_jpeg_header(width: int, height: int) -> bytes:
    """Real JFIF marker stream through the SOF0 frame header (SOI, APP0/JFIF,
    minimal DQT, SOF0 with 3 components, EOI). Dimension metadata is genuine
    and marker-walkable; there is no entropy-coded scan, so this is a header
    fixture, not a renderable image."""
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    dqt = b"\x00" + bytes(range(1, 65))
    sof0 = (
        struct.pack(">BHHB", 8, height, width, 3)
        + b"\x01\x22\x00"  # Y,  2x2 sampling, qtable 0
        + b"\x02\x11\x00"  # Cb, 1x1 sampling, qtable 0
        + b"\x03\x11\x00"  # Cr, 1x1 sampling, qtable 0
    )

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    return b"\xff\xd8" + seg(0xE0, app0) + seg(0xDB, dqt) + seg(0xC0, sof0) + b"\xff\xd9"


# ---------------------------------------------------------------- decoder


def decode_media(buf: bytes, strict: bool = False) -> dict:
    """Parse real image metadata from the leading bytes of ``buf``.

    PNG: verifies the 8-byte signature, reads IHDR (first chunk per spec) via
    ``struct``, and checks the chunk CRC with ``zlib.crc32``. JPEG: walks the
    marker segments from SOI to the first SOF0/1/2 and reads the frame
    header. Unknown formats raise ``ValueError`` when ``strict=True``;
    otherwise they get the stub fallback row (``format='unknown'``,
    ``ok=False``) — the one remaining non-real path, kept only for bytes no
    stdlib parser covers."""
    if buf[:8] == _PNG_SIG:
        if len(buf) < 33 or buf[12:16] != b"IHDR":
            raise ValueError("PNG: truncated or missing IHDR")
        (clen,) = struct.unpack(">I", buf[8:12])
        if clen != 13:
            raise ValueError(f"PNG: IHDR length {clen} != 13")
        width, height, bit_depth, color_type = struct.unpack(">IIBB", buf[16:26])
        (crc,) = struct.unpack(">I", buf[29:33])
        if crc != (zlib.crc32(buf[12:29]) & 0xFFFFFFFF):
            raise ValueError("PNG: IHDR CRC mismatch")
        return {
            "format": "png",
            "width": width,
            "height": height,
            "bit_depth": bit_depth,
            "channels": _PNG_CHANNELS.get(color_type, 0),
            "ok": True,
        }
    if buf[:2] == b"\xff\xd8":
        i = 2
        while i + 4 <= len(buf):
            if buf[i] != 0xFF:
                raise ValueError(f"JPEG: lost marker sync at offset {i}")
            marker = buf[i + 1]
            if marker == 0xD9:  # EOI before any SOF
                break
            (seg_len,) = struct.unpack(">H", buf[i + 2 : i + 4])
            if marker in _JPEG_SOF:
                precision, height, width, ncomp = struct.unpack(
                    ">BHHB", buf[i + 4 : i + 10]
                )
                return {
                    "format": "jpeg",
                    "width": width,
                    "height": height,
                    "bit_depth": precision,
                    "channels": ncomp,
                    "ok": True,
                }
            i += 2 + seg_len
        raise ValueError("JPEG: no SOF marker found")
    if strict:
        raise ValueError(f"unknown media format (leading bytes {buf[:4]!r})")
    return {
        "format": "unknown",
        "width": 0,
        "height": 0,
        "bit_depth": 0,
        "channels": 0,
        "ok": False,
    }


# ------------------------------------------------------------ Spark plumbing


def _media_dims(doc_id: int) -> tuple[int, int]:
    """Deterministic fixture dimensions — SQL-expressible so the DuckDB
    oracle can predict them: width = doc_id % 640 + 1, height =
    (doc_id * 7) % 480 + 1."""
    return int(doc_id) % 640 + 1, (int(doc_id) * 7) % 480 + 1


def attach_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize a real binary media column per document: even doc_ids get
    a spec-valid grayscale PNG, odd doc_ids a JFIF/SOF0 JPEG header — both
    with deterministic dimensions derived from doc_id. Runs as one
    ``mapInPandas`` projection (narrow, no shuffle); at 100 TB the same
    plumbing would read the bytes from the lake instead of generating them."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            media, mtype = [], []
            for doc_id in pdf[id_col]:
                w, h = _media_dims(doc_id)
                if int(doc_id) % 2 == 0:
                    media.append(encode_png(w, h, gray=int(doc_id) % 256))
                    mtype.append("image/png")
                else:
                    media.append(encode_jpeg_header(w, h))
                    mtype.append("image/jpeg")
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "media": media,
                    "media_type": mtype,
                    "n_bytes": [len(b) for b in media],
                }
            )

    return df.select(id_col).mapInPandas(op, schema=MEDIA_SCHEMA)


def extract_features(df: DataFrame, strict: bool = False) -> DataFrame:
    """mapInPandas feature extraction: whole Arrow batches in, whole batches
    out; the per-row header decode happens inside the vectorized batch loop
    (CPU-bound work stays off the JVM and off per-row Python UDF serde)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["media"].map(lambda b: decode_media(bytes(b), strict))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "format": feats.map(lambda f: f["format"]),
                    "width": feats.map(lambda f: f["width"]).astype("int32"),
                    "height": feats.map(lambda f: f["height"]).astype("int32"),
                    "bit_depth": feats.map(lambda f: f["bit_depth"]).astype("int32"),
                    "channels": feats.map(lambda f: f["channels"]).astype("int32"),
                    "ok": feats.map(lambda f: f["ok"]),
                }
            )

    return df.mapInPandas(op, schema=FEATURES_SCHEMA)
