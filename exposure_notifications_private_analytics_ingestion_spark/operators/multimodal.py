"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with struct metadata; decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas UDFs over
``mapInPandas`` so each task processes whole record batches (the only sane
shape for CPU-bound media work on Spark).

The container has no media libraries (PIL/libvips/ffmpeg), but the decode
kernel is REAL where the stdlib suffices: ``decode_media`` parses PNG IHDR
chunks (``struct`` + ``zlib.crc32`` verification), walks JPEG marker segments
to the SOF0/1/2 frame header, and reads the GIF87a/89a logical screen
descriptor, returning actual width / height / bit depth / channel count from
the bytes. ``encode_png`` emits spec-valid PNG files (signature + IHDR +
zlib-deflated scanlines + IEND, all CRC'd) and ``encode_jpeg_header`` emits a
real JFIF marker stream through SOF0 — the deterministic fixture generators
for ``attach_media``. Audio rides the same way: ``encode_wav`` emits RIFF/WAVE
files with real PCM ramp samples and ``decode_audio`` parses the fmt/data
chunk chain (rate, channels, bits, frame count, duration). Video metadata is
an ISO-BMFF (MP4) box walk: ``encode_mp4_header`` emits ftyp + moov(mvhd,
trak(tkhd)) and ``decode_video`` recursively walks the box tree for
timescale/duration/width/height. PNG goes all the way to PIXELS:
``decode_png_pixels`` inflates and unfilters the scanlines (all five spec
filters) and ``resize_png`` does real nearest-neighbor resampling + filter-0
re-encode — so ``resize_images`` performs genuine pixel work, stdlib only.
Only genuinely unknown formats fall back to a clearly-marked stub row
(``ok=False``); pixel/sample-level decode of JPEG/video entropy streams would
still need PIL/libvips/ffmpeg.

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
AUDIO_FEATURES_SCHEMA = (
    "doc_id long, format string, codec string, sample_rate int, channels int, "
    "bits int, n_frames long, duration_ms long, ok boolean"
)
VIDEO_FEATURES_SCHEMA = (
    "doc_id long, format string, width int, height int, duration_ms long, "
    "timescale int, ok boolean"
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


def encode_gif(width: int, height: int) -> bytes:
    """GIF89a header + logical screen descriptor + trailer: real signature
    and little-endian dimensions (spec §17-18), no color table, no image
    data — a header fixture, like ``encode_jpeg_header``."""
    return (
        b"GIF89a"
        + struct.pack("<HH", width, height)
        + b"\x00\x00\x00"  # no GCT, bg color 0, aspect 0
        + b"\x3b"  # trailer
    )


def encode_wav(
    sample_rate: int, n_frames: int, channels: int = 1, bits: int = 16
) -> bytes:
    """Spec-valid RIFF/WAVE PCM file: RIFF header, fmt chunk (PCM format 1,
    real byte-rate/block-align math), and a data chunk of deterministic ramp
    samples — playable by any conforming reader."""
    import numpy as np

    block_align = channels * bits // 8
    byte_rate = sample_rate * block_align
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate, block_align, bits)
    amp = (1 << (bits - 1)) - 1
    # vectorized ramp — byte-identical to per-sample struct.pack("<h"/"<b")
    # of ((i*37) % amp) - amp//2 (values fit the signed width), ~40M
    # fewer Python calls per 10×-scale corpus
    samples = (
        np.arange(n_frames * channels, dtype=np.int64) * 37
    ) % amp - amp // 2
    data = samples.astype("<i2" if bits == 16 else "<i1").tobytes()
    riff_len = 4 + (8 + len(fmt)) + (8 + len(data))
    return (
        b"RIFF"
        + struct.pack("<I", riff_len)
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def _mp4_box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", len(payload) + 8) + btype + payload


def encode_mp4_header(
    width: int, height: int, duration_ms: int, timescale: int = 1000
) -> bytes:
    """Minimal ISO-BMFF (MP4) metadata stream: ftyp + moov containing a
    version-0 mvhd (timescale, duration) and one trak/tkhd with 16.16
    fixed-point width/height — the boxes every real mp4 parser reads for
    stream metadata. No mdat, so it is a header fixture, not playable
    media."""
    duration = duration_ms * timescale // 1000
    mvhd = _mp4_box(
        b"mvhd",
        struct.pack(">B3x", 0)  # version 0, flags
        + struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">IH2x8x36xI", 0x00010000, 0x0100, 0)  # rate, volume, ...
        + b"\x00" * 20,  # remaining matrix/predefined + next_track_id slot
    )
    tkhd = _mp4_box(
        b"tkhd",
        struct.pack(">B3x", 0)
        + struct.pack(">IIIII", 0, 0, 1, 0, duration)  # times, track 1
        + b"\x00" * 52  # reserved, layer, volume, matrix
        + struct.pack(">II", width << 16, height << 16),
    )
    moov = _mp4_box(b"moov", mvhd + _mp4_box(b"trak", tkhd))
    ftyp = _mp4_box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    return ftyp + moov


# ---------------------------------------------------------------- decoder


def _decode_media_raising(buf: bytes, strict: bool = False) -> dict:
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
    if buf[:6] in (b"GIF87a", b"GIF89a"):
        if len(buf) < 10:
            raise ValueError("GIF: truncated logical screen descriptor")
        width, height = struct.unpack("<HH", buf[6:10])
        return {
            "format": "gif",
            "width": width,
            "height": height,
            "bit_depth": 8,
            "channels": 1,  # palette-indexed
            "ok": True,
        }
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


def _decode_audio_raising(buf: bytes, strict: bool = False) -> dict:
    """Parse RIFF/WAVE metadata by walking the chunk chain (spec: 8-byte
    chunk headers, word-aligned): reads the fmt chunk for format / channels /
    rate / bits and the data chunk length for the frame count and duration.
    Real math over real bytes; unknown formats stub out like
    ``decode_media``."""
    if buf[:4] == b"RIFF" and buf[8:12] == b"WAVE":
        i = 12
        fmt = None
        data_len = None
        while i + 8 <= len(buf):
            ctype = buf[i : i + 4]
            (clen,) = struct.unpack("<I", buf[i + 4 : i + 8])
            if ctype == b"fmt ":
                fmt = struct.unpack("<HHIIHH", buf[i + 8 : i + 24])
            elif ctype == b"data":
                data_len = clen
            i += 8 + clen + (clen & 1)  # chunks are word-aligned
        if fmt is None or data_len is None:
            raise ValueError("WAV: missing fmt or data chunk")
        audio_fmt, channels, rate, _byte_rate, block_align, bits = fmt
        n_frames = data_len // block_align if block_align else 0
        return {
            "format": "wav",
            "codec": "pcm" if audio_fmt == 1 else f"fmt{audio_fmt}",
            "sample_rate": rate,
            "channels": channels,
            "bits": bits,
            "n_frames": n_frames,
            "duration_ms": (n_frames * 1000) // rate if rate else 0,
            "ok": True,
        }
    if strict:
        raise ValueError(f"unknown audio format (leading bytes {buf[:4]!r})")
    return {
        "format": "unknown", "codec": "", "sample_rate": 0, "channels": 0,
        "bits": 0, "n_frames": 0, "duration_ms": 0, "ok": False,
    }


def _walk_boxes(buf: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end) for each ISO-BMFF box in
    [start, end); 32-bit sizes only (size 0/1 extensions raise — our fixtures
    and any small header stream never need 64-bit boxes)."""
    i = start
    while i + 8 <= end:
        (size,) = struct.unpack(">I", buf[i : i + 4])
        btype = buf[i + 4 : i + 8]
        if size < 8:
            raise ValueError(f"MP4: unsupported box size {size} at {i}")
        yield btype, i + 8, i + size
        i += size


def _decode_video_raising(buf: bytes, strict: bool = False) -> dict:
    """Parse MP4 (ISO-BMFF) stream metadata by recursively walking the box
    tree: mvhd yields timescale/duration, the first tkhd yields 16.16
    fixed-point width/height — the same boxes ffprobe reads for stream
    info."""
    boxes = dict((t, (s, e)) for t, s, e in _walk_boxes(buf, 0, len(buf)))
    if b"ftyp" in boxes and b"moov" in boxes:
        out = {"format": "mp4", "width": 0, "height": 0, "duration_ms": 0,
               "timescale": 0, "ok": True}
        ms, me = boxes[b"moov"]
        for btype, s, e in _walk_boxes(buf, ms, me):
            if btype == b"mvhd":
                version = buf[s]
                if version != 0:
                    raise ValueError("MP4: only version-0 mvhd supported")
                _, _, timescale, duration = struct.unpack(">IIII", buf[s + 4 : s + 20])
                out["timescale"] = timescale
                out["duration_ms"] = duration * 1000 // timescale if timescale else 0
            elif btype == b"trak" and not out["width"]:
                for t2, s2, e2 in _walk_boxes(buf, s, e):
                    if t2 == b"tkhd":
                        w_fixed, h_fixed = struct.unpack(">II", buf[e2 - 8 : e2])
                        out["width"], out["height"] = w_fixed >> 16, h_fixed >> 16
        return out
    if strict:
        raise ValueError(f"unknown video format (leading bytes {buf[:8]!r})")
    return {"format": "unknown", "width": 0, "height": 0, "duration_ms": 0,
            "timescale": 0, "ok": False}




# --------------------------------------------------------- total decoders
#
# The raising parsers above assume recognized formats are WELL-FORMED; at
# corpus scale that assumption is false (truncated uploads with valid
# magic are routine), and an uncaught ValueError inside mapInPandas kills
# the whole task. The public decoders are TOTAL in non-strict mode: any
# parse failure degrades to a stub row carrying the sniffed format and
# ok=False (hypothesis pins "never raises on arbitrary bytes" in
# tests/test_property.py). strict=True keeps the raising contract for
# validation pipelines.

_PARSE_ERRORS = (ValueError, struct.error, IndexError)


def decode_media(buf: bytes, strict: bool = False) -> dict:
    try:
        return _decode_media_raising(buf, strict)
    except _PARSE_ERRORS:
        if strict:
            raise
        fmt = ("png" if buf[:8] == _PNG_SIG else
               "jpeg" if buf[:2] == b"\xff\xd8" else
               "gif" if buf[:6] in (b"GIF87a", b"GIF89a") else "unknown")
        return {"format": fmt, "width": 0, "height": 0, "bit_depth": 0,
                "channels": 0, "ok": False}


def decode_audio(buf: bytes, strict: bool = False) -> dict:
    try:
        return _decode_audio_raising(buf, strict)
    except _PARSE_ERRORS:
        if strict:
            raise
        fmt = "wav" if buf[:4] == b"RIFF" and buf[8:12] == b"WAVE" else "unknown"
        return {"format": fmt, "codec": "", "sample_rate": 0, "channels": 0,
                "bits": 0, "n_frames": 0, "duration_ms": 0, "ok": False}


def decode_video(buf: bytes, strict: bool = False) -> dict:
    try:
        return _decode_video_raising(buf, strict)
    except _PARSE_ERRORS:
        if strict:
            raise
        return {"format": "unknown", "width": 0, "height": 0,
                "duration_ms": 0, "timescale": 0, "ok": False}


# ------------------------------------------------------------ Spark plumbing


def _media_dims(doc_id: int) -> tuple[int, int]:
    """Deterministic fixture dimensions — SQL-expressible so the DuckDB
    oracle can predict them: width = doc_id % 640 + 1, height =
    (doc_id * 7) % 480 + 1."""
    return int(doc_id) % 640 + 1, (int(doc_id) * 7) % 480 + 1


def attach_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize a real binary media column per document: doc_id % 3 picks
    a spec-valid grayscale PNG, a JFIF/SOF0 JPEG header, or a GIF89a header
    — all with deterministic dimensions derived from doc_id. Runs as one
    ``mapInPandas`` projection (narrow, no shuffle); at 100 TB the same
    plumbing would read the bytes from the lake instead of generating them."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            media, mtype = [], []
            for doc_id in pdf[id_col]:
                w, h = _media_dims(doc_id)
                pick = int(doc_id) % 3
                if pick == 0:
                    media.append(encode_png(w, h, gray=int(doc_id) % 256))
                    mtype.append("image/png")
                elif pick == 1:
                    media.append(encode_jpeg_header(w, h))
                    mtype.append("image/jpeg")
                else:
                    media.append(encode_gif(w, h))
                    mtype.append("image/gif")
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "media": media,
                    "media_type": mtype,
                    "n_bytes": [len(b) for b in media],
                }
            )

    return df.select(id_col).mapInPandas(op, schema=MEDIA_SCHEMA)


def _audio_params(doc_id: int) -> tuple[int, int, int]:
    """Deterministic audio fixture parameters, SQL-expressible for the
    oracle: rate ∈ {8,12,16,22.05,24} kHz by doc_id % 5, frames =
    doc_id % 900 + 100, channels = doc_id % 2 + 1."""
    rates = (8000, 12000, 16000, 22050, 24000)
    return rates[int(doc_id) % 5], int(doc_id) % 900 + 100, int(doc_id) % 2 + 1


def _video_params(doc_id: int) -> tuple[int, int, int]:
    """Deterministic video fixture parameters: width = doc_id % 1280 + 16,
    height = (doc_id * 3) % 720 + 16, duration_ms = (doc_id % 3600) * 100 +
    1000."""
    return (
        int(doc_id) % 1280 + 16,
        (int(doc_id) * 3) % 720 + 16,
        (int(doc_id) % 3600) * 100 + 1000,
    )


def attach_audio(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize a real RIFF/WAVE PCM column per document (see
    ``_audio_params``); same narrow ``mapInPandas`` shape as
    ``attach_media``."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            params = [_audio_params(d) for d in pdf[id_col]]
            media = [encode_wav(r, n, channels=c) for r, n, c in params]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "media": media,
                    "media_type": ["audio/wav"] * len(media),
                    "n_bytes": [len(b) for b in media],
                }
            )

    return df.select(id_col).mapInPandas(op, schema=MEDIA_SCHEMA)


def attach_video(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize a real MP4 (ftyp+moov) metadata stream per document (see
    ``_video_params``)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            media = [encode_mp4_header(*_video_params(d)) for d in pdf[id_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "media": media,
                    "media_type": ["video/mp4"] * len(media),
                    "n_bytes": [len(b) for b in media],
                }
            )

    return df.select(id_col).mapInPandas(op, schema=MEDIA_SCHEMA)


def extract_audio_features(df: DataFrame, strict: bool = False) -> DataFrame:
    """Arrow-batched RIFF chunk-walk over the binary column."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["media"].map(lambda b: decode_audio(bytes(b), strict))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "format": feats.map(lambda f: f["format"]),
                    "codec": feats.map(lambda f: f["codec"]),
                    "sample_rate": feats.map(lambda f: f["sample_rate"]).astype("int32"),
                    "channels": feats.map(lambda f: f["channels"]).astype("int32"),
                    "bits": feats.map(lambda f: f["bits"]).astype("int32"),
                    "n_frames": feats.map(lambda f: f["n_frames"]).astype("int64"),
                    "duration_ms": feats.map(lambda f: f["duration_ms"]).astype("int64"),
                    "ok": feats.map(lambda f: f["ok"]),
                }
            )

    return df.mapInPandas(op, schema=AUDIO_FEATURES_SCHEMA)


def extract_video_features(df: DataFrame, strict: bool = False) -> DataFrame:
    """Arrow-batched ISO-BMFF box walk over the binary column."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["media"].map(lambda b: decode_video(bytes(b), strict))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "format": feats.map(lambda f: f["format"]),
                    "width": feats.map(lambda f: f["width"]).astype("int32"),
                    "height": feats.map(lambda f: f["height"]).astype("int32"),
                    "duration_ms": feats.map(lambda f: f["duration_ms"]).astype("int64"),
                    "timescale": feats.map(lambda f: f["timescale"]).astype("int32"),
                    "ok": feats.map(lambda f: f["ok"]),
                }
            )

    return df.mapInPandas(op, schema=VIDEO_FEATURES_SCHEMA)


def frame_sample_points(
    features: DataFrame, every_ms: int = 1000, keep_cols: list[str] | None = None
) -> DataFrame:
    """Frame-sampling plan: one row per (doc_id, sample_ms) at a fixed
    cadence over [0, duration_ms). Pure JVM ``sequence`` + ``explode`` —
    the expensive part of real frame extraction (seek + decode at each
    sample point) would slot into a ``mapInPandas`` kernel downstream, but
    the sampling SCHEDULE itself never needs Python. ``keep_cols`` rides
    metadata columns through the explode so callers don't self-join (and
    re-decode) the features frame."""
    return features.select(
        "doc_id",
        *(keep_cols or []),
        F.explode(
            F.sequence(
                F.lit(0).cast("long"),
                (F.col("duration_ms") - 1).cast("long"),
                F.lit(int(every_ms)).cast("long"),
            )
        ).alias("sample_ms"),
    )


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


# ------------------------------------------------------------------ resize

RESIZED_SCHEMA = (
    "doc_id long, media binary, media_type string, width int, height int,"
    " ok boolean"
)


def _png_unfilter(raw: bytes, width: int, height: int, channels: int) -> list[bytes]:
    """Undo per-scanline PNG filters (spec §6.3: None/Sub/Up/Average/Paeth).
    Filter-0 rows are a straight copy; the recursive filters run in plain
    Python — correct for any conforming 8-bit stream, fast enough for the
    batch sizes a mapInPandas task sees."""
    stride = width * channels
    bpp = channels
    rows: list[bytes] = []
    prev = bytes(stride)
    pos = 0
    for _ in range(height):
        ftype = raw[pos]
        pos += 1
        if ftype == 0:
            cur_b = raw[pos : pos + stride]
            pos += stride
            rows.append(cur_b)
            prev = cur_b
            continue
        cur = bytearray(raw[pos : pos + stride])
        pos += stride
        if ftype == 1:  # Sub
            for i in range(bpp, stride):
                cur[i] = (cur[i] + cur[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                cur[i] = (cur[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                cur[i] = (cur[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (cur[i] + pr) & 0xFF
        else:
            raise ValueError(f"PNG: unknown filter type {ftype}")
        rows.append(bytes(cur))
        prev = rows[-1]
    return rows


def decode_png_pixels(buf: bytes) -> tuple[int, int, int, list[bytes]]:
    """(width, height, color_type, scanlines): FULL pixel decode of an 8-bit
    non-interlaced grayscale/gray+alpha/RGB/RGBA PNG — chunk walk, zlib
    inflate of the concatenated IDATs, per-scanline unfilter. Stdlib only.
    Palette (color type 3) and sub-8-bit depths raise: resampling palette
    indexes or packed pixels needs tables this kernel deliberately does not
    fake."""
    if buf[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    width = height = None
    color_type = -1
    idat: list[bytes] = []
    while pos + 8 <= len(buf):
        (clen,) = struct.unpack(">I", buf[pos : pos + 4])
        ctype = buf[pos + 4 : pos + 8]
        payload = buf[pos + 8 : pos + 8 + clen]
        if ctype == b"IHDR":
            if len(payload) != 13:
                raise ValueError(f"PNG: IHDR payload length {len(payload)} != 13")
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", payload)
            )
            if bit_depth != 8:
                raise ValueError(f"PNG resize: bit depth {bit_depth} unsupported")
            if interlace:
                raise ValueError("PNG resize: Adam7 interlacing unsupported")
            if color_type not in (0, 2, 4, 6):
                raise ValueError(f"PNG resize: color type {color_type} unsupported")
        elif ctype == b"IDAT":
            idat.append(payload)
        elif ctype == b"IEND":
            break
        pos += 12 + clen
    if width is None or not idat:
        raise ValueError("PNG: missing IHDR or IDAT")
    if width == 0 or height == 0:
        raise ValueError("PNG: zero-dimension image")
    channels = _PNG_CHANNELS[color_type]
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as e:
        raise ValueError(f"PNG: corrupt IDAT deflate stream ({e})") from e
    if len(raw) != height * (1 + width * channels):
        raise ValueError("PNG: inflated length does not match dimensions")
    return width, height, color_type, _png_unfilter(raw, width, height, channels)


def resize_png(buf: bytes, out_w: int, out_h: int) -> bytes:
    """Nearest-neighbor PNG resize, stdlib only: full pixel decode →
    center-aligned sample (src index = ((2i+1)·S) // (2·D), the standard
    half-pixel-offset NN map) → re-encode as filter-0 scanlines. Output is a
    spec-valid PNG with the source's color type at (out_w, out_h)."""
    if out_w <= 0 or out_h <= 0:
        raise ValueError("resize_png: target dimensions must be positive")
    w, h, color_type, rows = decode_png_pixels(buf)
    ch = _PNG_CHANNELS[color_type]
    xmap = [min(((2 * x + 1) * w) // (2 * out_w), w - 1) * ch for x in range(out_w)]
    out = bytearray()
    for y in range(out_h):
        src = rows[min(((2 * y + 1) * h) // (2 * out_h), h - 1)]
        out.append(0)  # filter type None
        if ch == 1:
            out.extend(bytes(map(src.__getitem__, xmap)))
        else:
            for sx in xmap:
                out.extend(src[sx : sx + ch])
    ihdr = struct.pack(">IIBBBBB", out_w, out_h, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(out), 6))
        + _png_chunk(b"IEND", b"")
    )


def resize_images(
    df: DataFrame, out_w: int = 64, out_h: int = 64, strict: bool = False
) -> DataFrame:
    """mapInPandas nearest-neighbor resize over a (doc_id, media, media_type)
    frame: PNGs are re-encoded at (out_w, out_h) with REAL pixel resampling
    (``resize_png``); header-only formats (the JPEG/GIF fixtures carry no
    pixel data) and undecodable PNGs pass through unchanged with ``ok=False``
    — or raise when ``strict``. Narrow projection, no shuffle: at 100 TB this
    is embarrassingly parallel per-file CPU work, exactly what the Arrow
    batch path is for."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            media, ws, hs, oks = [], [], [], []
            for b in pdf["media"]:
                bb = bytes(b)
                if bb[:8] == _PNG_SIG:
                    # struct/zlib errors included for totality: one corrupt
                    # blob must degrade to ok=False, never kill the task
                    try:
                        media.append(resize_png(bb, out_w, out_h))
                        ws.append(out_w)
                        hs.append(out_h)
                        oks.append(True)
                        continue
                    except (ValueError, struct.error, zlib.error):
                        if strict:
                            raise
                elif strict:
                    raise ValueError(
                        f"resize: no pixel decoder for leading bytes {bb[:4]!r}"
                    )
                d = decode_media(bb, strict=False)
                media.append(bb)
                ws.append(d["width"])
                hs.append(d["height"])
                oks.append(False)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "media": media,
                    "media_type": pdf["media_type"],
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "ok": oks,
                }
            )

    return df.select("doc_id", "media", "media_type").mapInPandas(
        op, schema=RESIZED_SCHEMA
    )
