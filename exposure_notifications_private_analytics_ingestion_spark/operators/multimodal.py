"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with struct metadata; decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas UDFs over
``mapInPandas`` so each task processes whole record batches (the only sane
shape for CPU-bound media work on Spark).

The container has no image/audio libraries, so the decode kernel is STUBBED:
``decode_image_stub`` raises ``NotImplementedError`` when ``strict=True`` and
otherwise produces a deterministic fake (dimensions derived from byte length)
— the Spark-side plumbing (schema, batch iteration, partition sizing, UDF
signature) is real and tested either way.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, media binary, media_type string, n_bytes long"
)
FEATURES_SCHEMA = (
    "doc_id long, n_bytes long, width int, height int, n_frames int, ok boolean"
)


def attach_media(df: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Synthesize an opaque binary column (UTF-8 bytes of text — the sandbox
    stand-in for real image bytes) plus typed metadata."""
    media = F.encode(F.col(text), "UTF-8")
    return df.select(
        F.col(id_col),
        media.alias("media"),
        F.lit("image/fake").alias("media_type"),
        F.octet_length(media).cast("long").alias("n_bytes"),
    )


def decode_image_stub(buf: bytes, strict: bool = False) -> dict:
    """STUB — real impl would be PIL/libvips. Deterministic fake features."""
    if strict:
        raise NotImplementedError(
            "image decode requires PIL/libvips — not present in this container"
        )
    n = len(buf)
    return {
        "width": n % 640 + 1,
        "height": (n * 7) % 480 + 1,
        "n_frames": n % 10,
        "ok": True,
    }


def extract_features(df: DataFrame, strict: bool = False) -> DataFrame:
    """mapInPandas feature extraction: whole Arrow batches in, whole batches
    out; the per-row decode happens inside the vectorized batch loop."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["media"].map(lambda b: decode_image_stub(bytes(b), strict))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["n_bytes"],
                    "width": feats.map(lambda f: f["width"]).astype("int32"),
                    "height": feats.map(lambda f: f["height"]).astype("int32"),
                    "n_frames": feats.map(lambda f: f["n_frames"]).astype("int32"),
                    "ok": feats.map(lambda f: f["ok"]),
                }
            )

    return df.mapInPandas(op, schema=FEATURES_SCHEMA)
