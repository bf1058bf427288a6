"""M1 — manifest-driven configuration.

Reference: ``DataProcessorManifest`` fetches a JSON manifest per data
processor (PHA / facilitator) and rewrites the pipeline options from it —
``ingestion-bucket`` identity + AWS role/region
(``pipeline/DataProcessorManifest.java:79-112``; merge into options
``pipeline/IngestionPipeline.java:164-189``).

Here: a local-path/``file://`` JSON loader with the same field surface
(HTTP fetch is a one-line swap on a networked cluster; the sandbox has no
egress). ``merge_manifest_options`` mirrors the reference's precedence:
explicit options win, manifest fills the gaps.
"""

from __future__ import annotations

import json
from dataclasses import dataclass


@dataclass
class DataProcessorManifest:
    ingestion_bucket: str
    aws_bucket_role: str | None = None
    aws_bucket_region: str | None = None

    @classmethod
    def load(cls, path: str) -> "DataProcessorManifest":
        p = path.removeprefix("file://")
        with open(p) as f:
            raw = json.load(f)
        if "ingestion-bucket" not in raw:
            raise ValueError(f"manifest missing 'ingestion-bucket': {path}")
        return cls(
            ingestion_bucket=raw["ingestion-bucket"],
            aws_bucket_role=raw.get("ingestion-identity"),
            aws_bucket_region=raw.get("ingestion-bucket-region"),
        )


def merge_manifest_options(
    output: str | None, manifest_path: str | None
) -> str:
    """Explicit output wins; otherwise the manifest's bucket (the
    reference's option-rewrite precedence, IngestionPipeline.java:240-251)."""
    if output:
        return output
    if manifest_path:
        return DataProcessorManifest.load(manifest_path).ingestion_bucket
    raise ValueError("either an explicit output or a manifest is required")
