"""M1 — manifest-driven configuration.

Reference: ``DataProcessorManifest`` fetches a JSON manifest per data
processor (PHA / facilitator) and rewrites the pipeline options from it —
``ingestion-bucket`` identity + AWS role/region
(``pipeline/DataProcessorManifest.java:79-112``; merge into options
``pipeline/IngestionPipeline.java:164-189``).

Loaders: local path / ``file://`` and ``http(s)://`` (urllib — the
reference's fetch path, same invalid-URL error contract as
``DataProcessorManifestTest.java:30-53``: a malformed or unreachable URL
raises ``ManifestFetchError`` naming the URL). ``merge_manifest_options``
mirrors the reference's precedence: explicit options win, manifest fills
the gaps.
"""

from __future__ import annotations

import json
from dataclasses import dataclass


class ManifestFetchError(ValueError):
    """Invalid/unreachable manifest URL or malformed manifest body
    (DataProcessorManifest.java:79-112 throws IllegalArgumentException)."""


@dataclass
class DataProcessorManifest:
    ingestion_bucket: str
    aws_bucket_role: str | None = None
    aws_bucket_region: str | None = None

    @classmethod
    def load(cls, path: str) -> "DataProcessorManifest":
        if path.startswith(("http://", "https://")):
            raw = cls._fetch_http(path)
        else:
            p = path.removeprefix("file://")
            try:
                with open(p) as f:
                    raw = json.load(f)
            except OSError as e:
                raise ManifestFetchError(f"cannot read manifest {path!r}: {e}") from e
            except json.JSONDecodeError as e:
                raise ManifestFetchError(f"manifest {path!r} is not JSON: {e}") from e
        if not isinstance(raw, dict) or "ingestion-bucket" not in raw:
            raise ManifestFetchError(f"manifest missing 'ingestion-bucket': {path}")
        return cls(
            ingestion_bucket=raw["ingestion-bucket"],
            aws_bucket_role=raw.get("ingestion-identity"),
            aws_bucket_region=raw.get("ingestion-bucket-region"),
        )

    @staticmethod
    def _fetch_http(url: str, timeout_s: float = 10.0) -> dict:
        """HTTP manifest fetch (DataProcessorManifest.java:79-112). Any
        failure — bad URL, connection error, non-200, non-JSON body — maps to
        ManifestFetchError with the URL, matching the reference's
        invalid-URL contract (DataProcessorManifestTest.java:30-53)."""
        import urllib.error
        import urllib.request

        try:
            req = urllib.request.Request(
                url, headers={"Accept": "application/json"}
            )
            with urllib.request.urlopen(req, timeout=timeout_s) as resp:
                if getattr(resp, "status", 200) != 200:
                    raise ManifestFetchError(
                        f"manifest fetch {url!r} returned HTTP {resp.status}"
                    )
                body = resp.read()
        except ManifestFetchError:
            raise
        except (urllib.error.URLError, ValueError, OSError) as e:
            raise ManifestFetchError(f"cannot fetch manifest {url!r}: {e}") from e
        try:
            return json.loads(body)
        except json.JSONDecodeError as e:
            raise ManifestFetchError(f"manifest {url!r} is not JSON: {e}") from e


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
