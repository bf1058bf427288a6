"""F2 — pluggable device-attestation stage.

Reference: ``AbstractDeviceAttestation`` is a whole-collection
``PTransform<PCollection<DataShare>, PCollection<DataShare>>`` discovered via
``ServiceLoader`` (``pipeline/IngestionPipeline.java:67-77``,
``attestation/AbstractDeviceAttestation.java:32-43``); deliberately not a
per-row predicate so implementations may compute distributions.

Spark shape: a registry of ``DataFrame → DataFrame`` callables. The default
implementation checks the signature/cert surface is present and well-formed —
the sandbox stand-in for cryptographic attestation (no device keys here).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

AttestationStage = Callable[[DataFrame], DataFrame]

_REGISTRY: dict[str, AttestationStage] = {}


def register_attestation(name: str, stage: AttestationStage) -> None:
    _REGISTRY[name] = stage


def get_attestation(name: str | None) -> AttestationStage | None:
    if name is None:
        return None
    return _REGISTRY[name]


def signature_presence_attestation(df: DataFrame) -> DataFrame:
    """Keep rows with a non-empty signature and ≥1 certificate."""
    if "signature" not in df.columns:
        return df
    return df.filter(
        F.col("signature").isNotNull()
        & (F.length("signature") > 0)
        & F.col("cert_chain").isNotNull()
        & (F.size("cert_chain") > 0)
    )


register_attestation("signature_presence", signature_presence_attestation)
