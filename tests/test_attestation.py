"""F2 signature-verify attestation: valid golden signatures pass, tampered
payloads / wrong keys / malformed inputs drop (IngestionPipelineIT.java:237-345
contract, ECDSA P-256 over the canonical uuid|payloads message)."""

from __future__ import annotations

import pandas as pd
import pytest

pytest.importorskip("cryptography")

from exposure_notifications_private_analytics_ingestion_spark.model.schema import (
    TURNS_WITH_PAYLOAD_SCHEMA,
)
from exposure_notifications_private_analytics_ingestion_spark.operators.attestation import (
    fixture_signing_key,
    sign_turns_pdf,
)
from exposure_notifications_private_analytics_ingestion_spark.plans.ingestion import (
    IngestionOptions,
    process_turns,
)
from exposure_notifications_private_analytics_ingestion_spark.sources import (
    generate_turns_with_payload,
)

JAN = 1704067200


def _signed_frame(spark, n_convs=3, seed=17):
    pdf = sign_turns_pdf(generate_turns_with_payload(n_convs=n_convs, seed=seed))
    return pdf, spark.createDataFrame(pdf, schema=TURNS_WITH_PAYLOAD_SCHEMA)


def test_valid_signatures_all_pass(spark):
    pdf, df = _signed_frame(spark)
    opts = IngestionOptions(
        window_start_s=JAN, duration_s=12 * 3600, batch_size=100,
        attestation="signature_verify",
    )
    packets, _, _ = process_turns(df, opts)
    assert packets.count() == 2 * len(pdf)


def test_tampered_payload_dropped(spark):
    import base64

    pdf, _ = _signed_frame(spark)
    # tamper one row's first share payload after signing
    bad = pdf.copy()
    shares = [dict(s) for s in bad.at[0, "encrypted_shares"]]
    shares[0] = {**shares[0], "payload": base64.b64encode(b"tampered!").decode()}
    bad.at[0, "encrypted_shares"] = shares
    df = spark.createDataFrame(bad, schema=TURNS_WITH_PAYLOAD_SCHEMA)
    opts = IngestionOptions(
        window_start_s=JAN, duration_s=12 * 3600, batch_size=100,
        attestation="signature_verify",
    )
    packets, _, _ = process_turns(df, opts)
    pk = packets.toPandas()
    assert len(pk) == 2 * (len(pdf) - 1)
    tampered_uuid = f"{bad.at[0, 'conv_id']}#{bad.at[0, 'turn_idx']}"
    assert tampered_uuid not in set(pk["uuid"])


def test_wrong_key_dropped(spark):
    pdf = generate_turns_with_payload(n_convs=2, seed=19)
    signed = sign_turns_pdf(pdf)
    # replace cert_chain with a DIFFERENT key's public key
    other = sign_turns_pdf(pdf, private_key=fixture_signing_key("other-key"))
    signed["cert_chain"] = other["cert_chain"]
    df = spark.createDataFrame(signed, schema=TURNS_WITH_PAYLOAD_SCHEMA)
    opts = IngestionOptions(
        window_start_s=JAN, duration_s=12 * 3600, batch_size=100,
        attestation="signature_verify",
    )
    packets, _, _ = process_turns(df, opts)
    assert packets.count() == 0


def test_malformed_signature_dropped_not_crashing(spark):
    pdf, _ = _signed_frame(spark, n_convs=2, seed=23)
    pdf.loc[pdf.index[:2], "signature"] = "!!!not-base64!!!"
    df = spark.createDataFrame(pdf, schema=TURNS_WITH_PAYLOAD_SCHEMA)
    opts = IngestionOptions(
        window_start_s=JAN, duration_s=12 * 3600, batch_size=100,
        attestation="signature_verify",
    )
    packets, _, _ = process_turns(df, opts)
    assert packets.count() == 2 * (len(pdf) - 2)
