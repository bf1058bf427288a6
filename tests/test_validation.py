"""Ports model/DataShareTest.java:61-494 — happy path, every invalid-field
class, rpit range + root-of-unity property, next_power_two."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from exposure_notifications_private_analytics_ingestion_spark.model.schema import (
    PRIME,
    TURNS_WITH_PAYLOAD_SCHEMA,
    next_power_two,
)
from exposure_notifications_private_analytics_ingestion_spark.model.validate import (
    split_valid,
    validate_turns,
    with_rpit,
)
from exposure_notifications_private_analytics_ingestion_spark.sources import (
    generate_turns_with_payload,
    invalid_fixture_rows,
)

EXPECTED = [
    ("bad-00", "missing_payload"),
    ("bad-01", "missing_created"),
    ("bad-02", "missing_schema_version"),
    ("bad-03", "invalid_schema_version"),
    ("bad-04", "missing_prio_params"),
    ("bad-05", "missing_prime"),
    ("bad-06", "wrong_prime"),
    ("bad-07", "invalid_bins"),
    ("bad-08", "wrong_number_servers"),
    ("bad-09", "share_count_mismatch"),
    ("bad-10", "invalid_base64_payload"),
    ("bad-11", "missing_signature"),
    ("bad-12", "missing_cert_chain"),
    ("bad-13", "missing_epsilon"),
    ("bad-14", "missing_encryption_key_id"),
]


@pytest.fixture(scope="module")
def fixture_df(spark):
    good = generate_turns_with_payload(n_convs=5, seed=7)
    bad = invalid_fixture_rows()
    pdf = pd.concat([good, bad], ignore_index=True)
    return spark.createDataFrame(pdf, schema=TURNS_WITH_PAYLOAD_SCHEMA), len(good)


def test_every_failure_class_detected(fixture_df):
    df, _ = fixture_df
    got = {
        r["conv_id"]: r["invalid_reason"]
        for r in validate_turns(df)
        .filter(F.col("invalid_reason").isNotNull())
        .collect()
    }
    assert got == dict(EXPECTED)


def test_valid_rows_survive_exactly(fixture_df):
    df, n_good = fixture_df
    valid, counters = split_valid(df)
    assert valid.count() == n_good
    counts = {r["invalid_reason"]: r["n"] for r in counters.collect()}
    assert counts == {reason: 1 for _, reason in EXPECTED}
    assert "invalid_reason" not in valid.columns


def test_schema_version_1_is_valid(spark):
    pdf = generate_turns_with_payload(n_convs=1, seed=3).iloc[:2].copy()
    pdf["schema_version"] = pdf["schema_version"].astype("object")
    pdf.at[0, "schema_version"] = 1  # DataShareTest.java:315-438: v1 valid
    pdf.at[1, "schema_version"] = 0  # v0 invalid
    df = spark.createDataFrame(pdf, schema=TURNS_WITH_PAYLOAD_SCHEMA)
    rows = validate_turns(df).select("turn_idx", "invalid_reason").collect()
    by_idx = {r["turn_idx"]: r["invalid_reason"] for r in rows}
    assert by_idx[pdf.iloc[0]["turn_idx"]] is None
    assert by_idx[pdf.iloc[1]["turn_idx"]] == "invalid_schema_version"


def test_rpit_range_determinism_and_roots(spark):
    """model/DataShareTest rpit property: in [0, PRIME), not an n-th root of
    unity for n=nextPow2(bins+1); ours additionally deterministic."""
    pdf = generate_turns_with_payload(n_convs=4, seed=11)
    df = (
        spark.createDataFrame(pdf, schema=TURNS_WITH_PAYLOAD_SCHEMA)
        .withColumn("uuid", F.concat_ws("#", "conv_id", "turn_idx"))
        .withColumn("bins", F.col("prio_params.bins"))
    )
    r1 = with_rpit(df).select("uuid", "bins", "r_pit").toPandas()
    r2 = with_rpit(df).select("uuid", "r_pit").toPandas()
    m = r1.merge(r2, on="uuid", suffixes=("", "_2"))
    assert (m["r_pit"] == m["r_pit_2"]).all()
    assert (r1["r_pit"] >= 0).all() and (r1["r_pit"] < PRIME).all()
    for _, row in r1.iterrows():
        n = next_power_two(int(row["bins"]) + 1)
        assert pow(int(row["r_pit"]), n, PRIME) != 1


def test_next_power_two_exhaustive():
    # model/DataShareTest nextPowerTwo: exhaustive over 31 powers
    assert next_power_two(1) == 1
    for k in range(31):
        p = 1 << k
        assert next_power_two(p) == p
        if p > 2:
            assert next_power_two(p - 1) == p
        assert next_power_two(p + 1) == p * 2
