"""Deterministic synthetic transcript tables.

The engine's primary input (``BASELINE.json.input_hint``) is an Iceberg table
``turns(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp)`` partitioned by ``hours(ts)`` — the analog of the reference's
hourly Firestore collections ``yyyy-MM-dd-HH``
(``pipeline/FirestoreConnector.java:142-150``). No Iceberg runtime jar ships
with this sandbox's PySpark, so the physical layout is hour-partitioned
parquet (identical partition-pruning behavior for the scan paths we use); the
write/read helpers keep an Iceberg-shaped surface so a catalog can be swapped
in via config on a real cluster.

Generation is seeded and pure-numpy: skewed (zipf-ish) conversation lengths
with a few hot conversations (exercises salting), ts spanning multiple hourly
windows, ~2% late rows, and optional duplicate injection (the overlapping
hourly scans that force Distinct in ``pipeline/IngestionPipeline.java:110-119``).
"""

from __future__ import annotations

import base64

import numpy as np
import pandas as pd

ROLES = np.array(["user", "assistant", "tool", "system"])
TOOLS = np.array(["", "search", "bash", "python", "browser"])
_WORDS = np.array(
    "the of and to in is that it for on with as at by from or an be this have "
    "not are but had his they you were her she which will one all would there "
    "their what so up out if about who get into over think also back after use "
    "two how our work first well way even new want because any these give day "
    "most us model data spark stream batch window state shuffle partition".split()
)

EPOCH = np.datetime64("2024-01-01T00:00:00", "us")


def generate_turns(
    n_convs: int = 200,
    seed: int = 42,
    hours: int = 6,
    dup_frac: float = 0.02,
    late_frac: float = 0.02,
    hot_convs: int = 2,
    hot_mult: int = 50,
) -> pd.DataFrame:
    """Seeded turn stream. Median conv ≈ 8 turns; ``hot_convs`` conversations
    get ``hot_mult``× the median (skew for salting tests)."""
    rng = np.random.default_rng(seed)
    lens = rng.zipf(1.6, size=n_convs).clip(1, 64) + 3
    lens[:hot_convs] = int(np.median(lens)) * hot_mult
    conv_ids = np.repeat([f"conv-{i:06d}" for i in range(n_convs)], lens)
    turn_idx = np.concatenate([np.arange(n) for n in lens]).astype(np.int32)
    n = len(conv_ids)

    roles = ROLES[np.where(turn_idx % 2 == 0, 0, rng.integers(1, 4, n))]
    tools = np.where(roles == "tool", TOOLS[rng.integers(1, len(TOOLS), n)], "")
    n_words = rng.integers(3, 24, n)
    starts = rng.integers(0, len(_WORDS) - 24, n)
    texts = np.array(
        [" ".join(_WORDS[s : s + w]) for s, w in zip(starts, n_words)], dtype=object
    )

    # conversation start time + per-turn increments; monotone within conv
    conv_start_s = rng.integers(0, hours * 3600, n_convs)
    gaps = rng.integers(1, 120, n)
    offs = np.concatenate(
        [np.cumsum(gaps[i : i + L]) for i, L in zip(np.cumsum(lens) - lens, lens)]
    )
    ts_s = np.repeat(conv_start_s, lens) + offs
    late = rng.random(n) < late_frac
    ts_s = np.where(late, np.maximum(ts_s.astype(np.int64) - 1800, 0), ts_s)
    ts = EPOCH + (ts_s * 1_000_000).astype("timedelta64[us]")

    pdf = pd.DataFrame(
        {
            "conv_id": conv_ids,
            "turn_idx": turn_idx,
            "role": roles,
            "text": texts,
            "tool": tools,
            "ts": ts,
        }
    )
    if dup_frac > 0:
        k = int(n * dup_frac)
        dup = pdf.iloc[rng.integers(0, n, k)]
        pdf = pd.concat([pdf, dup], ignore_index=True)
        pdf = pdf.iloc[rng.permutation(len(pdf))].reset_index(drop=True)
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    return pdf


def _b64(s: str) -> str:
    return base64.b64encode(s.encode()).decode()


def generate_turns_with_payload(n_convs: int = 50, seed: int = 7, **kw) -> pd.DataFrame:
    """turns + nested Prio payload columns (FIXTURES.md §2), all valid.

    Canonical values from the reference's own fixtures
    (``model/DataShareTest.java:44-56,527-539``).
    """
    pdf = generate_turns(n_convs=n_convs, seed=seed, dup_frac=0.0, **kw)
    n = len(pdf)
    pdf["signature"] = [_b64(f"sig-{i}") for i in range(n)]
    pdf["cert_chain"] = [["cert1", "cert2"] for _ in range(n)]
    pdf["schema_version"] = np.int32(2)
    pdf["prio_params"] = [
        {"prime": 4293918721, "epsilon": 5.2933, "bins": 2, "number_servers": 2,
         "hamming_weight": 1}
        for _ in range(n)
    ]
    pdf["encrypted_shares"] = [
        [
            {"encryption_key_id": "fakeEncryptionKeyId1", "payload": _b64(t + "|pha")},
            {"encryption_key_id": "fakeEncryptionKeyId2", "payload": _b64(t + "|fac")},
        ]
        for t in pdf["text"]
    ]
    return pdf


def invalid_fixture_rows() -> pd.DataFrame:
    """One row per failure class (FIXTURES.md §2a / model/DataShareTest.java:87-477)."""
    base = generate_turns_with_payload(n_convs=3, seed=1).iloc[:15].reset_index(drop=True)
    base["conv_id"] = [f"bad-{i:02d}" for i in range(len(base))]

    def null(i, col):
        base.at[i, col] = None

    # 0 missing_payload: whole payload absent
    for c in ("schema_version", "prio_params", "encrypted_shares"):
        null(0, c)
    base["schema_version"] = base["schema_version"].astype("object")
    base.at[0, "schema_version"] = None
    null(1, "ts")  # missing_created
    base.at[2, "schema_version"] = None  # missing_schema_version
    base.at[3, "schema_version"] = 3  # invalid_schema_version (LATEST+1)
    null(4, "prio_params")  # missing_prio_params
    base.at[5, "prio_params"] = {**base.at[5, "prio_params"], "prime": None}
    base.at[6, "prio_params"] = {**base.at[6, "prio_params"], "prime": 17}  # wrong_prime
    base.at[7, "prio_params"] = {**base.at[7, "prio_params"], "bins": -1}  # invalid_bins
    base.at[8, "prio_params"] = {**base.at[8, "prio_params"], "number_servers": 3}
    base.at[9, "encrypted_shares"] = base.at[9, "encrypted_shares"][:1]  # count mismatch
    base.at[10, "encrypted_shares"] = [
        {"encryption_key_id": "k", "payload": "!!!not-base64!!!"},
        {"encryption_key_id": "k", "payload": "!!!not-base64!!!"},
    ]
    null(11, "signature")  # missing_signature
    base.at[12, "cert_chain"] = []  # missing_cert_chain
    base.at[13, "prio_params"] = {**base.at[13, "prio_params"], "epsilon": None}
    base.at[14, "encrypted_shares"] = [  # missing_encryption_key_id
        {"encryption_key_id": None, "payload": _b64("x|pha")},
        {"encryption_key_id": "k2", "payload": _b64("x|fac")},
    ]
    return base


def write_turns_table(spark, pdf: pd.DataFrame, path: str, partition_by_hour: bool = True):
    """Hour-partitioned parquet write — the sandbox stand-in for Iceberg
    ``PARTITIONED BY (hours(ts))``."""
    from pyspark.sql import functions as F

    from ..model.schema import TURNS_SCHEMA

    df = spark.createDataFrame(pdf, schema=TURNS_SCHEMA)
    if partition_by_hour:
        (
            df.withColumn("ts_hour", F.date_format("ts", "yyyy-MM-dd-HH"))
            .write.mode("overwrite")
            .partitionBy("ts_hour")
            .parquet(path)
        )
    else:
        df.write.mode("overwrite").parquet(path)
    return path
