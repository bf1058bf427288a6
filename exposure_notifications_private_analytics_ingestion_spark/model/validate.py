"""Parse/validate/drop-invalid stage (V1) + rpit generation (V2).

Reference parity: ``model/DataShare.from()`` (``model/DataShare.java:109-272``)
validates one Firestore document at a time, throwing
``InvalidDataShareException`` per failure class; the DoFn catches, counts, and
drops (``model/DataShare.java:316-332``). Here the whole check chain is a
single Catalyst ``when`` cascade (whole-stage codegen, no Python), producing an
``invalid_reason`` column; dropping + per-class counting are then plain
``filter`` / ``groupBy`` — counters come for free as a DataFrame instead of
Beam metric side-channels.

rpit (``model/DataShare.java:190-205,368-383``) is a random field element of
``[0, PRIME)`` that is not an n-th root of unity for ``n = nextPow2(bins+1)``.
The reference uses ``SecureRandom`` (nondeterministic; its own IT therefore
excludes rpit from parity — ``IngestionPipelineIT.java:525-530``). We make it
deterministic-per-row (md5 of uuid + attempt, rejection-sampled) so reruns are
reproducible — computed in an Arrow-vectorized pandas UDF with numpy modpow by
repeated squaring (values < 2^32 so squares fit uint64).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .schema import LATEST_SCHEMA_VERSION, MIN_SCHEMA_VERSION, NUMBER_OF_SERVERS, PRIME

_B64_RE = r"^[A-Za-z0-9+/]*={0,2}$"


def _is_b64(col: Column) -> Column:
    return col.isNotNull() & col.rlike(_B64_RE) & (F.length(col) % 4 == 0)


def invalid_reason_col() -> Column:
    """The full DataShare.from() check chain as one when-cascade.

    Check order mirrors model/DataShare.java:109-272: payload → created →
    schemaVersion → prioParams(prime/epsilon/bins/numberServers) →
    encryptedDataShares → signature → certificateChain.
    """
    payload_missing = (
        F.col("schema_version").isNull()
        & F.col("prio_params").isNull()
        & F.col("encrypted_shares").isNull()
    )
    return (
        F.when(payload_missing, F.lit("missing_payload"))
        .when(F.col("ts").isNull(), F.lit("missing_created"))
        .when(F.col("schema_version").isNull(), F.lit("missing_schema_version"))
        .when(
            (F.col("schema_version") < MIN_SCHEMA_VERSION)
            | (F.col("schema_version") > LATEST_SCHEMA_VERSION),
            F.lit("invalid_schema_version"),
        )
        .when(F.col("prio_params").isNull(), F.lit("missing_prio_params"))
        .when(F.col("prio_params.prime").isNull(), F.lit("missing_prime"))
        .when(F.col("prio_params.prime") != PRIME, F.lit("wrong_prime"))
        .when(F.col("prio_params.epsilon").isNull(), F.lit("missing_epsilon"))
        .when(
            F.col("prio_params.bins").isNull() | (F.col("prio_params.bins") < 0),
            F.lit("invalid_bins"),
        )
        .when(
            F.col("prio_params.number_servers").isNull()
            | (F.col("prio_params.number_servers") != NUMBER_OF_SERVERS),
            F.lit("wrong_number_servers"),
        )
        .when(
            F.col("encrypted_shares").isNull()
            | (F.size("encrypted_shares") != F.col("prio_params.number_servers")),
            F.lit("share_count_mismatch"),
        )
        .when(
            ~F.forall(
                "encrypted_shares",
                lambda s: s["encryption_key_id"].isNotNull()
                & (F.length(s["encryption_key_id"]) > 0),
            ),
            F.lit("missing_encryption_key_id"),
        )
        .when(
            ~F.forall("encrypted_shares", lambda s: _is_b64(s["payload"])),
            F.lit("invalid_base64_payload"),
        )
        .when(F.col("signature").isNull(), F.lit("missing_signature"))
        .when(
            F.col("cert_chain").isNull() | (F.size("cert_chain") == 0),
            F.lit("missing_cert_chain"),
        )
        .otherwise(F.lit(None).cast(T.StringType()))
    )


def validate_turns(df: DataFrame) -> DataFrame:
    """Annotate with ``invalid_reason`` (null ⇒ valid). Pure, narrow, codegen'd."""
    return df.withColumn("invalid_reason", invalid_reason_col())


def split_valid(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(valid rows sans marker, per-class drop counts) — the counter analog of
    model/DataShare.java:46-55."""
    annotated = validate_turns(df)
    valid = annotated.filter(F.col("invalid_reason").isNull()).drop("invalid_reason")
    counters = (
        annotated.filter(F.col("invalid_reason").isNotNull())
        .groupBy("invalid_reason")
        .agg(F.count("*").alias("n"))
    )
    return valid, counters


@F.pandas_udf(T.LongType())
def _rpit_udf(uuid: pd.Series, bins: pd.Series) -> pd.Series:
    """Deterministic rpit: md5(uuid#attempt) mod PRIME, rejecting n-th roots
    of unity (n = nextPow2(bins+1)) by vectorized repeated squaring."""
    n_uuid = uuid.to_numpy(dtype=object)
    b = bins.fillna(0).to_numpy(dtype=np.int64)
    # n = next power of two >= bins+1  (model/DataShare.java:335-349)
    n_exp = np.zeros(len(b), dtype=np.int64)
    target = np.maximum(b + 1, 1)
    while np.any((1 << n_exp) < target):
        n_exp = np.where((1 << n_exp) < target, n_exp + 1, n_exp)

    out = np.zeros(len(b), dtype=np.uint64)
    pending = np.ones(len(b), dtype=bool)
    attempt = 0
    while pending.any():
        idx = np.nonzero(pending)[0]
        cand = np.array(
            [
                int.from_bytes(
                    hashlib.md5(f"{n_uuid[i]}#{attempt}".encode()).digest()[:8], "big"
                )
                % PRIME
                for i in idx
            ],
            dtype=np.uint64,
        )
        # x^(2^k) mod p via k squarings; uint64 holds (p-1)^2 < 2^64
        p = np.uint64(PRIME)
        acc = cand % p
        max_k = int(n_exp[idx].max()) if len(idx) else 0
        pw = acc.copy()
        result = np.where(n_exp[idx] == 0, acc, np.uint64(0))
        for k in range(1, max_k + 1):
            pw = (pw * pw) % p
            result = np.where(n_exp[idx] == k, pw, result)
        ok = result != np.uint64(1)  # not an n-th root of unity
        out[idx[ok]] = cand[ok]
        pending[idx[ok]] = False
        attempt += 1
    return pd.Series(out.astype(np.int64))


def with_rpit(
    df: DataFrame,
    uuid_col: str | Column = "uuid",
    bins_col: str | Column = "bins",
) -> DataFrame:
    uuid = F.col(uuid_col) if isinstance(uuid_col, str) else uuid_col
    bins = F.col(bins_col) if isinstance(bins_col, str) else bins_col
    return df.withColumn("r_pit", _rpit_udf(uuid, bins))
