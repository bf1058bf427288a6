"""Schemas + validation constants.

Reference parity:
- constants: ``model/DataShare.java:43,84-85`` (LATEST_SCHEMA_VERSION=2,
  PRIME=4293918721, NUMBER_OF_SERVERS=2).
- input document shape: ``model/DataShare.java:59-89`` → here the graft's
  transcript turn (``BASELINE.json.input_hint``) plus the nested payload
  variant used by validation tests (``FIXTURES.md §2``).
- output packet/header shapes: ``pipeline/PrioSerializationHelper.java:90-121``.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- Prio constants (model/DataShare.java:43,84-85) ---
PRIME = 4293918721
NUMBER_OF_SERVERS = 2
LATEST_SCHEMA_VERSION = 2
MIN_SCHEMA_VERSION = 1

# --- primary input stream: one row per transcript turn (input_hint) ---
TURNS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

# --- nested-document variant for validation (FIXTURES.md §2,
#     mirrors model/DataShare.java:59-89) ---
PRIO_PARAMS_TYPE = T.StructType(
    [
        T.StructField("prime", T.LongType(), True),
        T.StructField("epsilon", T.DoubleType(), True),
        T.StructField("bins", T.IntegerType(), True),
        T.StructField("number_servers", T.IntegerType(), True),
        T.StructField("hamming_weight", T.IntegerType(), True),
    ]
)
ENCRYPTED_SHARE_TYPE = T.StructType(
    [
        T.StructField("encryption_key_id", T.StringType(), True),
        T.StructField("payload", T.StringType(), True),  # base64
    ]
)
TURNS_WITH_PAYLOAD_SCHEMA = T.StructType(
    list(TURNS_SCHEMA.fields)
    + [
        T.StructField("signature", T.StringType(), True),
        T.StructField("cert_chain", T.ArrayType(T.StringType()), True),
        T.StructField("schema_version", T.IntegerType(), True),
        T.StructField("prio_params", PRIO_PARAMS_TYPE, True),
        T.StructField("encrypted_shares", T.ArrayType(ENCRYPTED_SHARE_TYPE), True),
    ]
)

# Failure classes — one per counter in model/DataShare.java:46-55 +
# validation branches DataShare.java:109-272 (see FIXTURES.md §2a).
INVALID_REASONS = [
    "missing_payload",
    "missing_prio_params",
    "missing_signature",
    "missing_cert_chain",
    "missing_prime",
    "wrong_prime",
    "missing_epsilon",
    "missing_encryption_key_id",
    "invalid_bins",
    "wrong_number_servers",
    "invalid_schema_version",
    "missing_schema_version",
    "share_count_mismatch",
    "invalid_base64_payload",
    "missing_created",
]

# --- outputs (PrioSerializationHelper.java:90-121; FIXTURES.md §4) ---
PACKETS_SCHEMA = T.StructType(
    [
        T.StructField("batch_id", T.StringType(), False),
        T.StructField("destination", T.StringType(), False),  # 'pha' | 'facilitator'
        T.StructField("uuid", T.StringType(), False),  # conv_id#turn_idx
        T.StructField("r_pit", T.LongType(), True),
        T.StructField("encrypted_payload", T.BinaryType(), True),
        T.StructField("encryption_key_id", T.StringType(), True),  # nulled on output
        T.StructField("version_configuration", T.StringType(), True),  # nulled
        T.StructField("device_nonce", T.BinaryType(), True),  # nulled
    ]
)
HEADERS_SCHEMA = T.StructType(
    [
        T.StructField("batch_id", T.StringType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("batch_start_time", T.LongType(), False),
        T.StructField("batch_end_time", T.LongType(), False),
        T.StructField("number_of_servers", T.IntegerType(), False),
        T.StructField("bins", T.IntegerType(), True),
        T.StructField("hamming_weight", T.IntegerType(), True),
        T.StructField("prime", T.LongType(), True),
        T.StructField("epsilon", T.DoubleType(), True),
        T.StructField("packet_file_digest", T.StringType(), True),  # hex sha256
        T.StructField("path", T.StringType(), True),
        T.StructField("n_packets", T.LongType(), True),
    ]
)


def next_power_two(n: int) -> int:
    """Smallest power of two >= n (model/DataShare.java:335-349)."""
    if n <= 1:
        return 1
    return 1 << (n - 1).bit_length()
