"""W1 — Avro serialization of packet records.

Reference: ``PrioSerializationHelper.serializeRecords`` writes Avro
object-container files (``pipeline/PrioSerializationHelper.java:53-88``).

Two paths:
- ``to_avro_col`` / ``from_avro_col``: Spark's built-in Avro functions when
  the ``spark-avro`` module is on the classpath (real clusters;
  ``--packages org.apache.spark:spark-avro_2.13:<ver>``).
- a minimal pure-Python Avro *binary* encoder/decoder for the
  PrioDataSharePacket record shape (Avro 1.x binary encoding spec:
  zigzag-varint longs, length-prefixed bytes/strings, union index prefix for
  nullables), run as an Arrow-batched pandas UDF. This keeps the Avro wire
  format testable in the jar-less sandbox; the object-container framing
  (magic/schema/sync) is a thin wrapper left to the jar path.

Record shape (PrioSerializationHelper.java:106-121):
  uuid: string, encryption_key_id: union[null,string], r_pit: long,
  version_configuration: union[null,string], device_nonce: union[null,bytes],
  encrypted_payload: bytes
"""

from __future__ import annotations

import io

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

PACKET_AVRO_SCHEMA_JSON = """
{"type":"record","name":"PrioDataSharePacket","fields":[
 {"name":"uuid","type":"string"},
 {"name":"encryption_key_id","type":["null","string"],"default":null},
 {"name":"r_pit","type":"long"},
 {"name":"version_configuration","type":["null","string"],"default":null},
 {"name":"device_nonce","type":["null","bytes"],"default":null},
 {"name":"encrypted_payload","type":"bytes"}]}
"""


# --- varint/zigzag primitives (Avro spec §binary encoding) ---

def _zz(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzz(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _wv(buf: io.BytesIO, n: int) -> None:
    n = _zz(n) & 0xFFFFFFFFFFFFFFFF
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            buf.write(bytes([b | 0x80]))
        else:
            buf.write(bytes([b]))
            return


def _rv(buf: io.BytesIO) -> int:
    shift = acc = 0
    while True:
        b = buf.read(1)[0]
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return _unzz(acc)
        shift += 7


def _wbytes(buf, b: bytes | None):
    if b is None:
        _wv(buf, 0)  # union index 0 = null
    else:
        _wv(buf, 1)
        _wv(buf, len(b))
        buf.write(b)


def encode_packet(
    uuid: str,
    encryption_key_id: str | None,
    r_pit: int,
    version_configuration: str | None,
    device_nonce: bytes | None,
    encrypted_payload: bytes,
) -> bytes:
    buf = io.BytesIO()
    u = uuid.encode()
    _wv(buf, len(u))
    buf.write(u)
    _wbytes(buf, encryption_key_id.encode() if encryption_key_id else None)
    _wv(buf, int(r_pit))
    _wbytes(buf, version_configuration.encode() if version_configuration else None)
    _wbytes(buf, device_nonce)
    p = bytes(encrypted_payload)
    _wv(buf, len(p))
    buf.write(p)
    return buf.getvalue()


def decode_packet(raw: bytes) -> dict:
    buf = io.BytesIO(raw)

    def rstr():
        return buf.read(_rv(buf)).decode()

    def runion():
        return buf.read(_rv(buf)) if _rv(buf) == 1 else None

    uuid = rstr()
    ekid = runion()
    r_pit = _rv(buf)
    vconf = runion()
    nonce = runion()
    payload = buf.read(_rv(buf))
    return {
        "uuid": uuid,
        "encryption_key_id": ekid.decode() if ekid is not None else None,
        "r_pit": r_pit,
        "version_configuration": vconf.decode() if vconf is not None else None,
        "device_nonce": nonce,
        "encrypted_payload": payload,
    }


# --- DataFrame surface ---

PACKET_FIELDS = [
    "uuid",
    "encryption_key_id",
    "r_pit",
    "version_configuration",
    "device_nonce",
    "encrypted_payload",
]


def serialize_packets(df: DataFrame) -> DataFrame:
    """packets → (batch_id, destination, uuid, avro binary). Uses the
    built-in to_avro when the jar is present, else the pandas codec."""
    try:
        from pyspark.sql.avro.functions import to_avro

        out = df.withColumn(
            "avro", to_avro(F.struct(*PACKET_FIELDS), PACKET_AVRO_SCHEMA_JSON)
        )
        out.limit(1).collect()  # probe the classpath eagerly
        return out
    except Exception:
        pass

    @F.pandas_udf(T.BinaryType())
    def enc(
        uuid: pd.Series,
        ekid: pd.Series,
        r_pit: pd.Series,
        vconf: pd.Series,
        nonce: pd.Series,
        payload: pd.Series,
    ) -> pd.Series:
        return pd.Series(
            [
                encode_packet(
                    u,
                    k if pd.notna(k) else None,
                    int(r) if pd.notna(r) else 0,
                    v if pd.notna(v) else None,
                    bytes(n) if n is not None else None,
                    bytes(p) if p is not None else b"",
                )
                for u, k, r, v, n, p in zip(uuid, ekid, r_pit, vconf, nonce, payload)
            ]
        )

    return df.withColumn("avro", enc(*[F.col(c) for c in PACKET_FIELDS]))
