"""Source: read Prio packet Avro object-container files back into a
DataFrame — the inverse of ``functions.avro_codec.write_batch_containers``.

Reference parity: the reference's downstream (prio-server) and its own tests
read batch files with Avro's ``DataFileReader``
(``pipeline/PrioSerializationHelperTest.java:44-152``); a user migrating from
the reference has directories of ``{dest}/{batch_id}.batch.avro`` files this
source ingests directly.

Spark shape: ``spark.read.format("binaryFile")`` scans the files in parallel
(one task per file split), and a ``mapInPandas`` flat-map decodes each
container's records with the pure-Python codec — Arrow-batched, executor-side,
no driver collection. Batch id and destination are recovered from the file
path (the writer's deterministic naming), so no extra metadata store is
needed.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

READ_SCHEMA = T.StructType(
    [
        T.StructField("batch_id", T.StringType()),
        T.StructField("destination", T.StringType()),
        T.StructField("uuid", T.StringType()),
        T.StructField("encryption_key_id", T.StringType()),
        T.StructField("r_pit", T.LongType()),
        T.StructField("version_configuration", T.StringType()),
        T.StructField("device_nonce", T.BinaryType()),
        T.StructField("encrypted_payload", T.BinaryType()),
    ]
)


def read_packet_containers(spark: SparkSession, path: str) -> DataFrame:
    """All packets under ``path`` (recursive) as one DataFrame.

    ``path`` layouts (both from ``write_batch_containers``): flat
    ``{path}/{destination}/{batch_id}.batch.avro`` or windowed
    ``{path}/{destination}/{name}/YYYY/MM/dd/HH/mm/{batch_id}.batch.avro`` —
    the destination is always the FIRST path component under ``path``;
    unrecognized layouts decode with null batch_id/destination.
    """
    from ..functions.avro_codec import read_container

    def _strip_scheme(p: str) -> str:
        if "://" in p:
            p = p.split("://", 1)[-1]
        elif p.startswith("file:"):
            p = p[len("file:") :]
        return p

    _root = _strip_scheme(path)
    root_abs = os.path.abspath(_root) if not _root.startswith("/") else _root

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.batch.avro")
        .option("recursiveFileLookup", "true")
        .load(path)
        .select("path", "content")
    )

    def _destination(p: str) -> str | None:
        # binaryFile paths come back as URIs (file:/...) — strip the scheme,
        # then take the first component relative to the scan root
        local = _strip_scheme(p)
        try:
            rel = os.path.relpath(local, root_abs)
        except ValueError:
            return None
        parts = rel.split(os.sep)
        if not parts or parts[0] in ("..", "."):
            return None
        return parts[0]

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in READ_SCHEMA.fields}
            for p, blob in zip(pdf["path"], pdf["content"]):
                name = os.path.basename(p)
                batch_id = (
                    name[: -len(".batch.avro")] if name.endswith(".batch.avro") else None
                )
                destination = _destination(p)
                _meta, recs = read_container(bytes(blob))
                for r in recs:
                    out["batch_id"].append(batch_id)
                    out["destination"].append(destination)
                    out["uuid"].append(r["uuid"])
                    out["encryption_key_id"].append(r["encryption_key_id"])
                    out["r_pit"].append(r["r_pit"])
                    out["version_configuration"].append(r["version_configuration"])
                    out["device_nonce"].append(r["device_nonce"])
                    out["encrypted_payload"].append(r["encrypted_payload"])
            yield pd.DataFrame(out)

    return files.mapInPandas(decode, schema=READ_SCHEMA)
