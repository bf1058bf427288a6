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


def read_packet_containers(
    spark: SparkSession, path: str, manifest: str | None = None
) -> DataFrame:
    """All packets under ``path`` (recursive) as one DataFrame.

    ``path`` layouts (both from ``write_batch_containers``): flat
    ``{path}/{destination}/{batch_id}.batch.avro`` or windowed
    ``{path}/{destination}/{name}/YYYY/MM/dd/HH/mm/{batch_id}.batch.avro`` —
    the destination is always the FIRST path component under ``path``;
    unrecognized layouts decode with null batch_id/destination.

    **Manifest fast path.** ``run_ingestion`` writes an ``avro_manifest``
    parquet beside the container tree (one row per file with its exact
    path + batch_id + destination). When ``manifest`` is given — or the
    conventional sibling ``{parent(path)}/avro_manifest`` exists — the
    reader takes file paths from that tiny parquet scan instead of
    enumerating the directory: at 32k tiny container files the driver-side
    binaryFile listing alone costs ~33 s (Hadoop's local-FS stat per file),
    the manifest scan milliseconds. Files are opened executor-side in the
    decode pass — exactly as portable as ``write_batch_containers``, which
    created them with the same file API.
    """
    from ..functions.avro_codec import read_container

    if manifest is None:
        cand = os.path.join(os.path.dirname(path.rstrip("/")), "avro_manifest")
        if os.path.isdir(cand):
            manifest = cand
    if manifest is not None and _manifest_covers(spark, manifest, path):
        return _read_via_manifest(spark, manifest)

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

    # Batch directories are MANY tiny files (one container per (batch, dest)
    # — the reference's layout, BatchWriterFn.java:135-150), and the
    # binaryFile planner bin-packs by open-cost, yielding ~1 task per 3 files:
    # at 32k containers that is ~10k scan tasks whose Python-worker/Arrow
    # setup dwarfs the decode (measured 36 s → 3 s at sf-bench size). A
    # NARROW coalesce (no shuffle, no content movement) sized from ONE
    # getContentSummary call (a single JVM round-trip — never a py4j
    # per-file loop) caps tasks at ~64 MB of container bytes each. The
    # summary over-counts non-container bytes in mixed directories, which
    # only makes the target larger (safe).
    try:
        jvm = spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
        cs = fs.getContentSummary(hpath)
        n_files, total_bytes = cs.getFileCount(), cs.getLength()
        par = spark.sparkContext.defaultParallelism
        target = max(par, min(n_files, total_bytes // (64 << 20) + 1))
        files = files.coalesce(int(target))
    except Exception:
        pass  # unreachable FS / exotic scheme: keep the planner's split

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


def _manifest_covers(spark: SparkSession, manifest: str, path: str) -> bool:
    """ADVICE r5 #2 guard: the manifest stores writer-side absolute paths
    and, before this check, auto-engaged while IGNORING ``path`` — a
    container tree copied or moved together with its manifest either failed
    on the stale paths or silently decoded the ORIGINAL tree. Take the fast
    path only when the manifest actually describes files under the
    requested root (one driver-side sample row — the writer emits every
    file under one root, so a single row witnesses the root); an empty or
    foreign manifest falls back to the directory scan, which is always
    correct."""
    try:
        first = (
            spark.read.parquet(manifest).select("path").limit(1).collect()
        )
    except Exception:
        return False
    if not first:
        return False
    root = os.path.realpath(path.rstrip("/"))
    return os.path.realpath(str(first[0]["path"])).startswith(root + os.sep)


def _read_via_manifest(spark: SparkSession, manifest: str) -> DataFrame:
    """Decode containers named by the writer's manifest parquet: no
    directory enumeration, no per-file driver stat — one tiny parquet scan,
    then executor-side ``open()`` per file inside the Arrow-batched decode.
    Task count is sized by the manifest's own record counts (~500k packet
    records per task), a NARROW repartition of path strings (not bytes)."""
    from pyspark.sql import functions as F

    from ..functions.avro_codec import read_container

    mdf = spark.read.parquet(manifest).select(
        "batch_id", "destination", "path", "n_records"
    )
    total = mdf.agg(
        F.count("*").alias("files"), F.sum("n_records").alias("recs")
    ).collect()[0]
    par = spark.sparkContext.defaultParallelism
    target = int(
        max(par, min(total["files"] or 1, (total["recs"] or 0) // 500_000 + 1))
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in READ_SCHEMA.fields}
            for batch_id, destination, p in zip(
                pdf["batch_id"], pdf["destination"], pdf["path"]
            ):
                with open(p, "rb") as f:
                    _meta, recs = read_container(f.read())
                for r in recs:
                    out["batch_id"].append(batch_id)
                    out["destination"].append(destination)
                    out["uuid"].append(r["uuid"])
                    out["encryption_key_id"].append(r["encryption_key_id"])
                    out["r_pit"].append(r["r_pit"])
                    out["version_configuration"].append(
                        r["version_configuration"]
                    )
                    out["device_nonce"].append(r["device_nonce"])
                    out["encrypted_payload"].append(r["encrypted_payload"])
            yield pd.DataFrame(out)

    return mdf.repartition(target).mapInPandas(decode, schema=READ_SCHEMA)
