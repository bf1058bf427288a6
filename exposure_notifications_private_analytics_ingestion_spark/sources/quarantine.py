"""Corrupt-file tolerance with an explicit quarantine inventory.

At 10^8 parquet files, a single truncated upload or bit-flipped footer is a
statistical certainty, and the default behavior — one unreadable file kills
the whole job mid-scan — is unacceptable for a 10^12-turn backfill. Spark's
``ignoreCorruptFiles`` solves the crash but introduces a worse failure mode:
files are dropped SILENTLY, so a data loss looks like a clean run. This
module pairs the two:

- ``read_resilient``: per-read ``ignoreCorruptFiles`` (not the session-wide
  conf — other queries in the session keep fail-fast semantics),
- ``corrupt_file_inventory``: which files the scan actually skipped —
  Hadoop FS listing (metadata-only) anti-joined against the DISTINCT
  ``_metadata.file_path`` of rows that survived, then a driver-side footer
  probe on the (small) suspect set to separate truly-corrupt files from
  legitimately empty ones. The coarse pass is fully distributed; only
  confirmed suspects pay a per-file footer read.
- ``quarantine_corrupt_files``: FS-rename confirmed-corrupt files into a
  quarantine directory (rename is a metadata op on HDFS/local; on S3A it is
  copy+delete) and append a manifest row per file, so the table scans
  strictly again and the bad bytes are preserved for forensics.

The reference retries whole Firestore partitions on error
(``FirestoreConnector.java:180-210``); per-file quarantine is the lake-table
equivalent at file granularity.
"""

from __future__ import annotations

import json
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_resilient(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """Scan that survives corrupt/truncated files (and files vanishing
    mid-scan, e.g. a concurrent compaction commit). Pair with
    ``corrupt_file_inventory`` — never ship a silent-drop scan alone."""
    return (
        spark.read.schema(schema)
        .option("ignoreCorruptFiles", "true")
        .option("ignoreMissingFiles", "true")
        .parquet(path)
    )


def _visible(path_str: str, base: str) -> bool:
    """Spark's own hidden-file rule, applied to every component BELOW the
    table root: any segment starting with '_' or '.' (``_temporary/`` from
    an in-flight commit, ``_SUCCESS``, ``.hive-staging``) hides the file.
    Checking only the basename would treat a live ``_temporary/.../part-x``
    as a scan-skipped suspect and quarantine an in-flight write."""
    rel = path_str[len(base):].lstrip("/") if path_str.startswith(base) else path_str
    return not any(seg.startswith(("_", ".")) for seg in rel.split("/"))


def _list_files(spark: SparkSession, path: str) -> list[tuple[str, int]]:
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    base = fs.makeQualified(hpath).toString()
    it = fs.listFiles(hpath, True)
    out = []
    while it.hasNext():
        st = it.next()
        p = st.getPath().toString()
        if _visible(p, base):
            out.append((p, int(st.getLen())))
    return out


def _footer_ok(spark: SparkSession, file_uri: str) -> bool:
    """Driver-side footer probe of ONE suspect file (suspects are few)."""
    try:
        spark.read.parquet(file_uri).schema
        return True
    except Exception:
        return False


def corrupt_file_inventory(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """(file_path, length, reason) for every file a resilient scan skips.

    Coarse pass (distributed): FS listing minus the files that contributed
    rows to ``read_resilient`` — ``_metadata.file_path`` is generated
    per-split by the scan itself, so no second parse of good files happens.
    Confirm pass (driver, suspect-only): a footer probe separates
    ``corrupt`` from ``empty`` (a valid zero-row file contributes no rows
    but is NOT a data-loss event)."""
    listed = spark.createDataFrame(
        _list_files(spark, path), "file_path string, length long"
    )
    seen = (
        read_resilient(spark, path, schema)
        .select(F.col("_metadata.file_path").alias("file_path"))
        .distinct()
    )
    suspects = listed.join(seen, "file_path", "left_anti").collect()
    rows = []
    for r in suspects:
        reason = "empty" if _footer_ok(spark, r["file_path"]) else "corrupt"
        rows.append((r["file_path"], r["length"], reason))
    return spark.createDataFrame(
        rows, "file_path string, length long, reason string"
    )


def quarantine_corrupt_files(
    spark: SparkSession, path: str, schema: T.StructType, quarantine_dir: str
) -> list[str]:
    """Move confirmed-corrupt files out of the table and record a manifest
    (JSON lines: file, bytes, quarantined-to, unix time). Returns the moved
    source paths. After this, a strict (fail-fast) scan of ``path`` succeeds
    again."""
    inv = [
        r
        for r in corrupt_file_inventory(spark, path, schema).collect()
        if r["reason"] == "corrupt"
    ]
    if not inv:
        return []
    jvm = spark.sparkContext._jvm
    qdir = jvm.org.apache.hadoop.fs.Path(quarantine_dir)
    fs = qdir.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    fs.mkdirs(qdir)
    moved = []
    manifest = []
    for r in inv:
        src = jvm.org.apache.hadoop.fs.Path(r["file_path"])
        dst = jvm.org.apache.hadoop.fs.Path(quarantine_dir, src.getName())
        if fs.rename(src, dst):
            moved.append(r["file_path"])
            manifest.append(
                {
                    "file": r["file_path"],
                    "bytes": r["length"],
                    "quarantined_to": dst.toString(),
                    "at_unix": int(time.time()),
                }
            )
    # append to the manifest (read-then-rewrite: FS append() is not
    # available on every store) — prior quarantine records are forensic
    # evidence and must survive later runs
    mpath = jvm.org.apache.hadoop.fs.Path(quarantine_dir, "_manifest.jsonl")
    prior = b""
    if fs.exists(mpath):
        stream = fs.open(mpath)
        try:
            prior = bytes(jvm.org.apache.commons.io.IOUtils.toByteArray(stream))
        finally:
            stream.close()
    out = fs.create(mpath, True)
    out.write(prior + ("\n".join(json.dumps(m) for m in manifest) + "\n").encode())
    out.close()
    return moved
