"""Schema-evolution-tolerant transcript reading.

A 10^12-turn table accumulates years of writers: early files missing later
columns (``tool`` added in v2), later files carrying extras (``model``,
``trace_id``), and the occasional compatible type widening
(``turn_idx`` int32 → int64). Iceberg handles this natively (column-id-based
resolution); the parquet fallback must handle it explicitly or the first
mixed-schema scan of a backfill dies mid-job. The reference never faces
this — its Firestore documents are schema-checked per read
(``model/DataShare.java:109-150``) — but an engine that re-reads historical
partitions (deletion, compaction, catch-up) cannot assume one frozen file
schema.

Rules implemented here (matching Iceberg's evolution semantics for the
subset parquet name-based resolution can honor):
- missing column → typed NULLs (schema ADD is backward-readable),
- extra file columns → ignored (or surfaced via ``keep_extra``),
- compatible widening (int→long, float→double, int→double) → cast up,
- incompatible change (string→int, struct reshape) → raise with the column
  named, instead of Spark's mid-scan task failure.

Streaming: the file source takes ONE fixed schema, and Spark's parquet
reader already null-fills missing columns / prunes extras per file under a
user-provided schema — so the conformed TARGET schema is exactly what
``readStream.schema(...)`` needs; ``conformed_stream_schema`` computes it
(target + kept extras) so an evolved directory streams without a rewrite.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..model.schema import TURNS_SCHEMA

# widenings parquet/Iceberg both treat as compatible (target ← file)
_WIDENINGS: set[tuple[str, str]] = {
    ("long", "integer"),
    ("long", "short"),
    ("long", "byte"),
    ("integer", "short"),
    ("integer", "byte"),
    ("double", "float"),
    ("double", "integer"),
    ("double", "long"),
    ("timestamp", "timestamp_ntz"),
}


class SchemaEvolutionError(ValueError):
    pass


def conform(
    df: DataFrame,
    target: T.StructType = TURNS_SCHEMA,
    keep_extra: bool = False,
) -> DataFrame:
    """Project ``df`` onto ``target``: null-fill missing columns, cast
    compatible widenings, drop (or keep, with ``keep_extra``) extras, and
    raise ``SchemaEvolutionError`` on an incompatible type change. Column
    order follows ``target`` (extras appended) so downstream
    position-sensitive consumers (Arrow UDF schemas) see a stable layout."""
    have = {f.name: f for f in df.schema.fields}
    cols = []
    for f in target.fields:
        if f.name not in have:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
            continue
        src = have[f.name].dataType
        if src == f.dataType:
            cols.append(F.col(f.name))
        elif (f.dataType.typeName(), src.typeName()) in _WIDENINGS:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            raise SchemaEvolutionError(
                f"column '{f.name}' has incompatible type {src.simpleString()} "
                f"(target {f.dataType.simpleString()}); evolution supports "
                f"add/drop/widen only"
            )
    if keep_extra:
        cols += [F.col(n) for n in have if n not in {f.name for f in target.fields}]
    return df.select(*cols)


def _schema_groups(spark: SparkSession, path: str) -> list[tuple[str, list[str]]]:
    """Group the directory's parquet files by their footer schema (one
    driver-side footer read per file, Hadoop FS — works on HDFS/S3 too).
    Returns [(schema_json, [file, ...]), ...] in first-seen order."""
    from .quarantine import _visible

    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    base = fs.makeQualified(hpath).toString()
    it = fs.listFiles(hpath, True)
    files = []
    while it.hasNext():
        p = it.next().getPath().toString()
        # component-wise hidden filter (Spark's rule): a file under an
        # in-flight _temporary/ commit must not be footer-read or unioned
        if p.endswith(".parquet") and _visible(p, base):
            files.append(p)
    groups: dict[str, list[str]] = {}
    for f in sorted(files):
        sj = spark.read.parquet(f).schema.json()
        groups.setdefault(sj, []).append(f)
    return list(groups.items())


def read_turns_evolved(
    spark: SparkSession,
    path: str,
    target: T.StructType = TURNS_SCHEMA,
    keep_extra: bool = False,
) -> DataFrame:
    """Batch read of a mixed-schema turns directory, conformed to
    ``target``.

    Fast path: ``mergeSchema`` unions all file footers (instead of trusting
    the first file listed, which silently DROPS columns absent from that
    file) and ``conform`` reconciles the union once. Spark's footer merge
    refuses compatible WIDENINGS though (int16 file vs int32 file →
    CANNOT_MERGE_SCHEMAS), so on merge failure we fall back to grouping
    files by footer schema and unioning the conformed groups — one scan per
    distinct historical schema (a handful over a table's lifetime, each
    still a parallel columnar scan with pushdown), not one per file."""
    try:
        merged = spark.read.option("mergeSchema", "true").parquet(path)
        return conform(merged, target=target, keep_extra=keep_extra)
    except Exception as e:  # CANNOT_MERGE_SCHEMAS → widening fallback
        if "CANNOT_MERGE_SCHEMAS" not in str(e):
            raise
    groups = _schema_groups(spark, path)
    if keep_extra:
        target_names = {f.name for f in target.fields}
        extras: list[T.StructField] = []
        for sj, _files in groups:
            for f in T.StructType.fromJson(json.loads(sj)).fields:
                if f.name not in target_names and f.name not in {
                    x.name for x in extras
                }:
                    extras.append(f)
        target = T.StructType(list(target.fields) + extras)
    out: DataFrame | None = None
    for _sj, files in groups:
        part = conform(spark.read.parquet(*files), target=target, keep_extra=False)
        out = part if out is None else out.unionByName(part)
    if out is None:
        return spark.createDataFrame([], schema=target)
    return out


def conformed_stream_schema(
    spark: SparkSession,
    path: str,
    target: T.StructType = TURNS_SCHEMA,
    keep_extra: bool = False,
) -> T.StructType:
    """The schema to hand ``readStream.schema(...)`` for an evolved
    directory: validates compatibility up front (one driver-side footer
    scan) and returns target (+ kept extras). Under a user-provided schema
    the parquet file source null-fills and prunes per file, so no per-file
    conform step is needed in the stream itself."""
    return read_turns_evolved(
        spark, path, target=target, keep_extra=keep_extra
    ).schema
