"""Snapshot / time-travel metadata layer for the parquet fallback —
the Iceberg-shaped behaviors the north rule assumes, emulated with the
same mechanism Iceberg itself uses (immutable data files + a chain of
manifest files naming exactly which files each snapshot contains).

With a real ``iceberg-spark-runtime`` on the classpath the engine gets
snapshots from the catalog (``plans/tables.py``); this module provides the
fallback so the OPERATIONAL CONTRACT is available either way:

- **snapshot isolation**: a reader pinned to version N is never affected
  by later commits — data files are immutable and appends only ADD files.
- **time travel**: ``read(name, version=N)`` / ``read_asof(name, ts)``.
- **zero-copy rollback**: ``rollback(name, N)`` commits a NEW version
  whose file list is version N's — nothing is rewritten, history is kept
  (Iceberg's ``rollback_to_snapshot`` semantics).
- **atomic commits**: a version is its manifest file; the manifest is
  written to a temp name and ``rename``d into place (atomic on HDFS/local;
  the documented single-writer assumption matches the engine's
  driver-orchestrated write topology).

Layout:
    <warehouse>/<name>/data/<uuid>.parquet      immutable data files
    <warehouse>/<name>/_versions/v{N:08d}.json  manifest chain
Manifest: {"version", "parent", "operation", "committed_at_unix",
           "files": [...], "n_files"}.
"""

from __future__ import annotations

import json
import time
import uuid as _uuid

from pyspark.sql import DataFrame, SparkSession


class SnapshotError(RuntimeError):
    pass


class SnapshotTable:
    def __init__(self, spark: SparkSession, warehouse: str):
        self.spark = spark
        self.warehouse = warehouse.rstrip("/")
        jvm = spark.sparkContext._jvm
        self._jvm = jvm
        self._Path = jvm.org.apache.hadoop.fs.Path
        self._fs = self._Path(warehouse).getFileSystem(
            spark.sparkContext._jsc.hadoopConfiguration()
        )

    # ---- manifest plumbing -------------------------------------------------
    def _vdir(self, name: str):
        return self._Path(f"{self.warehouse}/{name}/_versions")

    def _versions(self, name: str) -> list[int]:
        vdir = self._vdir(name)
        if not self._fs.exists(vdir):
            return []
        out = []
        for st in self._fs.listStatus(vdir):
            n = st.getPath().getName()
            if n.startswith("v") and n.endswith(".json"):
                out.append(int(n[1:-5]))
        return sorted(out)

    def _read_manifest(self, name: str, version: int) -> dict:
        p = self._Path(f"{self.warehouse}/{name}/_versions/v{version:08d}.json")
        if not self._fs.exists(p):
            raise SnapshotError(f"table {name} has no version {version}")
        stream = self._fs.open(p)
        try:
            raw = self._jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
        finally:
            stream.close()
        return json.loads(bytes(raw).decode())

    def _commit(self, name: str, manifest: dict) -> int:
        """Exclusive create of the version slot: ``create(path,
        overwrite=False)`` throws if the file exists, on local FS and HDFS
        alike — a racing committer to the same version number gets
        ``SnapshotError`` instead of silently clobbering the winner (POSIX
        ``rename`` REPLACES an existing destination, so an exists()+rename
        dance has a silent-overwrite race). Readers that catch the small
        window between create and close see invalid JSON and
        ``_read_manifest`` raises rather than returning a half manifest."""
        vdir = self._vdir(name)
        self._fs.mkdirs(vdir)
        version = manifest["version"]
        final = self._Path(f"{self.warehouse}/{name}/_versions/v{version:08d}.json")
        try:
            out = self._fs.create(final, False)
        except Exception as e:
            raise SnapshotError(
                f"concurrent commit detected for {name} v{version}; retry "
                "from the new latest version"
            ) from e
        out.write(json.dumps(manifest).encode())
        out.close()
        return version

    def _write_data_files(self, df: DataFrame, name: str) -> list[str]:
        """Materialize df as new immutable files under data/ (staging dir →
        list the parts → move into data/ under uuid names)."""
        stage = f"{self.warehouse}/{name}/.stage-{_uuid.uuid4().hex}"
        df.write.mode("overwrite").parquet(stage)
        data_dir = self._Path(f"{self.warehouse}/{name}/data")
        self._fs.mkdirs(data_dir)
        moved = []
        for st in self._fs.listStatus(self._Path(stage)):
            n = st.getPath().getName()
            if n.startswith("part-") and n.endswith(".parquet"):
                dst = self._Path(
                    f"{self.warehouse}/{name}/data/{_uuid.uuid4().hex}.parquet"
                )
                if not self._fs.rename(st.getPath(), dst):  # pragma: no cover
                    raise SnapshotError(f"failed to stage {n}")
                moved.append(dst.toString())
        self._fs.delete(self._Path(stage), True)
        return moved

    # ---- public API --------------------------------------------------------
    def latest_version(self, name: str) -> int | None:
        vs = self._versions(name)
        return vs[-1] if vs else None

    def history(self, name: str) -> list[dict]:
        return [self._read_manifest(name, v) for v in self._versions(name)]

    def _next(self, name: str) -> tuple[int, int | None]:
        cur = self.latest_version(name)
        return (1 if cur is None else cur + 1), cur

    def replace(self, df: DataFrame, name: str) -> int:
        version, parent = self._next(name)
        files = self._write_data_files(df, name)
        return self._commit(
            name,
            {
                "version": version,
                "parent": parent,
                "operation": "replace",
                "committed_at_unix": int(time.time()),
                "files": files,
                "n_files": len(files),
            },
        )

    def append(self, df: DataFrame, name: str) -> int:
        """Append = previous file list + new files only. Nothing rewrites,
        so readers of any older snapshot are untouched."""
        version, parent = self._next(name)
        prev = self._read_manifest(name, parent)["files"] if parent else []
        files = self._write_data_files(df, name)
        return self._commit(
            name,
            {
                "version": version,
                "parent": parent,
                "operation": "append",
                "committed_at_unix": int(time.time()),
                "files": prev + files,
                "n_files": len(prev) + len(files),
            },
        )

    def read(self, name: str, version: int | None = None) -> DataFrame:
        v = version if version is not None else self.latest_version(name)
        if v is None:
            raise SnapshotError(f"table {name} has no snapshots")
        files = self._read_manifest(name, v)["files"]
        if not files:
            raise SnapshotError(f"{name} v{v} is empty")
        return self.spark.read.parquet(*files)

    def read_asof(self, name: str, unix_ts: int) -> DataFrame:
        """The latest snapshot committed at or before ``unix_ts``."""
        best = None
        for v in self._versions(name):
            if self._read_manifest(name, v)["committed_at_unix"] <= unix_ts:
                best = v
        if best is None:
            raise SnapshotError(f"{name} has no snapshot at or before {unix_ts}")
        return self.read(name, best)

    def rollback(self, name: str, to_version: int) -> int:
        """Commit a new version that points at ``to_version``'s files —
        zero data movement, full history retained."""
        target = self._read_manifest(name, to_version)
        version, parent = self._next(name)
        return self._commit(
            name,
            {
                "version": version,
                "parent": parent,
                "operation": f"rollback_to_{to_version}",
                "committed_at_unix": int(time.time()),
                "files": target["files"],
                "n_files": target["n_files"],
            },
        )

    def expire_snapshots(self, name: str, keep_last: int = 2) -> list[str]:
        """Iceberg ``expire_snapshots`` analog: drop manifests older than
        the last ``keep_last`` and delete data files no surviving snapshot
        references. Returns deleted file paths."""
        vs = self._versions(name)
        if len(vs) <= keep_last:
            return []
        keep, drop = vs[-keep_last:], vs[:-keep_last]
        live: set[str] = set()
        for v in keep:
            live.update(self._read_manifest(name, v)["files"])
        dead: set[str] = set()
        for v in drop:
            dead.update(self._read_manifest(name, v)["files"])
        deleted = []
        for f in sorted(dead - live):
            if self._fs.delete(self._Path(f), False):
                deleted.append(f)
        for v in drop:
            self._fs.delete(
                self._Path(f"{self.warehouse}/{name}/_versions/v{v:08d}.json"), False
            )
        return deleted
