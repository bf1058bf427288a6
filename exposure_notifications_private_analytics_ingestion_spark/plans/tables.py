"""Table-provider abstraction: Iceberg when the runtime jar is present,
hour-partitioned parquet otherwise.

BASELINE.json's north_rule names Iceberg tables; this sandbox cannot fetch
``iceberg-spark-runtime`` (verified in SURVEY §7), so the engine runs on
parquet with documented equivalents — partition pruning via hive-style
``hour=`` directories, DELETE-analog retention via partition overwrite,
overwrite-idempotent sinks. This module keeps Iceberg ON THE BOOKS the same
way the avro codec keeps spark-avro on the books
(``functions/avro_codec.py`` ``_jvm_avro_available``): probe once per Spark
context, use the real thing when the classpath has it, fall back loudly
(``provider_name``) when it doesn't.

To enable for real: point ``SPARK_GRAFT_ICEBERG_JAR`` at an
iceberg-spark-runtime jar (or install it into ``$SPARK_HOME/jars``) before
the session is built; ``get_spark`` then registers the ``local`` hadoop
catalog (see ``session.iceberg_confs``) and every ``TableProvider`` call
routes through real Iceberg tables — same tests, same call sites.

Reference parity note: the reference writes Avro triplets to object storage
(``pipeline/BatchWriterFn.java:104-186``); the lake-table layer is the
north-rule upgrade, not a reference port.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_ICEBERG_OK: dict[str, bool] = {}


def _merge_sql(target: str, view: str, keys: list[str], seq_col: str | None) -> str:
    """MERGE INTO text for the Iceberg path. With ``seq_col`` the matched
    update is guarded by ``s.seq >= t.seq`` so a stale re-delivered row
    (lower seq than the stored one) cannot revert newer data; ties go to
    the source, keeping replay-of-identical-rows idempotent. Unit-testable
    without an Iceberg runtime (the COW path mirrors these semantics)."""
    on = " AND ".join(f"t.{k} <=> s.{k}" for k in keys)
    matched = (
        f"WHEN MATCHED AND s.{seq_col} >= t.{seq_col} THEN UPDATE SET * "
        if seq_col
        else "WHEN MATCHED THEN UPDATE SET * "
    )
    return (
        f"MERGE INTO {target} t USING {view} s ON {on} "
        f"{matched}"
        "WHEN NOT MATCHED THEN INSERT *"
    )


def iceberg_jar() -> str | None:
    """Locate an iceberg-spark-runtime jar: explicit env var first, then the
    Spark distribution's jars directory. Returns None in this sandbox."""
    env = os.environ.get("SPARK_GRAFT_ICEBERG_JAR")
    if env and os.path.isfile(env):
        return env
    spark_home = os.environ.get("SPARK_HOME")
    if not spark_home:
        try:
            import pyspark

            spark_home = os.path.dirname(pyspark.__file__)
        except ImportError:  # pragma: no cover
            return None
    hits = glob.glob(f"{spark_home}/jars/iceberg-spark-runtime*.jar")
    return hits[0] if hits else None


def iceberg_available(spark: SparkSession) -> bool:
    """Probe the live session ONCE PER SPARK CONTEXT (applicationId-keyed,
    like the avro probe): the jar existing on disk is necessary but not
    sufficient — the catalog class must actually load in this JVM."""
    key = spark.sparkContext.applicationId
    if key not in _ICEBERG_OK:
        try:
            jvm = spark.sparkContext._jvm
            jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
            # the catalog must also be configured (session built with
            # iceberg_confs); otherwise table idents won't resolve
            ok = (
                spark.conf.get("spark.sql.catalog.local", None) is not None
            )
            _ICEBERG_OK[key] = bool(ok)
        except Exception:
            _ICEBERG_OK[key] = False
    return _ICEBERG_OK[key]


class TableProvider:
    """Uniform write/read/delete over the two physical layers.

    ``ident`` is a logical table name; iceberg maps it to
    ``local.db.<ident>``, parquet maps it to ``<warehouse>/<ident>``. The
    three operations cover what the engine's sinks need: idempotent full
    refresh (createOrReplace ≙ mode=overwrite), append (epoch commits), and
    predicate delete (retention; parquet emulates it as an anti-filter
    overwrite, which is exactly the copy-on-write strategy Iceberg's own
    DELETE uses for unpartitioned predicates)."""

    def __init__(self, spark: SparkSession, warehouse: str):
        self.spark = spark
        self.warehouse = warehouse
        self.is_iceberg = iceberg_available(spark)

    @property
    def provider_name(self) -> str:
        return "iceberg" if self.is_iceberg else "parquet-fallback"

    def _ident(self, name: str) -> str:
        return f"local.db.{name}" if self.is_iceberg else f"{self.warehouse}/{name}"

    def replace(self, df: DataFrame, name: str) -> None:
        if self.is_iceberg:
            df.writeTo(self._ident(name)).using("iceberg").createOrReplace()
        else:
            df.write.mode("overwrite").parquet(self._ident(name))

    def append(self, df: DataFrame, name: str) -> None:
        if self.is_iceberg:
            df.writeTo(self._ident(name)).append()
        else:
            df.write.mode("append").parquet(self._ident(name))

    def read(self, name: str) -> DataFrame:
        if self.is_iceberg:
            return self.spark.table(self._ident(name))
        return self.spark.read.parquet(self._ident(name))

    def merge_upsert(
        self,
        df: DataFrame,
        name: str,
        keys: list[str],
        partition_col: str | None = None,
        seq_col: str | None = None,
    ) -> None:
        """Keyed upsert (MERGE INTO analog): rows of ``df`` replace target
        rows with the same key; unmatched rows insert. The CDC-correction
        flow for transcripts — a re-delivered turn with edited text lands as
        an update on (conv_id, turn_idx), not a duplicate.

        ``seq_col``: when the source itself carries several versions of one
        key (a CDC batch), the row with the greatest ``seq_col`` wins
        (ties broken lexicographically by the remaining columns,
        deterministic). ``seq_col`` ALSO guards matched updates against
        stale re-deliveries ACROSS batches: a target row whose stored seq
        is strictly greater than the source's survives unchanged and the
        stale source row is discarded (Iceberg: ``WHEN MATCHED AND s.seq
        >= t.seq``). Source wins seq ties, so replaying an identical epoch
        stays idempotent. Without ``seq_col``, matched rows are replaced
        unconditionally (last-writer-wins).

        Iceberg: real ``MERGE INTO ... WHEN MATCHED THEN UPDATE SET *``
        (merge-on-read / copy-on-write per table properties). Parquet
        fallback: copy-on-write — exactly Iceberg's COW strategy — scoped to
        AFFECTED PARTITIONS when ``partition_col`` is given: target rows in
        the source's partitions are anti-joined on the keys (the source key
        set is typically small → broadcast), unioned with the source, and
        dynamic-partition-overwritten, so at 10^5 hourly partitions an
        upsert touching 3 hours rewrites 3 directories, not the table.
        Partition scoping assumes a row's partition value is stable under
        update (true for ts-derived partitions of immutable event keys); an
        update that MOVES a row across partitions needs the unscoped path
        (``partition_col=None``) or real Iceberg MERGE. If the target is not
        yet hive-partitioned by ``partition_col``, the first upsert rewrites
        it into that layout (full COW once, scoped thereafter)."""
        if seq_col and "_src_seq" in df.columns:
            raise ValueError("merge_upsert reserves column name '_src_seq'")
        if seq_col:
            others = [c for c in df.columns if c not in keys]
            # max(struct(seq, ...)) — one map-side-partial hash-agg; seq
            # leads the struct so it dominates the lexicographic max
            packed = df.groupBy(*keys).agg(
                F.max(
                    F.struct(*[F.col(seq_col)] + [F.col(c) for c in others if c != seq_col])
                ).alias("_v")
            )
            df = packed.select(
                *keys,
                *[
                    F.col(f"_v.{c}").alias(c)
                    for c in [seq_col] + [c for c in others if c != seq_col]
                ],
            ).select(*df.columns)
        if self.is_iceberg:
            view = f"_merge_src_{name}"
            df.createOrReplaceTempView(view)
            self.spark.sql(_merge_sql(self._ident(name), view, keys, seq_col))
            return
        target = self.read(name)
        # COW rewrites the affected rows from (kept ∪ source): a column-set
        # mismatch would silently DROP target columns the source lacks, or
        # die mid-write on extras — fail loudly instead
        if set(target.columns) != set(df.columns):
            missing = sorted(set(target.columns) - set(df.columns))
            extra = sorted(set(df.columns) - set(target.columns))
            raise ValueError(
                f"merge_upsert source schema mismatch for {name}: "
                f"source lacks {missing}, source adds {extra}. Conform the "
                "source first (sources.evolution.conform) — a COW rewrite "
                "with missing columns would silently lose them."
            )
        target = target.select(*df.columns)
        src_keys = df.select(*keys).distinct()

        def _key_cond(left: DataFrame, right: DataFrame):
            # NULL-safe key equality, the COW mirror of the Iceberg MERGE's
            # `t.k <=> s.k` (_merge_sql above): a NULL key value matches a
            # NULL key value, so it UPDATES on both providers instead of
            # inserting a duplicate on the parquet fallback only.
            cond = F.lit(True)
            for k in keys:
                cond = cond & left[k].eqNullSafe(right[k])
            return cond

        def _split(affected: DataFrame) -> tuple[DataFrame, DataFrame]:
            """(target rows to keep, source rows to apply). Without seq_col
            every matched target row is replaced; with it, a target row
            whose seq beats the source's survives and the stale source row
            is dropped — the COW mirror of WHEN MATCHED AND s.seq >= t.seq.
            Both joins broadcast the (small) micro-batch side, so the
            affected partitions are scanned map-side with no shuffle; all
            key matching is NULL-safe (see _key_cond)."""
            if not seq_col:
                sk = F.broadcast(src_keys.alias("_mu_s"))
                aff = affected.alias("_mu_t")
                return aff.join(sk, _key_cond(aff, sk), "left_anti"), df
            # the exact COW mirror of Iceberg's `WHEN MATCHED AND s.seq >=
            # t.seq THEN UPDATE`: the update fires only when the comparison
            # is TRUE, so a NULL seq on EITHER side keeps the target row and
            # drops the matched source row (a NULL source seq must not both
            # keep the target and insert the source — that writes duplicate
            # keys). `_src_hit` disambiguates "no source row" from "source
            # row with NULL seq", which a bare left-join _src_seq cannot.
            aff = affected.alias("_mu_t")
            src = F.broadcast(
                df.select(
                    *[F.col(k).alias(f"_src_{k}") for k in keys],
                    F.col(seq_col).alias("_src_seq"),
                    F.lit(True).alias("_src_hit"),
                ).alias("_mu_s")
            )
            on = F.lit(True)
            for k in keys:
                on = on & F.col(f"_mu_t.{k}").eqNullSafe(F.col(f"_src_{k}"))
            ann = aff.join(src, on, "left").drop(*[f"_src_{k}" for k in keys])
            # one scan of the affected partitions feeds BOTH outputs (kept
            # and the beaten-key set) — without this, each side re-executes
            # the join and the target is scanned twice per merge. The
            # checkpoint also severs the TARGET-side lineage from the files
            # the overwrite below truncates; the source side is severed at
            # the end of this function, so merged needs no checkpoint of
            # its own on this path (merge_upsert skips it when seq_col is
            # set).
            ann = ann.localCheckpoint(eager=True)
            updated = F.coalesce(
                F.col("_src_seq") >= F.col(seq_col), F.lit(False)
            )
            kept = ann.filter(~updated).drop("_src_seq", "_src_hit")
            # keys where the stored row wins (newer seq, or NULL on either
            # side): ≤ one row per source key, broadcast back
            beaten = F.broadcast(
                ann.filter(F.col("_src_hit") & ~updated)
                .select(*keys)
                .distinct()
                .alias("_mu_b")
            )
            dfa = df.alias("_mu_d")
            # sever the SOURCE side's lineage too: the caller's df may be
            # derived from this very table (a correction computed from a
            # read of the target), and the overwrite below truncates the
            # files its plan would re-read. This materializes only the
            # micro-batch (small — it broadcasts elsewhere in this plan),
            # so together with ann's checkpoint every input to `merged` is
            # severed without re-materializing the full affected set.
            eff = dfa.join(
                beaten, _key_cond(dfa, beaten), "left_anti"
            ).localCheckpoint(eager=True)
            return kept, eff
        if partition_col:
            path = self._ident(name)
            jvm = self.spark.sparkContext._jvm
            fs = jvm.org.apache.hadoop.fs.Path(path).getFileSystem(
                self.spark.sparkContext._jsc.hadoopConfiguration()
            )
            layout_ok = any(
                st.getPath().getName().startswith(f"{partition_col}=")
                for st in fs.listStatus(jvm.org.apache.hadoop.fs.Path(path))
            )
            if layout_ok:
                parts = [r[0] for r in df.select(partition_col).distinct().collect()]
                # isin never matches NULL — include the default partition
                # explicitly when the source touches it, or its target rows
                # would dodge the key match and duplicate on insert
                pred = F.col(partition_col).isin([p for p in parts if p is not None])
                if any(p is None for p in parts):
                    pred = pred | F.col(partition_col).isNull()
                affected = target.filter(pred)
            else:  # first upsert converts the table into the scoped layout
                affected = target
            kept, df_eff = _split(affected)
            # localCheckpoint SEVERS lineage, not just materializes: a
            # cache()+count() still recomputes lost blocks from the source
            # files — which the overwrite below is truncating — silently
            # corrupting the table if an executor dies mid-write. On the
            # seq_col path _split already checkpointed BOTH inputs (`ann`
            # for the target scan, the effective micro-batch for the
            # caller's possibly-self-referential source), so a second eager
            # materialization of the full affected set would be pure waste.
            merged = kept.unionByName(df_eff)
            if not seq_col:
                merged = merged.localCheckpoint(eager=True)
            if layout_ok:
                from .compaction import _dynamic_overwrite

                with _dynamic_overwrite(self.spark):
                    merged.write.mode("overwrite").partitionBy(
                        partition_col
                    ).parquet(path)
            else:
                # static overwrite truncates the whole directory — required
                # here, or the old unpartitioned root files would survive
                # the dynamic commit and duplicate every row
                merged.write.mode("overwrite").partitionBy(partition_col).parquet(
                    path
                )
        else:
            kept, df_eff = _split(target)
            merged = kept.unionByName(df_eff)
            if not seq_col:  # seq path: _split's ann checkpoint suffices
                merged = merged.localCheckpoint(eager=True)
            merged.write.mode("overwrite").parquet(self._ident(name))

    def delete_where(self, name: str, predicate: str) -> None:
        if self.is_iceberg:
            self.spark.sql(f"DELETE FROM {self._ident(name)} WHERE {predicate}")
        else:
            # localCheckpoint, not cache: see merge_upsert — the overwrite
            # truncates the very files lineage recompute would re-read
            kept = (
                self.read(name)
                .filter(f"NOT ({predicate})")
                .localCheckpoint(eager=True)
            )
            kept.write.mode("overwrite").parquet(self._ident(name))
