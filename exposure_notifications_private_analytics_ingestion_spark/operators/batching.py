"""K1 + G1 + G2 — key-by metadata, fixed-size chunking, batch-id assignment.

Reference: shares are keyed by their stringified ``DataShareMetadata``
(``pipeline/IngestionPipeline.java:78-88,196-207``), chunked with
``GroupIntoBatches.ofSize(batchSize)`` (default 200k / deployed 100k —
``IngestionPipelineOptions.java:172-177``, ``terraform/variables.tf:101-104``),
then a batch id is attached (``IngestionPipeline.java:210-236``). The
reference's batch id is a random UUID whose retry-idempotence comes from a
second deterministic file-UUID; we collapse both into one deterministic
``uuid5(name|window_start|ordinal)`` (see functions.hashing) — full re-runs
hit identical destinations, which is strictly stronger
(comment at ``IngestionPipeline.java:229-231`` concedes the reference's isn't).

Spark shapes (no GroupIntoBatches built-in — SURVEY §2 G1):
- exact chunking: ``row_number() over (partition by key order by turn_idx)``
  then ``floor((rn-1)/batch_size)``. One shuffle + per-key sort. Matches the
  reference's "every batch except the last is exactly batch_size" property
  and gives a replay-stable membership.
- scalable variant for hot keys: a per-key count (hash-agg, map-side partial)
  joined back (AQE picks broadcast vs skew-split SMJ at runtime), then
  stateless ``pmod(xxhash64(turn_idx), n_batches)``
  assignment — no per-key sort, batches are *approximately* batch_size. Use
  when a single conversation exceeds what one task should sort (the 10^12-turn
  hot-key case); membership is still deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import uuid5_col


def _batch_uuid(key_expr, window_start_s: int, ordinal_col):
    name = F.concat_ws("|", key_expr, F.lit(str(window_start_s)), ordinal_col.cast("string"))
    return uuid5_col(name)  # JVM-side uuid5 — no Python in the hot path


def assign_batches(
    df: DataFrame,
    batch_size: int,
    window_start_s: int,
    key_cols: list[str] | None = None,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Exact fixed-size chunking per key (GroupIntoBatches semantics).

    Adds ``batch_ordinal`` (int) and deterministic ``batch_id`` (uuid5).
    """
    key_cols = key_cols or ["conv_id"]
    order_cols = order_cols or ["turn_idx"]
    w = Window.partitionBy(*key_cols).orderBy(*[F.col(c) for c in order_cols])
    out = df.withColumn(
        "batch_ordinal",
        F.floor((F.row_number().over(w) - 1) / batch_size).cast("int"),
    )
    key_expr = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in key_cols])
    return out.withColumn(
        "batch_id", _batch_uuid(key_expr, window_start_s, F.col("batch_ordinal"))
    )


def dedup_window_chunk(
    df: DataFrame,
    batch_size: int,
    window_start_s: int,
    duration_s: int,
    key_cols: list[str] | None = None,
    order_cols: list[str] | None = None,
    ts_col: str = "ts",
    dedup_key_cols: list[str] | None = None,
) -> DataFrame:
    """Fused D1+F1+G1: deterministic dedup, window filter, and fixed-size
    chunking behind a SINGLE exchange.

    Trick: ``repartition(dedup_key)`` gives HashPartitioning(dedup_key),
    which satisfies the ClusteredDistribution of BOTH window specs — dedup's
    ``partitionBy(dedup_key, turn_idx)`` and chunking's
    ``partitionBy(key_cols)`` (partitioning on a *subset* of the clustering
    keys still co-locates every full key; dedup_key must be a subset of
    key_cols, which holds — chunk keys only ever EXTEND the dedup keys).
    When the two key sets are equal (plain transcripts) the dedup sort
    ``(key, turn_idx, row_hash)`` is a prefix-superset of the chunking sort
    ``(key, turn_idx)``, so Catalyst inserts ONE sort total; with
    prio-extended chunk keys a second sort appears but never a second
    exchange. Versus the unfused pipeline's two exchanges + four sorts
    (SortAggregate dedup is unavoidable once string payloads ride the
    aggregation buffer).

    Dedup winner = min row-hash (xxhash64 over all non-dedup-key columns):
    deterministic under replay, same contract as dedup_turns_deterministic.
    Dedup is keyed on ``(dedup_key_cols, order_cols)`` — NOT the extended
    chunk key — so duplicate turns collapse to one row even when their
    payload metadata differs (same semantics as the unfused paths).
    """
    key_cols = key_cols or ["conv_id"]
    dedup_key_cols = dedup_key_cols or key_cols
    order_cols = order_cols or ["turn_idx"]
    rest = [
        c for c in df.columns if c not in dedup_key_cols and c not in order_cols
    ]
    w_dedup = Window.partitionBy(*dedup_key_cols, *order_cols).orderBy(
        F.xxhash64(*[F.col(c) for c in rest])
    )
    w_chunk = Window.partitionBy(*key_cols).orderBy(*[F.col(c) for c in order_cols])
    ts_ms = F.expr(f"unix_micros({ts_col}) div 1000")
    lo, hi = window_start_s * 1000, (window_start_s + duration_s) * 1000
    out = (
        df.repartition(*[F.col(c) for c in dedup_key_cols])
        .withColumn("_rn_dedup", F.row_number().over(w_dedup))
        .filter(F.col("_rn_dedup") == 1)
        .filter(F.col(ts_col).isNotNull() & (ts_ms >= lo) & (ts_ms < hi))
        .withColumn(
            "batch_ordinal",
            F.floor((F.row_number().over(w_chunk) - 1) / batch_size).cast("int"),
        )
        .drop("_rn_dedup")
    )
    key_expr = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in key_cols])
    return out.withColumn(
        "batch_id", _batch_uuid(key_expr, window_start_s, F.col("batch_ordinal"))
    )


def assign_batches_scalable(
    df: DataFrame,
    batch_size: int,
    window_start_s: int,
    key_cols: list[str] | None = None,
    salt_col: str = "turn_idx",
) -> DataFrame:
    """Sort-free chunking for skewed keys: count per key → n_batches →
    hash-route each row. Two hash-aggregates, zero per-key sorts; AQE's
    skew handling splits the hot key's shuffle partitions."""
    key_cols = key_cols or ["conv_id"]
    counts = df.groupBy(*key_cols).agg(
        F.ceil(F.count("*") / batch_size).cast("int").alias("_n_batches")
    )
    # No broadcast hint: `counts` has one row PER DISTINCT KEY, which is
    # unbounded (a forced broadcast OOMs the driver at 10^9+ conversations).
    # AQE broadcasts it at runtime when it is actually small, and its
    # skew-join splitting handles the hot key on the SMJ path otherwise.
    out = df.join(counts, key_cols).withColumn(
        "batch_ordinal",
        F.pmod(F.xxhash64(F.col(salt_col)), F.col("_n_batches")).cast("int"),
    ).drop("_n_batches")
    key_expr = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in key_cols])
    return out.withColumn(
        "batch_id", _batch_uuid(key_expr, window_start_s, F.col("batch_ordinal"))
    )
