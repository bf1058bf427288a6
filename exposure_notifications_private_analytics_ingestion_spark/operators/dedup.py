"""D1 — exactly-once dedup on the representative key.

Reference: ``Distinct.withRepresentativeValueFn(doc → doc.getName())``
(``pipeline/IngestionPipeline.java:110-119``) — needed because overlapping
hourly scans + partition retries can deliver a document more than once. The
graft key is ``(conv_id, turn_idx)`` (FIXTURES.md §1).

Placement matters and is preserved from the reference: dedup runs BEFORE the
expensive validate/decode stage so duplicates never pay the pandas-UDF cost
(SURVEY §4 "dedup placement").

Scale notes: ``dropDuplicates`` is a hash-aggregate on the key — one shuffle,
map-side partial dedup first (Catalyst plans partial_first/HashAggregate), so
at 10^12 turns each mapper emits at most its distinct keys. For a stable
*which-row-wins* contract under retries we also provide the deterministic
variant (min struct per key) used wherever output parity is asserted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEDUP_KEY = ["conv_id", "turn_idx"]


def dedup_turns(df: DataFrame, key: list[str] | None = None) -> DataFrame:
    """Arbitrary-winner dedup (the reference's semantics: rows with the same
    path are interchangeable; Distinct keeps one)."""
    return df.dropDuplicates(key or DEDUP_KEY)


def dedup_turns_deterministic(df: DataFrame, key: list[str] | None = None) -> DataFrame:
    """Deterministic-winner dedup: per key keep the struct-min of all other
    columns. Single hash-aggregate (same shuffle count as dropDuplicates),
    but replay-stable — required for the per-turn parity criterion."""
    key = key or DEDUP_KEY
    rest = [c for c in df.columns if c not in key]
    packed = df.select(*key, F.struct(*rest).alias("_row"))
    return (
        packed.groupBy(*key)
        .agg(F.min("_row").alias("_row"))
        .select(*key, *[F.col(f"_row.{c}").alias(c) for c in rest])
    )
