"""Heavy hitters (frequent items) per group via Spark's space-saving sketch.

``approx_top_k`` (Spark 4.x) is a TypedImperativeAggregate over the
space-saving summary: when a group's distinct-item count stays within
``track`` (maxItemsTracked) the counts are EXACT — that's the regime the
oracle query runs in — and beyond capacity the classic space-saving bound
holds (count error ≤ n/track, the true top items survive). Partial-merge
runs map-side and inside Structured Streaming state, so the same aggregate
powers the batch query and the streaming twin
(``streaming/hh_stream.py``).

Determinism: the sketch's own output order for equal counts is not
contractual, so the sketch is asked for ALL tracked items and the top-k cut
is re-ranked here with a total order (count desc, item asc) — boundary ties
are stable across partitionings and engines, which is what lets a DuckDB
exact-count oracle certify the query.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["heavy_hitters", "rank_hitters", "topk_sketch_agg", "windowed_heavy_hitters"]


def topk_sketch_agg(item_col: str, track: int) -> Column:
    """The space-saving aggregate, asked for every tracked item (k=track)
    so the deterministic cut happens outside the sketch. The column name is
    backtick-quoted so non-bare identifiers (spaces, dots, reserved words)
    resolve as a column reference, not as arbitrary SQL."""
    quoted = "`" + item_col.replace("`", "``") + "`"
    return F.expr(f"approx_top_k({quoted}, {int(track)}, {int(track)})")


def rank_hitters(sketched: DataFrame, group_cols: list[str], k: int) -> DataFrame:
    """Explode a ``_hh`` sketch-array column and keep each group's top-k by
    (count desc, item asc). Shared verbatim by the batch operator and the
    streaming sink's per-epoch finalization, so the twins can't drift."""
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy(
        F.col("cnt").desc(), F.col("item").asc()
    )
    return (
        sketched.select(*group_cols, F.explode("_hh").alias("e"))
        .select(
            *group_cols,
            F.col("e.item").alias("item"),
            F.col("e.count").alias("cnt"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def heavy_hitters(
    df: DataFrame,
    group_cols: list[str],
    item_col: str,
    k: int = 3,
    track: int = 1024,
) -> DataFrame:
    """Top-k ``item_col`` values per group: ``(*group_cols, item, cnt,
    rank)``. Exact while each group's distinct items ≤ ``track``;
    space-saving-bounded beyond. One partial+final ObjectHashAggregate —
    a group's sketch is O(track), never O(distinct items)."""
    sketched = df.filter(F.col(item_col).isNotNull()).groupBy(*group_cols).agg(
        topk_sketch_agg(item_col, track).alias("_hh")
    )
    return rank_hitters(sketched, group_cols, k)


def windowed_heavy_hitters(
    df: DataFrame,
    ts_col: str,
    item_col: str,
    window_s: int = 3600,
    k: int = 3,
    track: int = 1024,
) -> DataFrame:
    """Per-tumbling-window heavy hitters: ``(window_start_ms, item, cnt,
    rank)``. The batch twin of ``streaming/hh_stream.py``."""
    base = df.filter(
        F.col(ts_col).isNotNull() & F.col(item_col).isNotNull()
    ).groupBy(
        F.window(ts_col, f"{window_s} seconds").alias("w")
    ).agg(topk_sketch_agg(item_col, track).alias("_hh"))
    sketched = base.select(
        F.expr("unix_micros(w.start) div 1000").alias("window_start_ms"), "_hh"
    )
    return rank_hitters(sketched, ["window_start_ms"], k)
