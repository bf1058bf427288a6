"""Temporal joins: as-of join and interval (range) join.

Neither exists as a built-in Spark operator; both are staples of a
transcript/event analytics engine (join each turn to the latest config /
session / identity fact at-or-before its timestamp; join events into
incident or promotion windows). The reference pipeline has no direct
analog — its nearest construct is the ±grace-hours partition scan that
associates shares with their ingestion window
(``pipeline/IngestionPipelineOptions.java:219-244``) — so these are
engine-completeness operators, not parity operators.

Scale design
------------
``asof_join`` is the classic *union-merge* formulation: tag both sides,
union, shuffle ONCE on the join key, and resolve each left row's match
with a running ``last(..., ignorenulls=True)`` window — O(n log n) per
key partition, no range self-join, no per-key collect. This is how a
sort-merge as-of join behaves on a real cluster: one exchange + one sort,
both streaming-friendly sizes. A hot key lands in one task (inherent to
any keyed as-of semantics); at 100 TB the key is (user/conv) so cardinality
is high and AQE handles residual skew.

``interval_join_binned`` avoids the BroadcastNestedLoopJoin that a naive
``l.ts BETWEEN i.start AND i.end`` theta-join plans: intervals are
exploded into the fixed-width time bins they cover, events are keyed by
their bin, and the join becomes a hash equi-join on the bin id followed by
an exact range filter. Cost is O(events + intervals · span/bin) instead of
O(events · intervals). Bin width should be chosen near the typical
interval span so each interval explodes into O(1) bins.
"""

from __future__ import annotations

from functools import reduce
from operator import and_
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TS_MS = "unix_micros({}) div 1000"


def _ms(col: str) -> Column:
    return F.expr(_TS_MS.format(col))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    right_cols: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    direction: str = "backward",
    tolerance_ms: int | None = None,
) -> DataFrame:
    """For every left row, attach the single right row with the greatest
    ``right_ts <= left_ts`` (direction='backward', inclusive) or the
    smallest ``right_ts >= left_ts`` ('forward'), matching on ``on`` keys.

    Left rows with no match keep NULL right columns (as-of LEFT join,
    matching DuckDB's ``ASOF LEFT JOIN``). If several right rows share the
    same (key, ts), the lexicographically greatest payload struct is taken
    (fields compared in ``right_cols`` order — ``F.max`` over a struct is
    lexicographic, so with multiple payload columns later fields are tie
    breakers, not independently maximized) so the result is deterministic
    regardless of partitioning.

    Output = all left columns + ``right_cols`` + ``_asof_ts_ms`` (epoch-ms
    of the matched right row, NULL when unmatched).

    ``tolerance_ms`` additionally voids matches further than the tolerance
    from the left timestamp (pandas ``merge_asof(tolerance=...)`` semantics).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    on = list(on)
    right_cols = [c for c in right_cols if c not in on]
    reserved = {"_t_ms", "_p", "_side", "_m", "_m_ts", "_asof_ts_ms"}
    clash = reserved & (set(left.columns) | set(right_cols))
    if clash:
        raise ValueError(f"asof_join reserves column names {sorted(clash)}")

    payload = F.struct(*[F.col(c) for c in right_cols]).alias("_p")
    # one row per (key, ts): deterministic representative independent of
    # partitioning (lexicographically greatest payload struct)
    r = (
        right.select(*on, _ms(right_ts).alias("_t_ms"), payload)
        .groupBy(*on, "_t_ms")
        .agg(F.max("_p").alias("_p"))
        .withColumn("_side", F.lit(0))
    )
    l = left.withColumn("_t_ms", _ms(left_ts)).withColumn(
        "_p", F.lit(None).cast(r.schema["_p"].dataType)
    ).withColumn("_side", F.lit(1))

    left_cols = [c for c in left.columns]
    u = l.select(*left_cols, "_t_ms", "_p", "_side").unionByName(
        r.select(
            *on,
            *[F.lit(None).cast(l.schema[c].dataType).alias(c)
              for c in left_cols if c not in on],
            "_t_ms", "_p", "_side",
        ).select(*left_cols, "_t_ms", "_p", "_side")
    )

    from pyspark.sql.window import Window

    if direction == "backward":
        order = [F.col("_t_ms").asc(), F.col("_side").asc()]
    else:
        order = [F.col("_t_ms").desc(), F.col("_side").asc()]
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        u.withColumn("_m", F.last("_p", ignorenulls=True).over(w))
        .withColumn("_m_ts", F.last(F.when(F.col("_side") == 0, F.col("_t_ms")),
                                    ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    if tolerance_ms is not None:
        gap = (
            F.col("_t_ms") - F.col("_m_ts")
            if direction == "backward"
            else F.col("_m_ts") - F.col("_t_ms")
        )
        keep = F.col("_m_ts").isNotNull() & (gap <= F.lit(int(tolerance_ms)))
        matched = matched.withColumn(
            "_m", F.when(keep, F.col("_m"))
        ).withColumn("_m_ts", F.when(keep, F.col("_m_ts")))
    return matched.select(
        *left_cols,
        *[F.col(f"_m.{c}").alias(c) for c in right_cols],
        F.col("_m_ts").alias("_asof_ts_ms"),
    )


def interval_join_binned(
    events: DataFrame,
    intervals: DataFrame,
    bin_s: int,
    event_ts: str = "ts",
    start_ms: str = "start_ms",
    end_ms: str = "end_ms",
    how: str = "inner",
) -> DataFrame:
    """Keyless interval join: pair every event with every interval whose
    half-open window ``[start_ms, end_ms)`` contains it, as a bin-bucketed
    hash join (see module docstring for the cost argument).

    ``intervals`` must carry epoch-ms ``start_ms``/``end_ms`` columns; all
    its columns survive into the output alongside all event columns.
    ``how='left'`` keeps unmatched events with NULL interval columns
    (implemented as a null-safe anti-join leg so the hot path stays an
    equi-join; ``eqNullSafe`` keeps matched events carrying NULLs from
    being re-emitted as unmatched).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    reserved = {"_ev_ms", "_bin"}
    clash = reserved & (set(events.columns) | set(intervals.columns))
    if clash:
        raise ValueError(f"interval_join_binned reserves column names {sorted(clash)}")
    bin_ms = bin_s * 1000
    ev = events.withColumn("_ev_ms", _ms(event_ts)).withColumn(
        "_bin", F.expr(f"_ev_ms div {bin_ms}")
    )
    # Empty/inverted intervals match nothing; they must be dropped BEFORE the
    # bin explode because sequence(a, b) runs DESCENDING when b < a and would
    # fabricate bins.
    intervals = intervals.filter(F.col(end_ms) > F.col(start_ms))
    # sequence() is inclusive on both ends; end is exclusive so the bin of
    # (end_ms - 1) is the last covered bin
    iv = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.expr(f"{start_ms} div {bin_ms}"),
                F.expr(f"({end_ms} - 1) div {bin_ms}"),
            )
        ),
    )
    joined = ev.join(iv, on="_bin", how="inner").filter(
        (F.col("_ev_ms") >= F.col(start_ms)) & (F.col("_ev_ms") < F.col(end_ms))
    )
    out_cols = [c for c in events.columns] + [
        c for c in intervals.columns if c not in events.columns
    ]
    inner = joined.select(*out_cols)
    if how == "inner":
        return inner
    iv_cols = [c for c in intervals.columns if c not in events.columns]
    # Null-safe anti-join: bare column equality (`on=[cols]`) never matches a
    # NULL to itself, so a matched event with a NULL in any column would be
    # emitted twice — once matched, once as a fabricated unmatched row.
    # eqNullSafe (`<=>`) is still a hash-joinable equality, so the plan stays
    # an equi- (not nested-loop) anti-join.
    e = events.alias("_ij_e")
    m = inner.select(*events.columns).distinct().alias("_ij_m")
    cond = reduce(
        and_,
        [
            F.col(f"_ij_e.{c}").eqNullSafe(F.col(f"_ij_m.{c}"))
            for c in events.columns
        ],
    )
    missed = e.join(m, cond, "left_anti").select(
        *[F.col(f"_ij_e.{c}") for c in events.columns],
        *[F.lit(None).cast(intervals.schema[c].dataType).alias(c) for c in iv_cols],
    )
    return inner.unionByName(missed)
