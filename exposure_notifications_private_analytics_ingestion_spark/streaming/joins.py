"""Watermarked stream-stream joins (the north_rule's "stateful join").

Spark buffers both sides in the state store and needs TWO bounds to evict:
a watermark on each side's event time, and a time-range join condition
tying the two event times together. With both present the state for a key
is dropped as soon as the watermark passes the range bound — at 10^12
turns the join state is O(active window), not O(stream).

Typical use here: enrich each transcript turn with a recently-seen fact
about the same conversation (an attestation record, a consent/signup
event, a device-check) that arrived on its own stream — the streaming
analog of the reference's certificate/signature side-input applied per
share (``pipeline/PrioSerializer.java`` consumes them statically; a live
feed is the CEP generalization).

Semantics are deliberately identical to the batch query
``time_bounded_join`` in ``queries.py`` so the oracle gate covers the
join logic; the streaming tests then assert stream == batch on the same
input (exactly-once under multi-epoch availableNow runs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# fact/attestation side-stream shape for StreamOptions.facts_path
FACTS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("fact_id", T.LongType(), True),
        T.StructField("fact_ts", T.TimestampType(), False),
    ]
)


def time_bounded_stream_join(
    turns: DataFrame,
    facts: DataFrame,
    bound_s: int,
    key: str = "conv_id",
    turns_watermark: str = "1 hour",
    facts_watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Join each turn to every fact for the same ``key`` whose timestamp is
    within ``(turn.ts - bound_s, turn.ts]`` — i.e. facts seen at-or-before
    the turn, no older than the bound.

    ``facts`` must expose ``key``, ``fact_ts: timestamp`` and any payload
    columns; every fact column except the key survives with its own name.
    Both inputs may be streaming (stream-stream) or one static
    (stream-static); the range condition + watermarks bound the state in
    the stream-stream case. ``how='left_outer'`` emits unmatched turns
    with NULL fact columns once the watermark proves no match can arrive.
    """
    if how not in ("inner", "left_outer"):
        raise ValueError(f"how must be inner|left_outer, got {how!r}")
    t = turns.withWatermark("ts", turns_watermark)
    f_ = facts.withWatermark("fact_ts", facts_watermark).withColumnRenamed(
        key, "_fact_key"
    )
    cond = (
        (F.col(key) == F.col("_fact_key"))
        & (F.col("fact_ts") <= F.col("ts"))
        & (F.col("fact_ts") > F.col("ts") - F.expr(f"INTERVAL {int(bound_s)} SECONDS"))
    )
    return t.join(f_, cond, how).drop("_fact_key")


def attested_turn_counts_stream(
    turns: DataFrame,
    facts: DataFrame,
    bound_s: int,
    window_s: int = 3600,
    key: str = "conv_id",
    turns_watermark: str = "1 hour",
    facts_watermark: str = "1 hour",
) -> DataFrame:
    """Chained stateful operators: the stream-stream join feeding a tumbling
    window count (Spark's multiple-stateful-operator support) — per
    conversation and hour, how many (turn, fact) attestation matches closed.
    Emits a window's row only once the watermark passes its end; join state
    and window state evict independently off the same watermark.

    Output: (window_start_ms, conv_id, n_matches) — identical semantics to
    the batch twin in ``queries.py`` (``attested_turn_counts``), which the
    oracle gates."""
    j = time_bounded_stream_join(
        turns,
        facts,
        bound_s=bound_s,
        key=key,
        turns_watermark=turns_watermark,
        facts_watermark=facts_watermark,
    )
    return (
        j.groupBy(F.window("ts", f"{window_s} seconds").alias("w"), key)
        .agg(F.count("*").alias("n_matches"))
        .select(
            F.expr("unix_micros(w.start) div 1000").alias("window_start_ms"),
            key,
            "n_matches",
        )
    )
