"""Structured-Streaming ingestion: the reference's hourly batch loop
re-expressed as a continuous CEP pipeline.

Reference semantics → streaming mapping (SURVEY §2/§3):
- hourly scan window + ±grace re-scan  → event-time watermark = grace hours
  (``IngestionPipelineOptions.java:141-163``)
- Distinct on document path            → keyed dedup state per conv_id
  (``IngestionPipeline.java:110-119``)
- GroupIntoBatches + batch-id          → ``applyInPandasWithState`` keyed by
  ``conv_id``: open-batch buffer in state, closed on size OR when the
  watermark passes the turn's tumbling-window end (event-time timeout) —
  late rows after a close open a NEW batch, never mutate a written one
- Avro triplet write w/ deterministic  → idempotent ``foreachBatch``: every
  file UUID (``BatchWriterFn.java:140-150``)  epoch writes packets + headers
  under an epoch-keyed path with overwrite, so Spark's epoch-retry lands on
  the same files — exactly-once end to end

Dedup lives INSIDE the state function (seen turn_idx per conv within the
open window) rather than chaining ``dropDuplicatesWithinWatermark`` before
the flatMapGroupsWithState op — one stateful operator instead of two stacked
state stores, which halves state-store IO and sidesteps multi-stateful-op
output-mode restrictions. State is watermark-bounded: when a window closes,
its dedup set is discarded (the reference bounds work identically by only
re-scanning ±grace hours).
"""

from __future__ import annotations

import uuid as _uuid
from collections.abc import Iterator
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions.hashing import NAMESPACE
from ..model.schema import TURNS_SCHEMA


@dataclass
class StreamOptions:
    batch_size: int = 100
    window_s: int = 3600  # tumbling window (reference `duration`)
    watermark: str = "1 hour"  # late-data grace (reference graceHours)
    flush_partial_on_timeout: bool = True
    mode: str = "tumbling"  # 'tumbling' | 'session' (gap-close, north_rule)
    session_gap_s: int = 1800


# one output row per turn in a CLOSED batch
BATCH_OUT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("ts_ms", T.LongType(), True),
        T.StructField("window_start_s", T.LongType(), False),
        T.StructField("batch_ordinal", T.IntegerType(), False),
        T.StructField("batch_id", T.StringType(), False),
        T.StructField("close_reason", T.StringType(), False),  # 'size'|'window'
    ]
)

# state: per-conv open window + dedup set + buffered turns + ordinal counter
STATE_SCHEMA = T.StructType(
    [
        T.StructField("window_start_s", T.LongType(), True),
        T.StructField("next_ordinal", T.IntegerType(), True),
        T.StructField("seen_idx", T.ArrayType(T.IntegerType()), True),
        T.StructField("buf_idx", T.ArrayType(T.IntegerType()), True),
        T.StructField("buf_text", T.ArrayType(T.StringType()), True),
        T.StructField("buf_ts", T.ArrayType(T.LongType()), True),
        T.StructField("last_ts_ms", T.LongType(), True),  # session mode
    ]
)


def _batch_id(conv_id: str, window_start_s: int, ordinal: int) -> str:
    return str(
        _uuid.uuid5(NAMESPACE, f"{conv_id}|{window_start_s}|{ordinal}")
    )


def make_assembler(opts: StreamOptions):
    """Returns the applyInPandasWithState function. Pure (no closure over
    Spark objects) so it pickles cleanly to executors."""
    batch_size = opts.batch_size
    window_s = opts.window_s
    flush = opts.flush_partial_on_timeout
    session_mode = opts.mode == "session"
    gap_ms = opts.session_gap_s * 1000

    def assemble(
        key: tuple,
        pdf_iter: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (conv_id,) = key
        if state.exists:
            window_start, next_ord, seen, bidx, btxt, bts, last_ts_ms = state.get
            seen = set(seen)
            bidx, btxt, bts = list(bidx), list(btxt), list(bts)
        else:
            window_start, next_ord, last_ts_ms = None, 0, None
            seen, bidx, btxt, bts = set(), [], [], []

        out_rows: list[dict] = []

        def close_batch(reason: str):
            nonlocal next_ord, bidx, btxt, bts
            if not bidx:
                return
            bid = _batch_id(conv_id, window_start, next_ord)
            for i in range(len(bidx)):
                out_rows.append(
                    {
                        "conv_id": conv_id,
                        "turn_idx": bidx[i],
                        "text": btxt[i],
                        "ts_ms": bts[i],
                        "window_start_s": window_start,
                        "batch_ordinal": next_ord,
                        "batch_id": bid,
                        "close_reason": reason,
                    }
                )
            next_ord += 1
            bidx, btxt, bts = [], [], []

        if state.hasTimedOut:
            # watermark passed the open window's end → flush partial batch,
            # drop the window's dedup state (watermark-bounded state)
            if flush:
                close_batch("window")
            state.remove()
            yield pd.DataFrame(out_rows, columns=[f.name for f in BATCH_OUT_SCHEMA])
            return

        for pdf in pdf_iter:
            pdf = pdf.sort_values(["ts", "turn_idx"])
            for turn_idx, text, ts in zip(
                pdf["turn_idx"], pdf["text"], pdf["ts"]
            ):
                ts_ms = int(pd.Timestamp(ts).value // 1_000_000)
                if session_mode:
                    # gap-close: a silence > gap ends the session window
                    # (F.session_window semantics, north_rule)
                    if last_ts_ms is not None and ts_ms - last_ts_ms > gap_ms:
                        close_batch("session")
                        window_start = ts_ms // 1000
                        next_ord = 0
                        seen = set()
                    if window_start is None:
                        window_start = ts_ms // 1000
                    last_ts_ms = ts_ms
                else:
                    w = (ts_ms // 1000) // window_s * window_s
                    if window_start is None:
                        window_start = w
                    if w != window_start:
                        # turn belongs to a different tumbling window: close
                        # the open one (late rows re-open with a fresh
                        # ordinal space)
                        close_batch("window")
                        window_start = w
                        next_ord = 0
                        seen = set()
                if int(turn_idx) in seen:  # stateful dedup (D1)
                    continue
                seen.add(int(turn_idx))
                bidx.append(int(turn_idx))
                btxt.append(text)
                bts.append(ts_ms)
                if len(bidx) >= batch_size:
                    close_batch("size")

        state.update(
            (
                window_start,
                next_ord,
                sorted(seen),
                bidx,
                btxt,
                bts,
                last_ts_ms,
            )
        )
        if window_start is not None:
            # event-time timeout: tumbling → window end; session → last+gap.
            # Must exceed the current watermark to be accepted.
            if session_mode:
                end_ms = (last_ts_ms or 0) + gap_ms
            else:
                end_ms = (window_start + window_s) * 1000
            wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(end_ms, wm + 1))
        yield pd.DataFrame(out_rows, columns=[f.name for f in BATCH_OUT_SCHEMA])

    return assemble


def dedup_stream(df: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Built-in streaming dedup (D1, built-in-first path): one row per
    (conv_id, turn_idx) within the watermark horizon, state expired by the
    engine. Use when batch assembly is NOT needed downstream — the CEP
    assembler performs its own in-state dedup to avoid stacking two state
    stores."""
    return df.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["conv_id", "turn_idx"]
    )


def closed_batches_stream(
    spark: SparkSession, input_path: str, opts: StreamOptions
) -> DataFrame:
    """readStream → watermark → keyed CEP state → closed-batch rows."""
    raw = (
        spark.readStream.schema(TURNS_SCHEMA)
        .option("maxFilesPerTrigger", "64")
        .parquet(input_path)
    )
    turns = raw.filter(F.col("ts").isNotNull() & F.col("text").isNotNull())
    with_wm = turns.withWatermark("ts", opts.watermark)
    return with_wm.groupBy("conv_id").applyInPandasWithState(
        make_assembler(opts),
        outputStructType=BATCH_OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def start_stream_ingestion(
    spark: SparkSession,
    input_path: str,
    output_root: str,
    checkpoint: str,
    opts: StreamOptions | None = None,
    available_now: bool = True,
    rocksdb_state: bool = True,
):
    """Full streaming job: CEP core → packet split → idempotent epoch sink.

    State store defaults to RocksDB (spill-to-disk, changelog checkpointing)
    — at 10^12 turns the per-conv dedup/buffer state cannot live in the
    HDFS-backed in-memory map. The provider is per-query-start config and is
    recorded in the checkpoint; resuming keeps whatever the checkpoint used.
    """
    from .sink import make_epoch_sink

    opts = opts or StreamOptions()
    if rocksdb_state:
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER
        )
    batches = closed_batches_stream(spark, input_path, opts)
    writer = (
        batches.writeStream.foreachBatch(make_epoch_sink(output_root))
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
