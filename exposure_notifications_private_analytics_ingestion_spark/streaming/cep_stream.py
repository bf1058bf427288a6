"""Streaming CEP: watermark-driven pattern matching over live event streams.

The streaming twin of ``operators/cep.py::episode_pattern_match``: events
stream in keyed by conversation/user, buffer in per-key state, and when the
event-time watermark passes an episode's close (last event + gap) the
episode's symbol string is matched against the pattern and emitted exactly
once — Flink CEP's within-session pattern detection on Spark's
``applyInPandasWithState``.

Correctness anchor: an episode is emitted only when ``episode_end + gap <=
watermark``. Past that point the watermark guarantees no arriving row can
have ``ts <= watermark``, so nothing can extend or bridge into the episode —
the split is FINAL, and the emitted row equals the batch twin's row for the
same input (pinned in ``tests/test_cep_stream.py`` with multi-epoch input).

State is bounded by OPEN episodes only (closed ones leave state on
emission), so a key's state scales with its in-flight burst, not its
lifetime. Matching runs in Python here (the state function is already
Python) over 1-char-per-event strings; keep patterns in the portable regex
subset (literals, classes, ``* + ? |``, no capturing groups) so Python/Java/
RE2 agree — the twin-equality test crosses Python `re` and Spark's Java
regex.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["pattern_match_stream", "start_pattern_stream"]

OUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType(), False),
        T.StructField("episode_start_ms", T.LongType(), False),
        T.StructField("episode_end_ms", T.LongType(), False),
        T.StructField("n_matches", T.LongType(), False),
        T.StructField("first_match", T.StringType(), False),
        T.StructField("seq_len", T.LongType(), False),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("ms", T.ArrayType(T.LongType()), True),
        T.StructField("tb", T.ArrayType(T.LongType()), True),
        T.StructField("sym", T.StringType(), True),  # 1 char per buffered row
    ]
)


def _make_matcher(symbols: dict[str, str], pattern: str, gap_s: int,
                  other_symbol: str):
    """Per-key state function. Pure closure over plain Python values so it
    pickles cleanly to executors."""
    gap_ms = gap_s * 1000
    rx = re.compile(pattern)
    sym_map = dict(symbols)

    def fn(
        key_t: tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (key,) = key_t
        if state.exists:
            ms, tb, sym = state.get
            ms, tb, sym = list(ms), list(tb), list(sym)
        else:
            ms, tb, sym = [], [], []

        wm = state.getCurrentWatermarkMs()
        for pdf in pdf_iter:
            new_ms = (
                pdf["ts"].to_numpy(dtype="datetime64[us]").astype("int64") // 1000
            )
            # Spark does NOT filter late input for applyInPandasWithState
            # (unlike aggregations): without this drop, a row older than the
            # watermark could arrive AFTER its episode was emitted and spawn
            # a spurious fragment episode. ts <= wm is the standard
            # watermark-drop predicate, and it is exactly what makes the
            # emitted split FINAL (see module docstring).
            on_time = new_ms > wm
            ms += new_ms[on_time].tolist()
            tb += pdf["tb"].to_numpy()[on_time].tolist()
            sym += pdf["etype"][on_time].map(sym_map).fillna(other_symbol).tolist()
        rows = sorted(zip(ms, tb, sym))  # same total order as the batch twin

        # gaps-and-islands split, identical to episode_pattern_match
        episodes: list[list[tuple]] = []
        for r in rows:
            if episodes and r[0] - episodes[-1][-1][0] <= gap_ms:
                episodes[-1].append(r)
            else:
                episodes.append([r])

        out = {k: [] for k in ("key", "s", "e", "n", "f", "l")}
        kept: list[list[tuple]] = []
        for ep in episodes:
            if ep[-1][0] + gap_ms <= wm:  # final: nothing can extend it
                s = "".join(r[2] for r in ep)
                matches = list(rx.finditer(s))
                out["key"].append(key)
                out["s"].append(ep[0][0])
                out["e"].append(ep[-1][0])
                out["n"].append(len(matches))
                out["f"].append(matches[0].group(0) if matches else "")
                out["l"].append(len(s))
            else:
                kept.append(ep)

        if kept:
            flat = [r for ep in kept for r in ep]
            state.update(
                (
                    [r[0] for r in flat],
                    [r[1] for r in flat],
                    "".join(r[2] for r in flat),
                )
            )
            nxt = min(ep[-1][0] + gap_ms for ep in kept)
            state.setTimeoutTimestamp(max(nxt, wm + 1))
        else:
            state.remove()

        if out["key"]:
            yield pd.DataFrame(
                {
                    "key": out["key"],
                    "episode_start_ms": pd.array(out["s"], dtype="int64"),
                    "episode_end_ms": pd.array(out["e"], dtype="int64"),
                    "n_matches": pd.array(out["n"], dtype="int64"),
                    "first_match": out["f"],
                    "seq_len": pd.array(out["l"], dtype="int64"),
                }
            )

    return fn


def pattern_match_stream(
    events: DataFrame,
    key: str,
    ts_col: str,
    tiebreak: str,
    type_col: str,
    symbols: dict[str, str],
    pattern: str,
    gap_s: int = 1800,
    watermark: str = "30 minutes",
    other_symbol: str = "_",
) -> DataFrame:
    """Streaming DataFrame → per-episode match rows (append mode).

    ``events`` is a streaming DataFrame; ``ts_col`` must be a timestamp
    column (it carries the watermark). Null key/ts/tiebreak/type rows are
    dropped, mirroring the batch twin.

    ``tiebreak`` must be an INTEGRAL column: per-key state buffers it as
    ``array<long>``. A lossy cast (string/float → long) would turn values
    null AFTER the null filter, corrupting tie order inside the state
    function where the batch twin (which orders any orderable type) would
    still be fine — so non-integral types are rejected at plan time.
    """
    for ch in list(symbols.values()) + [other_symbol]:
        if len(ch) != 1:
            raise ValueError(f"symbols must be single chars, got {ch!r}")
    if other_symbol in symbols.values():
        # same contract as the batch twin (operators/cep.py _symbolized): a
        # collision makes unmapped types match as a real symbol
        raise ValueError(
            f"other_symbol {other_symbol!r} collides with a mapped symbol; "
            "pick a char outside symbols.values()"
        )
    dtypes = dict(events.dtypes)
    if tiebreak not in dtypes:
        raise ValueError(f"tiebreak column {tiebreak!r} not in {sorted(dtypes)}")
    if dtypes[tiebreak] not in {"tinyint", "smallint", "int", "bigint"}:
        raise ValueError(
            f"tiebreak must be an integral column, got {tiebreak!r}: "
            f"{dtypes[tiebreak]} (state buffers it as array<long>; a lossy "
            "cast would silently break tie order vs the batch twin)"
        )
    sel = (
        events.filter(
            F.col(key).isNotNull()
            & F.col(ts_col).isNotNull()
            & F.col(tiebreak).isNotNull()
            & F.col(type_col).isNotNull()
        )
        .select(
            F.col(key).cast("string").alias("key"),
            F.col(ts_col).alias("ts"),
            F.col(tiebreak).cast("long").alias("tb"),
            F.col(type_col).cast("string").alias("etype"),
        )
        .withWatermark("ts", watermark)
    )
    return sel.groupBy("key").applyInPandasWithState(
        _make_matcher(symbols, pattern, gap_s, other_symbol),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def start_pattern_stream(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint: str,
    key: str,
    ts_col: str,
    tiebreak: str,
    type_col: str,
    symbols: dict[str, str],
    pattern: str,
    gap_s: int = 1800,
    watermark: str = "30 minutes",
    other_symbol: str = "_",
    schema: T.StructType | None = None,
    max_files_per_trigger: int = 8,
    available_now: bool = True,
):
    """File-source convenience wrapper: parquet stream → pattern episodes →
    parquet sink. Returns the started query."""
    if schema is None:
        schema = spark.read.parquet(input_path).schema
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(input_path)
    )
    matches = pattern_match_stream(
        src, key, ts_col, tiebreak, type_col, symbols, pattern,
        gap_s=gap_s, watermark=watermark, other_symbol=other_symbol,
    )
    writer = (
        matches.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
