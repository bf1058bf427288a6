"""MATCH_RECOGNIZE-style CEP pattern matching over keyed event sequences.

The reference pipeline is a per-conversation CEP loop (validate → dedup →
batch over keyed streams, ``IngestionPipeline.java``); this operator adds the
general CEP primitive Spark's DataFrame API lacks: detect a regex pattern
over the per-key, time-ordered sequence of event symbols — the core of
SQL:2016 ``MATCH_RECOGNIZE`` and Flink CEP's pattern API.

Spark-first shape (no Python in the plan):

- each event maps to ONE symbol char through a ``create_map`` literal
  (plan-embedded, broadcast-free) in a codegen projection;
- the per-key ordered sequence is built with ONE hash aggregation:
  ``array_sort(collect_list(struct(ts_ms, tiebreak, sym)))`` — ``array_sort``
  over a struct is lexicographic in field order, so ``(ts_ms, tiebreak)``
  gives a total, partitioning-independent order; ``transform`` +
  ``array_join`` strip it to the symbol string;
- matching is ``regexp_extract_all(seq, pattern, 0)`` — leftmost,
  non-overlapping, greedy, the same scan DuckDB/RE2 performs, so oracle SQL
  can certify results as long as patterns stay in the portable subset
  (literals, character classes, ``* + ? |``; no backrefs, no lookaround).

Scale note: a key's full symbol history lives in one aggregation buffer.
That is inherent to per-key sequence semantics (``MATCH_RECOGNIZE``'s own
``PARTITION BY``, and our ``asof_join`` per-key window share it): a key with
10^8 events is irreducibly one task's state. Symbols are 1 char/event, so
even a 10^6-event key costs ~1 MB of buffer; for adversarial keys cap the
per-key history upstream (e.g. ``sampling.sample_n_per_stratum``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["episode_pattern_match", "pattern_match", "symbol_sequences"]

_RESERVED = ("_cep_ms", "_cep_tb", "_cep_sym", "_cep_ep")


def _symbolized(
    events: DataFrame,
    key: str,
    ts_ms: Column,
    tiebreak: Column,
    type_col: str,
    symbols: dict[str, str],
    other_symbol: str,
) -> DataFrame:
    """(key, _cep_ms, _cep_tb, _cep_sym) with nulls dropped — the shared
    front of the whole-history and per-episode matchers."""
    for ch in list(symbols.values()) + [other_symbol]:
        if len(ch) != 1:
            raise ValueError(f"symbols must be single chars, got {ch!r}")
    if other_symbol in symbols.values():
        # a collision silently makes unmapped event types match as a real
        # symbol, changing n_matches/first_match — fail loudly instead
        raise ValueError(
            f"other_symbol {other_symbol!r} collides with a mapped symbol; "
            "pick a char outside symbols.values()"
        )
    clash = set(_RESERVED) & set(events.columns)
    if clash:
        raise ValueError(f"pattern_match reserves column names {sorted(clash)}")
    pairs: list[Column] = []
    for k in sorted(symbols):
        pairs += [F.lit(k), F.lit(symbols[k])]
    sym = F.coalesce(
        F.element_at(F.create_map(*pairs), F.col(type_col)), F.lit(other_symbol)
    )
    return events.filter(
        F.col(key).isNotNull()
        & ts_ms.isNotNull()
        & tiebreak.isNotNull()
        & F.col(type_col).isNotNull()
    ).select(
        F.col(key),
        ts_ms.alias("_cep_ms"),
        tiebreak.alias("_cep_tb"),
        sym.alias("_cep_sym"),
    )


def _match_cols(seq_col: str, pattern: str) -> list[Column]:
    return [
        F.size(F.regexp_extract_all(seq_col, F.lit(pattern), F.lit(0)))
        .cast("long")
        .alias("n_matches"),
        F.regexp_extract(seq_col, pattern, 0).alias("first_match"),
        F.length(seq_col).cast("long").alias("seq_len"),
    ]


def _seq_agg() -> Column:
    return F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("_cep_ms", "_cep_tb", "_cep_sym"))),
            lambda s: s["_cep_sym"],
        ),
        "",
    ).alias("seq")


def symbol_sequences(
    events: DataFrame,
    key: str,
    ts_ms: Column,
    tiebreak: Column,
    type_col: str,
    symbols: dict[str, str],
    other_symbol: str = "_",
) -> DataFrame:
    """One row per ``key``: the time-ordered symbol string ``seq``.

    ``symbols`` maps ``type_col`` values to single chars; unmapped types
    become ``other_symbol`` (they can't match a symbol but still break
    adjacency, exactly like MATCH_RECOGNIZE rows matching no DEFINE).
    Rows with a NULL key, timestamp, tiebreak, or type are dropped — they
    have no place in a total order.
    """
    return (
        _symbolized(events, key, ts_ms, tiebreak, type_col, symbols, other_symbol)
        .groupBy(key)
        .agg(_seq_agg())
    )


def pattern_match(
    events: DataFrame,
    key: str,
    ts_ms: Column,
    tiebreak: Column,
    type_col: str,
    symbols: dict[str, str],
    pattern: str,
    other_symbol: str = "_",
) -> DataFrame:
    """Per-key regex CEP: ``(key, n_matches, first_match, seq_len)``.

    ``n_matches`` counts leftmost non-overlapping occurrences of ``pattern``
    in the key's ordered symbol string; ``first_match`` is the earliest
    matched substring ('' when none); ``seq_len`` the total event count.
    Keep ``pattern`` in the Java/RE2-portable subset (see module docstring)
    so a DuckDB oracle scans identically.
    """
    seq = symbol_sequences(
        events, key, ts_ms, tiebreak, type_col, symbols, other_symbol
    )
    return seq.select(key, *_match_cols("seq", pattern))


def episode_pattern_match(
    events: DataFrame,
    key: str,
    ts_ms: Column,
    tiebreak: Column,
    type_col: str,
    symbols: dict[str, str],
    pattern: str,
    gap_s: int,
    other_symbol: str = "_",
) -> DataFrame:
    """Episode-scoped CEP: split each key's history into sessions (a new
    episode starts when the gap to the previous event exceeds ``gap_s``),
    then match ``pattern`` within each episode — MATCH_RECOGNIZE over
    session windows, and the batch twin of
    ``streaming/cep_stream.py::start_pattern_stream`` (same episode split,
    same ordering, same regex subset, verified equal in
    ``tests/test_cep_stream.py``).

    Output: ``(key, episode_start_ms, episode_end_ms, n_matches,
    first_match, seq_len)`` — one row per episode, including zero-match
    episodes (filtering is the caller's call).

    Plan: the gaps-and-islands labeling is two window functions over ONE
    ``(key × ts)`` partitioning (single shuffle), and the per-episode
    aggregation groups by ``(key, episode)`` — a prefix-compatible
    re-partitioning. Unlike whole-history matching, a key's state here is
    bounded by its BUSIEST EPISODE, not its lifetime."""
    from pyspark.sql import Window

    base = _symbolized(events, key, ts_ms, tiebreak, type_col, symbols, other_symbol)
    w = Window.partitionBy(key).orderBy("_cep_ms", "_cep_tb")
    gap_ms = gap_s * 1000
    new_ep = (F.col("_cep_ms") - F.lag("_cep_ms").over(w)) > gap_ms
    labeled = base.withColumn(
        "_cep_ep", F.sum(F.when(new_ep, 1).otherwise(0)).over(w)
    )
    return (
        labeled.groupBy(key, "_cep_ep")
        .agg(
            F.min("_cep_ms").alias("episode_start_ms"),
            F.max("_cep_ms").alias("episode_end_ms"),
            _seq_agg(),
        )
        .select(
            key,
            "episode_start_ms",
            "episode_end_ms",
            *_match_cols("seq", pattern),
        )
    )
