"""MATCH_RECOGNIZE-style CEP pattern matching (operators/cep.py).

The extended-registry oracle (tests/test_extended_oracle.py) certifies
`cep_pattern_match` against DuckDB's regex scan; these tests pin the
semantics the oracle can't see: planted episodes with known match counts,
non-overlapping leftmost scanning, adjacency broken by unmapped symbols,
determinism under repartitioning, and the reserved-name / bad-symbol error
contracts.
"""

from __future__ import annotations

import sys
from datetime import datetime, timezone
from pathlib import Path

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from exposure_notifications_private_analytics_ingestion_spark.operators.cep import (  # noqa: E402
    pattern_match,
    symbol_sequences,
)

SYMBOLS = {"view": "v", "click": "c", "purchase": "p"}


def _ts(s):
    return datetime(2024, 1, 1, 0, 0, int(s), tzinfo=timezone.utc)


def _events(spark, rows):
    # rows: (user_id, event_id, second, event_type)
    return spark.createDataFrame(
        [(u, e, _ts(s), t) for u, e, s, t in rows],
        "user_id long, event_id long, ts timestamp, event_type string",
    )


def _match(df, pattern="vc*p"):
    return pattern_match(
        df,
        key="user_id",
        ts_ms=F.expr("unix_micros(ts) div 1000"),
        tiebreak=F.col("event_id"),
        type_col="event_type",
        symbols=SYMBOLS,
        pattern=pattern,
    )


def test_planted_episodes_counted(spark):
    rows = [
        # user 1: v c c p v p  -> two non-overlapping matches of vc*p
        (1, 1, 1, "view"), (1, 2, 2, "click"), (1, 3, 3, "click"),
        (1, 4, 4, "purchase"), (1, 5, 5, "view"), (1, 6, 6, "purchase"),
        # user 2: p v c (purchase precedes view) -> no match
        (2, 1, 1, "purchase"), (2, 2, 2, "view"), (2, 3, 3, "click"),
    ]
    out = {r["user_id"]: r for r in _match(_events(spark, rows)).collect()}
    assert out[1]["n_matches"] == 2
    assert out[1]["first_match"] == "vccp"
    assert out[1]["seq_len"] == 6
    assert out[2]["n_matches"] == 0
    assert out[2]["first_match"] == ""


def test_unmapped_symbol_breaks_adjacency(spark):
    # v c X p: the unmapped 'refund' becomes '_' which vc*p cannot cross
    rows = [
        (1, 1, 1, "view"), (1, 2, 2, "click"),
        (1, 3, 3, "refund"), (1, 4, 4, "purchase"),
    ]
    out = _match(_events(spark, rows)).collect()[0]
    assert out["n_matches"] == 0
    assert out["seq_len"] == 4  # unmapped events still occupy a slot


def test_order_is_ts_then_tiebreak_and_partitioning_independent(spark):
    # same timestamp: event_id breaks the tie -> v(1) before p(2)
    rows = [(1, 2, 5, "purchase"), (1, 1, 5, "view")]
    df = _events(spark, rows)
    seq1 = symbol_sequences(
        df, "user_id", F.expr("unix_micros(ts) div 1000"),
        F.col("event_id"), "event_type", SYMBOLS,
    ).collect()[0]["seq"]
    seq2 = symbol_sequences(
        df.repartition(7), "user_id", F.expr("unix_micros(ts) div 1000"),
        F.col("event_id"), "event_type", SYMBOLS,
    ).collect()[0]["seq"]
    assert seq1 == seq2 == "vp"


def test_null_rows_are_dropped(spark):
    df = spark.createDataFrame(
        [(1, 1, _ts(1), "view"), (1, 2, None, "purchase"), (None, 3, _ts(3), "view")],
        "user_id long, event_id long, ts timestamp, event_type string",
    )
    rows = _match(df).collect()
    assert len(rows) == 1 and rows[0]["seq_len"] == 1


def test_nonoverlapping_leftmost_scan(spark):
    # v v p: leftmost greedy vc*p with [^] not allowed to restart inside —
    # 'v.*?p'-style overlap questions don't arise; here 'v' at idx0 can't
    # match (vv breaks c*), the scan resumes and matches v(1)p(2) once.
    rows = [(1, 1, 1, "view"), (1, 2, 2, "view"), (1, 3, 3, "purchase")]
    out = _match(_events(spark, rows)).collect()[0]
    assert out["n_matches"] == 1
    assert out["first_match"] == "vp"


def test_error_contracts(spark):
    df = _events(spark, [(1, 1, 1, "view")])
    with pytest.raises(ValueError, match="single char"):
        pattern_match(
            df, "user_id", F.expr("unix_micros(ts) div 1000"), F.col("event_id"),
            "event_type", {"view": "vv"}, "v",
        )
    with pytest.raises(ValueError, match="reserves"):
        pattern_match(
            df.withColumn("_cep_ms", F.lit(1)), "user_id",
            F.expr("unix_micros(ts) div 1000"), F.col("event_id"),
            "event_type", SYMBOLS, "v",
        )


def test_episode_split_isolates_matches(spark):
    from exposure_notifications_private_analytics_ingestion_spark.operators.cep import (
        episode_pattern_match,
    )

    # v c | (31-min gap) | p : whole-history matching would see vcp; the
    # episode matcher must split at the gap and match NOTHING
    rows = [(1, 1, 1, "view"), (1, 2, 2, "click")]
    df = _events(spark, rows).union(
        spark.createDataFrame(
            [(1, 3, datetime(2024, 1, 1, 0, 31, 2, tzinfo=timezone.utc), "purchase")],
            "user_id long, event_id long, ts timestamp, event_type string",
        )
    )
    out = episode_pattern_match(
        df, "user_id", F.expr("unix_micros(ts) div 1000"), F.col("event_id"),
        "event_type", SYMBOLS, "vc*p", gap_s=1800,
    ).orderBy("episode_start_ms").collect()
    assert len(out) == 2
    assert [r["seq_len"] for r in out] == [2, 1]
    assert all(r["n_matches"] == 0 for r in out)
    # sanity: whole-history matching DOES see it (ignores the gap)
    assert _match(df).collect()[0]["n_matches"] == 1


def test_no_python_in_plan(spark):
    plan = _match(_events(spark, [(1, 1, 1, "view")]))._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_randomized_against_python_reference(spark):
    """One large seeded-random input (300 keys, duplicate timestamps,
    unmapped types, nulls) through BOTH CEP forms, compared row-for-row
    against an independent pure-Python implementation — one Spark job,
    hundreds of adversarial keys."""
    import random
    import re as _re
    from collections import defaultdict

    from exposure_notifications_private_analytics_ingestion_spark.operators.cep import (
        episode_pattern_match,
    )

    rnd = random.Random(42)
    GAP_MS = 120_000
    types = list(SYMBOLS) + ["refund", "login"]
    rows = []
    eid = 0
    for k in range(300):
        t_ms = rnd.randrange(0, 10_000) * 1000
        for _ in range(rnd.randrange(1, 25)):
            eid += 1
            # duplicate timestamps on purpose (tie-break via event_id)
            if rnd.random() < 0.15 and rows and rows[-1][0] == k:
                t = rows[-1][2]
            else:
                t_ms += rnd.choice([500, 1000, 30_000, GAP_MS + 1000])
                t = t_ms
            rows.append((k, eid, t, rnd.choice(types)))
    df = spark.createDataFrame(
        [
            (k, e, datetime.fromtimestamp(t / 1000, tz=timezone.utc), ty)
            for k, e, t, ty in rows
        ],
        "user_id long, event_id long, ts timestamp, event_type string",
    )

    PAT = "v[ce]*p"
    rx = _re.compile(PAT)
    byk = defaultdict(list)
    for k, e, t, ty in rows:
        byk[k].append((t, e, SYMBOLS.get(ty, "_")))
    ref_ep, ref_whole = [], []
    for k, rs in byk.items():
        rs.sort()
        s_all = "".join(x[2] for x in rs)
        m_all = list(rx.finditer(s_all))
        ref_whole.append(
            (k, len(m_all), m_all[0].group(0) if m_all else "", len(s_all))
        )
        eps = []
        for r in rs:
            if eps and r[0] - eps[-1][-1][0] <= GAP_MS:
                eps[-1].append(r)
            else:
                eps.append([r])
        for ep in eps:
            s = "".join(x[2] for x in ep)
            m = list(rx.finditer(s))
            ref_ep.append(
                (k, ep[0][0], ep[-1][0], len(m), m[0].group(0) if m else "", len(s))
            )

    got_ep = sorted(
        tuple(r)
        for r in episode_pattern_match(
            df, "user_id", F.expr("unix_micros(ts) div 1000"), F.col("event_id"),
            "event_type", SYMBOLS, PAT, gap_s=GAP_MS // 1000,
        ).collect()
    )
    assert got_ep == sorted(ref_ep)

    got_whole = sorted(tuple(r) for r in _match(df, PAT).collect())
    assert got_whole == sorted(ref_whole)


def test_plan_shapes_single_exchange(spark):
    """Whole-history: one agg exchange, no Sort/Window node (the ordering is
    expression-level array_sort). Episode-scoped: the per-(key, episode)
    aggregation reuses the window's HashPartitioning(key) — ONE exchange for
    the whole operator."""
    from exposure_notifications_private_analytics_ingestion_spark.operators.cep import (
        episode_pattern_match,
    )

    df = _events(spark, [(1, 1, 1, "view"), (1, 2, 2, "purchase")])
    whole = _match(df)._jdf.queryExecution().executedPlan().toString()
    assert whole.count("Exchange") == 1
    assert "Sort " not in whole and "Window" not in whole
    ep = episode_pattern_match(
        df, "user_id", F.expr("unix_micros(ts) div 1000"), F.col("event_id"),
        "event_type", SYMBOLS, "vp", gap_s=1800,
    )._jdf.queryExecution().executedPlan().toString()
    assert ep.count("Exchange") == 1
    assert "EvalPython" not in ep
