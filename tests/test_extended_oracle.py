"""Oracle certification + behavioral tests for the EXTENDED registry
(round-4 breadth ops added after the driver's 50-row budget was full):
sequence packing, benchmark contamination, PII scrubbing, funnel stages.

Certification mirrors the driver's gate exactly (DuckDB oracle, rows +
order-insensitive value hash over name-sorted columns) at sf0.001; the
behavioral tests pin the semantics the oracle can't see (planted PII,
planted contamination, packing invariants).
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from exposure_notifications_private_analytics_ingestion_spark.operators.contamination import (  # noqa: E402
    contamination_check,
)
from exposure_notifications_private_analytics_ingestion_spark.operators.packing import (  # noqa: E402
    pack_sequences,
    packing_summary,
)
from exposure_notifications_private_analytics_ingestion_spark.operators.text_analysis import (  # noqa: E402
    pii_scrub,
)
from exposure_notifications_private_analytics_ingestion_spark.queries import (  # noqa: E402
    extended_registry,
    registry,
    retired_registry,
)
from tools.oracle_check import TABLES, norm_hash  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def oracle():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def test_extended_disjoint_from_driver_registry():
    ext = extended_registry()
    assert not set(ext) & set(registry())
    assert not set(ext) & set(retired_registry())
    assert all(sql is not None for _fn, sql in ext.values())


@pytest.mark.parametrize("name", sorted(extended_registry()))
def test_extended_query_matches_oracle(spark, oracle, name):
    fn, sql = extended_registry()[name]
    spdf = fn(spark, SF_DIR).toPandas()
    opdf = oracle.execute(sql).df()
    sn, ss, sh = norm_hash(spdf)
    on, _os, oh = norm_hash(opdf)
    assert sn == on, f"{name}: row count {sn} != oracle {on}"
    assert sh == oh, f"{name}: value hash mismatch (spark schema {ss})"


# --------------------------------------------------------------- packing


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_pack_sequences_offsets_contiguous(spark):
    rows = [
        (i, "en" if i % 2 else "de", " ".join(["w"] * (3 + i % 7)))
        for i in range(200)
    ]
    out = (
        pack_sequences(_docs(spark, rows), seq_len=16, bucket_width=8)
        .orderBy("lang", "doc_id")
        .collect()
    )
    offset = {}
    for r in out:
        assert r["tok_start"] == offset.get(r["lang"], 0), r
        offset[r["lang"]] = r["tok_start"] + r["n_tokens"]
        assert r["seq_first"] == r["tok_start"] // 16
        assert r["seq_last"] == (r["tok_start"] + r["n_tokens"] - 1) // 16
        assert r["n_seqs_spanned"] == r["seq_last"] - r["seq_first"] + 1


def test_pack_sequences_matches_naive_window(spark):
    """The two-level prefix sum must equal the naive unbounded window."""
    rows = [(i, "en", " ".join(["x"] * (1 + (i * 7) % 13))) for i in range(500)]
    df = _docs(spark, rows)
    fast = pack_sequences(df, seq_len=64, bucket_width=32)
    from pyspark.sql import Window

    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    naive = df.select(
        "doc_id",
        F.coalesce(
            F.sum(F.size(F.split("text", " ")).cast("long")).over(w), F.lit(0)
        ).alias("tok_start"),
    )
    diff = (
        fast.select("doc_id", "tok_start")
        .exceptAll(naive)
        .count()
    )
    assert diff == 0


def test_pack_sequences_reserved_names(spark):
    df = _docs(spark, [(1, "en", "a b")]).withColumn("_bkt", F.lit(1))
    with pytest.raises(ValueError, match="_bkt"):
        pack_sequences(df, seq_len=8)


def test_packing_summary_tail_pad(spark):
    rows = [(0, "en", " ".join(["w"] * 10)), (1, "en", " ".join(["w"] * 5))]
    packed = pack_sequences(_docs(spark, rows), seq_len=8, bucket_width=4)
    s = packing_summary(packed, seq_len=8).collect()[0]
    assert s["n_docs"] == 2 and s["total_tokens"] == 15
    assert s["n_sequences"] == 2 and s["tail_pad_tokens"] == 1


# ----------------------------------------------------------- contamination


def test_contamination_planted_overlap(spark):
    bench = _docs(spark, [(100, "en", "alpha beta gamma delta epsilon zeta")])
    corpus = _docs(
        spark,
        [
            # copies the benchmark 5-gram "alpha beta gamma delta epsilon"
            (1, "en", "alpha beta gamma delta epsilon other words here pad"),
            (2, "en", "totally unrelated content with many different words"),
            (3, "en", "too short"),  # < 5 words → dropped (no evidence)
        ],
    )
    out = {
        r["doc_id"]: r
        for r in contamination_check(corpus, bench, n=5, threshold=0.1).collect()
    }
    assert set(out) == {1, 2}
    assert out[1]["n_hit_ngrams"] == 1 and out[1]["is_contaminated"]
    assert out[2]["n_hit_ngrams"] == 0 and not out[2]["is_contaminated"]


# ----------------------------------------------------------------- PII


def test_pii_scrub_planted(spark):
    df = _docs(
        spark,
        [
            (1, "en", "mail me at jane.doe+x@example.co.uk or 10.0.0.1 now"),
            (2, "en", "ssn 123-45-6789 twice 987-65-4321 end"),
            (3, "en", "clean text with no identifiers at all"),
        ],
    )
    out = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    assert out[1]["n_email"] == 1 and out[1]["n_ipv4"] == 1 and out[1]["n_pii"] == 2
    assert out[2]["n_id9"] == 2 and out[2]["n_pii"] == 2
    assert out[3]["n_pii"] == 0
    # redaction actually removes the identifiers
    red = pii_scrub(df.filter("doc_id = 1"))
    assert red.count() == 1


def test_pii_scrub_redacts_text(spark):
    df = _docs(spark, [(1, "en", "a@b.io x"), (2, "en", "a@b.io x")])
    out = pii_scrub(df).select("redacted_md5").distinct().collect()
    assert len(out) == 1  # deterministic
    import hashlib

    assert out[0][0] == hashlib.md5(b"<EMAIL> x").hexdigest()


def test_sequence_dedup_groups_planted_duplicates(spark, tmp_path):
    """Two users with identical ordered event-type sequences collapse to
    one group with the min-user representative; order matters (a reversed
    sequence is a different fingerprint)."""
    import pandas as pd

    from exposure_notifications_private_analytics_ingestion_spark.queries import (
        q_sequence_dedup_groups,
    )

    rows = []
    for uid, seq in [
        (7, ["view", "click", "purchase"]),
        (3, ["view", "click", "purchase"]),  # exact duplicate of user 7
        (9, ["purchase", "click", "view"]),  # same multiset, different order
    ]:
        for i, et in enumerate(seq):
            rows.append(
                {
                    "event_id": uid * 100 + i,
                    "ts": pd.Timestamp("2024-01-01") + pd.Timedelta(minutes=i),
                    "user_id": uid,
                    "event_type": et,
                    "value": 1.0,
                    "props": "{}",
                }
            )
    sf = str(tmp_path)
    spark.createDataFrame(pd.DataFrame(rows)).coalesce(1).write.parquet(
        f"{sf}/events.parquet"
    )
    out = {r["rep_user"]: r["n_users"] for r in q_sequence_dedup_groups(spark, sf).collect()}
    assert out == {3: 2, 9: 1}


def test_normalize_text_planted(spark):
    """Planted tags/control chars/whitespace runs normalize as specified;
    Spark result equals DuckDB on the planted rows too."""
    import pandas as pd

    from exposure_notifications_private_analytics_ingestion_spark.operators.text_analysis import (
        normalize_text,
    )

    rows = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "<p>Hello   <b>world</b></p>",
                "tabs\tand\nnewlines\x01here",
                "  already clean  ",
            ],
        }
    )
    out = {
        r["doc_id"]: r
        for r in normalize_text(spark.createDataFrame(rows)).collect()
    }
    import hashlib

    def h(s):
        return hashlib.md5(s.encode()).hexdigest()

    assert out[1]["norm_md5"] == h("Hello world")
    assert out[2]["norm_md5"] == h("tabs and newlines here")
    assert out[3]["norm_md5"] == h("already clean")
    assert out[1]["removed_chars"] == len(rows.text[0]) - len("Hello world")


def test_fuzzy_match_planted_near_duplicates(spark):
    """Near-identical names match above threshold with the best match
    winning; unrelated names don't match; sub-trigram strings drop."""
    from exposure_notifications_private_analytics_ingestion_spark.operators.fuzzy_join import (
        fuzzy_match,
    )

    left = spark.createDataFrame(
        [(1, "acme tool supply"), (2, "zz"), (3, "quantum widgets ltd")],
        "id bigint, name string",
    )
    right = spark.createDataFrame(
        [
            (10, "acme tool supplies"),   # near-dup of 1
            (11, "acme tools"),           # weaker match of 1
            (12, "completely different"), # noise
        ],
        "id bigint, name string",
    )
    out = {r["id"]: r for r in fuzzy_match(
        left, right, "id", "name", "id", "name", threshold=0.4
    ).collect()}
    assert set(out) == {1}                       # 2 too short, 3 no match
    assert out[1]["match_id"] == 10              # best, not just any
    assert out[1]["jaccard"] > 0.7


def test_fuzzy_prefix_filter_equals_naive_join(spark):
    """The AllPairs prefix-filtered path must return EXACTLY the naive
    trigram-join path's rows (zero false negatives from the prefix cut,
    zero extras from the length filter) on random-ish names with planted
    near-duplicates and hot shared tokens, across thresholds."""
    from exposure_notifications_private_analytics_ingestion_spark.operators.fuzzy_join import (
        fuzzy_match,
    )
    import random

    rnd = random.Random(11)
    words = ["acme", "global", "widget", "supply", "quantum", "labs",
             "united", "tool", "corp", "intl"]
    mk = lambda: " ".join(rnd.choice(words) for _ in range(rnd.randint(2, 4)))
    lrows = [(i, mk()) for i in range(80)]
    # right side: perturbed copies of some left names + fresh noise
    rrows = [(100 + i, t + ("s" if i % 3 == 0 else "")) for i, (_, t) in enumerate(lrows[:40])]
    rrows += [(200 + i, mk()) for i in range(40)]
    L = spark.createDataFrame(lrows, "id bigint, name string")
    R = spark.createDataFrame(rrows, "id bigint, name string")
    for thr in (0.3, 0.5, 0.8):
        for best in (False, True):
            fast = fuzzy_match(L, R, "id", "name", "id", "name",
                               threshold=thr, best_only=best,
                               prefix_filter=True)
            base = fuzzy_match(L, R, "id", "name", "id", "name",
                               threshold=thr, best_only=best,
                               prefix_filter=False)
            a = sorted(map(tuple, fast.collect()))
            b = sorted(map(tuple, base.collect()))
            assert a == b, (thr, best, a[:5], b[:5])
            assert len(a) > 0  # the fixture actually exercises matches


def test_sessionize_splits_on_gap(spark, tmp_path):
    """Planted timeline: events 10 min apart share a session; a 31-min gap
    opens a new one."""
    import pandas as pd

    from exposure_notifications_private_analytics_ingestion_spark.queries import (
        q_sessionize_events,
    )

    t0 = pd.Timestamp("2024-01-01")
    rows = [
        {"event_id": i, "ts": t0 + pd.Timedelta(minutes=m), "user_id": 1,
         "event_type": "view", "value": 1.0, "props": "{}"}
        for i, m in enumerate([0, 10, 20, 51, 61])  # gap 31 min after idx 2
    ]
    sf = str(tmp_path)
    spark.createDataFrame(pd.DataFrame(rows)).coalesce(1).write.parquet(
        f"{sf}/events.parquet"
    )
    out = sorted(
        (r["session_idx"], r["n_events"])
        for r in q_sessionize_events(spark, sf).collect()
    )
    assert out == [(0, 3), (1, 2)]
