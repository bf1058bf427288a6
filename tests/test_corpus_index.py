"""Incremental corpus dedup: persisted MinHash band index (operators/corpus_index).

Covers the cross-batch contract the one-shot LSH self-join can't express:
batch N+1 is deduped against batch N's novel docs via the appended delta,
appends are idempotent per batch_id, and verdicts agree with the self-join
operator on the same signature family.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from exposure_notifications_private_analytics_ingestion_spark.operators.corpus_index import (  # noqa: E402
    append_batch,
    build_corpus_index,
    incremental_dedup,
    read_index,
)
from exposure_notifications_private_analytics_ingestion_spark.operators.doc_dedup import (  # noqa: E402
    minhash_lsh_pairs,
)

KW = dict(k=4, bands=4, n=3, n_buckets=8)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id int, text string")


TEXTS = {
    1: "the quick brown fox jumps over the lazy dog today",
    2: "pack my box with five dozen liquor jugs right now",
    3: "sphinx of black quartz judge my vow before sunset falls",
}


def test_incremental_verdicts_and_append(spark, tmp_path):
    idx = str(tmp_path / "idx")
    corpus = _docs(spark, [(i, TEXTS[i]) for i in (1, 2, 3)])
    build_corpus_index(corpus, idx, **KW)

    # batch 1: one exact copy of corpus doc 1, one novel doc
    batch1 = _docs(
        spark,
        [(10, TEXTS[1]), (11, "completely unrelated words about distributed query engines and shuffles")],
    )
    v1 = {r["doc_id"]: r for r in incremental_dedup(spark, batch1, idx, **KW).collect()}
    assert v1[10]["dup_of"] == 1 and v1[10]["n_shared_bands"] == 4
    assert v1[11]["dup_of"] is None and v1[11]["n_shared_bands"] == 0

    # append batch 1's novel docs; batch 2 copies the novel doc → now a dup
    append_batch(batch1, incremental_dedup(spark, batch1, idx, **KW), idx, "b1", **KW)
    batch2 = _docs(
        spark,
        [(20, "completely unrelated words about distributed query engines and shuffles")],
    )
    v2 = incremental_dedup(spark, batch2, idx, **KW).collect()[0]
    assert v2["dup_of"] == 11 and v2["n_shared_bands"] == 4


def test_append_is_idempotent_and_skips_dups(spark, tmp_path):
    idx = str(tmp_path / "idx")
    build_corpus_index(_docs(spark, [(1, TEXTS[1])]), idx, **KW)
    batch = _docs(spark, [(10, TEXTS[1]), (11, TEXTS[2])])
    verdicts = incremental_dedup(spark, batch, idx, **KW)
    append_batch(batch, verdicts, idx, "b1", **KW)
    n1 = read_index(spark, idx).count()
    # re-run the same append (crash-retry): overwrite, not duplicate
    append_batch(batch, verdicts, idx, "b1", **KW)
    assert read_index(spark, idx).count() == n1
    # only the NOVEL doc (11) was registered, under its own delta
    appended = read_index(spark, idx).filter("delta = 'b1'")
    assert appended.select("corpus_doc_id").distinct().collect()[0][0] == 11


def test_append_rejects_reserved_or_pathy_batch_id(spark, tmp_path):
    idx = str(tmp_path / "idx")
    build_corpus_index(_docs(spark, [(1, TEXTS[1])]), idx, **KW)
    batch = _docs(spark, [(10, TEXTS[2])])
    verdicts = incremental_dedup(spark, batch, idx, **KW)
    for bad in ("base", "a/b", ""):
        with pytest.raises(ValueError):
            append_batch(batch, verdicts, idx, bad, **KW)


def test_matches_selfjoin_operator_on_union(spark, tmp_path):
    """Verdicts must agree with minhash_lsh_pairs on corpus ∪ batch: for a
    batch doc, dup_of = min corpus partner among shared-band pairs."""
    idx = str(tmp_path / "idx")
    rows = [(i, TEXTS[(i % 3) + 1]) for i in range(1, 8)]  # heavy duplication
    corpus = [(i, t) for i, t in rows if i % 2 == 1]
    batch = [(i + 100, t) for i, t in rows if i % 2 == 0]
    build_corpus_index(_docs(spark, corpus), idx, **KW)
    verdicts = {
        r["doc_id"]: r["dup_of"]
        for r in incremental_dedup(spark, _docs(spark, batch), idx, **KW).collect()
    }
    union = _docs(spark, corpus + batch)
    pairs = minhash_lsh_pairs(union, k=4, bands=4, n=3).collect()
    corpus_ids = {i for i, _ in corpus}
    expect: dict[int, int] = {}
    for r in pairs:
        a, b = r["doc_a"], r["doc_b"]
        for bid, cid in ((a, b), (b, a)):
            if bid > 100 and cid in corpus_ids:
                expect[bid] = min(expect.get(bid, cid), cid)
    for bid, _ in batch:
        assert verdicts[bid] == expect.get(bid)


def test_plan_is_equijoin_and_signature_only_scan(spark, tmp_path):
    idx = str(tmp_path / "idx")
    build_corpus_index(_docs(spark, [(i, TEXTS[(i % 3) + 1]) for i in range(30)]), idx, **KW)
    plan = (
        incremental_dedup(spark, _docs(spark, [(100, TEXTS[1])]), idx, **KW)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
