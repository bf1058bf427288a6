"""Round-6 optimization-equivalence pins: the verify/CC internals changed
(int-encoded shingle intersect + barrier; size-gated driver union-find), so
each fast path is checked value-equal to the path it replaced."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from exposure_notifications_private_analytics_ingestion_spark.operators.clustering import (
    connected_components,
)
from exposure_notifications_private_analytics_ingestion_spark.operators.doc_dedup import (
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
)


def _random_pairs(n_nodes=200, n_edges=300, seed=7):
    rng = random.Random(seed)
    return sorted(
        {
            tuple(sorted(rng.sample(range(n_nodes), 2)))
            for _ in range(n_edges)
        }
    )


def test_cc_fast_path_equals_distributed_loop(spark):
    pairs = spark.createDataFrame(
        _random_pairs(), "doc_a long, doc_b long"
    )
    fast = connected_components(pairs)  # small graph → union-find
    slow = connected_components(pairs, small_graph_max=0)  # force the loop
    assert fast.schema == slow.schema
    assert sorted(map(tuple, fast.collect())) == sorted(
        map(tuple, slow.collect())
    )


def test_cc_string_ids_keep_distributed_loop(spark):
    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], "doc_a string, doc_b string"
    )
    out = sorted(map(tuple, connected_components(pairs).collect()))
    assert out == [("a", "a"), ("b", "a"), ("c", "a"), ("x", "x"), ("y", "x")]


def test_pq_train_local_equals_distributed(spark):
    """The size-gated driver-side Lloyd twin must produce a byte-identical
    codebook to the distributed kernel loop."""
    import random

    import exposure_notifications_private_analytics_ingestion_spark.operators.pq as pq

    rng = random.Random(5)
    df = spark.createDataFrame(
        [
            (i, [rng.uniform(-1, 1) for _ in range(64)])
            for i in range(300)
        ],
        "vec_id long, embedding array<float>",
    )
    local = sorted(map(tuple, pq.pq_train(df).collect()))
    orig = pq._TRAIN_COLLECT_MAX
    pq._TRAIN_COLLECT_MAX = 0  # force the distributed loop
    try:
        dist = sorted(map(tuple, pq.pq_train(df).collect()))
    finally:
        pq._TRAIN_COLLECT_MAX = orig
    assert [(s, c, list(v)) for s, c, v in local] == [
        (s, c, list(v)) for s, c, v in dist
    ]


def test_pq_train_empty_input_returns_empty_codebook(spark):
    import exposure_notifications_private_analytics_ingestion_spark.operators.pq as pq

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert pq.pq_train(empty).count() == 0


def test_cc_null_ids_fall_back_to_distributed_loop(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (None, 7), (8, None)],
        "doc_a long, doc_b long",
    )
    fast_path_out = connected_components(pairs).collect()
    loop_out = connected_components(pairs, small_graph_max=0).collect()
    assert sorted(map(tuple, fast_path_out), key=str) == sorted(
        map(tuple, loop_out), key=str
    )


def test_encode_np_equals_jvm_encode(spark):
    """The one-pass NumPy encode must equal the JVM literal-argmin encode
    (codes, qn) for the same codebook."""
    import random

    import exposure_notifications_private_analytics_ingestion_spark.operators.pq as pq

    rng = random.Random(3)
    df = spark.createDataFrame(
        [
            (i, [rng.uniform(-1, 1) for _ in range(64)], i % 4)
            for i in range(250)
        ],
        "vec_id long, embedding array<float>, label int",
    )
    cb = pq._pq_train_rows(df)
    jvm = {
        r["vec_id"]: (r["qn"], list(r["codes"]))
        for r in pq.pq_encode(df, cb, extra=["label"]).collect()
    }
    np_ = {
        r["vec_id"]: (r["qn"], list(r["codes"]))
        for r in pq._encode_np(
            df, cb, 8, "vec_id", "embedding", 64, ["label"]
        ).collect()
    }
    assert jvm == np_


def test_lm_self_scoring_oov_shortcut(spark):
    """Self-scoring with known_full_vocab=True must equal the full oov
    path row-for-row (every token is in-vocabulary by construction)."""
    import random

    from exposure_notifications_private_analytics_ingestion_spark.operators.lm_score import (
        lm_perplexity,
        train_bigram_lm,
    )

    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(9)]
    docs = spark.createDataFrame(
        [
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 25))))
            for i in range(150)
        ],
        "doc_id long, text string",
    )
    b, u, v = train_bigram_lm(docs)
    full = sorted(map(tuple, lm_perplexity(docs, b, u, v).collect()))
    fast = sorted(
        map(tuple, lm_perplexity(docs, b, u, v, known_full_vocab=True).collect())
    )
    assert full == fast


def test_verify_hash_encode_matches_string_arrays(spark, monkeypatch):
    """The xxhash64 shingle encoding must produce the exact same verified
    pairs as the string-array fallback (n_inter is invariant under the
    injective relabeling the guard certifies)."""
    rng = random.Random(13)
    vocab = [f"w{i}" for i in range(12)]
    docs = spark.createDataFrame(
        [
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 30))))
            for i in range(120)
        ],
        "doc_id long, text string",
    )
    cands = minhash_lsh_pairs(docs, k=4, bands=4, n=3)
    hashed = ngram_jaccard_pairs(
        docs, n=3, threshold=0.05, candidates=cands
    ).collect()

    # force the string fallback by making the injectivity guard fail
    import exposure_notifications_private_analytics_ingestion_spark.operators.doc_dedup as dd

    real_xxhash64 = F.xxhash64
    monkeypatch.setattr(
        dd.F, "xxhash64", lambda c: F.lit(0), raising=True
    )
    try:
        fallback = ngram_jaccard_pairs(
            docs, n=3, threshold=0.05, candidates=cands
        ).collect()
    finally:
        monkeypatch.setattr(dd.F, "xxhash64", real_xxhash64, raising=True)
    key = lambda r: (r["doc_a"], r["doc_b"])  # noqa: E731
    assert sorted(map(tuple, hashed)) == sorted(map(tuple, fallback))
    assert len({key(r) for r in hashed}) == len(hashed)
