"""Bigram-LM perplexity filter (operators/lm_score.py): law tests (fluent <
disfluent, unseen floor, occurrence weighting), determinism, and the
self-scoring registry surface."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from exposure_notifications_private_analytics_ingestion_spark.operators.lm_score import (
    lm_perplexity,
    lm_quality_scores,
    train_bigram_lm,
)


@pytest.fixture(scope="module")
def corpus(spark):
    # a tiny reference corpus with a strong bigram structure
    rows = [
        ("r1", "the cat sat on the mat"),
        ("r2", "the cat sat on the chair"),
        ("r3", "the dog sat on the mat"),
        ("r4", "a cat and a dog"),
    ]
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_fluent_text_scores_lower_than_shuffled(spark, corpus):
    b, u, v = train_bigram_lm(corpus)
    probe = spark.createDataFrame(
        [
            ("fluent", "the cat sat on the mat"),
            ("shuffled", "mat the on sat cat the"),
            ("garbage", "zxq qqv wkj pgh bbn mmr"),
        ],
        "doc_id string, text string",
    )
    got = {r["doc_id"]: r for r in lm_perplexity(probe, b, u, v).collect()}
    # word-order sensitivity: same words, fluent order scores lower
    assert got["fluent"]["avg_neg_logp"] < got["shuffled"]["avg_neg_logp"]
    assert got["fluent"]["avg_neg_logp"] < got["garbage"]["avg_neg_logp"]
    # vocabulary garbage is caught by the OOV axis, not perplexity alone
    # (add-one gives unseen contexts 1/V — see lm_perplexity docstring)
    assert got["garbage"]["oov_frac"] == 1.0
    assert got["fluent"]["oov_frac"] == 0.0 == got["shuffled"]["oov_frac"]


def test_oov_frac_is_token_level_including_first_token(spark, corpus):
    """A leading OOV word must count: 'zxq the cat sat' is 1/4 OOV even
    though every bigram SECOND word is in-vocabulary."""
    b, u, v = train_bigram_lm(corpus)
    probe = spark.createDataFrame(
        [("lead", "zxq the cat sat")], "doc_id string, text string"
    )
    row = lm_perplexity(probe, b, u, v).collect()[0]
    assert row["oov_frac"] == 0.25


def test_unseen_bigrams_get_finite_floor(spark, corpus):
    b, u, v = train_bigram_lm(corpus)
    probe = spark.createDataFrame(
        [("x", "completely novel wording here")], "doc_id string, text string"
    )
    row = lm_perplexity(probe, b, u, v).collect()[0]
    # all-unseen: P = 1/V per bigram → avg_neg_logp = ln(V) exactly
    import math

    assert row["n_bigrams"] == 3
    assert abs(row["avg_neg_logp"] - math.log(v)) < 1e-6


def test_short_docs_drop_and_occurrences_weight(spark, corpus):
    b, u, v = train_bigram_lm(corpus)
    probe = spark.createDataFrame(
        [("one", "hello"), ("rep", "the cat the cat the cat")],
        "doc_id string, text string",
    )
    out = lm_perplexity(probe, b, u, v)
    ids = {r["doc_id"] for r in out.collect()}
    assert ids == {"rep"}  # <2 tokens carries no bigram evidence
    assert out.collect()[0]["n_bigrams"] == 5  # occurrences, not distinct


def test_deterministic_under_repartition(spark, corpus):
    a = {
        (r["doc_id"], r["avg_neg_logp"], r["n_bigrams"])
        for r in lm_quality_scores(corpus).collect()
    }
    bset = {
        (r["doc_id"], r["avg_neg_logp"], r["n_bigrams"])
        for r in lm_quality_scores(corpus.repartition(7)).collect()
    }
    assert a == bset


def test_self_scoring_registry_surface(spark):
    from exposure_notifications_private_analytics_ingestion_spark import queries as q

    fn, sql = q.approx_registry()["lm_quality"]
    out = fn(spark, "/root/testdata/sf0.001")
    assert out.count() > 0
    cols = [f.name for f in out.schema.fields]
    assert cols == ["doc_id", "n_bigrams", "avg_neg_logp", "perplexity", "oov_frac"]
    # self-scoring: every token is in its own training vocab
    assert out.filter(F.col("oov_frac") != 0.0).count() == 0
    # every score finite and positive
    assert out.filter(
        F.col("avg_neg_logp").isNull() | (F.col("avg_neg_logp") <= 0)
    ).count() == 0
