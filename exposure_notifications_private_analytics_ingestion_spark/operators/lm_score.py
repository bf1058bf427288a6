"""Bigram language-model perplexity scoring — the CCNet/KenLM-style
quality filter for pretraining corpora (Wenzek et al., "CCNet: Extracting
High Quality Monolingual Datasets from Web Crawl Data", 2020): score each
document by how surprising its word sequence is under an n-gram model
trained on a reference corpus; high perplexity ≈ boilerplate soup, OCR
noise, keyword stuffing.

Model: add-one-smoothed bigram ML estimates,
    P(w2 | w1) = (C(w1,w2) + 1) / (C(w1) + V),
with V = training vocabulary size. Per-document score = mean −ln P over
the document's bigrams (lower = more fluent under the reference corpus);
documents with fewer than 2 tokens carry no bigram evidence and are
dropped, matching ``shingles_df``'s convention.

Spark shape, fully JVM-side:
- training is two hash-aggregates over an exploded bigram projection
  (map-side partials absorb Zipf-skewed hot words — the same reason
  ``span_dedup`` uses an agg, not a window);
- scoring joins each document bigram to the count tables on the bigram /
  first-word keys. Both are plain shuffle hash joins at corpus scale; a
  Zipf head is absorbed by AQE skew splitting, and a small reference LM
  (the common case: score a huge corpus against a curated reference)
  broadcasts.
- the log/divide runs once per DISTINCT document bigram, not per
  occurrence: occurrences collapse first (count per doc), then join.

Scores are floating point (ln), so the gate is law tests
(``tests/test_lm_score.py``) + determinism, not a DuckDB value hash —
double summation order across engines differs in ulps.

No reference analog (the reference never inspects payload content); this
extends the text-quality suite (``text_analysis.quality_score``) with the
corpus-statistical filter every pretraining pipeline runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bigrams(df: DataFrame, text: str, id_col: str) -> DataFrame:
    """(id, w1, w2) per bigram occurrence; docs with <2 tokens drop out."""
    ws = F.split(F.lower(F.col(text)), " ")
    return (
        df.select(
            F.col(id_col),
            F.posexplode(
                F.transform(
                    F.slice(ws, 1, F.greatest(F.size(ws) - 1, F.lit(0))),
                    lambda w, i: F.struct(
                        w.alias("w1"), F.element_at(ws, i + 2).alias("w2")
                    ),
                )
            ).alias("_pos", "bg"),
        )
        .select(id_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    )


def train_bigram_lm(
    corpus: DataFrame, text: str = "text", id_col: str = "doc_id"
) -> tuple[DataFrame, DataFrame, int]:
    """(bigram_counts(w1, w2, c2), unigram_counts(w1, c1), vocab_size).

    Two hash-aggregates; the tables are the model. Persist them with any
    table writer to reuse across scoring runs (they are plain DataFrames)."""
    bg = _bigrams(corpus, text, id_col)
    bigram_counts = bg.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    words = corpus.select(
        F.explode(F.split(F.lower(F.col(text)), " ")).alias("w")
    )
    unigram_counts = words.groupBy(F.col("w").alias("w1")).agg(
        F.count("*").alias("c1")
    # r6b: materialize the (tiny, vocab-sized) unigram table once — it has
    # THREE consumers (the vocab count, the scoring join, the oov join),
    # and without the checkpoint each one re-ran the full corpus explode +
    # aggregate (guide §5: the model table is the artifact, not the scan)
    ).localCheckpoint(eager=True)
    vocab = unigram_counts.count()
    return bigram_counts, unigram_counts, vocab


def lm_perplexity(
    docs: DataFrame,
    bigram_counts: DataFrame,
    unigram_counts: DataFrame,
    vocab: int,
    text: str = "text",
    id_col: str = "doc_id",
    known_full_vocab: bool = False,
) -> DataFrame:
    """(id_col, n_bigrams, avg_neg_logp, perplexity, oov_frac) per document
    with ≥2 tokens. Unseen bigrams/words get the add-one floor — finite
    scores always. ``perplexity = exp(avg_neg_logp)``.

    ``oov_frac`` — the fraction of the document's tokens outside the
    training vocabulary — is reported SEPARATELY rather than folded into
    the perplexity: add-one smoothing gives an unseen CONTEXT (C(w1)=0)
    probability 1/V, which can exceed a seen-context/unseen-bigram pair's
    1/(C(w1)+V), so pure gibberish can out-score shuffled real words on
    perplexity alone. Real filters (CCNet keeps a closed vocab and a
    separate OOV treatment) gate on both: high perplexity catches
    disfluency, high oov_frac catches vocabulary garbage."""
    bg = (
        _bigrams(docs, text, id_col)
        .groupBy(id_col, "w1", "w2")
        .agg(F.count("*").alias("n_occ"))
    )
    scored = (
        bg.join(bigram_counts, ["w1", "w2"], "left")
        .join(unigram_counts, "w1", "left")
        .na.fill(0, ["c2", "c1"])
        .withColumn(
            "neg_logp",
            -F.log(
                (F.col("c2") + 1).cast("double")
                / (F.col("c1") + F.lit(vocab)).cast("double")
            ),
        )
    )
    ppl = scored.groupBy(id_col).agg(
        F.sum("n_occ").alias("n_bigrams"),
        (F.sum(F.col("neg_logp") * F.col("n_occ")) / F.sum("n_occ")).alias(
            "avg_neg_logp"
        ),
    )
    # oov_frac is TOKEN-level (every token, including the first — a
    # bigram-w2-only count would miss a leading OOV word entirely): explode
    # the same tokenization, left-join vocabulary membership, ratio per doc.
    # r6b: when the caller PROVES the vocabulary covers every scored token
    # (self-scoring: the model was trained on the same tokenization of the
    # same documents), oov_frac is identically round(0/n, 6) = 0.0 for every
    # output row, so the explode + membership join + per-doc agg is skipped
    # — value-equal by construction, pinned by
    # tests/test_opt_r06.py::test_lm_self_scoring_oov_shortcut.
    if known_full_vocab:
        scored_out = ppl.withColumn("oov_frac", F.lit(0.0))
    else:
        toks = docs.select(
            F.col(id_col),
            F.explode(F.split(F.lower(F.col(text)), " ")).alias("w1"),
        )
        in_vocab = unigram_counts.select("w1", F.lit(1).alias("_known"))
        oov = (
            toks.join(in_vocab, "w1", "left")
            .na.fill(0, ["_known"])
            .groupBy(id_col)
            .agg(
                F.round(F.sum(1 - F.col("_known")) / F.count("*"), 6).alias(
                    "oov_frac"
                )
            )
        )
        scored_out = ppl.join(oov, id_col)
    return (
        scored_out
        .withColumn("perplexity", F.round(F.exp(F.col("avg_neg_logp")), 3))
        .withColumn("avg_neg_logp", F.round(F.col("avg_neg_logp"), 6))
        .select(id_col, "n_bigrams", "avg_neg_logp", "perplexity", "oov_frac")
    )


def lm_quality_scores(
    docs: DataFrame, text: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Self-scoring convenience (train on the corpus, score the corpus) —
    the in-corpus outlier detector. For the CCNet setup, train on a curated
    reference and pass the tables to ``lm_perplexity`` directly."""
    b, u, v = train_bigram_lm(docs, text, id_col)
    # the model is trained on the same tokenization of the same documents,
    # so every scored token is in-vocabulary — see known_full_vocab above
    return lm_perplexity(docs, b, u, v, text, id_col, known_full_vocab=True)
