"""Benchmark-contamination detection for training corpora: flag corpus
documents sharing word n-grams with a held-out benchmark/eval set (the
standard n-gram-overlap decontamination check used for pretraining data,
e.g. the 13-gram checks published for GPT-3/PaLM — here parameterized).

Scale shape: the benchmark side is SMALL (eval suites are thousands of
documents, not billions), so its distinct shingle set is broadcast and the
corpus side stays a narrow scan → explode → broadcast-hash semi-join →
per-doc hash-agg. No shuffle of corpus text, no all-pairs stage; cost is
O(corpus tokens) at any corpus size. If a benchmark ever outgrows
broadcast, drop the ``broadcast()`` hint and the same plan becomes a
shuffle hash join on the shingle hash — semantics unchanged.

No reference analog (the reference ingests encrypted shares and never
inspects payload content); this is engine breadth for the training-data
tier, built on the same shingle primitive as the dedup suite
(``operators/doc_dedup.py`` ``shingles_df``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .doc_dedup import shingles_df


def contamination_check(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    threshold: float = 0.05,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-corpus-document overlap with the benchmark's n-gram set.

    Output: (id_col, n_ngrams, n_hit_ngrams, contamination_frac,
    is_contaminated) — one row per corpus document that carries at least one
    n-shingle (documents shorter than ``n`` words have no n-gram evidence
    either way and are dropped, matching ``shingles_df``).
    ``contamination_frac`` is the fraction of the document's DISTINCT
    n-grams that appear anywhere in the benchmark.
    """
    bench_grams = shingles_df(benchmark, n, text, id_col).select("shingle").distinct()
    corp_grams = shingles_df(corpus, n, text, id_col)
    totals = corp_grams.groupBy(id_col).agg(F.count("*").alias("n_ngrams"))
    hits = (
        corp_grams.join(F.broadcast(bench_grams), "shingle")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hit_ngrams"))
    )
    frac = F.round(F.col("n_hit_ngrams") / F.col("n_ngrams"), 6)
    return (
        totals.join(hits, id_col, "left")
        .na.fill(0, ["n_hit_ngrams"])
        .select(
            id_col,
            "n_ngrams",
            "n_hit_ngrams",
            frac.alias("contamination_frac"),
            (frac >= threshold).alias("is_contaminated"),
        )
    )
