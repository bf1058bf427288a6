"""Fuzzy entity matching: an R-S join on string similarity (character
trigram Jaccard) — the data-integration operator that links records whose
keys don't equal but whose names nearly do (vendor dedup, benchmark-title
matching, catalog reconciliation).

Plan shape (never all-pairs — the same discipline as the dedup suite):
distinct char-trigrams per side (narrow projection + hash-agg) → candidate
pairs via a TRIGRAM-keyed equi-join (only pairs sharing ≥1 trigram are ever
materialized; the join key carries the selectivity, and AQE skew-splits hot
trigrams) → shared-count hash-agg → Jaccard from the two distinct-set sizes
→ per-left best match by ``row_number`` (ties → lowest right id).

At web scale a stop-trigram cap belongs in front (drop trigrams whose
document frequency exceeds a threshold — ``ngram_doc_frequency`` computes
exactly that), the same way MinHash banding bounds ``minhash_lsh_pairs``;
the candidate join is otherwise identical.

No reference analog (the reference joins nothing); extends the similarity
suite to two-table string matching.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def _trigrams(df: DataFrame, id_col: str, text_col: str, out_id: str) -> DataFrame:
    """(out_id, tri) — DISTINCT lowercase char-trigrams per row; strings
    shorter than 3 chars carry no evidence and drop out."""
    # materialize lower() under a named alias FIRST: referencing the raw
    # lower(text) expression inside the position-indexed lambda would
    # re-evaluate it once per trigram position per row (the index defeats
    # Catalyst CSE — measured up to 10× on the shingle stage, see
    # shingles_df's _sh_ws)
    s = F.col("_fz_s")
    return (
        df.select(
            F.col(id_col).alias(out_id), F.lower(F.col(text_col)).alias("_fz_s")
        )
        .select(
            out_id,
            F.explode(
                F.transform(
                    # sequence(1, 0) would run DESCENDING ([1, 0]); short
                    # strings must yield an empty array instead
                    F.when(
                        F.length(s) >= 3, F.sequence(F.lit(1), F.length(s) - 2)
                    ).otherwise(F.array().cast("array<int>")),
                    lambda i: s.substr(i, F.lit(3)),
                )
            ).alias("tri"),
        )
        .distinct()
    )


def fuzzy_match(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_text: str,
    right_id: str,
    right_text: str,
    threshold: float = 0.5,
    best_only: bool = True,
) -> DataFrame:
    """(left_id, right_id, jaccard [, rank]) for pairs with trigram-set
    Jaccard ≥ ``threshold``; with ``best_only`` each left row keeps its
    single best match (ties → lowest ``right_id``)."""
    lt = _trigrams(left, left_id, left_text, "l_id")
    rt = _trigrams(right, right_id, right_text, "r_id")
    l_sizes = lt.groupBy("l_id").agg(F.count("*").alias("n_l"))
    r_sizes = rt.groupBy("r_id").agg(F.count("*").alias("n_r"))
    shared = (
        lt.join(rt, "tri")
        .groupBy("l_id", "r_id")
        .agg(F.count("*").alias("n_shared"))
    )
    scored = (
        shared.join(l_sizes, "l_id")
        .join(r_sizes, "r_id")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_shared")
                / (F.col("n_l") + F.col("n_r") - F.col("n_shared")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    out = scored.select(
        F.col("l_id").alias(left_id),
        F.col("r_id").alias("match_" + right_id),
        "jaccard",
    )
    if not best_only:
        return out
    w = Window.partitionBy(left_id).orderBy(
        F.col("jaccard").desc(), F.col("match_" + right_id).asc()
    )
    return (
        out.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") == 1)
        .drop("rank")
    )
