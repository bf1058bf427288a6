"""Deterministic sampling for training-data pipelines.

A 100 TB corpus job needs samples that are (a) reproducible across reruns
and engines — `df.sample()` is seeded per-partition, so ANY repartition
changes the selection — and (b) cheap: a narrow filter with zero shuffle,
evaluated at the scan. Both come from hashing a stable row key instead of
drawing randomness: keep a row iff

    bucket(key) = int(md5(salt ∥ key)[:6 hex]) ∈ [0, 16^6)  <  fraction·16^6

The bucket is uniform (md5 avalanche), the decision is a pure projection
(whole-stage codegen), and membership is stable under repartitioning,
resume, and engine choice (Spark ``conv(substr(md5(k),1,6),16,10)`` ==
DuckDB ``('0x'||substr(md5(k),1,6))::BIGINT`` — certified in the oracle
suite). Changing ``salt`` draws an independent sample — that is how you
take train/holdout splits that never overlap: disjoint fraction windows of
the SAME salt, e.g. train = bucket < 0.9·M, holdout = bucket ≥ 0.9·M.

``sample_n_per_stratum`` is the deterministic analog of per-group
reservoir sampling: rank rows within each stratum by (bucket, key) and
keep the first n. One shuffle on the stratum key; at scale prefer
fraction-based sampling (shuffle-free) unless exact per-stratum counts are
a hard requirement.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 16^6 buckets: plenty of resolution for corpus-scale fractions while the
# bucket id stays comfortably inside an int
SAMPLE_BUCKETS = 16**6


def sample_bucket(key: Column, salt: str = "") -> Column:
    """Uniform bucket in [0, 16^6) from a stable row key (md5 prefix —
    same integer in DuckDB via ('0x'||substr(md5(k),1,6))::BIGINT)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 6),
        16,
        10,
    ).cast("long")


def deterministic_sample(
    df: DataFrame, fraction: float, key_col: str, salt: str = ""
) -> DataFrame:
    """Shuffle-free reproducible Bernoulli(fraction) sample keyed on
    ``key_col``. The filter is a narrow codegen'd projection — at 100 TB
    this costs one md5 per row and nothing else."""
    return df.filter(
        sample_bucket(F.col(key_col), salt) < int(fraction * SAMPLE_BUCKETS)
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str,
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum fractions (e.g. downsample dominant languages, keep all
    of rare ones). Still a pure filter — the stratum→threshold map compiles
    to a when-cascade, no join, no shuffle."""
    thr: Column = F.lit(int(default_fraction * SAMPLE_BUCKETS))
    for value, frac in sorted(fractions.items()):
        thr = F.when(
            F.col(strata_col) == value, F.lit(int(frac * SAMPLE_BUCKETS))
        ).otherwise(thr)
    return df.filter(sample_bucket(F.col(key_col), salt) < thr)


def sample_n_per_stratum(
    df: DataFrame,
    strata_col: str,
    n: int,
    key_col: str,
    salt: str = "",
) -> DataFrame:
    """Exactly min(n, |stratum|) rows per stratum, chosen by hash order —
    the deterministic reservoir. Catalyst rewrites the rank-filter to
    WindowGroupLimit (top-n per group pushed below the sort), so each
    partition keeps at most n rows per stratum before the exchange."""
    from pyspark.sql import Window

    w = Window.partitionBy(strata_col).orderBy(
        sample_bucket(F.col(key_col), salt).asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n)
        .drop("_rn")
    )


def token_budget_sample(
    df: DataFrame,
    budgets: dict[str, int],
    strata_col: str = "lang",
    key_col: str = "doc_id",
    text: str = "text",
    default_budget: int = 0,
    salt: str = "",
    n_slices: int = 4096,
) -> DataFrame:
    """Training-mix construction: per stratum (language / domain), keep the
    deterministic hash-ordered prefix of documents whose cumulative token
    count covers that stratum's TOKEN budget — "give me the first 2 B tokens
    of German, 40 B of English" — overshooting by at most one document, with
    membership stable under repartitioning and resume (same md5-bucket order
    as :func:`deterministic_sample`; growing a budget only ever ADDS docs).

    A doc is kept iff the token mass of all hash-earlier docs in its stratum
    (``tok_start``) is ``< budget``. The running sum is the same distributed
    prefix-sum as ``packing.pack_sequences`` — the naive window
    ``sum() OVER (PARTITION BY stratum ORDER BY hash)`` would shuffle every
    document of a major language into one task at corpus scale — except the
    order key is the uniform hash bucket, so slicing its RANGE into
    ``n_slices`` gives balanced buckets by construction: per-slice subtotals
    come from a map-side-partial hash-agg, slice base offsets from a window
    over the tiny (stratum × slice) table, and the within-slice window sees
    ~n_docs/n_slices rows regardless of stratum skew.

    Output: (key_col, strata_col, n_tokens, tok_start) for kept docs.
    No reference analog: the reference batches fixed packet COUNTS
    (``pipeline/IngestionPipeline.java:196-207``); budgeting token MASS per
    stratum is the training-data generalization.
    """
    from pyspark.sql import Window

    reserved = {"_hb", "_bkt", "_n_tok", "_bkt_tokens", "_bkt_base", "_in_bkt"}
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(f"token_budget_sample reserves column names {sorted(clash)}")

    slice_w = max(1, SAMPLE_BUCKETS // n_slices)
    toks = df.select(
        F.col(key_col),
        F.col(strata_col),
        F.size(F.split(F.col(text), " ")).cast("long").alias("_n_tok"),
        sample_bucket(F.col(key_col), salt).alias("_hb"),
    ).withColumn("_bkt", (F.col("_hb") / slice_w).cast("long"))

    bucket_w = Window.partitionBy(strata_col).orderBy("_bkt")
    bases = (
        toks.groupBy(strata_col, "_bkt")
        .agg(F.sum("_n_tok").alias("_bkt_tokens"))
        .withColumn(
            "_bkt_base",
            F.coalesce(
                F.sum("_bkt_tokens").over(
                    bucket_w.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0).cast("long"),
            ),
        )
        .select(strata_col, "_bkt", "_bkt_base")
    )

    in_bucket_w = (
        Window.partitionBy(strata_col, "_bkt")
        .orderBy("_hb", key_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    with_start = (
        toks.join(F.broadcast(bases), [strata_col, "_bkt"])
        .withColumn(
            "_in_bkt", F.coalesce(F.sum("_n_tok").over(in_bucket_w), F.lit(0))
        )
        .withColumn("tok_start", F.col("_bkt_base") + F.col("_in_bkt"))
    )

    # stratum → budget compiles to a when-cascade: no join, no extra shuffle
    budget: Column = F.lit(int(default_budget)).cast("long")
    for value, b in sorted(budgets.items()):
        budget = F.when(F.col(strata_col) == value, F.lit(int(b)).cast("long")).otherwise(budget)

    return with_start.filter(F.col("tok_start") < budget).select(
        F.col(key_col),
        F.col(strata_col),
        F.col("_n_tok").alias("n_tokens"),
        F.col("tok_start"),
    )


def mixture_summary(
    sampled: DataFrame,
    budgets: dict[str, int],
    strata_col: str = "lang",
    default_budget: int = 0,
) -> DataFrame:
    """Per-stratum achieved mix vs target: docs kept, tokens kept, budget,
    and fill ratio (>1 = overshoot by the final partially-counted doc;
    <1 = stratum exhausted before its budget). One map-side-partial agg."""
    budget: Column = F.lit(int(default_budget)).cast("long")
    for value, b in sorted(budgets.items()):
        budget = F.when(F.col(strata_col) == value, F.lit(int(b)).cast("long")).otherwise(budget)
    return (
        sampled.groupBy(strata_col)
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("tokens_kept"),
            F.max(budget).alias("budget"),
        )
        .withColumn(
            "fill_ratio",
            F.round(F.col("tokens_kept") / F.col("budget"), 6),
        )
    )
