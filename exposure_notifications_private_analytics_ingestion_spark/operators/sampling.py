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
