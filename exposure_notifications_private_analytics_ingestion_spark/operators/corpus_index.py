"""Incremental corpus dedup: a persisted MinHash band index.

The 100 TB workflow is not "LSH the corpus" — it is "LSH the corpus ONCE,
then dedup every arriving batch against the index". The index holds only
band signatures (``bands`` 32-hex strings per doc — a few hundred bytes
regardless of document size), laid out bucket-partitioned on disk so an
incoming batch joins against it with a (bucket, band_idx, band_hash)
equi-join: collision-bounded like ``minhash_lsh_pairs``, with the bucket
partition column eligible for dynamic partition pruning when a small batch
touches few buckets. Appends are idempotent: each batch lands under its own
``delta=<batch_id>`` directory, so re-running a failed append overwrites
rather than duplicates (same contract as the ingestion sink's
batch-id-keyed triplets, ``plans/ingestion.py``).

Reference analog: the reference dedups uploads against previously ingested
windows by document identity at the source (SURVEY §2 D1); this generalizes
that to cross-batch NEAR-dup at corpus scale, which the reference cannot
express at all.

Scale notes:
- signature computation is O(batch), never O(corpus);
- the index scan reads only signature columns (no text) — at 10^9 docs,
  k=8 → ~50 GB, a normal shuffle join; the batch side is typically
  broadcastable;
- hot band_hash values (boilerplate) fan out in the join but are bounded by
  the verdict agg's map-side partial (one row per (batch_doc, corpus_doc)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .doc_dedup import band_signatures


def _with_bucket(sigs: DataFrame, n_buckets: int) -> DataFrame:
    # bucket from the JOIN KEY (band_hash) so both sides compute it
    # identically and the partition column participates in the equi-join
    return sigs.withColumn(
        "bucket", F.pmod(F.xxhash64("band_hash"), F.lit(n_buckets)).cast("int")
    )


def build_corpus_index(
    docs: DataFrame,
    index_path: str,
    k: int = 8,
    bands: int = 4,
    n: int = 3,
    n_buckets: int = 64,
    text: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Materialize the base index: band signatures of the existing corpus,
    written partitioned by bucket under ``delta=base``."""
    sigs = _with_bucket(band_signatures(docs, k, bands, n, text, id_col), n_buckets)
    (
        sigs.withColumnRenamed(id_col, "corpus_doc_id")
        .repartition("bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(f"{index_path}/delta=base")
    )


def read_index(spark: SparkSession, index_path: str) -> DataFrame:
    """All index deltas, base + appended batches. ``basePath`` keeps both
    the delta and bucket partition columns in the schema."""
    return spark.read.option("basePath", index_path).parquet(f"{index_path}/delta=*")


def incremental_dedup(
    spark: SparkSession,
    batch: DataFrame,
    index_path: str,
    k: int = 8,
    bands: int = 4,
    n: int = 3,
    n_buckets: int = 64,
    min_bands: int = 1,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Verdict per batch doc: (doc_id, dup_of, n_shared_bands).

    ``dup_of`` is the lexicographically-min corpus doc sharing >=
    ``min_bands`` bands (null → novel). Only the batch is signatured; the
    index is scanned signature-only and joined on
    (bucket, band_idx, band_hash)."""
    bsig = _with_bucket(band_signatures(batch, k, bands, n, text, id_col), n_buckets)
    idx = read_index(spark, index_path)
    matches = (
        bsig.join(idx, ["bucket", "band_idx", "band_hash"])
        .groupBy(id_col, "corpus_doc_id")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_bands)
        .groupBy(id_col)
        .agg(
            F.min("corpus_doc_id").alias("dup_of"),
            F.max("n_shared").alias("n_shared_bands"),
        )
    )
    return (
        batch.select(id_col)
        .join(matches, id_col, "left")
        .select(
            id_col,
            "dup_of",
            F.coalesce("n_shared_bands", F.lit(0)).alias("n_shared_bands"),
        )
    )


def append_batch(
    batch: DataFrame,
    verdicts: DataFrame,
    index_path: str,
    batch_id: str,
    k: int = 8,
    bands: int = 4,
    n: int = 3,
    n_buckets: int = 64,
    text: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Append the NOVEL docs' signatures under ``delta=<batch_id>`` —
    overwrite semantics per delta dir, so a crashed/re-run append is
    idempotent and never double-registers a batch."""
    if not batch_id or "/" in batch_id or batch_id == "base":
        raise ValueError(f"invalid batch_id {batch_id!r}")
    novel = verdicts.filter(F.col("dup_of").isNull()).select(id_col)
    sigs = _with_bucket(
        band_signatures(batch.join(novel, id_col), k, bands, n, text, id_col),
        n_buckets,
    )
    (
        sigs.withColumnRenamed(id_col, "corpus_doc_id")
        .repartition("bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(f"{index_path}/delta={batch_id}")
    )
