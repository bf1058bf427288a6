"""Sequence packing for LLM training-data pipelines: concatenate documents
in a deterministic order and chunk the token stream into fixed-length
training sequences (the standard "concat-and-chunk" packing GPT-style
pretraining uses), emitting each document's token offset and the sequence
ids it spans.

The core primitive is a DISTRIBUTED PREFIX SUM — the naive formulation,
``sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id)``, has no partial
aggregation: every document of a language shuffles into ONE task's window,
which at 100 TB (10^9+ docs per major language) is a single-task corpus
scan. This module computes the same running total in two levels:

1. bucket documents by ``order_col div bucket_width`` (order-preserving,
   since ``(bucket, order_col)`` sorts identically to ``order_col``);
2. one map-side-partial hash-agg gives per-bucket subtotals; a window over
   the TINY bucket-totals table (rows = n_docs / bucket_width) produces
   each bucket's base offset;
3. join the bases back (broadcast — the bucket table is ~MBs at 10^10 docs)
   and run the within-bucket running sum, whose window partitions are
   bounded by ``bucket_width`` rows regardless of corpus size.

Result: identical offsets to the naive window, with the unbounded
per-language partition replaced by bounded ``bucket_width`` partitions and
one broadcast join. (At 10^10 docs / bucket_width=4096 the bucket table is
~2.4 M rows; its own window is single-task per language but over bucket
rows only — recurse the same trick if that ever matters.)

No reference analog: the reference pipeline batches fixed COUNTS of packets
(``pipeline/IngestionPipeline.java:196-207``, GroupIntoBatches); packing
fixed token BUDGETS is the training-data generalization of the same
assembly step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    seq_len: int = 2048,
    part_col: str = "lang",
    order_col: str = "doc_id",
    text: str = "text",
    bucket_width: int = 4096,
) -> DataFrame:
    """Assign every document its token offset and spanned sequence ids under
    concat-and-chunk packing with capacity ``seq_len`` tokens, streams packed
    independently per ``part_col``, documents concatenated in ``order_col``
    order (whitespace tokens; empty text counts as one token, matching
    ``split``'s [''] — no document is zero-width, so spans are well-formed).

    Output: (order_col, part_col, n_tokens, tok_start, seq_first, seq_last,
    n_seqs_spanned), where ``tok_start`` is the running token count of all
    earlier documents in the same stream and a document spans sequences
    ``tok_start div seq_len`` .. ``(tok_start + n_tokens - 1) div seq_len``.
    """
    reserved = {"_bkt", "_n_tok", "_bkt_tokens", "_bkt_base", "_in_bkt"}
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(f"pack_sequences reserves column names {sorted(clash)}")

    toks = df.select(
        F.col(order_col),
        F.col(part_col),
        F.size(F.split(F.col(text), " ")).cast("long").alias("_n_tok"),
        (F.col(order_col).cast("long") / bucket_width)
        .cast("long")
        .alias("_bkt"),
    )

    # level 1: per-bucket subtotals (map-side partial agg) → base offsets via
    # a window over the tiny bucket table
    bucket_w = Window.partitionBy(part_col).orderBy("_bkt")
    bases = (
        toks.groupBy(part_col, "_bkt")
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
        .select(part_col, "_bkt", "_bkt_base")
    )

    # level 2: within-bucket running sum (bounded partitions) + bucket base
    in_bucket_w = (
        Window.partitionBy(part_col, "_bkt")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = (
        toks.join(F.broadcast(bases), [part_col, "_bkt"])
        .withColumn(
            "_in_bkt", F.coalesce(F.sum("_n_tok").over(in_bucket_w), F.lit(0))
        )
        .withColumn("tok_start", (F.col("_bkt_base") + F.col("_in_bkt")))
    )

    seq_first = (F.col("tok_start") / seq_len).cast("long")
    seq_last = ((F.col("tok_start") + F.col("_n_tok") - 1) / seq_len).cast("long")
    return packed.select(
        F.col(order_col),
        F.col(part_col),
        F.col("_n_tok").alias("n_tokens"),
        F.col("tok_start"),
        seq_first.alias("seq_first"),
        seq_last.alias("seq_last"),
        (seq_last - seq_first + 1).alias("n_seqs_spanned"),
    )


def packing_summary(packed: DataFrame, seq_len: int = 2048, part_col: str = "lang") -> DataFrame:
    """Per-stream packing rollup: documents, total tokens, number of full
    sequences produced, and tail waste (tokens short of the last sequence
    boundary). One hash-agg over ``pack_sequences`` output."""
    total = F.sum("n_tokens")
    n_seqs = F.ceil(total / seq_len).cast("long")
    return packed.groupBy(part_col).agg(
        F.count("*").alias("n_docs"),
        total.alias("total_tokens"),
        n_seqs.alias("n_sequences"),
        (n_seqs * seq_len - total).alias("tail_pad_tokens"),
    )
