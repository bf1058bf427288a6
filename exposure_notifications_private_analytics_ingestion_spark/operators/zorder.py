"""Z-order (Morton-curve) clustering layout for multi-dimensional data
skipping.

Why this exists at 100 TB: parquet/lake data skipping works off per-file
min/max statistics. A sort on ONE column gives tight ranges for that column
and useless ranges for every other; interleaving the bits of several bounded
key dimensions into one Morton code and range-partitioning + sorting on it
gives every participating dimension locality, so a predicate on ANY of them
prunes files (the same layout `OPTIMIZE ... ZORDER BY` computes in lakehouse
engines). The interleave here is a pure column expression — a sum of
shift/mask terms, whole-stage-codegen'd, no UDF.

``zvalue`` requires the inputs already be non-negative ints in [0, 2^bits);
``bucketize`` turns an arbitrary numeric column into that via min/max
scaling (two tiny aggregates, broadcast as literals). ``zorder_layout``
wires it end to end: repartitionByRange on the Morton code (sampled range
boundaries — balanced output files even for skewed value distributions) +
sortWithinPartitions, then drops the helper column.

Reference parity: none in the reference (no storage layout concerns on
Beam); this is driver-brief scale engineering alongside bloom pruning and
salted aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(cols: list[Column | str], bits: int = 16) -> Column:
    """Morton code of ``len(cols)`` dimensions at ``bits`` bits each: bit i
    of dimension j lands at position ``i * ndims + j``. Inputs must already
    be non-negative ints < 2^bits (see ``bucketize``); values are masked to
    the bit width so out-of-range inputs wrap rather than corrupt higher
    dimensions."""
    ndims = len(cols)
    if ndims * bits > 63:
        raise ValueError(f"{ndims} dims x {bits} bits exceeds a signed long")
    terms = []
    for j, c in enumerate(cols):
        col = (F.col(c) if isinstance(c, str) else c).cast("long")
        col = col.bitwiseAND(F.lit((1 << bits) - 1))
        for i in range(bits):
            terms.append(
                F.shiftleft(
                    F.shiftright(col, i).bitwiseAND(F.lit(1)), i * ndims + j
                )
            )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out.cast("long")


def zvalue_sql(cols: list[str], bits: int = 16) -> str:
    """The DuckDB-equivalent expression for ``zvalue`` — generated from the
    same bit layout so an oracle can verify the interleave value-for-value."""
    ndims = len(cols)
    terms = [
        f"((({c}) >> {i}) & 1) * {1 << (i * ndims + j)}"
        for j, c in enumerate(cols)
        for i in range(bits)
    ]
    return "(" + " + ".join(terms) + ")"


def bucketize(col: Column | str, lo: float, hi: float, bits: int = 16) -> Column:
    """Scale a numeric column into [0, 2^bits) against known bounds — the
    caller supplies lo/hi (one tiny agg, or partition metadata at scale) so
    the expression stays a literal-folded projection."""
    c = F.col(col) if isinstance(col, str) else col
    span = max(hi - lo, 1e-12)
    scaled = ((c - F.lit(lo)) / F.lit(span)) * F.lit((1 << bits) - 1)
    return F.least(
        F.greatest(F.round(scaled).cast("long"), F.lit(0)),
        F.lit((1 << bits) - 1),
    )


def zorder_layout(
    df: DataFrame, cols: list[Column | str], bits: int = 16, num_partitions: int | None = None
) -> DataFrame:
    """Cluster ``df`` along the Morton curve of ``cols``: range-partition on
    the z-value (sampled boundaries → balanced partitions under skew), sort
    within partitions, drop the helper column. Downstream writes inherit the
    layout, giving tight per-file min/max on every participating
    dimension."""
    z = df.withColumn("_zval", zvalue(cols, bits))
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    return (
        z.repartitionByRange(parts, F.col("_zval"))
        .sortWithinPartitions("_zval")
        .drop("_zval")
    )
