"""Bloom-filter join pruning: pre-filter a huge probe side against a compact
bitmap built from a selective build side, then make the result exact with a
broadcast semi-join over the survivors.

Why this exists at 100 TB: a plain semi-join against a dim table still ships
every probe-side row into the join (broadcast hash probe or, worse, a
shuffle). When the build side is selective (say 2% of customers), a bloom
prefilter drops ~98% of the fact scan *before* the join — the same idea as
Spark's own runtime row-level bloom filter (`InjectRuntimeFilter`, Spark
3.3+), which this build does not register SQL functions for
(``bloom_filter_agg`` is absent from the FunctionRegistry — probed), so the
operator composes it from public primitives:

- the k probe positions are computed JVM-side with ``xxhash64(col, seed_i)
  pmod m`` — whole-stage-codegen'd, no Python in the hash path;
- the build side's positions are aggregated distributively (explode →
  distinct — a few k·|keys| ints, tiny for any dim worth blooming), then
  packed into a numpy bitmap on the driver and broadcast once;
- membership is tested in ONE Arrow-batched pandas UDF doing vectorized
  numpy gathers (``bitmap[pos >> 3] & (1 << (pos & 7))``) over the
  JVM-computed position arrays — batch-at-a-time, never per-row py4j;
- ``bloom_semi_join`` chains the prefilter with an exact broadcast
  ``left_semi`` join so false positives cannot reach the output (bloom has
  no false negatives by construction, so no row is lost).

Sizing: with m bits and n keys, k = ln2·m/n minimizes fpp ≈ (1-e^{-kn/m})^k;
``build_bloom`` picks k from the observed key count. The bitmap is m/8 bytes
(1 MiB for 8M bits) — one broadcast variable, independent of probe-side
size.

Reference parity: the reference (Java/Beam, no joins) has nothing like this;
it is driver-brief scale engineering, same family as the salted aggregation
and the LSH bucketed joins.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

_MAX_BUILD_KEYS = 5_000_000  # guard: blooms are for SMALL build sides


@dataclass(frozen=True)
class BloomSpec:
    """A built bloom filter: packed little-endian bitmap + hash params."""

    bitmap: bytes
    num_bits: int
    num_hashes: int

    @property
    def fpp_estimate(self) -> float:
        ones = int(np.unpackbits(np.frombuffer(self.bitmap, dtype=np.uint8)).sum())
        load = ones / self.num_bits
        return load ** self.num_hashes


def _positions(col: str | Column, num_bits: int, num_hashes: int) -> Column:
    """Array of k bit positions for a key, all JVM-side: xxhash64 seeded per
    hash function, pmod to [0, m). Seeds are just 1..k — xxhash64's seed
    decorrelates them."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array(
        *[
            F.pmod(F.xxhash64(c, F.lit(i)), F.lit(num_bits)).cast("long")
            for i in range(1, num_hashes + 1)
        ]
    )


def build_bloom(
    keys: DataFrame,
    col: str,
    num_bits: int = 1 << 23,
    num_hashes: int | None = None,
) -> BloomSpec:
    """Aggregate the build side's bit positions distributively and pack the
    bitmap on the driver.

    The only data collected is the DISTINCT set of set-bit positions —
    bounded by min(k·|keys|, m), never the keys themselves. k defaults to
    the information-theoretic optimum ln2·m/n for the observed key count."""
    n = keys.select(col).distinct().count()
    if n > _MAX_BUILD_KEYS:
        raise ValueError(
            f"bloom build side has {n} keys (> {_MAX_BUILD_KEYS}); "
            "a bloom prefilter only pays off for selective build sides"
        )
    if num_hashes is None:
        num_hashes = max(1, min(8, round(math.log(2) * num_bits / max(n, 1))))
    pos_rows = (
        keys.select(F.explode(_positions(col, num_bits, num_hashes)).alias("p"))
        .distinct()
        .collect()
    )
    bitmap = np.zeros(num_bits // 8 + 1, dtype=np.uint8)
    pos = np.array([r.p for r in pos_rows], dtype=np.int64)
    np.bitwise_or.at(bitmap, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
    return BloomSpec(bitmap=bitmap.tobytes(), num_bits=num_bits, num_hashes=num_hashes)


def bloom_prefilter(fact: DataFrame, col: str, spec: BloomSpec) -> DataFrame:
    """Keep only fact rows whose key MIGHT be in the bloom (plus all
    NULL-key rows are dropped, matching semi-join semantics). The k probe
    positions come from the same JVM hash pipeline as the build; the bitmap
    test is one vectorized pandas UDF over the position arrays."""
    sc = fact.sparkSession.sparkContext
    bc = sc.broadcast(spec.bitmap)

    @F.pandas_udf(BooleanType())
    def might_contain(pos_arrays: pd.Series) -> pd.Series:
        bitmap = np.frombuffer(bc.value, dtype=np.uint8)
        if not len(pos_arrays):
            return pd.Series([], dtype=bool)
        # every row has exactly k positions → one (n, k) gather, no row loop
        mat = np.stack([np.asarray(a, dtype=np.int64) for a in pos_arrays])
        hits = bitmap[mat >> 3] & (np.uint8(1) << (mat & 7).astype(np.uint8))
        return pd.Series((hits != 0).all(axis=1))

    pos = _positions(col, spec.num_bits, spec.num_hashes)
    return (
        fact.where(F.col(col).isNotNull())
        .withColumn("_bloom_hit", might_contain(pos))
        .where(F.col("_bloom_hit"))
        .drop("_bloom_hit")
    )


def bloom_semi_join(
    fact: DataFrame,
    keys: DataFrame,
    fact_col: str,
    key_col: str | None = None,
    num_bits: int = 1 << 23,
) -> DataFrame:
    """Exact semi-join with a bloom prefilter: build from ``keys``,
    prefilter ``fact``, then broadcast ``left_semi`` the survivors so false
    positives are eliminated. Output rows are exactly
    ``fact SEMI JOIN keys`` — the bloom only changes how many rows reach the
    join."""
    key_col = key_col or fact_col
    spec = build_bloom(keys, key_col, num_bits=num_bits)
    pruned = bloom_prefilter(fact, fact_col, spec)
    build = keys.select(F.col(key_col).alias(fact_col)).distinct()
    return pruned.join(F.broadcast(build), on=fact_col, how="left_semi")
