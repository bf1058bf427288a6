"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  Embeddings are quantized to int32 (round(x·1000)) BEFORE the pairwise math
  so dot products are exact integers and rankings are bit-stable across
  engines (the float-sum-order problem disappears); similarity itself is
  ``qdot / sqrt(qn_a · qn_b)``.
- ``ivf_topk``: the scale path — restrict candidate pairs to the same coarse
  cluster (IVF with nprobe=1). Here the cluster id is a precomputed column
  (``label``); in a full system it's argmin over centroids, same plan shape.
  The self-join keys on the cluster id, so the pair count drops from O(n²)
  to Σ|cluster|².
- ``lsh_ann_topk``: random-hyperplane LSH — 16 deterministic pseudo-planes
  derived from md5(bit,dim), bucket = sign bits, candidates share a bucket.

All math is built-in array functions (zip_with / aggregate / transform) —
JVM-side, no Python. Pandas-UDF variants are deliberately avoided: measured
slower than codegen'd aggregate() for 64-dim vectors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

QUANT = 1000


def quantize(col: Column) -> Column:
    return F.transform(col, lambda x: F.round(x.cast("double") * QUANT).cast("long"))


def _qdot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, v: acc + v
    )


def _prep(df: DataFrame, id_col: str, vec_col: str, extra: list[str]) -> DataFrame:
    # quantize once per row: inlining it into the self-dot's zip_with would
    # evaluate the transform 3x per row (alias + both zip_with operands)
    base = df.select(
        F.col(id_col), quantize(F.col(vec_col)).alias("qv"),
        *[F.col(c) for c in extra],
    )
    return base.select(
        F.col(id_col),
        F.col("qv"),
        _qdot(F.col("qv"), F.col("qv")).alias("qn"),
        *[F.col(c) for c in extra],
    )


def _pair_sim() -> Column:
    return F.round(
        F.col("qdot") / F.sqrt((F.col("a.qn") * F.col("b.qn")).cast("double")), 6
    )


def cosine_topk(
    df: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    allow_quadratic: bool = False,
) -> DataFrame:
    """Exact top-k neighbors per vector (excluding self), brute force.

    Labeled O(n²) correctness baseline — guarded above 50k rows (use
    ``lsh_ann_topk``/``ivf_topk`` at scale, or pass allow_quadratic=True)."""
    from pyspark.sql import Window

    from .guards import guard_quadratic

    guard_quadratic(df, "cosine_topk", "lsh_ann_topk/ivf_topk", allow_quadratic)
    prep = _prep(df, id_col, vec_col, [])
    a, b = prep.alias("a"), prep.alias("b")
    pairs = (
        a.join(b, F.col(f"a.{id_col}") != F.col(f"b.{id_col}"))
        .withColumn("qdot", _qdot(F.col("a.qv"), F.col("b.qv")))
        .select(
            F.col(f"a.{id_col}").alias("query_id"),
            F.col(f"b.{id_col}").alias("neighbor_id"),
            _pair_sim().alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def cosine_pairs(
    df: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    allow_quadratic: bool = False,
) -> DataFrame:
    """Embedding near-duplicate pairs: cosine ≥ threshold, a < b.

    Labeled O(n²) correctness baseline — guarded above 50k rows (use
    ``cosine_near_dup_lsh`` at scale, or pass allow_quadratic=True)."""
    from .guards import guard_quadratic

    guard_quadratic(df, "cosine_pairs", "cosine_near_dup_lsh", allow_quadratic)
    prep = _prep(df, id_col, vec_col, [])
    a, b = prep.alias("a"), prep.alias("b")
    return (
        a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .withColumn("qdot", _qdot(F.col("a.qv"), F.col("b.qv")))
        .select(
            F.col(f"a.{id_col}").alias("vec_a"),
            F.col(f"b.{id_col}").alias("vec_b"),
            _pair_sim().alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def cluster_centroid_sums(
    prep: DataFrame, cluster_col: str = "label"
) -> DataFrame:
    """Per-cluster element-wise SUM of the quantized vectors (NOT the mean:
    the sum is an exact int64 vector, and argmax over dot(q, sum/|c|) ==
    argmax over dot(q, sum) within a fixed cluster only — across clusters
    the ranking differs, which makes this a sum-of-members inner-product
    coarse quantizer: deterministic, exact, and oracle-reproducible. A
    float-mean centroid would put engine-dependent rounding inside the
    probe ranking). One posexplode + two hash-aggs; centroid cardinality =
    n_clusters, tiny → broadcast at the probe join."""
    return (
        prep.select(cluster_col, F.posexplode("qv").alias("pos", "v"))
        .groupBy(cluster_col, "pos")
        .agg(F.sum("v").alias("s"))
        .groupBy(cluster_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "s"))),
                lambda st: st["s"],
            ).alias("cv")
        )
    )


def ivf_topk(
    df: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_col: str = "label",
    nprobe: int = 1,
) -> DataFrame:
    """IVF top-k: candidates restricted to the query's ``nprobe`` best
    coarse clusters. nprobe=1 keys on the query's OWN cluster column (the
    original fast path — no centroid pass at all). nprobe>1 ranks clusters
    per query by exact-integer dot(query, centroid_sum) (ties → label asc),
    probes the top ``nprobe``, and searches only those clusters — the
    recall/cost dial every IVF index exposes. The candidate join still keys
    on the cluster id, so the pair space is Σ(probed cluster sizes), never
    all-pairs; centroids are broadcast (n_clusters rows)."""
    from pyspark.sql import Window

    prep = _prep(df, id_col, vec_col, [cluster_col])
    a, b = prep.alias("a"), prep.alias("b")
    if nprobe <= 1:
        pairs = a.join(
            b,
            (F.col(f"a.{cluster_col}") == F.col(f"b.{cluster_col}"))
            & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}")),
        )
    else:
        cent = cluster_centroid_sums(prep, cluster_col)
        cw = Window.partitionBy(f"a.{id_col}").orderBy(
            F.col("cdot").desc(), F.col(f"c.{cluster_col}").asc()
        )
        probes = (
            a.crossJoin(F.broadcast(cent.alias("c")))
            .withColumn("cdot", _qdot(F.col("a.qv"), F.col("c.cv")))
            .withColumn("crank", F.row_number().over(cw))
            .filter(F.col("crank") <= nprobe)
            .select(
                F.col(f"a.{id_col}"),
                F.col("a.qv"),
                F.col("a.qn"),
                F.col(f"c.{cluster_col}").alias("_probe"),
            )
            .alias("a")
        )
        # each vector lives in exactly one cluster and probes are distinct
        # labels per query, so no pair can appear twice
        pairs = probes.join(
            b,
            (F.col("a._probe") == F.col(f"b.{cluster_col}"))
            & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}")),
        )
    pairs = pairs.withColumn(
        "qdot", _qdot(F.col("a.qv"), F.col("b.qv"))
    ).select(
        F.col(f"a.{id_col}").alias("query_id"),
        F.col(f"b.{id_col}").alias("neighbor_id"),
        _pair_sim().alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def plane_weights(dims: int, planes: int) -> list[list[int]]:
    """Deterministic pseudo-random hyperplane weights, shared with the SQL
    oracle. Per (plane, dim): 2·hexdigit(md5('p{p}d{d}')[0]) − 15, an odd
    integer in [-15, 15] (the doubling keeps the math in exact integers —
    sign(Σ qv·2w) == sign(Σ qv·w))."""
    import hashlib

    hexchars = "0123456789abcdef"
    return [
        [
            2 * hexchars.index(hashlib.md5(f"p{p}d{d}".encode()).hexdigest()[0]) - 15
            for d in range(dims)
        ]
        for p in range(planes)
    ]


def lsh_bucket(vec_col: Column, dims: int, planes: int = 16) -> Column:
    """Random-hyperplane sign bucket over the QUANTIZED vector: one
    aggregate(zip_with(qv, weights)) per plane (compact expression tree, all
    exact integer math — bit-identical across engines)."""
    qv = quantize(vec_col)
    bucket = F.lit(0).cast("long")
    for p, ws in enumerate(plane_weights(dims, planes)):
        warr = F.array(*[F.lit(w).cast("long") for w in ws])
        dot = F.aggregate(
            F.zip_with(qv, warr, lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(dot > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def lsh_ann_topk(
    df: DataFrame,
    k: int = 3,
    dims: int = 64,
    planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k within LSH sign buckets (recall < 1, collision-bounded cost)."""
    from pyspark.sql import Window

    with_bucket = df.withColumn("bucket", lsh_bucket(F.col(vec_col), dims, planes))
    prep = _prep(with_bucket, id_col, vec_col, ["bucket"])
    a, b = prep.alias("a"), prep.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}")),
        )
        .withColumn("qdot", _qdot(F.col("a.qv"), F.col("b.qv")))
        .select(
            F.col(f"a.{id_col}").alias("query_id"),
            F.col(f"b.{id_col}").alias("neighbor_id"),
            _pair_sim().alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def cosine_pairs_lsh(
    df: DataFrame,
    threshold: float = 0.4,
    dims: int = 64,
    planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The scale path for embedding near-dup pairs: candidates restricted to
    the same LSH sign bucket, then EXACT cosine ≥ threshold on candidates
    only. Join keys on the bucket — collision-bounded, never all-pairs
    (recall < 1 by construction; raise ``planes``/add rotations for recall).
    """
    with_bucket = df.withColumn("bucket", lsh_bucket(F.col(vec_col), dims, planes))
    prep = _prep(with_bucket, id_col, vec_col, ["bucket"])
    a, b = prep.alias("a"), prep.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .withColumn("qdot", _qdot(F.col("a.qv"), F.col("b.qv")))
        .select(
            F.col(f"a.{id_col}").alias("vec_a"),
            F.col(f"b.{id_col}").alias("vec_b"),
            _pair_sim().alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
