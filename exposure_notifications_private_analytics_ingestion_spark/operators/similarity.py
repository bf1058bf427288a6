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


# rounding to 6 decimals moves a double by < 5e-7 each way, so a pair can
# only out-rank (or pass a threshold that) another pair's ROUNDED value if
# its unrounded cosine is within 1e-6 of it; 2e-6 doubles that headroom.
# Used to prune inside the NumPy kernels WITHOUT owning the exact rounding.
_ROUND_MARGIN = 2e-6


def _emitted_pair_sim(qdot: Column, qn_a: Column, qn_b: Column) -> Column:
    """The EXACT cosine expression over kernel-emitted integer columns —
    the identical expression tree ``_pair_sim`` builds, so values (and their
    HALF_UP rounding) are bit-equal to the join-based path."""
    return F.round(qdot / F.sqrt((qn_a * qn_b).cast("double")), 6)


def _topk_keep_mask(cos, cand_mask, k):
    """Boolean mask (same shape as ``cos``) of candidates that could still
    be in the row-wise ROUNDED top-k: everything within ``_ROUND_MARGIN`` of
    the k-th largest finite candidate cosine. Rows with ≤ k finite
    candidates keep every candidate (non-finite cosines — zero-norm vectors
    — become NULL in the JVM and sort last, so they only matter when fewer
    than k finite candidates exist)."""
    import numpy as np

    finite = cand_mask & np.isfinite(cos)
    n_valid = finite.sum(axis=1)
    keep = cand_mask.copy()
    deep = n_valid > k  # rows where pruning is provably safe
    if deep.any() and cos.shape[1] > k:
        vals = np.where(finite, cos, -np.inf)
        kth = -np.partition(-vals, k - 1, axis=1)[:, k - 1]
        pruned = finite & (vals >= kth[:, None] - _ROUND_MARGIN)
        keep[deep] = pruned[deep]
    return keep


def _grouped_pair_qdots(
    base: DataFrame,
    group_col: str,
    id_col: str,
    k: int | None = None,
    threshold: float | None = None,
    lt_only: bool = False,
    role_col: str | None = None,
    chunk: int = 1024,
) -> DataFrame:
    """Within-group pair dot products via one NumPy matmul per group
    (guide §4.2: hand whole batches to vectorized native code instead of
    evaluating an aggregate(zip_with(..)) expression tree per pair — the
    join-based form materializes Σ|group|² rows through codegen and then
    windows them, which measured 315 s for 40M pairs at sf1.0).

    Returns (query_id, neighbor_id, qdot, qn_a, qn_b) for a PROVABLE
    SUPERSET of the pairs that survive the caller's exact rounded top-k /
    threshold (see ``_ROUND_MARGIN``); integers only — the caller recomputes
    the cosine with the same JVM expression as the join path, so emitted
    values, rounding and tie-breaks are bit-identical. All arithmetic here
    is exact: quantized components ≤ QUANT·dims keep every product and sum
    below 2^53, so float64 matmul (BLAS) returns exact integers.

    ``role_col``: asymmetric mode — rows with role 1 are queries, role 0
    are corpus (IVF nprobe>1 probing); default symmetric (every row both).
    ``lt_only``: emit only id_a < id_b (pair-dedup mode).
    Exactly one of ``k`` / ``threshold`` must be set."""
    import pandas as pd

    id_type = dict(base.dtypes)[id_col]
    out_schema = (
        f"query_id {id_type}, neighbor_id {id_type}, "
        "qdot long, qn_a long, qn_b long"
    )
    cols = [id_col, "qv", "qn", group_col] + ([role_col] if role_col else [])
    empty = {
        "query_id": [], "neighbor_id": [], "qdot": [], "qn_a": [], "qn_b": []
    }

    def score_group(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        ids = pdf[id_col].to_numpy()
        mat = np.array(pdf["qv"].tolist(), dtype=np.float64)
        qn = pdf["qn"].to_numpy(dtype=np.float64)
        if role_col is not None:
            qsel = pdf[role_col].to_numpy() == 1
            nsel = ~qsel
        else:
            qsel = nsel = np.ones(len(pdf), dtype=bool)
        q_ids, q_mat, q_qn = ids[qsel], mat[qsel], qn[qsel]
        n_ids, n_mat, n_qn = ids[nsel], mat[nsel], qn[nsel]
        if len(q_ids) == 0 or len(n_ids) == 0:
            return pd.DataFrame(empty)
        out = []
        for s in range(0, len(q_ids), chunk):
            cq_ids = q_ids[s : s + chunk]
            g = q_mat[s : s + chunk] @ n_mat.T  # exact (< 2^53 per entry)
            denom = np.sqrt(q_qn[s : s + chunk, None] * n_qn[None, :])
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = g / denom
            if lt_only:
                cand = cq_ids[:, None] < n_ids[None, :]
            else:
                cand = cq_ids[:, None] != n_ids[None, :]
            if threshold is not None:
                keep = cand & (cos >= threshold - _ROUND_MARGIN)
            else:
                keep = _topk_keep_mask(cos, cand, k)
            qi, ni = np.nonzero(keep)
            out.append(
                pd.DataFrame(
                    {
                        "query_id": cq_ids[qi],
                        "neighbor_id": n_ids[ni],
                        "qdot": g[qi, ni].astype(np.int64),
                        "qn_a": q_qn[qi].astype(np.int64),
                        "qn_b": n_qn[ni].astype(np.int64),
                    }
                )
            )
        return pd.concat(out) if out else pd.DataFrame(empty)

    return (
        base.select(*cols)
        .groupBy(group_col)
        .applyInPandas(score_group, schema=out_schema)
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
    if nprobe > 1 and df.count() <= 1_000_000:
        # r6b: the nprobe>1 shape consumes prep THREE times (centroid sums,
        # probe ranking, member rows), and the quantize/self-dot lambdas are
        # interpreted (higher-order functions never reach codegen) — so
        # below the gate, materialize the pass once; above it the lazy
        # recompute is the scale path (a checkpoint of the full corpus at
        # 10^9 vectors is an index-build decision, not a query step).
        prep = prep.localCheckpoint(eager=True)
    if nprobe <= 1:
        # r6: per-cluster NumPy matmul kernel replaces the Σ|cluster|² join
        # + full-pair window (guide §4.2; 315 s → s at sf1.0). The kernel
        # emits a provable superset of the rounded top-k per query; cosine,
        # rounding and rank below are the same JVM expressions as before.
        emitted = _grouped_pair_qdots(prep, cluster_col, id_col, k=k)
    else:
        cent = cluster_centroid_sums(prep, cluster_col)
        a = prep.alias("a")
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
                F.col(f"c.{cluster_col}").alias(cluster_col),
                F.lit(1).alias("_role"),
            )
        )
        # each vector lives in exactly one cluster and probes are distinct
        # labels per query, so no pair can appear twice; the union feeds the
        # kernel each probed cluster's members (role 0) + its probing
        # queries (role 1), and each group's local top-k superset contains
        # the global top-k (a global winner ranks ≤ k inside its own group)
        members = prep.select(
            id_col, "qv", "qn", cluster_col, F.lit(0).alias("_role")
        )
        emitted = _grouped_pair_qdots(
            members.unionByName(probes), cluster_col, id_col, k=k,
            role_col="_role",
        )
    pairs = emitted.select(
        "query_id",
        "neighbor_id",
        _emitted_pair_sim(
            F.col("qdot"), F.col("qn_a"), F.col("qn_b")
        ).alias("cosine"),
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


def _prep_np_with_bucket(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dims: int,
    planes: int,
) -> DataFrame:
    """(id, qv, qn, bucket) in ONE ``mapInPandas`` pass — the NumPy twin of
    ``_prep`` + ``lsh_bucket`` (guide §4.2: the JVM form evaluates
    ``planes`` aggregate(zip_with(..)) trees per row). Exactness: the
    source embeddings are float32, so x·1000 is an exact float64 product
    (24+10 mantissa bits), ``copysign(floor(|v|+0.5), v)`` IS F.round's
    HALF_UP on those exact values, and every dot/norm stays below 2^53."""
    import pandas as pd

    id_type = dict(df.dtypes)[id_col]
    ws = plane_weights(dims, planes)
    schema = f"{id_col} {id_type}, qv array<bigint>, qn long, bucket long"

    def prep_batches(batches):
        import numpy as np

        w = np.array(ws, dtype=np.float64)  # planes × dims, small odd ints
        for pdf in batches:
            x = np.array(pdf[vec_col].tolist(), dtype=np.float64) * QUANT
            v = np.copysign(np.floor(np.abs(x) + 0.5), x)
            qn = (v * v).sum(axis=1)
            dots = v @ w.T  # n × planes, exact
            bucket = (
                (dots > 0).astype(np.int64)
                << np.arange(w.shape[0], dtype=np.int64)
            ).sum(axis=1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "qv": list(v.astype(np.int64)),
                    "qn": qn.astype(np.int64),
                    "bucket": bucket.astype(np.int64),
                }
            )

    return df.select(id_col, vec_col).mapInPandas(prep_batches, schema=schema)


def lsh_ann_topk(
    df: DataFrame,
    k: int = 3,
    dims: int = 64,
    planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k within LSH sign buckets (recall < 1, collision-bounded cost).

    r6: the per-bucket pair join + window is replaced by the shared NumPy
    matmul kernel (same exact-superset contract as ``ivf_topk``), and
    quantize/norm/bucket are one Arrow pass (``_prep_np_with_bucket``)."""
    from pyspark.sql import Window

    prep = _prep_np_with_bucket(df, id_col, vec_col, dims, planes)
    pairs = _grouped_pair_qdots(prep, "bucket", id_col, k=k).select(
        "query_id",
        "neighbor_id",
        _emitted_pair_sim(
            F.col("qdot"), F.col("qn_a"), F.col("qn_b")
        ).alias("cosine"),
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

    r6: per-bucket NumPy kernel in threshold mode — emits pairs whose
    unrounded cosine is within ``_ROUND_MARGIN`` of the threshold; the JVM
    recomputes the exact rounded cosine and applies the real filter.
    Quantize/norm/bucket are one Arrow pass (``_prep_np_with_bucket``)."""
    prep = _prep_np_with_bucket(df, id_col, vec_col, dims, planes)
    return (
        _grouped_pair_qdots(
            prep, "bucket", id_col, threshold=threshold, lt_only=True
        )
        .select(
            F.col("query_id").alias("vec_a"),
            F.col("neighbor_id").alias("vec_b"),
            _emitted_pair_sim(
                F.col("qdot"), F.col("qn_a"), F.col("qn_b")
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
