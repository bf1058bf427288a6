"""Guard rail for the labeled quadratic baselines.

The brute-force operators (cosine_topk / cosine_pairs / candidate-less
ngram_jaccard_pairs) exist as CORRECTNESS baselines for their bucketed twins
(lsh_ann_topk, cosine_near_dup_lsh, candidate-mode jaccard). Their cost is
O(n²): fine at oracle scale, catastrophic if someone points them at a real
corpus. This guard makes the quadratic path impossible to hit by accident —
above ``limit`` input rows it raises unless the caller passes
``allow_quadratic=True``, naming the scalable twin to use instead.

The guard runs ``df.limit(limit+1).count()`` — an action that scans at most
``limit+1`` rows and short-circuits via LocalLimit, never a full-input pass —
and only when the flag is not set; callers on the blessed scalable paths
never pay it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

QUADRATIC_GUARD_LIMIT = 50_000


class QuadraticPlanError(RuntimeError):
    pass


def guard_quadratic(
    df: DataFrame,
    op_name: str,
    scalable_twin: str,
    allow_quadratic: bool = False,
    limit: int = QUADRATIC_GUARD_LIMIT,
) -> None:
    if allow_quadratic:
        return
    # limit(n+1) short-circuits the scan: the guard reads at most limit+1
    # rows even when the input is a 100 TB table, instead of paying a full
    # upstream recompute just to learn the input is too big.
    n = df.limit(limit + 1).count()
    if n > limit:
        raise QuadraticPlanError(
            f"{op_name} is an all-pairs O(n²) baseline and its input has "
            f"more than {limit:,} rows. Use {scalable_twin} at scale, or "
            f"pass allow_quadratic=True if you really want the exact "
            f"brute-force computation."
        )
