"""Near-duplicate clustering: connected components over a pair list.

The step after candidate generation + verification in a dedup pipeline: group
mutually-similar documents and elect one representative per component.

Spark shape: iterative min-label propagation — each round joins every node's
current label with its neighbors' and takes the min; converges in
O(component diameter) rounds (near-dup components are tiny, 2-5 docs). Each
round is one shuffled join + one aggregate; the loop runs driver-side but
every round is fully distributed (this is the standard large-graph CC
pattern, e.g. Kiveris et al., "Connected Components in MapReduce and Beyond").

Deterministic output: component id = min doc_id in the component.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 20,
) -> DataFrame:
    """(doc_id, component) for every node appearing in ``pairs``."""
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .union(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
        # materialize once — every CC round joins against edges, and without
        # this the (potentially expensive) pair-generation upstream re-runs
        # per iteration (measured 180 s → 9 s at sf0.1)
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("component", F.col("doc_id"))
    )
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.doc_id)
            .groupBy("src")
            .agg(F.min("component").alias("nbr_component"))
        )
        # r6: carry the did-anything-change flag INSIDE the round's single
        # materialization — the old shape ran the propagation join twice per
        # round (once for the checkpoint, once re-joined against the old
        # labels just to count changes), doubling every round's work
        updated = (
            labels.join(neighbor_min, labels.doc_id == neighbor_min.src, "left")
            .select(
                "doc_id",
                F.least(
                    F.col("component"), F.coalesce("nbr_component", "component")
                ).alias("component"),
                (F.col("nbr_component") < F.col("component")).alias("_changed"),
            )
            .localCheckpoint(eager=True)  # truncate lineage per round
        )
        changed = updated.filter(F.col("_changed")).limit(1).count()
        labels = updated.drop("_changed")
        if changed == 0:
            break
    return labels


def dedup_representatives(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """One row per document: its component (itself if unpaired) and whether
    it is the kept representative (min id of its component)."""
    cc = connected_components(pairs)
    return (
        docs.select(id_col)
        .join(cc, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce("component", F.col(id_col)).alias("component"),
        )
        .withColumn("is_representative", F.col(id_col) == F.col("component"))
    )
