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
    small_graph_max: int = 2_000_000,
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
    # r6b: below ``small_graph_max`` MATERIALIZED edge rows (≤ ~32 MB — the
    # same tiny-table bar as the PQ codebook / bloom-build collects), run
    # union-find driver-side instead of O(diameter) distributed rounds:
    # each round costs a join + agg + checkpoint + count (~8 s of job
    # latency for a 6k-edge graph at 10× scale, vs ~0.1 s in-process).
    # Result is identical — min-label CC — and the iterative loop below
    # remains the unbounded-scale path, chosen from the graph's REAL
    # materialized size (guide §3.1).
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    id_type = edges.schema["src"].dataType
    # numeric ids only: Python's `<` on ints IS Spark's ordering; for
    # strings the collations could diverge on non-ASCII, so those keep the
    # distributed loop.
    n_edges = edges.count()
    if n_edges <= small_graph_max and isinstance(
        id_type, (ByteType, ShortType, IntegerType, LongType)
    ):
        rows = edges.collect()
        # NULL ids would break Python ordering (None < int raises); the
        # distributed loop below handles them with SQL null semantics, so
        # any null sends the graph down that path unchanged
        if not any(r["src"] is None or r["dst"] is None for r in rows):
            return _union_find_labels(pairs, rows, id_type)
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


def _union_find_labels(pairs: DataFrame, rows: list, id_type) -> DataFrame:
    """In-process min-label CC over collected (src, dst) rows — the gated
    small-graph path of ``connected_components`` (numeric, non-null ids)."""
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for r in rows:
        a, b = r["src"], r["dst"]
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra
    comp_min: dict = {}
    for node in parent:
        root = find(node)
        cur = comp_min.get(root)
        if cur is None or node < cur:
            comp_min[root] = node
    out = sorted((node, comp_min[find(node)]) for node in parent)
    from pyspark.sql.types import StructField, StructType

    return pairs.sparkSession.createDataFrame(
        out,
        StructType(
            [
                StructField("doc_id", id_type, True),
                StructField("component", id_type, True),
            ]
        ),
    )


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
