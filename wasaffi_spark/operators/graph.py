"""Connected components — the dedup-clustering step.

Near-dup detection yields PAIRS; deduplication needs CLUSTERS (keep one
document per component of the similarity graph). Components are an
inherently *iterative* computation — not expressible as one SQL query —
so this is the canonical driver-controlled loop over distributed joins
(the same shape MLlib/GraphX use):

    label(v) ← min(label(v), min over neighbors label(u)),  to fixpoint

Each iteration is one join + one grouped min (2 shuffles); the iteration
count is the graph diameter in label-hops (near-dup clusters are
near-cliques → 2-3 iterations). ``localCheckpoint`` truncates the plan
lineage every round so the DAG doesn't grow with iterations — the
classic iterative-Spark pitfall.

The DuckDB oracle computes the same labels with a recursive CTE
(transitive closure + min), which is exact but quadratic per clique —
fine as a correctness oracle, never the scale path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 25,
) -> DataFrame:
    """Label-propagation components over an undirected edge list.

    Returns ``(node, component)`` for every node appearing in an edge,
    where ``component`` is the minimum node id in the node's component.
    """
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = sym.union(
        sym.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()
    sym = sym.persist()
    sym.count()  # materialize once; reused every iteration

    labels = sym.select("a").distinct().withColumn("label", F.col("a"))
    try:
        for _ in range(max_iterations):
            msgs = sym.join(labels, on="a").select(
                F.col("b").alias("a"), F.col("label")
            )
            new_labels = (
                labels.unionByName(msgs).groupBy("a").agg(F.min("label").alias("label"))
            )
            new_labels = new_labels.localCheckpoint(eager=True)
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), on="a")
                .where(F.col("n.label") != F.col("o.label"))
                .count()
            )
            labels = new_labels
            if changed == 0:
                break
    finally:
        sym.unpersist()
    return labels.select(F.col("a").alias("node"), F.col("label").alias("component"))
