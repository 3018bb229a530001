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
    max_iterations: int = 50,
) -> DataFrame:
    """Label-propagation components over an undirected edge list.

    Returns ``(node, component)`` for every node appearing in an edge,
    where ``component`` is the minimum node id in the node's component.

    Convergence is detected from one cheap aggregate per round: labels
    are monotonically non-increasing under min-propagation, so the label
    sum is strictly decreasing until the fixpoint — no per-round
    join+count needed. Raises if ``max_iterations`` is hit before the
    fixpoint (silently-partial components would corrupt dedup clusters).
    """
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = sym.union(
        sym.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()
    sym = sym.persist()
    sym.count()  # materialize once; reused every iteration

    labels = sym.select("a").distinct().withColumn("label", F.col("a"))
    converged = False
    try:
        prev_sum = None
        for _ in range(max_iterations):
            msgs = sym.join(labels, on="a").select(
                F.col("b").alias("a"), F.col("label")
            )
            new_labels = (
                labels.unionByName(msgs).groupBy("a").agg(F.min("label").alias("label"))
            )
            new_labels = new_labels.localCheckpoint(eager=True)
            [row] = new_labels.select(
                F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
            ).collect()
            labels = new_labels
            if row["s"] == prev_sum:
                converged = True
                break
            prev_sum = row["s"]
    finally:
        sym.unpersist()
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge within {max_iterations} "
            "iterations; raise max_iterations (graph diameter exceeds the cap)"
        )
    return labels.select(F.col("a").alias("node"), F.col("label").alias("component"))
