"""Fuzzy matching / record linkage: blocked edit-distance pairs.

Entity resolution is the structured-data sibling of document near-dedup
(same blocked-pairwise shape as ``dedup.jaccard_pairs``): find record
pairs whose names are within an edit-distance budget, comparing only
within cheap blocking keys so the quadratic term is bounded by block
size, never the table.

Everything is built-in (``levenshtein`` is JVM-side in Spark and native
in DuckDB, so the operator is oracle-checkable); a production linkage
stack would add more comparators (jaro-winkler, phonetic) behind the
same blocked join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fuzzy_pairs(
    records: DataFrame,
    id_col: str,
    name_col: str,
    block_cols: list[str],
    max_dist: int = 5,
    min_sim: float = 0.7,
) -> DataFrame:
    """Candidate duplicate-record pairs within blocks: Levenshtein
    distance ≤ ``max_dist`` AND normalized similarity
    ``1 - dist/greatest(len_a, len_b)`` ≥ ``min_sim``. Pairs are
    ordered (id_a < id_b) so each appears once.

    Returns ``(id_a, id_b, name_a, name_b, dist, sim)`` with ``sim``
    rounded to 6dp (one division of integers — engine-exact).

    Scale: the self-join is equi on ``block_cols`` — Σ|block|² work,
    the same contract as every blocked pairwise operator here; pick
    blocks (brand, prefix, phonetic key…) so blocks stay O(dup-group).
    Levenshtein itself is O(len²) per pair in both engines — cap name
    length upstream for adversarial data.
    """
    a = records.select(
        *[F.col(c) for c in block_cols],
        F.col(id_col).alias("id_a"),
        F.col(name_col).alias("name_a"),
    )
    b = records.select(
        *[F.col(c) for c in block_cols],
        F.col(id_col).alias("id_b"),
        F.col(name_col).alias("name_b"),
    )
    dist = F.levenshtein(F.col("name_a"), F.col("name_b"))
    sim = F.round(
        1 - dist / F.greatest(F.length("name_a"), F.length("name_b")), 6
    )
    return (
        a.join(b, block_cols)
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("dist", dist)
        .withColumn("sim", sim)
        .where((F.col("dist") <= max_dist) & (F.col("sim") >= min_sim))
        .select("id_a", "id_b", "name_a", "name_b", "dist", "sim")
    )
