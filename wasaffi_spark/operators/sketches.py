"""Mergeable-sketch operators (Apache DataSketches, built into Spark 4).

THE scalable approximate-analytics pattern for a 100 TB corpus: compute
a small fixed-size sketch per shard/partition/day (one map-side-partial
aggregation each), persist the sketch BYTES, and answer queries later by
UNIONING sketches — never rescanning data. Distinct counts (HLL, theta),
quantiles (KLL) and set overlap (theta intersection) all follow the shape.

Everything here is a thin, typed composition of Spark's built-in
``*_sketch_*`` expressions — JVM-side, codegen, mergeable by
construction. The crucial algebraic property
(estimate(union(per-group sketches)) == estimate(whole set)) is pinned
by tests/test_sketches.py; cross-engine value equality is impossible
(sketch binaries and estimators are engine-specific), so these stay
rows-only at the driver's correctness gate by design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SKETCH_COLS = ("hll", "theta", "kll")


def sketch_table(
    df: DataFrame,
    group_col: str,
    distinct_col: str,
    quantile_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """Per-group sketch state: HLL + theta (distincts) and KLL
    (quantiles) as binary columns — the persistable shard-level
    aggregate. One shuffle (the groupBy); each sketch is KB-sized
    regardless of group cardinality, so the reduce side never skews."""
    return df.groupBy(group_col).agg(
        F.hll_sketch_agg(distinct_col, F.lit(lg_k)).alias("hll"),
        F.theta_sketch_agg(distinct_col).alias("theta"),
        F.kll_sketch_agg_double(F.col(quantile_col).cast("double")).alias("kll"),
        F.count("*").alias("rows"),
    )


def estimate_per_group(sketches: DataFrame, quantiles=(0.5, 0.95)) -> DataFrame:
    """Readable estimates from a sketch table (group granularity)."""
    return sketches.select(
        *[c for c in sketches.columns if c not in _SKETCH_COLS],
        F.hll_sketch_estimate("hll").alias("distinct_hll"),
        F.round(F.theta_sketch_estimate("theta"), 1).alias("distinct_theta"),
        *[
            F.kll_sketch_get_quantile_double("kll", F.lit(q)).alias(
                f"p{int(q * 100)}"
            )
            for q in quantiles
        ],
    )


def rollup_estimates(sketches: DataFrame, quantiles=(0.5, 0.95)) -> DataFrame:
    """Union per-group sketches into ONE global estimate — the
    reaggregation step that makes sketch tables composable: daily
    sketches roll up to months without touching raw data. Merging
    reduces KB-sized states; the shuffle is O(groups), not O(rows)."""
    merged = sketches.agg(
        F.hll_union_agg("hll").alias("hll"),
        F.theta_union_agg("theta").alias("theta"),
        F.kll_merge_agg_double("kll").alias("kll"),
        F.sum("rows").alias("rows"),
    )
    return estimate_per_group(merged, quantiles)


def sketch_overlap(
    left: DataFrame, right: DataFrame, col: str
) -> DataFrame:
    """Estimated distinct-value overlap between two frames via theta
    set algebra: |L|, |R|, |L ∩ R|, |L ∖ R| — WITHOUT a join. Each side
    reduces to one KB-sized sketch (map-side partials, 1-row exchange);
    the set operations run driver-side on the two sketches. At 100 TB
    this replaces a distinct-join contamination check (full shuffle of
    both sides) with two scans and O(1) merge work."""
    ls = left.agg(F.theta_sketch_agg(col).alias("l"))
    rs = right.agg(F.theta_sketch_agg(col).alias("r"))
    both = ls.crossJoin(rs)
    return both.select(
        F.round(F.theta_sketch_estimate("l"), 1).alias("left_distinct"),
        F.round(F.theta_sketch_estimate("r"), 1).alias("right_distinct"),
        F.round(
            F.theta_sketch_estimate(F.theta_intersection("l", "r")), 1
        ).alias("overlap_est"),
        F.round(
            F.theta_sketch_estimate(F.theta_difference("l", "r")), 1
        ).alias("left_only_est"),
    )
