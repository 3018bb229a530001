"""Mergeable-sketch operators (operators/sketches.py).

Pins the property that makes sketch tables usable at 100 TB: the
estimate from UNIONED per-group sketches equals (approximately — and
for theta below its nominal k, exactly) the estimate over the whole
set, so shard-level sketches roll up without rescanning data.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from wasaffi_spark.operators import sketches
from wasaffi_spark.sources.parquet import read_parquet

from .conftest import SF_ORACLE


def _orders(spark):
    return read_parquet(spark, f"{SF_ORACLE}/orders.parquet")


def test_rollup_matches_whole_set(spark):
    orders = _orders(spark)
    truth = orders.agg(F.countDistinct("o_custkey")).collect()[0][0]
    sk = sketches.sketch_table(orders, "o_orderpriority", "o_custkey", "o_totalprice")
    rolled = sketches.rollup_estimates(sk).collect()[0]
    # theta is exact below its nominal entries (4096 > 1500 distincts)
    assert rolled["distinct_theta"] == float(truth)
    # HLL at lg_k=12 has ~1.6% relative standard error
    assert abs(rolled["distinct_hll"] - truth) / truth < 0.05
    assert rolled["rows"] == orders.count()
    # quantile sanity: p50 within the observed range, p95 > p50
    assert rolled["p50"] < rolled["p95"]


def test_per_group_estimates(spark):
    orders = _orders(spark)
    sk = sketches.sketch_table(orders, "o_orderpriority", "o_custkey", "o_totalprice")
    est = sketches.estimate_per_group(sk)
    truth = {
        r["o_orderpriority"]: r["t"]
        for r in orders.groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("t"))
        .collect()
    }
    for row in est.collect():
        t = truth[row["o_orderpriority"]]
        assert row["distinct_theta"] == float(t)
        assert abs(row["distinct_hll"] - t) / t < 0.05


def test_overlap_without_join(spark):
    orders = _orders(spark)
    lineitem = read_parquet(spark, f"{SF_ORACLE}/lineitem.parquet")
    out = sketches.sketch_overlap(
        orders.select(F.col("o_orderkey").alias("k")),
        lineitem.select(F.col("l_orderkey").alias("k")),
        "k",
    ).collect()[0]
    # every l_orderkey references an order, so the right side is a
    # subset: overlap ≈ right_distinct, within theta's sampling error
    # (both sides exceed nominal k here, so estimates are approximate)
    assert abs(out["overlap_est"] - out["right_distinct"]) / out["right_distinct"] < 0.05
    assert out["left_only_est"] < 0.10 * out["left_distinct"]
    assert out["left_distinct"] > out["overlap_est"] > 0


def test_sketch_table_single_shuffle(spark):
    """The sketch build is one groupBy — exactly one Exchange; estimates
    add none (pure projection over the sketch bytes)."""
    orders = _orders(spark)
    sk = sketches.sketch_table(orders, "o_orderpriority", "o_custkey", "o_totalprice")
    plan = sketches.estimate_per_group(sk)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
