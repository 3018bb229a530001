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


def test_countmin_overestimates_only_and_exact_when_wide(spark):
    from wasaffi_spark.operators import sketches

    words = [f"w{i % 7}" for i in range(140)] + ["rare"]
    df = spark.createDataFrame([(w,) for w in words], "item string")
    exact = {r.item: r.cnt for r in df.groupBy("item").agg(
        F.count("*").alias("cnt")
    ).collect()}
    # narrow sketch: estimates may collide but NEVER undercount
    narrow = sketches.countmin_table(df, "item", depth=2, width=4)
    est_n = {r.item: r.cm_est for r in sketches.countmin_query(narrow, df).collect()}
    assert all(est_n[w] >= exact[w] for w in exact)
    # wide sketch: no collisions among 8 items -> exact
    wide = sketches.countmin_table(df, "item", depth=4, width=4096)
    est_w = {r.item: r.cm_est for r in sketches.countmin_query(wide, df).collect()}
    assert est_w == exact
    # absent item estimates 0 (left join path)
    ghost = spark.createDataFrame([("never-seen",)], "item string")
    got = sketches.countmin_query(wide, ghost).collect()
    assert got[0].cm_est == 0


def test_countmin_merge_equals_whole(spark):
    from wasaffi_spark.operators import sketches

    a = spark.createDataFrame([(f"w{i % 5}",) for i in range(50)], "item string")
    b = spark.createDataFrame([(f"w{i % 9}",) for i in range(90)], "item string")
    merged = sketches.countmin_merge(
        sketches.countmin_table(a, "item"), sketches.countmin_table(b, "item")
    )
    whole = sketches.countmin_table(a.unionByName(b), "item")
    m = {(r.r, r.c): r.cnt for r in merged.collect()}
    w = {(r.r, r.c): r.cnt for r in whole.collect()}
    assert m == w  # cell-exact mergeability, not just estimate-close


def test_countmin_mismatched_merge_raises(spark):
    """Merging sketches with different (depth, width) must raise, not
    silently undercount."""
    import pytest

    a = spark.createDataFrame([("x",)], "item string")
    sk1 = sketches.countmin_table(a, "item", depth=2, width=4)
    sk2 = sketches.countmin_table(a, "item", depth=4, width=2048)
    with pytest.raises(Exception, match="different \\(depth, width\\)"):
        sketches.countmin_merge(sk1, sk2).collect()


def test_bloom_no_false_negatives_and_definite_absence(spark):
    from wasaffi_spark.operators import sketches

    seen = spark.createDataFrame(
        [(f"item-{i}",) for i in range(200)], "item string"
    )
    bloom = sketches.bloom_table(seen, "item")
    assert bloom.count() <= sketches.BF_WORDS
    cand = spark.createDataFrame(
        [(f"item-{i}",) for i in range(150, 250)]  # 50 seen + 50 new
        , "item string"
    )
    got = {r.item: r.maybe_present for r in sketches.bloom_probe(bloom, cand).collect()}
    # the contract: every seen item MUST probe true (no false negatives)
    assert all(got[f"item-{i}"] for i in range(150, 200))
    # and with 200 items in 65536 bits most new items probe false
    new_hits = sum(got[f"item-{i}"] for i in range(200, 250))
    assert new_hits <= 5


def test_bloom_merge_equals_whole(spark):
    from wasaffi_spark.operators import sketches

    a = spark.createDataFrame([(f"a{i}",) for i in range(50)], "item string")
    b = spark.createDataFrame([(f"b{i}",) for i in range(50)], "item string")
    whole = sketches.bloom_table(a.union(b), "item")
    merged = sketches.bloom_merge(
        sketches.bloom_table(a, "item"), sketches.bloom_table(b, "item")
    )
    w = {r.word: r.bits for r in whole.collect()}
    m = {r.word: r.bits for r in merged.collect()}
    assert w == m  # bitwise-identical: merge(bloom(X), bloom(Y)) == bloom(X∪Y)


def test_bloom_mismatched_merge_raises(spark):
    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from wasaffi_spark.operators import sketches

    a = spark.createDataFrame([("x",)], "item string")
    with pytest.raises(SparkRuntimeException):
        sketches.bloom_merge(
            sketches.bloom_table(a, "item", words=1024),
            sketches.bloom_table(a, "item", words=2048),
        ).collect()
