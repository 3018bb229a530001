"""Salted-join equivalence tests: salting must be invisible in results."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

from wasaffi_spark.operators import skew

needs_data = pytest.mark.skipif(
    not os.path.isdir(SF_SMOKE), reason="testdata not present"
)


@pytest.fixture()
def skewed(spark):
    # 90% of rows share one key — the classic hot-key shape
    rows = [(1 if i % 10 else i, f"v{i}") for i in range(1000)]
    return spark.createDataFrame(rows, "k long, v string")


@pytest.fixture()
def dim(spark):
    return spark.createDataFrame(
        [(i, f"name{i}") for i in range(0, 1000, 7)] + [(1, "hot")],
        "k long, name string",
    )


def test_salted_inner_join_equivalent(skewed, dim):
    plain = skewed.join(dim, "k").select("k", "v", "name")
    salted = skew.salted_join(skewed, dim, ["k"], n_salts=4).select("k", "v", "name")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_left_join_equivalent(skewed, dim):
    plain = skewed.join(dim, "k", "left").select("k", "v", "name")
    salted = skew.salted_join(skewed, dim, ["k"], n_salts=4, how="left").select(
        "k", "v", "name"
    )
    assert sorted(
        map(tuple, salted.collect()), key=str
    ) == sorted(map(tuple, plain.collect()), key=str)


def test_salted_join_rejects_right(skewed, dim):
    with pytest.raises(ValueError):
        skew.salted_join(skewed, dim, ["k"], how="right")


def test_salted_count_equivalent(skewed):
    plain = {r.k: r.cnt for r in skewed.groupBy("k").agg(F.count("*").alias("cnt")).collect()}
    salted = {r.k: r.cnt for r in skew.salted_count_by_key(skewed, "k").collect()}
    assert salted == plain


@needs_data
def test_salted_join_on_fixtures(spark, engine):
    engine.load_tables(SF_SMOKE, ("orders", "customer"))
    orders = spark.table("orders")
    customer = spark.table("customer").withColumnRenamed("c_custkey", "o_custkey")
    plain = orders.join(customer, "o_custkey").count()
    salted = skew.salted_join(orders, customer, ["o_custkey"]).count()
    assert salted == plain
