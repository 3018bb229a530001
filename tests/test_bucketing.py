"""Bucketed co-location tests: the join plan over two co-bucketed tables
must contain NO Exchange — the shuffle-free join that makes repeated
fact-fact joins viable at 100 TB."""

from __future__ import annotations

import os

import pytest

from tests.conftest import SF_SMOKE

from wasaffi_spark.operators import bucketing

needs_data = pytest.mark.skipif(
    not os.path.isdir(SF_SMOKE), reason="testdata not present"
)


@needs_data
def test_cobucketed_join_has_no_shuffle(spark, engine):
    engine.load_tables(SF_SMOKE, ("orders", "customer"))
    bucketing.write_bucketed(
        spark.table("orders"), "orders_b", ["o_custkey"], n_buckets=8
    )
    bucketing.write_bucketed(
        spark.table("customer").withColumnRenamed("c_custkey", "o_custkey"),
        "customer_b",
        ["o_custkey"],
        n_buckets=8,
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketing.cobucketed_join(
            spark, "orders_b", "customer_b", on=["o_custkey"]
        )
        assert bucketing.exchange_count(joined) == 0  # no shuffle either side
        # and the result is correct
        n = joined.count()
        expected = (
            spark.table("orders")
            .join(
                spark.table("customer").withColumnRenamed("c_custkey", "o_custkey"),
                "o_custkey",
            )
            .count()
        )
        assert n == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS customer_b")


@needs_data
def test_unbucketed_join_does_shuffle(spark, engine):
    """Control: the same join without bucketing shuffles both sides."""
    engine.load_tables(SF_SMOKE, ("orders", "customer"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("orders").join(
            spark.table("customer").withColumnRenamed("c_custkey", "o_custkey"),
            "o_custkey",
        )
        assert bucketing.exchange_count(joined) >= 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
