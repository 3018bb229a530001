"""UDAF-equivalent (applyInPandas) and UDTF behavioral tests."""

from __future__ import annotations

import pytest

from wasaffi_spark.operators import grouped


def test_grouped_median_exact(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (1, 20.0), (1, 30.0), (2, 1.0), (2, 2.0)], "k long, v double"
    )
    got = {r.k: r.median for r in grouped.grouped_median(df, "k", "v").collect()}
    assert got == {1: 20.0, 2: 1.5}  # odd group exact, even group interpolated


def test_grouped_median_skewed_and_batched(spark):
    """A hot key spanning many Arrow batches plus small keys, null keys
    and null values — exercises the per-batch chunk accumulation path
    (no whole-partition concat) and percentile_cont NULL semantics."""
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "100")
    try:
        hot = [(1, float(i)) for i in range(2001)]  # median = 1000.0
        cold = [(2, 5.0), (2, None), (3, 7.0), (None, 9.0)]
        df = spark.createDataFrame(hot + cold, "k long, v double")
        out = grouped.grouped_median(df, "k", "v", num_partitions=4)
        got = {r.k: r.median for r in out.collect()}
        assert got == {1: 1000.0, 2: 5.0, 3: 7.0}  # null key dropped, null v ignored
        # data-proportional auto-sizing path (runs the count branch)
        auto = {r.k: r.median for r in grouped.grouped_median(df, "k", "v").collect()}
        assert auto == got
    finally:
        spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")


def test_split_udtf(spark):
    grouped.register_split_udtf(spark, "split_tokens_t")
    rows = spark.sql(
        "select * from split_tokens_t('a bb ccc') order by pos"
    ).collect()
    assert [(r.pos, r.token) for r in rows] == [(0, "a"), (1, "bb"), (2, "ccc")]
    # empty input yields no rows
    assert spark.sql("select * from split_tokens_t('')").count() == 0
