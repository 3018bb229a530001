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


def test_split_udtf(spark):
    grouped.register_split_udtf(spark, "split_tokens_t")
    rows = spark.sql(
        "select * from split_tokens_t('a bb ccc') order by pos"
    ).collect()
    assert [(r.pos, r.token) for r in rows] == [(0, "a"), (1, "bb"), (2, "ccc")]
    # empty input yields no rows
    assert spark.sql("select * from split_tokens_t('')").count() == 0
