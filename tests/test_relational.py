"""Catalog sanity tests over sf0.001 (fast; the full DuckDB-oracle parity
run is tools/oracle_check.py at sf0.01 — the driver's t2 gate)."""

from __future__ import annotations

import os

import pytest

from tests.conftest import SF_SMOKE

from wasaffi_spark.plans import relational

needs_data = pytest.mark.skipif(
    not os.path.isdir(SF_SMOKE), reason="testdata not present"
)


def test_catalog_well_formed():
    # every oracle key refers to a registered query
    assert set(relational.ORACLE) <= set(relational.QUERIES)
    # approx aggregates are deliberately rows-only
    assert "approx_distinct" in relational.QUERIES
    assert "approx_distinct" not in relational.ORACLE


@needs_data
def test_scan_count(spark):
    [row] = relational.QUERIES["scan_count"](spark, SF_SMOKE).collect()
    assert row["cnt"] == 6000


@needs_data
def test_cross_join(spark):
    [row] = relational.QUERIES["cross_join"](spark, SF_SMOKE).collect()
    assert row["cnt"] == 25


@needs_data
def test_agg_pricing_shape(spark):
    rows = relational.QUERIES["agg_pricing"](spark, SF_SMOKE).collect()
    assert 1 <= len(rows) <= 6  # returnflag × linestatus combos
    assert sum(r["cnt"] for r in rows) == 6000


@needs_data
def test_topk_ordering(spark):
    rows = relational.QUERIES["topk"](spark, SF_SMOKE).collect()
    prices = [r["o_totalprice"] for r in rows]
    assert prices == sorted(prices, reverse=True)
    assert len(rows) == 10


@needs_data
def test_window_rownum_partitions(spark):
    rows = relational.QUERIES["window_rownum"](spark, SF_SMOKE).collect()
    seen: dict[int, int] = {}
    for r in rows:
        expected = seen.get(r["o_custkey"], 0) + 1
        assert r["rn"] == expected
        seen[r["o_custkey"]] = expected


@needs_data
def test_udf_pow_values(spark):
    rows = relational.QUERIES["udf_pow"](spark, SF_SMOKE).collect()
    for r in rows:
        assert r["sq"] == float(r["l_linenumber"]) ** 2


@needs_data
def test_entry_contract(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 30
