"""Partitioned-write + partition-pruning tests: the storage-layout half
of the scale posture (SCALE.md) — a filter on the partition column must
prune directories at planning time, not scan-and-discard."""

from __future__ import annotations

import os

import pytest

from tests.conftest import SF_SMOKE

from wasaffi_spark.plans.inspect import formatted_plan

needs_data = pytest.mark.skipif(
    not os.path.isdir(SF_SMOKE), reason="testdata not present"
)


@needs_data
def test_partitioned_write_prunes(spark, engine, tmp_path):
    engine.load_tables(SF_SMOKE, ("orders",))
    out = str(tmp_path / "orders_parted")
    (
        spark.table("orders")
        .write.mode("overwrite")
        .partitionBy("o_orderpriority")
        .parquet(out)
    )
    # one directory per priority value
    parts = [d for d in os.listdir(out) if d.startswith("o_orderpriority=")]
    assert len(parts) == 5

    df = spark.read.parquet(out).where("o_orderpriority = '1-URGENT'")
    plan = formatted_plan(df)
    assert "PartitionFilters" in plan
    assert "1-URGENT" in plan  # the filter reached partition pruning
    n = df.count()
    assert 0 < n < spark.table("orders").count()
    # and the pruned read returns exactly the right rows
    expected = spark.table("orders").where("o_orderpriority = '1-URGENT'").count()
    assert n == expected
