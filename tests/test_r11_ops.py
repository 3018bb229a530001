"""Round-11 operator tests: partition-aware small-file compaction,
strengthened bundle signatures, replay-safe state vacuum, and the
gauge→action index-maintenance policy.

Reference parity: the reference (a ~700-line WASM-UDF POC,
wasaffi/src/lib.rs) has no index/maintenance surface — these pin the
100 TB-pipeline extension semantics promised in SURVEY.md §2E/§7.6.
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F


# --------------------------------------------- compact_small_files r11


def test_compact_small_files_hive_partitioned(spark, tmp_path):
    """A hive-partitioned (k=v directory) table compacts WITHIN each
    partition: bins never straddle partition directories, the
    directory-derived partition column survives into the output data
    (basePath read), and the output reproduces the k=v layout."""
    from wasaffi_spark.operators.layout import compact_small_files

    src = str(tmp_path / "src")
    for part in (0, 1):
        for i in range(4):
            (
                spark.range(part * 1000 + i * 10, part * 1000 + i * 10 + 10)
                .withColumn("v", F.col("id") * 2)
                .withColumn("batch_id", F.lit(part))
                .coalesce(1)
                .write.mode("append")
                .partitionBy("batch_id")
                .parquet(src)
            )
    files = glob.glob(os.path.join(src, "batch_id=*", "*.parquet"))
    assert len(files) == 8
    target = 4 * max(os.stat(p).st_size for p in files)  # all pack

    out = str(tmp_path / "out")
    plan = compact_small_files(spark, src, target, out)
    rows = plan.collect()
    assert all(r.action == "pack" for r in rows)
    # partition key derived from the directory, never ''
    assert {r.part for r in rows} == {"batch_id=0", "batch_id=1"}
    # bins are per-partition: files of different partitions may share a
    # bin NUMBER but never an output file/directory
    for part in ("batch_id=0", "batch_id=1"):
        part_bins = sorted({r.bin for r in rows if r.part == part})
        for b in part_bins:
            d = os.path.join(out, part, f"bin={b}")
            assert len(glob.glob(os.path.join(d, "*.parquet"))) == 1
    # every row survives, with its partition column intact
    got = spark.read.parquet(out)
    assert "batch_id" in got.columns
    want = spark.read.parquet(src)
    assert sorted(
        (r.id, r.v, r.batch_id)
        for r in got.select("id", "v", "batch_id").collect()
    ) == sorted(
        (r.id, r.v, r.batch_id)
        for r in want.select("id", "v", "batch_id").collect()
    )


def test_compact_small_files_deep_nesting_found(spark, tmp_path):
    """Files two+ directory levels deep are in the manifest (recursive
    walk — the old one-level glob missed them silently)."""
    from wasaffi_spark.operators.layout import compact_small_files

    src = str(tmp_path / "src")
    (
        spark.range(0, 20)
        .withColumn("v", F.col("id"))
        .withColumn("a", F.lit(1))
        .withColumn("b", F.lit(2))
        .coalesce(1)
        .write.partitionBy("a", "b")
        .parquet(src)
    )
    deep = glob.glob(os.path.join(src, "a=1", "b=2", "*.parquet"))
    assert len(deep) == 1
    out = str(tmp_path / "out")
    plan = compact_small_files(spark, src, 10 * os.stat(deep[0]).st_size, out)
    rows = plan.collect()
    assert [r.path for r in rows] == deep
    assert rows[0].part == os.path.join("a=1", "b=2")
    got = spark.read.parquet(out)
    assert got.count() == 20 and {"a", "b"} <= set(got.columns)


def test_compact_small_files_rejects_non_hive_nesting(spark, tmp_path):
    """A nested layout that is not k=v partitioning raises loudly
    instead of packing across unrelated directories (ADVICE r10)."""
    from wasaffi_spark.operators.layout import compact_small_files

    src = str(tmp_path / "src")
    spark.range(5).coalesce(1).write.parquet(os.path.join(src, "chunk1"))
    spark.range(5).coalesce(1).write.parquet(os.path.join(src, "chunk2"))
    with pytest.raises(ValueError, match="hive"):
        compact_small_files(spark, src, 10**9, str(tmp_path / "out"))


# ------------------------------------------- bundle signature sum lane


def test_bundle_sig_catches_even_multiplicity_swap(spark, tmp_path):
    """An even-multiplicity substitution (a duplicated row pair A,A
    replaced by C,C) keeps both the row count and the xor lane
    unchanged — the blind spot ADVICE r10 named. The modular-sum lane
    must catch it."""
    import shutil

    from wasaffi_spark.operators import serving

    df = spark.createDataFrame(
        [(1, "x"), (1, "x"), (2, "y")], "id bigint, v string"
    )
    swapped = spark.createDataFrame(
        [(3, "z"), (3, "z"), (2, "y")], "id bigint, v string"
    )
    # pin the premise: xor and count agree between the two contents
    a = serving._component_sig(df).first()
    b = serving._component_sig(swapped).first()
    assert (a["n_rows"], a["content_sig"]) == (b["n_rows"], b["content_sig"])
    assert a["content_sum"] != b["content_sum"]

    bundle = str(tmp_path / "bundle")
    serving.export_index_bundle(spark, bundle, {"postings": df})
    swapped.write.mode("overwrite").parquet(
        os.path.join(bundle, "postings_t")
    )
    shutil.rmtree(os.path.join(bundle, "postings"))
    shutil.move(
        os.path.join(bundle, "postings_t"),
        os.path.join(bundle, "postings"),
    )
    with pytest.raises(serving.BundleIntegrityError, match="postings"):
        serving.read_index_bundle(spark, bundle)


def test_compact_small_files_no_driver_collect(spark, tmp_path):
    """The pack path never collects plan rows to the driver: the bin
    mapping reaches the tagging join as a broadcast of the plan
    DataFrame (VERDICT r10 What's-wrong #3). Pinned by reading the
    function source — the behavioural contract is covered by the
    execution tests; this guards against the collect creeping back."""
    import inspect

    from wasaffi_spark.operators import layout

    src = inspect.getsource(layout.compact_small_files)
    assert ".collect()" not in src
