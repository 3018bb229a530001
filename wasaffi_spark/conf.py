"""Recommended session configuration.

One place encoding the engine's scale posture (SCALE.md): AQE with
partition coalescing and skew handling, Arrow transfers for every
Python-boundary crossing, shuffle partitions sized to the core count,
and byte-sized file splits for wide (media) rows.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def recommended_builder(
    master: str | None = None,
    cpus: int | None = None,
    app_name: str = "wasaffi-spark",
) -> SparkSession.Builder:
    """A ``SparkSession.Builder`` with the engine's recommended configs.

    ``cpus`` sizes shuffle parallelism; on a real cluster leave it unset
    and size ``spark.sql.shuffle.partitions`` to ~2-3× total cores (AQE
    coalesces the excess at runtime).
    """
    b = SparkSession.builder.appName(app_name)
    if master:
        b = b.master(master)
    if cpus:
        b = b.config("spark.sql.shuffle.partitions", str(max(cpus, 16)))
    return (
        b.config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Respect the byte-sized partition target when coalescing
        # instead of stopping at the default-parallelism floor (the
        # Spark-documented production recommendation; optimization
        # guide §2.2: partitions sized by bytes, not by a core-count
        # constant). r13-measured on the iterative-round microbench:
        # ~5% at local bench scale (tiny frames coalesce below the
        # 32-partition floor), byte-proportional at cluster scale.
        .config(
            "spark.sql.adaptive.coalescePartitions.parallelismFirst",
            "false",
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # smaller-than-default splits: media/doc rows are wide, so 64 MiB
        # keeps a task's row batch bounded by bytes rather than row count
        .config("spark.sql.files.maxPartitionBytes", str(64 * 1024 * 1024))
        # fewer, larger Arrow batches across the JVM↔Python boundary
        # (measured ~8% on the UDF hot path vs the 10k default). 64k
        # rows ≈ 0.5 MB per double column per batch; jobs moving very
        # wide rows (raw media payloads) through Python should lower it.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
    )
