"""Crash-safe file-state initialization for foreachBatch sinks.

All the streaming sinks in this package keep their state in
``batch_id=<n>`` parquet partitions (Delta/Iceberg in production). The
seed partition (``batch_id=-1``) is written once, before the query
starts — and a naive ``os.path.exists(state_path)`` guard around that
write has two failure modes (ADVICE r9):

1. **Crash mid-initial-write**: the directory exists but holds no
   committed parquet, so on restart init is skipped and every
   subsequent micro-batch read fails until manual cleanup.
2. **Non-local URIs**: a driver-local ``os.path`` check silently
   returns False for ``s3a://`` / ``hdfs://`` state dirs, re-seeding
   (and thereby wiping) live state.

The fix is the same one Spark's own committers use: key the check on
the committed ``_SUCCESS`` marker inside the seed partition, resolved
through the Hadoop FileSystem API (scheme-aware, not driver-local),
and write the seed with ``mode("overwrite")`` so a half-written
directory from a crashed attempt is healed instead of tripped over.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def seed_committed(spark: SparkSession, seed_part: str) -> bool:
    """True iff ``seed_part`` holds a COMMITTED parquet write — i.e. the
    ``_SUCCESS`` marker Spark's FileOutputCommitter drops on job commit
    exists. Resolved via the Hadoop FS API so ``file:``, ``hdfs:`` and
    ``s3a:`` state dirs all behave; bare-directory existence is never
    consulted."""
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    marker = jvm.org.apache.hadoop.fs.Path(seed_part + "/_SUCCESS")
    fs = marker.getFileSystem(hconf)
    return bool(fs.exists(marker))


def seed_state(spark: SparkSession, seed_part: str, df: DataFrame) -> None:
    """Idempotently seed a state partition: skip when a committed write
    already exists, otherwise ``overwrite`` (healing any uncommitted
    debris from a crashed first attempt)."""
    if seed_committed(spark, seed_part):
        return
    df.write.mode("overwrite").parquet(seed_part)
