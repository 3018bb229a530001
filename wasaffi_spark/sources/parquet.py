"""Parquet source with schema normalization.

Spark's vectorized parquet reader rejects ``TIMESTAMP(NANOS)`` columns
(``PARQUET_TYPE_ILLEGAL``) that Arrow-native writers (and DuckDB) produce
freely — the fixture ``events.parquet`` has ``ts timestamp[ns]``. This
reader inspects the parquet footer with pyarrow, and when nano-precision
timestamps are present reads them via ``spark.sql.legacy.parquet
.nanosAsLong`` and converts back to micro-precision timestamps, so the
rest of the engine sees ordinary ``TimestampType`` columns.

Scale note: only the *footer* of one file is read driver-side; the data
path stays Spark's vectorized reader with pushdown/pruning intact.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

NANOS_AS_LONG = "spark.sql.legacy.parquet.nanosAsLong"


def _nano_timestamp_cols(path: str) -> list[str]:
    import pyarrow.parquet as pq
    import pyarrow.types as pat

    f = path
    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "*.parquet"))) or sorted(
            glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        )
        if not files:
            return []
        f = files[0]
    try:
        schema = pq.read_schema(f)
    except Exception:
        return []
    return [
        fld.name
        for fld in schema
        if pat.is_timestamp(fld.type) and fld.type.unit == "ns"
    ]


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """``spark.read.parquet`` that tolerates nano-precision timestamps."""
    ns_cols = _nano_timestamp_cols(path)
    if not ns_cols:
        return spark.read.parquet(path)
    prev = spark.conf.get(NANOS_AS_LONG, "false")
    spark.conf.set(NANOS_AS_LONG, "true")
    try:
        df = spark.read.parquet(path)
    finally:
        spark.conf.set(NANOS_AS_LONG, prev)
    for c in ns_cols:
        # nanos-since-epoch long → micros → TimestampType. Integer `div`,
        # NOT float division: ns-since-epoch (~1.7e18) exceeds a double's
        # 53-bit mantissa, so float math is off by hundreds of ns.
        # Truncation toward zero matches DuckDB's ns→us cast for
        # post-epoch data.
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df
