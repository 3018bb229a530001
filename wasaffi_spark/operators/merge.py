"""MERGE INTO (SCD-1 upsert) semantics over plain tables.

Spark only exposes ``MERGE INTO`` through v2 catalogs (Delta/Iceberg);
over parquet/views the same semantics compose as ONE full-outer join —
single shuffle on the key, no driver round-trips, AQE-skew-safe. The
three MERGE branches map to join-presence flags:

- WHEN MATCHED THEN UPDATE   → both sides present: source columns
  overwrite same-named target columns
- WHEN MATCHED AND <cond> THEN DELETE → matched rows failing the filter
- WHEN NOT MATCHED THEN INSERT → source-only rows: source values,
  target-only columns NULL

Target-only rows pass through unchanged. Output schema == target
schema (inserts carry NULL for target-only columns — the SQL MERGE
default).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    delete_condition: Column | None = None,
) -> DataFrame:
    """SCD-1 merge: every source column overwrites its same-named target
    column when the key matches; source-only rows insert; target-only
    rows persist; matched rows where ``delete_condition`` holds are
    deleted. In ``delete_condition``, reference target columns by their
    plain name and source columns as ``src_<name>`` (the join exposes
    the source under that prefix — a warehouse merge's source is
    routinely derived FROM the target, so plain two-sided aliases hit
    Spark's self-join ambiguity).

    Scale: one shuffle on ``keys`` (the full-outer join); both sides
    stream — no collect, no broadcast assumption (the source is
    routinely as large as the target). Co-locate by bucketing both
    tables on the key to remove even that shuffle
    (operators/bucketing.py).
    """
    missing = [k for k in keys if k not in source.columns]
    if missing:
        raise ValueError(f"source lacks merge key column(s): {missing}")
    s = source.select(
        [F.col(c).alias(f"src_{c}") for c in source.columns]
    ).withColumn("src__present", F.lit(True))
    t = target.withColumn("_tgt_present", F.lit(True))
    cond = [
        F.col(k).eqNullSafe(F.col(f"src_{k}")) for k in keys
    ]
    j = t.join(s, cond, "full_outer")
    s_present = F.col("src__present").isNotNull()
    t_present = F.col("_tgt_present").isNotNull()
    if delete_condition is not None:
        j = j.where(~(t_present & s_present & delete_condition))
    out = []
    src_cols = set(source.columns)
    for c in target.columns:
        sc = F.col(f"src_{c}")
        if c in keys:
            out.append(F.coalesce(F.col(c), sc).alias(c))
        elif c in src_cols:
            out.append(F.when(s_present, sc).otherwise(F.col(c)).alias(c))
        else:
            out.append(F.col(c).alias(c))  # inserts get NULL here
    return j.select(out)
