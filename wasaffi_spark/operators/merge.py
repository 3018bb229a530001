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


def scd2_merge(
    history: DataFrame,
    source: DataFrame,
    keys: list[str],
    compare_cols: list[str],
    load_ts: Column,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    is_current: str = "is_current",
) -> DataFrame:
    """SCD Type-2 merge: history-preserving upsert. ``history`` carries
    one row per (key, validity interval) with ``valid_from``/
    ``valid_to``/``is_current`` bookkeeping columns; ``source`` is the
    new snapshot (one row per key). The result:

    - unchanged current rows and all closed rows pass through;
    - current rows whose ``compare_cols`` differ from the source close
      (``valid_to = load_ts``, ``is_current = false``) and the source
      version opens (``valid_from = load_ts``, open-ended);
    - brand-new keys open their first version.

    Keys absent from the source are left open (retention merge, not a
    full-snapshot diff — compose with :func:`diff.snapshot_diff` to
    close deletions explicitly).

    Scale: the only wide operation is one left join of the CURRENT
    slice with the source on the key (closed history passes through
    untouched via union — never joined, never shuffled). At 100 TB
    partition the history table by ``is_current`` so the closed
    majority is not even scanned.
    """
    missing = [c for c in keys + compare_cols if c not in source.columns]
    if missing:
        raise ValueError(f"source lacks column(s): {missing}")
    closed = history.where(~F.col(is_current))
    current = history.where(F.col(is_current)).withColumn(
        "_cur_present", F.lit(True)
    )

    s = source.select(
        [F.col(c).alias(f"src_{c}") for c in source.columns]
    ).withColumn("src__present", F.lit(True))
    cond = [F.col(k).eqNullSafe(F.col(f"src_{k}")) for k in keys]
    j = current.join(s, cond, "full_outer")
    s_present = F.col("src__present").isNotNull()
    t_present = F.col("_cur_present").isNotNull()
    changed = s_present & t_present & ~F.concat_ws(
        "\x01", *[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in compare_cols]
    ).eqNullSafe(
        F.concat_ws(
            "\x01",
            *[
                F.coalesce(F.col(f"src_{c}").cast("string"), F.lit("\x00"))
                for c in compare_cols
            ],
        )
    )

    data_cols = [
        c
        for c in history.columns
        if c not in (valid_from, valid_to, is_current)
    ]

    # surviving current rows: unchanged matches + unmatched targets
    keep_open = j.where(t_present & ~changed).select(
        *[F.col(c) for c in data_cols],
        F.col(valid_from),
        F.col(valid_to),
        F.col(is_current),
    )
    # rows to close: matched-and-changed current versions
    close = j.where(changed).select(
        *[F.col(c) for c in data_cols],
        F.col(valid_from),
        load_ts.alias(valid_to),
        F.lit(False).alias(is_current),
    )
    # rows to open: changed keys (source version) + brand-new keys
    def _src_or_null(c: str) -> Column:
        return F.col(f"src_{c}") if c in source.columns else F.lit(None)

    opens = j.where(s_present & (changed | ~t_present)).select(
        *[
            (F.coalesce(F.col(f"src_{c}"), F.col(c)) if c in keys else _src_or_null(c)).alias(c)
            for c in data_cols
        ],
        load_ts.alias(valid_from),
        F.lit(None).cast("timestamp").alias(valid_to),
        F.lit(True).alias(is_current),
    )
    return closed.select(keep_open.columns).unionByName(keep_open).unionByName(
        close
    ).unionByName(opens)
