"""Snapshot diff — dataset-versioning delta between two corpus states.

A recurring training-data operation the reference's engine family covers
via table scans + joins (no reference-specific algorithm; composed from
the inherited relational surface, SURVEY §2C): given snapshot A (what
was ingested) and snapshot B (the new crawl), classify every key as
``added`` / ``removed`` / ``changed`` / ``unchanged`` by comparing a
content fingerprint. The complement of :func:`dedup.incremental_dedup`
(which answers "which NEW rows are novel"); this answers "what happened
to EVERY row".

Scale: one md5 per row per side (map-only, codegen), one full outer
join on the key — a single shuffle per side, AQE-handled. No driver
state; no collect. Works unchanged whether A/B are parquet snapshots,
temp views, or streaming-foreachBatch frames.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _fingerprint(cols: Sequence[str]) -> Column:
    """md5 over the NULL-safe concatenation of the compared columns.
    Separator/NULL sentinels are control characters that cannot appear
    in text, so ("a", NULL) never collides with ("a", "")."""
    return F.md5(
        F.concat_ws(
            "\x01",
            *[
                F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
                for c in cols
            ],
        )
    )


def snapshot_diff(
    a: DataFrame,
    b: DataFrame,
    key: str = "doc_id",
    compare_cols: Sequence[str] = ("text",),
) -> DataFrame:
    """Per-key delta ``(key, status)`` between snapshots ``a`` and ``b``.

    status ∈ added (key only in b) / removed (only in a) /
    changed (both, fingerprint differs) / unchanged.
    """
    fa = a.select(F.col(key).alias("_ka"), _fingerprint(compare_cols).alias("_fa"))
    fb = b.select(F.col(key).alias("_kb"), _fingerprint(compare_cols).alias("_fb"))
    joined = fa.join(fb, fa["_ka"] == fb["_kb"], "full_outer")
    status = (
        F.when(F.col("_ka").isNull(), F.lit("added"))
        .when(F.col("_kb").isNull(), F.lit("removed"))
        .when(F.col("_fa") != F.col("_fb"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return joined.select(
        F.coalesce(F.col("_ka"), F.col("_kb")).alias(key),
        status.alias("status"),
    )


def diff_summary(diff: DataFrame) -> DataFrame:
    """Status → count rollup of a :func:`snapshot_diff` result."""
    return diff.groupBy("status").agg(F.count("*").alias("cnt"))
