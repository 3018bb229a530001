"""Bucketed-table co-location: shuffle-free large-table joins.

At 100 TB the dominant cost of a fact-fact join is the shuffle of both
sides. Writing the tables bucketed (and sorted) on the join key lets
Spark's SortMergeJoin read co-located buckets with NO Exchange on either
side — the partitioning is reused across every downstream join/agg on
the same key. This module packages that pattern; the test asserts the
Exchange-free plan.

(The reference has no storage layer of its own — this is the Spark-native
answer to "pre-partitioning for co-located joins", SURVEY §7.5.5.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist a frame as a bucketed (+sorted) managed parquet table.

    Bucket count should be sized so one bucket of the *largest* table
    fits an executor's memory at the target scale; all tables joined on
    the key must share the count for bucket-wise joins.
    """
    writer = df.write.mode("overwrite").format("parquet").bucketBy(
        n_buckets, *bucket_cols
    )
    if sort:
        writer = writer.sortBy(*bucket_cols)
    writer.saveAsTable(table)


def cobucketed_join(
    spark: SparkSession, left: str, right: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two co-bucketed tables on their bucket key (no shuffle)."""
    return spark.table(left).join(spark.table(right), on=on, how=how)


def exchange_count(df: DataFrame) -> int:
    """Number of Exchange (shuffle) nodes in the physical plan."""
    from ..plans.inspect import formatted_plan

    text = formatted_plan(df)
    return sum(
        1
        for ln in text.splitlines()
        if ln.strip().startswith("(") and ") Exchange" in ln
    )
