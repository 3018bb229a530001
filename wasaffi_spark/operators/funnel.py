"""Event-sequence analytics: funnels and cohort retention.

The batch counterparts of the streaming session operators — both are
pure integer/date arithmetic, so results hash-verify exactly.

- :func:`funnel_steps` — ordered-step conversion (MATCH_RECOGNIZE's
  bread-and-butter case, which Spark lacks): for each user, the
  earliest time of step 1, then the earliest step-2 event strictly
  after it, and so on. Strict ordering means a user who purchases
  before ever clicking does NOT count as converted.
- :func:`cohort_retention` — the classic retention triangle: users
  bucketed by first-activity period, counted per (cohort, period
  offset).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-user funnel stage times: one row per user who completed step
    1, with ``ts_1 .. ts_k`` timestamps (NULL from the first uncompleted
    step on). ``ts_i`` is the earliest step-``i`` event strictly after
    ``ts_{i-1}``.

    Scale: ``k-1`` equi-joins on the user key, each paired with a
    grouped min (map-side partials); every stage filters to one event
    type first, so join inputs shrink monotonically down the funnel.
    All shuffles share the ``user_col`` key — co-partitioning across
    stages is AQE/exchange-reuse friendly.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    base = events.select(
        F.col(user_col).alias("user"),
        F.col(type_col).alias("etype"),
        F.col(ts_col).alias("ets"),
    )
    out = (
        base.where(F.col("etype") == steps[0])
        .groupBy("user")
        .agg(F.min("ets").alias("ts_1"))
    )
    for i, s in enumerate(steps[1:], start=2):
        nxt = (
            base.where(F.col("etype") == s)
            .join(out.select("user", f"ts_{i - 1}"), "user")
            .where(F.col("ets") > F.col(f"ts_{i - 1}"))
            .groupBy("user")
            .agg(F.min("ets").alias(f"ts_{i}"))
        )
        out = out.join(nxt, "user", "left")
    return out.withColumnRenamed("user", user_col)


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly retention triangle: ``(cohort, week_offset, users)`` where
    ``cohort`` is the user's first active ISO week and ``users`` counts
    distinct users of that cohort active ``week_offset`` weeks later.

    Scale: one grouped min per user (first activity), one distinct over
    (user, week) — both single-shuffle with partial aggregation; the
    cohort join is on the user key. Offsets are day-diffs div 7 —
    integer, engine-exact.
    """
    wk = F.date_trunc("week", F.col(ts_col)).cast("date")
    firsts = (
        events.select(F.col(user_col).alias("user"), wk.alias("w"))
        .groupBy("user")
        .agg(F.min("w").alias("cohort"))
    )
    activity = events.select(
        F.col(user_col).alias("user"), wk.alias("period")
    ).distinct()
    return (
        activity.join(firsts, "user")
        .groupBy(
            "cohort",
            F.expr("datediff(period, cohort) div 7").cast("int").alias(
                "week_offset"
            ),
        )
        .agg(F.count_distinct(F.col("user")).alias("users"))
    )
