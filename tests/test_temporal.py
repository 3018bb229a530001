"""As-of join and binned range join behavioral tests."""

from __future__ import annotations

from datetime import datetime

import pytest

from pyspark.sql import functions as F

from wasaffi_spark.operators import temporal


def ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture()
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [
            (1, ts("2024-01-01 10:00:05"), 1),
            (1, ts("2024-01-01 10:00:10"), 2),
            (2, ts("2024-01-01 10:00:03"), 3),
            (3, ts("2024-01-01 10:00:01"), 4),  # user with no quotes
        ],
        "user_id long, ts timestamp, event_id long",
    )
    quotes = spark.createDataFrame(
        [
            (1, ts("2024-01-01 10:00:00"), 100.0),
            (1, ts("2024-01-01 10:00:07"), 101.0),
            (2, ts("2024-01-01 10:00:03"), 200.0),  # exact tie: <= matches
            (2, ts("2024-01-01 10:00:09"), 201.0),  # after the trade
        ],
        "user_id long, ts timestamp, px double",
    )
    return trades, quotes


def test_asof_join_semantics(trades_quotes):
    trades, quotes = trades_quotes
    out = temporal.asof_join(
        trades, quotes, on="user_id", right_value_cols=["px"]
    )
    rows = {r.event_id: (r.px_right, r.ts_right) for r in out.collect()}
    assert rows[1][0] == 100.0  # 10:00:05 → quote at 10:00:00
    assert rows[2][0] == 101.0  # 10:00:10 → quote at 10:00:07
    assert rows[3][0] == 200.0  # exact-equal ts matches (<= semantics)
    assert rows[4] == (None, None)  # no quotes for user 3 → left outer
    assert out.count() == trades.count()  # every left row survives


def test_asof_row_atomicity_with_null_values(spark):
    """The matched right row is carried whole: a NULL value in the
    LATEST right row must stay NULL (not resurrect a stale value) —
    DuckDB ASOF semantics."""
    trades = spark.createDataFrame(
        [(1, ts("2024-01-01 10:00:10"), 1)], "user_id long, ts timestamp, event_id long"
    )
    quotes = spark.createDataFrame(
        [
            (1, ts("2024-01-01 10:00:00"), 100.0),
            (1, ts("2024-01-01 10:00:07"), None),  # latest has NULL px
        ],
        "user_id long, ts timestamp, px double",
    )
    [row] = temporal.asof_join(
        trades, quotes, on="user_id", right_value_cols=["px"]
    ).collect()
    assert row.ts_right == ts("2024-01-01 10:00:07")
    assert row.px_right is None  # NOT 100.0


def test_asof_ignores_null_ts_right_rows(spark):
    trades = spark.createDataFrame(
        [(1, ts("2024-01-01 10:00:10"), 1)], "user_id long, ts timestamp, event_id long"
    )
    quotes = spark.createDataFrame(
        [(1, None, 999.0)], "user_id long, ts timestamp, px double"
    )
    [row] = temporal.asof_join(
        trades, quotes, on="user_id", right_value_cols=["px"]
    ).collect()
    assert row.px_right is None and row.ts_right is None


def test_range_join_binned_equals_naive(spark):
    import random

    rng = random.Random(3)
    points = spark.createDataFrame(
        [
            (u, ts(f"2024-01-01 {h:02d}:{m:02d}:00"), i)
            for i, (u, h, m) in enumerate(
                (rng.randint(0, 3), rng.randint(0, 23), rng.randint(0, 59))
                for _ in range(200)
            )
        ],
        "user_id long, ts timestamp, event_id long",
    )
    intervals = spark.createDataFrame(
        [
            (u, ts(f"2024-01-01 {h:02d}:00:00"), ts(f"2024-01-01 {h2:02d}:30:00"))
            for u, h, h2 in [(0, 1, 5), (1, 4, 4), (2, 0, 23), (3, 10, 10)]
        ],
        "user_id long, start timestamp, end timestamp",
    )
    binned = temporal.range_join_binned(points, intervals, on="user_id")
    naive = points.join(intervals, "user_id").where(
        (F.col("ts") >= F.col("start")) & (F.col("ts") <= F.col("end"))
    )
    key = lambda r: (r["user_id"], r["event_id"], r["start"])
    assert sorted(map(key, binned.collect())) == sorted(map(key, naive.collect()))
    # and the binned plan joins equi (no BroadcastNestedLoop)
    from wasaffi_spark.plans.inspect import formatted_plan

    assert "BroadcastNestedLoopJoin" not in formatted_plan(binned)
