"""Temporal joins Spark lacks natively: as-of join and binned range join.

Two of the classic "reference engines have it, Spark doesn't" operators
(DuckDB ships ASOF JOIN; Flink has temporal joins). Both are built as
compositions of existing DataFrame ops — no Python in the data path —
using the standard scale patterns:

- **as-of join** (latest right row with ``r.ts <= l.ts`` per key): the
  union+window trick. Tag sides, union, sort within key by (ts, side),
  carry the last right value forward with ``last(..., ignorenulls)``,
  keep left rows. ONE shuffle on the key — same cost as a grouped
  aggregation, versus the naive per-left-row subquery which is a
  quadratic non-equi join.
- **binned range join** (``l.ts BETWEEN r.start AND r.end``): bin both
  sides into fixed time buckets, equi-join on (key, bucket) — intervals
  explode into the buckets they overlap — then apply the exact range
  predicate. Turns a BroadcastNestedLoop/cartesian plan into an
  equi-join whose fan-out is interval_span/bin_width per row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    right_value_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.ts <= left.ts`` within the same ``on`` key (left outer
    semantics: unmatched left rows keep NULLs).

    Ties on (key, ts): right rows sort before left rows at equal ts
    (``<=`` semantics); multiple right rows at the exact same (key, ts)
    resolve deterministically to the greatest row struct (value-wise) —
    pre-aggregate the right side if different semantics are needed.

    Row atomicity: the matched right row is carried as ONE struct, so a
    NULL value inside the latest right row stays NULL (per-column
    carries would resurrect stale values from older rows — DuckDB ASOF
    returns the whole row, and so do we). Right rows with NULL ``ts``
    are dropped up front: they can never be "as of" anything.
    """
    from pyspark.sql import types as T

    if right_value_cols is None:
        right_value_cols = [c for c in right.columns if c not in (on, ts_col)]
    if "_asof_ts" in right_value_cols:
        raise ValueError("right_value_cols may not contain the reserved name '_asof_ts'")
    lcols = left.columns
    right = right.where(F.col(ts_col).isNotNull())

    # build the struct type programmatically — DDL-string concatenation
    # breaks on non-identifier column names (spaces, reserved words)
    r_struct_type = T.StructType(
        [T.StructField("_asof_ts", right.schema[ts_col].dataType)]
        + [T.StructField(c, right.schema[c].dataType) for c in right_value_cols]
    )
    l_tag = left.select(
        *lcols,
        F.lit(1).alias("_side"),
        F.lit(None).cast(r_struct_type).alias("_r"),
    )
    r_tag = right.select(
        F.col(on),
        F.col(ts_col),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
            if c not in (on, ts_col)
        ],
        F.lit(0).alias("_side"),
        F.struct(
            F.col(ts_col).alias("_asof_ts"),
            *[F.col(c) for c in right_value_cols],
        ).alias("_r"),
    ).select(*[F.col(c) for c in l_tag.columns])  # align column order

    unioned = l_tag.unionByName(r_tag)
    # _r in the ordering: deterministic tiebreak among right rows that
    # share the exact same (key, ts) — window sorts are not stable
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc(), F.col("_r").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *[F.col(c) for c in lcols],
        F.col("_side"),
        F.last(F.when(F.col("_side") == 0, F.col("_r")), ignorenulls=True)
        .over(w)
        .alias("_m"),
    )
    return (
        carried.where(F.col("_side") == 1)
        .select(
            *[F.col(c) for c in lcols],
            *[F.col("_m").getField(c).alias(f"{c}{suffix}") for c in right_value_cols],
            F.col("_m._asof_ts").alias(f"{ts_col}{suffix}"),
        )
    )


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    on: str,
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bin_seconds: int = 3600,
) -> DataFrame:
    """Join points to intervals containing them
    (``start <= ts <= end``) per key, via time-bucket binning.

    Each interval is exploded into every ``bin_seconds`` bucket it
    overlaps; points carry their single bucket; the join is equi on
    (key, bucket) followed by the exact predicate. Duplicate matches
    from multi-bucket intervals are impossible: a point lives in one
    bucket only.
    """
    p_bin = points.withColumn(
        "_bin", F.floor(F.unix_timestamp(F.col(ts_col)) / bin_seconds)
    )
    i_bin = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_col)) / bin_seconds),
                F.floor(F.unix_timestamp(F.col(end_col)) / bin_seconds),
            )
        ),
    )
    return (
        p_bin.join(i_bin, [on, "_bin"])
        .where(
            (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) <= F.col(end_col))
        )
        .drop("_bin")
    )


def gapfill_hourly(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    val_col: str = "value",
) -> DataFrame:
    """Time-series resample with gap fill (the hypertable
    ``time_bucket_gapfill`` shape; Spark has no native equivalent):
    aggregate to hourly buckets per series, densify every series onto
    the full corpus-wide hourly spine, zero-fill counts and
    forward-fill the last observed hourly sum (``locf``).

    Returns ``(key, hour, cnt, last_sum)`` — cnt = 0 on gap hours,
    last_sum = most recent non-gap hour's sum (NULL before the first
    observation of a series).

    Scale: one grouped aggregation (shuffle ∝ observed cells), a
    broadcast of the 1-row global [min, max] bound, a spine built from
    ``sequence``+``explode`` (rows ∝ series × hours — the DENSIFIED
    size, which is the output size; nothing quadratic), and one window
    pass per series for the fill. The window partitions by series key —
    fill parallelism equals series count, the standard gap-fill layout
    (series ≫ cores in production; densify per bounded time range, not
    all history, if a series' hour count outgrows a partition).
    """
    hour = F.date_trunc("hour", F.col(ts_col))
    hourly = (
        events.groupBy(F.col(key_col).alias("key"), hour.alias("hour"))
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.sum(val_col), 2).alias("sv"),
        )
    )
    bounds = events.agg(
        F.date_trunc("hour", F.min(ts_col)).alias("lo"),
        F.date_trunc("hour", F.max(ts_col)).alias("hi"),
    )
    spine = (
        events.select(F.col(key_col).alias("key"))
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "key",
            F.explode(
                F.sequence("lo", "hi", F.expr("interval 1 hour"))
            ).alias("hour"),
        )
    )
    w = (
        Window.partitionBy("key")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(hourly, ["key", "hour"], "left")
        .select(
            "key",
            "hour",
            F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt"),
            F.last("sv", ignorenulls=True).over(w).alias("last_sum"),
        )
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_start: str = "start",
    left_end: str = "end",
    right_start: str = "start",
    right_end: str = "end",
    bin_seconds: int = 3600,
) -> DataFrame:
    """Join two INTERVAL sets on key + time overlap
    (``l.start <= r.end AND r.start <= l.end``, closed intervals) — the
    two-sided generalization of :func:`range_join_binned`.

    Plan shape: each interval explodes into every ``bin_seconds`` bucket
    it covers, the join is equi on (key, bucket), the exact overlap
    predicate filters, and a dedup on the PAIR IDENTITY — per-side row
    tags assigned before binning, not the row values — removes the
    multi-bucket duplicates (two intervals overlapping across k shared
    buckets meet k times). Tagging by row rather than value means two
    identical input intervals still produce two output rows, exactly
    like the untagged overlap join the oracle states; a whole-row
    ``distinct()`` would silently collapse them. Catalyst would
    otherwise plan the raw inequality join as BroadcastNestedLoop —
    quadratic per key.

    Fan-out is interval_span/bin_seconds per row: pick ``bin_seconds``
    near the typical interval length (the standard binned-overlap
    sizing), so fan-out stays O(1)·rows while each bucket pairs only
    co-located intervals.

    Column handling: both sides keep all their columns; right-side
    name collisions get an ``_r`` suffix.
    """
    overlap = (F.col(f"_l_{left_start}") <= F.col(f"_r_{right_end}")) & (
        F.col(f"_r_{right_start}") <= F.col(f"_l_{left_end}")
    )

    def binned(df: DataFrame, s: str, e: str) -> DataFrame:
        return df.withColumn(
            "_bin",
            F.explode(
                F.sequence(
                    F.floor(F.unix_timestamp(F.col(s)) / bin_seconds),
                    F.floor(F.unix_timestamp(F.col(e)) / bin_seconds),
                )
            ),
        )

    lcols = [c for c in left.columns if c != on]
    rcols = [c for c in right.columns if c != on]
    # per-side row identity BEFORE the bin explode: each source row keeps
    # one tag across all its bins, so (left tag, right tag) names the
    # pair exactly once per shared bucket. monotonically_increasing_id
    # is stable within one job (partition-indexed), which is all the
    # dedup needs — the tags never leave the plan.
    l_ren = left.select(
        on, *[F.col(c).alias(f"_l_{c}") for c in lcols]
    ).withColumn("_l_row", F.monotonically_increasing_id())
    r_ren = right.select(
        on, *[F.col(c).alias(f"_r_{c}") for c in rcols]
    ).withColumn("_r_row", F.monotonically_increasing_id())
    lb = binned(l_ren, f"_l_{left_start}", f"_l_{left_end}")
    rb = binned(r_ren, f"_r_{right_start}", f"_r_{right_end}")
    joined = (
        lb.join(rb, [on, "_bin"])
        .where(overlap)
        .dropDuplicates(["_l_row", "_r_row"])
        .drop("_bin", "_l_row", "_r_row")
    )
    out_cols = [F.col(on)]
    for c in lcols:
        out_cols.append(F.col(f"_l_{c}").alias(c))
    for c in rcols:
        out_cols.append(
            F.col(f"_r_{c}").alias(c if c not in lcols else f"{c}_r")
        )
    return joined.select(*out_cols)


EWMA_QUANT = 1_000_000
EWMA_ALPHA_BP = 30  # α in hundredths: s_t = (30·x_t + 70·s_{t-1}) / 100


def ewma(
    df: DataFrame,
    key_col: str = "user_id",
    order_col: str = "event_id",
    value_col: str = "value",
    alpha_bp: int = EWMA_ALPHA_BP,
) -> DataFrame:
    """Per-key exponentially-weighted moving average — the streaming
    feature-engineering primitive (user activity level, rolling
    quality signal) computed batch-side: for each key, values in
    ``order_col`` order fold through ``s_t = ⌊(α·x_t +
    (100−α)·s_{t−1}) / 100⌋`` on the micro-unit integer grid, seeded
    with ``s_0 = x_0``. INTEGER-EXACT: the quantize-then-floor chain
    makes every smoothed value bit-identical across engines and
    partitionings (a float EWMA would drift by summation error), so
    the whole series is hash-oracle-able — DuckDB replays it with a
    recursive CTE.

    Beyond-reference extension. Shape: one hash shuffle on the key;
    the fold is an in-row ``aggregate`` over the key's sorted
    (order, value) structs — group-local, sized by events-per-key
    (bounded in any windowed/retention-limited pipeline; for unbounded
    keys switch to the streaming twin ``applyInPandasWithState``).
    Rows with NULL key or value are excluded (EWMA undefined).
    Returns ``(key_col, order_col, ewma_micro)`` for every input row.
    """
    q = F.floor(
        F.col(value_col).cast("double") * EWMA_QUANT + F.lit(0.5)
    ).cast("bigint")
    items = F.sort_array(
        F.collect_list(F.struct(F.col(order_col).alias("o"), q.alias("q")))
    )
    grouped = (
        df.where(
            F.col(key_col).isNotNull()
            & F.col(value_col).isNotNull()
            # NaN is not NULL: without this a NaN value quantizes to a
            # NULL micro-unit and poisons the fold, while the streaming
            # twin's pandas notna() drops it — exclude it in BOTH
            # (review finding r5; mirrored in the oracle's isnan filter)
            & ~F.isnan(F.col(value_col).cast("double"))
        )
        .groupBy(key_col)
        .agg(items.alias("_it"))
    )
    init = F.struct(
        F.lit(None).cast("bigint").alias("p"),
        F.array().cast("array<struct<o:bigint,e:bigint>>").alias("outs"),
    )

    def step(acc, x):
        # Exact integer floor division via decimal(38,0) arithmetic:
        # bigint `/` goes through double, whose 53-bit mantissa rounds
        # the numerator once |30·q + 70·s| exceeds 2^53 and can floor
        # one off from the Python twin's exact `//` (review finding
        # r6). Decimal +/*/÷ are exact here (quotient needs only 2
        # fractional digits, result scale is 6), and F.floor on a
        # decimal is a true floor for negatives too.
        num = (
            F.lit(alpha_bp) * x["q"].cast("decimal(38,0)")
            + F.lit(100 - alpha_bp) * acc["p"].cast("decimal(38,0)")
        )
        s = F.when(acc["p"].isNull(), x["q"]).otherwise(
            F.floor(num / F.lit(100)).cast("bigint")
        )
        return F.struct(
            s.alias("p"),
            F.concat(
                acc["outs"],
                F.array(F.struct(x["o"].alias("o"), s.alias("e"))),
            ).alias("outs"),
        )

    folded = grouped.select(
        key_col,
        F.explode(F.aggregate(F.col("_it"), init, step)["outs"]).alias("_r"),
    )
    return folded.select(
        key_col,
        F.col("_r.o").alias(order_col),
        F.col("_r.e").alias("ewma_micro"),
    )
