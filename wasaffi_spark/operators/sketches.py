"""Mergeable-sketch operators (Apache DataSketches, built into Spark 4).

THE scalable approximate-analytics pattern for a 100 TB corpus: compute
a small fixed-size sketch per shard/partition/day (one map-side-partial
aggregation each), persist the sketch BYTES, and answer queries later by
UNIONING sketches — never rescanning data. Distinct counts (HLL, theta),
quantiles (KLL) and set overlap (theta intersection) all follow the shape.

Everything here is a thin, typed composition of Spark's built-in
``*_sketch_*`` expressions — JVM-side, codegen, mergeable by
construction. The crucial algebraic property
(estimate(union(per-group sketches)) == estimate(whole set)) is pinned
by tests/test_sketches.py; cross-engine value equality is impossible
(sketch binaries and estimators are engine-specific), so these stay
rows-only at the driver's correctness gate by design.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SKETCH_COLS = ("hll", "theta", "kll")


def sketch_table(
    df: DataFrame,
    group_col: str,
    distinct_col: str,
    quantile_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """Per-group sketch state: HLL + theta (distincts) and KLL
    (quantiles) as binary columns — the persistable shard-level
    aggregate. One shuffle (the groupBy); each sketch is KB-sized
    regardless of group cardinality, so the reduce side never skews."""
    return df.groupBy(group_col).agg(
        F.hll_sketch_agg(distinct_col, F.lit(lg_k)).alias("hll"),
        F.theta_sketch_agg(distinct_col).alias("theta"),
        F.kll_sketch_agg_double(F.col(quantile_col).cast("double")).alias("kll"),
        F.count("*").alias("rows"),
    )


def estimate_per_group(sketches: DataFrame, quantiles=(0.5, 0.95)) -> DataFrame:
    """Readable estimates from a sketch table (group granularity)."""
    return sketches.select(
        *[c for c in sketches.columns if c not in _SKETCH_COLS],
        F.hll_sketch_estimate("hll").alias("distinct_hll"),
        F.round(F.theta_sketch_estimate("theta"), 1).alias("distinct_theta"),
        *[
            F.kll_sketch_get_quantile_double("kll", F.lit(q)).alias(
                f"p{int(q * 100)}"
            )
            for q in quantiles
        ],
    )


def rollup_estimates(sketches: DataFrame, quantiles=(0.5, 0.95)) -> DataFrame:
    """Union per-group sketches into ONE global estimate — the
    reaggregation step that makes sketch tables composable: daily
    sketches roll up to months without touching raw data. Merging
    reduces KB-sized states; the shuffle is O(groups), not O(rows)."""
    merged = sketches.agg(
        F.hll_union_agg("hll").alias("hll"),
        F.theta_union_agg("theta").alias("theta"),
        F.kll_merge_agg_double("kll").alias("kll"),
        F.sum("rows").alias("rows"),
    )
    return estimate_per_group(merged, quantiles)


def sketch_overlap(
    left: DataFrame, right: DataFrame, col: str
) -> DataFrame:
    """Estimated distinct-value overlap between two frames via theta
    set algebra: |L|, |R|, |L ∩ R|, |L ∖ R| — WITHOUT a join. Each side
    reduces to one KB-sized sketch (map-side partials, 1-row exchange);
    the set operations run driver-side on the two sketches. At 100 TB
    this replaces a distinct-join contamination check (full shuffle of
    both sides) with two scans and O(1) merge work."""
    ls = left.agg(F.theta_sketch_agg(col).alias("l"))
    rs = right.agg(F.theta_sketch_agg(col).alias("r"))
    both = ls.crossJoin(rs)
    return both.select(
        F.round(F.theta_sketch_estimate("l"), 1).alias("left_distinct"),
        F.round(F.theta_sketch_estimate("r"), 1).alias("right_distinct"),
        F.round(
            F.theta_sketch_estimate(F.theta_intersection("l", "r")), 1
        ).alias("overlap_est"),
        F.round(
            F.theta_sketch_estimate(F.theta_difference("l", "r")), 1
        ).alias("left_only_est"),
    )


# -- count-min sketch -------------------------------------------------------
# Unlike the DataSketches binaries above, this sketch is built from
# deterministic md5 hashing, so it is exactly reproducible across
# engines and gets a full DuckDB oracle (catalog: countmin_tokens).

CM_SEED = "cm-v1"
CM_DEPTH = 4
CM_WIDTH = 2048


def _cm_col(width: Column | int) -> Column:
    """Column index for (r, item): 24-bit md5 prefix mod width."""
    from .hashing import md5_prefix_int

    h = F.md5(F.concat_ws(":", F.lit(CM_SEED), F.col("r"), F.col("item")))
    return (md5_prefix_int(h, 6) % width).cast("int")


def countmin_table(
    df: DataFrame, item_col: str, depth: int = CM_DEPTH, width: int = CM_WIDTH
) -> DataFrame:
    """Count-min sketch as a ``(r, c, cnt, depth, width)`` cell table —
    approximate frequencies for a stream/corpus too large to count
    exactly. Point estimates overcount only (min over ``depth`` salted
    hash rows); error ≤ 2N/width with prob 1−2^−depth. The build
    parameters ride along as literal columns so downstream query/merge
    derive them from the sketch itself — a sketch probed with the wrong
    (depth, width) would silently UNDERcount, so the parameters are
    data, never a caller-supplied default.

    The sketch is ≤ depth×width rows REGARDLESS of corpus size — that is
    the 100 TB story: one explode (×depth, in-row) + one groupBy with
    map-side partials; persist the KB-sized cell table, never rescan.
    Merging shards/days = summing cells (:func:`countmin_merge`), exact
    by construction, so daily sketches roll up to months for free."""
    items = df.select(F.col(item_col).cast("string").alias("item"))
    cells = items.select(
        "item", F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("r")
    )
    return (
        cells.groupBy(F.col("r"), _cm_col(width).alias("c"))
        .agg(F.count("*").alias("cnt"))
        .select(
            "r", "c", "cnt",
            F.lit(depth).alias("depth"), F.lit(width).alias("width"),
        )
    )


def _cm_params(cells: DataFrame) -> DataFrame:
    """One-row (depth, width) frame derived from a cell table, with a
    plan-embedded ``assert_true`` that the table is not a mix of
    incompatible sketches (the failure mode is silent undercounting)."""
    agg = cells.agg(
        F.min("depth").alias("_d0"), F.max("depth").alias("_d1"),
        F.min("width").alias("_w0"), F.max("width").alias("_w1"),
    )
    ok = (F.col("_d0") == F.col("_d1")) & (F.col("_w0") == F.col("_w1"))
    # the guard lives INSIDE the kept `depth` column — a dropped
    # assert_true column would be pruned by the optimizer and never run
    guarded_depth = F.when(ok, F.col("_d0")).otherwise(
        F.raise_error(
            F.lit("count-min cells mix different (depth, width) sketches")
        ).cast("int")
    )
    return agg.select(
        guarded_depth.alias("depth"), F.col("_w0").alias("width")
    )


def countmin_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two cell tables: cell sums. merge(sketch(X), sketch(Y)) ==
    sketch(X ⊎ Y) exactly (pinned by test) — the mergeability that makes
    per-shard sketching safe. Merging sketches built with different
    (depth, width) raises at execution instead of silently undercounting."""
    u = a.unionByName(b)
    merged = u.groupBy("r", "c").agg(F.sum("cnt").alias("cnt"))
    return merged.crossJoin(F.broadcast(_cm_params(u)))


def countmin_query(
    sketch: DataFrame,
    candidates: DataFrame,
    item_col: str = "item",
) -> DataFrame:
    """Point-estimate frequencies for a candidate item set: ``min`` over
    the item's ``depth`` cells (0 if any cell is absent). (depth, width)
    come FROM the sketch's own columns — probing with mismatched
    parameters is therefore impossible by construction. The sketch side
    is ≤ depth×width rows → AQE broadcasts it; the probe is
    explode(×depth) + broadcast join + groupBy(item), so querying scales
    with the candidate set, not the corpus."""
    cand = candidates.select(
        F.col(item_col).cast("string").alias("item")
    ).distinct()
    probes = (
        cand.crossJoin(F.broadcast(_cm_params(sketch)))
        .select(
            "item", "width",
            F.explode(F.sequence(F.lit(0), F.col("depth") - 1)).alias("r"),
        )
        .withColumn("c", _cm_col(F.col("width")))
    )
    joined = probes.join(sketch.select("r", "c", "cnt"), ["r", "c"], "left")
    return joined.groupBy("item").agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cm_est")
    )


# ---------------------------------------------------------------------------
# Bloom filter as a mergeable bit-word table. Like the count-min cells
# above, bit positions come from deterministic md5 hashing, so the
# filter contents — including its false positives — are exactly
# reproducible across engines and get a full DuckDB oracle
# (catalog: bloom_dedup). The 100 TB use: a KB-sized "have we seen this
# hash" prefilter for incremental dedup — probe the filter first, pay
# the exact anti-join against the full seen-state only for the
# maybe-present slice (false-positive rate × new volume).

BF_SEED = "bf-v1"
BF_K = 4  # hash functions
BF_WORDS = 2048  # 32-bit words → m = 65536 bits
BF_WORD_BITS = 32  # 32 (not 64): 1 << 31 still fits a bigint unsigned,
#                    so Spark and SQL engines agree without sign games


def _bf_pos(words: Column | int) -> Column:
    """Bit position for (r, item): 24-bit md5 prefix mod (words*32)."""
    from .hashing import md5_prefix_int

    h = F.md5(F.concat_ws(":", F.lit(BF_SEED), F.col("r"), F.col("item")))
    m_bits = (F.lit(words) if isinstance(words, int) else words) * BF_WORD_BITS
    return md5_prefix_int(h, 6) % m_bits


def bloom_table(
    df: DataFrame, item_col: str, k: int = BF_K, words: int = BF_WORDS
) -> DataFrame:
    """Bloom filter as a ``(word, bits, k, words)`` table: ≤ ``words``
    rows regardless of corpus size. One in-row explode (×k) + one
    groupBy(word) with map-side partial ``bit_or`` — same build shape as
    :func:`countmin_table`. Parameters ride along as literal columns
    (self-describing, like the count-min cells: probing with foreign
    parameters would silently mis-answer, so they are data)."""
    items = df.select(F.col(item_col).cast("string").alias("item"))
    cells = items.select(
        "item", F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("r")
    )
    # F.shiftleft takes a literal shift count, so the per-row shift goes
    # through expr() over a named position column
    mask = F.expr(f"shiftleft(1L, cast(_p % {BF_WORD_BITS} as int))")
    return (
        cells.select(_bf_pos(words).alias("_p"))
        .select(
            F.shiftright(F.col("_p"), 5).cast("int").alias("word"),
            mask.alias("_m"),
        )
        .groupBy("word")
        .agg(F.bit_or("_m").alias("bits"))
        .select(
            "word", "bits", F.lit(k).alias("k"), F.lit(words).alias("words")
        )
    )


def _bf_params(bloom: DataFrame) -> DataFrame:
    """One-row (k, words) frame with the mixed-filter guard embedded in
    the kept column (the count-min `_cm_params` pattern)."""
    agg = bloom.agg(
        F.min("k").alias("_k0"), F.max("k").alias("_k1"),
        F.min("words").alias("_w0"), F.max("words").alias("_w1"),
    )
    ok = (F.col("_k0") == F.col("_k1")) & (F.col("_w0") == F.col("_w1"))
    guarded_k = F.when(ok, F.col("_k0")).otherwise(
        F.raise_error(
            F.lit("bloom words mix different (k, words) filters")
        ).cast("int")
    )
    return agg.select(guarded_k.alias("k"), F.col("_w0").alias("words"))


def bloom_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union of the underlying sets = per-word ``bit_or`` of the
    tables; merge(bloom(X), bloom(Y)) == bloom(X ∪ Y) exactly (pinned by
    test) — per-shard/per-day filters roll up for free."""
    u = a.unionByName(b)
    merged = u.groupBy("word").agg(F.bit_or("bits").alias("bits"))
    return merged.crossJoin(F.broadcast(_bf_params(u)))


def bloom_probe(
    bloom: DataFrame, candidates: DataFrame, item_col: str = "item"
) -> DataFrame:
    """Membership probe: ``(item, maybe_present)`` per distinct
    candidate. ``maybe_present = false`` is DEFINITE absence (the dedup
    fast path); ``true`` is present-or-false-positive (≈ (set bits /
    m)^k), to be confirmed by the exact anti-join on that slice only.
    (k, words) come from the filter's own columns; the filter side is ≤
    ``words`` rows → AQE broadcasts it, so probing scales with the
    candidate set, not the corpus."""
    cand = candidates.select(
        F.col(item_col).cast("string").alias("item")
    ).distinct()
    probes = (
        cand.crossJoin(F.broadcast(_bf_params(bloom)))
        .select(
            "item", "words",
            F.explode(F.sequence(F.lit(0), F.col("k") - 1)).alias("r"),
        )
        .select(
            "item",
            _bf_pos(F.col("words")).alias("_p"),
        )
        .select(
            "item",
            F.shiftright(F.col("_p"), 5).cast("int").alias("word"),
            F.expr(f"shiftleft(1L, cast(_p % {BF_WORD_BITS} as int))").alias(
                "_m"
            ),
        )
    )
    joined = probes.join(bloom.select("word", "bits"), "word", "left")
    hit = F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("_m")) == F.col("_m")
    return joined.groupBy("item").agg(F.min(hit).alias("maybe_present"))
