"""Round-13 operator tests: the drift→action controller (both index
families), the graph controller's oracled refresh loop retained, the
embedding_drift decimal accumulation lanes (no silent Σq² wrap), the
streamed compaction-journal replay, and the content-signature swap
verification in commit_compaction.

Reference parity: the reference (a ~700-line WASM-UDF POC,
wasaffi/src/lib.rs) has no maintenance/pipeline surface — these pin
the 100 TB extension semantics promised in SURVEY.md §2E/§7.6.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

needs_data = pytest.mark.skipif(
    not os.path.isdir(SF_SMOKE), reason="testdata not present"
)


# ------------------------------------------------ drift controller


def _planted_corpora(spark):
    """Old corpus: two tight clusters A/B. New corpus adds a SHIFTED
    cluster (the encoder-swap simulation) on a third axis that
    straddles the old A/B boundary — 18 lean-A points and 2 lean-B
    points — so the FROZEN 2-cell codebook splits it across cells and
    an n_probe=1 query from the lean-B side finds only 1 of its 3 true
    neighbours; the warm retrain re-unites the cluster in one cell."""
    old_rows = (
        [(i, [1.0, 0.0, 0.0, 0.0001 * i]) for i in range(20)]
        + [(100 + i, [0.0, 1.0, 0.0, 0.0001 * i]) for i in range(20)]
    )
    shift_rows = [
        (
            200 + j,
            [
                0.5 if j % 10 != 1 else 0.0,
                0.0 if j % 10 != 1 else 0.5,
                2.0,
                0.0001 * j,
            ],
        )
        for j in range(20)
    ]
    schema = "vec_id long, embedding array<double>"
    old = spark.createDataFrame(old_rows, schema)
    new = spark.createDataFrame(old_rows + shift_rows, schema)
    return old, new


@pytest.mark.slow
def test_apply_drift_policy_planted_shift_retrains_and_recovers(spark):
    """The full drift→retrain loop on a planted mean shift: the drift
    reading (~500k µu on the shifted dims) escalates past the retrain
    rung, the warm retrain applies, and the re-gauged recall RECOVERS
    — 3/3 hits where the frozen index scored 1/3 (measured in this
    fixture's design; the frozen number is asserted too, so the
    recovery claim is a comparison, not a constant)."""
    from wasaffi_spark.operators import serving, similarity
    from wasaffi_spark.operators.diff import embedding_drift

    old, new = _planted_corpora(spark)
    drift = embedding_drift(old, new)
    empty_del = spark.createDataFrame([], "vec_id long")
    queries = new.where(F.col("vec_id") == 201)
    truth = similarity.brute_force_topk(queries, new, k=3)

    # the degraded baseline the retrain must beat: frozen codebook
    batch = new.join(old.select("vec_id"), "vec_id", "left_anti")
    got_frozen = similarity.ivf_append_topk(
        queries, old, batch, k=3, n_cells=2, n_probe=1, iters=2, dim=4
    )
    frozen_hits = (
        similarity.recall_at_k(got_frozen.select("qid", "nid"), truth)
        .agg(F.sum("hits"))
        .first()[0]
    )
    assert frozen_hits == 1  # the planted split-cluster failure

    calls = []

    def retrain():
        calls.append(True)
        moves = similarity.ivf_retrain_delta(
            old, new, n_cells=2, iters=2, dim=4
        )
        got = similarity.ivf_retrained_topk(
            queries, old, new, empty_del, k=3, n_cells=2, n_probe=1,
            iters=2, dim=4,
        )
        gauge = similarity.recall_at_k(
            got.select("qid", "nid"), truth
        ).select("qid", "hits", F.lit(3).cast("bigint").alias("k"))
        return moves, gauge

    row = serving.apply_drift_policy(
        drift,
        retrain,
        {"drift_q": (50_000, 300_000)},
        recall_healthy_bp=9_000,
    ).first()
    assert calls, "retrain leg was not invoked"
    assert row["decision"] == "retrain"
    assert row["applied"] == "retrain"
    assert row["max_abs_drift_q"] >= 300_000
    assert row["n_moved"] is not None and row["n_moved"] > 0
    assert row["n_queries"] == 1 and row["k"] == 3
    # after-row recovery: 3/3 vs the frozen index's 1/3
    assert row["total_hits"] == 3
    assert row["recall_bp_after"] == 10_000
    assert row["outcome"] == "healthy"


def test_apply_drift_policy_noop_skips_apply(spark):
    """No material drift → noop, the apply leg never runs, and the
    recall lane is explicitly not_measured (NULLs, not zeros)."""
    from wasaffi_spark.operators import serving
    from wasaffi_spark.operators.diff import embedding_drift

    old, _ = _planted_corpora(spark)
    drift = embedding_drift(old, old)  # identical versions: zero drift

    def retrain():  # pragma: no cover - must not run
        raise AssertionError("apply leg ran on a noop decision")

    row = serving.apply_drift_policy(
        drift, retrain, {"drift_q": (1_000, 10_000)},
        recall_healthy_bp=9_000,
    ).first()
    assert row["decision"] == "noop"
    assert row["applied"] == "none"
    assert row["n_moved"] is None
    assert row["recall_bp_after"] is None
    assert row["outcome"] == "not_measured"


def test_apply_drift_policy_empty_gauge_is_no_reading(spark):
    """A broken (empty) drift gauge yields the explicit no_reading
    decision — never the retrain action (the serving-policy rule)."""
    from wasaffi_spark.operators import serving
    from wasaffi_spark.operators.diff import embedding_drift

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    drift = embedding_drift(empty, empty)

    def retrain():  # pragma: no cover - must not run
        raise AssertionError("apply leg ran on no_reading")

    row = serving.apply_drift_policy(
        drift, retrain, {"drift_q": (1, 2)}, recall_healthy_bp=9_000
    ).first()
    assert row["n_dims"] == 0
    assert row["decision"] == "no_reading"
    assert row["applied"] == "none"


def test_drift_policy_m2_lane_votes(spark):
    """A pure second-moment (spread) shift with an unmoved mean still
    escalates: the drift_m2_q lane votes independently of drift_q —
    the variance-blowup failure a mean-only ladder misses."""
    from wasaffi_spark.operators import serving
    from wasaffi_spark.operators.diff import embedding_drift

    # symmetric fan-out: means stay ~0, second moment explodes
    old = spark.createDataFrame(
        [(i, [0.001 * (1 if i % 2 else -1)]) for i in range(20)],
        "vec_id long, embedding array<double>",
    )
    new = spark.createDataFrame(
        [(i, [2.0 * (1 if i % 2 else -1)]) for i in range(20)],
        "vec_id long, embedding array<double>",
    )
    pol = serving.drift_maintenance_policy(
        embedding_drift(old, new),
        {
            "drift_q": (10_000_000, 20_000_000),  # mean lane: silent
            "drift_m2_q": (10_000, 1_000_000),
        },
    ).first()
    assert pol["max_abs_drift_q"] < 10_000_000  # mean barely moved
    assert pol["decision"] == "retrain"  # m2 lane escalated


@pytest.mark.slow
def test_apply_drift_policy_graph_family_refresh_flip(spark):
    """Drift symmetry for the graph family (VERDICT r12 #5): the SAME
    controller, actions renamed to the graph ladder, drives a
    graph_refresh on a planted drift — and with the drift below the
    rungs the refresh leg never runs (the flip)."""
    from wasaffi_spark.operators import serving, similarity
    from wasaffi_spark.operators.diff import embedding_drift

    old, new = _planted_corpora(spark)
    queries = new.where(F.col("vec_id") == 201)
    truth = similarity.brute_force_topk(queries, new, k=3)
    calls = []

    def refresh_leg():
        calls.append(True)
        graph = similarity.knn_descent(new, k=4, rounds=2, ring=2)
        g2 = similarity.graph_refresh(graph, new, k=4, rounds=1)
        got = similarity.graph_search_topk(
            queries, g2, new, k=3, beam=8, rounds=3, n_entry=2, ring=2
        )
        gauge = similarity.recall_at_k(got, truth).select(
            "qid", "hits", F.lit(3).cast("bigint").alias("k")
        )
        return None, gauge

    drift = embedding_drift(old, new)
    row = serving.apply_drift_policy(
        drift,
        refresh_leg,
        {"drift_q": (50_000, 300_000)},
        recall_healthy_bp=5_000,
        family="graph",
        actions=("noop", "recalibrate", "refresh"),
    ).first()
    assert calls and row["decision"] == "refresh"
    assert row["applied"] == "refresh"
    assert row["n_moved"] is None  # a refresh has no move plan
    assert row["outcome"] in ("healthy", "degraded")

    # the flip: same corpus pair, rungs far above the reading → noop
    calls.clear()
    row2 = serving.apply_drift_policy(
        drift,
        refresh_leg,
        {"drift_q": (10**9, 10**10)},
        recall_healthy_bp=5_000,
        family="graph",
        actions=("noop", "recalibrate", "refresh"),
    ).first()
    assert not calls and row2["decision"] == "noop"
    assert row2["applied"] == "none"


def test_drift_policy_rejects_unknown_threshold_key(spark):
    from wasaffi_spark.operators import serving

    d = spark.createDataFrame(
        [(0, 1, 1)], "dim int, drift_q long, drift_m2_q long"
    )
    with pytest.raises(ValueError, match="unknown gauge column"):
        serving.drift_maintenance_policy(d, {"nope": (1, 2)})
    with pytest.raises(ValueError, match="no thresholds"):
        serving.drift_maintenance_policy(d, {})


# ------------------------------------------------ drift gauge overflow


def test_embedding_drift_sum_sq_lane_does_not_wrap(spark):
    """VERDICT r12 What's-wrong #1 / Next-round #3: 1.1M rows of value
    3.0 at quant=10⁶ put Σq² at 9.9e18 > 2⁶³ — a bigint lane wraps
    silently on a non-ANSI session; the decimal(38,0) lanes stay exact
    and the emitted per-row mean is the exact 9e12."""
    n = 1_100_000
    df = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(3.0)).alias("embedding"),
    )
    from wasaffi_spark.operators.diff import embedding_drift

    row = embedding_drift(df, df).first()
    assert row["n_old"] == n and row["n_new"] == n
    assert row["m2_q_old"] == 9_000_000_000_000  # (3e6)² exactly
    assert row["m2_q_new"] == 9_000_000_000_000
    assert row["drift_m2_q"] == 0 and row["drift_q"] == 0
    assert row["mean_q_old"] == 3_000_000


# ------------------------------------------------ compaction journal


@pytest.mark.slow
def test_heal_compaction_streams_large_journal(spark, tmp_path):
    """A committed journal with tens of thousands of ops replays
    streamed (seq-ordered toLocalIterator) and completes: every move
    already executed (src gone, dst present — the idempotent case),
    every delete already gone. Pins the r13 JSONL format end to end
    at a size where a single collected string would be the old
    failure shape."""
    from wasaffi_spark.operators.layout import heal_compaction

    table = tmp_path / "tbl"
    table.mkdir()
    dst = table / "compacted-bin0-part-0.parquet"
    spark.range(3).coalesce(1).write.mode("overwrite").parquet(str(dst))
    n_moves, n_deletes = 20_000, 10_000
    ops = [
        (i, "move", str(table / f"gone-{i}.parquet"), str(dst), None)
        for i in range(n_moves)
    ] + [
        (n_moves + i, "delete", None, None,
         str(table / f"victim-{i}.parquet"))
        for i in range(n_deletes)
    ]
    jdir = str(table / "_compact_journal")
    spark.createDataFrame(
        ops, "seq bigint, op string, src string, dst string, path string"
    ).coalesce(1).write.mode("overwrite").json(jdir)
    assert heal_compaction(spark, str(table)) == "completed"
    assert not os.path.exists(jdir)
    # the table content survived untouched
    assert spark.read.parquet(str(dst)).count() == 3


def test_heal_compaction_replays_legacy_single_record_journal(
    spark, tmp_path
):
    """A pre-r13 journal (one {"moves": ..., "deletes": ...} record)
    still rolls forward: the healer detects the legacy shape and
    replays it whole."""
    import json

    from wasaffi_spark.operators.layout import heal_compaction

    table = tmp_path / "tbl"
    table.mkdir()
    src = table / "staged.parquet"
    spark.range(4).coalesce(1).write.mode("overwrite").parquet(str(src))
    dst = table / "compacted-bin0-staged.parquet"
    victim = table / "old-small.parquet"
    spark.range(2).coalesce(1).write.mode("overwrite").parquet(str(victim))
    journal = json.dumps(
        {"moves": [[str(src), str(dst)]], "deletes": [str(victim)]}
    )
    spark.createDataFrame([(journal,)], "value string").coalesce(
        1
    ).write.mode("overwrite").text(str(table / "_compact_journal"))
    assert heal_compaction(spark, str(table)) == "completed"
    assert os.path.exists(dst) and not os.path.exists(src)
    assert not os.path.exists(victim)
    assert spark.read.parquet(str(dst)).count() == 4


def test_commit_compaction_detects_same_count_content_swap(
    spark, tmp_path
):
    """ADVICE r12: a stale staged output whose row COUNT coincidentally
    matches the plan must not swap in — the content-signature lanes
    catch a value rewrite the old count-only verification passed."""
    import glob

    import pyarrow.parquet as pq

    from wasaffi_spark.operators.layout import (
        commit_compaction,
        compact_small_files,
    )

    src = str(tmp_path / "tbl")
    out = str(tmp_path / "staged")
    for i in range(3):
        spark.range(i * 10, i * 10 + 10).withColumn(
            "v", F.col("id") * 2
        ).coalesce(1).write.mode("append").parquet(src)
    compact_small_files(spark, src, target_bytes=10**9, out_dir=out)
    # corrupt one staged file IN PLACE: same row count, one value off
    victim = sorted(
        glob.glob(os.path.join(out, "**", "*.parquet"), recursive=True)
    )[0]
    t = pq.read_table(victim)
    vs = t.column("v").to_pylist()
    vs[0] += 1
    import pyarrow as pa

    pq.write_table(
        pa.table({"id": t.column("id"), "v": pa.array(vs, pa.int64())}),
        victim,
    )
    # drop the local-FS checksum sidecar: the rewrite invalidated it,
    # and a ChecksumException would mask the verification under test
    crc = os.path.join(
        os.path.dirname(victim), f".{os.path.basename(victim)}.crc"
    )
    if os.path.exists(crc):
        os.remove(crc)
    with pytest.raises(ValueError, match="refusing to swap"):
        commit_compaction(spark, src, target_bytes=10**9, out_dir=out)
    # zero table mutation: all 30 original rows still served
    assert spark.read.parquet(src).count() == 30


# ------------------------------------------------ retrained search


def test_ivf_retrained_topk_empty_delta_matches_frozen(spark):
    """When base == full (no new data), the warm retrain's extra Lloyd
    rounds may move centroids but the retrain DELTA on an undrifted
    tight fixture is small and search stays exact on the planted
    clusters — sanity that the retrained searcher is a drop-in for the
    frozen one on stable corpora."""
    from wasaffi_spark.operators import similarity

    old, _ = _planted_corpora(spark)
    empty_del = spark.createDataFrame([], "vec_id long")
    queries = old.where(F.col("vec_id") == 0)
    truth = similarity.brute_force_topk(queries, old, k=3)
    got = similarity.ivf_retrained_topk(
        queries, old, old, empty_del, k=3, n_cells=2, n_probe=1,
        iters=2, dim=4,
    )
    hits = (
        similarity.recall_at_k(got.select("qid", "nid"), truth)
        .agg(F.sum("hits"))
        .first()[0]
    )
    assert hits == 3  # tight cluster, perfect recall
