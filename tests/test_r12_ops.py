"""Round-12 operator tests: the decision→action→outcome policy loop,
crash-safe compaction commit, clip-level video copy detection, frozen
(grandfathered) split assignments + drift reporting, the replay-safe
vacuum default, and the frame-slice overflow guard.

Reference parity: the reference (a ~700-line WASM-UDF POC,
wasaffi/src/lib.rs) has no maintenance/pipeline surface — these pin
the 100 TB extension semantics promised in SURVEY.md §2E/§7.6.
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

needs_data = pytest.mark.skipif(
    not os.path.isdir(SF_SMOKE), reason="testdata not present"
)


# ------------------------------------------------ commit_compaction


def _mk_table(spark, src: str, hive: bool = True) -> list[tuple]:
    """Small-file table fixture; hive variant uses a ZERO-PADDED
    partition value so the string-preservation contract is pinned."""
    for part in ("01", "02") if hive else ("",):
        for i in range(3):
            df = spark.range(i * 10, i * 10 + 10).withColumn(
                "v", F.col("id") * 2
            )
            w = df.coalesce(1).write.mode("append")
            w.parquet(os.path.join(src, f"k={part}") if hive else src)
    return sorted(
        (r.id, r.v) for r in spark.read.parquet(src).select("id", "v").collect()
    )


def _table_rows(spark, src: str) -> list[tuple]:
    return sorted(
        (r.id, r.v) for r in spark.read.parquet(src).select("id", "v").collect()
    )


def test_commit_compaction_end_to_end(spark, tmp_path):
    """Stage → verify → journal → swap: after commit the table holds
    the same rows in one packed file per (partition, bin), the
    originals are gone, the journal is gone, and the zero-padded hive
    value k=01 survives VERBATIM (ADVICE r11: no int round-trip)."""
    from wasaffi_spark.operators.layout import (
        commit_compaction,
        compact_small_files,
    )

    src = str(tmp_path / "tbl")
    want = _mk_table(spark, src)
    files = glob.glob(os.path.join(src, "k=*", "*.parquet"))
    target = 10 * max(os.stat(p).st_size for p in files)
    out = str(tmp_path / "staged")
    compact_small_files(spark, src, target, out)
    # the staging output reproduces the source k=v names verbatim
    assert sorted(
        os.path.basename(d) for d in glob.glob(os.path.join(out, "k=*"))
    ) == ["k=01", "k=02"]
    res = commit_compaction(spark, src, target, out)
    assert res == {
        "healed": "none", "moved": 2, "deleted": 6, "skipped": False
    }
    assert _table_rows(spark, src) == want
    for part in ("k=01", "k=02"):
        got = glob.glob(os.path.join(src, part, "*.parquet"))
        assert len(got) == 1 and "compacted-bin0" in got[0]
    assert not os.path.exists(os.path.join(src, "_compact_journal"))


@pytest.mark.slow
def test_commit_compaction_crash_matrix(spark, tmp_path, monkeypatch):
    """Kill points across the swap: pre-journal and uncommitted-journal
    crashes ROLL BACK (table bit-untouched); any crash after the
    journal committed ROLLS FORWARD via heal_compaction — mid-moves,
    between moves and deletes, and mid-deletes all heal to the
    exactly-once compacted table. At every point the healed table
    holds exactly the original rows (never mixed/duplicated)."""
    from wasaffi_spark.operators import layout

    def fresh(tag):
        src = str(tmp_path / f"tbl_{tag}")
        want = _mk_table(spark, src)
        files = glob.glob(os.path.join(src, "k=*", "*.parquet"))
        target = 10 * max(os.stat(p).st_size for p in files)
        out = str(tmp_path / f"staged_{tag}")
        layout.compact_small_files(spark, src, target, out)
        return src, target, out, want

    real_exec = layout._execute_compaction_journal

    # --- roll-forward kill points: crash after N moves + M deletes
    for tag, n_moves, n_deletes in (
        ("m0", 0, 0), ("m1", 1, 0), ("m2", 2, 0), ("d1", 2, 3)
    ):
        src, target, out, want = fresh(tag)

        def boom(spark_, journal, nm=n_moves, nd=n_deletes):
            real_exec(
                spark_,
                {
                    "moves": journal["moves"][:nm],
                    "deletes": journal["deletes"][:nd],
                },
            )
            raise RuntimeError("injected crash")

        monkeypatch.setattr(layout, "_execute_compaction_journal", boom)
        with pytest.raises(RuntimeError, match="injected crash"):
            layout.commit_compaction(spark, src, target, out)
        monkeypatch.setattr(
            layout, "_execute_compaction_journal", real_exec
        )
        assert layout.heal_compaction(spark, src) == "completed"
        assert _table_rows(spark, src) == want
        assert len(glob.glob(os.path.join(src, "k=*", "*.parquet"))) == 2
        assert layout.heal_compaction(spark, src) == "none"  # idempotent

    # --- rollback kill point: journal written but NOT committed
    src, target, out, want = fresh("rb")
    jdir = os.path.join(src, "_compact_journal")
    os.makedirs(jdir)
    with open(os.path.join(jdir, "part-00000.txt"), "w") as f:
        f.write('{"moves": [], "deletes": []}')
    # no _SUCCESS → pre-commit-point → discard, table untouched
    assert layout.heal_compaction(spark, src) == "rolled_back"
    assert not os.path.exists(jdir)
    assert _table_rows(spark, src) == want
    assert len(glob.glob(os.path.join(src, "k=*", "*.parquet"))) == 6


def test_commit_compaction_verify_refuses_bad_staging(spark, tmp_path):
    """The read-back verification gate: stale/partial staging output
    (one packed file missing) raises with ZERO table mutation."""
    import shutil

    from wasaffi_spark.operators import layout

    src = str(tmp_path / "tbl")
    want = _mk_table(spark, src)
    files = glob.glob(os.path.join(src, "k=*", "*.parquet"))
    target = 10 * max(os.stat(p).st_size for p in files)
    out = str(tmp_path / "staged")
    layout.compact_small_files(spark, src, target, out)
    shutil.rmtree(os.path.join(out, "k=02"))
    with pytest.raises(ValueError, match="refusing to swap"):
        layout.commit_compaction(spark, src, target, out)
    assert _table_rows(spark, src) == want
    assert len(glob.glob(os.path.join(src, "k=*", "*.parquet"))) == 6


# --------------------------------------- vacuum_set_state safe default


def test_vacuum_set_state_autodiscovers_checkpoint(spark, tmp_path):
    """The bare call on a sink-layout state dir picks up the sibling
    ``_checkpoint`` automatically (VERDICT r11 wrong #1): only batches
    the checkpoint committed fold; the pending one keeps its
    partition. With no discoverable checkpoint the call raises unless
    ``unsafe_fold_all=True`` is explicit."""
    from wasaffi_spark.streaming.state import seed_state, vacuum_set_state

    state_dir = str(tmp_path / "sink")
    table = os.path.join(state_dir, "state")
    seed_state(
        spark,
        os.path.join(table, "batch_id=-1"),
        spark.createDataFrame([], "h string"),
    )
    for b in (0, 1, 2):
        spark.createDataFrame([(f"h{b}",)], "h string").write.parquet(
            os.path.join(table, f"batch_id={b}")
        )
    # checkpoint committed batches 0,1 — batch 2 is pending replay
    os.makedirs(os.path.join(state_dir, "_checkpoint", "commits"))
    for b in (0, 1):
        with open(
            os.path.join(state_dir, "_checkpoint", "commits", str(b)), "w"
        ) as f:
            f.write("v1")
    folded = vacuum_set_state(spark, table)
    assert folded == 2
    parts = sorted(
        os.path.basename(p)
        for p in glob.glob(os.path.join(table, "batch_id=*"))
    )
    assert parts == ["batch_id=-1", "batch_id=2"]
    assert sorted(
        r.h for r in spark.read.parquet(table).collect()
    ) == ["h0", "h1", "h2"]

    # no checkpoint anywhere → loud, not a silent full fold
    bare = str(tmp_path / "bare" / "state")
    seed_state(
        spark,
        os.path.join(bare, "batch_id=-1"),
        spark.createDataFrame([], "h string"),
    )
    spark.createDataFrame([("x",)], "h string").write.parquet(
        os.path.join(bare, "batch_id=0")
    )
    with pytest.raises(ValueError, match="unsafe_fold_all"):
        vacuum_set_state(spark, bare)
    assert vacuum_set_state(spark, bare, unsafe_fold_all=True) == 1


# ------------------------------------------- policy applied (the loop)


@needs_data
@pytest.mark.slow
def test_policy_applied_flip(spark):
    """The controller's before row reads degraded (raise_n_probe) at
    n_probe=1 and the after row — the APPLIED raise — crosses the
    healthy threshold (noop): decision→action→outcome, measured."""
    from wasaffi_spark.operators.catalog import (
        PA_HEALTHY_BP,
        q_policy_applied,
    )

    rows = {r["phase"]: r for r in q_policy_applied(spark, SF_SMOKE).collect()}
    b, a = rows["before"], rows["after"]
    assert b["n_probe"] == 1 and b["decision"] == "raise_n_probe"
    assert b["recall_bp"] < PA_HEALTHY_BP
    assert a["n_probe"] == 2 and a["decision"] == "noop"
    assert a["recall_bp"] >= PA_HEALTHY_BP
    assert a["recall_bp"] > b["recall_bp"]


def test_apply_ivf_policy_noop_leaves_knob(spark):
    """A healthy reading applies nothing: the after phase replays the
    same n_probe and the gauge only runs for the two phases (no hidden
    extra executions)."""
    from wasaffi_spark.operators.serving import apply_ivf_policy

    calls = []

    def gauge(n_probe):
        calls.append(n_probe)
        return spark.createDataFrame(
            [(q, 3, 3) for q in range(4)], "qid bigint, hits int, k int"
        )

    out = apply_ivf_policy(gauge, 2, (9000, 4000)).collect()
    assert [r["phase"] for r in out] == ["before", "after"]
    assert [r["n_probe"] for r in out] == [2, 2]
    assert all(r["decision"] == "noop" for r in out)
    # noop applies nothing, so the deterministic gauge runs ONCE — the
    # after row is the before reading relabeled, not a second O(Q·N)
    # pass
    assert calls == [2]


def test_policy_empty_monitor_is_no_reading(spark):
    """A broken/empty gauge must not buy the floor action (ADVICE
    r11): NULL reading → explicit 'no_reading'."""
    from wasaffi_spark.operators.serving import index_maintenance_policy

    empty = spark.createDataFrame([], "qid bigint, hits int, k int")
    row = index_maintenance_policy(
        {"ivf": empty}, {"ivf": (9000, 4000)}
    ).first()
    assert row["decision"] == "no_reading"
    assert row["recall_bp"] is None


# ---------------------------------------- bundle manifest back-compat


def test_bundle_legacy_manifest_without_sum_lane(spark, tmp_path):
    """A bundle exported before the modular-sum lane (no content_sum
    column) still verifies on (n_rows, content_sig) — and still FAILS
    loudly on content corruption (ADVICE r11). bundle_diff between a
    legacy and a current manifest compares on the shared lanes."""
    from wasaffi_spark.operators import serving

    df = spark.createDataFrame([(1, "x"), (2, "y")], "id bigint, v string")
    bundle = str(tmp_path / "b1")
    serving.export_index_bundle(spark, bundle, {"postings": df})

    def legacyize(b):
        # rewrite the manifest WITHOUT the sum lane (pre-r11 format);
        # collect first — overwriting a path Spark is lazily reading
        # from would race the scan
        rows = (
            spark.read.parquet(os.path.join(b, "MANIFEST"))
            .drop("content_sum")
            .collect()
        )
        spark.createDataFrame(
            rows, "component string, n_rows bigint, content_sig bigint"
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(b, "MANIFEST")
        )

    legacyize(bundle)
    got = serving.read_index_bundle(spark, bundle)
    assert got["postings"].count() == 2

    # corruption still caught on the legacy path (xor/count lanes)
    import shutil

    spark.createDataFrame(
        [(1, "x")], "id bigint, v string"
    ).write.mode("overwrite").parquet(os.path.join(bundle, "postings_t"))
    shutil.rmtree(os.path.join(bundle, "postings"))
    shutil.move(
        os.path.join(bundle, "postings_t"), os.path.join(bundle, "postings")
    )
    with pytest.raises(serving.BundleIntegrityError, match="postings"):
        serving.read_index_bundle(spark, bundle)

    # diff: legacy vs current manifests — same content reads unchanged
    b2 = str(tmp_path / "b2")
    serving.export_index_bundle(spark, b2, {"postings": df})
    b3 = str(tmp_path / "b3")
    serving.export_index_bundle(spark, b3, {"postings": df})
    legacyize(b3)
    d = {r["component"]: r["status"] for r in
         serving.bundle_diff(spark, b3, b2).collect()}
    assert d == {"postings": "unchanged"}


# --------------------------------------------- video copy detection


def _clip(frames: list[int], frame_bytes: int = 8) -> bytes:
    """Deterministic synthetic clip whose per-frame 16-segment aHash
    IS the frame id: over an 8-byte frame only the odd segments are
    non-empty, and bit i of the hash reduces to byte_i·8 > total —
    encoding v = j+3 as bytes (100 if bit set else 10) makes every
    distinct frame id a distinct signature (and hamming >= 1 apart),
    so identical frames match exactly and nothing else does."""
    out = bytearray()
    for j in frames:
        v = j + 3
        assert 1 <= v <= 254, "frame id out of the distinct-profile range"
        for i in range(frame_bytes):
            out.append(100 if (v >> i) & 1 else 10)
    return bytes(out)


def test_video_neardup_planted_clips(spark):
    """Planted matrix: an identical clip matches at offset 0 with
    match_bp=10000; a truncated copy (prefix) fully matches the
    shorter side; a frame-shifted copy matches at the shift offset;
    a disjoint clip matches nothing."""
    from wasaffi_spark.operators.multimodal import video_neardup_pairs

    fb = 8
    base = list(range(12))
    rows = [
        (1, _clip(base, fb)),             # the original
        (2, _clip(base, fb)),             # identical copy
        (3, _clip(base[:7], fb)),         # truncated prefix copy
        (4, _clip(base[3:], fb)),         # dropped the first 3 frames
        (5, _clip([90 + j for j in base], fb)),  # disjoint content
    ]
    media = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    got = video_neardup_pairs(
        media,
        frame_bytes=fb,
        stride_frames=1,
        n_segments=16,
        bands=2,
        max_hamming=0,
        min_matched_frames=2,
    )
    by_pair = {(r.id_a, r.id_b): r for r in got.collect()}
    assert set(by_pair) >= {(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)}
    assert not any(5 in p for p in by_pair)
    full = by_pair[(1, 2)]
    assert (full.offset_frames, full.n_matched, full.match_bp) == (0, 12, 10000)
    trunc = by_pair[(1, 3)]
    assert (trunc.offset_frames, trunc.n_matched, trunc.match_bp) == (0, 7, 10000)
    shift = by_pair[(1, 4)]
    # clip 4's frame i is clip 1's frame i+3 → best offset = -3
    assert (shift.offset_frames, shift.n_matched) == (-3, 9)
    assert shift.match_bp == 10000  # all 9 of the shorter clip align


def test_video_neardup_requires_temporal_agreement(spark):
    """A bag-of-frames impostor — the same frames in scrambled order —
    cannot reach min_matched on any SINGLE offset, so temporal voting
    rejects what a frame-set rollup would accept."""
    from wasaffi_spark.operators.multimodal import video_neardup_pairs

    fb = 8
    base = list(range(8))
    scrambled = [3, 7, 1, 6, 0, 4, 2, 5]
    # pin the premise: no single shift aligns 3+ frames of the scramble
    from collections import Counter

    offs = Counter(scrambled[i] - i for i in range(8))
    assert max(offs.values()) == 2
    media = spark.createDataFrame(
        [(1, _clip(base, fb)), (2, _clip(scrambled, fb))],
        "doc_id bigint, payload binary",
    )
    got = video_neardup_pairs(
        media, frame_bytes=fb, stride_frames=1, n_segments=16,
        bands=2, max_hamming=0, min_matched_frames=3,
    ).collect()
    assert got == []


# ------------------------------------------ frame-slice overflow guard


def test_frame_slice_overflow_raises_not_truncates(spark):
    """A frame offset past INT_MAX raises loudly instead of silently
    wrapping the slice position (VERDICT r11 wrong #2) — pinned with a
    synthetic frame_idx, not a real 2 GiB payload."""
    from wasaffi_spark.operators.multimodal import _frame_slice_expr

    df = spark.createDataFrame(
        [(b"abcdefgh", 0), (b"abcdefgh", 9_000_000)],
        "payload binary, frame_idx bigint",
    )
    ok = df.where(F.col("frame_idx") == 0).select(
        _frame_slice_expr("payload", 4).alias("s")
    ).first()
    assert ok["s"] == b"abcd"
    with pytest.raises(Exception, match="2 GiB binary bound"):
        df.select(_frame_slice_expr("payload", 256).alias("s")).collect()


# ------------------------------------- frozen splits + drift reporting


def _docs(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "doc_id bigint")


def _pairs(spark, pairs):
    return spark.createDataFrame(
        list(pairs) or [(None, None)], "id_a bigint, id_b bigint"
    ).where(F.col("id_a").isNotNull())


def test_cluster_safe_split_freeze_blocks_migration(spark):
    """A planted bridging doc merges two v1 clusters: the unfrozen
    re-split migrates the cluster (min-id label flips 23 → 0, split
    'val' → 'train'), the FROZEN re-split flips ZERO grandfathered
    assignments and the new doc inherits its cluster's grandfathered
    split (never hashes into a conflicting one)."""
    from wasaffi_spark.operators.pipeline import cluster_safe_split

    v1_docs, v2_docs = [23, 24, 30], [0, 23, 24, 30]
    old = {
        r.doc_id: r
        for r in cluster_safe_split(
            _docs(spark, v1_docs), _pairs(spark, [(23, 24)])
        ).collect()
    }
    assert old[23].split == "val" and old[24].split == "val"
    assert old[23].cluster_id == 23

    v2_pairs = _pairs(spark, [(0, 23), (23, 24)])
    unfrozen = {
        r.doc_id: r
        for r in cluster_safe_split(
            _docs(spark, v2_docs), v2_pairs
        ).collect()
    }
    # the naive re-split MIGRATES the surviving cluster members
    assert unfrozen[23].cluster_id == 0
    assert unfrozen[23].split == "train" != old[23].split

    prior = spark.createDataFrame(
        [(i, r.split) for i, r in old.items()], "doc_id bigint, split string"
    )
    frozen = {
        r.doc_id: r
        for r in cluster_safe_split(
            _docs(spark, v2_docs), v2_pairs, prior=prior
        ).collect()
    }
    assert all(frozen[i].split == old[i].split for i in v1_docs)
    # the new bridging doc inherits the grandfathered cluster split —
    # NOT its own hash (which would be 'train', leaking against 23/24)
    assert frozen[0].split == "val"


def test_split_drift_matrices(spark):
    """split_drift: the unfrozen transition matrix shows the
    migration; the frozen one is diagonal for every surviving doc and
    reports fresh arrivals as (absent) → split."""
    from wasaffi_spark.operators.pipeline import (
        cluster_safe_split,
        split_drift,
    )

    v1, v2 = [23, 24, 30], [0, 23, 24, 30]
    old = cluster_safe_split(_docs(spark, v1), _pairs(spark, [(23, 24)]))
    p2 = _pairs(spark, [(0, 23), (23, 24)])
    unfrozen = cluster_safe_split(_docs(spark, v2), p2)
    frozen = cluster_safe_split(_docs(spark, v2), p2, prior=old)

    du = {(r.old_split, r.new_split): r.n_docs
          for r in split_drift(old, unfrozen).collect()}
    assert du[("val", "train")] == 2          # the migration, visible
    assert du[("(absent)", "train")] == 1     # the bridging arrival
    df_ = {(r.old_split, r.new_split): r.n_docs
           for r in split_drift(old, frozen).collect()}
    assert ("val", "train") not in df_        # frozen: zero migrations
    assert df_[("val", "val")] == 2
    assert df_[("(absent)", "val")] == 1      # arrival inherited 'val'
    # dropped-doc reporting: v2 missing a v1 doc shows (absent) new
    dropped = {(r.old_split, r.new_split): r.n_docs
               for r in split_drift(
                   old, cluster_safe_split(
                       _docs(spark, [23, 24]), _pairs(spark, [(23, 24)])
                   )
               ).collect()}
    # doc 30 (split_label(30) = 'train') left the corpus
    assert dropped[("train", "(absent)")] == 1


# --------------------------------------------- embedding drift gauge


def test_embedding_drift_planted_shift(spark):
    """A planted mean shift on one dimension reads as exactly that
    dimension's drift_q (micro-units); untouched dimensions read 0 on
    identical corpora. The second-moment lane sees a variance-only
    change the mean lane misses."""
    from wasaffi_spark.operators.diff import embedding_drift

    base = [(i, [0.25, -0.5, 1.0]) for i in range(8)]
    old = spark.createDataFrame(base, "vec_id bigint, embedding array<double>")
    drift0 = {r.dim: r for r in embedding_drift(old, old).collect()}
    assert [drift0[d].drift_q for d in range(3)] == [0, 0, 0]
    assert [drift0[d].drift_m2_q for d in range(3)] == [0, 0, 0]
    assert drift0[0].mean_q_old == 250_000 and drift0[1].mean_q_old == -500_000

    shifted = spark.createDataFrame(
        [(i, [0.25, -0.5 + 0.125, 1.0]) for i in range(8)],
        "vec_id bigint, embedding array<double>",
    )
    d1 = {r.dim: r for r in embedding_drift(old, shifted).collect()}
    assert d1[1].drift_q == 125_000
    assert d1[0].drift_q == 0 and d1[2].drift_q == 0

    # variance-only change: half the rows +x, half -x → mean intact,
    # second moment up by x²·quant² / quant... in m2 micro-unit² terms
    spread = spark.createDataFrame(
        [(i, [0.25, -0.5 + (0.25 if i % 2 else -0.25), 1.0])
         for i in range(8)],
        "vec_id bigint, embedding array<double>",
    )
    d2 = {r.dim: r for r in embedding_drift(old, spread).collect()}
    assert d2[1].drift_q == 0                     # mean lane blind
    assert d2[1].drift_m2_q == 62_500_000_000     # (0.25·10⁶)² lane sees it
    assert d2[0].drift_m2_q == 0


# ----------------------------------------- graph controller (state-passing)


def test_apply_graph_policy_refresh_flip(spark):
    """The graph controller's degraded reading triggers the refresh,
    the gauge re-runs over the REFRESHED state, and the after row
    crosses the healthy line — decision→action→outcome for the graph
    family (state-passing twin of apply_ivf_policy)."""
    from wasaffi_spark.operators.serving import apply_graph_policy

    gauged, refreshed = [], []

    def gauge(state):
        gauged.append(state)
        hits = {"degraded": 1, "warm": 3}[state]
        return spark.createDataFrame(
            [(q, hits, 3) for q in range(4)], "qid bigint, hits int, k int"
        )

    def refresh(state):
        refreshed.append(state)
        return "warm"

    report, final = apply_graph_policy(
        gauge, "degraded", refresh, thresholds=(9000, 3000)
    )
    rows = {r["phase"]: r for r in report.collect()}
    assert final == "warm" and refreshed == ["degraded"]
    assert gauged == ["degraded", "warm"]  # once per phase, no extras
    b, a = rows["before"], rows["after"]
    assert (b["applied"], b["decision"]) == ("none", "refresh")
    assert b["recall_bp"] == 3333 < 9000
    assert (a["applied"], a["decision"]) == ("refresh", "noop")
    assert a["recall_bp"] == 10000 >= 9000


def test_apply_graph_policy_floor_without_rebuild_hook(spark):
    """A collapsed reading decides 'rebuild', but with no rebuild
    callable the controller reports it and applies NOTHING (a cold
    rebuild is a scheduled job, not an inline side effect); the state
    passes through untouched."""
    from wasaffi_spark.operators.serving import apply_graph_policy

    def gauge(state):
        return spark.createDataFrame(
            [(q, 0, 3) for q in range(4)], "qid bigint, hits int, k int"
        )

    report, final = apply_graph_policy(
        gauge, "g0", refresh=lambda s: (_ for _ in ()).throw(AssertionError),
        thresholds=(9000, 3000),
    )
    rows = {r["phase"]: r for r in report.collect()}
    assert final == "g0"
    assert rows["before"]["decision"] == "rebuild"
    assert rows["after"]["applied"] == "none"
