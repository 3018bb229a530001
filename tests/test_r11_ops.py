"""Round-11 operator tests: partition-aware small-file compaction,
strengthened bundle signatures, replay-safe state vacuum, and the
gauge→action index-maintenance policy.

Reference parity: the reference (a ~700-line WASM-UDF POC,
wasaffi/src/lib.rs) has no index/maintenance surface — these pin the
100 TB-pipeline extension semantics promised in SURVEY.md §2E/§7.6.
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


# --------------------------------------------- compact_small_files r11


def test_compact_small_files_hive_partitioned(spark, tmp_path):
    """A hive-partitioned (k=v directory) table compacts WITHIN each
    partition: bins never straddle partition directories, the
    directory-derived partition column survives into the output data
    (basePath read), and the output reproduces the k=v layout."""
    from wasaffi_spark.operators.layout import compact_small_files

    src = str(tmp_path / "src")
    for part in (0, 1):
        for i in range(4):
            (
                spark.range(part * 1000 + i * 10, part * 1000 + i * 10 + 10)
                .withColumn("v", F.col("id") * 2)
                .withColumn("batch_id", F.lit(part))
                .coalesce(1)
                .write.mode("append")
                .partitionBy("batch_id")
                .parquet(src)
            )
    files = glob.glob(os.path.join(src, "batch_id=*", "*.parquet"))
    assert len(files) == 8
    target = 4 * max(os.stat(p).st_size for p in files)  # all pack

    out = str(tmp_path / "out")
    plan = compact_small_files(spark, src, target, out)
    rows = plan.collect()
    assert all(r.action == "pack" for r in rows)
    # partition key derived from the directory, never ''
    assert {r.part for r in rows} == {"batch_id=0", "batch_id=1"}
    # bins are per-partition: files of different partitions may share a
    # bin NUMBER but never an output file/directory
    for part in ("batch_id=0", "batch_id=1"):
        part_bins = sorted({r.bin for r in rows if r.part == part})
        for b in part_bins:
            d = os.path.join(out, part, f"bin={b}")
            assert len(glob.glob(os.path.join(d, "*.parquet"))) == 1
    # every row survives, with its partition column intact
    got = spark.read.parquet(out)
    assert "batch_id" in got.columns
    want = spark.read.parquet(src)
    assert sorted(
        (r.id, r.v, r.batch_id)
        for r in got.select("id", "v", "batch_id").collect()
    ) == sorted(
        (r.id, r.v, r.batch_id)
        for r in want.select("id", "v", "batch_id").collect()
    )


def test_compact_small_files_deep_nesting_found(spark, tmp_path):
    """Files two+ directory levels deep are in the manifest (recursive
    walk — the old one-level glob missed them silently)."""
    from wasaffi_spark.operators.layout import compact_small_files

    src = str(tmp_path / "src")
    (
        spark.range(0, 20)
        .withColumn("v", F.col("id"))
        .withColumn("a", F.lit(1))
        .withColumn("b", F.lit(2))
        .coalesce(1)
        .write.partitionBy("a", "b")
        .parquet(src)
    )
    deep = glob.glob(os.path.join(src, "a=1", "b=2", "*.parquet"))
    assert len(deep) == 1
    out = str(tmp_path / "out")
    plan = compact_small_files(spark, src, 10 * os.stat(deep[0]).st_size, out)
    rows = plan.collect()
    assert [r.path for r in rows] == deep
    assert rows[0].part == os.path.join("a=1", "b=2")
    got = spark.read.parquet(out)
    assert got.count() == 20 and {"a", "b"} <= set(got.columns)


def test_compact_small_files_rejects_non_hive_nesting(spark, tmp_path):
    """A nested layout that is not k=v partitioning raises loudly
    instead of packing across unrelated directories (ADVICE r10)."""
    from wasaffi_spark.operators.layout import compact_small_files

    src = str(tmp_path / "src")
    spark.range(5).coalesce(1).write.parquet(os.path.join(src, "chunk1"))
    spark.range(5).coalesce(1).write.parquet(os.path.join(src, "chunk2"))
    with pytest.raises(ValueError, match="hive"):
        compact_small_files(spark, src, 10**9, str(tmp_path / "out"))


# ------------------------------------------- bundle signature sum lane


def test_bundle_sig_catches_even_multiplicity_swap(spark, tmp_path):
    """An even-multiplicity substitution (a duplicated row pair A,A
    replaced by C,C) keeps both the row count and the xor lane
    unchanged — the blind spot ADVICE r10 named. The modular-sum lane
    must catch it."""
    import shutil

    from wasaffi_spark.operators import serving

    df = spark.createDataFrame(
        [(1, "x"), (1, "x"), (2, "y")], "id bigint, v string"
    )
    swapped = spark.createDataFrame(
        [(3, "z"), (3, "z"), (2, "y")], "id bigint, v string"
    )
    # pin the premise: xor and count agree between the two contents
    a = serving._component_sig(df).first()
    b = serving._component_sig(swapped).first()
    assert (a["n_rows"], a["content_sig"]) == (b["n_rows"], b["content_sig"])
    assert a["content_sum"] != b["content_sum"]

    bundle = str(tmp_path / "bundle")
    serving.export_index_bundle(spark, bundle, {"postings": df})
    swapped.write.mode("overwrite").parquet(
        os.path.join(bundle, "postings_t")
    )
    shutil.rmtree(os.path.join(bundle, "postings"))
    shutil.move(
        os.path.join(bundle, "postings_t"),
        os.path.join(bundle, "postings"),
    )
    with pytest.raises(serving.BundleIntegrityError, match="postings"):
        serving.read_index_bundle(spark, bundle)


def test_compact_small_files_no_driver_collect(spark, tmp_path):
    """The pack path never collects plan rows to the driver: the bin
    mapping reaches the tagging join as a broadcast of the plan
    DataFrame (VERDICT r10 What's-wrong #3). Pinned by reading the
    function source — the behavioural contract is covered by the
    execution tests; this guards against the collect creeping back."""
    import inspect

    from wasaffi_spark.operators import layout

    src = inspect.getsource(layout.compact_small_files)
    assert ".collect()" not in src


# ------------------------------------------- replay-safe state vacuum


def test_last_committed_batch_and_heal_seed(spark, tmp_path):
    """Unit semantics of the replay-safety primitives: commit-marker
    parsing, the cutoff in compact_into_seed, and heal_seed finishing a
    crashed swap."""
    from wasaffi_spark.streaming import state as st

    # checkpoint commits: 0 and 1 committed, 2 pending (offsets only)
    ck = tmp_path / "ckpt"
    (ck / "commits").mkdir(parents=True)
    (ck / "commits" / "0").write_text("{}")
    (ck / "commits" / "1").write_text("{}")
    (ck / "offsets").mkdir()
    (ck / "offsets" / "2").write_text("{}")
    assert st.last_committed_batch(spark, str(ck)) == 1
    assert st.last_committed_batch(spark, str(tmp_path / "nope")) == -1

    # state table: seed + batches 0,1,2 — fold must stop at the cutoff
    table = str(tmp_path / "table")
    for b in (-1, 0, 1, 2):
        spark.createDataFrame([(b,)], "v bigint").write.parquet(
            os.path.join(table, f"batch_id={b}")
        )
    resolved = (
        spark.read.parquet(table)
        .where(F.col("batch_id") <= 1)
        .select("v")
    )
    folded = st.compact_into_seed(
        spark, table, resolved, max_committed_batch_id=1
    )
    assert folded == 2
    parts = sorted(
        os.path.basename(p) for p in glob.glob(table + "/batch_id=*")
    )
    assert parts == ["batch_id=-1", "batch_id=2"]
    seed_vals = {
        r.v
        for r in spark.read.parquet(
            os.path.join(table, "batch_id=-1")
        ).collect()
    }
    assert seed_vals == {-1, 0, 1}

    # crashed-swap recovery: committed _seed_tmp + missing seed → heal
    # renames it in; a stale tmp next to a live seed is discarded
    import shutil

    shutil.move(
        os.path.join(table, "batch_id=-1"), os.path.join(table, "_seed_tmp")
    )
    st.heal_seed(spark, table)
    assert os.path.isdir(os.path.join(table, "batch_id=-1"))
    assert not os.path.exists(os.path.join(table, "_seed_tmp"))
    os.makedirs(os.path.join(table, "_seed_tmp"))
    st.heal_seed(spark, table)  # stale (uncommitted) tmp → dropped
    assert not os.path.exists(os.path.join(table, "_seed_tmp"))


@needs_data
@pytest.mark.slow
def test_vacuum_set_state_with_pending_replay(spark, tmp_path):
    """THE ADVICE r10 hazard: the sink stops with batch 1's state
    writes landed but its checkpoint commit missing. A
    checkpoint-aware vacuum must leave batch 1's partition out of the
    seed, so the restarted sink's replay (batch_id < 1 pre-state
    exclusion) still sees its hashes as fresh and rewrites its
    partitions with the same non-empty content — no document loss."""
    from wasaffi_spark.sources.parquet import read_parquet
    from wasaffi_spark.streaming import documents as sdoc
    from wasaffi_spark.streaming.state import vacuum_set_state

    docs = read_parquet(
        spark, os.path.join(SF_SMOKE, "documents.parquet")
    ).limit(200).localCheckpoint(eager=True)
    mid = docs.approxQuantile("doc_id", [0.5], 0.0)[0]
    src_dir = str(tmp_path / "src")
    docs.where(F.col("doc_id") <= mid).coalesce(1).write.parquet(
        src_dir + "/f0"
    )
    docs.where(F.col("doc_id") > mid).coalesce(1).write.parquet(
        src_dir + "/f1"
    )

    def run(state_dir):
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", "1")
            .option("recursiveFileLookup", "true")
            .parquet(src_dir)
        )
        sdoc.incremental_dedup_sink(
            stream, spark, state_dir
        ).awaitTermination()

    sa, sb = str(tmp_path / "A"), str(tmp_path / "B")
    run(sa)
    run(sb)
    docs1 = spark.read.parquet(
        os.path.join(sa, "docs", "batch_id=1")
    ).count()
    assert docs1 > 0

    # simulate the crash: batch 1 committed its state writes but not
    # its checkpoint marker → it WILL replay on restart
    os.remove(os.path.join(sa, "_checkpoint", "commits", "1"))
    crc = os.path.join(sa, "_checkpoint", "commits", ".1.crc")
    if os.path.exists(crc):  # local-FS checksum sidecar of the marker
        os.remove(crc)

    folded = vacuum_set_state(
        spark,
        os.path.join(sa, "state"),
        checkpoint_dir=os.path.join(sa, "_checkpoint"),
    )
    assert folded == 1  # batch 0 only — batch 1 is pending
    parts = sorted(
        os.path.basename(p)
        for p in glob.glob(os.path.join(sa, "state", "batch_id=*"))
    )
    assert parts == ["batch_id=-1", "batch_id=1"]

    # restart → batch 1 replays against the vacuumed state
    run(sa)
    assert (
        spark.read.parquet(os.path.join(sa, "docs", "batch_id=1")).count()
        == docs1
    )
    ga = {
        (r.text_hash, r.doc_id)
        for r in spark.read.parquet(os.path.join(sa, "state"))
        .select("text_hash", "doc_id")
        .collect()
    }
    gb = {
        (r.text_hash, r.doc_id)
        for r in spark.read.parquet(os.path.join(sb, "state"))
        .select("text_hash", "doc_id")
        .collect()
    }
    assert ga == gb
    da = {
        r.doc_id
        for r in spark.read.parquet(os.path.join(sa, "docs")).collect()
    }
    db = {
        r.doc_id
        for r in spark.read.parquet(os.path.join(sb, "docs")).collect()
    }
    assert da == db


@needs_data
@pytest.mark.slow
def test_vacuum_graph_state_with_pending_replay(spark, tmp_path):
    """The graph-state twin of the pending-replay hazard: with batch
    1's commit marker removed, vacuum_graph_state folds only batch 0,
    and the restarted insert sink's replay reproduces the unvacuumed
    twin exactly."""
    from wasaffi_spark.sources.parquet import read_parquet
    from wasaffi_spark.streaming import vectors as svec

    emb = read_parquet(
        spark, os.path.join(SF_SMOKE, "embeddings.parquet")
    ).where(F.col("vec_id") < 120)
    base = emb.where(F.col("vec_id") % 8 != 7)
    ingest = emb.where(F.col("vec_id") % 8 == 7)
    ingest_dir = str(tmp_path / "ingest")
    ingest.where(F.col("vec_id") < 60).coalesce(1).write.parquet(
        ingest_dir + "/f0"
    )
    ingest.where(F.col("vec_id") >= 60).coalesce(1).write.parquet(
        ingest_dir + "/f1"
    )
    kw = dict(k=4, beam=8, rounds=2, n_entry=3, ring=3, max_reverse=8,
              descent_rounds=2)

    def run(state_dir):
        stream = (
            spark.readStream.schema(ingest.schema)
            .option("maxFilesPerTrigger", "1")
            .option("recursiveFileLookup", "true")
            .parquet(ingest_dir)
        )
        svec.graph_insert_sink(
            stream, spark, state_dir, base, **kw
        ).awaitTermination()

    sa, sb = str(tmp_path / "A"), str(tmp_path / "B")
    run(sa)
    run(sb)
    os.remove(os.path.join(sa, "_checkpoint", "commits", "1"))
    crc = os.path.join(sa, "_checkpoint", "commits", ".1.crc")
    if os.path.exists(crc):  # local-FS checksum sidecar of the marker
        os.remove(crc)

    folded = svec.vacuum_graph_state(spark, sa)
    assert folded["graph"] == 1 and folded["vectors"] == 1
    for t in ("graph", "vectors"):
        parts = sorted(
            os.path.basename(p)
            for p in glob.glob(os.path.join(sa, t, "batch_id=*"))
        )
        assert parts == ["batch_id=-1", "batch_id=1"], t

    run(sa)  # batch 1 replays
    got = {tuple(r) for r in svec.read_graph_state(spark, sa).collect()}
    want = {tuple(r) for r in svec.read_graph_state(spark, sb).collect()}
    assert got == want


# --------------------------------------- index_maintenance_policy


def _monitor(spark, hits_list, k=4):
    return spark.createDataFrame(
        [(i, h, k) for i, h in enumerate(hits_list)],
        "qid bigint, hits bigint, k bigint",
    )


def test_policy_flips_each_decision_boundary(spark):
    """Every rung of the threshold ladder, including both inclusive
    boundaries: recall_bp >= healthy → ok action, floor <= recall_bp <
    healthy → degraded action, recall_bp < floor → floor action."""
    from wasaffi_spark.operators.serving import index_maintenance_policy

    th = {"graph": (9000, 3000)}
    # 5 queries * k=4 = 20 slots; recall_bp = 10000 * hits / 20
    cases = [
        ([4, 4, 4, 4, 4], 10000, "noop"),       # perfect
        ([4, 4, 4, 4, 2], 9000, "noop"),        # healthy boundary (>=)
        ([4, 4, 4, 4, 1], 8500, "refresh"),     # just degraded
        ([2, 2, 1, 1, 0], 3000, "refresh"),     # floor boundary (>=)
        ([2, 2, 1, 0, 0], 2500, "rebuild"),     # collapsed
        ([0, 0, 0, 0, 0], 0, "rebuild"),
    ]
    for hits, want_bp, want_decision in cases:
        row = index_maintenance_policy(
            {"graph": _monitor(spark, hits)}, th
        ).first()
        assert row.recall_bp == want_bp, (hits, row)
        assert row.decision == want_decision, (hits, row)
        assert row.n_queries == 5 and row.k == 4
        assert row.total_hits == sum(hits)


def test_policy_family_actions_and_ordering(spark):
    """Default action names differ per family (graph: refresh/rebuild,
    ivf: raise_n_probe/retrain), rows come out ordered by family, and
    custom action triples override the defaults."""
    from wasaffi_spark.operators.serving import index_maintenance_policy

    out = index_maintenance_policy(
        {
            "ivf": _monitor(spark, [2, 2, 1, 1, 0]),    # 3000 bp
            "graph": _monitor(spark, [2, 2, 1, 0, 0]),  # 2500 bp
        },
        {"graph": (9000, 3000), "ivf": (9000, 2000)},
    ).collect()
    assert [r.family for r in out] == ["graph", "ivf"]
    assert out[0].decision == "rebuild"
    assert out[1].decision == "raise_n_probe"

    custom = index_maintenance_policy(
        {"pq": _monitor(spark, [4, 4, 4, 4, 4])},
        {"pq": (5000, 1000)},
        actions={"pq": ("serve", "rebalance", "recode")},
    ).first()
    assert custom.decision == "serve" and custom.family == "pq"

    with pytest.raises(ValueError, match="no monitors"):
        index_maintenance_policy({}, {})


def test_policy_is_integer_exact(spark):
    """recall_bp uses integer div (floor), never float rounding: 1 hit
    of 3*7=21 slots is 476 bp, not 476.19... and not 477."""
    from wasaffi_spark.operators.serving import index_maintenance_policy

    row = index_maintenance_policy(
        {"g": _monitor(spark, [1, 0, 0, 0, 0, 0, 0], k=3)},
        {"g": (9000, 3000)},
    ).first()
    assert row.recall_bp == 476
    assert dict(row.asDict())["total_hits"] == 1


# ----------------------------- bundle_diff over the maintained index


@pytest.mark.slow
def test_bundle_diff_crud_matrix(spark, tmp_path):
    """The serving handoff composed with every maintenance leg: export
    the base bundle, apply ONE CRUD op, export again, and bundle_diff
    must name EXACTLY the components that op touches — append moves
    postings but not the codebook; insert/delete/refresh move the
    graph (delete also the tombstones) but never the IVF side; retrain
    moves codebook + postings but never the graph. The matrix is the
    ship-only-what-changed contract a serving fleet syncs by."""
    from tests.test_r10_ops import _orthogonal_fixture
    from wasaffi_spark.operators import serving, similarity

    base, batch, deletes, queries = _orthogonal_fixture(spark)
    allv = base.unionByName(batch)
    cents = similarity.lloyd_centroids(base, n_cells=4, iters=2, dim=16)
    postings = similarity.ivf_assign_hashed(base, cents, 4, dim=16)
    graph = similarity.knn_descent(base, k=4, rounds=3, ring=3)
    empty_tomb = spark.createDataFrame([], "vec_id bigint")

    def comps(**over):
        out = {
            "cents": cents,
            "postings": postings,
            "graph": graph,
            "tombstones": empty_tomb,
        }
        out.update(over)
        return out

    a_dir = str(tmp_path / "base")
    serving.export_index_bundle(spark, a_dir, comps())

    upd = similarity.graph_insert(batch, graph, base, k=4, beam=8, rounds=3)
    ops = {
        "append": (
            comps(
                postings=postings.unionByName(
                    similarity.ivf_append(batch, cents, n_cells=4, dim=16)
                )
            ),
            {"postings"},
        ),
        "insert": (
            comps(graph=similarity.graph_apply_delta(graph, upd)),
            {"graph"},
        ),
        "delete": (
            comps(
                graph=similarity.graph_apply_delta(
                    graph,
                    similarity.graph_delete(deletes, graph, base, k=4),
                ),
                tombstones=deletes,
            ),
            {"graph", "tombstones"},
        ),
        "retrain": (
            comps(
                cents=similarity.lloyd_centroids(
                    allv, n_cells=4, iters=2, dim=16
                ),
                postings=similarity.ivf_assign_hashed(
                    allv,
                    similarity.lloyd_centroids(allv, n_cells=4, iters=2, dim=16),
                    4,
                    dim=16,
                ),
            ),
            {"cents", "postings"},
        ),
    }
    for op, (components, want_changed) in ops.items():
        b_dir = str(tmp_path / op)
        serving.export_index_bundle(spark, b_dir, components)
        got = {
            r.component: r.status
            for r in serving.bundle_diff(spark, a_dir, b_dir).collect()
        }
        changed = {c for c, s in got.items() if s == "changed"}
        assert changed == want_changed, (op, got)
        assert all(
            s in ("changed", "unchanged") for s in got.values()
        ), (op, got)

    # refresh is measured against the POST-INSERT maintained graph
    # (over the grown corpus — on the converged base graph alone one
    # more descent round is a fixed point, correctly diffing as
    # unchanged): the warm re-descent moves the graph and ONLY the
    # graph — IVF components never ship for a graph refresh.
    g1 = similarity.graph_apply_delta(graph, upd).localCheckpoint(
        eager=True
    )
    pre_dir = str(tmp_path / "pre_refresh")
    serving.export_index_bundle(spark, pre_dir, comps(graph=g1))
    ref_dir = str(tmp_path / "refresh")
    serving.export_index_bundle(
        spark,
        ref_dir,
        comps(graph=similarity.graph_refresh(g1, allv, k=4, rounds=1)),
    )
    got = {
        r.component: r.status
        for r in serving.bundle_diff(spark, pre_dir, ref_dir).collect()
    }
    assert {c for c, s in got.items() if s == "changed"} == {"graph"}, got


# ------------------------------------------------ cluster_safe_split


def test_cluster_safe_split_never_straddles(spark):
    """Every near-dup cluster gets exactly ONE split; singletons split
    exactly as the per-document split_label would (component label ≡
    own id), so the two operators agree wherever leakage is not at
    stake."""
    from wasaffi_spark.operators.pipeline import (
        cluster_safe_split,
        split_label,
    )

    docs = spark.range(0, 200).select(F.col("id").alias("doc_id"))
    # clusters: {0,1,2}, {10,11}, chains {20-21-22} (transitive), rest
    # singletons
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11), (20, 21), (21, 22)],
        "id_a bigint, id_b bigint",
    )
    out = cluster_safe_split(docs, pairs).collect()
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r.cluster_id, set()).add(r.split)
    assert all(len(s) == 1 for s in by_cluster.values())
    rows = {r.doc_id: r for r in out}
    assert rows[0].cluster_id == rows[1].cluster_id == rows[2].cluster_id == 0
    assert rows[20].cluster_id == rows[21].cluster_id == rows[22].cluster_id
    # singletons ≡ split_label
    plain = {
        r.doc_id: r.split
        for r in docs.withColumn("split", split_label()).collect()
    }
    clustered_ids = {0, 1, 2, 10, 11, 20, 21, 22}
    for d, r in rows.items():
        if d not in clustered_ids:
            assert r.split == plain[d], d


def test_per_doc_split_actually_leaks(spark):
    """The hazard the operator exists for, quantified: under
    per-document split_label a material fraction of near-dup pairs
    straddle splits (expected ≈ 1 - (0.8² + 0.1² + 0.1²) = 34%);
    under cluster_safe_split the straddle count is ZERO by
    construction."""
    from wasaffi_spark.operators.pipeline import (
        cluster_safe_split,
        split_label,
    )

    n = 400
    docs = spark.range(0, n).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame(
        [(2 * i, 2 * i + 1) for i in range(n // 2)],
        "id_a bigint, id_b bigint",
    )
    plain = {
        r.doc_id: r.split
        for r in docs.withColumn("split", split_label()).collect()
    }
    plain_straddle = sum(
        plain[2 * i] != plain[2 * i + 1] for i in range(n // 2)
    )
    assert plain_straddle > n // 2 * 0.2  # the leak is real, not rare
    safe = {
        r.doc_id: r.split for r in cluster_safe_split(docs, pairs).collect()
    }
    assert all(safe[2 * i] == safe[2 * i + 1] for i in range(n // 2))


# --------------------------------------------------- frame sampling


def test_frame_sample_slices_and_edges(spark):
    """The pseudo-demux contract on hand-built payloads: exact frame
    payload bytes (the part DuckDB cannot check), stride semantics,
    the short tail frame, empty payloads yielding zero rows, and ts
    arithmetic."""
    from wasaffi_spark.operators.multimodal import frame_sample

    rows = [
        (1, b"A" * 10 + b"B" * 10 + b"C" * 5),  # 25 B → frames 0,1,2
        (2, b""),                                # empty → no frames
        (3, b"Z" * 10),                          # exactly one frame
    ]
    media = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    out = {
        (r.doc_id, r.frame_idx): r
        for r in frame_sample(
            media, frame_bytes=10, stride_frames=2, ms_per_frame=40
        ).collect()
    }
    # doc 1: frames 0 and 2 sampled (stride 2), frame 1 skipped
    assert set(out) == {(1, 0), (1, 2), (3, 0)}
    assert bytes(out[(1, 0)].frame_payload) == b"A" * 10
    assert bytes(out[(1, 2)].frame_payload) == b"C" * 5  # short tail
    assert out[(1, 2)].n_bytes == 5
    assert out[(1, 2)].ts_ms == 80
    assert bytes(out[(3, 0)].frame_payload) == b"Z" * 10
    # stride 1 samples every frame
    from pyspark.sql import functions as _F

    all_frames = frame_sample(media, frame_bytes=10, stride_frames=1)
    assert all_frames.where(_F.col("doc_id") == 1).count() == 3


def test_decode_and_resize_stubs_gate_on_pil(spark):
    """The documented decode/resize gate: without PIL both raise
    NotImplementedError naming the missing capability (they become
    real implementations the moment PIL lands — COVERAGE env probe)."""
    from wasaffi_spark.operators import multimodal

    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present — stubs are live implementations")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="decode"):
        multimodal.decode_image(b"\x89PNG")
    with pytest.raises(NotImplementedError, match="resize"):
        multimodal.resize_image(b"\x89PNG", 8, 8)
