"""Round-10 operators: search over a maintained graph index — the
composed insert→delete→search chain (graph_maintained_search) and the
latest-wins delta application (graph_apply_delta) it builds on."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


def _emb_df(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>"
    )


def _orthogonal_fixture(spark):
    """4 orthogonal well-separated clusters (the insert≡rebuild /
    delete≡rebuild equivalence regime of test_r9_ops): 6 base nodes per
    cluster (ids 0..23, cluster = id % 4), one new node per cluster
    (100+j), deletes = one base node per cluster (4,5,6,7) PLUS the
    cluster-0 insert (100) — the FreshDiskANN interleaving where a
    just-inserted node is deleted again."""
    import numpy as np

    rng = np.random.default_rng(42)
    centers = np.zeros((4, 16))
    for j in range(4):
        centers[j, j] = 20.0
    base = _emb_df(
        spark,
        [
            (
                i,
                [float(x) for x in centers[i % 4]
                 + 0.05 * rng.standard_normal(16)],
            )
            for i in range(24)
        ],
    )
    batch_vecs = [
        [float(x) for x in centers[j] + 0.05 * rng.standard_normal(16)]
        for j in range(4)
    ]
    batch = _emb_df(
        spark, [(100 + j, batch_vecs[j]) for j in range(4)]
    )
    deletes = spark.createDataFrame(
        [(4,), (5,), (6,), (7,), (100,)], "vec_id bigint"
    )
    # queries sit EXACTLY on the inserted vectors: the nearest alive
    # neighbour of query 500+j is unambiguously the surviving insert
    # 100+j (cos 1.0 beats the ~0.995 in-cluster noise floor), which
    # makes insert-discoverability a deterministic assertion instead
    # of a noise-ranking coin flip
    queries = _emb_df(
        spark, [(500 + j, batch_vecs[j]) for j in range(4)]
    )
    return base, batch, deletes, queries


@pytest.mark.slow
def test_maintained_search_equals_bruteforce_over_alive(spark):
    """End-to-end truth in the equivalence regime: after insert + delete,
    the beam search's top-k for every query must equal the brute-force
    top-k over the ALIVE corpus (base ∪ batch − deleted) — i.e. (a) no
    deleted id ever surfaces (including the deleted just-inserted node
    100), (b) surviving inserted nodes ARE found (the reverse splice
    made them reachable), (c) the repair kept every cluster navigable."""
    from wasaffi_spark.operators import similarity

    base, batch, deletes, queries = _orthogonal_fixture(spark)
    graph = similarity.knn_descent(base, k=6, rounds=4, ring=4)
    got = similarity.graph_maintained_search(
        queries, graph, base, batch, deletes,
        k=4, k_graph=6, beam=12, rounds=4, n_entry=4, ring=4,
    ).collect()

    dele = {4, 5, 6, 7, 100}
    assert all(r.nid not in dele for r in got), got

    alive = (
        base.unionByName(batch)
        .join(deletes.withColumnRenamed("vec_id", "_d"),
              F.col("vec_id") == F.col("_d"), "left_anti")
    )
    truth = similarity.brute_force_topk(queries, alive, k=4).collect()
    assert {(r.qid, r.nid) for r in got} == {
        (r.qid, r.nid) for r in truth
    }, (sorted(got), sorted(truth))

    # surviving inserts are discoverable: query j's top-4 contains the
    # same-cluster new node for clusters 1..3 (cluster 0's insert was
    # deleted again)
    by_q = {}
    for r in got:
        by_q.setdefault(r.qid, set()).add(r.nid)
    for j in (1, 2, 3):
        assert 100 + j in by_q[500 + j], by_q


@pytest.mark.slow
def test_maintained_search_deterministic_and_layout_independent(spark):
    from wasaffi_spark.operators import similarity

    base, batch, deletes, queries = _orthogonal_fixture(spark)
    graph = similarity.knn_descent(base, k=6, rounds=4, ring=4)
    a = similarity.graph_maintained_search(
        queries, graph, base, batch, deletes,
        k=4, k_graph=6, beam=12, rounds=4, n_entry=4, ring=4,
    )
    b = similarity.graph_maintained_search(
        queries.repartition(7), graph, base.repartition(5),
        batch.repartition(3), deletes.repartition(2),
        k=4, k_graph=6, beam=12, rounds=4, n_entry=4, ring=4,
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_graph_apply_delta_latest_wins(spark):
    """Delta application is latest-wins per src: touched nodes' old
    rows vanish entirely (even when the delta holds fewer rows than
    the old adjacency), untouched nodes keep theirs byte-identical."""
    from wasaffi_spark.operators.similarity import graph_apply_delta

    g = spark.createDataFrame(
        [(1, 2, 0.9, 1), (1, 3, 0.8, 2), (2, 1, 0.7, 1)],
        "src bigint, dst bigint, cos_sim double, rank int",
    )
    delta = spark.createDataFrame(
        [(1, 9, 0.95, 1)], "src bigint, dst bigint, cos_sim double, rank int"
    )
    got = sorted(map(tuple, graph_apply_delta(g, delta).collect()))
    assert got == [(1, 9, 0.95, 1), (2, 1, 0.7, 1)]


# ------------------------------------------------------ incremental_snapshot


def _snap_fixture(spark):
    """Base snapshot with in-base dups; batch with all three row
    classes: dup-vs-base, dup-within-batch, fresh."""
    base = spark.createDataFrame(
        [
            (0, "en", "alpha beta"),
            (1, "en", "alpha beta"),      # in-base dup (keeper = 0)
            (2, "en", "gamma delta"),
            (3, "de", "eins zwei"),
        ],
        "doc_id bigint, lang string, text string",
    )
    batch = spark.createDataFrame(
        [
            (10, "en", "alpha beta"),     # dup vs base -> dropped
            (11, "en", "fresh one"),      # fresh
            (12, "en", "fresh two"),      # fresh
            (13, "en", "fresh two"),      # intra-batch dup of 12
            (14, "de", "drei vier"),      # fresh
            (15, "fr", "un deux"),        # fresh, NEW domain
        ],
        "doc_id bigint, lang string, text string",
    )
    return base, batch


def _snap_state(spark, base):
    from pyspark.sql import functions as F

    from wasaffi_spark.operators import similarity

    th = F.md5(F.coalesce(F.col("text"), F.lit("")))
    seen = base.select(th.alias("text_hash"))
    keepers = (
        base.groupBy(th.alias("_h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .join(base.select("doc_id", "lang"), "doc_id")
    )
    counts = keepers.groupBy("lang").agg(F.count("*").alias("n_d"))
    bemb = (
        similarity.hashed_embedding(base, dim=16)
        .where(F.col("norm_sq") > 0)
        .select(F.col("doc_id").alias("vec_id"), "embedding")
    )
    cents = similarity.hashed_centroids(bemb, 4)
    return seen, counts, cents


def test_incremental_snapshot_stats_and_weights(spark):
    """Hand-computed truth on the three-class fixture: dup-vs-base and
    intra-batch dups counted separately, fresh counts right, weights
    refresh from (base + fresh) counts including a batch-only domain
    (keep_bp_old = 0 there: the domain did not exist in the old plan)."""
    from wasaffi_spark.operators import pipeline as pipe

    base, batch = _snap_fixture(spark)
    seen, counts, cents = _snap_state(spark, base)
    got = {
        r.lang: r.asDict()
        for r in pipe.incremental_snapshot(
            batch, seen, counts, cents, n_cells=4, dim=16
        ).collect()
    }
    # base keepers: en={alpha beta, gamma delta}=2, de=1
    en, de, fr = got["en"], got["de"], got["fr"]
    assert (en["n_base"], en["n_batch"], en["n_dup_seen"],
            en["n_dup_batch"], en["n_fresh"]) == (2, 4, 1, 1, 2)
    assert (de["n_base"], de["n_batch"], de["n_dup_seen"],
            de["n_dup_batch"], de["n_fresh"]) == (1, 1, 0, 0, 1)
    assert (fr["n_base"], fr["n_batch"], fr["n_dup_seen"],
            fr["n_dup_batch"], fr["n_fresh"]) == (0, 1, 0, 0, 1)
    # old weights over (en=2, de=1): n_min=1 -> en=round(sqrt(1/2)*1e4)
    assert (en["keep_bp_old"], de["keep_bp_old"], fr["keep_bp_old"]) == (
        7071, 10000, 0,
    )
    # new counts: en=4, de=2, fr=1 -> n_min=1
    assert (en["keep_bp_new"], de["keep_bp_new"], fr["keep_bp_new"]) == (
        5000, 7071, 10000,
    )
    # every fresh doc has tokens -> nonzero vector -> assigned somewhere
    assert en["cells_touched"] >= 1 and de["cells_touched"] >= 1


def test_incremental_snapshot_is_pure_function_of_state(spark):
    """The 'never re-dedups the base' pin (VERDICT r9 #5): the operator
    consumes ONLY (batch, hash state, domain counts, codebook). Passing
    literal state tables — with every base document REPLACED by
    garbage text — must yield the identical report, proving base text
    cannot influence the nightly run once its state is persisted."""
    from pyspark.sql import functions as F

    from wasaffi_spark.operators import pipeline as pipe

    base, batch = _snap_fixture(spark)
    seen, counts, cents = _snap_state(spark, base)
    out1 = sorted(
        map(tuple, pipe.incremental_snapshot(
            batch, seen, counts, cents, n_cells=4, dim=16
        ).collect())
    )
    # materialize the state as literal tables, then corrupt the corpus
    seen_lit = spark.createDataFrame(
        [(r.text_hash,) for r in seen.collect()], "text_hash string"
    )
    counts_lit = spark.createDataFrame(
        [(r.lang, r.n_d) for r in counts.collect()], "lang string, n_d long"
    )
    cents_lit = spark.createDataFrame(
        [(r.cell, [float(x) for x in r.cv]) for r in cents.collect()],
        "cell int, cv array<double>",
    )
    corrupted = base.withColumn("text", F.lit("CORRUPTED"))
    assert corrupted.count() == 4  # base exists but is never consulted
    out2 = sorted(
        map(tuple, pipe.incremental_snapshot(
            batch, seen_lit, counts_lit, cents_lit, n_cells=4, dim=16
        ).collect())
    )
    assert out1 == out2


def test_incremental_snapshot_fresh_matches_incremental_dedup(spark):
    """The fresh set the report counts is EXACTLY dedup.py::
    incremental_dedup's admitted rows (the cross-snapshot rule the
    operator cites) — the composed stats cannot drift from the
    standalone operator."""
    from pyspark.sql import functions as F

    from wasaffi_spark.operators import dedup as dd
    from wasaffi_spark.operators import pipeline as pipe

    base, batch = _snap_fixture(spark)
    seen, counts, cents = _snap_state(spark, base)
    rep = pipe.incremental_snapshot(
        batch, seen, counts, cents, n_cells=4, dim=16
    )
    n_fresh_total = rep.agg(F.sum("n_fresh")).collect()[0][0]
    admitted = dd.incremental_dedup(
        batch, seen, seen_is_hashes=True
    )
    assert n_fresh_total == admitted.count() == 4


def test_incremental_snapshot_query_plan_has_anti_join(spark):
    """Plan pin: the declared query's batch-dedup leg is the hash
    ANTI-JOIN against the state (the O(batch) incremental path), not a
    re-dedup of base ∪ batch."""
    import os

    from tests.conftest import SF_SMOKE

    if not os.path.isdir(SF_SMOKE):
        import pytest

        pytest.skip("testdata not present")
    from wasaffi_spark.operators.catalog import q_incremental_snapshot

    plan = (
        q_incremental_snapshot(spark, SF_SMOKE)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "LeftAnti" in plan, plan[:2000]


# ------------------------------------------------------- ivf_maintained


def test_ivf_maintained_postings_equal_rebuild_of_alive(spark):
    """For the inverted-list index, incremental maintenance is EXACT:
    assign(base) ∪ append(batch) − deleted must be ROW-IDENTICAL to a
    one-pass assignment of the alive corpus against the same frozen
    codebook — nothing a rebuild would improve (contrast the graph
    family, where the analogous pin holds only in the equivalence
    regime)."""
    import os

    import pytest

    from tests.conftest import SF_SMOKE

    if not os.path.isdir(SF_SMOKE):
        pytest.skip("testdata not present")
    from wasaffi_spark.operators import similarity
    from wasaffi_spark.sources.parquet import read_parquet

    emb = read_parquet(spark, SF_SMOKE + "/embeddings.parquet").where(
        F.col("vec_id") < 200
    )
    base = emb.where(F.col("vec_id") % 8 != 7)
    batch = emb.where(F.col("vec_id") % 8 == 7)
    dele = emb.where(F.col("vec_id") % 13 == 4).select("vec_id")
    cents = similarity.lloyd_centroids(base, n_cells=8, iters=2)
    maintained = similarity.ivf_delete(
        dele,
        similarity.ivf_assign_hashed(base, cents, 8).unionByName(
            similarity.ivf_append(batch, cents, n_cells=8)
        ),
    ).select("vec_id", "cell")
    alive = emb.join(
        dele.withColumnRenamed("vec_id", "_d"),
        F.col("vec_id") == F.col("_d"), "left_anti",
    )
    rebuild = similarity.ivf_assign_hashed(alive, cents, 8).select(
        "vec_id", "cell"
    )
    assert sorted(map(tuple, maintained.collect())) == sorted(
        map(tuple, rebuild.collect())
    )


def test_ivf_maintained_topk_excludes_deleted(spark):
    import os

    import pytest

    from tests.conftest import SF_SMOKE

    if not os.path.isdir(SF_SMOKE):
        pytest.skip("testdata not present")
    from wasaffi_spark.operators import similarity
    from wasaffi_spark.sources.parquet import read_parquet

    emb = read_parquet(spark, SF_SMOKE + "/embeddings.parquet").where(
        F.col("vec_id") < 200
    )
    base = emb.where(F.col("vec_id") % 8 != 7)
    batch = emb.where(F.col("vec_id") % 8 == 7)
    dele = emb.where(F.col("vec_id") % 13 == 4).select("vec_id")
    queries = emb.where(
        (F.col("vec_id") < 8) & (F.col("vec_id") % 13 != 4)
    )
    got = similarity.ivf_maintained_topk(
        queries, base, batch, dele, k=3, n_cells=8, n_probe=2, iters=2
    ).collect()
    assert got
    deleted = {r.vec_id for r in dele.collect()}
    assert all(r.nid not in deleted for r in got)
    assert all(r.qid not in deleted for r in got)


# ----------------------------------------------------------- graph_refresh


@pytest.mark.slow
def test_graph_refresh_equals_longer_descent(spark):
    """refresh(descent(a rounds), b rounds) must be ROW-IDENTICAL to
    descent(a+b rounds): the warm refresh runs knn_descent's OWN round
    loop (shared _nn_descent_rounds), so the two paths cannot drift."""
    import numpy as np

    from wasaffi_spark.operators import similarity

    rng = np.random.default_rng(3)
    rows = [
        (i, [float(x) for x in rng.standard_normal(8)]) for i in range(60)
    ]
    emb = _emb_df(spark, rows)
    g2 = similarity.knn_descent(emb, k=4, rounds=2, ring=2)
    refreshed = similarity.graph_refresh(g2, emb, k=4, rounds=2)
    g4 = similarity.knn_descent(emb, k=4, rounds=4, ring=2)
    assert sorted(map(tuple, refreshed.collect())) == sorted(
        map(tuple, g4.collect())
    )


def test_graph_refresh_noop_at_fixpoint(spark):
    """Refreshing the EXACT top-k graph changes nothing (candidates
    include the current edges, and the exact top-k wins every re-rank)
    — refreshing is always safe to schedule."""
    import numpy as np

    from wasaffi_spark.operators import similarity

    rng = np.random.default_rng(9)
    rows = [
        (i, [float(x) for x in rng.standard_normal(8)]) for i in range(40)
    ]
    emb = _emb_df(spark, rows)
    exact = similarity.brute_force_topk(emb, emb, k=4).toDF(
        "src", "dst", "cos_sim", "rank"
    )
    refreshed = similarity.graph_refresh(exact, emb, k=4, rounds=1)
    assert sorted(map(tuple, refreshed.collect())) == sorted(
        map(tuple, exact.collect())
    )


@pytest.mark.slow
def test_graph_refresh_recovers_new_to_new_links(spark):
    """The gap refresh exists to close: after a batch insert, two new
    nodes in the same cluster have NO edge between them (inserts search
    a frozen snapshot — the documented boundary). One warm refresh
    round must create the new→new links, because each new node's
    forward edges reach the spliced base nodes whose adjacencies now
    contain the other new node."""
    import numpy as np

    from wasaffi_spark.operators import similarity

    rng = np.random.default_rng(21)
    center = 10.0 * np.ones(8)
    # the two new nodes share a sideways offset from the base cluster,
    # so cos(new, new) ≈ 1.0 strictly beats cos(new, base) ≈ 0.997 —
    # mutual top-k membership is deterministic, not a noise coin flip
    offset = np.zeros(8)
    offset[1] = 2.0
    base = _emb_df(
        spark,
        [(i, [float(x) for x in center + 0.05 * rng.standard_normal(8)])
         for i in range(8)],
    )
    batch = _emb_df(
        spark,
        [(100 + j, [float(x) for x in center + offset
                    + 0.02 * rng.standard_normal(8)])
         for j in range(2)],
    )
    graph = similarity.knn_descent(base, k=4, rounds=3, ring=3)
    ins = similarity.graph_insert(
        batch, graph, base, k=4, beam=8, rounds=3, n_entry=3, ring=3
    )
    g1 = similarity.graph_apply_delta(graph, ins)
    pre = {(r.src, r.dst) for r in g1.collect()}
    assert (100, 101) not in pre and (101, 100) not in pre
    corpus = base.unionByName(batch)
    refreshed = similarity.graph_refresh(g1, corpus, k=4, rounds=1)
    post = {(r.src, r.dst) for r in refreshed.collect()}
    # in one tight cluster the two new points are mutual near-neighbours
    assert (100, 101) in post and (101, 100) in post


# ------------------------------------------------------- compaction_plan


def _manifest(spark, rows):
    return spark.createDataFrame(
        rows, "part string, file_id bigint, bytes bigint"
    )


def test_compaction_plan_hand_fixture(spark):
    """Next-Fit bin assignment on a hand-checked manifest: target 100,
    files (10, 40, 60, 30, 250, 90) in id order → exclusive cumsums
    0,10,50,110,(keep),110 → bins 0,0,0,1,NULL,1; the 250-byte file is
    right-sized and kept."""
    from wasaffi_spark.operators.layout import compaction_plan

    man = _manifest(
        spark,
        [("p", 0, 10), ("p", 1, 40), ("p", 2, 60),
         ("p", 3, 30), ("p", 4, 250), ("p", 5, 90)],
    )
    got = {
        r.file_id: (r.action, r.bin)
        for r in compaction_plan(man, 100, part_col="part").collect()
    }
    assert got == {
        0: ("pack", 0), 1: ("pack", 0), 2: ("pack", 0),
        3: ("pack", 1), 4: ("keep", None), 5: ("pack", 1),
    }


def test_compaction_plan_never_crosses_partitions(spark):
    """Two partitions with identical file lists plan independently —
    bins restart at 0 per partition key (a bin straddling partition
    values would defeat partition pruning on the compacted table)."""
    from wasaffi_spark.operators.layout import compaction_plan

    rows = [(p, i, 50) for p in ("a", "b") for i in range(4)]
    plan = compaction_plan(_manifest(spark, rows), 100, part_col="part")
    per_part = {
        p: sorted(
            (r.file_id, r.bin)
            for r in plan.where(F.col("part") == p).collect()
        )
        for p in ("a", "b")
    }
    assert per_part["a"] == per_part["b"] == [
        (0, 0), (1, 0), (2, 1), (3, 1),
    ]


def test_compaction_plan_bin_size_bound(spark):
    """Every packed bin's byte total is < target + the largest small
    file it holds (the Next-Fit guarantee: a bin only overflows by the
    file that crossed the boundary), bin ids are contiguous, and the
    plan emits at most ceil(total/target) output files."""
    import random

    from wasaffi_spark.operators.layout import compaction_plan

    rng = random.Random(7)
    rows = [("p", i, rng.randrange(1, 400)) for i in range(200)]
    target = 512
    plan = compaction_plan(
        _manifest(spark, rows), target, part_col="part"
    ).collect()
    assert all(r.action == "pack" for r in plan)  # all < 400 < 512
    by_bin = {}
    for r in plan:
        by_bin.setdefault(r.bin, []).append(r.bytes)
    bins = sorted(by_bin)
    assert bins == list(range(len(bins)))  # contiguous bin ids
    for b in bins:
        assert sum(by_bin[b]) < target + max(by_bin[b])
    # packing efficiency: offset binning yields at most
    # ceil(total/target) bins — average output file ~= target, the
    # point of compaction (a per-bin >= target floor does NOT hold:
    # a boundary-crossing file shifts the next bin's start)
    total = sum(r.bytes for r in plan)
    assert len(bins) <= -(-total // target)


def test_compaction_plan_is_metadata_only_window(spark):
    """The physical plan is one window over the manifest — no join, no
    corpus access; the planner's cost is O(files) whatever the table
    holds."""
    from wasaffi_spark.operators.layout import compaction_plan

    man = _manifest(spark, [("p", i, 10) for i in range(8)])
    plan = compaction_plan(man, 100, part_col="part")
    phys = plan._sc._jvm.PythonSQLUtils.explainString(
        plan._jdf.queryExecution(), "simple"
    )
    assert "Window" in phys
    assert "Join" not in phys and "CartesianProduct" not in phys


def test_compact_small_files_executes_plan(spark, tmp_path):
    """compact_small_files rewrites exactly the packed files into ONE
    parquet file per bin (hash-repartition on bin + partitionBy, no
    driver loop), preserves every packed row, and leaves right-sized
    files in place."""
    import glob
    import os

    from wasaffi_spark.operators.layout import compact_small_files

    src = str(tmp_path / "src")
    for i in range(8):
        (
            spark.range(i * 10, i * 10 + 10)
            .withColumn("v", F.col("id") * 2)
            .coalesce(1)
            .write.mode("append")
            .parquet(src)
        )
    (
        spark.range(100000, 140000)
        .withColumn("v", F.col("id") * 2)
        .coalesce(1)
        .write.mode("append")
        .parquet(src)
    )
    sizes = sorted(
        os.stat(p).st_size for p in glob.glob(os.path.join(src, "*.parquet"))
    )
    # target: bigger than any small file, ~3 smalls per bin, below the
    # big file so it stays a keep whatever the parquet overhead is
    target = min(3 * sizes[0], sizes[-1])
    assert sizes[-2] < target <= sizes[-1]

    out = str(tmp_path / "out")
    plan = compact_small_files(spark, src, target, out)
    rows = plan.collect()
    keeps = [r for r in rows if r.action == "keep"]
    packs = [r for r in rows if r.action == "pack"]
    assert len(keeps) == 1 and keeps[0].bytes == sizes[-1]
    assert len(packs) == 8 and all(r.bin is not None for r in packs)

    bins = sorted({r.bin for r in packs})
    bin_dirs = sorted(glob.glob(os.path.join(out, "bin=*")))
    assert [int(d.rsplit("=", 1)[1]) for d in bin_dirs] == bins
    assert len(bins) > 1  # the fixture genuinely exercises multi-bin
    for d in bin_dirs:
        assert len(glob.glob(os.path.join(d, "*.parquet"))) == 1

    got = {
        (r.id, r.v)
        for r in spark.read.parquet(out).select("id", "v").collect()
    }
    want = {
        (r.id, r.v)
        for r in spark.read.parquet(
            *[r.path for r in packs]
        ).collect()
    }
    assert got == want
    # the keep file was not rewritten into the output
    assert keeps[0].path.startswith(src)


# --------------------------------------------------------- index bundle


@pytest.mark.slow
def test_index_bundle_roundtrip_and_serve(spark, tmp_path):
    """Export the full serving state of both index families, read it
    back with verification, and get IDENTICAL search results from the
    imported state — the train→serve handoff contract."""
    from wasaffi_spark.operators import serving, similarity

    base, batch, deletes, queries = _orthogonal_fixture(spark)
    cents = similarity.lloyd_centroids(base, n_cells=4, iters=2, dim=16)
    postings = similarity.ivf_assign_hashed(base, cents, 4, dim=16)
    graph = similarity.knn_descent(base, k=4, rounds=3, ring=3)

    bundle = str(tmp_path / "bundle")
    man = serving.export_index_bundle(
        spark, bundle,
        {"cents": cents, "postings": postings, "graph": graph,
         "tombstones": deletes},
    )
    assert {r.component for r in man.collect()} == {
        "cents", "postings", "graph", "tombstones"
    }

    got = serving.read_index_bundle(spark, bundle)
    assert sorted(map(tuple, got["graph"].collect())) == sorted(
        map(tuple, graph.collect())
    )
    assert sorted(map(tuple, got["cents"].collect())) == sorted(
        map(tuple, cents.collect())
    )
    # serving equivalence: beam search over imported graph == original
    a = similarity.graph_search_topk(
        queries, graph, base, k=3, beam=8, rounds=3, n_entry=3, ring=3
    )
    b = similarity.graph_search_topk(
        queries, got["graph"], base, k=3, beam=8, rounds=3, n_entry=3,
        ring=3,
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_index_bundle_detects_tampering(spark, tmp_path):
    """A post-export mutation (rewriting one component with a row
    dropped) must raise BundleIntegrityError naming the component; a
    same-rowcount value mutation is caught by the signature too."""
    import os
    import shutil

    import pytest as _pytest

    from wasaffi_spark.operators import serving

    df = spark.createDataFrame(
        [(i, float(i) / 7) for i in range(100)], "id bigint, v double"
    )
    bundle = str(tmp_path / "bundle")
    serving.export_index_bundle(spark, bundle, {"postings": df})

    # silent truncation: drop a row and rewrite the component in place
    spark.read.parquet(os.path.join(bundle, "postings")).where(
        "id <> 42"
    ).write.mode("overwrite").parquet(os.path.join(bundle, "postings_t"))
    shutil.rmtree(os.path.join(bundle, "postings"))
    shutil.move(
        os.path.join(bundle, "postings_t"), os.path.join(bundle, "postings")
    )
    with _pytest.raises(serving.BundleIntegrityError, match="postings"):
        serving.read_index_bundle(spark, bundle)

    # same row count, one value flipped → signature mismatch
    bundle2 = str(tmp_path / "bundle2")
    serving.export_index_bundle(spark, bundle2, {"postings": df})
    mut = spark.read.parquet(os.path.join(bundle2, "postings")).withColumn(
        "v", F.when(F.col("id") == 42, F.lit(99.0)).otherwise(F.col("v"))
    )
    mut.write.mode("overwrite").parquet(os.path.join(bundle2, "postings_t"))
    shutil.rmtree(os.path.join(bundle2, "postings"))
    shutil.move(
        os.path.join(bundle2, "postings_t"),
        os.path.join(bundle2, "postings"),
    )
    with _pytest.raises(serving.BundleIntegrityError, match="postings"):
        serving.read_index_bundle(spark, bundle2)
    # verify=False is the documented escape hatch for forensics
    got = serving.read_index_bundle(spark, bundle2, verify=False)
    assert got["postings"].count() == 100


# ------------------------------------------------------- recall monitor


def test_recall_at_k_semantics(spark):
    """Integer recall core: per-query intersection counts, zero-hit
    queries kept via the truth side's query list, result-side extras
    ignored."""
    from wasaffi_spark.operators.similarity import recall_at_k

    truth = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 20), (2, 21), (3, 30), (3, 31)],
        "qid bigint, nid bigint",
    )
    got = spark.createDataFrame(
        [(1, 10), (1, 99), (2, 20), (2, 21), (2, 77)],
        "qid bigint, nid bigint",
    )
    out = {r.qid: r.hits for r in recall_at_k(got, truth).collect()}
    assert out == {1: 1, 2: 2, 3: 0}


@pytest.mark.slow
def test_recall_monitor_perfect_in_equivalence_regime(spark):
    """On the orthogonal fixture (maintained search ≡ brute force,
    pinned above) the monitor must read hits == k for every query —
    the gauge agrees with the equivalence proof."""
    from wasaffi_spark.operators import similarity

    base, batch, deletes, queries = _orthogonal_fixture(spark)
    graph = similarity.knn_descent(base, k=6, rounds=4, ring=4)
    got = similarity.graph_maintained_search(
        queries, graph, base, batch, deletes,
        k=4, k_graph=6, beam=12, rounds=4, n_entry=4, ring=4,
    )
    alive = (
        base.unionByName(batch)
        .join(deletes.withColumnRenamed("vec_id", "_d"),
              F.col("vec_id") == F.col("_d"), "left_anti")
    )
    truth = similarity.brute_force_topk(queries, alive, k=4)
    out = similarity.recall_at_k(got, truth).collect()
    assert len(out) == 4 and all(r.hits == 4 for r in out), out


def test_bundle_diff_statuses(spark, tmp_path):
    """Manifest-only bundle diff: unchanged / changed / added / removed
    all classified without reading any component data."""
    from wasaffi_spark.operators import serving

    base = spark.createDataFrame(
        [(i, float(i)) for i in range(20)], "id bigint, v double"
    )
    other = spark.createDataFrame(
        [(i, float(i) * 2) for i in range(25)], "id bigint, v double"
    )
    a_dir, b_dir = str(tmp_path / "a"), str(tmp_path / "b")
    serving.export_index_bundle(
        spark, a_dir, {"cents": base, "postings": base, "graph": base}
    )
    serving.export_index_bundle(
        spark, b_dir,
        {"cents": base, "postings": other, "tombstones": base},
    )
    got = {
        r.component: r.status
        for r in serving.bundle_diff(spark, a_dir, b_dir).collect()
    }
    assert got == {
        "cents": "unchanged",
        "postings": "changed",
        "graph": "removed",
        "tombstones": "added",
    }


def test_ivf_recall_monitor_perfect_at_full_probe(spark):
    """With n_probe == n_cells the maintained-IVF search is exact
    (maintenance is exact + probing every cell degenerates to brute
    force), so the gauge must read hits == k everywhere — the IVF
    gauge isolates pure probe loss and nothing else."""
    from wasaffi_spark.operators import similarity

    base, batch, deletes, queries = _orthogonal_fixture(spark)
    got = similarity.ivf_maintained_topk(
        queries, base, batch, deletes, k=4, n_cells=4, n_probe=4,
        iters=2, dim=16,
    )
    alive = (
        base.unionByName(batch)
        .join(deletes.withColumnRenamed("vec_id", "_d"),
              F.col("vec_id") == F.col("_d"), "left_anti")
    )
    truth = similarity.brute_force_topk(queries, alive, k=4)
    out = similarity.recall_at_k(got, truth).collect()
    assert len(out) == 4 and all(r.hits == 4 for r in out), out
