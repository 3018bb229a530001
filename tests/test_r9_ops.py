"""Round-9 operators: incremental index maintenance — ivf_append
(assign-to-frozen-codebook) and graph_insert (search-then-link) — plus
their insert≡rebuild equivalence pins."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

needs_data = pytest.mark.skipif(
    not os.path.isdir(SF_SMOKE), reason="testdata not present"
)


# ----------------------------------------------------------- ivf_append


@needs_data
def test_ivf_append_postings_equal_rebuild_assignment(spark):
    """The core incremental-IVF contract: base postings ∪ appended
    batch postings must be ROW-IDENTICAL to assigning base∪batch in
    one pass against the same frozen codebook — appending never
    perturbs existing postings and never produces a different cell for
    a new vector than a rebuild-assignment would."""
    from wasaffi_spark.operators import similarity
    from wasaffi_spark.sources.parquet import read_parquet

    emb = read_parquet(spark, SF_SMOKE + "/embeddings.parquet").where(
        F.col("vec_id") < 200
    )
    base = emb.where(F.col("vec_id") % 8 != 7)
    batch = emb.where(F.col("vec_id") % 8 == 7)
    cents = similarity.lloyd_centroids(base, n_cells=8, iters=2)
    onepass = similarity.ivf_assign_hashed(
        base.unionByName(batch), cents, 8
    ).select("vec_id", "cell")
    incr = (
        similarity.ivf_assign_hashed(base, cents, 8)
        .unionByName(similarity.ivf_append(batch, cents, n_cells=8))
        .select("vec_id", "cell")
    )
    assert sorted(map(tuple, incr.collect())) == sorted(
        map(tuple, onepass.collect())
    )


@needs_data
@pytest.mark.slow
def test_ivf_append_empty_batch_degenerates_to_lloyd(spark):
    """With an empty ingest batch the incremental search must equal
    ivf_topk_lloyd exactly — same codebook, same postings, same probe
    contract."""
    from wasaffi_spark.operators import similarity
    from wasaffi_spark.sources.parquet import read_parquet

    emb = read_parquet(spark, SF_SMOKE + "/embeddings.parquet").where(
        F.col("vec_id") < 150
    )
    queries = emb.where(F.col("vec_id") < 4)
    empty = emb.where(F.col("vec_id") < 0)
    a = similarity.ivf_append_topk(
        queries, emb, empty, k=3, n_cells=8, n_probe=2, iters=2
    )
    b = similarity.ivf_topk_lloyd(
        queries, emb, k=3, n_cells=8, n_probe=2, iters=2
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


# ---------------------------------------------------------- graph_insert


def _emb_df(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>"
    )


def test_graph_insert_equals_rebuild_on_planted_clusters(spark):
    """Insert≡rebuild on a fixture inside the equivalence regime: 4
    ORTHOGONAL well-separated clusters (in-cluster cosine ≈ 1,
    out-cluster ≈ 0, so the neighbour relation is symmetric and k=6
    exactly covers a cluster), one new node per cluster. (a) each new
    node's spliced out-edges must equal its brute-force top-k over the
    base — what a rebuild's converged descent would give it
    (restricted to base: batch inserts search a frozen snapshot,
    new→new links are the next rebuild's job, and here each cluster
    holds one new node so the restriction is vacuous); (b) every
    spliced base node's updated adjacency must equal its brute-force
    top-k over base∪new — the full rebuild truth, including EVICTION:
    the in-cluster new node displaces the old out-cluster 6th edge."""
    import numpy as np

    from wasaffi_spark.operators import similarity

    rng = np.random.default_rng(77)
    centers = np.zeros((4, 16))
    for j in range(4):
        centers[j, j] = 20.0  # orthogonal, far apart
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
    batch = _emb_df(
        spark,
        [
            (
                100 + j,
                [float(x) for x in centers[j]
                 + 0.05 * rng.standard_normal(16)],
            )
            for j in range(4)
        ],
    )
    graph = similarity.knn_descent(base, k=6, rounds=4, ring=4)
    out = similarity.graph_insert(
        batch, graph, base, k=6, beam=12, rounds=4, n_entry=4, ring=4
    ).collect()

    fwd = {(r.src, r.dst) for r in out if r.src >= 100}
    exact_new = similarity.brute_force_topk(batch, base, k=6)
    assert fwd == {(r.qid, r.nid) for r in exact_new.collect()}

    aff = sorted({r.src for r in out if r.src < 100})
    assert aff, "no base node was spliced"
    full = base.unionByName(batch)
    truth = similarity.brute_force_topk(
        base.where(F.col("vec_id").isin(aff)), full, k=6
    )
    got_aff = {(r.src, r.dst) for r in out if r.src < 100}
    assert got_aff == {(r.qid, r.nid) for r in truth.collect()}


def test_graph_insert_reverse_valve_caps_and_is_deterministic(spark):
    """A hub-shaped batch (every new node nearest the same base
    cluster) must not blow up any base node's merge: with
    max_reverse=2, a spliced base adjacency may contain at most 2 new
    ids, and they are the 2 SMALLEST new ids (the deterministic
    smallest-id valve), not the best-scoring ones."""
    import numpy as np

    from wasaffi_spark.operators import similarity

    rng = np.random.default_rng(5)
    c = 3.0 * rng.standard_normal(16)
    far = -c
    base = _emb_df(
        spark,
        [(i, [float(x) for x in c + 0.03 * rng.standard_normal(16)])
         for i in range(6)]
        + [(10 + i, [float(x) for x in far + 0.03 * rng.standard_normal(16)])
           for i in range(6)],
    )
    batch = _emb_df(
        spark,
        [(200 + j, [float(x) for x in c + 0.03 * rng.standard_normal(16)])
         for j in range(5)],
    )
    graph = similarity.knn_descent(base, k=4, rounds=3, ring=3)
    out = similarity.graph_insert(
        batch, graph, base, k=4, beam=12, rounds=3, n_entry=3, ring=3,
        max_reverse=2,
    ).collect()
    by_src: dict[int, list[int]] = {}
    offers: dict[int, list[int]] = {}
    for r in out:
        if r.src < 100:
            by_src.setdefault(r.src, []).append(r.dst)
        else:
            offers.setdefault(r.dst, []).append(r.src)
    assert by_src, "no base node spliced"
    for src, dsts in by_src.items():
        new_in = sorted(d for d in dsts if d >= 200)
        assert len(new_in) <= 2, (src, dsts)
        # the valve keeps the SMALLEST new ids offered to this node —
        # a prefix of its offer set, regardless of score
        kept_prefix = sorted(offers.get(src, []))[:2]
        assert set(new_in) <= set(kept_prefix), (src, new_in, kept_prefix)


@pytest.mark.slow
def test_graph_insert_deterministic(spark):
    import numpy as np

    from wasaffi_spark.operators import similarity

    rng = np.random.default_rng(11)
    rows = [
        (i, [float(x) for x in rng.standard_normal(8)]) for i in range(40)
    ]
    base = _emb_df(spark, rows[:32])
    batch = _emb_df(spark, [(100 + i, v) for i, (_, v) in enumerate(rows[32:])])
    graph = similarity.knn_descent(base, k=4, rounds=2, ring=2)
    a = similarity.graph_insert(batch, graph, base, k=4, beam=8, rounds=3)
    b = similarity.graph_insert(batch, graph, base, k=4, beam=8, rounds=3)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


# ------------------------------------------------------ tokenizer compare


def test_bpe_apply_words_roundtrip_and_matches_segment(spark):
    """bpe_apply_words must (a) be round-trip lossless (replace(seq,
    SEP, '') == word — the invariant tokenizer_compare declares as a
    hash-checked zero column) and (b) aggregate back to exactly
    bpe_segment's per-document counts when summed over word
    instances — the per-word and per-doc apply paths cannot drift."""
    from wasaffi_spark.operators import bpe

    docs = spark.createDataFrame(
        [
            (0, "the cat sat on the mat the cat"),
            (1, "a cat and a hat and a mat"),
            (2, "the hat sat on a cat"),
        ],
        "doc_id bigint, text string",
    )
    merges = bpe.bpe_train(docs, k_merges=4)
    words = bpe.word_freq_table(docs).select("word")
    aw = bpe.bpe_apply_words(words, merges)
    rows = aw.collect()
    assert rows
    for r in rows:
        assert r.seq.replace(bpe.SEP, "") == r.word, (r.word, r.seq)

    toks = F.filter(
        F.split(F.lower(F.coalesce(F.col("text"), F.lit(""))), r"\s+"),
        lambda x: x != F.lit(""),
    )
    dwf = (
        docs.select("doc_id", F.explode(toks).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("dfreq"))
    )
    via_words = {
        r.doc_id: (r.t, r.w)
        for r in dwf.join(aw, "word")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("dfreq") * F.col("n_sub")).alias("t"),
            F.sum("dfreq").alias("w"),
        )
        .collect()
    }
    via_segment = {
        r.doc_id: (r.n_bpe_tokens, r.n_words)
        for r in bpe.bpe_segment(docs, merges).collect()
    }
    assert via_words == via_segment


# ---------------------------------------------------------- graph_delete


def test_graph_delete_repairs_cluster_neighbourhood(spark):
    """Delete-with-repair on the orthogonal-cluster fixture: removing
    one node per cluster must (a) leave no edge pointing into the
    deleted set, (b) reconnect every affected node to ALL of its
    surviving in-cluster siblings — the point of the FreshDiskANN
    bridge rule: the hole a deleted hub leaves must not disconnect
    its cluster — and (c) never invent an edge the rebuild truth
    (brute top-k over corpus∖D) wouldn't have. The repaired adjacency
    is NOT asserted equal to the full rebuild: local repair routes
    around the hole via the deleted node's own out-neighbours, so
    out-cluster tail edges only a global rebuild would discover are
    out of contract by design (the docstring's accumulated-deletions
    caveat — production interleaves repairs with periodic rebuilds)."""
    import numpy as np

    from wasaffi_spark.operators import similarity

    rng = np.random.default_rng(19)
    centers = np.zeros((4, 16))
    for j in range(4):
        centers[j, j] = 20.0
    corpus = _emb_df(
        spark,
        [
            (
                i,
                [float(x) for x in centers[i % 4]
                 + 0.05 * rng.standard_normal(16)],
            )
            for i in range(28)
        ],
    )
    graph = similarity.knn_descent(corpus, k=6, rounds=4, ring=4)
    dele = corpus.where(F.col("vec_id") < 4).select("vec_id")  # one per cluster
    out = similarity.graph_delete(dele, graph, corpus, k=6).collect()
    assert out
    deleted = {0, 1, 2, 3}
    assert not {r.src for r in out} & deleted
    assert not {r.dst for r in out} & deleted

    got = {(r.src, r.dst) for r in out}
    aff = sorted({r.src for r in out})
    # (b) full surviving in-cluster neighbourhood present
    want_cluster = {
        (b, s)
        for b in aff
        for s in range(4, 28)
        if s != b and s % 4 == b % 4
    }
    assert want_cluster <= got
    # (c) nothing outside the rebuild truth
    survivors = corpus.where(F.col("vec_id") >= 4)
    truth = {
        (r.qid, r.nid)
        for r in similarity.brute_force_topk(
            survivors.where(F.col("vec_id").isin(aff)), survivors, k=6
        ).collect()
    }
    assert got <= truth


def test_graph_delete_deterministic_and_bounded(spark):
    import numpy as np

    from wasaffi_spark.operators import similarity

    rng = np.random.default_rng(23)
    corpus = _emb_df(
        spark,
        [(i, [float(x) for x in rng.standard_normal(8)]) for i in range(40)],
    )
    graph = similarity.knn_descent(corpus, k=4, rounds=2, ring=2)
    dele = corpus.where(F.col("vec_id") % 10 == 0).select("vec_id")
    a = similarity.graph_delete(dele, graph, corpus, k=4)
    b = similarity.graph_delete(dele, graph, corpus, k=4)
    ra = sorted(map(tuple, a.collect()))
    assert ra == sorted(map(tuple, b.collect()))
    # only affected nodes emit rows, each with at most k edges
    by_src: dict[int, int] = {}
    for r in ra:
        by_src[r[0]] = by_src.get(r[0], 0) + 1
    assert all(c <= 4 for c in by_src.values())
    into_del = {
        r.src
        for r in graph.where(F.col("dst").isin([0, 10, 20, 30])).collect()
        if r.src % 10 != 0
    }
    assert set(by_src) == into_del


# ------------------------------------------------------ ivf_retrain_delta


@needs_data
@pytest.mark.slow
def test_ivf_retrain_delta_reconciliation_identity(spark):
    """The refresh contract: applying the delta to the OLD postings —
    replace old_cell with new_cell for exactly the delta ids — must
    reproduce the full-retrain assignment row-for-row, so a partial
    rewrite of only the moved rows' partitions is provably equivalent
    to a full re-snapshot. Also pins that the delta only lists rows
    that actually moved and that undrifted corpora yield small deltas
    relative to N (sanity, not a tuned threshold)."""
    from pyspark.sql import functions as F

    from wasaffi_spark.operators import similarity
    from wasaffi_spark.sources.parquet import read_parquet

    emb = read_parquet(spark, SF_SMOKE + "/embeddings.parquet").where(
        F.col("vec_id") < 300
    )
    base = emb.where(F.col("vec_id") % 8 != 7)
    delta = {
        r.vec_id: (r.old_cell, r.new_cell)
        for r in similarity.ivf_retrain_delta(
            base, emb, n_cells=8, iters=2
        ).collect()
    }
    assert all(o != n for o, n in delta.values())

    old_c = similarity.lloyd_centroids(base, n_cells=8, iters=2)
    # the refresh WARM-STARTS from the deployed codebook (cell ids stay
    # anchored; a cold retrain would relabel cells wholesale and the
    # "delta" would be label permutation, not drift)
    new_c = similarity.lloyd_centroids(
        emb, n_cells=8, iters=2, init_cents=old_c
    )
    old_post = {
        r.vec_id: r.cell
        for r in similarity.ivf_assign_hashed(emb, old_c, 8).collect()
    }
    new_post = {
        r.vec_id: r.cell
        for r in similarity.ivf_assign_hashed(emb, new_c, 8).collect()
    }
    patched = dict(old_post)
    for vid, (old, new) in delta.items():
        assert patched[vid] == old  # the delta's old side is truthful
        patched[vid] = new
    assert patched == new_post
    assert len(delta) < len(old_post)  # a refresh moves a strict subset
