"""Round-7 operators: composed filtered×IVF vector search.

Pins the contract filtered_ivf_topk declares: exact agreement with the
flat pre-filter form when the index degenerates to one cell, same-label
/ never-self / probed-cell-subset semantics in the multi-cell case, and
the documented NULL-attribute behavior (no slice → no candidates).
"""

from __future__ import annotations

import pytest

import random

from pyspark.sql import functions as F

from wasaffi_spark.operators import similarity


def _vecs(n, d=64, seed=7):
    rng = random.Random(seed)
    return [
        (i, i % 3, [rng.uniform(-1, 1) for _ in range(d)]) for i in range(n)
    ]


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id bigint, label int, embedding array<float>"
    )


def test_filtered_ivf_single_cell_equals_flat_filtered(spark):
    # with one IVF cell probed, the composition must reproduce the flat
    # pre-filter ranking EXACTLY (same neighbours, same rounded cosine,
    # same tiebreaks)
    df = _df(spark, _vecs(36))
    q = df.where(F.col("vec_id") < 3)
    flat = {
        (r.qid, r.rank): (r.nid, r.cos_sim)
        for r in similarity.filtered_topk(q, df, k=4).collect()
    }
    comp = {
        (r.qid, r.rank): (r.nid, r.cos_sim)
        for r in similarity.filtered_ivf_topk(
            q, df, k=4, n_cells=1, n_probe=1
        ).collect()
    }
    assert comp == flat


def test_filtered_ivf_multicell_semantics(spark):
    # multi-cell: every returned neighbour shares the query's label, is
    # never the query itself, and lives inside one of the query's
    # probed cells; ranks are 1..k' dense per query
    df = _df(spark, _vecs(60))
    q = df.where(F.col("vec_id") < 3)
    out = similarity.filtered_ivf_topk(
        q, df, k=3, n_cells=8, n_probe=2
    ).collect()
    assert all(r.nid % 3 == r.qid % 3 and r.nid != r.qid for r in out)
    by_q = {}
    for r in out:
        by_q.setdefault(r.qid, []).append(r.rank)
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
    # probed-cell subset: recompute the routing with the same machinery
    cents = similarity.hashed_centroids(df, 8)
    assigned = similarity.ivf_assign_hashed(df, cents, 8)
    cell_of = {r.vec_id: r.cell for r in assigned.collect()}
    qp = q.select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    _, probes = similarity._ivf_probes(
        qp, df, 8, 2, 64, similarity.PQ_QUANT, "embedding", "vec_id",
        similarity.IVF_SEED,
    )
    probed = {}
    for r in probes.collect():
        probed.setdefault(r.qid, set()).add(r.cell)
    for r in out:
        assert cell_of[r.nid] in probed[r.qid], (r.qid, r.nid)


def test_filtered_ivf_null_label_returns_no_rows(spark):
    rows = _vecs(20)
    df = _df(spark, rows)
    df = df.withColumn(
        "label",
        F.when(F.col("vec_id") == 1, F.lit(None)).otherwise(F.col("label")),
    )
    out = similarity.filtered_ivf_topk(
        df.where(F.col("vec_id") < 2), df, k=3, n_cells=2, n_probe=2
    )
    got = out.collect()
    # query 1 (NULL label) contributes nothing; query 0 still answers
    assert all(r.qid == 0 for r in got)
    assert len(got) > 0


def test_bpe_segment_single_pass_plan(spark):
    # the merge table must live in DATA, not the plan: the optimized
    # plan contains a constant number of replace() calls regardless of
    # merge count (r7 rewrite — previously one crossJoin + two
    # replaces PER RANK)
    from wasaffi_spark.operators import bpe

    docs = spark.createDataFrame(
        [(1, "hey hello help"), (2, "low lower lowest hello")],
        "doc_id bigint, text string",
    )
    m2 = bpe.bpe_train(docs, k_merges=2)
    m6 = bpe.bpe_train(docs, k_merges=6)
    p2 = spark._jvm.PythonSQLUtils.explainString(
        bpe.bpe_segment(docs, m2)._jdf.queryExecution(), "extended"
    )
    p6 = spark._jvm.PythonSQLUtils.explainString(
        bpe.bpe_segment(docs, m6)._jdf.queryExecution(), "extended"
    )
    assert p2.count("replace(") == p6.count("replace(")
    # and the fold applies merges in rank order: training's own vocab
    # round-trips (fertility of the training words reflects all merges)
    out = {r.doc_id: r.n_bpe_tokens for r in bpe.bpe_segment(docs, m6).collect()}
    assert set(out) == {1, 2} and all(v > 0 for v in out.values())


def test_hot_shingle_valve_bounds_pair_fanout(spark):
    # 12 docs all share one boilerplate shingle; with the valve at
    # df<=8 that shingle stops counting, so docs whose ONLY overlap is
    # the boilerplate produce no pair, while genuinely similar docs
    # (sharing rare shingles) still match — and their jaccard is
    # computed over the TRIMMED universe
    from wasaffi_spark.operators import dedup

    boiler = "all rights reserved by the original author here"
    rows = []
    for i in range(10):
        rows.append((i, "en", f"{boiler} unique{i} a b c d e f g"))
    # docs 10/11: near-identical beyond the boilerplate
    rows.append((10, "en", f"{boiler} the quick brown fox jumps over lazy dogs"))
    rows.append((11, "en", f"{boiler} the quick brown fox jumps over lazy dogs"))
    df = spark.createDataFrame(rows, "doc_id bigint, lang string, text string")
    capped = dedup.jaccard_pairs(
        df, threshold=0.5, max_shingle_df=8
    ).collect()
    # only the 10-11 pair survives; its jaccard is 1.0 over the
    # trimmed universe (their non-boilerplate shingles are identical)
    assert {(r.id_a, r.id_b) for r in capped} == {(10, 11)}
    assert all(r.jaccard == 1.0 for r in capped)
    # without the valve the boilerplate shingles connect everything
    uncapped = dedup.jaccard_pairs(df, threshold=0.5).collect()
    assert len(uncapped) > 1
    # containment shares the same valve
    cont = dedup.containment_pairs(
        df, threshold=0.5, max_shingle_df=8
    ).collect()
    assert {(r.id_src, r.id_dst) for r in cont} == {(10, 11), (11, 10)}


def test_ivf_pq_residual_single_cell_equals_flat_pq(spark):
    # with one coarse cell the centroid cancels identically:
    # (g(v)-g(c)) - (g(sv)-g(c)) = g(v)-g(sv), so codes AND ADC sums
    # must equal plain pq_topk's — the flat<->composed bridge
    import random

    rng = random.Random(5)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(48)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    q = df.where(F.col("vec_id") < 3)
    flat = {
        (r.qid, r.rank): (r.nid, r.adist)
        for r in similarity.pq_topk(q, df, k=4).collect()
    }
    one = {
        (r.qid, r.rank): (r.nid, r.adist)
        for r in similarity.ivf_pq_residual_topk(
            q, df, k=4, n_cells=1, n_probe=1
        ).collect()
    }
    assert one == flat


@pytest.mark.slow
def test_ivf_pq_residual_multicell_semantics(spark):
    import random

    rng = random.Random(9)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(80)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    q = df.where(F.col("vec_id") < 3)
    out = similarity.ivf_pq_residual_topk(
        q, df, k=3, n_cells=8, n_probe=2
    )
    got = out.collect()
    # every neighbour lives in one of the query's probed cells
    cents = similarity.hashed_centroids(df, 8)
    assigned = similarity.ivf_assign_hashed(df, cents, 8)
    cell_of = {r.vec_id: r.cell for r in assigned.collect()}
    qp = q.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qv"))
    _, probes = similarity._ivf_probes(
        qp, df, 8, 2, 64, similarity.PQ_QUANT, "embedding", "vec_id",
        similarity.IVF_SEED,
    )
    probed = {}
    for r in probes.collect():
        probed.setdefault(r.qid, set()).add(r.cell)
    assert got and all(
        cell_of[r.nid] in probed[r.qid] and r.nid != r.qid for r in got
    )
    # determinism across physical layouts
    again = similarity.ivf_pq_residual_topk(
        q, df.repartition(7), k=3, n_cells=8, n_probe=2
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))
    # rerank path returns the exact-search schema
    rr = similarity.ivf_pq_residual_topk(
        q, df, k=2, n_cells=8, n_probe=2, rerank=8
    )
    assert rr.columns == ["qid", "nid", "cos_sim", "rank"]
    assert len(rr.collect()) > 0


def _plain(spark, n=48):
    rows = [(i, v) for i, _l, v in _vecs(n)]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def test_ivf_lloyd_zero_iters_equals_hashed(spark):
    # iters=0 returns the (grid-snapped) hash-sampled seeds; the snap is
    # invisible to the integer-grid distances, so the whole index must
    # reproduce ivf_topk_hashed EXACTLY — neighbours, rounded cosines,
    # ranks
    df = _plain(spark)
    q = df.where(F.col("vec_id") < 3)
    hashed = sorted(
        map(tuple, similarity.ivf_topk_hashed(q, df, k=3, n_cells=8, n_probe=2).collect())
    )
    lloyd0 = sorted(
        map(
            tuple,
            similarity.ivf_topk_lloyd(
                q, df, k=3, n_cells=8, n_probe=2, iters=0
            ).collect(),
        )
    )
    assert lloyd0 == hashed


@pytest.mark.slow
def test_ivf_lloyd_deterministic_under_repartition(spark):
    # grid-exact training: per-dimension member sums are integers, so
    # centroids (and therefore every assignment/probe/rank) must not
    # depend on partitioning
    df = _plain(spark)
    q = df.where(F.col("vec_id") < 3)
    a = sorted(
        map(
            tuple,
            similarity.ivf_topk_lloyd(q, df, k=3, n_cells=8, n_probe=2, iters=2).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            similarity.ivf_topk_lloyd(
                q, df.repartition(5), k=3, n_cells=8, n_probe=2, iters=2
            ).collect(),
        )
    )
    assert a == b


def test_lloyd_training_reduces_quantization_error(spark):
    # Lloyd's monotonicity, on the grid: total integer-grid L2 from each
    # vector to its assigned centroid must not increase from the seed
    # codebook to the trained one (fixture is fixed, so this is a
    # deterministic pin, not a flaky property)
    df = _plain(spark, 60)

    def sse(cents):
        assigned = similarity.ivf_assign_hashed(df, cents, 8)
        joined = assigned.join(
            cents.withColumnRenamed("cell", "cell2"),
            F.col("cell") == F.col("cell2"),
        )
        # r13: _pq_grid_dist takes column NAMES (server-side-parsed SQL)
        d = similarity._pq_grid_dist(
            "embedding", "cv", 0, 64, similarity.PQ_QUANT
        )
        return joined.select(F.sum(d).alias("s")).collect()[0]["s"]

    seeds = similarity.lloyd_centroids(df, n_cells=8, iters=0)
    trained = similarity.lloyd_centroids(df, n_cells=8, iters=2)
    assert sse(trained) <= sse(seeds)


def test_lloyd_centroids_live_on_the_grid(spark):
    # every trained centroid coordinate is an exact multiple of
    # 1/quant — the property that makes the oracle replay possible
    df = _plain(spark)
    rows = similarity.lloyd_centroids(df, n_cells=8, iters=2).collect()
    assert len(rows) == 8
    q = similarity.PQ_QUANT
    for r in rows:
        for x in r["cv"]:
            assert x * q == int(x * q)


def _clustered(spark, n=60, d=64, n_clusters=6, noise=0.18, seed=11):
    # planted-cluster corpus: true neighbours are same-cluster, so the
    # seed cells miss some of them and descent has real work to do
    rng = random.Random(seed)
    centers = [
        [rng.uniform(-1, 1) for _ in range(d)] for _ in range(n_clusters)
    ]
    rows = [
        (
            i,
            [
                c + noise * rng.uniform(-1, 1)
                for c in centers[i % n_clusters]
            ],
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def _graph_recall(edges_rows, truth_rows):
    got = {(r.src, r.dst) for r in edges_rows}
    true = {(r.src, r.dst) for r in truth_rows}
    return len(got & true) / len(true)


def test_knn_descent_zero_rounds_no_ring_is_seed_graph(spark):
    df = _clustered(spark)
    seed = sorted(
        map(tuple, similarity.knn_edges_bucketed(df, k=3).collect())
    )
    nnd0 = sorted(
        map(
            tuple,
            similarity.knn_descent(df, k=3, rounds=0, ring=0).collect(),
        )
    )
    assert nnd0 == seed


def test_knn_descent_improves_graph_recall(spark):
    # recall of the directed top-k graph vs the exact cosine top-k
    # graph: each descent round may only swap a neighbour for a
    # strictly better one, so recall is monotone in rounds — and with
    # cells fine enough (bits=5) that the sign-LSH seed is measurably
    # incomplete on this planted-cluster fixture, two rounds must
    # strictly beat round zero (deterministic fixture: a pin, not a
    # flaky property). Measured here: 0.80 -> 0.89.
    df = _clustered(spark, n=120)
    truth = similarity.brute_force_topk(
        df, df, k=3
    ).select(
        F.col("qid").alias("src"), F.col("nid").alias("dst")
    ).collect()
    r0 = similarity.knn_descent(df, k=3, rounds=0, bits=5, ring=4).collect()
    r2 = similarity.knn_descent(df, k=3, rounds=2, bits=5, ring=4).collect()
    rec0 = _graph_recall(r0, truth)
    rec2 = _graph_recall(r2, truth)
    assert rec2 > rec0
    assert rec2 >= 0.85


def test_knn_descent_deterministic_under_repartition(spark):
    df = _clustered(spark, n=48)
    a = sorted(map(tuple, similarity.knn_descent(df, k=3, rounds=2).collect()))
    b = sorted(
        map(
            tuple,
            similarity.knn_descent(df.repartition(7), k=3, rounds=2).collect(),
        )
    )
    assert a == b


def test_knn_descent_reverse_valve_keeps_contract(spark):
    # a tiny max_reverse narrows the candidate pool but every output
    # row must still be a valid dense-ranked top-k: ranks 1..k per src,
    # cos_sim non-increasing within src, never self
    df = _clustered(spark, n=48)
    out = similarity.knn_descent(df, k=3, rounds=2, max_reverse=1).collect()
    assert all(r.src != r.dst for r in out)
    by_src = {}
    for r in out:
        by_src.setdefault(r.src, []).append(r)
    for rows in by_src.values():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        sims = [r.cos_sim for r in rows]
        assert sims == sorted(sims, reverse=True)


def test_prototype_prune_frac_zero_keeps_all(spark):
    df = _plain(spark, 48)
    kept = similarity.prototype_prune(df, frac=0.0, keep="hard")
    assert kept.count() == 48


@pytest.mark.slow
def test_prototype_prune_hard_drops_closest_per_cell(spark):
    # keep="hard" drops the per-cell slice with the SMALLEST prototype
    # distance: within every cell, max(dropped proto_dist) must be <=
    # min(kept proto_dist) under the deterministic (dist, id) order
    df = _plain(spark, 60)
    all_rows = similarity.prototype_prune(df, frac=0.0, keep="hard").collect()
    kept = similarity.prototype_prune(df, frac=0.3, keep="hard").collect()
    kept_ids = {r.vec_id for r in kept}
    by_cell = {}
    for r in all_rows:
        by_cell.setdefault(r.cell, []).append(r)
    dropped_any = False
    for cell, rows in by_cell.items():
        dkeys = sorted(
            (r.proto_dist, r.vec_id) for r in rows if r.vec_id not in kept_ids
        )
        kkeys = sorted(
            (r.proto_dist, r.vec_id) for r in rows if r.vec_id in kept_ids
        )
        if dkeys:
            dropped_any = True
            assert kkeys, f"cell {cell} dropped everything"
            assert dkeys[-1] <= kkeys[0]
    assert dropped_any


@pytest.mark.slow
def test_prototype_prune_easy_and_hard_are_complementary_bands(spark):
    # keep="easy" retains the low-percentile band, keep="hard" the
    # high one; with frac on both sides their union covers the corpus
    # and their intersection is the middle band
    df = _plain(spark, 60)
    hard = {r.vec_id for r in similarity.prototype_prune(df, frac=0.3, keep="hard").collect()}
    easy = {r.vec_id for r in similarity.prototype_prune(df, frac=0.3, keep="easy").collect()}
    assert hard | easy == {r.vec_id for r in df.select("vec_id").collect()}
    assert hard & easy  # middle band is in both


def test_prototype_prune_rejects_bad_keep(spark):
    df = _plain(spark, 12)
    try:
        similarity.prototype_prune(df, keep="medium")
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_mmr_lambda_one_is_plain_topk(spark):
    # mu=0: no redundancy penalty, so the greedy picks are exactly the
    # cosine top-k in rank order
    df = _plain(spark, 40)
    q = df.where(F.col("vec_id") < 2)
    plain = {
        (r.qid, r.rank): r.nid
        for r in similarity.brute_force_topk(q, df, k=3).collect()
    }
    mmr = {
        (r.qid, r.step): r.nid
        for r in similarity.mmr_topk(q, df, k=3, lam=1.0).collect()
    }
    assert mmr == plain


def test_mmr_first_pick_is_most_relevant_and_no_repeats(spark):
    df = _plain(spark, 40)
    q = df.where(F.col("vec_id") < 3)
    out = similarity.mmr_topk(q, df, k=3, lam=0.7).collect()
    top1 = {
        r.qid: r.nid
        for r in similarity.brute_force_topk(q, df, k=1).collect()
    }
    by_q = {}
    for r in out:
        assert r.qid != r.nid
        by_q.setdefault(r.qid, []).append(r)
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r.step)
        assert [r.step for r in rows] == [1, 2, 3]
        assert rows[0].nid == top1[qid]
        assert len({r.nid for r in rows}) == 3


def test_mmr_penalizes_near_duplicates(spark):
    # corpus: a near-duplicate PAIR that is most relevant, and a
    # distinct doc slightly less relevant. Plain top-3 ranks the pair
    # 1-2; MMR at lam=0.5 must pick one of the pair, then promote the
    # distinct doc over the near-copy (whose penalty vs its twin is
    # ~1), then take the copy last.
    q0 = [1.0] * 16 + [0.0] * 48
    a1 = [1.0] * 32 + [0.0] * 32
    a2 = [1.0] * 32 + [0.05] + [0.0] * 31
    b = [1.0] * 16 + [0.0] * 32 + [1.2] * 16
    rows = [(0, q0), (1, a1), (2, a2), (3, b)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    q = df.where(F.col("vec_id") == 0)
    plain = [
        r.nid
        for r in similarity.brute_force_topk(q, df, k=3)
        .orderBy("rank")
        .collect()
    ]
    assert plain[:2] in ([1, 2], [2, 1]) and plain[2] == 3
    mmr = [
        r.nid
        for r in similarity.mmr_topk(q, df, k=3, lam=0.5)
        .orderBy("step")
        .collect()
    ]
    assert mmr[0] in (1, 2)
    assert mmr[1] == 3, f"MMR should promote the distinct doc, got {mmr}"


def test_label_ranking_metrics_hand_computed(spark):
    # 1 query (id 0, label 0), corpus labels: ids 1,3 share label 0;
    # ids 2,4 don't. Ranked results: rank1=2 (miss), rank2=1 (hit),
    # rank3=3 (hit). n_rel=2, hits=2, rr=1/2, recall@3 = 2/min(2,3)=1,
    # dcg = g2+g3, idcg = g1+g2 (n_rel=2 < k)
    from wasaffi_spark.operators import retrieval

    labels = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 1), (3, 0), (4, 1)], "vec_id bigint, label int"
    )
    results = spark.createDataFrame(
        [(0, 2, 1), (0, 1, 2), (0, 3, 3)], "qid bigint, nid bigint, rank int"
    )
    out = retrieval.label_ranking_metrics(results, labels, k=3).collect()
    assert len(out) == 1
    r = out[0]
    g = retrieval.ndcg_gains(3)
    assert (r.n_rel, r.hits) == (2, 2)
    assert r.rr == 0.5
    assert r.recall_capped_at_k == 1.0
    assert r.ndcg_at_k == round((g[1] + g[2]) / (g[0] + g[1]), 6)


def test_label_ranking_metrics_perfect_and_zero(spark):
    from wasaffi_spark.operators import retrieval

    labels = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (3, 1), (9, 2)], "vec_id bigint, label int"
    )
    # query 0: both hits at ranks 1-2 (n_rel=2, perfect);
    # query 9: label 2 has no other members -> all metrics 0
    results = spark.createDataFrame(
        [(0, 1, 1), (0, 2, 2), (9, 1, 1), (9, 3, 2)],
        "qid bigint, nid bigint, rank int",
    )
    out = {r.qid: r for r in retrieval.label_ranking_metrics(results, labels, k=2).collect()}
    assert out[0].rr == 1.0 and out[0].recall_capped_at_k == 1.0 and out[0].ndcg_at_k == 1.0
    assert out[9].n_rel == 0
    assert out[9].rr == 0.0 and out[9].recall_capped_at_k == 0.0 and out[9].ndcg_at_k == 0.0


def test_bm25_mmr_lambda_one_is_bm25_order(spark):
    # mu=0: picks are exactly the BM25 ranking (max-normalization is
    # monotone), so the composed op degenerates to bm25_topk
    from wasaffi_spark.operators import retrieval

    docs = spark.createDataFrame(
        [
            (1, "spark join hash join merge"),
            (2, "spark spark window rank"),
            (3, "dup dup dup spark hash"),
            (4, "window merge dup rank hash"),
            (5, "unrelated words entirely here"),
        ],
        "doc_id bigint, text string",
    )
    q = spark.createDataFrame(
        [("q1", "spark"), ("q1", "hash"), ("q2", "dup")],
        "query_id string, term string",
    )
    plain = {
        (r.query_id, r.rank): r.doc_id
        for r in retrieval.bm25_topk(docs, q, k=3).collect()
    }
    mmr = {
        (r.qid, r.step): r.nid
        for r in retrieval.bm25_mmr(docs, q, k=3, lam=1.0).collect()
    }
    assert mmr == plain


def test_bm25_mmr_contract(spark):
    # first pick is the BM25 top hit (rel = 1.0), no repeats, dense
    # steps per query
    from wasaffi_spark.operators import retrieval

    docs = spark.createDataFrame(
        [(i, f"spark hash join term{i} " + "filler " * (i % 4)) for i in range(1, 9)],
        "doc_id bigint, text string",
    )
    q = spark.createDataFrame(
        [("q1", "spark"), ("q1", "hash")], "query_id string, term string"
    )
    out = retrieval.bm25_mmr(docs, q, k=3, lam=0.5).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.qid, []).append(r)
    for rows in by_q.values():
        rows.sort(key=lambda r: r.step)
        assert [r.step for r in rows] == list(range(1, len(rows) + 1))
        assert rows[0].rel == 1.0
        assert len({r.nid for r in rows}) == len(rows)


def test_top_pc_power_matches_numpy_eigenvector(spark):
    # planted dominant direction u: corpus rows = a*u + noise; after 3
    # grid-exact power rounds the returned w must align with numpy's
    # top eigenvector of G'G (|cos| >= 0.99 — sign is convention)
    import numpy as np

    rng = random.Random(23)
    u = [1.0 if i < 8 else 0.0 for i in range(64)]
    rows = []
    for i in range(80):
        a = rng.uniform(0.5, 1.0) * (1 if i % 2 else -1)
        v = [a * u[j] + 0.05 * rng.uniform(-1, 1) for j in range(64)]
        rows.append((i, v))
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    w = np.array(similarity.top_pc_power(df, iters=3), dtype=float)

    G = np.array(
        [[float(np.floor(x * similarity.PQ_QUANT + 0.5)) for x in r[1]] for r in rows]
    )
    C = G.T @ G
    vals, vecs = np.linalg.eigh(C)
    v1 = vecs[:, -1]
    cos = abs(float(w @ v1) / (np.linalg.norm(w) * np.linalg.norm(v1)))
    assert cos >= 0.99, cos


def test_top_pc_power_deterministic_under_repartition(spark):
    df = _plain(spark, 50)
    a = similarity.top_pc_power(df, iters=2)
    b = similarity.top_pc_power(df.repartition(7), iters=2)
    assert a == b
    assert max(abs(x) for x in a) == 1024  # L-inf normalized to scale
