"""Round-8 operators: unigram-LM tokenizer training (hard-EM on the
integer grid with the literal log-gain table), graph-ANN beam search
over the NN-descent graph, and the IVF-shortlisted MMR composition."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

needs_data = pytest.mark.skipif(
    not os.path.isdir(SF_SMOKE), reason="testdata not present"
)


# ---------------------------------------------------------------- unigram


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "doc_id bigint, text string"
    )


def test_unigram_hand_computed_tiny(spark):
    """A corpus where 'ab' dominates: the trained vocab must keep the
    'ab'/'abab' pieces with live counts (all singles drop to count 0 —
    every word is covered by multis), every single char survives the
    prune (clamped floor), and the 6-char word 'ababab' — too long to
    be a single piece — must segment with MULTI-char pieces, not chars
    (the log-gain objective prefers the frequent subwords; a raw
    product-of-grid-ints objective degenerates to chars — the length
    normalizer is load-bearing, see unigram.py docstring)."""
    from wasaffi_spark.operators import unigram

    docs = _docs(
        spark, ["ab ab ab ab abab abab ababab cd", "ab abab ababab cd cd"]
    )
    voc = unigram.unigram_train(docs)
    pieces = {r.piece: (r.cnt, r.p_q) for r in voc.collect()}
    assert "ab" in pieces and pieces["ab"][0] > 0
    assert "abab" in pieces and pieces["abab"][0] > 0
    for ch in "abcd":
        assert ch in pieces, f"single {ch!r} pruned"
    rows = unigram._vocab_rows(
        voc.withColumn(
            "g",
            F.element_at(
                F.array(*[F.lit(g) for g in unigram.log_gains()]),
                F.col("p_q").cast("int"),
            ).cast("long"),
        )
    )
    words = unigram.train_words(docs).localCheckpoint(eager=True)
    segs = {
        r.word: r.seq.split(unigram.SEP)[:-1]
        for r in unigram.viterbi_segment(words, rows).collect()
    }
    assert segs["ababab"] == ["ab", "abab"], segs["ababab"]
    assert "".join(segs["ababab"]) == "ababab"


def test_unigram_segmentations_rejoin(spark):
    """Safety property: every trained-coverage word's best segmentation
    concatenates back to the word (singles floor guarantees a path)."""
    from wasaffi_spark.operators import unigram

    docs = _docs(
        spark,
        ["the cat sat on the mat", "a cat and a hat", "unusual words here"],
    )
    voc = unigram.unigram_train(docs)
    fert = unigram.unigram_fertility(docs, voc).collect()
    assert len(fert) == 3
    assert all(r.n_pieces >= r.n_words for r in fert)
    words = unigram.train_words(docs).localCheckpoint(eager=True)
    g_arr = F.array(*[F.lit(g) for g in unigram.log_gains()])
    rows = unigram._vocab_rows(
        voc.withColumn(
            "g", F.element_at(g_arr, F.col("p_q").cast("int")).cast("long")
        )
    )
    for r in unigram.viterbi_segment(words, rows).collect():
        assert "".join(r.seq.split(unigram.SEP)[:-1]) == r.word


def test_unigram_gain_table_static():
    """The log-gain table is data-independent and anchored: G[Q-1] = 0
    (full mass), G[0] = -SCALE*log2(Q), monotone nondecreasing."""
    from wasaffi_spark.operators import unigram

    g = unigram.log_gains()
    assert len(g) == unigram.UNI_Q
    assert g[-1] == 0
    assert g[0] == -unigram.UNI_LOG_SCALE * 10  # Q = 2^10
    assert all(a <= b for a, b in zip(g, g[1:]))


@needs_data
def test_unigram_fertility_beats_chars(spark):
    """On the real corpus slice the trained tokenizer must do strictly
    better than character splitting: mean fertility < mean word length
    of the <=MAXLEN slice (multis survive training and get used)."""
    from wasaffi_spark.operators import unigram
    from wasaffi_spark.sources.parquet import read_parquet

    docs = read_parquet(spark, SF_SMOKE + "/documents.parquet")
    voc = unigram.unigram_train(docs)
    n_multi = voc.where(F.length("piece") >= 2).count()
    assert n_multi > 0, "all multi-char pieces pruned — degenerate model"
    fert = unigram.unigram_fertility(docs, voc)
    agg = fert.agg(
        F.sum("n_pieces").alias("p"), F.sum("n_words").alias("w")
    ).collect()[0]
    words = unigram.train_words(docs)
    chars = words.agg(
        F.sum(F.length("word") * F.col("freq")).alias("c"),
        F.sum("freq").alias("w"),
    ).collect()[0]
    assert agg.p / agg.w < chars.c / chars.w


# ------------------------------------------------------------ graph search


@pytest.mark.slow
def test_graph_search_recall_on_planted_clusters(spark):
    """On data with real neighbourhood structure (the recall ladder's
    planted-cluster corpus — the fixture embeddings are isotropic, the
    documented ANN worst case where even the graph build is capped
    near chance), beam search over the NN-descent graph must recover
    most of the exact top-3."""
    import numpy as np

    from wasaffi_spark.operators import similarity

    rng = np.random.default_rng(4242)
    centers = rng.standard_normal((20, 64))
    rows = [
        (
            i,
            [float(x) for x in centers[i % 20]
             + 0.15 * rng.standard_normal(64)],
        )
        for i in range(600)
    ]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    queries = emb.where(F.col("vec_id") < 8)
    graph = similarity.knn_descent(emb, k=8, rounds=4, ring=4)
    got = similarity.graph_search_topk(
        queries, graph, emb, k=3, beam=8, rounds=3, n_entry=4
    )
    exact = similarity.brute_force_topk(queries, emb, k=3)
    g = {(r.qid, r.nid) for r in got.collect()}
    e = {(r.qid, r.nid) for r in exact.collect()}
    assert len(g) == len(e) == 24
    recall = len(g & e) / len(e)
    assert recall >= 0.7, f"beam-search recall {recall} too low"


@needs_data
def test_graph_search_deterministic(spark):
    from wasaffi_spark.operators import similarity
    from wasaffi_spark.sources.parquet import read_parquet

    emb = read_parquet(spark, SF_SMOKE + "/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 4)
    graph = similarity.knn_descent(emb, k=4, rounds=1, ring=2)
    a = similarity.graph_search_topk(queries, graph, emb, k=3, rounds=2)
    b = similarity.graph_search_topk(queries, graph, emb, k=3, rounds=2)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


# ---------------------------------------------------------------- MMR/IVF


@needs_data
def test_mmr_candidates_allpairs_equals_default(spark):
    """mmr_topk(candidates=all pairs) must equal the default crossJoin
    generator exactly — the candidates seam changes the generator, not
    the greedy contract."""
    from wasaffi_spark.operators import similarity
    from wasaffi_spark.sources.parquet import read_parquet

    emb = read_parquet(spark, SF_SMOKE + "/embeddings.parquet").where(
        F.col("vec_id") < 60
    )
    queries = emb.where(F.col("vec_id") < 3)
    allpairs = queries.select(F.col("vec_id").alias("qid")).crossJoin(
        emb.select(F.col("vec_id").alias("nid"))
    )
    base = similarity.mmr_topk(queries, emb, k=3, shortlist=8)
    seamed = similarity.mmr_topk(
        queries, emb, k=3, shortlist=8, candidates=allpairs
    )
    assert sorted(map(tuple, base.collect())) == sorted(
        map(tuple, seamed.collect())
    )


# ------------------------------------------------------- label propagation


def test_label_propagation_hand_computed(spark):
    """Chain 1-2-3-4 with a seed at node 1: labels spread one hop per
    round (node 3 labeled after 2 rounds, node 4 still null); a node
    pulled between two equally-frequent labels adopts the smaller
    (deterministic tiebreak); seed labels are clamped."""
    from wasaffi_spark.operators.graph import label_propagation

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (12, 11)],
        "src bigint, dst bigint",
    )
    nodes = spark.createDataFrame(
        [
            (1, 7, True),
            (2, None, False),
            (3, None, False),
            (4, None, False),
            # tie fixture: 11 sees labels 9 (from 12) and 5 (from 10)
            (10, 5, True),
            (11, None, False),
            (12, 9, True),
        ],
        "vec_id bigint, label int, is_seed boolean",
    )
    out = {
        r.vec_id: (r.label, r.is_seed)
        for r in label_propagation(edges, nodes, rounds=2).collect()
    }
    assert out[1] == (7, True)
    assert out[2][0] == 7 and out[3][0] == 7
    assert out[4][0] is None  # 3 hops away, 2 rounds
    assert out[11][0] == 5  # tie between 5 and 9 -> smaller label


def test_label_propagation_seed_clamped(spark):
    """A seed surrounded by differently-labeled neighbours never
    flips."""
    from wasaffi_spark.operators.graph import label_propagation

    edges = spark.createDataFrame(
        [(1, 2), (3, 2), (4, 2)], "src bigint, dst bigint"
    )
    nodes = spark.createDataFrame(
        [(1, 1, True), (3, 1, True), (4, 1, True), (2, 0, True)],
        "vec_id bigint, label int, is_seed boolean",
    )
    out = {
        r.vec_id: r.label
        for r in label_propagation(edges, nodes, rounds=3).collect()
    }
    assert out[2] == 0


@needs_data
@pytest.mark.slow
def test_viterbi_inrow_equals_joins(spark):
    """The single-pass in-row DP must equal the unrolled join+window
    formulation (the literal transcription of the oracle's CTE rounds)
    row for row on a real corpus slice."""
    from wasaffi_spark.operators import unigram
    from wasaffi_spark.sources.parquet import read_parquet

    docs = read_parquet(spark, SF_SMOKE + "/documents.parquet")
    words = unigram.train_words(docs).localCheckpoint(eager=True)
    rows = unigram._vocab_rows(unigram.seed_vocab(words))
    a = sorted(map(tuple, unigram.viterbi_segment(words, rows).collect()))
    b = sorted(
        map(tuple, unigram._viterbi_segment_joins(words, rows).collect())
    )
    assert a == b
