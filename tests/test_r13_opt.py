"""r13 optimization-round seams: every sharing shortcut added for
performance must be ROW-IDENTICAL to the straight-line form it
replaces (the optimization never changes what a query computes).

Covers:
- similarity.ivf_postings_topk ≡ ivf_maintained_topk's search tail
- knn_descent(ring_edges=prebuilt) ≡ knn_descent()
- graph_search_topk(overlay=prebuilt) ≡ graph_search_topk()
- graph_insert(overlay=prebuilt) ≡ graph_insert()
- ivf_retrain_delta / ivf_retrained_topk with shared codebooks ≡ the
  per-leg retrain
"""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wasaffi_spark.operators import similarity

SF_DIR = "/root/testdata/sf0.001"

IAP_MOD = 8
IMS_DEL_MOD = 13
IMS_DEL_RES = 4
ANN_QUERY_MAX_ID = 8
ANN_K = 3
LLOYD_CELLS = 16
LLOYD_ITERS = 2
DESCENT_K = 8
DESCENT_ROUNDS = 4
DESCENT_MAX_REVERSE = 16
DESCENT_RING = 4
GS_K = 3
GS_BEAM = 8
GS_ROUNDS = 4
GS_ENTRY = 4
GS_RING = 4


def _rows(df, cols=None):
    cols = cols or df.columns
    return sorted(tuple(r) for r in df.select(*cols).collect())


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def split(emb):
    base = emb.where(F.col("vec_id") % IAP_MOD != IAP_MOD - 1)
    batch = emb.where(F.col("vec_id") % IAP_MOD == IAP_MOD - 1)
    dele = emb.where(
        F.pmod(F.col("vec_id"), F.lit(IMS_DEL_MOD)) == IMS_DEL_RES
    ).select("vec_id")
    queries = emb.where(
        (F.col("vec_id") < ANN_QUERY_MAX_ID)
        & (F.pmod(F.col("vec_id"), F.lit(IMS_DEL_MOD)) != IMS_DEL_RES)
    )
    return base, batch, dele, queries


def test_ivf_postings_topk_equals_maintained(emb, split):
    """The shared-components probe tail returns exactly the rows the
    all-in-one maintained search returns (the q_policy_applied r13
    restructure's equivalence)."""
    base, batch, dele, queries = split
    whole = similarity.ivf_maintained_topk(
        queries, base, batch, dele, k=ANN_K, n_cells=LLOYD_CELLS,
        n_probe=2, iters=LLOYD_ITERS,
    )
    cents = similarity.lloyd_centroids(base, LLOYD_CELLS, LLOYD_ITERS)
    postings = similarity.ivf_assign_hashed(
        base, cents, LLOYD_CELLS
    ).unionByName(similarity.ivf_append(batch, cents, LLOYD_CELLS))
    postings = similarity.ivf_delete(dele, postings)
    d = dele.withColumnRenamed("vec_id", "_did")
    alive = emb.select("vec_id", "embedding").join(
        d, F.col("vec_id") == F.col("_did"), "left_anti"
    )
    shared = similarity.ivf_postings_topk(
        queries, cents, postings, alive, k=ANN_K, n_cells=LLOYD_CELLS,
        n_probe=2,
    )
    assert _rows(shared) == _rows(whole)


def test_knn_descent_with_prebuilt_ring(emb, split):
    base = split[0]
    plain = similarity.knn_descent(
        base, k=DESCENT_K, rounds=1, max_reverse=DESCENT_MAX_REVERSE,
        ring=DESCENT_RING,
    )
    ringe, _ = similarity.ring_overlay(base, n_entry=0, ring=DESCENT_RING)
    pre = similarity.knn_descent(
        base, k=DESCENT_K, rounds=1, max_reverse=DESCENT_MAX_REVERSE,
        ring=DESCENT_RING, ring_edges=ringe,
    )
    assert _rows(pre) == _rows(plain)


def test_graph_search_and_insert_with_overlay(emb, split):
    base, batch, _dele, queries = split
    graph = similarity.knn_descent(
        base, k=DESCENT_K, rounds=1, max_reverse=DESCENT_MAX_REVERSE,
        ring=DESCENT_RING,
    ).localCheckpoint(eager=True)
    ringe, entries = similarity.ring_overlay(
        base, n_entry=GS_ENTRY, ring=GS_RING
    )
    plain_search = similarity.graph_search_topk(
        queries, graph, base, k=GS_K, beam=GS_BEAM, rounds=2,
        n_entry=GS_ENTRY, ring=GS_RING,
    )
    pre_search = similarity.graph_search_topk(
        queries, graph, base, k=GS_K, beam=GS_BEAM, rounds=2,
        n_entry=GS_ENTRY, ring=GS_RING, overlay=(ringe, entries),
    )
    assert _rows(pre_search) == _rows(plain_search)

    plain_ins = similarity.graph_insert(
        batch, graph, base, k=DESCENT_K, beam=GS_BEAM, rounds=2,
        n_entry=GS_ENTRY, ring=GS_RING, max_reverse=DESCENT_MAX_REVERSE,
    )
    pre_ins = similarity.graph_insert(
        batch, graph, base, k=DESCENT_K, beam=GS_BEAM, rounds=2,
        n_entry=GS_ENTRY, ring=GS_RING, max_reverse=DESCENT_MAX_REVERSE,
        overlay=(ringe, entries),
    )
    assert _rows(pre_ins) == _rows(plain_ins)


def test_retrain_with_shared_codebooks(emb, split):
    base, _batch, dele, queries = split
    old_c = similarity.lloyd_centroids(base, LLOYD_CELLS, LLOYD_ITERS)
    new_c = similarity.lloyd_centroids(
        emb, LLOYD_CELLS, LLOYD_ITERS, init_cents=old_c
    )
    plain_delta = similarity.ivf_retrain_delta(
        base, emb, n_cells=LLOYD_CELLS, iters=LLOYD_ITERS
    )
    shared_delta = similarity.ivf_retrain_delta(
        base, emb, n_cells=LLOYD_CELLS, iters=LLOYD_ITERS,
        old_cents=old_c, new_cents=new_c,
    )
    assert _rows(shared_delta) == _rows(plain_delta)

    plain_topk = similarity.ivf_retrained_topk(
        queries, base, emb, dele, k=ANN_K, n_cells=LLOYD_CELLS,
        n_probe=2, iters=LLOYD_ITERS,
    )
    shared_topk = similarity.ivf_retrained_topk(
        queries, base, emb, dele, k=ANN_K, n_cells=LLOYD_CELLS,
        n_probe=2, iters=LLOYD_ITERS, new_cents=new_c,
    )
    assert _rows(shared_topk) == _rows(plain_topk)
