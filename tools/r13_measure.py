"""One-off r13 threshold measurement: graph before/after refresh recall,
embedding-drift magnitudes, retrained-IVF recall — at a given SF dir.

Usage: python tools/r13_measure.py /root/testdata/sf0.001
"""
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from wasaffi_spark.operators import similarity  # noqa: E402
from wasaffi_spark.operators.diff import embedding_drift  # noqa: E402
from wasaffi_spark.operators.catalog import (  # noqa: E402
    IAP_MOD, GMS_DEL_MOD, GMS_DEL_RES, IMS_DEL_MOD, IMS_DEL_RES,
    ANN_QUERY_MAX_ID, ANN_K, GS_K, GS_BEAM, GS_ROUNDS, GS_ENTRY, GS_RING,
    DESCENT_K, DESCENT_ROUNDS, DESCENT_MAX_REVERSE, DESCENT_RING,
    LLOYD_CELLS, LLOYD_PROBE, LLOYD_ITERS, GREF_ROUNDS,
)

sf_dir = sys.argv[1]
spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "48g")
    .appName("r13_measure")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
base = emb.where(F.col("vec_id") % IAP_MOD != IAP_MOD - 1)
batch = emb.where(F.col("vec_id") % IAP_MOD == IAP_MOD - 1)

# ---- graph family --------------------------------------------------------
graph = similarity.knn_descent(
    base, k=DESCENT_K, rounds=DESCENT_ROUNDS,
    max_reverse=DESCENT_MAX_REVERSE, ring=DESCENT_RING,
)
dele = emb.where(
    F.pmod(F.col("vec_id"), F.lit(GMS_DEL_MOD)) == GMS_DEL_RES
).select("vec_id")
queries = emb.where(
    (F.col("vec_id") < ANN_QUERY_MAX_ID)
    & (F.pmod(F.col("vec_id"), F.lit(GMS_DEL_MOD)) != GMS_DEL_RES)
)
ins = similarity.graph_insert(
    batch, graph, base, k=DESCENT_K, beam=GS_BEAM, rounds=GS_ROUNDS,
    n_entry=GS_ENTRY, ring=GS_RING, max_reverse=DESCENT_MAX_REVERSE,
)
g1 = similarity.graph_apply_delta(graph, ins).localCheckpoint(eager=True)
corpus = emb.select("vec_id", "embedding")
rep = similarity.graph_delete(dele, g1, corpus, k=DESCENT_K)
d = dele.withColumnRenamed("vec_id", "_did")
g2 = (
    similarity.graph_apply_delta(g1, rep)
    .join(d, F.col("src") == F.col("_did"), "left_anti")
    .localCheckpoint(eager=True)
)
alive = emb.join(d, F.col("vec_id") == F.col("_did"), "left_anti")
truth = similarity.brute_force_topk(queries, alive, k=GS_K).localCheckpoint(
    eager=True
)


def reading(g):
    got = similarity.graph_search_topk(
        queries, g, alive, k=GS_K, beam=GS_BEAM, rounds=GS_ROUNDS,
        n_entry=GS_ENTRY, ring=GS_RING,
    )
    r = similarity.recall_at_k(got, truth).agg(
        F.count("*").alias("q"), F.sum("hits").alias("h")
    ).first()
    return r["q"], r["h"], (10000 * r["h"]) // (r["q"] * GS_K)


bq, bh, bbp = reading(g2)
print(f"GRAPH before: n_queries={bq} hits={bh} recall_bp={bbp}", flush=True)
g3 = similarity.graph_refresh(
    g2, alive, k=DESCENT_K, rounds=GREF_ROUNDS,
    max_reverse=DESCENT_MAX_REVERSE,
)
aq, ah, abp = reading(g3)
print(f"GRAPH after refresh: n_queries={aq} hits={ah} recall_bp={abp}",
      flush=True)

# ---- drift ---------------------------------------------------------------
drift = embedding_drift(base, emb)
r = drift.agg(
    F.count("*").alias("n_dims"),
    F.max(F.abs(F.col("drift_q"))).alias("max_dq"),
    F.max(F.abs(F.col("drift_m2_q"))).alias("max_dm2"),
    F.sum(F.when(F.abs(F.col("drift_q")) >= 1, 1).otherwise(0)).alias(
        "n_nonzero"
    ),
).first()
print(f"DRIFT: n_dims={r['n_dims']} max|drift_q|={r['max_dq']} "
      f"max|drift_m2_q|={r['max_dm2']} n_dims_nonzero={r['n_nonzero']}",
      flush=True)
# distribution of |drift_q| for threshold picking
qs = sorted(
    abs(x["drift_q"]) for x in drift.select("drift_q").collect()
)
print(f"DRIFT |drift_q| percentiles: min={qs[0]} p50={qs[len(qs)//2]} "
      f"p90={qs[int(len(qs)*0.9)]} max={qs[-1]}", flush=True)
m2s = sorted(
    abs(x["drift_m2_q"]) for x in drift.select("drift_m2_q").collect()
)
print(f"DRIFT |drift_m2_q| percentiles: min={m2s[0]} p50={m2s[len(m2s)//2]} "
      f"p90={int(m2s[int(len(m2s)*0.9)])} max={m2s[-1]}", flush=True)

# ---- retrained IVF monitor -----------------------------------------------
n_moved = similarity.ivf_retrain_delta(
    base, emb, n_cells=LLOYD_CELLS, iters=LLOYD_ITERS
).count()
print(f"IVF retrain delta: n_moved={n_moved}", flush=True)

cents_old = similarity.lloyd_centroids(base, LLOYD_CELLS, LLOYD_ITERS)
cents_new = similarity.lloyd_centroids(
    emb, LLOYD_CELLS, LLOYD_ITERS, init_cents=cents_old
)
postings = similarity.ivf_assign_hashed(emb, cents_new, LLOYD_CELLS)
dele_i = emb.where(
    F.pmod(F.col("vec_id"), F.lit(IMS_DEL_MOD)) == IMS_DEL_RES
).select("vec_id")
postings = similarity.ivf_delete(dele_i, postings)
di = dele_i.withColumnRenamed("vec_id", "_did")
alive_i = emb.join(di, F.col("vec_id") == F.col("_did"), "left_anti")
queries_i = emb.where(
    (F.col("vec_id") < ANN_QUERY_MAX_ID)
    & (F.pmod(F.col("vec_id"), F.lit(IMS_DEL_MOD)) != IMS_DEL_RES)
)
q = queries_i.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qv"))
assigned, probes = similarity._ivf_probes(
    q, alive_i, LLOYD_CELLS, LLOYD_PROBE, 64, similarity.PQ_QUANT,
    "embedding", "vec_id", similarity.IVF_SEED, cents=cents_new,
    assigned=postings,
)
c = assigned.select(
    F.col("vec_id").alias("nid"), F.col("embedding").alias("nv"), "cell"
)
scored = (
    F.broadcast(probes)
    .join(c, ["cell"])
    .where(F.col("qid") != F.col("nid"))
    .select(
        "qid", "nid",
        F.round(similarity.cosine(F.col("qv"), F.col("nv")), 6).alias(
            "cos_sim"
        ),
    )
)
got = similarity._ranked_shortlist(
    scored, [F.col("cos_sim").desc(), F.col("nid").asc()],
    ["qid", "nid", "cos_sim"], ANN_K, None, queries_i, alive_i,
    "embedding", "vec_id",
)
truth_i = similarity.brute_force_topk(queries_i, alive_i, k=ANN_K)
r = similarity.recall_at_k(got, truth_i).agg(
    F.count("*").alias("q"), F.sum("hits").alias("h")
).first()
print(f"IVF retrained monitor (n_probe={LLOYD_PROBE}): n_queries={r['q']} "
      f"hits={r['h']} recall_bp={(10000 * r['h']) // (r['q'] * ANN_K)}",
      flush=True)

# the frozen-codebook monitor reading for comparison (existing gauge)
got0 = similarity.ivf_maintained_topk(
    queries_i, base, batch, dele_i, k=ANN_K, n_cells=LLOYD_CELLS,
    n_probe=LLOYD_PROBE, iters=LLOYD_ITERS,
)
r0 = similarity.recall_at_k(
    got0.select("qid", "nid"), truth_i
).agg(F.count("*").alias("q"), F.sum("hits").alias("h")).first()
print(f"IVF frozen monitor   (n_probe={LLOYD_PROBE}): n_queries={r0['q']} "
      f"hits={r0['h']} recall_bp={(10000 * r0['h']) // (r0['q'] * ANN_K)}",
      flush=True)
spark.stop()
