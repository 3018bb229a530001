#!/usr/bin/env python
"""Hybrid RAG retrieval over the fixture corpus — the round-5 search
surface end to end, one declarative plan per stage:

    documents → overlapping chunks (provenance-packed passage ids)
      ├─ lexical: Okapi BM25 top-k over the chunk corpus
      └─ dense:   feature-hashed chunk embeddings → cosine top-k
                  (query vector = hashed bag of the SAME query terms)
    → reciprocal-rank fusion (integer-exact ⌊10⁹/(60+rank)⌋)
    → fused passages with their source doc/chunk lineage

Swap the hashed embeddings for a learned encoder column and the
brute-force dense leg for `similarity.ivf_topk_hashed` at corpus scale;
every other stage is unchanged — the vector-column and rank-frame
contracts are the interface.

Run: python examples/hybrid_rag.py [sf_dir]   (default /root/testdata/sf0.001)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from wasaffi_spark.conf import recommended_builder
from wasaffi_spark.operators import retrieval, similarity, text
from wasaffi_spark.sources.parquet import read_parquet

QUERIES = [
    ("q_dedup", "dup"), ("q_dedup", "hash"),
    ("q_spark", "spark"), ("q_spark", "join"),
]
DIM, SRC_K, TOP_K = 64, 10, 3


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        recommended_builder(master="local[8]", cpus=8, app_name="hybrid-rag")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = read_parquet(spark, os.path.join(sf_dir, "documents.parquet"))
    chunks = text.chunk_documents(docs, chunk_tokens=32, overlap=8)
    passages = chunks.select(
        (F.col("doc_id") * 10_000 + F.col("chunk_id")).alias("pid"),
        "chunk_text",
    )
    qdf = spark.createDataFrame(QUERIES, "query_id string, term string")

    lex = retrieval.bm25_topk(
        passages, qdf, k=SRC_K, text_col="chunk_text", id_col="pid"
    ).select("query_id", F.col("pid").alias("doc_id"), "rank")

    emb = similarity.hashed_embedding(
        passages, dim=DIM, text_col="chunk_text", id_col="pid"
    ).where(F.col("norm_sq") > 0)
    qtext = qdf.groupBy("query_id").agg(
        F.concat_ws(" ", F.collect_list("term")).alias("qtext")
    )
    qv = similarity.hashed_embedding(
        qtext, dim=DIM, text_col="qtext", id_col="query_id"
    )
    scored = (
        F.broadcast(qv.select("query_id", F.col("embedding").alias("qe")))
        .crossJoin(emb.select("pid", F.col("embedding").alias("ne")))
        .select(
            "query_id", "pid",
            F.round(similarity.cosine(F.col("qe"), F.col("ne")), 6).alias("cs"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cs"), F.asc("pid"))
    dense = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= SRC_K)
        .select("query_id", F.col("pid").alias("doc_id"), "rank")
    )

    fused = retrieval.rrf_fuse([lex, dense], topk=TOP_K)
    out = fused.select(
        "query_id",
        (F.col("doc_id") / 10_000).cast("bigint").alias("src_doc"),
        (F.col("doc_id") % 10_000).alias("chunk_id"),
        "rrf_micro", "n_sources", "rank",
    ).orderBy("query_id", "rank")
    out.show(truncate=False)
    assert out.count() > 0
    print("hybrid RAG retrieval OK")
    spark.stop()


if __name__ == "__main__":
    main()
