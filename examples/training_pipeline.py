#!/usr/bin/env python
"""End-to-end LLM training-data pipeline over the fixture corpus.

The engine's capstone flow — every stage is a declarative DataFrame
transformation from ``wasaffi_spark.operators``, so Catalyst sees ONE
plan per output and the whole pipeline scales by partitioning, not by
driver orchestration:

    load → PII-redact → exact dedup → near-dedup (MinHash-LSH clusters,
    keep best per cluster) → decontaminate vs an eval set → quality
    gate (heuristics + linear classifier) → domain mixture →
    leakage-safe split (keyed on the near-dup cluster, not the doc) →
    next-snapshot drift check (naive re-split vs FROZEN grandfathered
    re-split — split_drift matrices, r12) →
    chunk → sharded parquet write (+ corpus stats via sketches) →
    snapshot-upgrade runbook (r13: frozen-split gate → embedding_drift
    → drift controller decision → ivf_retrain_delta move plan →
    recall re-gauge, every decision consumed programmatically)

Run: python examples/training_pipeline.py [sf_dir] [out_dir]
Defaults: /root/testdata/sf0.001, /tmp/wasaffi_training_set
"""

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from wasaffi_spark.conf import recommended_builder
from wasaffi_spark.operators import decontam, dedup, graph, pipeline, sketches, text
from wasaffi_spark.sources.parquet import read_parquet

MIX = {"en": 0.5, "de": 0.3, "fr": 0.2}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/wasaffi_training_set"
    spark = (
        recommended_builder(master="local[8]", cpus=8, app_name="training-pipeline")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = read_parquet(spark, os.path.join(sf_dir, "documents.parquet"))
    n0 = docs.count()

    # 1. PII redaction (typed placeholders, codegen regexp chain)
    docs = (
        text.with_pii_redaction(docs)
        .withColumn("text", F.col("clean_text"))
        .drop("clean_text")
    )

    # 2. exact dedup (content-hash groupBy, deterministic winner)
    docs = dedup.exact_dedup(docs).persist()
    n_exact = docs.count()

    # 2b. cross-document paragraph dedup (RefinedWeb-style): swap text
    #     for its globally-deduped form; drop docs left with no content
    paras = dedup.paragraph_dedup(docs)
    docs = (
        docs.drop("text")
        .join(paras.select("doc_id", F.col("dedup_text").alias("text")), "doc_id")
        .where(F.length(F.trim("text")) > 0)
    ).persist()

    # 3. near-dedup: MinHash-LSH candidate pairs → connected components
    #    → keep the longest document per duplicate cluster
    pairs = dedup.lsh_candidate_pairs(dedup.minhash_signatures(docs))
    comp = graph.connected_components(pairs)  # (node, component)
    # Rank ONLY the clustered docs (the graph is a tiny fraction of the
    # corpus) and union the untouched majority back: ranking everything
    # would funnel all component-NULL rows through one window partition.
    clustered = docs.join(
        comp.withColumnRenamed("node", "doc_id"), "doc_id", "inner"
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("component").orderBy(
        F.desc(F.length("text")), F.asc("doc_id")
    )
    keepers = (
        clustered.withColumn("rk", F.row_number().over(w))
        .where("rk = 1")
        .drop("component", "rk")
    )
    singles = docs.join(
        comp.withColumnRenamed("node", "doc_id"), "doc_id", "left_anti"
    )
    docs = singles.unionByName(keepers).persist()
    n_near = docs.count()

    # 4. decontamination: drop docs sharing 6-gram shingles with the
    #    held-out eval slice (stand-in for a benchmark suite)
    eval_set = read_parquet(spark, os.path.join(sf_dir, "documents.parquet")).where(
        F.pmod("doc_id", F.lit(17)) == 3
    )
    hits = decontam.contamination_hits(docs, eval_set, n=6).select("doc_id")
    # ... and fuzzy MinHash decontamination for paraphrased/reformatted
    # copies that share shingles but no long exact n-gram
    fuzzy_hits = decontam.fuzzy_contamination(
        docs, eval_set, threshold=0.25
    ).select("doc_id")
    docs = (
        docs.join(hits.unionByName(fuzzy_hits).distinct(), "doc_id", "left_anti")
        .persist()
    )
    n_clean = docs.count()

    # 5. quality gate: Gopher composite rules (with per-rule firing
    #    report — the corpus-curation feedback loop), heuristic score,
    #    AND the linear classifier. Repetition thresholds are relaxed
    #    for the synthetic word-salad fixture; real corpora use defaults.
    gate = text.gopher_filter(
        docs, min_tokens=5, max_dup_word_frac=0.95, max_top_bigram_frac=0.5
    )
    rule_counts = (
        gate.where("not keep")
        .select(F.explode(F.split("drop_reasons", ",")).alias("rule"))
        .groupBy("rule").count().orderBy(F.desc("count"))
    )
    weights = spark.createDataFrame(
        list(text.DEFAULT_QUALITY_WEIGHTS), "tok string, w double"
    )
    scored = (
        text.with_quality(docs)
        .join(gate.where("keep").select("doc_id"), "doc_id")
        .join(text.linear_text_score(docs, weights), "doc_id")
    )
    docs = scored.where(
        (F.col("quality_score") >= 0.3) & (F.col("lin_score") >= 0.35)
    ).persist()
    n_q = docs.count()

    # 5b. distill the heuristic gate into a TRAINED model, in-engine:
    #     weak labels from the heuristic score, 3 GD iterations of
    #     hash-exact logistic regression, then score the corpus with
    #     the trained weights (the Dolma/DataComp label→fit→score loop
    #     without leaving Spark). On the fixture the model just rides
    #     along; on a real corpus its prob column replaces lin_score.
    from wasaffi_spark.operators import training

    labeled = docs.withColumn(
        "_label", (F.col("lin_score") >= 0.5).cast("int")
    )
    model = training.train_linear_classifier(labeled, "_label")
    docs = docs.join(
        training.score_with_model(docs, model).select(
            "doc_id", F.col("prob").alias("model_prob")
        ),
        "doc_id",
    ).persist()

    # 5c. tokenizer fit + fertility check, in-engine (r8): train the
    #     unigram-LM tokenizer on the CLEANED corpus and read the
    #     fertility (pieces per word over the trained coverage) — the
    #     pre-training sanity statistic that tells you whether the
    #     corpus and tokenizer fit each other before any GPU spins up.
    #     BPE (operators/bpe.py) is the drop-in alternative.
    from wasaffi_spark.operators import unigram

    uvoc = unigram.unigram_train(docs)
    ufert = unigram.unigram_fertility(docs, uvoc).agg(
        F.sum("n_pieces").alias("p"), F.sum("n_words").alias("w")
    ).collect()[0]

    # 6. per-domain cap (no single source dominates), then domain
    #    mixture + deterministic split + chunking
    docs = pipeline.domain_cap(
        docs, cap=200, domain_col="source", order_by=("lin_score",)
    ).drop("domain_rank")
    mixed = pipeline.mixture_resample(docs, MIX)
    # the split hashes the NEAR-DUP CLUSTER id (stage 3's pairs), not
    # the document id: no near-dup pair can straddle train/eval, and
    # the assignment is stable under changes to the keep-which-copy
    # dedup policy (the cluster's identity, not the survivor's id,
    # decides) — plain split_label leaks ~34% of near-dup pairs
    # v1's near-dup graph is over v1's corpus: restrict the candidate
    # pairs to ids that survived into `mixed` (a version's leakage
    # definition can only see that version's documents). Materialize
    # the tiny id/pair frames once — they feed three consumers below
    # and their lineage is the whole heavy pipeline above.
    mixed_ids = mixed.select("doc_id").distinct().localCheckpoint(eager=True)
    all_pairs = pairs.select("id_a", "id_b").localCheckpoint(eager=True)
    pairs_v1 = (
        all_pairs
        .join(mixed_ids.withColumnRenamed("doc_id", "id_a"), "id_a")
        .join(mixed_ids.withColumnRenamed("doc_id", "id_b"), "id_b")
    )
    splits = pipeline.cluster_safe_split(
        mixed_ids, pairs_v1
    ).localCheckpoint(eager=True)  # feeds chunks + the v2 stage below

    # 6b. next-snapshot stability (r12): tomorrow's corpus admits more
    # documents, and the min-id cluster label is NOT stable under
    # additions — a naive re-split migrates surviving documents
    # between train and eval (version-to-version contamination).
    # Freeze mode grandfathers: every existing doc keeps today's
    # split, new docs inherit their cluster's grandfathered split (or
    # hash fresh in untouched clusters); split_drift reports both
    # transition matrices — the frozen one is diagonal by rule.
    v2_docs = docs.select("doc_id").distinct()  # pre-cap corpus as "v2"
    unfrozen2 = pipeline.cluster_safe_split(v2_docs, all_pairs)
    frozen2 = pipeline.cluster_safe_split(
        v2_docs, all_pairs, prior=splits.select("doc_id", "split")
    )
    drift_u = pipeline.split_drift(splits, unfrozen2)
    drift_f = pipeline.split_drift(splits, frozen2)

    chunks = text.chunk_documents(mixed, chunk_tokens=64, overlap=8).join(
        splits.select("doc_id", "split"), "doc_id"
    )

    # 7. deterministic global shuffle (training order is a pure function
    #    of the seed) + sharded write partitioned by split (partition
    #    pruning for downstream readers; maxRecordsPerFile bounds files)
    chunks = pipeline.global_shuffle(
        chunks.withColumn(
            "chunk_uid", F.concat_ws(":", "doc_id", "chunk_id")
        ),
        n_shards=8,
        id_col="chunk_uid",
    ).drop("chunk_uid")
    shutil.rmtree(out_dir, ignore_errors=True)
    (
        chunks.repartition("shard")
        .sortWithinPartitions("shard_pos")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", 100_000)
        .partitionBy("split")
        .parquet(out_dir)
    )

    # 8. corpus report from ONE sketch pass over the output
    out = read_parquet(spark, out_dir).withColumn(
        "chunk_tokens", F.size(F.split("chunk_text", r"\s+"))
    )
    sk = sketches.sketch_table(out, "split", "doc_id", "chunk_tokens")
    # ... plus the per-domain dataset card of the INPUT corpus (doc and
    # token counts, residual exact-dup exposure, language spread)
    card = pipeline.corpus_report(docs)
    print(f"\ndocs: {n0} → exact-dedup {n_exact} → near-dedup {n_near}"
          f" → decontaminated {n_clean} → quality-kept {n_q}")
    if ufert.w:  # guard: quality filtering can drop every coverable word
        print(
            f"unigram tokenizer: vocab {uvoc.count()} pieces, corpus "
            f"fertility {ufert.p / ufert.w:.3f} pieces/word"
        )
    else:
        print("unigram tokenizer: no words within coverage — fertility n/a")
    print("per-domain dataset card (top 5 by docs):")
    card.orderBy(F.desc("n_docs")).show(5, truncate=False)
    print("gopher rule firings among dropped docs:")
    rule_counts.show(truncate=False)
    print("output chunks by split (distinct docs + token quantiles):")
    sketches.estimate_per_group(sk).orderBy("split").show(truncate=False)
    print("next-snapshot split drift — naive re-split (off-diagonal "
          "rows between real splits = version contamination):")
    drift_u.orderBy("old_split", "new_split").show(truncate=False)
    print("next-snapshot split drift — FROZEN re-split (grandfathered; "
          "diagonal for every surviving doc by construction):")
    drift_f.orderBy("old_split", "new_split").show(truncate=False)
    print(f"written to {out_dir}")

    # 9. snapshot-upgrade runbook (r13, VERDICT r12 Next-round #4): the
    # full "corpus v2 lands" production sequence, with every decision
    # CONSUMED, not just printed — the run refuses promotion if the
    # frozen split migrated a surviving doc, skips the index work when
    # the drift controller says noop, and promotes v2's serving index
    # only after the post-retrain recall re-gauge reads healthy. The
    # declared, hash-oracled twin of this stage is the
    # `snapshot_upgrade` catalog row.
    from wasaffi_spark.operators import serving, similarity
    from wasaffi_spark.operators.diff import embedding_drift

    # gate 1: the frozen re-split must be DIAGONAL for survivors —
    # a migrated doc means version-to-version eval contamination
    migrated = drift_f.where(
        (F.col("old_split") != "(absent)")
        & (F.col("new_split") != "(absent)")
        & (F.col("old_split") != F.col("new_split"))
    ).agg(F.coalesce(F.sum("n_docs"), F.lit(0)).alias("n")).first()["n"]
    if migrated:
        raise SystemExit(
            f"ABORT snapshot upgrade: frozen re-split migrated "
            f"{migrated} surviving docs across train/eval"
        )
    print("runbook gate 1: frozen split diagonal — 0 migrations ✓")

    # gate 2: embedding drift between corpus versions drives the index
    # action (v1 = yesterday's 7/8 snapshot, the ingest-batch split the
    # index-maintenance stages use throughout)
    emb = read_parquet(spark, os.path.join(sf_dir, "embeddings.parquet"))
    emb_v1 = emb.where(F.col("vec_id") % 8 != 7)
    drift = embedding_drift(emb_v1, emb)
    dele = emb.where(F.pmod("vec_id", F.lit(13)) == 4).select("vec_id")
    rb_queries = emb.where(
        (F.col("vec_id") < 8) & (F.pmod("vec_id", F.lit(13)) != 4)
    )

    def retrain():
        moves = similarity.ivf_retrain_delta(emb_v1, emb)
        got = similarity.ivf_retrained_topk(rb_queries, emb_v1, emb, dele)
        d = dele.withColumnRenamed("vec_id", "_did")
        alive = emb.join(d, F.col("vec_id") == F.col("_did"), "left_anti")
        truth = similarity.brute_force_topk(rb_queries, alive, k=3)
        gauge = similarity.recall_at_k(
            got.select("qid", "nid"), truth
        ).select("qid", "hits", F.lit(3).cast("bigint").alias("k"))
        return moves, gauge

    verdict = serving.apply_drift_policy(
        drift, retrain, {"drift_q": (1_000, 4_000)},
        recall_healthy_bp=4_000,
    ).first()
    print(
        f"runbook gate 2: max|drift_q|={verdict['max_abs_drift_q']} µu "
        f"over {verdict['n_dims']} dims → decision "
        f"'{verdict['decision']}'"
    )
    if verdict["decision"] == "retrain":
        # gate 3: the controller already applied the warm retrain and
        # re-gauged — promote only on a healthy reading
        print(
            f"runbook gate 3: retrain applied — move plan "
            f"{verdict['n_moved']} rows, re-gauged recall "
            f"{verdict['recall_bp_after']} bp vs healthy "
            f"{verdict['healthy_bp']} → {verdict['outcome']}"
        )
        if verdict["outcome"] == "healthy":
            print("PROMOTE: v2 corpus + retrained index go live")
        else:
            raise SystemExit(
                "HOLD: retrained index failed the recall bar — keep "
                "serving v1 and page the index owner"
            )
    elif verdict["decision"] == "recalibrate":
        print("runbook: drift within retrain bar — schedule a codebook "
              "recalibration, serve v2 on the current index")
    else:
        print("runbook: no actionable drift — v2 promotes on the "
              "current index")
    spark.stop()


if __name__ == "__main__":
    main()
