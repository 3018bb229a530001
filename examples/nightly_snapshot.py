#!/usr/bin/env python
"""The RECURRING ingest a 100 TB corpus actually runs, end to end on
the fixture: a base snapshot persists its state once (16-byte hash
table, per-domain keeper counts, frozen codebook), then nightly
batches stream through ONE foreachBatch sink that dedups against the
state, appends postings to the frozen codebook, refreshes the
temperature mixture weights, and publishes a per-domain report — and
the small files that continuous ingest inevitably leaves behind get
compacted by the planner:

    1. SEED     — base snapshot → hash state + domain counts +
                  Lloyd-ish codebook (the tables a production run
                  keeps in its catalog)
    2. STREAM   — documents arrive in micro-batches;
                  streaming/documents.snapshot_sink runs the
                  admission→append→report legs per batch against the
                  persisted state (nothing corpus-sized re-read)
    3. REPORT   — the published per-batch, per-domain ledger:
                  dups-vs-state, dups-within-batch, fresh admissions,
                  cells touched, keep_bp old→new sampling-plan diff
    4. PUBLISH  — each night's state leaves as a signed bundle;
                  serving.bundle_diff against the previous night's
                  publication names exactly what the serving fleet
                  re-syncs (the frozen codebook never ships)
    5. COMPACT  — layout.compaction_plan + compact_small_files over
                  the sink's accumulated hash-state files: Next-Fit
                  bins at the target size, ONE output file per bin —
                  then commit_compaction swaps the packed files into
                  the live table behind a verified, journaled,
                  crash-healable protocol (r12)
    6. VACUUM   — streaming/state.vacuum_set_state folds the hash
                  table's batch partitions into its committed seed:
                  the in-place state-level twin of stage 5

Run: python examples/nightly_snapshot.py [sf_dir] [work_dir]
Defaults: /root/testdata/sf0.001, /tmp/wasaffi_nightly
"""

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from wasaffi_spark.conf import recommended_builder
from wasaffi_spark.operators import similarity
from wasaffi_spark.operators.layout import compact_small_files
from wasaffi_spark.sources.parquet import read_parquet
from wasaffi_spark.streaming import documents as sdoc

DIM, CELLS = 32, 8


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/wasaffi_nightly"
    if os.path.isdir(work):
        shutil.rmtree(work)
    spark = (
        recommended_builder(master="local[8]", cpus=8,
                            app_name="nightly-snapshot")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = read_parquet(spark, os.path.join(sf_dir, "documents.parquet"))
    base = docs.where(F.col("doc_id") % 4 != 3)
    nightly = docs.where(F.col("doc_id") % 4 == 3)

    # 1. SEED — the state a production catalog persists once
    th = F.md5(F.coalesce(F.col("text"), F.lit("")))
    base_hashes = base.groupBy(th.alias("text_hash")).agg(
        F.min("doc_id").alias("doc_id")
    )
    base_counts = (
        base_hashes.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(F.count("*").alias("n_d"))
    )
    bemb = (
        similarity.hashed_embedding(base, dim=DIM)
        .where(F.col("norm_sq") > 0)
        .select(F.col("doc_id").alias("vec_id"), "embedding")
    )
    cents = similarity.hashed_centroids(bemb, CELLS).localCheckpoint(
        eager=True
    )
    print(
        f"seeded state: {base_hashes.count()} hashes, "
        f"{base_counts.count()} domains, {CELLS}-cell codebook"
    )

    # 2. STREAM — three "nights" of ingest as three micro-batches
    ingest_dir = os.path.join(work, "ingest")
    frac = F.pmod(F.xxhash64("doc_id"), F.lit(300)) / 300.0
    for night, (lo, hi) in enumerate([(0.0, 1 / 3), (1 / 3, 2 / 3), (2 / 3, 1.01)]):
        cond = (frac >= lo) & (frac < hi)
        if night == 2:
            # the crawler re-fetched part of night 0 — the dup-vs-state
            # column of night 2's report is the anti-join earning its keep
            cond = cond | (frac < 0.15)
        nightly.where(cond).coalesce(1).write.parquet(
            os.path.join(ingest_dir, f"night{night}")
        )
    stream = (
        spark.readStream.schema(nightly.schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(ingest_dir)
    )
    state_dir = os.path.join(work, "state")
    q = sdoc.snapshot_sink(
        stream, spark, state_dir, cents,
        base_hashes=base_hashes, base_domain_counts=base_counts,
        n_cells=CELLS, dim=DIM,
    )
    q.awaitTermination()

    # 3. REPORT — the ledger each night publishes
    report = spark.read.parquet(os.path.join(state_dir, "report"))
    print("per-night, per-domain snapshot reports:")
    report.orderBy("batch_id", "lang").show(12, truncate=False)
    post = spark.read.parquet(os.path.join(state_dir, "postings"))
    print(
        f"postings appended across nights: {post.count()} "
        f"(cells touched: {post.select('cell').distinct().count()})"
    )

    # 4. PUBLISH — the night's serving handoff, DIFFED against the
    # previous publication: export each night's state as a signed
    # bundle and let bundle_diff (two manifest reads, no component
    # data) name exactly what the serving fleet must re-sync. The
    # frozen codebook never ships; the hash/count/posting tables ship
    # only when a night actually admitted something.
    from wasaffi_spark.operators import serving

    hash_dir = os.path.join(state_dir, "state")

    def night_state(upto_batch):
        byb = F.col("batch_id") <= upto_batch
        return {
            "cents": cents,  # frozen — identical every night
            "hashes": spark.read.parquet(hash_dir).where(byb).drop(
                "batch_id"
            ),
            "counts": spark.read.parquet(
                os.path.join(state_dir, "counts")
            ).where(byb).drop("batch_id"),
            "postings": spark.read.parquet(
                os.path.join(state_dir, "postings")
            ).where(byb).drop("batch_id"),
        }

    n1_dir, n2_dir = os.path.join(work, "pub_n1"), os.path.join(work, "pub_n2")
    serving.export_index_bundle(spark, n1_dir, night_state(0))
    serving.export_index_bundle(spark, n2_dir, night_state(1 << 30))
    print("publish: bundle diff night-1 -> tonight (ship `changed` only):")
    serving.bundle_diff(spark, n1_dir, n2_dir).show(truncate=False)

    # 5. COMPACT — continuous ingest leaves one small file per night;
    # pack the hash-state table back to scan-efficient sizes
    import glob

    parts = [
        p
        for p in glob.glob(os.path.join(hash_dir, "batch_id=*", "*.parquet"))
    ]
    sizes = [os.stat(p).st_size for p in parts]
    target = int(2.2 * min(sizes))  # biggest night stays a keep
    plan = compact_small_files(
        spark, hash_dir, target, os.path.join(work, "state_compacted")
    )
    packed = plan.where(F.col("action") == "pack")
    print(
        f"compaction: {len(parts)} state files "
        f"({min(sizes)}-{max(sizes)} B) → "
        f"{packed.select('bin').distinct().count()} packed bins at "
        f"target {target} B "
        f"(+{plan.where(F.col('action') == 'keep').count()} keeps)"
    )
    # ... and COMMIT the swap crash-safely (r12): verify the staged
    # rows against the plan, journal the move+delete list, execute —
    # a crash at any point heals (roll back before the journal
    # commits, roll forward after), so the live table is never left
    # half-swapped. The state reads identically before and after.
    from wasaffi_spark.operators.layout import commit_compaction

    rows_before = spark.read.parquet(hash_dir).count()
    res = commit_compaction(
        spark, hash_dir, target, os.path.join(work, "state_compacted")
    )
    rows_after = spark.read.parquet(hash_dir).count()
    assert rows_before == rows_after, "commit must preserve content"
    print(
        f"commit: {res['moved']} packed files swapped in, "
        f"{res['deleted']} originals out ({rows_before} rows before "
        f"and after — journaled, healable at every kill point)"
    )

    # 6. VACUUM — the in-place, sink-resumable form of the same idea:
    # fold every batch_id partition of the hash table back into its
    # committed seed (set semantics — readers anti-join, so this is
    # provably invisible to them and to a resumed sink)
    from wasaffi_spark.streaming.state import vacuum_set_state

    before = spark.read.parquet(hash_dir).count()
    # checkpoint-aware: only batches the sink has COMMITTED fold; a
    # batch left pending by a crash keeps its partition so its replay
    # stays correct (ADVICE r10)
    folded = vacuum_set_state(
        spark, hash_dir,
        checkpoint_dir=os.path.join(state_dir, "_checkpoint"),
    )
    after = spark.read.parquet(hash_dir).count()
    print(
        f"vacuum: folded {folded} batch partitions into the seed; "
        f"{before} rows -> {after} distinct (reads + resumed sinks "
        "unchanged, one partition per read from here on)"
    )

    spark.stop()


if __name__ == "__main__":
    main()
