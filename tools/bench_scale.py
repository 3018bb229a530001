#!/usr/bin/env python
"""Scale-probe bench (VERDICT r3 next-round #6): measure how the
heaviest headline queries scale when the input grows 10× beyond sf0.1
(a synthetic sf≈1), and name the cause of anything super-linear.

The scaled tables are built by replicating sf0.1 R times with
DECORRELATED replicas — naive replication would make every document
text 10 identical copies (cross-replica duplicate pairs would then grow
quadratically in R by construction, measuring the data trick rather
than the operator), so:

- ``documents``: replica r rewrites every token t → "t·r{r}" (distinct
  vocab per replica ⇒ intra-replica duplicate structure identical to
  sf0.1, zero cross-replica gram/shingle/signature collisions);
- ``embeddings``: replica r adds position-dependent noise
  ``0.3·sin(1.7·i + 2.3·r)`` per dimension (keeps magnitudes realistic,
  decorrelates replicas so near-dup/cluster structure scales linearly);
- ``lineitem``: replica r offsets supplier/part keys (10 disjoint
  supply graphs — pagerank's per-iteration work should scale linearly).

An ideally-linear operator therefore shows ratio ≈ R (×
parallelism-slack at this size); ratios well above R indicate a
super-linear term, reported with its cause.

Linearity fit (r6, VERDICT r5 next #5): the raw x10/x1 ratio cannot
distinguish "linear with a per-query constant" from "super-linear" at
toy sizes, and the measured trivial-job session floor (~0.03-0.06 s)
is far too small to explain >2× ratios by overhead subtraction — the
r5 "~1 s fixed session overhead" story is RETIRED. So each probe now
runs at THREE scales (x1, x3, x10) and applies the three-point
convexity test: compare the measured x3 time against the chord
through (x1, x10) of the affine model ``t(R) = a + b·R``. Any
constant-plus-linear operator lies ON the chord regardless of how big
its constant is; a quadratic one lies far BELOW it (t = c·R²:
chord(3) = 23c vs measured 9c, -61 %); saturating parallelism or
per-scale knob cliffs lie ABOVE it. `shape` = "linear" within ±25 %,
"convex (superlinear)" below, "concave (saturating)" above. Timings
are best-of-3 warm runs after a session warmup pass (the first probe
pair is executed once untimed — JVM codegen + Python worker pool
startup otherwise lands entirely on the first timed probe, which is
exactly the noise that made single-ratio classification unreliable).

Usage: python tools/bench_scale.py [--rebuild]
Writes BENCH_SCALE.json at the repo root.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALE_ROOT = os.path.join(REPO, ".scale")
R = 10
R_MID = 3  # third point for the affine linearity fit (r6)
SCALED = os.path.join(SCALE_ROOT, f"x{R}")
SCALED_MID = os.path.join(SCALE_ROOT, f"x{R_MID}")
# x1 is ALSO rewritten through the same 32-file writer as x3/x10: the
# driver's sf0.1 tables are single parquet files, so probing them raw
# makes short scan-bound queries measure file-layout parallelism (one
# scan task at x1 vs 32 at x3/x10 — observed: ivf_pq_topk 2× SLOWER at
# x1 than x3), not data scaling. Identical layout at every point keeps
# the convexity test honest.
SCALED_X1 = os.path.join(SCALE_ROOT, "x1")

# One methodology string for BOTH write paths (fresh and --only merge):
# the merge path must refresh it too, or rows re-measured under a newer
# recipe stay attributed to an older one (the r6 artifact carried a
# stale "affine fit on (x3,x10)" description for exactly this reason).
METHOD = (
    "decorrelated 3x and 10x replication of sf0.1 (distinct "
    "vocab per replica; position-noise per embedding "
    "replica; disjoint supply graphs); best-of-2 warm runs "
    "to a noop sink; linearity classified by the chord "
    "t(R)=a+b*R through (x1,x10) checked against the "
    "measured x3 (see module docstring of "
    "tools/bench_scale.py)"
)

# query name -> (named cause if super-linear growth is EXPECTED, else None)
PROBES = {
    "pq_topk": (
        "flat ADC: candidates = Q×N, per-qid ranking window grows with N "
        "— the cost ivf_pq_topk exists to remove"
    ),
    "ivf_pq_topk": None,
    "pagerank": None,
    "semantic_dedup": (
        "r5: k_seeds now follows the data (max(16, ceil(n/128)) from one "
        "O(N) count) and the N·k assignment stage scores with "
        "precomputed norms — the r4 15.5× collapsed to ~2×, on-chord "
        "linear; residual "
        "growth is the k∝N assignment crossJoin (N·k cosines). This "
        "row stays declared as the EXACT-assignment contrast; the "
        "cell-pruned engine is the flagship (text_semantic_dedup, r6) "
        "and its own declared row (semantic_dedup_pruned)"
    ),
    "simhash_pairs": None,
    "ngram_span_dedup": None,
    "jaccard_pairs": (
        "blocked shingle join is linear on decorrelated replicas "
        "(cross-replica shingles never collide); r7 adds the "
        "max_shingle_df hot-shingle valve at the declared site (cap "
        "96, oracle replays it) bounding per-shingle fan-out at cap² "
        "— the r6 3.24× probe was the steepest row left; the "
        "bench-vs-r3 regression suspicion was bisected in r5 — code "
        "byte-identical since r3, same-harness A/B within 4% "
        "(COVERAGE.md Round-5 notes)"
    ),
    "media_neardup": (
        "signature is linear; r6 wires the max_bucket_size valve into "
        "the DECLARED query (cap 96, mirrored by the oracle's banded "
        "replay) — band-buckets that 10× duplicate density pushes over "
        "the cap are dropped before the pair join, so the quadratic "
        "within-bucket term is now bounded at the declared site"
    ),
    "train_classifier": None,
    "text_ann": (
        "exact scan: fixed Q × N candidates — linear in N by design; "
        "the scale path routes the same vectors through "
        "bucketed_topk/ivf_topk (vec_col contract unchanged)"
    ),
    "fuzzy_decontaminate": (
        "linear by construction (decorrelated replicas: candidates = "
        "R × per-replica train↔eval products); the r5 '~1 s session "
        "overhead' explanation was RETIRED in r6 — the measured "
        "trivial-job floor is ~0.06 s — and replaced by the 3-point "
        "affine fit, which classifies the growth directly"
    ),
    "dsir_select": (
        "linear feature explode + broadcast-scored groupBy; the r5 "
        "distributed rank (operators/ranking.py) removed the "
        "single-partition sort; residual super-unit ratio is judged "
        "by the affine fit, not the retired fixed-overhead story"
    ),
    "embedding_clusters": (
        "r5: hyperplane LSH cells (with_cell_rh) + auto_sign_bits now "
        "bound within-cell candidates — the r4 5.77× measured ~1.5-2×; "
        "residual growth is CC label-propagation rounds on the larger "
        "merged-cluster diameter"
    ),
    "semantic_dedup_pruned": (
        "hierarchical assignment: N·seeds_per_cell + orphans·k — the "
        "linear scale path of the semantic_dedup family; its constant "
        "factors (two cell passes + checkpoints) only pay off once "
        "N·k dwarfs them. r6: the keep-first pair join is BLOCKED "
        "(cluster hash-split into ~128-row blocks, join keyed by "
        "(cluster, block_p, block_q)) — per-task work is bounded by "
        "~B² dot-folds regardless of cluster-count skew; this removed "
        "a measured x3>x10 inversion (118 clusters hashed onto 32 "
        "partitions worse than 391 did)"
    ),
    "knn_triangles": (
        "wedge join bounded by degree-ordered orientation (O(m^1.5)); "
        "the mutual-kNN edge build it consumes is the same bounded "
        "cell-family machinery probed via mutual_knn/embedding_clusters"
    ),
    "hybrid_rrf": (
        "fusion itself is O(queries·k); growth tracks the BM25 leg's "
        "posting lists and the dense leg's fixed-Q brute scan — the "
        "IVF-routed variant is DECLARED as hybrid_rrf_ivf (r6), probed "
        "below"
    ),
    "hybrid_rrf_ivf": (
        "r6: the declared scale path of the RAG combiner — dense leg "
        "through ivf_topk_hashed (per-query candidates "
        "O(N·n_probe/n_cells)); growth tracks the BM25 posting lists "
        "and the corpus-side IVF assignment (one broadcast + groupBy)"
    ),
    "text_semantic_dedup": (
        "r6: the flagship now runs hierarchical cell-pruned assignment "
        "(N·8 + orphans·k cosines) — the linear scale path; residual "
        "growth is the within-cluster keep-first pair join, bounded in "
        "VOLUME by the k∝N knob (expected cluster size ~128) and in "
        "PER-TASK SKEW by the r6 blocked pair join (~B² dot-folds per "
        "task; see _keepfirst_within_cluster)"
    ),
    "containment_pairs": (
        "same blocked shingle join as jaccard_pairs (linear on "
        "decorrelated replicas) incl. the r7 max_shingle_df valve "
        "(cap 96 declared, oracle-replayed); output ∝ true "
        "containment pairs"
    ),
    "sq8_topk": (
        "flat table-free ADC over int8 codes: candidates = Q×N — "
        "linear in N by design, same contrast role as pq_topk; the "
        "production composition routes through the IVF cell join "
        "(ivf_pq_topk's shape) with a 4× smaller code scan"
    ),
    "bq_topk": (
        "flat hamming scan over packed sign words: candidates = Q×N — "
        "linear in N with a 32× smaller code scan (two XOR+popcounts "
        "per candidate); same IVF composition at corpus scale"
    ),
    "filtered_ann_ivf": (
        "composed filtered×IVF (r7): candidate join keys on "
        "(label, cell) so per-query candidates are "
        "O(N·sel(label)·n_probe/n_cells) — the selectivity and cell "
        "prunings multiply; corpus shuffles once (assignment groupBy)"
    ),
    "ivf_pq_residual_topk": (
        "residual IVF-PQ (r7): candidates O(N·n_probe/n_cells); "
        "per-(query, probed-cell) ADC tables are n_probe·m tiny rows "
        "per query — the corpus-side encode is one broadcast-codebook "
        "projection + one groupBy(id), same shuffle count as "
        "ivf_pq_topk"
    ),
    "ivf_sq8_topk": (
        "the wired IVF×SQ8 composition: per-query candidates "
        "O(N·n_probe/n_cells) over a 4× smaller code scan — the "
        "ivf_pq_topk shape with SQ8's table-free ADC kernel"
    ),
    "ivf_bq_topk": (
        "the wired IVF×BQ composition: cell pruning × a 32× smaller "
        "code scan (XOR+popcount kernel) — the cheapest first stage "
        "of the ladder"
    ),
    "prototype_prune": (
        "prototype pruning (late r7): Lloyd train = iters*2 linear "
        "passes with n_cells*dim-long partials, distance = one "
        "broadcast join in codegen, percentile = one window after a "
        "single shuffle by cell - linear, no pair blowup anywhere"
    ),
    "mmr_rerank": (
        "MMR rerank (late r7): corpus work is the Q-broadcast "
        "shortlist scan (linear in N); everything after (pairwise "
        "sims, k greedy steps) touches only Q*shortlist^2 rows - "
        "constant in N"
    ),
    "retrieval_eval": (
        "retrieval metrics (late r7): the IVF run under eval is the "
        "linear part (candidates O(N*n_probe/n_cells)); the metric "
        "aggregation reads Q*k result rows + one broadcast label "
        "count - constant in N"
    ),
    "bm25_mmr": (
        "BM25 x MMR (late r7): BM25 posting-list joins are the linear "
        "stage (stopword valve available); normalization, pairwise "
        "sims, and greedy picks touch only Q*shortlist^2 rows - "
        "constant in N"
    ),
    "knn_descent": (
        "NN-descent graph build (late r7): seed = within-cell top-k + "
        "hash-ring overlay; each round self-joins the kN-row edge list "
        "on the middle vertex with reverse degree capped at "
        "max_reverse, so candidates/node <= (k+max_reverse)^2 "
        "regardless of hub skew - linear in N per round, never "
        "all-pairs"
    ),
    "ann_ivf_lloyd": (
        "Lloyd-trained IVF (late r7): training is iters=2 linear "
        "passes (broadcast-cents crossJoin + groupBy whose partials "
        "collapse to n_cells×dim longs, centroids checkpointed per "
        "round); search is the standard probe join, candidates "
        "O(N·n_probe/n_cells) — constant job-count overhead from the "
        "eager train rounds, linear work"
    ),
    "graph_search_topk": (
        "graph-ANN beam search (r8): dominated by the knn_descent "
        "build (linear per round, see knn_descent); the search itself "
        "is Q*beam*k*rounds rows — constant in N once built; entry "
        "points ride the range-exchange rank"
    ),
    "mmr_rerank_ivf": (
        "IVF-shortlisted MMR (r8): candidate generation is the IVF "
        "probe join (O(N*n_probe/n_cells)); pairwise sims and the k "
        "greedy steps touch only Q*shortlist^2 rows — constant in N"
    ),
    "label_propagation": (
        "label propagation (r8): build rides knn_descent (linear per "
        "round); each LP round is one |E|-linear edge join + a "
        "(node,label) groupBy + per-node argmax window — linear, "
        "bounded rounds"
    ),
    "unigram_lm": (
        "unigram-LM trainer (r8): one corpus-linear word-frequency "
        "pass; each EM round is UNI_MAXLEN broadcast vocab joins + a "
        "per-word top-1 window over the WORD table (sub-linear in "
        "corpus size: vocab growth is sub-linear in tokens), vocab "
        "collect bounded at O(SEED_V + alphabet)"
    ),
    "ivf_append": (
        "incremental IVF insert (r9): train is Lloyd on the 7/8 base "
        "(linear passes collapsing to n_cells×dim longs); the append "
        "is one broadcast + groupBy over the 1/8 batch only; search "
        "candidates O(N·n_probe/n_cells) — the whole flow linear"
    ),
    "graph_insert": (
        "incremental graph-ANN insert (r9): dominated by the base "
        "knn_descent build (linear per round); the batch search is "
        "|batch|·beam·(k+ring)·rounds — |batch| grows with N at the "
        "fixed 1/8 split so the ladder reads linear; the splice is "
        "one equi-join on ≤ |batch|·k affected adjacencies + a "
        "bounded window"
    ),
    "ivf_retrain_delta": (
        "codebook-refresh delta (r9): two Lloyd trains (each linear, "
        "partials collapse to n_cells×dim longs) + two broadcast "
        "assignment passes over the corpus + one id-equi-join — all "
        "linear; output ∝ moved rows only"
    ),
    "graph_delete": (
        "incremental graph-ANN delete-with-repair (r9): dominated by "
        "the full-corpus knn_descent build (linear per round); the "
        "repair itself is |edges into D|×k bridge candidates + one "
        "re-rank window over affected adjacencies only — both grow "
        "with N at the fixed 1/16 deleted slice, so the ladder reads "
        "linear"
    ),
    "graph_refresh": (
        "warm re-descent over the maintained graph (r10): the chain "
        "sums graph_maintained_search's parts plus ONE descent round "
        "— per-round candidates ≤ N·(k+max_reverse)², same bound as a "
        "knn_descent build round; linear-on-chord like the build"
    ),
    "ivf_maintained_topk": (
        "IVF CRUD-then-search (r10): train linear on base, append "
        "O(|batch|), delete one broadcast anti-join, probe search "
        "candidates ∝ N·n_probe/n_cells with Q fixed — linear"
    ),
    "incremental_snapshot": (
        "nightly ingest report (r10): hash anti-join + batch-internal "
        "dedup groupBy carry (hash, id) rows; embedding build in-row "
        "over admitted docs; codebook assignment one broadcast; "
        "per-domain legs O(domains) — linear in corpus at the fixed "
        "1/8 batch split"
    ),
    "graph_maintained_search": (
        "composed insert→delete→search (r10): sums its parts — base "
        "build linear, insert |batch|·beam·(k+ring)·rounds at the "
        "fixed 1/8 split, repair |edges into D|·k at the fixed 1/13 "
        "slice, final search O(Q·beam·(k+ring)·rounds) with Q fixed; "
        "the delta applications are bounded anti-joins — the ladder "
        "reads linear-on-chord like its three constituents"
    ),
    "ivf_recall_monitor": (
        "IVF recall gauge (r10): the maintained-IVF chain (train "
        "linear, probe candidates ∝ N·n_probe/n_cells) + one exact "
        "brute-force pass with Q fixed — O(Q·N), linear"
    ),
    "graph_recall_monitor": (
        "nightly recall gauge (r10): the maintained-search chain "
        "(linear-on-chord, probed above) + one brute-force pass over "
        "the alive corpus with Q FIXED queries — O(Q·N) with small Q, "
        "linear; the semi-join + per-query count are O(Q·k)"
    ),
    "index_maintenance_policy": (
        "gauge→action policy (r11): both recall-monitor chains (each "
        "probed linear above — maintained chain + one O(Q·N) brute "
        "pass, Q fixed) + an O(Q)-row aggregate and an O(families) "
        "decision frame on top — the policy adds nothing "
        "data-proportional, so the ladder reads as the sum of the two "
        "gauges: linear"
    ),
    "policy_applied": (
        "decision→action→outcome controller (r12): the IVF gauge chain "
        "runs at the degraded rung and again at the applied raise — "
        "each chain is the linear-probed maintained-IVF search + one "
        "O(Q·N) brute pass with Q fixed; the policy rows on top are "
        "O(Q) aggregates, so the ladder reads as 2× the gauge: linear"
    ),
    "video_neardup": (
        "clip copy detection (r12): frame fan-out ∝ payload bytes "
        "(linear scan), per-frame aHash is in-row, candidates come "
        "from banded equi-joins behind the shared hot-bucket valve — "
        "which BINDS as the fixed 16-bit key space saturates with "
        "frame count (the documented saturation knob: a larger corpus "
        "widens n_segments instead of raising the cap, exactly the "
        "media_neardup contract), so the probe prices the scan + "
        "signature, never a quadratic bucket join"
    ),
    "split_drift": (
        "split drift + freeze (r12): two LSH-closure chains (banded "
        "buckets → capped pairs → pointer-doubling components, each "
        "linear like cluster_canonical), one id-keyed join for the "
        "grandfathering rule, and O(splits²) report rows: linear"
    ),
    "embedding_drift": (
        "embedding-distribution drift gauge (r12): one posexplode scan "
        "per corpus version (N·dim rows, map-side partial aggregation) "
        "into a dim-cell groupBy — O(dim) output rows; nothing joins "
        "on anything data-proportional: linear in corpus bytes"
    ),
    "compaction_plan": (
        "small-file compaction planning (r10): one groupBy builds the "
        "manifest (linear scan of text lengths), then ONE window over "
        "O(files) metadata rows — the replicated corpus grows the scan "
        "linearly while the manifest stays ~constant (fixed lang × "
        "CPLAN_MOD shard grid), so the ladder reads linear, dominated "
        "by the manifest build"
    ),
    "graph_policy_applied": (
        "graph controller (r13): the maintained-graph gauge chain "
        "(linear-probed via graph_recall_monitor) runs at the degraded "
        "state and again over the warm re-descent — the refresh round "
        "is one knn_descent round (≤ N·(k+max_reverse)² candidates, "
        "the knn_descent probe's linear class) and the search legs are "
        "corpus-independent post-build; the policy rows are O(Q) "
        "aggregates, so the ladder reads as 2× gauge + 1 descent "
        "round: linear"
    ),
    "drift_policy_applied": (
        "drift→retrain controller (r13): one drift gauge scan (the "
        "embedding_drift probe, linear), then the warm Lloyd retrain "
        "(broadcast assignment passes, no corpus shuffle — the "
        "ann_ivf_lloyd class), the O(N) retrain-delta join, and one "
        "O(Q·N) recall gauge with Q fixed: sum of linear parts"
    ),
    "graph_drift_applied": (
        "graph drift symmetry (r13): the drift gauge scan + the "
        "maintained-graph chain + one warm descent round + one recall "
        "gauge — each the linear class its standalone probe prices; "
        "no new shuffle or join shape beyond graph_policy_applied's"
    ),
    "snapshot_upgrade": (
        "snapshot-upgrade runbook (r13): two LSH-closure split chains "
        "(the split_drift class) + the drift gauge + warm retrain + "
        "one recall gauge, composed sequentially into O(stages) output "
        "rows — the ladder reads as the sum of its four linear-probed "
        "parts; nothing joins stage outputs on data-proportional keys"
    ),
}


def build_scaled(spark, rep: int = R, outdir: str = SCALED) -> None:
    from pyspark.sql import functions as F

    from wasaffi_spark.sources.parquet import read_parquet

    os.makedirs(outdir, exist_ok=True)

    docs = read_parquet(spark, os.path.join(BASE, "documents.parquet"))
    n_doc = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    parts = []
    for r in range(rep):
        d = docs.withColumn("doc_id", F.col("doc_id") + F.lit(r * n_doc))
        if r > 0:
            d = d.withColumn(
                "text",
                F.array_join(
                    F.transform(
                        F.split(F.col("text"), " "),
                        lambda t: F.concat(t, F.lit(f"r{r}")),
                    ),
                    " ",
                ),
            )
        parts.append(d)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.mode("overwrite").parquet(
        os.path.join(outdir, "documents.parquet")
    )

    emb = read_parquet(spark, os.path.join(BASE, "embeddings.parquet"))
    n_emb = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    parts = []
    for r in range(rep):
        e = emb.withColumn("vec_id", F.col("vec_id") + F.lit(r * n_emb))
        if r > 0:
            e = e.withColumn(
                "embedding",
                F.transform(
                    F.col("embedding"),
                    lambda x, i: (
                        x.cast("double")
                        + 0.3 * F.sin(1.7 * i.cast("double") + F.lit(2.3 * r))
                    ),
                ),
            )
        parts.append(e)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.mode("overwrite").parquet(
        os.path.join(outdir, "embeddings.parquet")
    )

    li = read_parquet(spark, os.path.join(BASE, "lineitem.parquet"))
    n_supp = li.agg(F.max("l_suppkey")).collect()[0][0] + 1
    n_part = li.agg(F.max("l_partkey")).collect()[0][0] + 1
    parts = [
        li.withColumn("l_suppkey", F.col("l_suppkey") + F.lit(r * n_supp))
        .withColumn("l_partkey", F.col("l_partkey") + F.lit(r * n_part))
        for r in range(rep)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.mode("overwrite").parquet(
        os.path.join(outdir, "lineitem.parquet")
    )


def main() -> None:
    import __spark_entry__ as entrymod
    from wasaffi_spark.conf import recommended_builder

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        recommended_builder(
            master=f"local[{cpus}]", cpus=cpus, app_name="wasaffi-bench-scale"
        )
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    if "--rebuild" in sys.argv and os.path.isdir(SCALE_ROOT):
        shutil.rmtree(SCALE_ROOT)
    if not os.path.isdir(os.path.join(SCALED, "documents.parquet")):
        build_scaled(spark, R, SCALED)
    if not os.path.isdir(os.path.join(SCALED_MID, "documents.parquet")):
        build_scaled(spark, R_MID, SCALED_MID)
    if not os.path.isdir(os.path.join(SCALED_X1, "documents.parquet")):
        build_scaled(spark, 1, SCALED_X1)

    queries = entrymod.queries()
    queries.update(entrymod.extra_queries())

    # --only a,b,c: probe just those queries and MERGE the rows into the
    # existing BENCH_SCALE.json (keeps prior measurements; used to add
    # probes for new operators without re-running the full ladder)
    only = None
    for i, a in enumerate(sys.argv):
        if a == "--only" and i + 1 < len(sys.argv):
            only = set(sys.argv[i + 1].split(","))
    if only is not None:
        unknown = only - set(PROBES) - {"semantic_dedup_k160"}
        if unknown:
            raise SystemExit(
                f"--only names not in PROBES: {sorted(unknown)}"
            )
        if not os.path.exists(os.path.join(REPO, "BENCH_SCALE.json")):
            raise SystemExit(
                "--only merges into an existing BENCH_SCALE.json; none "
                "found — run the full ladder first"
            )

    # the knob-follows-the-data variant of semantic_dedup: k_seeds scales
    # with N so Σ|cluster|² stays bounded — the comparison row that shows
    # the quadratic term is the (documented) knob, not the operator.
    from pyspark.sql import functions as F

    from wasaffi_spark.operators import similarity as sim

    def semantic_dedup_k160(spark, sf_dir):
        from wasaffi_spark.sources.parquet import read_parquet

        emb = read_parquet(spark, os.path.join(sf_dir, "embeddings.parquet"))
        return sim.semantic_dedup(emb, k_seeds=160, threshold=0.95)

    def timed(fn, sf_dir, runs=2) -> float:
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    # Trivial-job session floor, kept for the record (VERDICT r5 next
    # #5 asked for work-only ratios; the honest measurement is that the
    # floor is ~0.06 s — far too small to explain any >2× ratio — so
    # overhead subtraction was replaced by the 3-point affine fit
    # documented in the module docstring).
    def _floor_q(spark, sf_dir):
        return spark.range(cpus, numPartitions=cpus)

    floor = timed(_floor_q, BASE, runs=5)
    print(f"  session floor: {floor}s", flush=True)

    def probe(fn) -> dict:
        t1 = timed(fn, SCALED_X1, runs=3)
        t3 = timed(fn, SCALED_MID, runs=3)
        t10 = timed(fn, SCALED, runs=3)
        row = {
            "sf0.1_sec": t1,
            "x3_sec": t3,
            "x10_sec": t10,
            "ratio": round(t10 / t1, 2) if t1 > 0 else None,
        }
        # three-point convexity test (module docstring): measured x3 vs
        # the chord through (x1, x10) — constant+linear lies ON the
        # chord, quadratic far below, saturation/knob-cliffs above.
        chord3 = t1 + (t10 - t1) * (R_MID - 1) / (R - 1)
        dev = (t3 - chord3) / chord3 if chord3 > 0 else 0.0
        row["chord_x3_pred"] = round(chord3, 3)
        row["chord_dev_pct"] = round(100 * dev, 1)
        if dev < -0.25:
            row["shape"] = "convex (superlinear)"
        elif dev > 0.25:
            row["shape"] = "concave (saturating)"
        else:
            row["shape"] = "linear"
        return row

    # session warmup: one untimed execution of a representative probe at
    # each scale dir, so codegen/worker-pool startup doesn't land on the
    # first timed probe (see module docstring).
    warm = queries["pq_topk"]
    for d in (SCALED_X1, SCALED_MID, SCALED):
        warm(spark, d).write.format("noop").mode("overwrite").save()
    # the generic warmup does not cover heavy Arrow/checkpoint plan
    # shapes (measured: a graph-family query probed FIRST reads 2x its
    # steady-state x1 time — janino + Arrow worker spin-up landing on
    # the first timed scale). Warm each probed query itself once,
    # untimed, at the smallest scale.
    for name in PROBES:
        if only is not None and name not in only:
            continue
        queries[name](spark, SCALED_X1).write.format("noop").mode(
            "overwrite"
        ).save()
    print("  session warmed", flush=True)

    results = {}
    for name, cause in PROBES.items():
        if only is not None and name not in only:
            continue
        row = probe(queries[name])
        if cause and row["shape"] == "convex (superlinear)":
            row["superlinear_cause"] = cause
        elif cause:
            row["note"] = cause
        results[name] = row
        print(
            f"  {name}: {row['sf0.1_sec']}s / {row['x3_sec']}s / "
            f"{row['x10_sec']}s (x{row['ratio']}, {row['shape']}, "
            f"chord_dev={row['chord_dev_pct']}%)",
            flush=True,
        )

    if only is None or "semantic_dedup_k160" in only:
        row = probe(semantic_dedup_k160)
        row["note"] = (
            "same operator with k_seeds=160 (knob ∝ N): bounds the "
            "within-cluster pair join at 10× data"
        )
        results["semantic_dedup_k160"] = row
        print(
            f"  semantic_dedup_k160: {row['sf0.1_sec']}s -> "
            f"{row['x10_sec']}s (x{row['ratio']}, {row['shape']})",
            flush=True,
        )

    out_path = os.path.join(REPO, "BENCH_SCALE.json")
    if only is not None and os.path.exists(out_path):
        with open(out_path) as f:
            prior = json.load(f)
        merged = prior.get("queries", {})
        merged.update(results)
        prior["queries"] = merged
        prior["session_floor_sec"] = floor
        # refresh methodology metadata so merged rows are never
        # attributed to an older measurement recipe
        prior["replication"] = R
        prior["mid_replication"] = R_MID
        prior["method"] = METHOD
        prior["x1_note"] = (
            "sf0.1_sec is measured against the rewritten .scale/x1 "
            "32-file layout (identical layout at every scale point), "
            "NOT the raw single-file sf0.1 — see module docstring"
        )
        with open(out_path, "w") as f:
            json.dump(prior, f, indent=1)
        spark.stop()
        return

    with open(out_path, "w") as f:
        json.dump(
            {
                "replication": R,
                "mid_replication": R_MID,
                "base_dir": BASE,
                "cpus": cpus,
                "session_floor_sec": floor,
                "method": METHOD,
                "x1_note": (
                    "sf0.1_sec is measured against the rewritten "
                    ".scale/x1 32-file layout (identical layout at "
                    "every scale point), NOT the raw single-file "
                    "sf0.1 — see module docstring"
                ),
                "queries": results,
            },
            f,
            indent=1,
        )
    spark.stop()


if __name__ == "__main__":
    main()
