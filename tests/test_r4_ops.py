"""Round-4 operator hardening tests: hot-bucket caps, packing-invariant
guards, pair-identity dedup in the interval join, and the idempotent
streaming dedup sink."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# hot-bucket caps (VERDICT r3 "What's wrong" #1 / next-round #3)


def _degenerate_docs(spark, n_empty=8):
    """A planted degenerate cluster: n_empty docs that are token-for-token
    identical (→ identical SimHash signatures, one hot (band, key) bucket)
    plus two genuinely distinct docs."""
    rows = [(i, "same same same boiler plate text here") for i in range(n_empty)]
    rows += [
        (100, " ".join(f"alpha{j}" for j in range(50))),
        (101, " ".join(f"beta{j}" for j in range(50))),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_simhash_pairs_hot_bucket_cap(spark):
    from wasaffi_spark.operators.dedup import simhash_pairs

    docs = _degenerate_docs(spark, n_empty=8)
    uncapped = simhash_pairs(docs).collect()
    # the degenerate cluster self-joins: C(8,2) = 28 pairs
    assert len([r for r in uncapped if r["id_a"] < 100]) == 28
    capped = simhash_pairs(docs, max_bucket_size=4).collect()
    # every bucket holding the 8 clones exceeds the cap → cluster dropped
    assert [r for r in capped if r["id_a"] < 100] == []


def test_simhash_pairs_parameter_validation(spark):
    from wasaffi_spark.operators.dedup import simhash_pairs

    docs = _degenerate_docs(spark, 2)
    with pytest.raises(ValueError, match="pigeonhole"):
        simhash_pairs(docs, max_hamming=4, bands=4)
    with pytest.raises(ValueError, match="divide"):
        simhash_pairs(docs, bands=5)  # 48 % 5 != 0


def test_neardup_pairs_hot_bucket_cap(spark):
    from wasaffi_spark.operators.similarity import neardup_pairs

    # 6 identical vectors land in one sign-LSH cell; cap kills the cell
    vecs = [(i, [1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0]) for i in range(6)]
    vecs += [(10, [-1.0, 2.0, -3.0, 1.0, -1.0, 2.0, -2.0, 1.0])]
    emb = spark.createDataFrame(vecs, "vec_id bigint, embedding array<double>")
    assert len(neardup_pairs(emb, threshold=0.9).collect()) == 15  # C(6,2)
    assert neardup_pairs(emb, threshold=0.9, max_bucket_size=3).collect() == []


def test_bucketed_topk_hot_bucket_cap(spark):
    from wasaffi_spark.operators.similarity import bucketed_topk

    vecs = [(i, [1.0] * 8) for i in range(6)]
    emb = spark.createDataFrame(vecs, "vec_id bigint, embedding array<double>")
    q = emb.where(F.col("vec_id") == 0)
    assert bucketed_topk(q, emb, k=3).count() == 3
    # corpus cell of 6 clones exceeds cap → no candidates at all
    assert bucketed_topk(q, emb, k=3, max_bucket_size=3).count() == 0


# ---------------------------------------------------------------------------
# ngram_span_dedup packing guard (VERDICT next-round #7, ADVICE medium)


def test_ngram_span_dedup_pos_scale_guard_fires(spark):
    from wasaffi_spark.operators.dedup import ngram_span_dedup

    # pos_scale=8 with a 10-token doc → invariant violated → hard error,
    # never silent span corruption
    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(10)))], "doc_id bigint, text string"
    )
    out = ngram_span_dedup(docs, k=3, pos_scale=8)
    with pytest.raises(Exception, match="packing invariant"):
        out.collect()


def test_ngram_span_dedup_doc_id_guard_fires(spark):
    from wasaffi_spark.operators.dedup import ngram_span_dedup

    big_id = (1 << 63) // 1_000_000  # > max packable id at default scale
    docs = spark.createDataFrame(
        [(big_id, "a b c d e f g h i j")], "doc_id bigint, text string"
    )
    with pytest.raises(Exception, match="packing invariant"):
        ngram_span_dedup(docs, k=3).collect()


def test_ngram_span_dedup_rejects_non_integral_id(spark):
    from wasaffi_spark.operators.dedup import ngram_span_dedup

    docs = spark.createDataFrame(
        [("doc-1", "a b c d e f g h i j")], "doc_id string, text string"
    )
    with pytest.raises(TypeError, match="integral"):
        ngram_span_dedup(docs, k=3)


def test_ngram_span_dedup_ok_within_bounds(spark):
    from wasaffi_spark.operators.dedup import ngram_span_dedup

    shared = "one two three four five six seven eight"
    docs = spark.createDataFrame(
        [(1, shared + " tail1"), (2, shared + " tail2")],
        "doc_id bigint, text string",
    )
    rows = {r["doc_id"]: r for r in ngram_span_dedup(docs, k=8).collect()}
    assert rows[1]["n_removed"] == 0  # first occurrence survives
    assert rows[2]["n_removed"] == 8  # the duplicated 8-gram span goes


# ---------------------------------------------------------------------------
# interval_overlap_join pair identity (ADVICE low #2)


def test_interval_overlap_join_keeps_duplicate_rows(spark):
    from wasaffi_spark.operators.temporal import interval_overlap_join

    # two IDENTICAL left intervals must each match the right interval —
    # the old whole-row distinct() collapsed them into one output row
    left = spark.createDataFrame(
        [
            ("k", "2024-01-01 00:00:00", "2024-01-01 05:00:00"),
            ("k", "2024-01-01 00:00:00", "2024-01-01 05:00:00"),
        ],
        "key string, start string, end string",
    ).select(
        "key",
        F.to_timestamp("start").alias("start"),
        F.to_timestamp("end").alias("end"),
    )
    right = spark.createDataFrame(
        [("k", "2024-01-01 01:00:00", "2024-01-01 02:00:00")],
        "key string, start string, end string",
    ).select(
        "key",
        F.to_timestamp("start").alias("start"),
        F.to_timestamp("end").alias("end"),
    )
    out = interval_overlap_join(left, right, on="key")
    assert out.count() == 2
    # and multi-bucket overlaps still dedup to one row per (l,r) pair
    out1 = interval_overlap_join(left.limit(1), right, on="key")
    assert out1.count() == 1


# ---------------------------------------------------------------------------
# streaming incremental dedup sink: restart + idempotency (ADVICE low #4)


def test_incremental_dedup_sink_preserves_state_across_restart(spark, tmp_path):
    """Run the sink twice over the same source with a persistent state
    dir: the second run must NOT re-admit documents already deduped by
    the first (the old implementation wiped state on every call)."""
    from wasaffi_spark.streaming import documents as sdoc

    src = str(tmp_path / "src")
    docs = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "alpha")], "doc_id bigint, text string"
    )
    docs.write.parquet(src)
    schema = spark.read.parquet(src).schema
    state_dir = str(tmp_path / "state")

    stream = spark.readStream.schema(schema).parquet(src)
    q = sdoc.incremental_dedup_sink(stream, spark, state_dir)
    q.awaitTermination()
    kept1 = spark.read.parquet(f"{state_dir}/docs").where(F.col("doc_id") > 0)
    assert kept1.count() == 2  # alpha (first), beta

    # restart over the same files: checkpoint says nothing new → no new
    # rows; state (and previous docs) intact
    stream2 = spark.readStream.schema(schema).parquet(src)
    q2 = sdoc.incremental_dedup_sink(stream2, spark, state_dir)
    q2.awaitTermination()
    kept2 = spark.read.parquet(f"{state_dir}/docs")
    assert kept2.where(F.col("doc_id") > 0).count() == 2

    # new file arrives with one dup and one novel text → only the novel
    # row lands, proving cross-restart state is consulted
    more = spark.createDataFrame(
        [(4, "alpha"), (5, "gamma")], "doc_id bigint, text string"
    )
    more.write.mode("append").parquet(src)
    stream3 = spark.readStream.schema(schema).parquet(src)
    q3 = sdoc.incremental_dedup_sink(stream3, spark, state_dir)
    q3.awaitTermination()
    kept3 = spark.read.parquet(f"{state_dir}/docs")
    texts = {r["text"] for r in kept3.collect()}
    assert texts == {"alpha", "beta", "gamma"}
    assert kept3.count() == 3


# ---------------------------------------------------------------------------
# entry-module registry invariants (ADVICE low #5)


def test_query_registries_disjoint_and_oracled():
    import __spark_entry__ as entry

    q = entry.queries()
    x = entry.extra_queries()
    assert not set(q) & set(x), "driver window and extras must not overlap"
    xo = entry.extra_oracle_sql()
    assert set(xo) <= set(x), "extra oracle without a matching extra query"
    assert len(q) <= 50, "driver correctness window is 50 entries"


# ---------------------------------------------------------------------------
# IVF hashed + IVF×PQ composition (VERDICT next-round #1/#2)


def _toy_embeddings(spark, n=40, dim=64):
    import math

    rows = []
    for i in range(n):
        # deterministic pseudo-random unit-ish vectors, two loose clusters
        base = 1.0 if i % 2 == 0 else -1.0
        vec = [
            round(base * math.sin(0.1 * i + 0.37 * d) + 0.01 * ((i * 7 + d) % 5), 6)
            for d in range(dim)
        ]
        rows.append((i, vec))
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


def test_ivf_topk_hashed_recall_vs_bruteforce(spark):
    from wasaffi_spark.operators.similarity import brute_force_topk, ivf_topk_hashed

    emb = _toy_embeddings(spark)
    q = emb.where(F.col("vec_id") < 4)
    exact = {
        (r["qid"], r["nid"]) for r in brute_force_topk(q, emb, k=3).collect()
    }
    approx = {
        (r["qid"], r["nid"])
        for r in ivf_topk_hashed(q, emb, k=3, n_cells=8, n_probe=4).collect()
    }
    # probing half the cells of a 2-cluster corpus must recover most of
    # the exact neighbours
    assert len(approx & exact) / len(exact) >= 0.5


def test_ivf_pq_topk_equals_pq_topk_when_probing_all_cells(spark):
    """With n_probe = codebook_k every cell is probed, so the composed
    index degenerates to the full ADC scan — output must be IDENTICAL
    to plain pq_topk (same integer grid, same tiebreaks)."""
    from wasaffi_spark.operators.similarity import PQ_K, ivf_pq_topk, pq_topk

    emb = _toy_embeddings(spark)
    q = emb.where(F.col("vec_id") < 4)
    full = sorted(map(tuple, pq_topk(q, emb, k=3).collect()))
    composed = sorted(map(tuple, ivf_pq_topk(q, emb, k=3, n_probe=PQ_K).collect()))
    assert composed == full


def test_ivf_pq_topk_candidates_come_from_probed_cells_only(spark):
    from wasaffi_spark.operators.similarity import ivf_pq_topk

    emb = _toy_embeddings(spark)
    q = emb.where(F.col("vec_id") < 4)
    out = ivf_pq_topk(q, emb, k=40, n_probe=1).collect()
    # with a single probed cell per query, each query's candidate count
    # is bounded by the largest cell, strictly less than the corpus
    per_q = {}
    for r in out:
        per_q.setdefault(r["qid"], 0)
        per_q[r["qid"]] += 1
    assert per_q and all(c < 39 for c in per_q.values())


# ---------------------------------------------------------------------------
# data-proportional ANN cells (VERDICT next-round #4)


def test_auto_sign_bits_tracks_corpus_size():
    from wasaffi_spark.operators.similarity import auto_sign_bits

    assert auto_sign_bits(256 * 256) == 8          # the old constant, derived
    assert auto_sign_bits(2 * 256 * 256) == 9      # 2x corpus -> +1 bit
    assert auto_sign_bits(100_000_000_000) == 29   # 100B vectors stays clamped
    assert auto_sign_bits(10) == 1
    import pytest as _pytest

    with _pytest.raises(ValueError):
        auto_sign_bits(0)


def test_auto_sign_bits_bounds_cell_candidates(spark):
    """With bits from auto_sign_bits, the LARGEST cell in a spread-out
    corpus stays near the target occupancy instead of growing O(N)."""
    import math

    from wasaffi_spark.operators.similarity import auto_sign_bits, with_cell

    n, dim, target = 4096, 16, 64
    rows = [
        (i, [math.sin(0.7 * i + 1.3 * d) for d in range(dim)]) for i in range(n)
    ]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    bits = auto_sign_bits(n, target_cell_size=target)
    assert bits == 6  # 4096/64
    sizes = [
        r["c"]
        for r in with_cell(emb, bits=bits)
        .groupBy("cell")
        .agg(F.count("*").alias("c"))
        .collect()
    ]
    # sine-lattice vectors are not uniform over sign patterns, so allow
    # generous slack — the point is O(target), not O(N)
    assert max(sizes) < 16 * target
    assert len(sizes) > 8
