"""Benchmark-decontamination operator: flag training documents that
share any word n-gram with a held-out evaluation set.

The standard LLM pre-training hygiene step (the reference has no
equivalent — this is SURVEY §7.6 extension surface): before training,
any document overlapping an eval/benchmark document by an n-gram of
length >= N (N=8..13 in published pipelines) is flagged or dropped so
benchmark answers can't leak into the training set.

Spark-first shape, built to scale:

- n-gram generation is a pure column expression (``sequence`` →
  ``transform`` → ``explode``) — no Python in the data path, no
  shuffle to *produce* grams; output size ∝ input tokens.
- the eval side is reduced to ``distinct`` grams (one shuffle over the
  *eval* corpus, which is orders of magnitude smaller than train).
- the overlap test is a ``left_semi`` equi-join on the gram string —
  Catalyst/AQE picks broadcast when the eval gram set is small and a
  shuffled hash join when it isn't; nothing is unconditionally
  broadcast (an eval set of millions of docs would OOM a forced
  broadcast — the tfidf lesson from round 1).
- per-document hit counts are a ``groupBy(doc_id)`` over the *matched*
  grams only (post-semi-join cardinality, tiny vs the corpus).

At 100 TB: two shuffles total (eval distinct; hit-count groupBy), both
over sides that are small relative to the train corpus. The train-side
gram explosion never shuffles — it streams straight into the join probe.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens


def word_ngrams(text_col: str, n: int) -> Column:
    """Array of space-joined word ``n``-grams (lower-cased, whitespace
    tokenized). Documents shorter than ``n`` tokens yield an empty
    array — NOT a descending ``sequence`` artifact (``sequence(0, -k)``
    counts *down* in Spark, which would fabricate bogus grams)."""
    toks = tokens(text_col)
    starts = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    grams = F.transform(
        starts, lambda s: F.concat_ws(" ", F.slice(toks, s, n))
    )
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def contamination_hits(
    train: DataFrame,
    eval_set: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id_col, hits) for every train document sharing >= 1 word
    ``n``-gram with ``eval_set``; ``hits`` = number of its distinct
    grams that appear anywhere in the eval set."""
    gram = F.explode(word_ngrams(text_col, n)).alias("gram")
    # deliberately NO distinct on the train grams: that would shuffle
    # the full exploded corpus. The semi-join filters first (train side
    # stays map-side when eval_grams broadcasts); dedup happens in the
    # post-join count, over matched grams only.
    train_grams = train.select(F.col(id_col), gram)
    eval_grams = eval_set.select(gram).distinct()
    return (
        train_grams.join(eval_grams, "gram", "left_semi")
        .groupBy(id_col)
        .agg(F.count_distinct(F.col("gram")).alias("hits"))
    )


def decontaminate(
    train: DataFrame,
    eval_set: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Training corpus minus every document contaminated by the eval
    set (anti-join on the hit list — one additional co-partitioned
    join on ``id_col``)."""
    hits = contamination_hits(train, eval_set, n, id_col, text_col)
    return train.join(hits.select(id_col), id_col, "left_anti")


def fuzzy_contamination(
    train: DataFrame,
    eval_set: DataFrame,
    threshold: float = 0.5,
    num_perm: int | None = None,
    bands: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """MinHash NEAR-duplicate decontamination (the fuzzy companion of
    :func:`contamination_hits` — GPT-3/Llama-style pipelines run both:
    exact n-gram overlap catches verbatim leaks, MinHash Jaccard catches
    paraphrased/reformatted benchmark copies that share shingles but no
    long exact n-gram).

    Per train document: the eval documents sharing at least one banded
    LSH bucket with it, scored by estimated Jaccard (fraction of
    agreeing minhashes); returns ``(id_col, n_eval_hits, max_est)`` for
    every train doc whose best eval match has ``est >= threshold``.

    Scale shape: signatures are one explode+groupBy per side (the eval
    side is tiny); the candidate step is a banded EQUI-join train↔eval —
    never all-pairs — and AQE broadcasts the eval bucket side. The
    estimate join touches candidate pairs only. ``max_bucket_size``
    (``None`` = exact, what the oracle checks) caps degenerate buckets
    exactly as in :func:`..dedup.lsh_candidate_pairs`.
    """
    from .dedup import BANDS, NUM_PERM, _cap_buckets, band_buckets, minhash_signatures

    num_perm = NUM_PERM if num_perm is None else num_perm
    bands = BANDS if bands is None else bands
    sig_t = minhash_signatures(train, text_col, id_col, num_perm)
    sig_e = minhash_signatures(eval_set, text_col, id_col, num_perm)
    bt = band_buckets(sig_t, id_col, num_perm, bands)
    be = band_buckets(sig_e, id_col, num_perm, bands).withColumnRenamed(
        id_col, "_eid"
    )
    bt = _cap_buckets(bt, max_bucket_size)
    cand = (
        bt.join(be, ["band", "key"])
        .select(F.col(id_col), F.col("_eid"))
        .distinct()
    )
    sa = sig_t.alias("sa")
    sb = sig_e.alias("sb")
    agree = sum(
        F.when(F.col(f"sa.h{i}") == F.col(f"sb.h{i}"), 1).otherwise(0)
        for i in range(num_perm)
    )
    est = (
        cand.join(sa, cand[id_col] == F.col(f"sa.{id_col}"))
        .join(sb, cand["_eid"] == F.col(f"sb.{id_col}"))
        .select(
            cand[id_col].alias("_tid"),
            F.round(agree / F.lit(float(num_perm)), 6).alias("est"),
        )
    )
    return (
        est.where(F.col("est") >= threshold)
        .groupBy(F.col("_tid").alias(id_col))
        .agg(
            F.count("*").alias("n_eval_hits"),
            F.max("est").alias("max_est"),
        )
    )
