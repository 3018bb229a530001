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
