"""Data Selection via Importance Resampling (DSIR) — Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling"
(arXiv:2302.03169).

Beyond-reference extension (SURVEY §7.6; the reference engine,
/root/reference/, has no data-selection surface). DSIR scores every raw
document by how target-like it is under a pair of hashed bag-of-ngrams
generative models: features are unigrams+bigrams hashed into ``B``
buckets, the target and raw corpora each induce a smoothed categorical
distribution over buckets, and a document's log importance weight is

    log w(x) = Σ_{f ∈ features(x)} [ log p_target(bucket(f))
                                     − log p_raw(bucket(f)) ].

The top-n documents by weight form the selected training subset (the
paper resamples with Gumbel noise; the deterministic top-n variant here
is the hash-oracle-able one, and the Gumbel step is exactly
:func:`wasaffi_spark.operators.pipeline.weighted_sample_n` applied to
``exp(log_w)`` — already covered by its own oracle).

Spark-first shape, built for 100 TB:

- feature extraction is in-row (``split`` → ``transform`` → ``explode``)
  — no Python, no shuffle to produce features; output rows ∝ 2× tokens.
- both bucket histograms are ``groupBy(bucket)`` with map-side partial
  aggregation → at most ``B`` rows each regardless of corpus size.
- the per-bucket log-ratio table is DENSE (all ``B`` buckets, unseen
  buckets get the smoothing floor) and ≤ ``B`` rows, so the per-document
  scoring join is a broadcast hash join — the corpus never shuffles to
  be scored; the only corpus-sized shuffle is the final
  ``groupBy(doc_id)`` sum.
- hashing is the portable md5-prefix idiom (``hashing.md5_prefix_int``)
  so the whole pipeline — bucketing included — replays bit-identically
  in DuckDB for the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .hashing import md5_prefix_int

N_BUCKETS = 256  # hashed-feature vocabulary size (paper uses 10k; small
# here so the sf0.01 oracle exercises collisions, which are part of the
# method, not a defect)
ALPHA = 1.0  # add-alpha smoothing for both categorical models


def _feature_buckets(
    df: DataFrame,
    n_buckets: int = N_BUCKETS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id_col, b) — one row per unigram+bigram occurrence, hashed into
    ``n_buckets`` buckets. Pure column expressions; occurrences are
    deliberately NOT deduplicated (DSIR models feature counts)."""
    toks = F.filter(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
        lambda x: x != F.lit(""),
    )
    base = df.select(F.col(id_col), toks.alias("_t")).withColumn(
        "_n", F.size("_t")
    )
    bigrams = F.when(
        F.col("_n") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.col("_n") - 1),
            lambda i: F.concat_ws(" ", F.slice("_t", i, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    feats = base.select(
        F.col(id_col), F.explode(F.concat(F.col("_t"), bigrams)).alias("f")
    )
    return feats.select(
        F.col(id_col),
        F.pmod(md5_prefix_int(F.md5(F.col("f")), 8), F.lit(n_buckets)).alias(
            "b"
        ),
    )


def dsir_logweights(
    raw: DataFrame,
    target: DataFrame,
    n_buckets: int = N_BUCKETS,
    alpha: float = ALPHA,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document DSIR log importance weight.

    Returns ``(id_col, n_feats, log_w)`` for EVERY raw document
    (feature-less documents score 0.0 with ``n_feats`` 0).
    """
    rb = _feature_buckets(raw, n_buckets, text_col, id_col)
    tb = _feature_buckets(target, n_buckets, text_col, id_col)
    r_cnt = rb.groupBy("b").agg(F.count("*").alias("rc"))
    t_cnt = tb.groupBy("b").agg(F.count("*").alias("tc"))
    totals = (
        tb.agg(F.count("*").cast("double").alias("tt"))
        .crossJoin(rb.agg(F.count("*").cast("double").alias("tr")))
    )
    dense = (
        raw.sparkSession.range(n_buckets)
        .select(F.col("id").alias("b"))
    )
    ab = float(alpha) * n_buckets
    ratio = (
        dense.join(t_cnt, "b", "left")
        .join(r_cnt, "b", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "b",
            (
                F.log(
                    (F.coalesce(F.col("tc"), F.lit(0)).cast("double") + alpha)
                    / (F.col("tt") + F.lit(ab))
                )
                - F.log(
                    (F.coalesce(F.col("rc"), F.lit(0)).cast("double") + alpha)
                    / (F.col("tr") + F.lit(ab))
                )
            ).alias("lr"),
        )
    )
    per_doc = (
        rb.join(F.broadcast(ratio), "b")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_feats"),
            F.round(F.sum("lr"), 6).alias("log_w"),
        )
    )
    return (
        raw.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_feats"), F.lit(0)).alias("n_feats"),
            F.coalesce(F.col("log_w"), F.lit(0.0)).alias("log_w"),
        )
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    n_keep: int,
    n_buckets: int = N_BUCKETS,
    alpha: float = ALPHA,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic top-``n_keep`` DSIR selection: every raw document
    with its weight, global rank (weight desc, id asc on the ROUNDED
    weight — the tie rule the oracle can replay), and ``selected`` flag.

    The global rank is computed DISTRIBUTED
    (:func:`..ranking.global_row_number`: range exchange + per-range
    local rank + O(parts) offset collect — r5, replacing the
    single-partition ``Window.orderBy`` sort that made the 10× scale
    probe superlinear, BENCH_SCALE r4 2.68×). Same exact output.
    At 100 TB the rank column can also be swapped for the quantile
    threshold (``approx_quantile`` on ``log_w`` → filter), which needs
    no order at all; the rank variant is the exact/oracle-able one.
    """
    from .ranking import global_row_number

    w = dsir_logweights(raw, target, n_buckets, alpha, text_col, id_col)
    ranked = global_row_number(
        w, [F.col("log_w").desc(), F.col(id_col).asc()], out_col="rnk"
    )
    return ranked.withColumn("selected", F.col("rnk") <= n_keep)
