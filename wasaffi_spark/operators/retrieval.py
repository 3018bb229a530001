"""Full-text retrieval operators: BM25 ranked search over the corpus.

The RAG-ingestion counterpart of the index-construction side
(`text.inverted_index`): given a set of term queries, rank documents by
Okapi BM25 and return the top-k per query. Everything stays in Spark
built-ins (explode → broadcast term filter → two aggregations → one
ranking window); the corpus-sized frames shuffle once on (token, doc)
and once on (query, doc).

Cross-engine determinism: per-term score contributions are converted to
integer micro-units (``floor(x * 1e6 + 0.5)`` as bigint) before
summation, so the per-(query, doc) score is an exact bigint — immune to
float summation order — and the final ranking/tiebreak is fully
hash-checkable against the DuckDB oracle (same trick as
``graph.pagerank``'s micro-unit ranks). The 1e6 scale is deliberate:
the score passes through ``ln``, where JVM ``Math.log`` and DuckDB's
libm may disagree by 1 ulp, and the coarser scale keeps that ulp far
from the floor boundary.

100 TB posture: the query set is broadcast (real deployments batch a few
thousand queries per pass — shard the query set across passes beyond
that); document frequencies for the scored terms come from the corpus in
the same pass (at scale, read them from a maintained `inverted_index`
side table instead — the operator takes ``df_stats`` for exactly that);
candidate sets are per-term posting lists, so hot stopword-class terms
dominate — prune them with ``max_df_frac`` exactly as search engines
drop stopwords from scoring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import tokens

MICRO = 1_000_000  # micro-unit scale for exact score sums (see module doc)


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df_frac: float | None = None,
) -> DataFrame:
    """Okapi BM25 top-k retrieval.

    ``queries``: one row per (``query_id``, ``term``) — lower-case terms.
    Returns (``query_id``, ``doc_id``, ``score_micro``, ``score``,
    ``rank``) with ``rank`` ≤ k per query; ``score_micro`` is the exact
    bigint sum of per-term micro-unit contributions, ``score`` its
    float form (score_micro / 1e9). Deterministic tiebreak: equal
    scores rank by ascending doc id.

    IDF is the Lucene/standard form ``ln(1 + (N - df + 0.5)/(df + 0.5))``
    (always positive); the tf saturation term uses document length
    normalized by the corpus mean length. ``max_df_frac`` optionally
    drops terms appearing in more than that fraction of documents from
    scoring (stopword pruning — the posting-list hot-key valve).
    """
    terms = queries.select("term").distinct()

    toks = (
        docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("tok"))
        .where(F.col("tok") != "")
    )
    # document length (in tokens) — in-row, no shuffle
    dl = docs.select(
        F.col(id_col),
        F.size(F.filter(tokens(text_col), lambda t: t != "")).alias("dl"),
    )
    # corpus totals: one 1-row aggregate, broadcast into the score expr
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("dl_sum")
    )

    # term frequencies for scored terms only: broadcast the (tiny) term
    # set so the corpus-sized explode is filtered map-side
    tf = (
        toks.join(F.broadcast(terms), toks["tok"] == terms["term"], "inner")
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )
    # document frequency per scored term (exact, from the same pass);
    # (id, term) is unique in tf so count(*) = df
    df_t = tf.groupBy("term").agg(F.count("*").alias("df"))

    scored = (
        tf.join(F.broadcast(df_t), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
    )
    if max_df_frac is not None:
        scored = scored.where(
            F.col("df") <= F.lit(max_df_frac) * F.col("n_docs")
        )

    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0 - b)
        + F.lit(b) * F.col("dl") * F.col("n_docs") / F.col("dl_sum")
    )
    contrib = idf * F.col("tf") * F.lit(k1 + 1.0) / denom
    per_term = scored.select(
        id_col,
        "term",
        F.floor(contrib * MICRO + F.lit(0.5)).cast("bigint").alias("c_micro"),
    )

    hits = (
        per_term.join(F.broadcast(queries), "term")
        .groupBy("query_id", id_col)
        .agg(F.sum("c_micro").alias("score_micro"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_micro"), F.asc(id_col)
    )
    return (
        hits.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            F.col(id_col),
            "score_micro",
            F.round(F.col("score_micro") / MICRO, 6).alias("score"),
            "rank",
        )
    )


RRF_SCALE = 1_000_000_000
RRF_K = 60  # the Cormack et al. 2009 constant


def rrf_fuse(
    rankings: list[DataFrame],
    topk: int = 5,
    k_rrf: int = RRF_K,
    query_col: str = "query_id",
    id_col: str = "doc_id",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Büttcher 2009) — THE
    standard hybrid-retrieval combiner (lexical BM25 + dense ANN in
    every production RAG stack): fused score(d) = Σ_rankings
    1/(k + rank_r(d)), which rewards documents that rank well in ANY
    source without comparing incommensurable raw scores.

    Each input frame must carry (``query_col``, ``id_col``, ``rank``).
    INTEGER-EXACT: contributions are ``⌊10⁹ / (k + rank)⌋`` — an
    integer per (source, doc), so the fused score is an exact bigint
    (cross-engine hashable; float 1/(k+r) sums would depend on
    addition order). Returns (query, doc, ``rrf_micro``,
    ``n_sources``, ``rank``) with rank ≤ topk per query, ties broken
    by ascending doc id.

    Scale: inputs are already top-k frames — O(queries·k) rows per
    source — so the union + groupBy is tiny relative to the retrieval
    passes that produced them; this operator adds no corpus-sized work.
    """
    if not rankings:
        raise ValueError("rrf_fuse: need at least one ranking")
    parts = [
        r.select(
            F.col(query_col),
            F.col(id_col),
            F.floor(
                F.lit(RRF_SCALE) / (F.lit(k_rrf) + F.col("rank"))
            )
            .cast("bigint")
            .alias("_c"),
        )
        for r in rankings
    ]
    allp = parts[0]
    for p in parts[1:]:
        allp = allp.unionByName(p)
    fused = allp.groupBy(query_col, id_col).agg(
        F.sum("_c").cast("bigint").alias("rrf_micro"),
        F.count("*").cast("int").alias("n_sources"),
    )
    w = Window.partitionBy(query_col).orderBy(
        F.desc("rrf_micro"), F.asc(id_col)
    )
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= topk)
        .select(query_col, id_col, "rrf_micro", "n_sources", "rank")
    )


def ndcg_gains(k: int, scale: int = 1_000_000_000) -> list[int]:
    """Integer DCG gain table: ``g[r] = floor(scale/log2(r+1) + 0.5)``
    for ranks 1..k, computed ONCE driver-side and injected as literals
    into both the Spark expression and the SQL oracle — neither engine
    ever evaluates ``log2``, so the metric is immune to libm last-ulp
    divergence (the same literal-injection trick as BM25's micro-unit
    scores)."""
    import math

    return [int(math.floor(scale / math.log2(r + 1) + 0.5)) for r in range(1, k + 1)]


def label_ranking_metrics(
    results: DataFrame,
    labels: DataFrame,
    k: int,
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """Retrieval-quality metrics — reciprocal rank, R-capped recall@k,
    nDCG@k — of a ranked result set against LABEL relevance (a
    neighbour is relevant iff it shares the query's label: the
    standard proxy ground truth for embedding retrieval evaluation).

    ``recall_capped_at_k`` divides hits by ``min(n_rel, k)`` — the
    capped form (sometimes called R-capped recall / "recall with
    R-truncation"), which reaches 1.0 when every retrievable slot is
    filled even if the label class is larger than k. It deliberately
    differs from textbook recall@k (``hits / n_rel``) whenever
    ``n_rel > k``; divide ``hits`` by ``n_rel`` downstream if you need
    the uncapped form.

    ``results`` is any ranked frame ``(qid, nid, rank)`` — evaluate a
    brute-force run, an IVF run, an MMR rerank, whatever; the metrics
    never look at scores, only ranks. ``labels`` maps ``id_col →
    label_col`` for queries and corpus alike.

    Integer-exact throughout: DCG/IDCG use the :func:`ndcg_gains`
    literal table (exact bigint sums), ``n_rel`` comes from one
    broadcast label-count aggregate, and the only divisions are
    single exact-operand doubles rounded to 6. Per-query output
    ``(qid, n_rel, hits, rr, recall_capped_at_k, ndcg_at_k)``;
    macro-average
    driver-side or with one more tiny aggregate.

    Scale: one broadcast join per side (labels ride the id join), one
    groupBy(qid) over ≤ k rows each — the result frame, not the
    corpus, is the unit of work.
    """
    gains = ndcg_gains(k)
    g_arr = F.array(*[F.lit(g) for g in gains])
    idcg = [0] * (k + 1)
    for i in range(1, k + 1):
        idcg[i] = idcg[i - 1] + gains[i - 1]
    idcg_arr = F.array(*[F.lit(x) for x in idcg[1:]])

    lab = labels.select(
        F.col(id_col).alias("_lid"), F.col(label_col).alias("_lab")
    )
    counts = lab.groupBy("_lab").agg(F.count(F.lit(1)).alias("_labn"))
    r = (
        results.select("qid", "nid", "rank")
        .join(
            F.broadcast(lab.select(F.col("_lid").alias("qid"),
                                   F.col("_lab").alias("_qlab"))),
            "qid",
        )
        .join(
            F.broadcast(lab.select(F.col("_lid").alias("nid"),
                                   F.col("_lab").alias("_nlab"))),
            "nid",
        )
        .withColumn("_rel", (F.col("_qlab") == F.col("_nlab")).cast("int"))
    )
    per_q = r.groupBy("qid").agg(
        F.any_value("_qlab").alias("_qlab"),
        F.sum("_rel").alias("hits"),
        F.sum(F.col("_rel") * F.element_at(g_arr, F.col("rank").cast("int")))
        .alias("_dcg"),
        F.min(F.when(F.col("_rel") == 1, F.col("rank"))).alias("_frank"),
    )
    out = (
        per_q.join(
            F.broadcast(counts), per_q["_qlab"] == counts["_lab"], "left"
        )
        # n_rel excludes the query itself (results never contain it)
        .withColumn("n_rel", F.greatest(F.coalesce(F.col("_labn"), F.lit(1)) - 1, F.lit(0)))
        .withColumn("_denom", F.least(F.col("n_rel"), F.lit(k)))
        .withColumn(
            "rr",
            F.round(
                F.coalesce(
                    F.lit(1.0) / F.col("_frank").cast("double"), F.lit(0.0)
                ),
                6,
            ),
        )
        .withColumn(
            "recall_capped_at_k",
            F.round(
                F.coalesce(
                    F.try_divide(
                        F.col("hits").cast("double"),
                        F.col("_denom").cast("double"),
                    ),
                    F.lit(0.0),
                ),
                6,
            ),
        )
        .withColumn(
            "ndcg_at_k",
            F.round(
                F.coalesce(
                    F.try_divide(
                        F.col("_dcg").cast("double"),
                        F.element_at(
                            idcg_arr,
                            F.greatest(F.col("_denom"), F.lit(1)).cast("int"),
                        ).cast("double"),
                    ),
                    F.lit(0.0),
                ),
                6,
            ),
        )
    )
    return out.select(
        "qid", "n_rel", "hits", "rr", "recall_capped_at_k", "ndcg_at_k"
    )


def bm25_mmr(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 3,
    lam: float = 0.7,
    shortlist: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 relevance × embedding diversity — the full RAG selection
    shape: retrieve a BM25 ``shortlist`` per term query, then pick
    ``k`` passages by MMR where redundancy is cosine similarity in
    hashed-embedding space (integer components, so the diversity
    signal is engine-exact like everything else).

    Relevance is per-query max-normalized BM25 (``score_micro /
    max(score_micro)`` — exact bigint operands, so both engines
    compute the identical double) lifted to micro-units; the greedy
    loop is :func:`wasaffi_spark.operators.similarity._mmr_greedy`, so
    this and the vector form share one pick/tiebreak contract.

    Scale: BM25 is the linear stage (posting-list joins); the
    embedding build is in-row; MMR itself touches Q·shortlist² rows.
    Returns ``(qid, nid, rel, mmr_nano, step)``.
    """
    from . import similarity

    sl0 = bm25_topk(docs, queries, k=shortlist, text_col=text_col, id_col=id_col)
    emb = similarity.hashed_embedding(docs, text_col=text_col, id_col=id_col)
    mx = sl0.groupBy("query_id").agg(F.max("score_micro").alias("_mx"))
    ratio = F.col("score_micro").cast("double") / F.col("_mx").cast("double")
    sl = (
        sl0.join(mx, "query_id")
        .select(
            F.col("query_id").alias("qid"),
            F.col(id_col).alias("nid"),
            F.round(ratio, 6).alias("rel"),
            F.floor(ratio * 1_000_000 + F.lit(0.5)).cast("long").alias("rel_micro"),
        )
        .localCheckpoint(eager=True)
    )
    e = emb.select(F.col(id_col).alias("_eid"), F.col("embedding").alias("_ev"))
    a = sl.join(e, sl["nid"] == e["_eid"]).select(
        "qid", F.col("nid").alias("_a"), F.col("_ev").alias("_av")
    )
    b = sl.join(e, sl["nid"] == e["_eid"]).select(
        "qid", F.col("nid").alias("_b"), F.col("_ev").alias("_bv")
    )
    pp = (
        a.join(b, "qid")
        .where(F.col("_a") != F.col("_b"))
        .select(
            "qid",
            "_a",
            "_b",
            F.floor(
                F.round(similarity.cosine(F.col("_av"), F.col("_bv")), 6)
                * 1_000_000
                + F.lit(0.5)
            )
            .cast("long")
            .alias("sim_micro"),
        )
        .localCheckpoint(eager=True)
    )
    lam_micro = int(round(lam * 1_000_000))
    return similarity._mmr_greedy(
        sl, pp, k, lam_micro, 1_000_000 - lam_micro, "rel"
    )
