"""In-engine unigram-LM (SentencePiece-style) tokenizer training:
EM over the word-frequency table (Kudo 2018, "Subword Regularization:
Improving Neural Network Translation Models with Multiple Subword
Candidates"), as plain DataFrame ops.

Beyond-reference extension (SURVEY §7.6), completing the tokenizer
family next to BPE (operators/bpe.py): where BPE greedily MERGES the
most frequent pair, the unigram LM starts from a large seed vocabulary
and alternates (E) Viterbi-segmenting every word under current piece
probabilities with (M) re-estimating those probabilities from the
chosen segmentations — the expectation-maximization shape, here in its
hard-EM (Viterbi) form.

Deterministic, integer-exact, and therefore fully hash-oracle-able —
the same engineering contract as the Lloyd / NN-descent / power-
iteration / logistic-GD trainers:

- Probabilities live on an INTEGER grid: ``p_q(piece) =
  max(floor(cnt·Q/total + ½), 1)`` computed as the pure-bigint
  ``(2·cnt·Q + total) div (2·total)`` — no float division, exact in
  any engine.
- Viterbi maximizes the LOG-likelihood as an exact bigint sum of
  gains from a STATIC lookup table: ``G[v] = round(SCALE·log2(v/Q))``
  for v = 1..Q, computed once driver-side from public math constants
  and injected as literals into BOTH engines (the ndcg_gains trick:
  neither engine ever evaluates log2, so the objective is immune to
  libm last-ulp divergence while staying the TRUE quantized-prob
  maximum likelihood — including the per-piece −log2(Q) length
  normalizer a raw product-of-grid-ints objective would lose).
- The DP unrolls over word positions 1..MAXLEN (one stage per end
  position); at each stage the argmax tiebreaks on (score desc,
  prev-position asc) — i.e. prefer the LONGER final piece — and each
  DP row carries its segmentation string (``piece\\x1fpiece\\x1f…``)
  so no backtrace pass exists to diverge.
- Seed vocabulary = every single character (segmentability floor;
  their grid prob is clamped to ≥ 1 forever) plus the top ``SEED_V``
  substrings of length 2..PIECE_MAXLEN by per-occurrence corpus
  frequency (ties break lexicographically). The M-step PRUNES
  multi-char pieces that the E-step stopped using (cnt = 0) — the
  unigram trainer's vocabulary-shrinking half, in its deterministic
  hard form.

Scale: the corpus is touched once (the shared BPE word-frequency
groupBy); every EM iteration runs over the WORD TABLE (millions of
rows at 100 TB — trivial next to the corpus), as MAXLEN broadcast
joins against the O(SEED_V + alphabet) vocab plus one per-word top-1
window. The vocab is collected per round (bounded O(V) — the
legitimate-collect class, same as Lloyd's n_cells×dim) and re-enters
the plan as a broadcast literal frame, so plan depth stays O(1) in
iterations. Words longer than ``MAXLEN`` are excluded from training
and from the fertility statistic (the standard max-piece-length cap;
documented in the queries that consume this module).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from wasaffi_spark.operators import bpe

SEP = "\x1f"
UNI_Q = 1024
UNI_LOG_SCALE = 4096
UNI_MAXLEN = 8
UNI_PIECE_MAXLEN = 4
UNI_SEED_V = 48
UNI_ITERS = 2


def log_gains(q: int = UNI_Q, scale: int = UNI_LOG_SCALE) -> list[int]:
    """Integer log-likelihood gain table ``G[v] = round(scale·log2(v/q))``
    for grid probs v = 1..q — all ≤ 0, computed ONCE driver-side and
    injected as literals into both the Spark plan and the SQL oracle
    (same engineering as retrieval.ndcg_gains)."""
    import math

    return [
        int(math.floor(scale * math.log2(v / q) + 0.5))
        for v in range(1, q + 1)
    ]


def train_words(docs: DataFrame, text_col: str = "text",
                maxlen: int = UNI_MAXLEN) -> DataFrame:
    """``(word, freq)`` training table: the shared BPE word-frequency
    pass (lower-cased whitespace tokens) capped at ``maxlen`` chars."""
    return bpe.word_freq_table(docs, text_col).where(
        F.length("word") <= maxlen
    )


def _spans(piece_maxlen: int) -> F.Column:
    """All substrings of length 1..piece_maxlen of ``word`` (one entry
    PER OCCURRENCE), as an array — pure codegen, no join."""
    return F.expr(
        f"""flatten(transform(sequence(1, length(word)),
              i -> transform(
                     sequence(i, least(i + {piece_maxlen - 1},
                                       length(word))),
                     j -> substring(word, i, j - i + 1))))"""
    )


def _grid_probs(base: DataFrame) -> DataFrame:
    """``p_q = max((2·cnt·Q + total) div (2·total), 1)`` over a
    ``(piece, cnt)`` frame — the shared integer grid quantization —
    plus the literal-table log gain ``g = G[p_q]``. ``total`` rides in
    via one broadcast scalar aggregate."""
    g_arr = F.array(*[F.lit(g) for g in log_gains()])
    tot = base.agg(F.sum("cnt").alias("total"))
    return (
        base.crossJoin(F.broadcast(tot))
        .withColumn(
            "p_q",
            F.greatest(
                F.expr(f"div(2 * cnt * {UNI_Q} + total, 2 * total)"),
                F.lit(1),
            ).cast("long"),
        )
        .withColumn(
            "g", F.element_at(g_arr, F.col("p_q").cast("int")).cast("long")
        )
        .select("piece", "cnt", "p_q", "g")
    )


def seed_vocab(words: DataFrame, piece_maxlen: int = UNI_PIECE_MAXLEN,
               seed_v: int = UNI_SEED_V) -> DataFrame:
    """Seed ``(piece, cnt, p_q)``: all single chars + the top
    ``seed_v`` length-2..piece_maxlen substrings by per-occurrence
    frequency (cnt desc, piece asc — the deterministic tiebreak).
    The top-k is a ``TakeOrderedAndProject``, never a global sort."""
    counts = (
        words.select(F.explode(_spans(piece_maxlen)).alias("piece"), "freq")
        .groupBy("piece")
        .agg(F.sum("freq").alias("cnt"))
    )
    singles = counts.where(F.length("piece") == 1)
    multis = (
        counts.where(F.length("piece") >= 2)
        .orderBy(F.col("cnt").desc(), F.col("piece").asc())
        .limit(seed_v)
    )
    return _grid_probs(singles.unionAll(multis))


def _vocab_rows(vocab: DataFrame) -> list:
    """Bounded O(V) collect of the vocab (the legitimate-collect
    class); rows re-enter the plan as a broadcast literal frame so
    the next E-step's plan does not chain on this round's."""
    return [
        (r.piece, int(r.cnt), int(r.p_q), int(r.g))
        for r in vocab.collect()
    ]


def viterbi_segment(
    words: DataFrame,
    vocab_rows: list,
    maxlen: int = UNI_MAXLEN,
    piece_maxlen: int = UNI_PIECE_MAXLEN,
) -> DataFrame:
    """Hard-EM E-step / apply pass: per word, the max-score
    segmentation under the integer log gains, as ONE in-row
    ``aggregate()`` over end positions — the single-pass-apply design
    the BPE tokenizer uses (bpe.bpe_segment): the vocab rides in as a
    literal ``piece -> gain`` map (O(SEED_V + alphabet) entries —
    data, not plan operators) and the whole DP runs in whole-stage
    codegen with ZERO joins and ZERO shuffles. The outer fold walks
    end positions j = 1..len(word), appending dp[j]; the inner fold
    walks candidate split points i in [j-piece_maxlen, j-1] keeping
    the best (score desc, i asc — strictly-greater-replaces over
    ascending i IS the smaller-i tiebreak) with an ``ok`` flag for
    unreachable positions. Each dp entry carries its segmentation
    string, so no backtrace pass exists to diverge — the same
    recurrence the SQL oracle replays as unrolled join-CTE rounds.

    Returns ``(word, freq, seq, n_pieces)`` with ``seq`` the
    SEP-terminated piece string; words with no path (a character
    outside the vocab — impossible for the training corpus, whose
    singles ARE its characters) are dropped, matching the oracle's
    no-row-at-final-position behavior.

    The join+window formulation this replaced
    (:func:`_viterbi_segment_joins`) is kept as the cross-check seam
    (pytest pins in-row == joins): 8 stages x (broadcast join +
    per-word window) cost ~15 s of pure stage overhead per pass even
    on a 31-word table — the per-row DP is the plan that survives
    100 TB (corpus-linear, embarrassingly parallel, shuffle-free)."""
    vm_pairs = []
    for piece, _cnt, _p_q, g in vocab_rows:
        vm_pairs.append(F.lit(piece))
        vm_pairs.append(F.lit(int(g)).cast("long"))
    dp_expr = f"""
        aggregate(
          sequence(1, length(word)),
          array(named_struct('ok', true, 'score', cast(0 as bigint),
                             'seq', '')),
          (acc, j) -> acc || array(
            aggregate(
              sequence(greatest(j - {piece_maxlen}, 0), j - 1),
              named_struct('ok', false, 'score', cast(0 as bigint),
                           'seq', ''),
              (best, i) -> CASE
                WHEN element_at(acc, i + 1).ok
                     AND try_element_at(_vm,
                           substring(word, i + 1, j - i)) IS NOT NULL
                     AND (NOT best.ok
                          OR element_at(acc, i + 1).score
                             + try_element_at(_vm,
                                 substring(word, i + 1, j - i))
                             > best.score)
                THEN named_struct(
                       'ok', true,
                       'score', element_at(acc, i + 1).score
                                + try_element_at(_vm,
                                    substring(word, i + 1, j - i)),
                       'seq', element_at(acc, i + 1).seq
                              || substring(word, i + 1, j - i)
                              || chr(31))
                ELSE best END)))"""
    return (
        words.where(F.length("word") <= maxlen)
        .withColumn("_vm", F.create_map(*vm_pairs))
        .withColumn("_dp", F.expr(dp_expr))
        .withColumn("_last", F.expr("element_at(_dp, length(word) + 1)"))
        .where(F.col("_last.ok"))
        .select(
            "word",
            "freq",
            F.col("_last.seq").alias("seq"),
            F.size(
                F.filter(
                    F.split(F.col("_last.seq"), SEP),
                    lambda x: x != F.lit(""),
                )
            ).cast("long").alias("n_pieces"),
        )
    )


def _viterbi_segment_joins(
    words: DataFrame,
    vocab_rows: list,
    maxlen: int = UNI_MAXLEN,
    piece_maxlen: int = UNI_PIECE_MAXLEN,
) -> DataFrame:
    """The unrolled join+window Viterbi — the literal DataFrame
    transcription of the oracle's CTE rounds, kept as the cross-check
    twin for :func:`viterbi_segment` (pytest pins in-row == joins). Returns ``(word, freq, seq, n_pieces)`` with
    ``seq`` the ``\\x1f``-terminated piece string. Every stage is one
    broadcast vocab join + one per-word top-1 window; rows only exist
    for positions ≤ len(word), so the frame is ≤ (maxlen+1)·|words|."""
    spark = words.sparkSession
    v = F.broadcast(
        spark.createDataFrame(
            vocab_rows, "piece string, cnt bigint, p_q bigint, g bigint"
        ).select("piece", "g")
    )
    d = words.select(
        "word",
        "freq",
        F.lit(0).alias("pos"),
        F.lit(0).cast("long").alias("score"),
        F.lit("").alias("seq"),
    )
    w_best = Window.partitionBy("word").orderBy(
        F.col("score").desc(), F.col("prev").asc()
    )
    for j in range(1, maxlen + 1):
        cand = (
            d.where(
                (F.col("pos") >= j - piece_maxlen)
                & (F.col("pos") < j)
                & (F.length("word") >= j)
            )
            .join(
                v,
                F.col("piece")
                == F.expr(f"substring(word, pos + 1, {j} - pos)"),
            )
            .select(
                "word",
                "freq",
                F.col("pos").alias("prev"),
                (F.col("score") + F.col("g")).alias("score"),
                F.concat("seq", F.col("piece"), F.lit(SEP)).alias("seq"),
            )
        )
        best = (
            cand.withColumn("_r", F.row_number().over(w_best))
            .where(F.col("_r") == 1)
            .select(
                "word", "freq", F.lit(j).alias("pos"), "score", "seq"
            )
        )
        d = d.unionAll(best)
    out = d.where(F.col("pos") == F.length("word")).select(
        "word",
        "freq",
        "seq",
        F.size(
            F.filter(F.split("seq", SEP), lambda x: x != F.lit(""))
        ).cast("long").alias("n_pieces"),
    )
    # the word table is bounded (vocab-sized, not corpus-sized);
    # materialize so the next round's plan reads a table instead of
    # chaining maxlen joins per round
    return out.localCheckpoint(eager=True)


def _mstep(vocab_rows: list, segs: DataFrame) -> DataFrame:
    """M-step: re-count pieces from the chosen segmentations (weighted
    by word freq), PRUNE multi-char pieces the E-step abandoned
    (cnt = 0), keep every single char (clamped grid prob), and re-grid.
    """
    spark = segs.sparkSession
    vhold = F.broadcast(
        spark.createDataFrame(
            vocab_rows, "piece string, cnt bigint, p_q bigint, g bigint"
        ).select("piece")
    )
    counts = (
        segs.select(
            F.explode(
                F.filter(F.split("seq", SEP), lambda x: x != F.lit(""))
            ).alias("piece"),
            "freq",
        )
        .groupBy("piece")
        .agg(F.sum("freq").alias("_c"))
    )
    base = (
        vhold.join(counts, "piece", "left")
        .withColumn("cnt", F.coalesce(F.col("_c"), F.lit(0)).cast("long"))
        .where((F.length("piece") == 1) | (F.col("cnt") > 0))
        .select("piece", "cnt")
    )
    return _grid_probs(base)


def unigram_train(
    docs: DataFrame,
    text_col: str = "text",
    iters: int = UNI_ITERS,
    maxlen: int = UNI_MAXLEN,
    piece_maxlen: int = UNI_PIECE_MAXLEN,
    seed_v: int = UNI_SEED_V,
) -> DataFrame:
    """Full trainer: seed → ``iters`` × (Viterbi E-step, re-grid
    M-step). Returns the final ``(piece, cnt, p_q)`` vocabulary."""
    words = train_words(docs, text_col, maxlen).localCheckpoint(eager=True)
    rows = _vocab_rows(seed_vocab(words, piece_maxlen, seed_v))
    for _ in range(iters):
        segs = viterbi_segment(words, rows, maxlen, piece_maxlen)
        rows = _vocab_rows(_mstep(rows, segs))
    spark = docs.sparkSession
    return spark.createDataFrame(
        rows, "piece string, cnt bigint, p_q bigint, g bigint"
    ).select("piece", "cnt", "p_q")


def unigram_fertility(
    docs: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    maxlen: int = UNI_MAXLEN,
    piece_maxlen: int = UNI_PIECE_MAXLEN,
) -> DataFrame:
    """Apply the trained model back to the corpus: per-document word
    count, piece count, and fertility (pieces per word) over the
    ≤ ``maxlen``-char word slice (the trained coverage — the same cap
    training used). The per-word Viterbi runs ONCE on the distinct
    word table; documents join the tiny word→n_pieces map."""
    toks = F.filter(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
        lambda x: x != F.lit(""),
    )
    dwf = (
        docs.select(F.col(id_col), F.explode(toks).alias("word"))
        .where(
            (~F.col("word").contains(SEP))
            & (F.length("word") <= maxlen)
        )
        .groupBy(id_col, "word")
        .agg(F.count("*").alias("dfreq"))
    )
    g_arr = F.array(*[F.lit(g) for g in log_gains()])
    vg = vocab.withColumn(
        "g", F.element_at(g_arr, F.col("p_q").cast("int")).cast("long")
    )
    words = dwf.groupBy("word").agg(F.sum("dfreq").alias("freq"))
    segs = viterbi_segment(
        words, _vocab_rows(vg), maxlen, piece_maxlen
    ).select("word", "n_pieces")
    return (
        dwf.join(segs, "word")
        .groupBy(id_col)
        .agg(
            F.sum("dfreq").alias("n_words"),
            F.sum(F.col("dfreq") * F.col("n_pieces")).alias("n_pieces"),
        )
        .withColumn(
            "fertility",
            F.round(
                F.col("n_pieces").cast("double")
                / F.col("n_words").cast("double"),
                6,
            ),
        )
    )
