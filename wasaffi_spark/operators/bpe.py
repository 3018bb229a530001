"""In-engine BPE tokenizer training: learn byte-pair-encoding merges
over the corpus as plain DataFrame ops (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units").

Beyond-reference extension (SURVEY §7.6): tokenizer induction is the
remaining "export the corpus to another tool" step of an LLM data
pipeline; its training loop is corpus-scale counting — exactly the
engine's home turf. BPE trains on the WORD-FREQUENCY table, so after
one corpus pass every iteration runs over O(vocab) rows: count adjacent
symbol pairs (weighted by word frequency), take the argmax, merge that
pair everywhere, repeat.

Symbol sequences are strings with a `\\x1f` delimiter BETWEEN, BEFORE
and AFTER symbols (``\\x1fh\\x1fe\\x1fy\\x1f``), so a merge is a plain
``replace`` of ``\\x1fa\\x1fb\\x1f`` with ``\\x1fab\\x1f``. One
``replace`` pass skips every second occurrence of back-to-back pair
chains (the scanner resumes AFTER the consumed trailing delimiter), so
each merge applies the replace TWICE — two sweeps provably reach the
canonical all-non-overlapping-occurrences merge (sweep 1 merges
alternating occurrences; the survivors are then isolated and sweep 2
catches them all). The same two-sweep rule runs in the DuckDB oracle,
which unrolls the full training loop as chained CTEs — the LEARNED
MERGE TABLE is hash-checked across engines.

Everything is deterministic: ties in the pair argmax break
lexicographically; no floats exist anywhere in the loop.

Scale: the corpus is touched once (word count groupBy). Each iteration
over the vocab table is a pair explode + groupBy + a 1-row argmax
cross-joined back (broadcast); the vocab frame localCheckpoints per
round (pagerank recipe) so plans stay bounded. At 100 TB the vocab
table is millions of rows — trivial next to the corpus — and the whole
loop never rescans documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SEP = "\x1f"
K_MERGES = 8


def word_freq_table(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, freq) over the lower-cased whitespace-tokenized corpus —
    the single corpus-sized pass of BPE training."""
    toks = F.filter(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
        lambda x: x != F.lit(""),
    )
    return (
        df.select(F.explode(toks).alias("word"))
        .where(~F.col("word").contains(SEP))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _char_seq(word_col: str = "word") -> F.Column:
    """``\\x1fc\\x1fh\\x1fa\\x1fr\\x1f`` — delimited char symbols."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length(F.col(word_col))),
        lambda i: F.substring(F.col(word_col), i, 1),
    )
    return F.concat(F.lit(SEP), F.array_join(chars, SEP), F.lit(SEP))


def _pairs(seq_col: str = "seq") -> F.Column:
    """Adjacent symbol pairs of a delimited sequence, as an array of
    ``a<SEP>b`` strings (empty array for single-symbol sequences)."""
    syms = F.filter(
        F.split(F.col(seq_col), SEP), lambda x: x != F.lit("")
    )
    n = F.size(syms)
    return F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(SEP, F.slice(syms, i, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def bpe_train(
    df: DataFrame,
    k_merges: int = K_MERGES,
    text_col: str = "text",
) -> DataFrame:
    """Learn the top-``k_merges`` BPE merges. Returns the ordered merge
    table ``(rank, left_sym, right_sym, merged, pair_count)`` — the
    artifact a tokenizer ships. Ties break on the pair string.
    """
    vocab = word_freq_table(df, text_col).select(
        _char_seq("word").alias("seq"), "freq"
    )
    vocab = vocab.localCheckpoint(eager=False)
    merges = []
    for rank in range(k_merges):
        pair_counts = (
            vocab.select(F.explode(_pairs("seq")).alias("pair"), "freq")
            .groupBy("pair")
            .agg(F.sum("freq").alias("pair_count"))
        )
        best = (
            pair_counts.orderBy(
                F.col("pair_count").desc(), F.col("pair").asc()
            )
            .limit(1)
            .select(
                F.lit(rank + 1).cast("int").alias("rank"),
                F.split(F.col("pair"), SEP)[0].alias("left_sym"),
                F.split(F.col("pair"), SEP)[1].alias("right_sym"),
                F.concat(
                    F.split(F.col("pair"), SEP)[0],
                    F.split(F.col("pair"), SEP)[1],
                ).alias("merged"),
                "pair_count",
            )
            .localCheckpoint(eager=False)
        )
        merges.append(best)
        pat = F.concat(
            F.lit(SEP),
            F.col("left_sym"),
            F.lit(SEP),
            F.col("right_sym"),
            F.lit(SEP),
        )
        rep = F.concat(F.lit(SEP), F.col("merged"), F.lit(SEP))
        # two replace sweeps = canonical merge of ALL non-overlapping
        # occurrences (see module docstring)
        vocab = (
            vocab.crossJoin(F.broadcast(best))
            .select(
                F.replace(F.replace(F.col("seq"), pat, rep), pat, rep).alias(
                    "seq"
                ),
                "freq",
            )
            .localCheckpoint(eager=False)
        )
    out = merges[0]
    for m in merges[1:]:
        out = out.unionByName(m)
    return out


def bpe_apply_words(
    words: DataFrame,
    merges: DataFrame,
    word_col: str = "word",
) -> DataFrame:
    """Apply a learned merge table to a DISTINCT word table — the
    per-word half of :func:`bpe_segment`'s single-pass apply (same
    broadcast ``(rank, pat, rep)`` fold, same two-sweep replace rule),
    exposed so tokenizer-comparison queries can score BPE and unigram
    on the identical word slice and check the detokenize round-trip.
    Returns ``(word_col, seq, n_sub)`` with ``seq`` the SEP-delimited
    symbol string (``replace(seq, SEP, '') = word`` — the round-trip
    invariant BPE merges preserve by construction).

    Scale: one row per distinct word (sub-linear in corpus size), the
    merge table rides in as data — corpus-independent apply cost."""
    seqs = words.select(word_col, _char_seq(word_col).alias("seq"))
    mtab = merges.select(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("rank").cast("int").alias("rank"),
                    F.concat(
                        F.lit(SEP),
                        F.col("left_sym"),
                        F.lit(SEP),
                        F.col("right_sym"),
                        F.lit(SEP),
                    ).alias("pat"),
                    F.concat(F.lit(SEP), F.col("merged"), F.lit(SEP)).alias(
                        "rep"
                    ),
                )
            )
        ).alias("_merges")
    )
    seqs = seqs.crossJoin(F.broadcast(mtab)).select(
        word_col,
        F.aggregate(
            F.col("_merges"),
            F.col("seq"),
            lambda acc, m: F.replace(
                F.replace(acc, m["pat"], m["rep"]), m["pat"], m["rep"]
            ),
        ).alias("seq"),
    )
    syms = F.filter(F.split(F.col("seq"), SEP), lambda x: x != F.lit(""))
    return seqs.select(
        word_col, "seq", F.size(syms).cast("long").alias("n_sub")
    )


def bpe_segment(
    df: DataFrame,
    merges: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a learned merge table to a corpus: per document, the BPE
    token count and mean token length — the fertility statistics that
    grade a tokenizer against a corpus.

    Single-pass apply (r7, VERDICT r6 #5): the merge table folds into
    ONE ``aggregate()`` expression over a broadcast array of
    ``(rank, pat, rep)`` structs — rank order comes from
    ``array_sort`` on the struct (rank is its first field), and each
    fold step is the same two-sweep replace rule as training. The
    vocabulary therefore lives in DATA, not in the plan: a production
    30k-merge tokenizer is a 30k-element array inside one operator,
    not a 30k-operator plan (the previous per-rank Python loop built
    one crossJoin + two replaces PER MERGE — driver-side plan
    explosion at real vocab sizes). No driver collect anywhere."""
    toks = F.filter(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
        lambda x: x != F.lit(""),
    )
    words = df.select(F.col(id_col), F.explode(toks).alias("word")).where(
        ~F.col("word").contains(SEP)
    )
    seqs = words.select(id_col, _char_seq("word").alias("seq"))
    mtab = merges.select(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("rank").cast("int").alias("rank"),
                    F.concat(
                        F.lit(SEP),
                        F.col("left_sym"),
                        F.lit(SEP),
                        F.col("right_sym"),
                        F.lit(SEP),
                    ).alias("pat"),
                    F.concat(F.lit(SEP), F.col("merged"), F.lit(SEP)).alias(
                        "rep"
                    ),
                )
            )
        ).alias("_merges")
    )
    seqs = seqs.crossJoin(F.broadcast(mtab)).select(
        id_col,
        F.aggregate(
            F.col("_merges"),
            F.col("seq"),
            lambda acc, m: F.replace(
                F.replace(acc, m["pat"], m["rep"]), m["pat"], m["rep"]
            ),
        ).alias("seq"),
    )
    syms = F.filter(F.split(F.col("seq"), SEP), lambda x: x != F.lit(""))
    per_word = seqs.select(
        F.col(id_col),
        F.size(syms).alias("n_sub"),
        F.length(F.col("seq")).alias("_len"),
    )
    return (
        per_word.groupBy(id_col)
        .agg(
            F.sum("n_sub").cast("bigint").alias("n_bpe_tokens"),
            F.count("*").cast("bigint").alias("n_words"),
        )
        .withColumn(
            "fertility",
            F.round(F.col("n_bpe_tokens") / F.col("n_words"), 6),
        )
    )
