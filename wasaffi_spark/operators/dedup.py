"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Beyond-reference extensions (SURVEY §7.6) built for 100 TB corpora:

- **exact**: one shuffle on ``md5(text)`` with map-side partial ``min`` —
  the canonical hash-groupBy dedup.
- **MinHash + LSH**: k-word shingles → P permutation min-hashes → B bands
  of R rows → candidate pairs join *within band buckets only*. Every hash
  is ``md5(seed || shingle)`` (min taken lexicographically), which makes
  the whole pipeline deterministic AND expressible in ANSI SQL, so the
  DuckDB oracle checks it bit-for-bit. At scale the only large shuffles
  are the explode/groupBy for signatures and the band-bucket self-join —
  bucket sizes are bounded by construction (near-identical docs), never
  O(corpus).
- **SimHash**: 48-bit signature from per-token md5 hex digits; one
  explode + one groupBy(sum) shuffle; bit reassembly is pure arithmetic.
- **n-gram Jaccard**: exact pairwise token-set Jaccard *within blocking
  groups* (language × length bucket) — the exact-verify companion to the
  LSH candidate generator; the block key bounds the quadratic term.

All column expressions are JVM built-ins — no Python UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens

# MinHash parameters (shared with the DuckDB oracle generator in catalog.py)
SHINGLE_K = 3
NUM_PERM = 12
BANDS = 4
ROWS_PER_BAND = NUM_PERM // BANDS


def _fan_out(df: DataFrame) -> DataFrame:
    """Round-robin repartition ahead of an explode-heavy stage.

    A narrow input (one parquet row group, a filtered scan) otherwise
    leaves the whole shingle/token fan-out — the expensive md5 work — on
    a handful of tasks. The pre-shuffle moves rows proportional to the
    *input* (cheap) to parallelize work proportional to the *fan-out*
    (expensive); at cluster scale this is the difference between one hot
    executor and an even spread.
    """
    sc = df.sparkSession.sparkContext
    return df.repartition(sc.defaultParallelism)


# -- exact dedup ------------------------------------------------------------


def exact_dedup_keys(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One surviving id per distinct text: ``min(id) group by md5(text)``."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_copies"))
    )


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """The deduplicated frame itself (keeps the min-id row per text)."""
    keys = exact_dedup_keys(df, text_col, id_col).select(
        F.col("keep_id").alias(id_col)
    )
    return df.join(keys, on=id_col, how="left_semi")


def incremental_dedup(
    new_docs: DataFrame,
    seen: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seen_is_hashes: bool = False,
) -> DataFrame:
    """Cross-snapshot dedup: the rows of ``new_docs`` whose text appears
    neither in the already-ingested ``seen`` corpus nor earlier in the
    new batch itself — the shape every recurring crawl ingest needs
    (dedupe crawl N against crawls 1..N-1 without re-reading them).

    ``seen`` is either a document frame or (``seen_is_hashes=True``) a
    frame with a ``text_hash`` column — at scale the ingested-corpus
    state should be KEPT as the 16-byte-hash table (the natural output
    of ``exact_dedup_keys``), so each new snapshot joins against
    O(distinct docs)·16 bytes of state, never against corpus text.
    Shuffles: one anti-join on the hash + exact_dedup's groupBy — both
    carry (hash, id)-sized rows, not documents.
    """
    if seen_is_hashes:
        seen_hashes = seen.select("text_hash").distinct()
    else:
        seen_hashes = seen.select(
            F.md5(F.col(text_col)).alias("text_hash")
        ).distinct()
    hashed = new_docs.withColumn("text_hash", F.md5(F.col(text_col)))
    fresh = hashed.join(seen_hashes, "text_hash", "left_anti").drop("text_hash")
    return exact_dedup(fresh, text_col, id_col)


# -- shingling / MinHash ----------------------------------------------------


def word_shingles(df: DataFrame, text_col: str = "text", k: int = SHINGLE_K) -> DataFrame:
    """Explode each doc into its k-word shingles (column ``shingle``).

    Whitespace-tokenized, lower-cased; docs shorter than k words yield no
    shingles (and therefore never pair — same as the oracle).
    """
    toks = tokens(text_col)
    n = F.size(toks)
    # positions 0 .. n-k ; sequence() is empty-safe via the filter below
    df = _fan_out(df).withColumn("_toks", toks).where(n >= k)
    pos = F.sequence(F.lit(0), F.size(F.col("_toks")) - k)
    sh = F.transform(
        pos,
        lambda i: F.concat_ws(
            " ", F.slice(F.col("_toks"), i + 1, k)  # slice() is 1-based
        ),
    )
    return df.withColumn("shingle", F.explode(sh)).drop("_toks")


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = NUM_PERM,
    k: int = SHINGLE_K,
) -> DataFrame:
    """P-permutation MinHash signature per doc: ``h_i = min(md5(i|shingle))``.

    Lexicographic min over md5 hex strings ≡ min over a uniform 128-bit
    hash family — and md5 is identical in Spark, DuckDB, and every other
    engine, which is what makes the signature portable.

    Shape (round-4 final): explode → groupBy(id) with P ``min`` partial
    aggregates and NO distinct. min over occurrences equals min over the
    distinct set, so the r1–r3 ``.distinct()`` — which shuffled the full
    exploded shingle corpus — was pure waste: without it the hash
    aggregation map-side-combines, so the only shuffled rows are the
    per-partition partial minima, O(docs)·P·32 B, while every md5 stays
    inside whole-stage codegen. (A fully in-row ``transform``+
    ``array_min`` variant was measured 3.5× slower at sf0.1: higher-
    order functions evaluate interpreted, and MinHash is md5-bound —
    see :func:`minhash_signatures_inrow`, kept because it is the
    STREAMING-legal variant.)
    """
    sh = word_shingles(df, text_col, k).select(id_col, "shingle")
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("shingle")))).alias(f"h{i}")
        for i in range(num_perm)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def minhash_signatures_inrow(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = NUM_PERM,
    k: int = SHINGLE_K,
) -> DataFrame:
    """Bit-identical twin of :func:`minhash_signatures` computed
    entirely in-row (``transform`` + ``array_min``): zero shuffle and
    zero aggregation, which makes it legal on an unaggregated STREAMING
    frame (streaming/documents.py::fuzzy_contaminated_ids_stream) where
    the groupBy shape would demand a watermarked stateful aggregation.
    Batch callers should prefer the groupBy variant: these higher-order
    functions evaluate interpreted, measured ~3.5× slower at sf0.1.
    """
    toks = tokens(text_col)
    base = df.select(F.col(id_col), toks.alias("_toks")).where(
        F.size("_toks") >= k
    )
    sh_arr = F.transform(
        F.sequence(F.lit(0), F.size("_toks") - k),
        lambda i: F.concat_ws(" ", F.slice("_toks", i + 1, k)),
    )
    base = base.select(F.col(id_col), sh_arr.alias("_sh"))
    cols = [
        F.array_min(
            F.transform(
                F.col("_sh"),
                lambda s: F.md5(F.concat(F.lit(f"{i}|"), s)),
            )
        ).alias(f"h{i}")
        for i in range(num_perm)
    ]
    return base.select(F.col(id_col), *cols)


def _cap_buckets(
    buckets: DataFrame, max_bucket_size: int | None, cols: tuple[str, ...] = ("band", "key")
) -> DataFrame:
    """Hot-bucket safety valve shared by every banded/blocked pair
    generator: drop buckets larger than ``max_bucket_size`` BEFORE the
    self-join, bounding each bucket's pair fan-out at cap². A window
    count over the bucket key — one extra pass over the bucket rows, no
    extra shuffle beyond the one the self-join needs anyway (same key).
    ``None`` disables the cap (exact semantics; what the oracles check).

    At 100 TB this is what stops degenerate clusters — templated
    boilerplate in LSH bands, all-zero SimHash signatures from
    empty/near-empty docs, a mega-cell in sign-LSH — from turning a
    banded equi-join into a quadratic hot partition.
    """
    if max_bucket_size is None:
        return buckets
    from pyspark.sql.window import Window

    w = Window.partitionBy(*[F.col(c) for c in cols])
    return (
        buckets.withColumn("_bsz", F.count("*").over(w))
        .where(F.col("_bsz") <= max_bucket_size)
        .drop("_bsz")
    )


def band_buckets(
    signatures: DataFrame,
    id_col: str = "doc_id",
    num_perm: int = NUM_PERM,
    bands: int = BANDS,
) -> DataFrame:
    """(id_col, band, key) — each signature exploded into its ``bands``
    banded LSH bucket keys (md5 of the band's hash rows). Shared by the
    self-join pair generator below and the cross-frame fuzzy
    decontamination join (:func:`..decontam.fuzzy_contamination`)."""
    r = num_perm // bands
    band_cols = []
    for b in range(bands):
        cols = [F.col(f"h{i}") for i in range(b * r, (b + 1) * r)]
        band_cols.append(
            F.struct(F.lit(b).alias("band"), F.md5(F.concat_ws("|", *cols)).alias("key"))
        )
    return signatures.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("bk")
    ).select(id_col, F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    num_perm: int = NUM_PERM,
    bands: int = BANDS,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Banded LSH over a signature frame → candidate pairs (id_a < id_b).

    Docs agreeing on ALL rows of at least one band become candidates.
    The self-join is on (band_idx, band_key): bucket sizes stay small by
    construction, so the join never degenerates into a cross product.

    ``max_bucket_size`` is the 100 TB safety valve (SCALE.md): buckets
    larger than the cap — boilerplate/templated documents hashing
    together by the thousand — are dropped before the self-join, trading
    recall on degenerate clusters for a bound of cap² pairs per bucket.
    ``None`` (default) disables the cap (exact LSH semantics; what the
    oracle checks).
    """
    buckets = band_buckets(signatures, id_col, num_perm, bands)
    buckets = _cap_buckets(buckets, max_bucket_size)
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def minhash_jaccard_estimate(
    signatures: DataFrame, pairs: DataFrame, num_perm: int = NUM_PERM
) -> DataFrame:
    """Estimated Jaccard = fraction of agreeing minhashes, per pair."""
    sa = signatures.alias("sa")
    sb = signatures.alias("sb")
    agree: Column = sum(
        F.when(F.col(f"sa.h{i}") == F.col(f"sb.h{i}"), 1).otherwise(0)
        for i in range(num_perm)
    )
    return (
        pairs.join(sa, pairs.id_a == F.col("sa.doc_id"))
        .join(sb, pairs.id_b == F.col("sb.doc_id"))
        .select(
            "id_a",
            "id_b",
            F.round(agree / F.lit(float(num_perm)), 6).alias("est_jaccard"),
        )
    )


# -- SimHash ----------------------------------------------------------------

SIMHASH_HEX_DIGITS = 12  # 48 bits — comfortably inside a signed BIGINT


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    hex_digits: int = SIMHASH_HEX_DIGITS,
) -> DataFrame:
    """48-bit SimHash per document over distinct tokens.

    Per token, md5 hex chars supply 4 bits each; each bit votes ±1; the
    signature sets bit ``j`` where the vote sum is positive.

    ZERO shuffles: a document's vote sums need only its own tokens, so
    the whole signature is computed in-row with higher-order functions —
    ``array_distinct`` for the token set, one ``aggregate`` pass summing
    per-token lane-packed bit votes — instead of the explode → distinct
    → groupBy pipeline (two corpus-sized shuffles of exploded tokens).
    At 100 TB the exploded form shuffles ~30× the corpus bytes; this
    form shuffles nothing and scales with input partitioning alone
    (``_fan_out`` only spreads a narrow input across cores).

    Lane packing: the 4 bits of one hex digit accumulate in 4
    independent 16-bit lanes of ONE bigint (bit b of digit d adds
    1<<(16*b)), so the accumulator is ``hex_digits`` bigints instead of
    4×``hex_digits`` ints. Lane capacity 16 bits ⇒ valid to 32767
    distinct tokens per document (highest lane stays below 2^63).
    """
    toks_arr = F.array_remove(F.array_distinct(tokens(text_col)), "")
    ths = F.transform(toks_arr, lambda t: F.md5(t))

    # The 16 possible packed lane values, one per hex-digit value —
    # a FOLDABLE literal array (ConstantFolding collapses it to one
    # Literal), so each digit costs one substr+instr and one
    # element_at instead of four re-evaluations of the digit subtree
    # (HOF lambdas are interpreted: no subexpression elimination).
    lane_lut = F.array(
        *[
            F.lit(
                sum(((v >> b) & 1) << (16 * b) for b in range(4))
            ).cast("bigint")
            for v in range(16)
        ]
    )

    def token_lanes(th: Column) -> Column:
        """array<bigint>[hex_digits]: this token's packed ±0/1 bit votes
        (ones only; the ±1 vote is reconstructed from the ones count)."""
        def one_digit(d: Column) -> Column:
            pos = F.instr(F.lit("0123456789abcdef"), th.substr(d + 1, F.lit(1)))
            return F.element_at(lane_lut, pos)

        return F.transform(
            F.sequence(F.lit(0), F.lit(hex_digits - 1)), one_digit
        )

    zeros = F.array_repeat(F.lit(0).cast("bigint"), hex_digits)
    packed = F.aggregate(
        ths, zeros, lambda acc, th: F.zip_with(acc, token_lanes(th), lambda a, b: a + b)
    )
    n = F.size(toks_arr)
    base = _fan_out(df).select(
        F.col(id_col), n.alias("_n"), packed.alias("_p")
    )
    # bit j set ⟺ ones_j > n/2 ⟺ vote sum (2·ones−n) > 0
    sig: Column = F.lit(0).cast("bigint")
    for d in range(hex_digits):
        for b in range(4):
            ones = F.shiftrightunsigned(
                F.element_at(F.col("_p"), d + 1), 16 * b
            ) % F.lit(1 << 16)
            sig = sig + F.when(
                ones * 2 > F.col("_n"), F.lit(2 ** (d * 4 + b)).cast("bigint")
            ).otherwise(F.lit(0).cast("bigint"))
    return base.where(F.col("_n") > 0).select(F.col(id_col), sig.alias("simhash"))


# -- exact n-gram (token-set) Jaccard with blocking -------------------------


def _blocked_shingle_inter(
    df: DataFrame,
    text_col: str,
    id_col: str,
    block_cols: tuple[str, ...],
    k: int,
    max_shingle_df: int | None,
) -> tuple[DataFrame, DataFrame]:
    """Shared candidate stage of :func:`jaccard_pairs` /
    :func:`containment_pairs`: the blocked shingle-level self-join.
    Returns ``(inter, sizes)`` — per-pair |A∩B| and per-doc |A|.

    ``max_shingle_df`` is the hot-shingle valve (r7, the
    ``media_neardup``-style deterministic cap): shingles whose
    within-block DOC FREQUENCY exceeds the cap are dropped before the
    join AND before the size counts, so both metrics are computed over
    the trimmed shingle universe — the standard stop-shingle rule. A
    shingle shared by df documents alone fans out df²/2 join rows, so
    without the cap one piece of templated boilerplate (a license
    header, a nav bar) makes the join quadratic in its document count;
    with it, per-shingle fan-out is bounded by cap² and such
    boilerplate stops counting as similarity signal at all — which is
    the curation-correct reading. Deterministic (a pure doc-frequency
    filter), so oracles replay it verbatim. ``None`` = exact
    full-universe semantics."""
    sh = word_shingles(df, text_col, k)
    toks = sh.select(
        F.col(id_col), *[F.col(c) for c in block_cols],
        F.col("shingle").alias("tok"),
    ).distinct()
    toks = _cap_buckets(toks, max_shingle_df, cols=(*block_cols, "tok"))
    sizes = toks.groupBy(id_col).agg(F.count("*").alias("sz"))
    a = toks.alias("a")
    b = toks.alias("b")
    block_cond = F.lit(True)
    for c in block_cols:
        block_cond = block_cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    inter = (
        a.join(
            b,
            block_cond
            & (F.col("a.tok") == F.col("b.tok"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count("*").alias("inter"))
    )
    return inter, sizes


def jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_cols: tuple[str, ...] = ("lang",),
    threshold: float = 0.8,
    k: int = SHINGLE_K,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact n-gram (k-word shingle) Jaccard for doc pairs sharing a
    blocking key.

    |A∩B| via a shingle-level self-join inside the block, |A∪B| =
    |A|+|B|−|A∩B|; integer arithmetic until the final division, so the
    value is exact. Shingles — not single tokens — keep the join sparse:
    only genuinely similar documents share k-grams, so the join output is
    ∝ near-dup pairs, while a token join degenerates to block² whenever
    the vocabulary is small relative to the block. The block key is the
    second bound — at 100 TB block on (lang, length-bucket, LSH band) —
    and ``max_shingle_df`` the third (the hot-shingle valve: see
    :func:`_blocked_shingle_inter` — boilerplate shingles shared by
    more than cap docs of a block are excluded from BOTH |A∩B| and the
    set sizes, bounding per-shingle join fan-out at cap²).
    """
    inter, sizes = _blocked_shingle_inter(
        df, text_col, id_col, block_cols, k, max_shingle_df
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    return (
        inter.join(sa, inter.id_a == F.col(f"sa.{id_col}"))
        .join(sb, inter.id_b == F.col(f"sb.{id_col}"))
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("sa.sz") + F.col("sb.sz") - F.col("inter")),
                6,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# -- cross-document paragraph dedup ----------------------------------------


def paragraph_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "dedup_text",
    sep: str = "\n",
) -> DataFrame:
    """Corpus-wide paragraph-level dedup (RefinedWeb / Dolma style).

    Splits every document into paragraphs, keeps only the globally FIRST
    occurrence of each distinct paragraph (ordered by ``(doc_id, pos)``
    — deterministic), and reassembles each document from its surviving
    paragraphs in original order. The cross-document sibling of
    :func:`wasaffi_spark.operators.text.dedup_lines` (which is
    intra-document only). Output: ``(id_col, out_col, n_paras,
    n_kept_paras)`` — join back on ``id_col`` for other columns.

    Whitespace-only paragraphs are structure, not content: each gets a
    unique key so it is always kept (this also avoids a skewed
    all-blanks hash partition).

    Scale: exactly two shuffles — one on the paragraph hash (window
    ``row_number`` picks the keeper; partial-agg-free but each paragraph
    row moves once), one on ``doc_id`` to reassemble. Paragraph rows ∝
    corpus lines; no quadratic term anywhere. Known skew: a boilerplate
    paragraph repeated 10⁹ times lands in one hash partition — at 100 TB
    pre-drop ultra-hot hashes (count > K ⇒ delete ALL copies, the
    RefinedWeb boilerplate rule) before the window, trading exactness of
    "keep first" for bounded partitions.
    """
    from pyspark.sql.window import Window

    # \Q...\E: sep is a LITERAL separator (the DuckDB oracle's
    # string_split is literal too) — without quoting, sep='.' or '|'
    # would be a regex that shreds every document. NULL text behaves as
    # an empty document (one blank paragraph, kept) instead of silently
    # vanishing from the output.
    paras = df.select(
        F.col(id_col),
        F.posexplode(
            F.split(
                F.coalesce(F.col(text_col), F.lit("")),
                F.lit("\\Q" + sep + "\\E"),
            )
        ).alias("pos", "para"),
    )
    h = F.when(
        F.trim(F.col("para")) != "",
        F.md5(F.col("para")),
    ).otherwise(F.concat_ws(":", F.lit("_blank"), F.col(id_col), F.col("pos")))
    paras = paras.withColumn("_h", h)
    w = Window.partitionBy("_h").orderBy(id_col, "pos")
    paras = paras.withColumn("_kept", F.row_number().over(w) == 1)
    agg = paras.groupBy(id_col).agg(
        F.array_sort(F.collect_list(F.struct("pos", "para", "_kept"))).alias("_ps"),
        F.count("*").alias("n_paras"),
        F.sum(F.col("_kept").cast("int")).alias("n_kept_paras"),
    )
    kept_text = F.array_join(
        F.transform(
            F.filter(F.col("_ps"), lambda s: s["_kept"]), lambda s: s["para"]
        ),
        sep,
    )
    return agg.select(
        F.col(id_col),
        kept_text.alias(out_col),
        F.col("n_paras").cast("int").alias("n_paras"),
        F.col("n_kept_paras").cast("int").alias("n_kept_paras"),
    )


def ngram_span_dedup(
    df: DataFrame,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "dedup_text",
    pos_scale: int = 1_000_000,
) -> DataFrame:
    """Exact-substring (repeated n-gram span) deduplication — the
    Lee et al. 2022 "Deduplicating Training Data Makes Language Models
    Better" shape, at fixed gram width ``k`` instead of suffix-array
    variable length: any ``k``-token window that occurs more than once
    ACROSS the corpus is removed everywhere except at its globally
    first occurrence (ordered by ``(doc_id, position)``), and every
    document is reassembled from its surviving tokens in order.

    Returns ``(id_col, out_col, n_tokens, n_removed)``.

    Mechanics: token positions via in-row gram construction (no
    per-gram shuffle until the groupBy); the global first occurrence
    per gram is the packed-min ``min(doc_id·POS_SCALE + pos)`` — one
    bigint aggregate, engine-exact; a duplicated gram's every OTHER
    occurrence marks its covered token span ``[pos, pos+k-1]``;
    coverage unions in-doc (distinct positions) and surviving tokens
    reassemble sorted by position.

    Scale: shuffles are (1) groupBy gram — rows ∝ total tokens, the
    same volume as the MinHash signature stage, (2) the coverage join
    back on (doc, gram occurrence) — rows ∝ duplicated occurrences
    only, (3) reassembly on doc_id. The hot-gram skew note from
    :func:`paragraph_dedup` applies identically (pre-drop count > K
    grams at 100 TB).

    Packing invariant (GUARDED, not assumed): the packed-min key
    ``id·pos_scale + pos`` orders (id, pos) pairs correctly only while
    every doc has < ``pos_scale`` tokens and ``0 <= id <
    2^63/pos_scale``. A violation used to silently corrupt which
    occurrence counts as "first"; now the id dtype is checked up front
    (integral only — a string id would overflow-free but mis-order) and
    a distributed ``raise_error`` fires on the offending row. Raise
    ``pos_scale`` for long-document corpora.
    """
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    id_type = df.schema[id_col].dataType
    if not isinstance(id_type, (ByteType, ShortType, IntegerType, LongType)):
        raise TypeError(
            f"ngram_span_dedup: {id_col} must be an integral type for the "
            f"packed-min first-occurrence key; got {id_type.simpleString()}"
        )
    max_id = (1 << 63) // pos_scale - 1  # id*pos_scale + pos stays in bigint
    toks = df.select(
        F.col(id_col),
        F.split(
            F.trim(F.lower(F.coalesce(F.col(text_col), F.lit("")))), r"\s+"
        ).alias("_t"),
    ).withColumn("_n", F.size("_t"))
    bad = (
        (F.col("_n") >= pos_scale)
        | (F.col(id_col) < 0)
        | (F.col(id_col) > max_id)
    )
    guard_err = F.raise_error(
        F.concat(
            F.lit(
                f"ngram_span_dedup: packing invariant violated (need "
                f"n_tokens < pos_scale={pos_scale} and 0 <= {id_col} <= "
                f"{max_id}); got n_tokens="
            ),
            F.col("_n").cast("string"),
            F.lit(f", {id_col}="),
            F.col(id_col).cast("string"),
        )
    )
    toks = toks.withColumn(
        "_n", F.when(bad, guard_err.cast("int")).otherwise(F.col("_n"))
    )
    grams = toks.select(
        id_col,
        "_t",
        "_n",
        F.explode(
            F.when(
                F.col("_n") >= k,
                F.transform(
                    F.sequence(F.lit(1), F.col("_n") - (k - 1)),
                    lambda i: F.struct(
                        (i - 1).alias("pos"),
                        F.concat_ws(" ", F.slice("_t", i, k)).alias("gram"),
                    ),
                ),
            ).otherwise(F.array())
        ).alias("g"),
    ).select(id_col, F.col("g.pos").alias("pos"), F.col("g.gram").alias("gram"))

    packed = F.col(id_col) * pos_scale + F.col("pos")
    stats = grams.groupBy("gram").agg(
        F.count("*").alias("_c"), F.min(packed).alias("_first")
    )
    # every non-first occurrence of a duplicated gram covers k positions
    covered = (
        grams.join(stats.where(F.col("_c") > 1), "gram")
        .where(packed != F.col("_first"))
        .select(
            id_col,
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + (k - 1))
            ).alias("tpos"),
        )
        .distinct()
    )
    pos_toks = toks.select(
        id_col,
        "_n",
        F.posexplode(
            F.when(F.col("_n") > 0, F.col("_t")).otherwise(F.array(F.lit("")))
        ).alias("tpos", "tok"),
    )
    surviving = pos_toks.join(covered, [id_col, "tpos"], "left_anti")
    rebuilt = surviving.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("tpos"), F.col("tok")))
                ),
                lambda s: s["tok"],
            ),
            " ",
        ).alias(out_col),
        F.count("*").alias("_kept"),
    )
    # a fully-covered document must survive as an EMPTY doc, not vanish
    return toks.select(id_col, "_n").join(rebuilt, id_col, "left").select(
        id_col,
        F.coalesce(F.col(out_col), F.lit("")).alias(out_col),
        F.col("_n").cast("bigint").alias("n_tokens"),
        (F.col("_n") - F.coalesce(F.col("_kept"), F.lit(0))).cast("bigint").alias(
            "n_removed"
        ),
    )


def simhash_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    bands: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    hex_digits: int = SIMHASH_HEX_DIGITS,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-duplicate candidate pairs from SimHash signatures — the
    retrieval half of the SimHash family (Charikar / Manku et al.'s
    web-dedup shape): split the 48-bit signature into ``bands`` equal
    bit-bands; by pigeonhole, any pair within ``max_hamming <= bands-1``
    bit flips agrees EXACTLY on at least one band, so candidates are
    found with equi-joins on (band, band_key) — never an all-pairs
    scan — then verified with ``bit_count(xor)``.

    Returns ``(id_a, id_b, hamming)``, id_a < id_b, one row per pair.

    Scale: same contract as MinHash-LSH banding — bucket sizes track
    real near-dup group sizes; the verify is one xor+popcount per
    candidate. Skewed bands (e.g. all-zero signatures from empty docs)
    are the hot-bucket risk: ``max_bucket_size`` drops any (band, key)
    bucket above the cap before the self-join (shared
    :func:`_cap_buckets` valve, same contract as
    :func:`lsh_candidate_pairs`), trading recall on degenerate clusters
    for a cap² pair bound per bucket. ``None`` = exact semantics.
    """
    bits = hex_digits * 4
    if bits % bands != 0:
        raise ValueError(
            f"simhash_pairs: bands={bands} must divide the signature width "
            f"({hex_digits} hex digits = {bits} bits)"
        )
    if max_hamming > bands - 1:
        raise ValueError(
            f"simhash_pairs: max_hamming={max_hamming} needs bands >= "
            f"{max_hamming + 1} (pigeonhole: a pair {max_hamming} flips apart "
            f"only guarantees an exact band match when max_hamming <= bands-1); "
            f"got bands={bands}"
        )
    band_bits = bits // bands
    sig = simhash(df, text_col=text_col, id_col=id_col, hex_digits=hex_digits)
    banded = sig.select(
        F.col(id_col),
        F.col("simhash"),
        F.posexplode(
            F.array(
                *[
                    (
                        F.shiftrightunsigned(F.col("simhash"), b * band_bits)
                        % (1 << band_bits)
                    ).cast("bigint")
                    for b in range(bands)
                ]
            )
        ).alias("band", "key"),
    )
    banded = _cap_buckets(banded, max_bucket_size)
    a = banded.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("_sa"), "band", "key"
    )
    b = banded.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("_sb"), "band", "key"
    )
    return (
        a.join(b, ["band", "key"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.col("_sa").bitwiseXOR(F.col("_sb")).alias("_x"))
        .distinct()
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("_x")).cast("int").alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
    )


def canonical_per_cluster(
    clusters: DataFrame,
    scored: DataFrame,
    quality_col: str,
    id_col: str = "doc_id",
    cluster_col: str = "component_id",
) -> DataFrame:
    """Canonical-document selection — the keep-WHICH-copy policy of a
    near-dup pipeline: given cluster labels (e.g. from
    ``graph.connected_components`` over LSH pairs) and a quality-scored
    corpus, keep the highest-quality member of each cluster (tiebreak:
    lowest id) instead of the naive first-seen copy.

    Returns one row per input doc: (id, cluster, quality, ``keep``).
    Docs absent from ``clusters`` (singletons that never produced a
    candidate pair) form their own cluster and are always kept.

    One hash shuffle on the cluster key for the ranking window; the
    quality join is id-equi and AQE-sized. At 100 TB the cluster frame
    is the (small) pair-graph closure, not the corpus — broadcast it
    when it fits.
    """
    from pyspark.sql import Window

    labeled = scored.join(
        clusters.select(
            F.col(id_col), F.col(cluster_col).alias("_cluster")
        ),
        id_col,
        "left",
    ).select(
        F.col(id_col),
        F.coalesce(F.col("_cluster"), F.col(id_col)).alias("cluster_id"),
        F.col(quality_col).alias("_q"),
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("_q"), F.asc(id_col)
    )
    return labeled.select(
        id_col,
        "cluster_id",
        F.col("_q").alias(quality_col),
        (F.row_number().over(w) == 1).alias("keep"),
    )


def containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_cols: tuple[str, ...] = ("lang",),
    threshold: float = 0.8,
    k: int = SHINGLE_K,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Asymmetric shingle CONTAINMENT — ``C(A→B) = |A∩B| / |A|`` — the
    direction-aware companion of :func:`jaccard_pairs`: a short
    document fully quoted inside a long one scores containment ≈ 1
    while its Jaccard stays tiny (|A∪B| is dominated by the long doc),
    so subsumed/quoted/aggregated documents are invisible to symmetric
    dedup but caught here (Broder's containment, the shape behind
    "remove documents that are substrings of others" rules).

    Emits BOTH directions above ``threshold`` as ``(id_src, id_dst,
    containment, jaccard)`` with ``id_src`` the contained side —
    integer counts until the final divisions, exact. Same blocked
    shingle equi-join, hot-shingle valve (``max_shingle_df`` — see
    :func:`_blocked_shingle_inter`), and scale posture as
    :func:`jaccard_pairs` (one |A∩B| join feeds both metrics; at
    100 TB block on (lang, length-bucket, LSH band)).
    """
    inter, sizes = _blocked_shingle_inter(
        df, text_col, id_col, block_cols, k, max_shingle_df
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    both = (
        inter.join(sa, inter.id_a == F.col(f"sa.{id_col}"))
        .join(sb, inter.id_b == F.col(f"sb.{id_col}"))
        .select(
            "id_a", "id_b", "inter",
            F.col("sa.sz").alias("sz_a"), F.col("sb.sz").alias("sz_b"),
            F.round(
                F.col("inter")
                / (F.col("sa.sz") + F.col("sb.sz") - F.col("inter")),
                6,
            ).alias("jaccard"),
        )
    )
    fwd = both.select(
        F.col("id_a").alias("id_src"), F.col("id_b").alias("id_dst"),
        F.round(F.col("inter") / F.col("sz_a"), 6).alias("containment"),
        "jaccard",
    )
    rev = both.select(
        F.col("id_b").alias("id_src"), F.col("id_a").alias("id_dst"),
        F.round(F.col("inter") / F.col("sz_b"), 6).alias("containment"),
        "jaccard",
    )
    return fwd.unionByName(rev).where(F.col("containment") >= threshold)
