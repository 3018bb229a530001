"""Structured Streaming over the document corpus: continuous-ingest
versions of the LLM-pipeline cleaning operators.

The decontamination flow is the canonical *stream-static* composition:
documents arrive as a stream, the eval-set gram table is a bounded
static frame computed once up front, and the overlap test is a
stream-static ``left_semi`` equi-join (stateless — each micro-batch
probes the static side; Spark re-broadcasts/reuses the static relation
across batches). The only stateful step is ``dropDuplicates`` on the
flagged doc id, so state size is O(contaminated docs), not O(corpus).

At scale: the static side is the small one (eval benchmarks, not the
corpus), exactly like the batch operator (``operators/decontam.py``);
nothing here holds corpus-sized state.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.decontam import word_ngrams


def read_documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``readStream`` over the documents parquet (schema sniffed from a
    one-off batch read; the streaming file source needs it up front).

    The streaming file source REQUIRES a directory ('basePath must be a
    directory'). When the table is itself a parquet directory
    (``part-*.parquet`` inside — Spark's own write layout), stream it
    directly; when it is a single bare file (this fixture's layout),
    stream the parent with a filename glob."""
    path = os.path.join(sf_dir, "documents.parquet")
    schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema)
    if os.path.isdir(path):
        return reader.parquet(path)
    return reader.option("pathGlobFilter", "documents.parquet").parquet(sf_dir)


def contaminated_ids_stream(
    docs_stream: DataFrame,
    eval_grams: DataFrame,
    n: int = 6,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Append-mode stream of distinct doc ids sharing >= 1 word n-gram
    with the static ``eval_grams`` frame (one column ``gram``).

    stream explode → stream-static left_semi join (stateless) →
    stateful dropDuplicates on the id (state ∝ matches only).
    """
    grams = docs_stream.select(
        F.col(id_col), F.explode(word_ngrams(text_col, n)).alias("gram")
    )
    hits = grams.join(eval_grams.select("gram").distinct(), "gram", "left_semi")
    return hits.select(id_col).dropDuplicates([id_col])


def quality_filter_stream(
    docs_stream: DataFrame,
    min_tokens: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """Stateless per-row quality gate on a document stream — narrow
    column expressions pass through Structured Streaming untouched."""
    from ..operators.text import with_quality

    return with_quality(docs_stream, text_col).where(
        F.col("n_tokens") >= min_tokens
    )


def incremental_dedup_sink(
    docs_stream: DataFrame,
    spark: SparkSession,
    state_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Continuous-ingest exact dedup via ``foreachBatch``: maintain an
    on-disk state table of O(docs)·(16-byte-hash + id); each micro-batch
    keeps only rows whose text hash is unseen BOTH in the state and
    within the batch (first doc_id wins, matching
    ``dedup.exact_dedup``), appends the survivors to
    ``<state_dir>/docs`` and their hashes to ``<state_dir>/state``.

    This is the streaming face of ``dedup.incremental_dedup`` — the
    batch operator's anti-join applied per micro-batch inside the sink.
    ``foreachBatch`` is the escape hatch Spark provides precisely for
    merge-style sinks the declarative API can't express; state lives in
    files (parquet here; Delta/Iceberg in production), NOT in session
    temp views — a foreachBatch body runs against a cloned session
    whose view changes don't propagate back.

    Restart/replay semantics: the query checkpoints its progress
    (``<state_dir>/_checkpoint``), existing state survives a restart
    (init only when absent — wiping it would re-admit every duplicate),
    and each batch writes with ``overwrite`` into a
    ``batch_id=<n>`` partition of both tables — the standard idempotent
    foreachBatch sink recipe: foreachBatch is at-least-once, so a
    replayed batch simply rewrites its own partition instead of
    appending duplicates (and a crash between the two writes is healed
    on replay because both are recomputed from the pre-batch state,
    which never contains the crashed batch's own partition under
    ``batch_id >= current`` exclusion below).

    Scale: the anti-join shuffles on the 16-byte hash; partition the
    state table by hash prefix so the join and the append agree on
    layout, and compact periodically. Nothing driver-side.
    """
    import os

    from .state import seed_state

    state_path = os.path.join(state_dir, "state")
    docs_path = os.path.join(state_dir, "docs")
    # crash-safe init (ADVICE r9): seed_state keys on the committed
    # _SUCCESS marker via the Hadoop FS API and overwrites uncommitted
    # debris — see streaming/state.py.
    hash_schema = f"text_hash string, {id_col} bigint"
    seed_state(
        spark,
        os.path.join(state_path, "batch_id=-1"),
        spark.createDataFrame([], hash_schema),
    )
    doc_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in docs_stream.schema.fields
    )
    seed_state(
        spark,
        os.path.join(docs_path, "batch_id=-1"),
        spark.createDataFrame([], doc_schema),
    )
    stream_cols = list(docs_stream.columns)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        b = batch_df.sparkSession
        # exclude this batch's own partition: on replay the state dir may
        # already hold a partial/complete write from the crashed attempt
        state = b.read.parquet(state_path).where(F.col("batch_id") < batch_id)
        hashed = batch_df.withColumn("text_hash", F.md5(F.col(text_col)))
        firsts = (
            hashed.join(
                hashed.groupBy("text_hash").agg(F.min(id_col).alias("_keep")),
                "text_hash",
            )
            .where(F.col(id_col) == F.col("_keep"))
            .drop("_keep")
        )
        novel = firsts.join(state, "text_hash", "left_anti")
        # materialize once: the two writes below must see the SAME rows
        novel = novel.localCheckpoint(eager=True)
        novel.select(stream_cols).write.mode("overwrite").parquet(
            os.path.join(docs_path, f"batch_id={batch_id}")
        )
        novel.select("text_hash", id_col).write.mode("overwrite").parquet(
            os.path.join(state_path, f"batch_id={batch_id}")
        )

    return (
        docs_stream.writeStream.foreachBatch(process_batch)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(state_dir, "_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )


def fuzzy_contaminated_ids_stream(
    docs_stream: DataFrame,
    eval_set: DataFrame,
    threshold: float = 0.25,
    num_perm: int | None = None,
    bands: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Streaming twin of ``decontam.fuzzy_contamination``: append-mode
    stream of distinct doc ids whose estimated MinHash Jaccard against
    any STATIC eval document reaches ``threshold``.

    Possible at all because ``minhash_signatures_inrow`` is
    zero-shuffle/in-row — a stateless narrow map legal on a streaming
    frame (the batch groupBy shape would have needed a watermarked
    streaming aggregation). The static eval side keeps the faster
    codegen groupBy variant. Flow: in-row signatures → in-row band-key
    posexplode → stream-static equi-join on (band, key) against the
    precomputed eval band table (carrying the eval signature columns) →
    in-row agree-count → threshold filter → stateful ``dropDuplicates``
    on the id (state ∝ flagged docs only, same bound as the exact-gram
    stream).
    """
    from ..operators.dedup import (
        BANDS,
        NUM_PERM,
        band_buckets,
        minhash_signatures,
        minhash_signatures_inrow,
    )

    num_perm = NUM_PERM if num_perm is None else num_perm
    bands = BANDS if bands is None else bands
    sig_s = minhash_signatures_inrow(docs_stream, text_col, id_col, num_perm)
    r = num_perm // bands
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.md5(
                F.concat_ws(
                    "|", *[F.col(f"h{i}") for i in range(b * r, (b + 1) * r)]
                )
            ).alias("key"),
        )
        for b in range(bands)
    ]
    banded_s = sig_s.select(
        F.col(id_col),
        *[F.col(f"h{i}") for i in range(num_perm)],
        F.explode(F.array(*band_cols)).alias("bk"),
    ).select(
        id_col,
        *[f"h{i}" for i in range(num_perm)],
        F.col("bk.band").alias("band"),
        F.col("bk.key").alias("key"),
    )
    sig_e = minhash_signatures(eval_set, text_col, id_col, num_perm)
    banded_e = band_buckets(sig_e, id_col, num_perm, bands).join(
        sig_e, id_col
    )
    banded_e = banded_e.select(
        F.col(id_col).alias("_eid"),
        *[F.col(f"h{i}").alias(f"e{i}") for i in range(num_perm)],
        "band",
        "key",
    )
    agree = sum(
        F.when(F.col(f"h{i}") == F.col(f"e{i}"), 1).otherwise(0)
        for i in range(num_perm)
    )
    est = banded_s.join(banded_e, ["band", "key"]).select(
        F.col(id_col),
        F.round(agree / F.lit(float(num_perm)), 6).alias("est"),
    )
    return (
        est.where(F.col("est") >= threshold)
        .select(id_col)
        .dropDuplicates([id_col])
    )


def media_neardup_ids_stream(
    media_stream: DataFrame,
    known_media: DataFrame,
    max_hamming: int = 1,
    bands: int = 2,
    n_segments: int = 16,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Stream-static twin of ``multimodal.media_neardup_pairs``:
    append-mode stream of distinct ids whose aHash signature is within
    ``max_hamming`` of ANY known (static) media item — the continuous-
    ingest image-dedup gate (flag incoming crawl media against the
    already-ingested corpus without decoding anything).

    The signature is a pure expression (streaming-legal); its banded
    keys are computed in-row and probed against the static banded
    signature table (AQE broadcasts it). The popcount verify runs on
    candidates only; state is the ``dropDuplicates`` id set ∝ flagged
    items. The signature expression is referenced by each band key (no
    checkpoint barrier exists on a stream) — ``bands``+1 evaluations
    per row, the documented interpreted-HOF cost, bounded and small.
    """
    from ..operators.multimodal import ahash_signature

    if n_segments % bands != 0 or max_hamming > bands - 1:
        raise ValueError("pigeonhole contract: hamming <= bands-1, bands | bits")
    band_bits = n_segments // bands
    sig_s = ahash_signature(media_stream, n_segments, payload_col, id_col)
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            (
                F.shiftrightunsigned(F.col("ahash"), b * band_bits)
                % (1 << band_bits)
            )
            .cast("bigint")
            .alias("key"),
        )
        for b in range(bands)
    ]
    banded_s = sig_s.select(
        F.col(id_col), F.col("ahash"), F.explode(F.array(*band_cols)).alias("bk")
    ).select(
        id_col,
        "ahash",
        F.col("bk.band").alias("band"),
        F.col("bk.key").alias("key"),
    )
    sig_k = ahash_signature(known_media, n_segments, payload_col, id_col)
    banded_k = sig_k.select(
        F.col(id_col).alias("_kid"),
        F.col("ahash").alias("_kh"),
        F.explode(F.array(*band_cols)).alias("bk"),
    ).select(
        "_kid",
        "_kh",
        F.col("bk.band").alias("band"),
        F.col("bk.key").alias("key"),
    )
    hits = (
        banded_s.join(banded_k, ["band", "key"])
        .where(
            F.bit_count(F.col("ahash").bitwiseXOR(F.col("_kh")))
            <= max_hamming
        )
        .select(id_col)
        .dropDuplicates([id_col])
    )
    return hits


def quality_scored_stream(
    docs_stream: DataFrame,
    model: dict[int, int],
    threshold: float = 0.5,
    n_buckets: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Continuous quality-classifier gate: score each arriving document
    with a TRAINED model (``training.model_as_dict`` artifact) and keep
    those with ``prob >= threshold`` — the streaming face of the
    label→fit→score loop (fit offline on a batch slice, score the
    crawl as it lands).

    Stateless end to end: ``training.score_with_model_inrow`` folds the
    per-doc logit over the document's own features with the model as a
    literal map — no join, no aggregation, so the stream needs no
    watermark and no state store at all.
    """
    from ..operators.training import score_with_model_inrow

    scored = score_with_model_inrow(
        docs_stream, model, n_buckets, text_col, id_col
    )
    return scored.where(F.col("prob") >= threshold)


def snapshot_sink(
    docs_stream: DataFrame,
    spark: SparkSession,
    state_dir: str,
    cents: DataFrame,
    base_hashes: DataFrame | None = None,
    base_domain_counts: DataFrame | None = None,
    n_cells: int = 16,
    dim: int = 64,
    alpha: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    domain_col: str = "lang",
):
    """The nightly snapshot run as a continuous-ingest sink: ONE
    ``foreachBatch`` body that executes, per micro-batch, exactly the
    three incremental legs of :func:`~wasaffi_spark.operators.pipeline.
    incremental_snapshot` against on-disk state — the streaming face of
    the batch report, sharing its admission plan
    (``pipeline.snapshot_admission``) so the two cannot drift:

    1. **admit** — anti-join the batch's text hashes against the
       persisted hash table, min-id dedup within the batch;
    2. **append** — assign the admitted docs' hashed embeddings to the
       FROZEN codebook ``cents`` and persist the postings delta
       (``ivf_append``'s write path);
    3. **report** — one row per domain with the dedup ledger and the
       ``keep_bp_old``/``keep_bp_new`` temperature-weight diff,
       computed by calling ``pipeline.incremental_snapshot`` itself on
       the pre-batch state.

    State layout under ``state_dir`` (all parquet, all
    ``batch_id=<n>``-partitioned, seeded crash-safely at ``batch_id=-1``
    via :func:`~wasaffi_spark.streaming.state.seed_state`):
    ``state`` (text_hash, id), ``counts`` (domain, n_d — ADDITIVE
    partials: pre-batch totals are the sum over earlier partitions, so
    no partition is ever rewritten), ``postings`` (cell, vec_id),
    ``report`` (the per-batch published report), and ``cents`` (the
    frozen codebook, written once).

    Replay semantics follow the house sink recipe
    (:func:`incremental_dedup_sink`): every read excludes
    ``batch_id >= current``, every write overwrites the batch's own
    partition — at-least-once foreachBatch becomes effectively-once.

    Scale: the anti-join and the batch dedup shuffle (hash, id) rows
    only; the codebook is an ``n_cells``-row broadcast; the counts
    state is O(domains · batches) and compacts trivially. Nothing
    corpus-sized is ever re-read — the point of the nightly design.
    """
    from ..operators.pipeline import (
        incremental_snapshot,
        snapshot_admission,
    )
    from ..operators.similarity import hashed_embedding, ivf_assign_hashed
    from .state import seed_state

    state_path = os.path.join(state_dir, "state")
    counts_path = os.path.join(state_dir, "counts")
    postings_path = os.path.join(state_dir, "postings")
    report_path = os.path.join(state_dir, "report")
    cents_path = os.path.join(state_dir, "cents")

    if base_hashes is None:
        base_hashes = spark.createDataFrame(
            [], f"text_hash string, {id_col} bigint"
        )
    if base_domain_counts is None:
        base_domain_counts = spark.createDataFrame(
            [], f"{domain_col} string, n_d bigint"
        )
    seed_state(
        spark,
        os.path.join(state_path, "batch_id=-1"),
        base_hashes.select(
            "text_hash", F.col(id_col).cast("bigint").alias(id_col)
        ),
    )
    seed_state(
        spark,
        os.path.join(counts_path, "batch_id=-1"),
        base_domain_counts.select(
            domain_col, F.col("n_d").cast("bigint").alias("n_d")
        ),
    )
    seed_state(spark, cents_path, cents)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        _snapshot_batch(
            batch_df, batch_id, state_dir,
            n_cells=n_cells, dim=dim, alpha=alpha,
            id_col=id_col, text_col=text_col, domain_col=domain_col,
        )

    return (
        docs_stream.writeStream.foreachBatch(process_batch)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(state_dir, "_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )


def _snapshot_batch(
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    *,
    n_cells: int,
    dim: int,
    alpha: float,
    id_col: str,
    text_col: str,
    domain_col: str,
) -> None:
    """One :func:`snapshot_sink` micro-batch, module-level so the
    replay contract is directly testable: every read excludes
    ``batch_id >= current`` (a replayed batch recomputes from exactly
    the pre-batch state, which can never contain its own partial
    writes), every write overwrites the batch's own partition —
    re-running a batch is therefore a byte-identical rewrite, the
    effectively-once property the at-least-once foreachBatch contract
    needs (pinned by ``test_snapshot_sink_replay_is_idempotent``)."""
    from ..operators.pipeline import incremental_snapshot, snapshot_admission
    from ..operators.similarity import hashed_embedding, ivf_assign_hashed

    state_path = os.path.join(state_dir, "state")
    counts_path = os.path.join(state_dir, "counts")
    postings_path = os.path.join(state_dir, "postings")
    report_path = os.path.join(state_dir, "report")
    cents_path = os.path.join(state_dir, "cents")

    b = batch_df.sparkSession
    seen = b.read.parquet(state_path).where(
        F.col("batch_id") < batch_id
    )
    counts = (
        b.read.parquet(counts_path)
        .where(F.col("batch_id") < batch_id)
        .groupBy(domain_col)
        .agg(F.sum("n_d").alias("n_d"))
    )
    frozen = b.read.parquet(cents_path)
    report = incremental_snapshot(
        batch_df, seen, counts, frozen,
        n_cells=n_cells, dim=dim, alpha=alpha,
        text_col=text_col, id_col=id_col, domain_col=domain_col,
    )
    report.write.mode("overwrite").parquet(
        os.path.join(report_path, f"batch_id={batch_id}")
    )
    _, _, fresh = snapshot_admission(
        batch_df, seen, text_col, id_col, domain_col
    )
    # materialize once: the three state writes must see the SAME
    # admitted set (and not recompute the anti-join thrice)
    fresh = fresh.localCheckpoint(eager=True)
    fresh.select(
        F.col("_th").alias("text_hash"), F.col(id_col)
    ).write.mode("overwrite").parquet(
        os.path.join(state_path, f"batch_id={batch_id}")
    )
    fresh.groupBy(domain_col).agg(
        F.count("*").alias("n_d")
    ).write.mode("overwrite").parquet(
        os.path.join(counts_path, f"batch_id={batch_id}")
    )
    emb = hashed_embedding(
        fresh, dim=dim, text_col=text_col, id_col=id_col
    ).where(F.col("norm_sq") > 0)
    ivf_assign_hashed(
        emb.select(F.col(id_col).alias("vec_id"), "embedding"),
        frozen, n_cells, dim=dim,
    ).select("cell", "vec_id").write.mode("overwrite").parquet(
        os.path.join(postings_path, f"batch_id={batch_id}")
    )
