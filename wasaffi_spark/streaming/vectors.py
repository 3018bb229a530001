"""Structured Streaming over the embedding table: continuous-ingest
vector operators against a STATIC quantized index.

The shape mirrors the document pipeline's stream-static compositions
(``streaming/documents.py``): the index side — IVF centroids + the
cell-assigned already-ingested corpus — is computed once up front;
each arriving vector routes to its probe cells IN-ROW (the centroid
frame is tiny, so it collapses to a literal expression — no window, no
aggregation, hence fully streaming-legal in append mode) and the
candidate check is a stateless stream-static equi-join on ``cell``.
State is only the ``dropDuplicates`` id set of flagged vectors.

At 100 TB the static side is the big one — which is exactly why each
arriving vector touches only n_probe/n_cells of it (the cell
equi-join), with the corpus written bucketed by ``cell`` so the probe
join is shuffle-free; the SQ8-coded variant of the static side (an
ADC pre-screen before the exact confirm) is the same composition the
batch :func:`~wasaffi_spark.operators.similarity.ivf_sq8_topk`
declares.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import (
    IVF_SEED,
    PQ_QUANT,
    hashed_centroids,
    ivf_assign_hashed,
)


def _literal_cell_structs(
    cent_rows: list,
    vec_col: str,
    dim: int,
    quant: int,
) -> F.Column:
    """Sorted array of (grid-L2-distance, cell) structs against LITERAL
    snapped centroids — ivf_assign_hashed's packed-min argmin contract
    ((dist asc, cell asc)) as ONE streaming-legal expression. Element 1
    is the assignment; a `slice` of the first n is the probe set. The
    in-row twin every vector gate shares (semantic near-dup probing,
    prototype gating, pseudo-labeling, postings append)."""
    import math

    def grid(x):
        return F.floor(x.cast("double") * F.lit(quant) + F.lit(0.5))

    def cell_dist(row) -> F.Column:
        # per-dimension grid L2 against a LITERAL centroid: snap both
        # sides exactly as _pq_grid_dist does (the centroid snaps on
        # the driver with the same floor(x*quant + 0.5))
        cv = row["cv"]
        v = F.col(vec_col)
        acc = F.lit(0).cast("bigint")
        for i in range(dim):
            c_snap = int(math.floor(float(cv[i]) * quant + 0.5))
            d = grid(F.element_at(v, i + 1)) - F.lit(c_snap)
            acc = acc + (d * d).cast("bigint")
        return acc

    return F.array_sort(
        F.array(
            *[
                F.struct(
                    cell_dist(r).alias("d"),
                    F.lit(int(r["cell"])).cast("int").alias("cell"),
                )
                for r in cent_rows
            ]
        )
    )


def read_embeddings_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``readStream`` over the embeddings parquet (same single-file /
    directory handling as ``read_documents_stream``)."""
    path = os.path.join(sf_dir, "embeddings.parquet")
    schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema)
    if os.path.isdir(path):
        return reader.parquet(path)
    return reader.option("pathGlobFilter", "embeddings.parquet").parquet(
        sf_dir
    )


def semantic_neardup_ids_stream(
    emb_stream: DataFrame,
    known_corpus: DataFrame,
    threshold: float = 0.95,
    n_cells: int = 16,
    n_probe: int = 2,
    dim: int = 64,
    quant: int = PQ_QUANT,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: str = IVF_SEED,
    filter_col: str | None = None,
) -> DataFrame:
    """Continuous-ingest semantic near-dup gate: append-mode stream of
    ids whose exact cosine to ANY known (static) corpus vector is
    ``>= threshold`` — the embedding-space face of the ingest dedup
    gates (``incremental_dedup_sink`` for exact text,
    ``media_neardup_ids_stream`` for media bytes): drop arriving crawl
    vectors that semantically duplicate the already-ingested corpus.

    Streaming-legality is the design constraint: probe-cell selection
    cannot use a per-row ranking window on a stream, so the ``n_probe``
    nearest centroids are picked IN-ROW — the centroid frame is
    O(n_cells) and is collected once into a literal array of (cell,
    centroid) structs (the same bounded-collect class as the PQ merge
    table), and ``array_sort`` + ``slice`` over the per-centroid
    integer-grid distances yields the probed cells inside one
    expression. The candidate join is then a stateless stream-static
    equi-join on ``cell`` against the cell-assigned index; candidates
    are confirmed with the exact fold-order cosine on the static
    side's raw vector vs the arriving row's own vector (both available
    in-row — no second join, no state).

    Cell routing uses the same engine-exact integer-grid argmin as
    :func:`~wasaffi_spark.operators.similarity.ivf_assign_hashed`, so
    the streamed candidate set is IDENTICAL to the batch composition's
    — pinned stream≡batch by ``tests/test_streaming.py``.

    ``filter_col`` (r7) adds the attribute isolation of
    :func:`~wasaffi_spark.operators.similarity.filtered_ivf_topk`: an
    arriving vector is gated only against SAME-attribute known vectors
    (per-tenant / same-language ingest dedup — the streaming twin of
    the batch filtered×IVF composition). The attribute rides the
    static assignment at zero extra shuffle and joins as a plain
    equality, so NULL-attributed rows are never gated (same NULL
    contract as the batch operator).
    """
    cents = hashed_centroids(known_corpus, n_cells, vec_col, id_col, seed)
    cent_rows = cents.collect()  # O(n_cells) — bounded by construction
    # materialize the assigned index ONCE: a stream-static join
    # re-executes the static subplan every trigger, so without this
    # each micro-batch would re-run the corpus × n_cells assignment —
    # the exact per-trigger corpus-sized work the gate exists to avoid
    # (same eager-localCheckpoint recipe as the documents pipeline)
    static_cols = [
        F.col(id_col).alias("_nid"),
        F.col("cell"),
        F.col(vec_col).alias("_nv"),
    ]
    if filter_col is not None:
        static_cols.append(F.col(filter_col).alias("_nf"))
    static = (
        ivf_assign_hashed(
            known_corpus, cents, n_cells, dim, quant, vec_col, id_col,
            extra_cols=(filter_col,) if filter_col is not None else (),
        )
        .select(*static_cols)
        .localCheckpoint(eager=True)
    )

    stream_cols = [
        F.col(id_col),
        F.col(vec_col),
        F.slice(
            _literal_cell_structs(cent_rows, vec_col, dim, quant),
            1,
            n_probe,
        ).alias("_pc"),
    ]
    if filter_col is not None:
        stream_cols.append(F.col(filter_col))
    probed = emb_stream.select(*stream_cols).select(
        id_col,
        vec_col,
        *([filter_col] if filter_col is not None else []),
        F.explode(F.col("_pc.cell")).alias("cell"),
    )
    from ..operators.similarity import cosine

    hits = probed.join(static, ["cell"]).where(F.col(id_col) != F.col("_nid"))
    if filter_col is not None:
        hits = hits.where(F.col(filter_col) == F.col("_nf"))
    hits = (
        hits.where(
            F.round(cosine(F.col(vec_col), F.col("_nv")), 6)
            >= F.lit(threshold)
        )
        .select(id_col)
        .dropDuplicates([id_col])
    )
    return hits


def prototype_gate_stream(
    emb_stream: DataFrame,
    known_corpus: DataFrame,
    frac: float = 0.25,
    n_cells: int = 16,
    iters: int = 2,
    dim: int = 64,
    quant: int = PQ_QUANT,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: str = IVF_SEED,
) -> DataFrame:
    """Continuous-ingest prototype-redundancy gate — the streaming twin
    of :func:`~wasaffi_spark.operators.similarity.prototype_prune`
    (Sorscher et al. pruning at ingest): drop arriving vectors that
    are MORE prototypical than the per-cell boundary calibrated on the
    known corpus, keep everything that adds spread.

    Calibration is batch, gating is stateless: the Lloyd-trained
    centroids and the per-cell distance cutoff (the smallest
    ``proto_dist`` the batch rule keeps at ``frac``) are computed once
    on the static side — both O(n_cells), the bounded-collect class —
    and each arriving vector assigns to its cell IN-ROW (argmin over
    literal snapped centroids, the same expression trick as
    :func:`semantic_neardup_ids_stream`) and compares its own exact
    integer-grid distance against the literal cutoff map. No join, no
    window, no state at all: the gate is a pure projection + filter,
    so it runs at ingest line rate and is trivially append-legal.

    A cell with no calibration members keeps everything (cutoff 0 —
    no evidence of redundancy there). The dist-only boundary matches
    the batch rule everywhere except exact distance TIES at the
    boundary (batch breaks those on id, which has no meaning for
    unseen stream ids) — pinned stream≡batch on a tie-free fixture.
    Returns kept rows ``(id_col, cell, proto_dist)``.
    """
    from ..operators.similarity import lloyd_centroids, prototype_prune

    cents = lloyd_centroids(
        known_corpus, n_cells, iters, dim, quant, vec_col, id_col, seed
    )
    cent_rows = cents.collect()  # O(n_cells) — bounded by construction
    kept = prototype_prune(
        known_corpus, frac, "hard", n_cells, iters, dim, quant,
        vec_col, id_col, seed, cents=cents,
    )
    cut_rows = (
        kept.groupBy("cell").agg(F.min("proto_dist").alias("_cut")).collect()
    )  # O(n_cells)
    cut = {int(r["cell"]): int(r["_cut"]) for r in cut_rows}

    # packed-min over literal centroid structs = the ivf_assign_hashed
    # argmin contract (dist asc, cell asc), in one expression
    assign = F.slice(
        _literal_cell_structs(cent_rows, vec_col, dim, quant), 1, 1
    )[0]
    cutoff = F.coalesce(
        F.element_at(
            F.create_map(
                *[
                    x
                    for c, v in sorted(cut.items())
                    for x in (F.lit(int(c)), F.lit(int(v)))
                ]
            ),
            F.col("cell"),
        ),
        F.lit(0),
    )
    return (
        emb_stream.select(
            F.col(id_col),
            assign.getField("cell").alias("cell"),
            assign.getField("d").alias("proto_dist"),
        )
        .where(F.col("proto_dist") >= cutoff)
        .select(id_col, "cell", "proto_dist")
    )


def pseudo_label_stream(
    emb_stream: DataFrame,
    known_corpus: DataFrame,
    label_col: str = "label",
    n_cells: int = 16,
    dim: int = 64,
    quant: int = PQ_QUANT,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: str = IVF_SEED,
) -> DataFrame:
    """Continuous-ingest pseudo-labeling gate — the streaming twin of
    :func:`~wasaffi_spark.operators.graph.label_propagation` (VERDICT
    r8 next-round #5): arriving vectors adopt the argmax label of
    their labeled static neighbourhood at ingest, so downstream
    mixture/filter stages can act on a label the arriving document
    doesn't carry.

    The aggregation lives entirely on the STATIC side, which is what
    keeps the stream stateless and append-legal: the labeled known
    corpus assigns to its cells once (batch), and the per-cell label
    vote — ``count desc, label asc``, label_propagation's exact
    deterministic tiebreak — collapses to an O(n_cells) cell→label
    table, localCheckpointed so no trigger replays it. Each arriving
    vector then assigns to its cell IN-ROW (the same literal
    snapped-centroid argmin as :func:`prototype_gate_stream` —
    ivf_assign_hashed's packed-min contract in one expression) and
    adopts the cell's label through a broadcast stream-static left
    join. No window, no streaming aggregation, no state store; a
    vector landing in a cell with no labeled members keeps a NULL
    label (no evidence — same contract as an unreached
    label_propagation node).

    Every op here is batch-legal too, so the stream≡batch pin runs
    the SAME function over the static frame and compares row sets.
    Returns ``(id_col, cell, label_col)``.
    """
    from pyspark.sql.window import Window

    cents = hashed_centroids(known_corpus, n_cells, vec_col, id_col, seed)
    cent_rows = cents.collect()  # O(n_cells) — bounded by construction
    assigned = ivf_assign_hashed(
        known_corpus, cents, n_cells, dim, quant, vec_col, id_col,
        extra_cols=(label_col,),
    )
    w_vote = Window.partitionBy("cell").orderBy(
        F.col("_c").desc(), F.col(label_col).asc()
    )
    cell_label = (
        assigned.where(F.col(label_col).isNotNull())
        .groupBy("cell", label_col)
        .agg(F.count(F.lit(1)).alias("_c"))
        .withColumn("_r", F.row_number().over(w_vote))
        .where(F.col("_r") == 1)
        .select("cell", F.col(label_col).alias("_plab"))
        .localCheckpoint(eager=True)
    )

    assign = F.slice(
        _literal_cell_structs(cent_rows, vec_col, dim, quant), 1, 1
    )[0]
    return (
        emb_stream.select(
            F.col(id_col), assign.getField("cell").alias("cell")
        )
        .join(F.broadcast(cell_label), ["cell"], "left")
        .select(id_col, "cell", F.col("_plab").alias(label_col))
    )


def ivf_append_stream(
    emb_stream: DataFrame,
    known_corpus: DataFrame,
    n_cells: int = 16,
    iters: int = 2,
    dim: int = 64,
    quant: int = PQ_QUANT,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: str = IVF_SEED,
) -> DataFrame:
    """Continuous-ingest postings maintenance — the STREAMING write
    path of :func:`~wasaffi_spark.operators.similarity.ivf_append`: a
    production index ingests continuously, so the postings-delta
    (id, cell) rows should flow from the stream, not from periodic
    batch re-assignments. The Lloyd codebook trains once on the known
    corpus and freezes (O(n_cells) collect — the bounded class); each
    arriving vector assigns IN-ROW against the literal snapped
    centroids (:func:`_literal_cell_structs` — ivf_assign_hashed's
    exact packed-min contract) and emits its postings row. A pure
    stateless projection: no join, no window, no state store —
    ingest-line-rate append legality, and the streamed rows are
    IDENTICAL to the batch ``ivf_append`` postings for the same
    vectors (pinned stream≡batch). Sink the rows partitioned/bucketed
    by ``cell`` and every downstream probe join is shuffle-free.
    Returns ``(id_col, cell)``.
    """
    from ..operators.similarity import lloyd_centroids

    cents = lloyd_centroids(
        known_corpus, n_cells, iters, dim, quant, vec_col, id_col, seed
    )
    cent_rows = cents.collect()  # O(n_cells) — bounded by construction
    assign = F.slice(
        _literal_cell_structs(cent_rows, vec_col, dim, quant), 1, 1
    )[0]
    return emb_stream.select(
        F.col(id_col), assign.getField("cell").alias("cell")
    )


def _seed_graph_state(
    spark: SparkSession,
    state_dir: str,
    base: DataFrame,
    k: int = 8,
    descent_rounds: int = 4,
    max_reverse: int = 16,
    ring: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: str = IVF_SEED,
) -> None:
    """Shared crash-safe init for the graph maintenance sinks
    (:func:`graph_insert_sink`, :func:`graph_delete_sink`): NN-descent
    over ``base`` seeds ``graph/batch_id=-1``, ``base``'s vectors seed
    ``vectors/batch_id=-1``, and an empty tombstone table seeds
    ``deleted/batch_id=-1``. Each seed keys on its committed _SUCCESS
    marker via the Hadoop FS API and overwrites uncommitted debris
    (streaming/state.py — ADVICE r9), so a crash mid-init heals on
    restart instead of wedging every later read."""
    import os as _os

    from ..operators.similarity import knn_descent
    from .state import seed_committed, seed_state

    seed_graph = _os.path.join(state_dir, "graph", "batch_id=-1")
    if not seed_committed(spark, seed_graph):
        g0 = knn_descent(
            base, k=k, rounds=descent_rounds, max_reverse=max_reverse,
            ring=ring, vec_col=vec_col, id_col=id_col, seed=seed,
        )
        seed_state(spark, seed_graph, g0)
    seed_state(
        spark,
        _os.path.join(state_dir, "vectors", "batch_id=-1"),
        base.select(id_col, vec_col),
    )
    seed_state(
        spark,
        _os.path.join(state_dir, "deleted", "batch_id=-1"),
        spark.createDataFrame([], f"{id_col} bigint"),
    )


def _read_deleted_at(
    b: SparkSession, state_dir: str, batch_id: int, id_col: str = "vec_id"
) -> DataFrame:
    """Tombstone ids from all delete batches BEFORE ``batch_id`` (the
    idempotent-replay exclusion every pre-batch read uses)."""
    import os as _os

    return (
        b.read.parquet(_os.path.join(state_dir, "deleted"))
        .where(F.col("batch_id") < batch_id)
        .select(id_col)
        .distinct()
    )


def _read_vectors_at(
    b: SparkSession,
    state_dir: str,
    batch_id: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Pre-batch ALIVE corpus: accumulated vectors minus tombstones."""
    import os as _os

    vecs = (
        b.read.parquet(_os.path.join(state_dir, "vectors"))
        .where(F.col("batch_id") < batch_id)
        .select(id_col, vec_col)
    )
    d = _read_deleted_at(b, state_dir, batch_id, id_col).withColumnRenamed(
        id_col, "_did"
    )
    return vecs.join(d, vecs[id_col] == F.col("_did"), "left_anti")


def _read_adjacency_at(
    b: SparkSession, state_dir: str, batch_id: int, id_col: str = "vec_id"
) -> DataFrame:
    """Pre-batch adjacency: latest-wins per src across batch
    partitions (an adjacency rewritten by a later batch fully replaces
    the node's earlier rows), minus tombstoned srcs. Edges INTO
    tombstoned nodes need no filter: every in-neighbour of a deleted
    node was repaired (rewritten) at that delete's own batch, so
    latest-wins already excludes them — only the deleted node's own
    stale rows linger, and the tombstone anti-join masks exactly
    those."""
    import os as _os

    raw = b.read.parquet(_os.path.join(state_dir, "graph")).where(
        F.col("batch_id") < batch_id
    )
    latest = raw.groupBy("src").agg(F.max("batch_id").alias("batch_id"))
    cur = raw.join(latest, ["src", "batch_id"]).select(
        "src", "dst", "cos_sim", "rank"
    )
    d = _read_deleted_at(b, state_dir, batch_id, id_col).withColumnRenamed(
        id_col, "_did"
    )
    return cur.join(d, cur.src == F.col("_did"), "left_anti")


def graph_insert_sink(
    emb_stream: DataFrame,
    spark: SparkSession,
    state_dir: str,
    base: DataFrame,
    k: int = 8,
    beam: int = 8,
    rounds: int = 4,
    n_entry: int = 4,
    ring: int = 4,
    max_reverse: int = 16,
    descent_rounds: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: str = IVF_SEED,
):
    """Continuous graph-ANN index maintenance via ``foreachBatch`` —
    the streaming face of
    :func:`~wasaffi_spark.operators.similarity.graph_insert`, following
    the ``incremental_dedup_sink`` recipe exactly: the beam search +
    splice is a multi-round iterative join pipeline the declarative
    streaming API can't express, and foreachBatch is the escape hatch
    Spark provides for precisely this merge-style sink.

    State lives in files under ``state_dir`` (parquet here;
    Delta/Iceberg in production):

    - ``graph/batch_id=<n>`` — adjacency rows (src, dst, cos_sim,
      rank). graph_insert REWRITES affected adjacencies, so the
      current graph is LATEST-WINS per src across partitions (one
      max-batch window at read time — the SCD-1 read shape; compact
      periodically in production).
    - ``vectors/batch_id=<n>`` — the accumulated corpus (id, vector),
      needed to score future batches' candidates.

    Initialization happens once when the state dir is absent: the
    NN-descent build over ``base`` seeds ``graph/batch_id=-1`` and
    ``base``'s vectors seed ``vectors/batch_id=-1`` (wiping instead
    would orphan every prior insert). Each micro-batch then reads the
    pre-batch state (``batch_id < current`` — the idempotent-replay
    exclusion: foreachBatch is at-least-once and a replayed batch must
    recompute from the same pre-state and overwrite its own
    partition), runs the batch insert against the frozen snapshot, and
    writes the updated slice + the batch's vectors into its own
    partitions.

    Scale: per batch, exactly graph_insert's cost —
    O(|batch|·beam·(k+ring)·rounds) search + a bounded splice; the
    latest-wins read is one window over the adjacency table (bucket by
    src in production so it's partition-local). Nothing driver-side.
    """
    import os as _os

    from ..operators.similarity import graph_insert

    _seed_graph_state(
        spark, state_dir, base, k=k, descent_rounds=descent_rounds,
        max_reverse=max_reverse, ring=ring, vec_col=vec_col,
        id_col=id_col, seed=seed,
    )
    graph_path = _os.path.join(state_dir, "graph")
    vec_path = _os.path.join(state_dir, "vectors")

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        b = batch_df.sparkSession
        corpus = _read_vectors_at(b, state_dir, batch_id, id_col, vec_col)
        graph = _read_adjacency_at(b, state_dir, batch_id, id_col)
        batch_vecs = batch_df.select(id_col, vec_col)
        upd = graph_insert(
            batch_vecs, graph, corpus, k=k, beam=beam, rounds=rounds,
            n_entry=n_entry, ring=ring, max_reverse=max_reverse,
            vec_col=vec_col, id_col=id_col, seed=seed,
        )
        upd = upd.localCheckpoint(eager=True)
        upd.write.mode("overwrite").parquet(
            _os.path.join(graph_path, f"batch_id={batch_id}")
        )
        batch_vecs.write.mode("overwrite").parquet(
            _os.path.join(vec_path, f"batch_id={batch_id}")
        )

    return (
        emb_stream.writeStream.foreachBatch(process_batch)
        .outputMode("append")
        .option(
            "checkpointLocation", _os.path.join(state_dir, "_checkpoint")
        )
        .trigger(availableNow=True)
        .start()
    )


def graph_delete_sink(
    del_stream: DataFrame,
    spark: SparkSession,
    state_dir: str,
    base: DataFrame | None = None,
    k: int = 8,
    descent_rounds: int = 4,
    max_reverse: int = 16,
    ring: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: str = IVF_SEED,
):
    """Continuous graph-ANN DELETE maintenance via ``foreachBatch`` —
    the streaming face of
    :func:`~wasaffi_spark.operators.similarity.graph_delete`
    (FreshDiskANN delete-with-repair), completing the streaming
    maintenance story next to :func:`graph_insert_sink` (VERDICT r9
    Next-round #4). Shares the SAME ``batch_id``-partitioned state dir
    and adds one table:

    - ``deleted/batch_id=<n>`` — tombstone ids. Repair rewrites every
      in-neighbour's adjacency at the delete's own batch (latest-wins
      masks their old rows, including the edges into the deleted set);
      the deleted nodes' OWN stale rows are masked by the tombstone
      anti-join in every read (``_read_adjacency_at`` /
      :func:`read_graph_state`). Compaction (production: periodic
      re-descent over the alive corpus) physically drops both.

    Each micro-batch reads the pre-batch state (``batch_id <
    current``), runs the batch delete against that frozen snapshot,
    and OVERWRITES its own ``graph`` and ``deleted`` partitions — the
    same idempotent at-least-once recipe as the insert sink: a
    replayed batch recomputes from the same pre-state and rewrites its
    partitions byte-identically. ``base`` seeds the state when absent
    (pass None to require an existing state dir, e.g. one an insert
    sink built). Run insert and delete phases alternately
    (availableNow triggers, distinct checkpoint dirs) — the
    FreshDiskANN interleave; concurrent writers to one state dir are
    out of contract, as is re-inserting a previously deleted id
    without compaction.

    Scale: per batch exactly graph_delete's cost — |edges into D|·k
    bridge candidates + a re-rank over affected adjacencies only; the
    tombstone table is O(total deletes) ids and the anti-joins are
    broadcast-sized until compaction. Nothing driver-side."""
    import os as _os

    from ..operators.similarity import graph_delete

    if base is not None:
        _seed_graph_state(
            spark, state_dir, base, k=k, descent_rounds=descent_rounds,
            max_reverse=max_reverse, ring=ring, vec_col=vec_col,
            id_col=id_col, seed=seed,
        )
    graph_path = _os.path.join(state_dir, "graph")
    del_path = _os.path.join(state_dir, "deleted")

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        b = batch_df.sparkSession
        corpus = _read_vectors_at(b, state_dir, batch_id, id_col, vec_col)
        graph = _read_adjacency_at(b, state_dir, batch_id, id_col)
        dele = batch_df.select(id_col).distinct().localCheckpoint(
            eager=True
        )
        rep = graph_delete(
            dele, graph, corpus, k=k, vec_col=vec_col, id_col=id_col
        )
        rep = rep.localCheckpoint(eager=True)
        rep.write.mode("overwrite").parquet(
            _os.path.join(graph_path, f"batch_id={batch_id}")
        )
        dele.write.mode("overwrite").parquet(
            _os.path.join(del_path, f"batch_id={batch_id}")
        )

    return (
        del_stream.writeStream.foreachBatch(process_batch)
        .outputMode("append")
        .option(
            "checkpointLocation",
            _os.path.join(state_dir, "_checkpoint_delete"),
        )
        .trigger(availableNow=True)
        .start()
    )


def read_graph_state(
    spark: SparkSession, state_dir: str, id_col: str = "vec_id"
) -> DataFrame:
    """Resolve the current adjacency from a :func:`graph_insert_sink` /
    :func:`graph_delete_sink` state dir — latest-wins per src across
    batch partitions, minus tombstoned srcs (when a ``deleted`` table
    exists; insert-only state dirs from older runs read unchanged)."""
    import os as _os

    raw = spark.read.parquet(_os.path.join(state_dir, "graph"))
    latest = raw.groupBy("src").agg(F.max("batch_id").alias("batch_id"))
    cur = raw.join(latest, ["src", "batch_id"]).select(
        "src", "dst", "cos_sim", "rank"
    )
    try:
        d = (
            spark.read.parquet(_os.path.join(state_dir, "deleted"))
            .select(id_col)
            .distinct()
            .withColumnRenamed(id_col, "_did")
        )
    except Exception:
        return cur
    return cur.join(d, cur.src == F.col("_did"), "left_anti")


def vacuum_graph_state(spark: SparkSession, state_dir: str,
                       id_col: str = "vec_id",
                       respect_checkpoints: bool = True) -> dict:
    """OFFLINE compaction of a :func:`graph_insert_sink` /
    :func:`graph_delete_sink` state dir — the "compact periodically"
    step the sink docstrings promise: every micro-batch leaves one
    partition per table, and after N batches each read resolves
    latest-wins across N partitions and anti-joins O(total deletes)
    tombstones. Vacuum folds all three tables back to their seed
    partitions:

    - ``graph``   → the RESOLVED adjacency (latest-wins, tombstones
      applied) at ``batch_id=-1``;
    - ``vectors`` → the ALIVE corpus (tombstones applied, duplicates
      dropped) at ``batch_id=-1``;
    - ``deleted`` → EMPTY — valid only because both consumers were
      compacted with the tombstones already applied, which is why this
      table is cleared LAST.

    After vacuum the state reads exactly as before (pinned by the
    vacuum≡no-vacuum continuation pytest) but every read touches one
    partition per table and zero tombstones, and a restarted sink's
    init finds committed seeds (no re-seed, so vacuum can never
    resurrect deleted base vectors).

    Contract (see :func:`~wasaffi_spark.streaming.state.
    compact_into_seed`): run while no sink query is active; if it
    crashes, re-run to completion before restarting the sink. Ordering
    inside: both data tables finish before tombstones clear, so any
    crash leaves tombstones masking whatever stale rows remain.

    Replay safety (ADVICE r10): "no sink query active" does NOT imply
    "no pending replay" — a sink can stop with a batch's state writes
    landed but its checkpoint commit missing, and that batch re-fires
    on restart. With ``respect_checkpoints`` (the default) the fold
    stops at the smallest :func:`~wasaffi_spark.streaming.state.
    last_committed_batch` across the state dir's sink checkpoints
    (``_checkpoint`` — insert — and ``_checkpoint_delete``): pending
    partitions keep their own batch ids so the replay's
    ``batch_id < current`` pre-state exclusion stays correct, and
    tombstones are CLEARED only when nothing stays unfolded (otherwise
    the folded prefix's tombstones are kept in the ``deleted`` seed —
    anti-joins are idempotent, so keeping them is never wrong, only
    less compact). Set ``respect_checkpoints=False`` only for state
    built by batch seeding alone (no sink ever ran).

    Returns ``{"graph": folded, "vectors": folded, "deleted": folded}``.
    """
    import os as _os

    from .state import (
        _batch_parts,
        compact_into_seed,
        heal_seed,
        last_committed_batch,
    )

    tables = ("graph", "vectors", "deleted")
    for t in tables:
        heal_seed(spark, _os.path.join(state_dir, t))
    cutoff = None
    if respect_checkpoints:
        jvm = spark._jvm
        hconf = spark._jsc.hadoopConfiguration()
        cuts = []
        for ck in ("_checkpoint", "_checkpoint_delete"):
            p = jvm.org.apache.hadoop.fs.Path(_os.path.join(state_dir, ck))
            if p.getFileSystem(hconf).exists(p):
                cuts.append(
                    last_committed_batch(
                        spark, _os.path.join(state_dir, ck)
                    )
                )
        if cuts:
            cutoff = min(cuts)
    # "after every folded batch": resolve the foldable prefix only
    bound = (1 << 62) if cutoff is None else cutoff + 1
    adj = _read_adjacency_at(spark, state_dir, bound, id_col)
    vecs = _read_vectors_at(spark, state_dir, bound, id_col).distinct()
    unfolded = cutoff is not None and any(
        b > cutoff
        for t in tables
        for b in _batch_parts(spark, _os.path.join(state_dir, t))
    )
    if unfolded:
        dele = (
            spark.read.parquet(_os.path.join(state_dir, "deleted"))
            .where(F.col("batch_id") < bound)
            .select(id_col)
            .distinct()
        )
    else:
        dele = spark.createDataFrame([], f"{id_col} bigint")
    out = {
        "graph": compact_into_seed(
            spark, _os.path.join(state_dir, "graph"), adj,
            max_committed_batch_id=cutoff,
        ),
        "vectors": compact_into_seed(
            spark, _os.path.join(state_dir, "vectors"), vecs,
            max_committed_batch_id=cutoff,
        ),
        "deleted": compact_into_seed(
            spark, _os.path.join(state_dir, "deleted"), dele,
            max_committed_batch_id=cutoff,
        ),
    }
    return out
