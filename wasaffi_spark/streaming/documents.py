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
