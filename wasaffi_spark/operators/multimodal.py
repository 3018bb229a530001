"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Beyond-reference extension (SURVEY §7.6). Images/audio/video are carried
as ``binary`` columns with a typed metadata struct; feature extraction
runs as Arrow-batched ``mapInPandas`` so each worker processes whole
record batches (the same batch-at-a-time execution shape as the
reference's WASM boundary, /root/reference/wasmedge_factory/src/udf.rs:82-115).

The decode step is STUBBED (no image/audio libs in this container):
:func:`decode_image` raises ``NotImplementedError`` unless PIL is
importable, and the shipped feature extractor computes deterministic
byte-level features (length, md5 digest, leading-byte stats) so the
Spark-side plumbing — schema, batch iteration, partitioning — is real
and oracle-checkable end-to-end.

Scale: ``mapInPandas`` is embarrassingly parallel (no shuffle); payload
partitions should be sized by bytes (``spark.sql.files.maxPartitionBytes``)
since media rows are wide.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id bigint, media_type string, payload binary, "
    "meta struct<source:string, n_bytes:bigint>"
)


def ingest_as_media(
    df: DataFrame, payload_from: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Wrap a column as an opaque media payload with typed metadata.

    (The fixtures have no real image bytes; encoding the text column
    yields a deterministic binary payload with the same plumbing.)
    """
    payload = F.encode(F.col(payload_from), "UTF-8")
    return df.select(
        F.col(id_col),
        F.lit("text/plain").alias("media_type"),
        payload.alias("payload"),
        F.struct(
            F.col("source").alias("source"),
            F.length(payload).cast("bigint").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_image(payload: bytes):
    """Decode an image payload → (width, height, mode).

    STUB: real decode needs an imaging library that is not installed in
    this environment; the Spark-side plumbing around it is real.
    """
    try:
        import io

        from PIL import Image  # type: ignore
    except ImportError as e:  # pragma: no cover - PIL absent by design
        raise NotImplementedError(
            "image decode requires Pillow, which is not installed; "
            "byte-level features remain available via extract_features()"
        ) from e
    img = Image.open(io.BytesIO(payload))  # pragma: no cover
    return img.width, img.height, img.mode  # pragma: no cover


def extract_features(media: DataFrame, carry_cols: tuple[str, ...] = ()) -> DataFrame:
    """Byte-level features per payload via ``mapInPandas`` (no shuffle).

    ``carry_cols`` (any columns of ``media``, e.g. flattened metadata)
    pass through the batch function unchanged with their ACTUAL types —
    avoiding a join-back shuffle when feature rows need their metadata
    alongside.

    The batch function is defined inline so cloudpickle ships it BY
    VALUE — executors do not need ``wasaffi_spark`` installed (same
    posture as ``udf_runtime.build_pandas_udf``).
    """
    carry = tuple(carry_cols)
    schema = (
        "doc_id bigint, "
        + "".join(
            f"{c} {media.schema[c].dataType.simpleString()}, " for c in carry
        )
        + "n_bytes bigint, digest string, head_byte int"
    )

    def feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import pandas as _pd

        for pdf in batches:
            payloads = pdf["payload"]
            out = {"doc_id": pdf["doc_id"]}
            for c in carry:
                out[c] = pdf[c]
            out["n_bytes"] = payloads.map(len).astype("int64")
            out["digest"] = payloads.map(lambda b: hashlib.md5(b).hexdigest())
            out["head_byte"] = payloads.map(
                lambda b: b[0] if len(b) else -1
            ).astype("int32")
            yield _pd.DataFrame(out)

    return media.select("doc_id", *carry, "payload").mapInPandas(
        feature_batches, schema=schema
    )
