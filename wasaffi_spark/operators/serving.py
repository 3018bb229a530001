"""Index-bundle export/import — the train→serve handoff.

At 100 TB the index is built and maintained by the batch/streaming
pipeline but SERVED by a different fleet; the handoff artifact is a
versioned directory of the serving state (frozen codebook, postings,
graph adjacency, tombstones) plus a MANIFEST that makes the copy
verifiable: per-component row counts and an order-independent content
signature (bit_xor of per-row md5 prefixes — the
:func:`~wasaffi_spark.operators.diff.dataset_manifest` technique,
collapsed to one row per component). The importer recomputes both and
refuses a bundle that does not match — a truncated copy, a partially
replicated object-store prefix, or a post-export mutation all surface
as a loud error instead of silently degraded recall.

Everything is one aggregation pass per component (commutative
signature → shuffle-order free, engine-exact); the manifest itself is
O(components) rows. No driver-side data movement.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class BundleIntegrityError(RuntimeError):
    """The bundle's recomputed manifest does not match the stored one."""


def _component_sig(df: DataFrame) -> DataFrame:
    """(n_rows, content_sig) for one component: bit_xor over 60-bit md5
    prefixes of the canonicalized row (column order fixed by sorting
    names, so export and import agree whatever the projection order)."""
    cols = sorted(df.columns)
    content = F.md5(
        F.concat_ws(
            "\x01",
            *[
                F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
                for c in cols
            ],
        )
    )
    h = F.conv(F.substring(content, 1, 15), 16, 10).cast("bigint")
    return df.select(h.alias("_h")).agg(
        F.count("*").alias("n_rows"),
        F.coalesce(F.bit_xor("_h"), F.lit(0)).alias("content_sig"),
    )


def export_index_bundle(
    spark: SparkSession,
    out_dir: str,
    components: dict[str, DataFrame],
) -> DataFrame:
    """Write every component as parquet under ``out_dir/<name>`` and a
    ``MANIFEST`` table (component, n_rows, content_sig) the importer
    verifies against. Returns the manifest DataFrame.

    Array columns (embeddings, codebook vectors) are canonicalized by
    their string cast — stable within an engine, which is the contract
    here (the same engine reads the bundle back)."""
    if not components:
        raise ValueError("export_index_bundle: no components given")
    rows = []
    for name, df in components.items():
        df.write.mode("overwrite").parquet(os.path.join(out_dir, name))
        # sign what was WRITTEN (read-back), not the input plan: the
        # manifest must certify the bytes on disk
        written = spark.read.parquet(os.path.join(out_dir, name))
        r = _component_sig(written).first()
        rows.append((name, r["n_rows"], r["content_sig"]))
    man = spark.createDataFrame(
        rows, "component string, n_rows bigint, content_sig bigint"
    )
    man.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out_dir, "MANIFEST")
    )
    return man


def read_index_bundle(
    spark: SparkSession,
    bundle_dir: str,
    verify: bool = True,
) -> dict[str, DataFrame]:
    """Load a bundle and (by default) verify every component against
    the stored manifest — recomputed row count AND content signature
    must both match, else :class:`BundleIntegrityError` names the
    offending component. Returns {component: DataFrame}."""
    man = {
        r["component"]: (r["n_rows"], r["content_sig"])
        for r in spark.read.parquet(
            os.path.join(bundle_dir, "MANIFEST")
        ).collect()
    }
    out: dict[str, DataFrame] = {}
    for name, (n_rows, sig) in sorted(man.items()):
        df = spark.read.parquet(os.path.join(bundle_dir, name))
        if verify:
            got = _component_sig(df).first()
            if (got["n_rows"], got["content_sig"]) != (n_rows, sig):
                raise BundleIntegrityError(
                    f"component '{name}': manifest says "
                    f"(n_rows={n_rows}, sig={sig}), bundle holds "
                    f"(n_rows={got['n_rows']}, sig={got['content_sig']})"
                )
        out[name] = df
    return out


def bundle_diff(
    spark: SparkSession,
    bundle_a: str,
    bundle_b: str,
) -> DataFrame:
    """Compare two bundles by their MANIFESTs alone — the O(components)
    answer to "what changed between last night's index and tonight's":
    one row per component with status ``added`` / ``removed`` /
    ``changed`` / ``unchanged`` and both sides' row counts. No
    component data is read (the manifests already certify content via
    their signatures), so diffing two 100 TB bundles costs two tiny
    manifest reads — the same trick :func:`~wasaffi_spark.operators.
    diff.manifest_diff` plays for dataset snapshots, applied to the
    serving handoff: ship only the ``changed`` components to the
    serving fleet."""
    a = spark.read.parquet(os.path.join(bundle_a, "MANIFEST")).select(
        "component",
        F.col("n_rows").alias("n_rows_a"),
        F.col("content_sig").alias("_sig_a"),
    )
    b = spark.read.parquet(os.path.join(bundle_b, "MANIFEST")).select(
        "component",
        F.col("n_rows").alias("n_rows_b"),
        F.col("content_sig").alias("_sig_b"),
    )
    j = a.join(b, "component", "full_outer")
    status = (
        F.when(F.col("_sig_a").isNull(), F.lit("added"))
        .when(F.col("_sig_b").isNull(), F.lit("removed"))
        .when(
            (F.col("_sig_a") == F.col("_sig_b"))
            & (F.col("n_rows_a") == F.col("n_rows_b")),
            F.lit("unchanged"),
        )
        .otherwise(F.lit("changed"))
    )
    return j.select(
        "component", status.alias("status"), "n_rows_a", "n_rows_b"
    ).orderBy("component")
