"""Index-bundle export/import — the train→serve handoff.

At 100 TB the index is built and maintained by the batch/streaming
pipeline but SERVED by a different fleet; the handoff artifact is a
versioned directory of the serving state (frozen codebook, postings,
graph adjacency, tombstones) plus a MANIFEST that makes the copy
verifiable: per-component row counts and two order-independent content
signatures over per-row md5 prefixes (bit_xor — the
:func:`~wasaffi_spark.operators.diff.dataset_manifest` technique — plus
a modular-sum lane, which catches the even-multiplicity substitutions
xor alone cancels on). The importer recomputes all three and refuses a
bundle that does not match — a truncated copy, a partially replicated
object-store prefix, or a post-export mutation all surface as a loud
error instead of silently degraded recall. This is CORRUPTION
detection, not a MAC: whoever can rewrite a component can rewrite the
adjacent manifest too; keyed authenticity is out of scope.

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
    """(n_rows, content_sig, content_sum) for one component: bit_xor
    AND overflow-wrapping sum over 60-bit md5 prefixes of the
    canonicalized row (column order fixed by sorting names, so export
    and import agree whatever the projection order).

    Why two aggregates: xor alone is blind to even-multiplicity
    substitutions (swap a duplicated row pair A,A for C,C and both the
    count and the xor survive — ADVICE r10); the additive lane breaks
    that cancellation for a few cents, since sum{A,A} ≠ sum{C,C}
    whenever the hashes differ. This is CORRUPTION detection
    (truncation, partial object-store replication, bit rot, post-export
    mutation), not a cryptographic MAC — an adversary who can write the
    component can also rewrite the manifest next to it; authenticity
    needs a key, which is out of scope for the handoff artifact."""
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
    # The additive lane sums two 30-bit halves separately and folds
    # each mod 2^30 — overflow-safe past 8 billion rows per component
    # (a raw sum of 60-bit values overflows bigint at ~16 rows), still
    # one ordinary partial-aggregating sum, and shuffle-order free.
    lane = F.lit((1 << 30) - 1)
    lo = F.pmod(
        F.coalesce(F.sum(F.col("_h").bitwiseAND(lane)), F.lit(0)),
        F.lit(1 << 30),
    )
    hi = F.pmod(
        F.coalesce(F.sum(F.shiftright("_h", 30)), F.lit(0)),
        F.lit(1 << 30),
    )
    return df.select(h.alias("_h")).agg(
        F.count("*").alias("n_rows"),
        F.coalesce(F.bit_xor("_h"), F.lit(0)).alias("content_sig"),
        (lo + hi * F.lit(1 << 30)).alias("content_sum"),
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
        rows.append((name, r["n_rows"], r["content_sig"], r["content_sum"]))
    man = spark.createDataFrame(
        rows,
        "component string, n_rows bigint, content_sig bigint, "
        "content_sum bigint",
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
        r["component"]: (r["n_rows"], r["content_sig"], r["content_sum"])
        for r in spark.read.parquet(
            os.path.join(bundle_dir, "MANIFEST")
        ).collect()
    }
    out: dict[str, DataFrame] = {}
    for name, want in sorted(man.items()):
        df = spark.read.parquet(os.path.join(bundle_dir, name))
        if verify:
            g = _component_sig(df).first()
            got = (g["n_rows"], g["content_sig"], g["content_sum"])
            if got != want:
                raise BundleIntegrityError(
                    f"component '{name}': manifest says (n_rows, sig, "
                    f"sum)={want}, bundle holds {got}"
                )
        out[name] = df
    return out


def index_maintenance_policy(
    monitors: dict[str, DataFrame],
    thresholds: dict[str, tuple[int, int]],
    actions: dict[str, tuple[str, str, str]] | None = None,
) -> DataFrame:
    """The gauge→action rule that closes the index-maintenance loop
    (VERDICT r10 What's-missing #3): consume the nightly recall
    monitors' per-query output — ``{family: DataFrame(qid, hits, k)}``
    from ``graph_recall_monitor`` / ``ivf_recall_monitor``
    (:func:`~wasaffi_spark.operators.similarity.recall_at_k`) — and
    emit ONE decision row per family carrying the reading that
    triggered it.

    ``thresholds[family] = (healthy_bp, floor_bp)`` in integer basis
    points of recall@k; ``actions[family] = (ok, degraded, floor)``
    names the three rungs (defaults: graph → noop / refresh / rebuild,
    matching SCALE.md's maintenance ladder — a warm
    ``graph_refresh`` closes the maintained-vs-rebuilt gap, a cold
    rebuild is the floor escape; ivf → noop / raise_n_probe / retrain,
    since IVF maintenance is exact and its gauge isolates pure probe
    loss, see ANN_RECALL.json's n_probe ladder).

    Integer-exact by construction: the reading is
    ``recall_bp = (10000 · Σhits) div (n_queries · k)`` — no floats
    anywhere, so the whole policy is hash-oracled next to the gauges
    themselves. Output: (family, n_queries, total_hits, k, recall_bp,
    healthy_bp, floor_bp, decision), ordered by family.

    Scale: each monitor aggregate is O(Q) rows → one global agg; the
    decision frame is O(families) rows. The expensive part — the
    gauges — already ran; the policy adds nothing data-proportional.
    """
    defaults = {
        "graph": ("noop", "refresh", "rebuild"),
        "ivf": ("noop", "raise_n_probe", "retrain"),
    }
    acts = {**defaults, **(actions or {})}
    out = None
    for family in sorted(monitors):
        healthy_bp, floor_bp = thresholds[family]
        ok, degraded, floor = acts.get(
            family, ("noop", "degraded", "floor")
        )
        reading = monitors[family].agg(
            F.count("*").alias("n_queries"),
            F.coalesce(F.sum("hits"), F.lit(0))
            .cast("bigint")
            .alias("total_hits"),
            F.max("k").cast("bigint").alias("k"),
        )
        row = reading.select(
            F.lit(family).alias("family"),
            "n_queries",
            "total_hits",
            "k",
            F.expr("(10000 * total_hits) div (n_queries * k)").alias(
                "recall_bp"
            ),
            F.lit(healthy_bp).cast("bigint").alias("healthy_bp"),
            F.lit(floor_bp).cast("bigint").alias("floor_bp"),
        ).withColumn(
            "decision",
            F.when(F.col("recall_bp") >= F.col("healthy_bp"), F.lit(ok))
            .when(F.col("recall_bp") >= F.col("floor_bp"), F.lit(degraded))
            .otherwise(F.lit(floor)),
        )
        out = row if out is None else out.unionByName(row)
    if out is None:
        raise ValueError("index_maintenance_policy: no monitors given")
    return out.orderBy("family")


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
        F.col("content_sum").alias("_sum_a"),
    )
    b = spark.read.parquet(os.path.join(bundle_b, "MANIFEST")).select(
        "component",
        F.col("n_rows").alias("n_rows_b"),
        F.col("content_sig").alias("_sig_b"),
        F.col("content_sum").alias("_sum_b"),
    )
    j = a.join(b, "component", "full_outer")
    status = (
        F.when(F.col("_sig_a").isNull(), F.lit("added"))
        .when(F.col("_sig_b").isNull(), F.lit("removed"))
        .when(
            (F.col("_sig_a") == F.col("_sig_b"))
            & (F.col("_sum_a") == F.col("_sum_b"))
            & (F.col("n_rows_a") == F.col("n_rows_b")),
            F.lit("unchanged"),
        )
        .otherwise(F.lit("changed"))
    )
    return j.select(
        "component", status.alias("status"), "n_rows_a", "n_rows_b"
    ).orderBy("component")
