"""Property tests for the round-10 operators: randomized inputs checked
against pure-Python reference models nobody optimized (the semantics
layer — cross-engine DuckDB parity lives in tools/oracle_check.py)."""

from __future__ import annotations

import hashlib
import random

from pyspark.sql import functions as F


def _ref_compaction(rows, target):
    """Reference Next-Fit planner: rows = [(part, file_id, bytes)]."""
    out = {}
    by_part = {}
    for p, fid, b in rows:
        by_part.setdefault(p, []).append((fid, b))
    for p, files in by_part.items():
        cum = 0
        for fid, b in sorted(files):
            if b >= target:
                out[(p, fid)] = ("keep", None)
            else:
                out[(p, fid)] = ("pack", cum // target)
                cum += b
    return out


def test_compaction_plan_matches_reference_on_random_manifests(spark):
    from wasaffi_spark.operators.layout import compaction_plan

    rng = random.Random(31)
    for trial in range(4):
        target = rng.choice([64, 257, 1000])
        rows = [
            (p, fid, rng.randrange(1, 3 * target))
            for p in ("a", "b", "c")
            for fid in rng.sample(range(100), rng.randrange(1, 30))
        ]
        # shuffle input order: the plan must depend only on (part, id)
        rng.shuffle(rows)
        df = spark.createDataFrame(
            rows, "part string, file_id bigint, bytes bigint"
        )
        got = {
            (r.part, r.file_id): (r.action, r.bin)
            for r in compaction_plan(df, target).collect()
        }
        assert got == _ref_compaction(rows, target), (trial, target)


def _ref_admission(batch, seen_hashes):
    """Reference snapshot admission: batch = [(doc_id, lang, text)];
    returns the admitted (doc_id, text) keeper set."""
    fresh = {}
    for did, _lang, text in sorted(batch):
        h = hashlib.md5((text or "").encode()).hexdigest()
        if h in seen_hashes:
            continue
        if h not in fresh:
            fresh[h] = did
    return set(fresh.items())


def test_snapshot_admission_matches_reference_on_random_batches(spark):
    from wasaffi_spark.operators.pipeline import snapshot_admission

    rng = random.Random(47)
    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    for trial in range(4):
        texts = [
            " ".join(rng.choices(vocab, k=rng.randrange(1, 4)))
            for _ in range(10)
        ]
        base = [(i, "en", rng.choice(texts)) for i in range(8)]
        batch = [(100 + i, "en", rng.choice(texts)) for i in range(20)]
        seen = {
            hashlib.md5(t.encode()).hexdigest() for _, _, t in base
        }
        seen_df = spark.createDataFrame(
            [(hashlib.md5(t.encode()).hexdigest(),) for _, _, t in base],
            "text_hash string",
        )
        batch_df = spark.createDataFrame(
            batch, "doc_id bigint, lang string, text string"
        )
        _, _, fresh = snapshot_admission(batch_df, seen_df)
        got = {
            (r["_th"], r["doc_id"]) for r in fresh.collect()
        }
        want = {
            (h, did) for h, did in _ref_admission(batch, seen)
        }
        assert got == want, trial


def test_compaction_plan_handles_boundary_sizes(spark):
    """bytes == target is a keep (right-sized), bytes == target - 1
    packs; a zero-byte file packs into the current bin without
    advancing the cursor."""
    from wasaffi_spark.operators.layout import compaction_plan

    df = spark.createDataFrame(
        [("p", 0, 100), ("p", 1, 99), ("p", 2, 0), ("p", 3, 99)],
        "part string, file_id bigint, bytes bigint",
    )
    got = {
        r.file_id: (r.action, r.bin)
        for r in compaction_plan(df, 100).collect()
    }
    assert got == {
        0: ("keep", None),
        1: ("pack", 0),
        2: ("pack", 0),
        3: ("pack", 0),
    }
