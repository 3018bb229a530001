"""Round-3 operators: snapshot diff, hourly gap-fill, novelty score."""

from __future__ import annotations

import datetime

import pytest

from wasaffi_spark.operators import diff as diffmod
from wasaffi_spark.operators import temporal, text


def test_snapshot_diff_classifies_all_four_states(spark):
    a = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma"), (4, None)],
        "doc_id bigint, text string",
    )
    b = spark.createDataFrame(
        [(1, "alpha"), (2, "BETA"), (5, "new"), (4, None)],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r["status"] for r in diffmod.snapshot_diff(a, b).collect()}
    assert got == {
        1: "unchanged",
        2: "changed",
        3: "removed",
        4: "unchanged",  # NULL == NULL under the fingerprint sentinel
        5: "added",
    }
    summary = {
        r["status"]: r["cnt"]
        for r in diffmod.diff_summary(diffmod.snapshot_diff(a, b)).collect()
    }
    assert summary == {"unchanged": 2, "changed": 1, "removed": 1, "added": 1}


def test_snapshot_diff_null_vs_empty_not_confused(spark):
    a = spark.createDataFrame([(1, None)], "doc_id bigint, text string")
    b = spark.createDataFrame([(1, "")], "doc_id bigint, text string")
    [r] = diffmod.snapshot_diff(a, b).collect()
    assert r["status"] == "changed"


def test_gapfill_zero_fills_and_carries_last_sum(spark):
    t0 = datetime.datetime(2024, 1, 1, 0, 30)

    def ev(h, val):
        return (t0 + datetime.timedelta(hours=h), "click", val)

    rows = [ev(0, 1.0), ev(0, 2.0), ev(3, 5.0)]  # hours 1,2 are gaps
    events = spark.createDataFrame(
        rows, "ts timestamp, event_type string, value double"
    )
    out = {
        r["hour"].hour: r
        for r in temporal.gapfill_hourly(
            events, key_col="event_type"
        ).collect()
    }
    assert sorted(out) == [0, 1, 2, 3]  # densified onto the full spine
    assert (out[0]["cnt"], out[0]["last_sum"]) == (2, 3.0)
    assert (out[1]["cnt"], out[1]["last_sum"]) == (0, 3.0)  # gap: locf
    assert (out[2]["cnt"], out[2]["last_sum"]) == (0, 3.0)
    assert (out[3]["cnt"], out[3]["last_sum"]) == (1, 5.0)


def test_gapfill_leading_gap_is_null_not_zero(spark):
    t0 = datetime.datetime(2024, 1, 1, 0, 0)
    events = spark.createDataFrame(
        [
            (t0, "a", 1.0),
            (t0 + datetime.timedelta(hours=2), "b", 7.0),
        ],
        "ts timestamp, event_type string, value double",
    )
    rows = temporal.gapfill_hourly(events).collect()
    by = {(r["key"], r["hour"].hour): r for r in rows}
    # series b exists on the global spine before its first observation:
    # cnt densifies to 0 but last_sum has nothing to carry yet
    assert by[("b", 0)]["cnt"] == 0 and by[("b", 0)]["last_sum"] is None
    assert by[("b", 2)]["last_sum"] == 7.0
    # series a carries its hour-0 sum across its trailing gap
    assert by[("a", 2)]["cnt"] == 0 and by[("a", 2)]["last_sum"] == 1.0


def test_novelty_score_planted(spark):
    shared = "one two three four"  # shingles shared by docs 1 and 2
    docs = spark.createDataFrame(
        [
            (1, shared),
            (2, shared + " five"),  # adds one novel shingle
            (3, "totally different words here"),
            (4, "xy"),  # < k words: no shingles
        ],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r for r in text.novelty_score(docs).collect()}
    # doc 1: shingles {one two three, two three four} both shared → 0
    assert got[1]["n_shingles"] == 2 and got[1]["novelty"] == 0.0
    # doc 2: 3 shingles, one novel (three four five)
    assert got[2]["n_shingles"] == 3
    assert got[2]["n_novel"] == 1
    assert got[2]["novelty"] == pytest.approx(1 / 3, abs=1e-6)
    # doc 3: everything novel
    assert got[3]["novelty"] == 1.0
    # doc 4: no shingles → counts 0, score NULL
    assert got[4]["n_shingles"] == 0 and got[4]["novelty"] is None


def test_interval_overlap_join_exact(spark):
    mk = lambda h, m=0: datetime.datetime(2024, 1, 1, h, m)  # noqa: E731
    left = spark.createDataFrame(
        [
            (1, mk(0), mk(5)),     # overlaps r1, r2
            (1, mk(10), mk(11)),   # overlaps r3 only at the boundary
            (2, mk(0), mk(23, 59)),  # long interval, many bins, no match
        ],
        "user_id bigint, start timestamp, end timestamp",
    )
    right = spark.createDataFrame(
        [
            (1, mk(1), mk(2), "r1"),
            (1, mk(4, 30), mk(6), "r2"),   # partial overlap
            (1, mk(11), mk(12), "r3"),     # closed-interval boundary touch
            (1, mk(6), mk(7), "r4"),       # gap — no overlap
            (3, mk(0), mk(1), "r5"),       # different key
        ],
        "user_id bigint, start timestamp, end timestamp, tag string",
    )
    from wasaffi_spark.operators.temporal import interval_overlap_join

    got = sorted(
        (r["user_id"], r["tag"])
        for r in interval_overlap_join(
            left, right, on="user_id",
            left_start="start", left_end="end",
            right_start="start", right_end="end",
        ).collect()
    )
    assert got == [(1, "r1"), (1, "r2"), (1, "r3")]


def test_interval_overlap_no_bin_duplicates(spark):
    # an interval pair sharing many bins must still appear exactly once
    t0 = datetime.datetime(2024, 1, 1)
    week = datetime.timedelta(days=7)
    left = spark.createDataFrame(
        [(1, t0, t0 + week)], "user_id bigint, start timestamp, end timestamp"
    )
    right = spark.createDataFrame(
        [(1, t0, t0 + week, "x")],
        "user_id bigint, start timestamp, end timestamp, tag string",
    )
    from wasaffi_spark.operators.temporal import interval_overlap_join

    rows = interval_overlap_join(
        left, right, on="user_id",
        left_start="start", left_end="end",
        right_start="start", right_end="end",
    ).collect()
    assert len(rows) == 1


def test_temperature_mixture_keeps_rare_flattens_head(spark):
    from wasaffi_spark.operators.pipeline import temperature_mixture

    rows = [(i, "en" if i < 900 else "fr") for i in range(1000)]
    docs = spark.createDataFrame(rows, "doc_id bigint, lang string")
    out = temperature_mixture(docs, alpha=0.5).groupBy("lang").count()
    counts = {r["lang"]: r["count"] for r in out.collect()}
    # the smallest domain keeps everything
    assert counts["fr"] == 100
    # head domain downsampled by (100/900)^0.5 ≈ 0.333 → ~300 of 900
    assert 240 <= counts["en"] <= 360
    # deterministic across invocations
    out2 = temperature_mixture(docs, alpha=0.5).groupBy("lang").count()
    assert counts == {r["lang"]: r["count"] for r in out2.collect()}


def test_pq_encode_self_codes_and_determinism(spark):
    import hashlib

    from wasaffi_spark.operators.similarity import PQ_SEED, pq_encode

    # 3 well-separated 8-dim vectors; with ≤16 vectors every vector is
    # its own codeword, so each row's code in every subspace must be its
    # own hash rank (m=2 subspaces of 4 dims).
    vecs = {
        1: [1.0, 0.0, 0.0, 0.0, 5.0, 5.0, 5.0, 5.0],
        2: [0.0, 1.0, 0.0, 0.0, -5.0, -5.0, -5.0, -5.0],
        3: [0.0, 0.0, 1.0, 0.0, 9.0, -9.0, 9.0, -9.0],
    }
    rank = {
        vid: r
        for r, vid in enumerate(
            sorted(vecs, key=lambda v: (hashlib.md5(f"{PQ_SEED}{v}".encode()).hexdigest(), v))
        )
    }
    df = spark.createDataFrame(
        [(vid, v) for vid, v in vecs.items()],
        "vec_id bigint, embedding array<float>",
    )
    out = {r["vec_id"]: r for r in pq_encode(df, dim=8, m=2, k=16).collect()}
    for vid in vecs:
        assert out[vid]["c0"] == rank[vid], (vid, rank)
        assert out[vid]["c1"] == rank[vid]
    # determinism across invocations
    out2 = {r["vec_id"]: r for r in pq_encode(df, dim=8, m=2, k=16).collect()}
    assert {k: tuple(v) for k, v in out.items()} == {
        k: tuple(v) for k, v in out2.items()
    }


def test_scd2_merge_three_branches(spark):
    from pyspark.sql import functions as F

    from wasaffi_spark.operators.merge import scd2_merge

    t = lambda s: datetime.datetime.fromisoformat(s)  # noqa: E731
    history = spark.createDataFrame(
        [
            # k=1: one closed + one current version (will change again)
            (1, "v1", t("2023-01-01"), t("2023-06-01"), False),
            (1, "v2", t("2023-06-01"), None, True),
            # k=2: current, unchanged in source
            (2, "stable", t("2023-01-01"), None, True),
            # k=3: current, absent from source → stays open
            (3, "lonely", t("2023-01-01"), None, True),
        ],
        "k bigint, val string, valid_from timestamp, valid_to timestamp, is_current boolean",
    )
    source = spark.createDataFrame(
        [(1, "v3"), (2, "stable"), (4, "fresh")], "k bigint, val string"
    )
    load = F.to_timestamp(F.lit("2024-01-01 00:00:00"))
    out = scd2_merge(history, source, ["k"], ["val"], load)
    rows = sorted(
        (r["k"], r["val"], r["is_current"], r["valid_to"] is None)
        for r in out.collect()
    )
    assert rows == [
        (1, "v1", False, False),   # closed history untouched
        (1, "v2", False, False),   # changed current → closed at load
        (1, "v3", True, True),     # new version opens
        (2, "stable", True, True),  # unchanged passes through
        (3, "lonely", True, True),  # absent from source stays open
        (4, "fresh", True, True),   # brand-new key opens
    ]
    # exactly one current row per live key
    cur = out.where("is_current").groupBy("k").count().collect()
    assert all(r["count"] == 1 for r in cur)
    # the closed v2 row records the load timestamp
    [v2] = [r for r in out.collect() if r["val"] == "v2"]
    assert v2["valid_to"] == t("2024-01-01")


def test_pq_topk_recall_vs_bruteforce(spark):
    """ADC over 8-nibble codes is approximate; on clustered synthetic
    data it should still place most true top-3 neighbours in its top-3
    (codes collapse 64 dims to 8 codewords, so demand recall ≥ 0.5,
    not perfection) — and planted exact duplicates MUST be found at
    distance 0."""
    import random

    from wasaffi_spark.operators.similarity import brute_force_topk, pq_topk

    rng = random.Random(7)
    centers = [[rng.uniform(-1, 1) for _ in range(64)] for _ in range(4)]
    rows = []
    for i in range(80):
        c = centers[i % 4]
        rows.append((i, [x + rng.uniform(-0.05, 0.05) for x in c]))
    # planted exact duplicates of vectors 0..3 under new ids
    for i in range(4):
        rows.append((100 + i, list(rows[i][1])))
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    probes = emb.where("vec_id < 4")

    pq = pq_topk(probes, emb, k=3)
    got = {(r["qid"], r["nid"]) for r in pq.collect()}
    # each probe's exact duplicate is its nearest code-identical match
    dup_hits = {(q, q + 100) for q in range(4)}
    assert dup_hits <= got
    bf = brute_force_topk(probes, emb, k=3)
    want = {(r["qid"], r["nid"]) for r in bf.collect()}
    recall = len(got & want) / len(want)
    assert recall >= 0.5, (recall, got, want)


def test_fuzzy_pairs_blocked_levenshtein(spark):
    from wasaffi_spark.operators.linkage import fuzzy_pairs

    recs = spark.createDataFrame(
        [
            (1, "acme corp", "b1"),
            (2, "acme corp.", "b1"),    # dist 1 → pair
            (3, "acme corporation", "b1"),  # dist to 1 = 7, sim 9/16 < 0.7
            (4, "zzz totally other", "b1"),
            (5, "acme corp", "b2"),     # same name, different block: no pair
        ],
        "rid bigint, name string, blk string",
    )
    got = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in fuzzy_pairs(
            recs, id_col="rid", name_col="name", block_cols=["blk"],
            max_dist=5, min_sim=0.7,
        ).collect()
    }
    assert got == {(1, 2, 1)}


def test_fuzzy_pairs_sim_normalization(spark):
    from wasaffi_spark.operators.linkage import fuzzy_pairs

    recs = spark.createDataFrame(
        [(1, "abcd", "x"), (2, "abce", "x")], "rid bigint, name string, blk string"
    )
    [r] = fuzzy_pairs(
        recs, id_col="rid", name_col="name", block_cols=["blk"],
        max_dist=5, min_sim=0.0,
    ).collect()
    assert r["dist"] == 1 and r["sim"] == 0.75


def test_ngram_span_dedup_planted(spark):
    from wasaffi_spark.operators.dedup import ngram_span_dedup

    span = "a b c d"  # the k=4 window planted in three docs
    docs = spark.createDataFrame(
        [
            (1, f"{span} tail1 tail2"),      # first occurrence: keeps span
            (2, f"lead1 lead2 {span} x"),    # later copy: span removed
            (3, span),                        # exactly the span: empties out
            (4, "totally unrelated words"),   # untouched (< k or unique)
            (5, None),                        # NULL text → empty doc
        ],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r for r in ngram_span_dedup(docs, k=4).collect()}
    assert got[1]["dedup_text"] == "a b c d tail1 tail2"
    assert got[1]["n_removed"] == 0
    assert got[2]["dedup_text"] == "lead1 lead2 x"
    assert got[2]["n_removed"] == 4
    assert got[3]["dedup_text"] == "" and got[3]["n_removed"] == 4
    assert got[4]["dedup_text"] == "totally unrelated words"
    assert got[4]["n_removed"] == 0
    assert got[5]["n_removed"] == 0  # NULL → single empty token, kept


def test_ngram_span_dedup_overlapping_spans_union(spark):
    from wasaffi_spark.operators.dedup import ngram_span_dedup

    # doc 2 repeats doc 1's entire text: every k-window duplicates, all
    # of doc 2 is covered (overlapping windows union, not double-count)
    text = "w1 w2 w3 w4 w5 w6"
    docs = spark.createDataFrame(
        [(1, text), (2, text)], "doc_id bigint, text string"
    )
    got = {r["doc_id"]: r for r in ngram_span_dedup(docs, k=3).collect()}
    assert got[1]["n_removed"] == 0
    assert got[2]["dedup_text"] == "" and got[2]["n_removed"] == 6


def test_simhash_pairs_planted_neardup(spark):
    from wasaffi_spark.operators.dedup import simhash_pairs

    # deterministic fixtures (md5 end-to-end): at 300 shared tokens one
    # extra word flips no signature bit; at 100 it flips 4 — just over
    # the verify threshold, so that pair must be REJECTED.
    base300 = " ".join(f"tok{i}" for i in range(300))
    base100 = " ".join(f"tok{i}" for i in range(100))
    docs = spark.createDataFrame(
        [
            (1, base300),
            (2, base300 + " extraword"),   # hamming 0 → pair
            (3, " ".join(f"other{i}" for i in range(300))),  # unrelated
            (4, base100),
            (5, base100 + " extraword"),   # hamming 4 → filtered out
        ],
        "doc_id bigint, text string",
    )
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in simhash_pairs(docs).collect()}
    assert got.get((1, 2)) == 0
    assert (4, 5) not in got          # verify threshold enforced
    assert (1, 3) not in got and (2, 3) not in got


def test_mixture_epochs_upsamples_bounded(spark):
    from wasaffi_spark.operators.pipeline import mixture_epochs

    rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
    docs = spark.createDataFrame(rows, "doc_id bigint, lang string")
    out = mixture_epochs(docs, {"big": 0.5, "small": 0.5}, max_epochs=4)
    counts = {r["lang"]: r["count"] for r in out.groupBy("lang").count().collect()}
    # equal target weights: small (100 rows) upsamples toward big's
    # contribution but never beyond 4 epochs
    assert counts["small"] <= 4 * 100
    assert counts["small"] > 150  # genuinely upsampled (>1 epoch)
    # expected proportions within quantization tolerance
    ratio = counts["big"] / counts["small"]
    assert 0.8 <= ratio <= 1.25 or counts["small"] == 400
    # epoch index bounded and 1-based
    eps = {r["epoch"] for r in out.select("epoch").distinct().collect()}
    assert eps <= {1, 2, 3, 4} and 1 in eps
    # deterministic
    out2 = mixture_epochs(docs, {"big": 0.5, "small": 0.5}, max_epochs=4)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, out2.collect()))
