"""Property tests for the round-5 operators: each checked against an
independent pure-Python reference model on randomized inputs (the
hypothesis-style oracle-free layer — cross-engine DuckDB parity already
lives in tools/oracle_check.py; these pin the SEMANTICS against a
second implementation nobody optimized)."""

from __future__ import annotations

import itertools
import math
import random

from pyspark.sql import functions as F


def test_triangles_match_bruteforce_on_random_graphs(spark):
    from wasaffi_spark.operators.graph import triangle_count

    rng = random.Random(11)
    for trial in range(3):
        n = 14
        edges = [
            (a, b)
            for a in range(n)
            for b in range(n)
            if a != b and rng.random() < 0.3
        ]
        if not edges:
            continue
        df = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
        got = {r.node: r.n_triangles for r in triangle_count(df).collect()}
        es = {frozenset(e) for e in edges if e[0] != e[1]}
        want: dict[int, int] = {}
        for x, y, z in itertools.combinations(range(n), 3):
            if {
                frozenset((x, y)), frozenset((y, z)), frozenset((x, z))
            } <= es:
                for v in (x, y, z):
                    want[v] = want.get(v, 0) + 1
        assert got == want, trial


def test_ewma_matches_python_reference(spark):
    from wasaffi_spark.operators.temporal import ewma

    rng = random.Random(23)
    rows = [
        (i, rng.randrange(4), round(rng.uniform(-50, 50), 3))
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "event_id bigint, user_id bigint, value double")
    got = {(r.user_id, r.event_id): r.ewma_micro for r in ewma(df).collect()}
    state: dict[int, int] = {}
    want = {}
    for eid, uid, val in rows:  # already event_id-ordered
        q = math.floor(val * 1_000_000 + 0.5)
        s = q if uid not in state else math.floor(
            (30 * q + 70 * state[uid]) / 100
        )
        state[uid] = s
        want[(uid, eid)] = s
    assert got == want


def test_rrf_fusion_matches_python_reference(spark):
    from wasaffi_spark.operators.retrieval import rrf_fuse

    rng = random.Random(7)
    sources = []
    model: dict[tuple[str, int], list[int]] = {}
    for _ in range(3):
        rows = []
        for q in ("a", "b"):
            docs = rng.sample(range(40), 10)
            for rank, d in enumerate(docs, start=1):
                rows.append((q, d, rank))
                model.setdefault((q, d), []).append(rank)
        sources.append(
            spark.createDataFrame(
                rows, "query_id string, doc_id bigint, rank int"
            )
        )
    got = {
        (r.query_id, r.doc_id): (r.rrf_micro, r.n_sources, r.rank)
        for r in rrf_fuse(sources, topk=5).collect()
    }
    scores = {
        key: (sum(10**9 // (60 + r) for r in ranks), len(ranks))
        for key, ranks in model.items()
    }
    for q in ("a", "b"):
        per_q = sorted(
            ((s, -d) for (qq, d), (s, _) in scores.items() if qq == q),
            reverse=True,
        )[:5]
        for rank, (s, negd) in enumerate(per_q, start=1):
            d = -negd
            assert got[(q, d)] == (s, scores[(q, d)][1], rank)


def test_expectations_match_pandas_reference(spark):
    import pandas as pd

    from wasaffi_spark.operators.expect import expectations_report

    rng = random.Random(99)
    rows = [
        (
            rng.choice([None] + list(range(8))),
            rng.choice([None, -3.0, 0.0, 5.5, 120.0]),
            rng.choice(["O", "F", "P", "X", None]),
        )
        for _ in range(200)
    ]
    df = spark.createDataFrame(rows, "k bigint, price double, st string")
    pdf = pd.DataFrame(rows, columns=["k", "price", "st"])
    rules = [
        {"kind": "not_null", "column": "k"},
        {"kind": "range", "column": "price", "min": 0, "max": 100},
        {"kind": "accepted_values", "column": "st", "values": ["O", "F", "P"]},
        {"kind": "unique", "column": "k"},
    ]
    rep = {
        r.rule: (r.n_violations, r.n_checked)
        for r in expectations_report(df, rules).collect()
    }
    n = len(pdf)
    assert rep["k_not_null"] == (int(pdf["k"].isna().sum()), n)
    pr = pdf["price"]
    assert rep["price_range"] == (
        int(((pr < 0) | (pr > 100)).sum()), n  # NaN compares False: exempt
    )
    assert rep["st_accepted_values"] == (
        int((~pdf["st"].isin(["O", "F", "P"]) & pdf["st"].notna()).sum()), n
    )
    vc = pdf["k"].dropna().value_counts()
    assert rep["k_unique"] == (
        int((vc[vc > 1] - 1).sum()), int(vc.sum())
    )


def test_containment_matches_python_reference(spark):
    from wasaffi_spark.operators.dedup import SHINGLE_K, containment_pairs

    rng = random.Random(5)
    vocab = [f"w{i}" for i in range(12)]
    rows = [
        (i, " ".join(rng.choices(vocab, k=rng.randrange(2, 30))), "en")
        for i in range(14)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    got = {
        (r.id_src, r.id_dst): r.containment
        for r in containment_pairs(df, threshold=0.3).collect()
    }

    def shingles(t: str) -> set[str]:
        w = t.lower().split()
        return {
            " ".join(w[i : i + SHINGLE_K])
            for i in range(len(w) - SHINGLE_K + 1)
        }

    sh = {i: shingles(t) for i, t, _ in rows}
    want = {}
    for a, b in itertools.permutations(sh, 2):
        if not sh[a]:
            continue
        inter = len(sh[a] & sh[b])
        c = round(inter / len(sh[a]), 6)
        if c >= 0.3 and inter:
            want[(a, b)] = c
    assert got == want
