"""Round-5 operator behavior on hand-computed micro-fixtures:
triangle counting, data-quality expectations, integer-exact EWMA.
(The DuckDB parity run at sf0.01 lives in tools/oracle_check.py —
these tests pin semantics the oracle can't isolate: rule violations
engineered per kind, exact EWMA values, triangle multiplicity.)"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_triangle_count_exact(spark):
    from wasaffi_spark.operators.graph import triangle_count

    # K4 on {1,2,3,4} (4 triangles, each node in 3) plus a pendant edge
    # (5,6) and a duplicate/reversed edge to exercise canonicalization
    edges = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
    edges += [(5, 6), (2, 1), (3, 3)]
    df = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    got = {r.node: r.n_triangles for r in triangle_count(df).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}  # 5, 6 close no triangle


def test_triangle_count_empty(spark):
    from wasaffi_spark.operators.graph import triangle_count

    df = spark.createDataFrame([(1, 2), (2, 3)], "id_a bigint, id_b bigint")
    assert triangle_count(df).collect() == []  # a path has no triangle


def test_expectations_each_kind_fires(spark):
    from wasaffi_spark.operators.expect import expectations_report

    rows = [
        (1, 10.0, "O", "1-URGENT"),
        (2, -5.0, "X", "9-BOGUS"),  # range + accepted + regex violations
        (None, None, None, None),  # not_null violation; exempt elsewhere
        (1, 0.0, "F", "5-LOW"),  # duplicate key
    ]
    df = spark.createDataFrame(rows, "k bigint, price double, st string, pr string")
    ref = spark.createDataFrame([(1,)], "rk bigint")
    rules = [
        {"kind": "not_null", "column": "k"},
        {"kind": "range", "column": "price", "min": 0},
        {"kind": "accepted_values", "column": "st", "values": ["O", "F"]},
        {"kind": "regex_match", "column": "pr", "pattern": "^[1-5]-"},
        {"kind": "unique", "column": "k"},
        {"kind": "referential", "column": "k", "ref": ref, "ref_column": "rk"},
    ]
    rep = {
        r.rule: (r.n_violations, r.n_checked, r.passed)
        for r in expectations_report(df, rules).collect()
    }
    assert rep["k_not_null"] == (1, 4, False)
    assert rep["price_range"] == (1, 4, False)  # NULL price exempt
    assert rep["st_accepted_values"] == (1, 4, False)
    assert rep["pr_regex_match"] == (1, 4, False)
    # k=1 twice -> 1 surplus copy; NULL key excluded from the check
    assert rep["k_unique"] == (1, 3, False)
    # k=2 is an orphan (ref has only 1); NULL FK exempt
    assert rep["k_referential"] == (1, 3, False)


def test_expectations_all_pass_and_unknown_kind(spark):
    from wasaffi_spark.operators.expect import expectations_report

    df = spark.createDataFrame([(1,), (2,)], "k bigint")
    rep = expectations_report(df, [{"kind": "not_null", "column": "k"}])
    row = rep.collect()[0]
    assert row.passed and row.n_violations == 0 and row.n_checked == 2
    with pytest.raises(ValueError, match="unknown rule kind"):
        expectations_report(df, [{"kind": "monotone", "column": "k"}])
    with pytest.raises(ValueError, match="empty rule set"):
        expectations_report(df, [])


def test_ewma_hand_computed(spark):
    from wasaffi_spark.operators.temporal import ewma

    # user 7: x = 1.0, 2.0, 3.0 (micro: 1e6, 2e6, 3e6)
    #   s1 = 1_000_000
    #   s2 = (30*2e6 + 70*1e6)//100 = 1_300_000
    #   s3 = (30*3e6 + 70*1_300_000)//100 = 1_810_000
    rows = [
        (1, 7, 1.0),
        (2, 7, 2.0),
        (3, 7, 3.0),
        (4, 9, 5.5),  # singleton: s = x
        (5, None, 1.0),  # NULL key excluded
        (6, 7, None),  # NULL value excluded (does not break the chain)
    ]
    df = spark.createDataFrame(rows, "event_id bigint, user_id bigint, value double")
    got = {
        (r.user_id, r.event_id): r.ewma_micro for r in ewma(df).collect()
    }
    assert got == {
        (7, 1): 1_000_000,
        (7, 2): 1_300_000,
        (7, 3): 1_810_000,
        (9, 4): 5_500_000,
    }


def test_ewma_order_and_layout_invariance(spark):
    from wasaffi_spark.operators.temporal import ewma

    rows = [(i, i % 3, float((i * 7) % 11) / 3.0) for i in range(60)]
    df = spark.createDataFrame(rows, "event_id bigint, user_id bigint, value double")
    a = sorted(map(tuple, ewma(df).collect()))
    b = sorted(map(tuple, ewma(df.repartition(7).orderBy(F.desc("event_id"))).collect()))
    assert a == b and len(a) == 60


def test_rrf_fuse_hand_computed(spark):
    from wasaffi_spark.operators.retrieval import rrf_fuse

    # doc 10: rank 1 lexical + rank 3 dense -> 1e9//61 + 1e9//63
    # doc 20: rank 2 lexical only           -> 1e9//62
    # doc 30: rank 1 dense only             -> 1e9//61
    lex = spark.createDataFrame(
        [("q", 10, 1), ("q", 20, 2)], "query_id string, doc_id bigint, rank int"
    )
    dense = spark.createDataFrame(
        [("q", 30, 1), ("q", 10, 3)], "query_id string, doc_id bigint, rank int"
    )
    got = {
        r.doc_id: (r.rrf_micro, r.n_sources, r.rank)
        for r in rrf_fuse([lex, dense], topk=3).collect()
    }
    s10 = 10**9 // 61 + 10**9 // 63
    assert got[10] == (s10, 2, 1)  # two sources beat any single source
    assert got[30] == (10**9 // 61, 1, 2)
    assert got[20] == (10**9 // 62, 1, 3)
    with pytest.raises(ValueError):
        rrf_fuse([])


def test_k_anonymity_report(spark):
    from wasaffi_spark.operators.expect import k_anonymity_report

    # class (1,'A'): 3 rows, 2 sensitive values; class (2,'B'): 1 row
    # (violates k=2); NULL quasi rows form their own class of 2
    rows = [
        (1, "A", "x"), (1, "A", "y"), (1, "A", "x"),
        (2, "B", "x"),
        (None, "A", "x"), (None, "A", "x"),
    ]
    df = spark.createDataFrame(rows, "q1 int, q2 string, s string")
    r = k_anonymity_report(
        df, ["q1", "q2"], k=2, sensitive_col="s", l_diverse=2
    ).collect()[0]
    assert r.n_rows == 6 and r.n_classes == 3
    assert r.min_class_size == 1
    assert r.n_violating_classes == 1 and r.n_violating_rows == 1
    assert not r.k_anonymous
    assert r.min_l == 1 and not r.l_diverse_ok  # the NULL class has one s
    # without a sensitive column the l columns are absent
    r2 = k_anonymity_report(df, ["q1"], k=1)
    assert "min_l" not in r2.columns and r2.collect()[0].k_anonymous


def test_triangle_count_orientation_invariant(spark):
    """Degree-ordered orientation (the O(m^1.5) plan) must produce the
    SAME counts as brute-force triple enumeration — orientation is a
    cost choice, not a semantic one. Star + attached triangles graph:
    a hub with pendant leaves (the case id-orientation degenerates on)."""
    import itertools

    from wasaffi_spark.operators.graph import triangle_count

    edges = [(0, i) for i in range(1, 12)]  # hub 0 with 11 spokes
    edges += [(1, 2), (3, 4), (5, 6)]  # three triangles through the hub
    edges += [(20, 21), (21, 22)]  # a path, no triangle
    df = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    got = {r.node: r.n_triangles for r in triangle_count(df).collect()}
    es = {frozenset(e) for e in edges}
    nodes = sorted({n for e in edges for n in e})
    want = {}
    for x, y, z in itertools.combinations(nodes, 3):
        if {frozenset((x, y)), frozenset((y, z)), frozenset((x, z))} <= es:
            for n in (x, y, z):
                want[n] = want.get(n, 0) + 1
    assert got == want and got[0] == 3


def test_containment_catches_subsumed_doc(spark):
    """A short doc fully quoted inside a long one: containment ≈ 1 in
    the contained direction, while symmetric Jaccard stays small — the
    case jaccard_pairs structurally misses."""
    from wasaffi_spark.operators.dedup import containment_pairs

    short = "alpha beta gamma delta epsilon zeta"
    long_ = short + " " + " ".join(f"w{i}" for i in range(60))
    df = spark.createDataFrame(
        [(1, short, "en"), (2, long_, "en"), (3, "totally different words here now", "en")],
        "doc_id bigint, text string, lang string",
    )
    rows = {
        (r.id_src, r.id_dst): (r.containment, r.jaccard)
        for r in containment_pairs(df, threshold=0.5).collect()
    }
    assert (1, 2) in rows
    c, j = rows[(1, 2)]
    assert c == 1.0  # every shingle of the short doc is in the long one
    assert j < 0.2  # symmetric Jaccard would never flag this pair
    assert (2, 1) not in rows  # reverse direction below threshold
    assert not any(3 in p for p in rows)


def test_semantic_dedup_pruned_valid_clusters_and_fallback(spark):
    """The pruned variant must produce exactly one row per vector
    (orphan fallback included — auto bits floor at 1, so pruning is
    ALWAYS active: at least two cells exist), clusters drawn from the
    hash-sampled seed id set, identical seed selection to the exact
    variant, and the keep-first rule intact (the lowest id of every
    cluster always survives). Cluster ASSIGNMENTS may legitimately
    differ from the exact argmax — that is the documented trade."""
    import hashlib
    import math

    from wasaffi_spark.operators import similarity

    rows = [
        (i, [math.sin(0.3 * i + d) for d in range(8)]) for i in range(60)
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    out = similarity.semantic_dedup_pruned(df, k_seeds=8, threshold=0.95)
    got = {r.vec_id: (r.cluster, r.keep) for r in out.collect()}
    assert len(got) == 60  # every vector assigned, orphans included
    # the codebook is the same hash sample the exact variant draws
    seed_ids = set(
        sorted(
            range(60),
            key=lambda i: hashlib.md5(f"semdedup-v1{i}".encode()).hexdigest(),
        )[:8]
    )
    assert {c for c, _ in got.values()} <= seed_ids
    # keep-first: the smallest id in every cluster is always kept
    by_cluster = {}
    for vid, (c, keep) in got.items():
        by_cluster.setdefault(c, []).append((vid, keep))
    for members in by_cluster.values():
        assert min(members)[1] is True


def test_profile_table_counts(spark):
    from wasaffi_spark.operators.expect import profile_table

    rows = [(1, "a"), (1, "b"), (None, "b"), (3, None)]
    df = spark.createDataFrame(rows, "k bigint, s string")
    rep = {r.col_name: r for r in profile_table(df).collect()}
    assert rep["k"].n_rows == 4 and rep["k"].n_null == 1
    assert rep["k"].n_distinct == 2  # distinct skips NULL (SQL semantics)
    assert (rep["k"].min_str, rep["k"].max_str) == ("1", "3")
    assert rep["s"].n_null == 1 and rep["s"].n_distinct == 2
    assert (rep["s"].min_str, rep["s"].max_str) == ("a", "b")
