"""Property-based tests (hypothesis) for the round-4 operators:
curriculum bijection, domain-cap invariants, confusion-count algebra,
mutual-kNN subset relation, DSIR partition-invariance, boilerplate
no-op identity, aHash stability, BPE fertility bounds."""

from __future__ import annotations

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

texts = st.lists(
    st.text(alphabet="ab xy", min_size=0, max_size=14),
    min_size=1,
    max_size=8,
)
domains = st.lists(st.sampled_from(["d1", "d2", "d3"]), min_size=1, max_size=8)


def _docs(spark, vals, doms=None):
    doms = doms or ["d1"] * len(vals)
    rows = [
        (i, v, doms[i % len(doms)], len(v)) for i, v in enumerate(vals)
    ]
    return spark.createDataFrame(
        rows, "doc_id bigint, text string, source string, n_chars bigint"
    )


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(texts, domains)
def test_curriculum_positions_are_a_bijection(spark, vals, doms):
    from wasaffi_spark.operators.pipeline import curriculum_interleave

    df = _docs(spark, vals, doms)
    rows = curriculum_interleave(df).collect()
    assert len(rows) == len(vals)
    pos = sorted(r["position"] for r in rows)
    # positions are distinct and rounds are dense per domain; the
    # round-robin schedule never assigns two docs the same slot
    assert len(set(pos)) == len(pos)


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(texts, domains, st.integers(min_value=1, max_value=4))
def test_domain_cap_invariants(spark, vals, doms, cap):
    from wasaffi_spark.operators.pipeline import domain_cap

    df = _docs(spark, vals, doms)
    kept = domain_cap(df, cap=cap).collect()
    per_dom: dict[str, list] = {}
    for r in kept:
        per_dom.setdefault(r["source"], []).append(r)
    for dom, rows in per_dom.items():
        assert len(rows) <= cap
        # kept docs are the best-by-(n_chars, -doc_id) of their domain
        all_dom = [r for r in df.collect() if r["source"] == dom]
        best = sorted(all_dom, key=lambda r: (-r["n_chars"], r["doc_id"]))[
            : len(rows)
        ]
        assert {r["doc_id"] for r in rows} == {r["doc_id"] for r in best}


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(
        st.tuples(
            st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
            st.integers(min_value=0, max_value=1),
        ),
        min_size=1,
        max_size=12,
    )
)
def test_confusion_counts_partition_every_threshold(spark, pts):
    from wasaffi_spark.operators.training import evaluate_binary

    rows = [(i, round(p, 6), y) for i, (p, y) in enumerate(pts)]
    scored = spark.createDataFrame(rows, "doc_id bigint, prob double, y int")
    out = evaluate_binary(scored).collect()
    assert len(out) == 11
    n = len(rows)
    tps = {}
    for r in out:
        assert r["tp"] + r["fp"] + r["fn"] + r["tn"] == n
        tps[r["thr"]] = r["tp"]
    # tp is non-increasing as the threshold rises
    seq = [tps[k] for k in sorted(tps)]
    assert all(a >= b for a, b in zip(seq, seq[1:]))


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(
        st.lists(
            st.floats(min_value=-1.0, max_value=1.0, allow_nan=False),
            min_size=4,
            max_size=4,
        ),
        min_size=2,
        max_size=8,
    )
)
@pytest.mark.slow
def test_mutual_knn_is_subset_of_directed_edges(spark, vecs):
    from wasaffi_spark.operators.similarity import (
        knn_edges_bucketed,
        mutual_knn_pairs,
    )

    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    edges = knn_edges_bucketed(df, k=2, bits=2)
    e = {(r["src"], r["dst"]) for r in edges.collect()}
    for r in mutual_knn_pairs(edges).collect():
        a, b = r["id_a"], r["id_b"]
        assert a < b and (a, b) in e and (b, a) in e


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(texts)
@pytest.mark.slow
def test_dsir_weights_invariant_under_partitioning(spark, vals):
    from wasaffi_spark.operators.importance import dsir_logweights

    raw = _docs(spark, vals)
    target = _docs(spark, vals[: max(1, len(vals) // 2)])
    w1 = {r["doc_id"]: r["log_w"] for r in dsir_logweights(raw, target).collect()}
    w2 = {
        r["doc_id"]: r["log_w"]
        for r in dsir_logweights(raw.repartition(5), target.repartition(3)).collect()
    }
    assert w1 == w2


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(texts)
@pytest.mark.slow
def test_strip_boilerplate_noop_when_no_templates(spark, vals):
    from wasaffi_spark.operators.text import strip_boilerplate

    # one doc per domain → no line can reach min_docs=2 in any domain
    rows = [(i, f"dom{i}", v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    out = {r["doc_id"]: r for r in strip_boilerplate(df).collect()}
    for i, v in enumerate(vals):
        assert out[i]["clean_text"] == v and out[i]["n_boiler"] == 0


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.text(alphabet="abc", min_size=0, max_size=20), min_size=1, max_size=6))
@pytest.mark.slow
def test_ahash_stable_under_partitioning_and_bounded(spark, vals):
    from wasaffi_spark.operators.multimodal import ahash_signature, ingest_as_media

    rows = [(i, v, "s") for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    m = ingest_as_media(df)
    s1 = {r["doc_id"]: r["ahash"] for r in ahash_signature(m).collect()}
    s2 = {
        r["doc_id"]: r["ahash"]
        for r in ahash_signature(ingest_as_media(df.repartition(4))).collect()
    }
    assert s1 == s2
    assert all(0 <= v < 2**16 for v in s1.values())


@settings(max_examples=6, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(
        st.text(alphabet="abcd", min_size=1, max_size=8), min_size=1, max_size=6
    )
)
def test_bpe_fertility_bounds(spark, words):
    from wasaffi_spark.operators.bpe import bpe_segment, bpe_train

    df = spark.createDataFrame(
        [(1, " ".join(words))], "doc_id bigint, text string"
    )
    merges = bpe_train(df, k_merges=2)
    seg = bpe_segment(df, merges).collect()[0]
    n_chars = sum(len(w) for w in words)
    # merges only shrink: words <= bpe tokens <= total chars
    assert seg["n_words"] == len(words)
    assert seg["n_words"] <= seg["n_bpe_tokens"] <= n_chars
