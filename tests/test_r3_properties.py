"""Property-based tests (hypothesis) for the round-3 operators:
snapshot-diff algebra, gap-fill conservation, interval-overlap vs a
brute-force reference, temperature-mixture identities, PQ code bounds.
"""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from wasaffi_spark.operators import diff as diffmod
from wasaffi_spark.operators import pipeline, temporal

texts = st.lists(
    st.one_of(st.none(), st.text(alphabet="abcxyz ", max_size=12)),
    min_size=1,
    max_size=8,
)


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(texts)
def test_diff_self_is_all_unchanged(spark, vals):
    rows = [(i, v) for i, v in enumerate(vals)]
    a = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = diffmod.snapshot_diff(a, a).collect()
    assert len(out) == len(rows)
    assert all(r["status"] == "unchanged" for r in out)


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(texts, texts)
def test_diff_statuses_partition_the_key_space(spark, va, vb):
    a = spark.createDataFrame(
        [(i, v) for i, v in enumerate(va)], "doc_id bigint, text string"
    )
    b = spark.createDataFrame(
        [(i + len(va) // 2, v) for i, v in enumerate(vb)],
        "doc_id bigint, text string",
    )
    out = diffmod.snapshot_diff(a, b).collect()
    # every key appears exactly once, and statuses agree with membership
    keys_a = set(range(len(va)))
    keys_b = {i + len(va) // 2 for i in range(len(vb))}
    assert {r["doc_id"] for r in out} == keys_a | keys_b
    assert len(out) == len(keys_a | keys_b)
    for r in out:
        k, s = r["doc_id"], r["status"]
        if s == "added":
            assert k in keys_b - keys_a
        elif s == "removed":
            assert k in keys_a - keys_b
        else:
            assert k in keys_a & keys_b


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=72),  # hour offset
            st.sampled_from(["a", "b"]),
            st.floats(min_value=-5, max_value=5, allow_nan=False),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_gapfill_conserves_counts_and_densifies(spark, evs):
    t0 = datetime.datetime(2024, 3, 1)
    rows = [
        (t0 + datetime.timedelta(hours=h, minutes=7), k, float(v))
        for h, k, v in evs
    ]
    events = spark.createDataFrame(
        rows, "ts timestamp, event_type string, value double"
    )
    out = temporal.gapfill_hourly(events).collect()
    # conservation: zero-filled rows add nothing
    assert sum(r["cnt"] for r in out) == len(rows)
    # densification: every key covers the full global hour span
    hours = sorted({h for h, _, _ in evs})
    span = hours[-1] - hours[0] + 1
    keys = {k for _, k, _ in evs}
    per_key = {k: [r for r in out if r["key"] == k] for k in keys}
    for k, krows in per_key.items():
        assert len(krows) == span
        # locf: after the key's first observed hour, last_sum is never NULL
        seen = sorted(h for h, kk, _ in evs if kk == k)[0]
        for r in krows:
            off = int((r["hour"] - t0).total_seconds() // 3600)
            if off >= seen:
                assert r["last_sum"] is not None


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=50),
            st.integers(min_value=0, max_value=12),
        ),
        min_size=1,
        max_size=8,
    ),
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=50),
            st.integers(min_value=0, max_value=12),
        ),
        min_size=1,
        max_size=8,
    ),
)
def test_interval_overlap_matches_bruteforce(spark, ls, rs):
    t0 = datetime.datetime(2024, 1, 1)

    def mk(iv, tag):
        return [
            (i, t0 + datetime.timedelta(hours=s), t0 + datetime.timedelta(hours=s + d), f"{tag}{i}")
            for i, (s, d) in enumerate(iv)
        ]

    lrows, rrows = mk(ls, "l"), mk(rs, "r")
    schema = "k bigint, start timestamp, end timestamp, tag string"
    left = spark.createDataFrame([(0, s, e, t) for _, s, e, t in lrows], schema)
    right = spark.createDataFrame([(0, s, e, t) for _, s, e, t in rrows], schema)
    got = {
        (r["tag"], r["tag_r"])
        for r in temporal.interval_overlap_join(
            left, right, on="k",
            left_start="start", left_end="end",
            right_start="start", right_end="end",
            bin_seconds=3600,
        ).collect()
    }
    want = {
        (lt, rt)
        for _, lst, led, lt in lrows
        for _, rst, red, rt in rrows
        if lst <= red and rst <= led
    }
    assert got == want


def test_temperature_alpha_one_is_identity(spark):
    rows = [(i, "en" if i % 3 else "fr") for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id bigint, lang string")
    out = pipeline.temperature_mixture(docs, alpha=1.0)
    assert out.count() == 200  # n^1 proportions = natural → keep all


def test_pq_codes_bounded(spark):
    import random

    from wasaffi_spark.operators.similarity import PQ_K, pq_encode

    rng = random.Random(3)
    emb = spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(40)],
        "vec_id bigint, embedding array<float>",
    )
    out = pq_encode(emb, dim=16, m=4).collect()
    assert len(out) == 40
    for r in out:
        for j in range(4):
            assert 0 <= r[f"c{j}"] < PQ_K
