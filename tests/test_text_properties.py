"""Property-based tests (hypothesis) for the corpus-cleaning operators:
redaction is idempotent-ish over generated PII and packing obeys the
cumulative-sum invariants, checked in plain Python against the Spark
results on generated micro-corpora."""

from __future__ import annotations

import pytest

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from wasaffi_spark.operators import text

word = st.text(alphabet="abcdefghijklmnop", min_size=1, max_size=8)
local = st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789._%+-", min_size=1, max_size=10).filter(
    lambda s: re.fullmatch(r"[A-Za-z0-9._%+-]+", s) is not None
)
domain = st.builds(
    lambda a, b: f"{a}.{b}",
    st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789", min_size=1, max_size=8),
    st.sampled_from(["com", "org", "co", "net", "io"]),
)
email = st.builds(lambda loc, dom: f"{loc}@{dom}", local, domain)


@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(word, min_size=1, max_size=6), email)
def test_redaction_removes_generated_emails(spark, words, addr):
    doc = " ".join(words[: len(words) // 2] + [addr] + words[len(words) // 2 :])
    df = spark.createDataFrame([(0, doc)], "doc_id long, text string")
    [row] = text.with_pii_redaction(df).collect()
    assert row.n_emails >= 1
    assert addr not in row.clean_text
    assert "<EMAIL>" in row.clean_text
    # plain words survive (none of the generated words can match the
    # email/url/phone patterns: lowercase letters only, no digits/@)
    for w in words:
        assert w in row.clean_text


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(st.integers(min_value=0, max_value=500), min_size=1, max_size=20),
    st.integers(min_value=16, max_value=512),
)
def test_pack_streams_invariants(spark, token_counts, budget):
    rows = [(i, "s", n) for i, n in enumerate(token_counts)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_tokens long")
    out = sorted(
        text.pack_streams(df, budget_tokens=budget).collect(),
        key=lambda r: r.doc_id,
    )
    # invariants of concat-and-chunk packing, checked against plain python
    cum = 0
    prev_bin = 0
    for r, n in zip(out, token_counts):
        assert r.stream_offset == cum  # offset = tokens before this doc
        assert r.pack_bin == cum // budget  # bin of the doc's first token
        assert r.pack_bin >= prev_bin  # bins are monotone in stream order
        prev_bin = r.pack_bin
        cum += n


# paragraphs drawn from a SMALL pool so cross-document duplicates are
# overwhelmingly likely (the interesting case for global dedup)
para = st.sampled_from(["alpha beta", "common text", "gamma", "delta e", ""])
doc = st.lists(para, min_size=1, max_size=5).map("\n".join)


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(doc, min_size=1, max_size=6))
@pytest.mark.slow
def test_paragraph_dedup_properties(spark, texts):
    """Checked against a plain-Python model of the spec:
    - every document survives (row conservation);
    - the multiset of kept non-blank paragraphs == the SET of distinct
      non-blank paragraphs in the corpus (each kept exactly once,
      at its globally-first (doc_id, pos));
    - blanks are all kept;
    - idempotence: a second pass removes nothing.
    """
    from wasaffi_spark.operators.dedup import paragraph_dedup

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r.doc_id: r for r in paragraph_dedup(df).collect()}

    assert set(out) == {i for i, _ in rows}
    # python model: first-occurrence scan in (doc_id, pos) order
    seen: set[str] = set()
    model: dict[int, list[str]] = {}
    for i, t in rows:
        keep = []
        for p in t.split("\n"):
            if p.strip() == "":
                keep.append(p)
            elif p not in seen:
                seen.add(p)
                keep.append(p)
        model[i] = keep
    for i, t in rows:
        assert out[i].dedup_text == "\n".join(model[i])
        assert out[i].n_paras == len(t.split("\n"))
        assert out[i].n_kept_paras == len(model[i])
    # idempotence on the deduped corpus
    again = {
        r.doc_id: r.dedup_text
        for r in paragraph_dedup(
            spark.createDataFrame(
                [(i, out[i].dedup_text) for i, _ in rows],
                "doc_id bigint, text string",
            )
        ).collect()
    }
    for i, _ in rows:
        assert again[i] == out[i].dedup_text
