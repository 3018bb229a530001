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
