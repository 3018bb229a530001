"""The bench harness must agree with the driver contract BEFORE the
driver runs it: every headline name resolves to a declared-or-extra
query, and the stdout line stays within the driver's bounded tail
capture (BENCH_r02's over-long line came back unparseable)."""

from __future__ import annotations

import json


def test_headline_names_resolve():
    import bench

    import __spark_entry__ as entrymod

    available = set(entrymod.queries()) | set(entrymod.extra_queries())
    missing = [n for n in bench.HEADLINE if n not in available]
    assert not missing, f"bench.HEADLINE references unknown queries: {missing}"
    # rename map only points at headline entries with real r1 rows
    for new, old in bench.R1_NAME.items():
        assert new in bench.HEADLINE
        assert old in bench.R1_TIMES


def test_stdout_line_fits_tail_capture():
    import bench

    # worst-case serialization: every query at a 4-digit seconds value
    line = json.dumps(
        {
            "metric": "headline_queries_total_wall_sec",
            "value": 9999.999,
            "unit": "sec",
            "queries": {n: 99.999 for n in bench.HEADLINE},
            "sf": 0.1,
            "cpus": 32,
        },
        separators=(",", ":"),
    )
    # Threshold calibrated against observed driver behaviour: the
    # 3684-byte BENCH_r03.json line was recorded intact (r2's truncation
    # was not a size limit), so 3300 keeps a real margin below the
    # largest line proven to survive while allowing the grown catalog.
    assert len(line) < 3300, len(line)


def test_declared_window_exactly_fifty():
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    assert len(qs) == 50
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    # extras never shadow declared names
    assert not (set(entrymod.extra_queries()) & set(qs))
