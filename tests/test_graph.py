"""Connected-components behavioral tests."""

from __future__ import annotations

from wasaffi_spark.operators import graph


def cc(spark, edges):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    return {
        r.node: r.component
        for r in graph.connected_components(df).collect()
    }


def test_two_components(spark):
    got = cc(spark, [(1, 2), (2, 3), (5, 6)])
    assert got == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5}


def test_long_path_needs_iterations(spark):
    # a 12-node path: labels propagate one hop per iteration at worst
    got = cc(spark, [(i, i + 1) for i in range(12)])
    assert set(got.values()) == {0}
    assert len(got) == 13


def test_cycle_and_edge_direction_irrelevant(spark):
    got = cc(spark, [(3, 1), (1, 2), (2, 3), (9, 7)])
    assert got[1] == got[2] == got[3] == 1
    assert got[7] == got[9] == 7


def test_self_loop(spark):
    got = cc(spark, [(4, 4), (4, 8)])
    assert got == {4: 4, 8: 4}
