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


def test_pagerank_hand_computed(spark):
    from wasaffi_spark.operators import graph

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("c", "a")], "src string, dst string"
    )
    got = {r.node: r.r for r in graph.pagerank(edges, iterations=2).collect()}
    # iter1: a=150000+85%·2e6=1850000, b=150000+85%·1e6=1000000, c=150000
    # iter2: a=150000+85%·1150000=1127500, b=150000+85%·1850000=1722500
    assert got == {"a": 1127500, "b": 1722500, "c": 150000}
    again = {
        r.node: r.r
        for r in graph.pagerank(edges.repartition(4), iterations=2).collect()
    }
    assert again == got  # bigint arithmetic: layout-independent, bit-exact


def test_chain_converges_in_log_rounds(spark):
    # 256-edge chain (257 nodes): hash-min alone needs ~256 rounds (one
    # hop per round); hash-min + pointer-doubling shortcut halves the
    # distance-to-root each round → O(log N). log2(257) ≈ 8; allow the
    # +1 hop per round interplay and the fixpoint-detection round.
    n = 256
    got = cc(spark, [(i, i + 1) for i in range(n)])
    assert set(got.values()) == {0}
    assert len(got) == n + 1
    assert graph.connected_components.last_iterations <= 11, (
        graph.connected_components.last_iterations
    )
