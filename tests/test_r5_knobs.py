"""Round-5 data-proportional knob wiring (r4 VERDICT fixes #2/#3):
the SemDeDup codebook and the sign-LSH cell family derive their size
from the corpus count by default, so the quadratic within-cluster /
within-cell terms stay bounded as N grows. These tests pin the exact
formulas the DuckDB oracles mirror (greatest/ceil for k_seeds, the
integer shift-compare for bits)."""

import math

import pytest
from pyspark.sql import functions as F


def test_auto_sign_bits_integer_exact_matches_log_formula():
    """The r5 integer shift-compare must agree with the documented
    ``max(1, min(30, ceil(log2(n/target))))`` closed form everywhere,
    including exact powers of two (the float-boundary cases that
    motivated the rewrite)."""
    from wasaffi_spark.operators.similarity import auto_sign_bits

    for target in (1, 2, 64, 256, 1000):
        for n in list(range(1, 70)) + [
            255, 256, 257, 511, 512, 513, 2**20 - 1, 2**20, 2**20 + 1
        ]:
            closed = max(
                1, min(30, math.ceil(math.log2(max(2.0, n / target))))
            )
            assert auto_sign_bits(n, target) == closed, (n, target)


def test_resolve_bits_counts_corpus(spark):
    from wasaffi_spark.operators.similarity import _resolve_bits

    df = spark.range(600).select(F.col("id").alias("vec_id"))
    # r6: returns (corpus, bits); the auto path materializes the frame
    # before counting so the count and the main job share one execution
    out_df, bits = _resolve_bits(df, None, 256)
    assert bits == 2  # 256*2 < 600 <= 256*4
    assert out_df.count() == 600  # checkpointed frame carries the rows
    same_df, bits7 = _resolve_bits(df, 7, 256)
    assert bits7 == 7 and same_df is df  # explicit bits win, no count


def test_knn_edges_auto_bits_equals_explicit(spark):
    """knn_edges_bucketed(bits=None) on an n-row corpus must equal the
    explicit-bits call with auto_sign_bits(n) — the default is a knob
    derivation, not a semantic change."""
    from wasaffi_spark.operators.similarity import (
        auto_sign_bits,
        knn_edges_bucketed,
    )

    n = 40
    rows = [
        (i, [math.sin(0.7 * i + 1.3 * d) for d in range(8)]) for i in range(n)
    ]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    auto = sorted(map(tuple, knn_edges_bucketed(emb, k=2).collect()))
    manual = sorted(
        map(
            tuple,
            knn_edges_bucketed(emb, k=2, bits=auto_sign_bits(n)).collect(),
        )
    )
    assert auto == manual and len(auto) > 0


def test_semantic_dedup_auto_k_follows_n(spark):
    """k_seeds=None ⇒ k = max(16, ceil(n/128)): at n ≤ 2048 that is the
    r4 constant 16 (driver output unchanged); the distinct-cluster
    count can then never exceed k."""
    from wasaffi_spark.operators import similarity

    rows = [
        (i, [math.sin(0.3 * i + d) for d in range(8)]) for i in range(50)
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    out = similarity.semantic_dedup(df, threshold=0.99)
    clusters = {r.cluster for r in out.collect()}
    assert len(clusters) <= 16
    # the auto knob resolves identically to the explicit k=16 call
    explicit = similarity.semantic_dedup(df, k_seeds=16, threshold=0.99)
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, explicit.collect())
    )


def test_semantic_dedup_auto_k_formula():
    assert max(16, math.ceil(500 / 128)) == 16  # driver scale: unchanged
    assert max(16, math.ceil(20000 / 128)) == 157  # 10x probe ≈ the k160 control


def test_rh_sign_matches_duckdb_md5():
    """The Rademacher sign matrix must regenerate identically from
    DuckDB's md5 — the property the oracle CTE relies on."""
    import duckdb

    from wasaffi_spark.operators.similarity import _rh_sign

    rows = duckdb.sql(
        """select ii.i, jj.j,
                  case when ('0x' || substr(md5('cell-rh-v1|' || ii.i
                                             || '|' || jj.j), 1, 1))::int
                            % 2 = 0 then 1 else -1 end as sgn
           from unnest(generate_series(0, 5)) as ii(i),
                unnest(generate_series(1, 16)) as jj(j)"""
    ).fetchall()
    for i, j, sgn in rows:
        assert _rh_sign(i, j) == sgn, (i, j)


def test_with_cell_rh_resists_sign_bias(spark):
    """All-positive vectors (every coordinate sign identical — the
    degenerate case for axis-aligned with_cell, which puts ALL of them
    in one cell) still spread across hyperplane cells."""
    import math

    from wasaffi_spark.operators.similarity import with_cell, with_cell_rh

    rows = [
        (i, [((i * 31 + d * 17) % 97) / 97.0 + 0.01 for d in range(16)])
        for i in range(256)
    ]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    axis = with_cell(emb, bits=4).select("cell").distinct().count()
    rh = with_cell_rh(emb, bits=4).select("cell").distinct().count()
    assert axis == 1  # every coordinate positive -> one mega-cell
    # hyperplanes mix dims, so spread survives the bias (not perfectly
    # uniform: a plane whose signs don't sum to zero keeps some bias on
    # uncentered data — mean-centering is the production refinement)
    assert rh >= 4


def test_with_cell_rh_handles_empty_and_negation(spark):
    from wasaffi_spark.operators.similarity import with_cell_rh

    rows = [
        (1, [1.0] * 8),
        (2, [-1.0] * 8),  # exact negation -> opposite projection signs
        (3, []),  # empty vector -> cell 0 (matches the oracle coalesce)
    ]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    cells = {r.vec_id: r.cell for r in with_cell_rh(emb, bits=3).collect()}
    assert cells[3] == 0
    # negation flips every nonzero projection: cells are bitwise
    # complements whenever no projection lands exactly on zero
    assert cells[1] != cells[2]


def test_rh_cell_numpy_equals_expression_path(spark):
    """The Arrow-matmul cell (with_cell_rh) and the pure-JVM expression
    twin (_rh_cell_expr) must agree bit-for-bit — including empty,
    short, negative, and fractional vectors (the floor-boundary and
    padding cases)."""
    import math

    from wasaffi_spark.operators.similarity import (
        _rh_cell_expr,
        with_cell_rh,
    )

    rows = [(i, [math.sin(0.7 * i + 1.3 * d) * (3 if i % 5 else 0.0001)
                 for d in range((i % 9) * 8)]) for i in range(200)]
    rows.append((900, []))
    rows.append((901, [0.0] * 64))
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    for bits in (1, 5, 12):
        a = {(r.vec_id, r.cell) for r in with_cell_rh(emb, bits=bits).collect()}
        b = {(r.vec_id, r.cell) for r in _rh_cell_expr(emb, bits=bits).collect()}
        assert a == b, bits
