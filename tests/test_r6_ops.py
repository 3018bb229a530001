"""Round-6 operators: SQ8 scalar quantization (encode + ADC top-k).

Reference model: pure-Python replication of the documented arithmetic
(floor-half-up codes against max|x|, integer inner products), so the
tests pin the engine-exact contract rather than re-deriving it from
the Spark output.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from wasaffi_spark.operators import similarity


def _py_codes(vec):
    mx = max(abs(x) for x in vec)
    if mx == 0:
        return [0] * len(vec), 0, 0
    codes = [math.floor(x * 127 / mx + 0.5) for x in vec]
    cn = sum(c * c for c in codes)
    scale = math.floor(mx / 127 * 1e9 + 0.5)
    return codes, cn, scale


def test_sq8_encode_matches_reference_model(spark):
    rows = [
        (0, [1.0, 0.5, -0.25, 0.0]),
        (1, [0.0, 0.0, 0.0, 0.0]),  # zero vector
        (2, [-2.0, 1.0, 0.5, 0.25]),
        (3, [1e-5, -1e-5, 0.0, 1e-5]),  # tiny magnitudes
        (4, [0.1, 0.2, 0.3, -0.4]),
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    got = {
        r.vec_id: (list(r.codes), r.code_norm_sq, r.scale_micro)
        for r in similarity.sq8_encode(df).collect()
    }
    assert set(got) == {0, 1, 2, 3, 4}
    for vid, vec in rows:
        # the reference model runs on the float32-rounded values Spark
        # actually stores
        import struct

        f32 = [struct.unpack("f", struct.pack("f", x))[0] for x in vec]
        codes, cn, scale = _py_codes(f32)
        assert got[vid] == (codes, cn, scale), vid
    # code range is a hard contract: one signed byte per dimension
    assert all(
        -127 <= c <= 127 for codes, _, _ in got.values() for c in codes
    )
    # the max-magnitude dimension always saturates to ±127
    assert 127 in [abs(c) for c in got[0][0]]
    assert got[1] == ([0, 0, 0, 0], 0, 0)
    # determinism across physical layouts
    again = {
        r.vec_id: (list(r.codes), r.code_norm_sq, r.scale_micro)
        for r in similarity.sq8_encode(df.repartition(5)).collect()
    }
    assert again == got


def test_sq8_topk_matches_brute_force(spark):
    # 3 direction families in 8-d; query 0 sits in family A, query 1
    # in family B — their top neighbours must be their own families,
    # ranked by the documented ip/sqrt(code_norm_sq) order.
    import struct

    def f32(v):
        return [struct.unpack("f", struct.pack("f", x))[0] for x in v]

    rows = []
    for i in range(24):
        fam = i % 3
        base = [0.0] * 8
        base[fam * 2] = 1.0
        base[fam * 2 + 1] = 0.3 + 0.01 * i
        rows.append((i, base))
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    queries = df.where(F.col("vec_id") < 2)
    out = similarity.sq8_topk(queries, df, k=3).collect()

    vecs = {i: f32(v) for i, v in rows}
    enc = {i: _py_codes(v) for i, v in vecs.items()}

    def brute(qid):
        qq = [math.floor(x * similarity.SQ8_QUERY_QUANT + 0.5) for x in vecs[qid]]
        cands = []
        for nid, (codes, cn, _) in enc.items():
            if nid == qid or cn == 0:
                continue
            ip = sum(a * b for a, b in zip(qq, codes))
            cands.append((-(ip / math.sqrt(cn)), nid, ip, cn))
        cands.sort()
        return [
            (qid, nid, ip, cn, r + 1)
            for r, (_, nid, ip, cn) in enumerate(cands[:3])
        ]

    got = sorted(
        (r.qid, r.nid, r.ip, r.code_norm_sq, r.rank) for r in out
    )
    want = sorted(brute(0) + brute(1))
    assert got == want
    # neighbours stay within the query's direction family
    for qid, nid, *_ in got:
        assert nid % 3 == qid % 3


def test_sq8_topk_rerank_schema_and_recall(spark):
    # two tight clusters; SQ8 codes inside a cluster nearly collide, so
    # the rerank path must still return the true nearest by exact cosine
    rows = []
    for i in range(20):
        c = i % 2
        theta = 0.002 * i
        rows.append(
            (
                i,
                [
                    math.cos(1.0 * c + theta),
                    math.sin(1.0 * c + theta),
                    0.0,
                    0.0,
                ],
            )
        )
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    out = similarity.sq8_topk(
        df.where(F.col("vec_id") < 2), df, k=2, rerank=8
    )
    assert out.columns == ["qid", "nid", "cos_sim", "rank"]
    got = {(r.qid, r.rank): r.nid for r in out.collect()}
    # every neighbour shares the query's cluster parity
    assert all(nid % 2 == qid % 2 for (qid, _), nid in got.items())
