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
        r.vec_id: (list(r.codes), r.code_norm_sq, r.scale_nano)
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
        r.vec_id: (list(r.codes), r.code_norm_sq, r.scale_nano)
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


def _py_words(vec, word_bits=32):
    words = []
    for j in range(0, len(vec), word_bits):
        w = 0
        for b, x in enumerate(vec[j : j + word_bits]):
            if x > 0:
                w |= 1 << b
        words.append(w)
    return words


def test_bq_encode_matches_reference_model(spark):
    rows = [
        (0, [1.0, -0.5, 0.0, 0.25] * 16),  # 64-d, mixed signs + zeros
        (1, [0.0] * 64),                    # all-zero -> all bits clear
        (2, [-1.0] * 64),                   # all-negative -> all clear
        (3, [1e-30] * 64),                  # tiny positives still set
        (4, [float(i - 31.5) for i in range(64)]),  # half/half split
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    got = {
        r.vec_id: list(r.words)
        for r in similarity.bq_encode(df).collect()
    }
    for vid, vec in rows:
        assert got[vid] == _py_words(vec), vid
    assert got[1] == [0, 0] and got[2] == [0, 0]
    # word values stay inside 32 unsigned bits (sum-safe packing)
    assert all(0 <= w < (1 << 32) for ws in got.values() for w in ws)
    # non-multiple-of-32 dims still pack (ceil division)
    odd = spark.createDataFrame(
        [(9, [1.0] * 40)], "vec_id bigint, embedding array<float>"
    )
    (w,) = similarity.bq_encode(odd).collect()
    assert list(w.words) == [(1 << 32) - 1, (1 << 8) - 1]


def test_bq_topk_matches_brute_force(spark):
    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(30)
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    out = similarity.bq_topk(df.where(F.col("vec_id") < 3), df, k=4).collect()

    import struct

    def f32(v):
        return [struct.unpack("f", struct.pack("f", x))[0] for x in v]

    enc = {i: _py_words(f32(v)) for i, v in rows}

    def brute(qid):
        cands = []
        for nid, ws in enc.items():
            if nid == qid:
                continue
            h = sum(bin(a ^ b).count("1") for a, b in zip(enc[qid], ws))
            cands.append((h, nid))
        cands.sort()
        return [(qid, nid, h, r + 1) for r, (h, nid) in enumerate(cands[:4])]

    got = sorted((r.qid, r.nid, r.hamming, r.rank) for r in out)
    want = sorted(brute(0) + brute(1) + brute(2))
    assert got == want


def test_bq_topk_rerank_recovers_exact_neighbours(spark):
    # two antipodal direction families: hamming separates them cleanly,
    # and the rerank stage must put the exact-cosine nearest on top
    rows = []
    for i in range(20):
        c = 1.0 if i % 2 == 0 else -1.0
        rows.append((i, [c * (1.0 + 0.01 * i)] * 32 + [0.01 * c] * 32))
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    out = similarity.bq_topk(
        df.where(F.col("vec_id") < 2), df, k=2, rerank=8
    )
    assert out.columns == ["qid", "nid", "cos_sim", "rank"]
    got = {(r.qid, r.rank): r.nid for r in out.collect()}
    assert all(nid % 2 == qid % 2 for (qid, _), nid in got.items())


def test_filtered_topk_prefilter_semantics(spark):
    # 3 labels x 8 vectors; cross-label vectors are intentionally MORE
    # similar to the query than most same-label ones, so a post-filter
    # of the unfiltered top-k would lose rows — pre-filter must still
    # return exactly k same-label neighbours per query.
    rows = []
    for i in range(24):
        lab = i % 3
        # same direction family for everyone (high cross-label cosine),
        # tiny label-specific component
        v = [1.0, 0.9 + 0.001 * i, 0.01 * lab, 0.001 * (i // 3)]
        rows.append((i, lab, v))
    df = spark.createDataFrame(
        rows, "vec_id bigint, label int, embedding array<float>"
    )
    out = similarity.filtered_topk(
        df.where(F.col("vec_id") < 3), df, k=3, filter_col="label"
    )
    got = [(r.qid, r.nid, r.rank) for r in out.collect()]
    # exactly k rows per query, all same-label, never self
    by_q = {}
    for qid, nid, rank in got:
        assert nid % 3 == qid % 3 and nid != qid
        by_q.setdefault(qid, []).append(rank)
    assert {q: sorted(rs) for q, rs in by_q.items()} == {
        0: [1, 2, 3],
        1: [1, 2, 3],
        2: [1, 2, 3],
    }
    # agreement with brute force restricted to the label slice
    brute = similarity.brute_force_topk(
        df.where(F.col("vec_id") == 0),
        df.where(F.col("label") == 0),
        k=3,
    )
    want = {(r.qid, r.nid, r.rank) for r in brute.collect()}
    assert {t for t in {(q, n, r) for q, n, r in got} if t[0] == 0} == want


def test_ivf_sq8_single_cell_equals_flat_sq8(spark):
    # with one IVF cell probed, the composition must reproduce the flat
    # SQ8 ADC ranking EXACTLY (same codes, same integer ip, same ties)
    import random

    rng = random.Random(11)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    q = df.where(F.col("vec_id") < 3)
    flat = {
        (r.qid, r.rank): (r.nid, r.ip, r.code_norm_sq)
        for r in similarity.sq8_topk(q, df, k=4).collect()
    }
    comp = {
        (r.qid, r.rank): (r.nid, r.ip, r.code_norm_sq)
        for r in similarity.ivf_sq8_topk(
            q, df, k=4, n_cells=1, n_probe=1
        ).collect()
    }
    assert comp == flat


def test_ivf_sq8_probes_subset_of_flat_candidates(spark):
    # multi-cell: every returned neighbour must come from the query's
    # probed cells, and ip/code_norm_sq must agree with the flat ADC
    # values for those pairs (cell routing changes WHICH candidates are
    # seen, never their scores)
    import random

    rng = random.Random(13)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(60)
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    q = df.where(F.col("vec_id") < 2)
    comp = similarity.ivf_sq8_topk(q, df, k=3, n_cells=4, n_probe=2).collect()
    flat = {
        (r.qid, r.nid): (r.ip, r.code_norm_sq)
        for r in similarity.sq8_topk(q, df, k=60).collect()
    }
    assert len(comp) == 6
    for r in comp:
        assert flat[(r.qid, r.nid)] == (r.ip, r.code_norm_sq)


def test_ivf_bq_single_cell_equals_flat_bq(spark):
    import random

    rng = random.Random(17)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    q = df.where(F.col("vec_id") < 3)
    flat = {
        (r.qid, r.rank): (r.nid, r.hamming)
        for r in similarity.bq_topk(q, df, k=4).collect()
    }
    comp = {
        (r.qid, r.rank): (r.nid, r.hamming)
        for r in similarity.ivf_bq_topk(
            q, df, k=4, n_cells=1, n_probe=1
        ).collect()
    }
    assert comp == flat
