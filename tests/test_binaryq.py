"""Binary (sign-bit) quantization ANN semantics
(operators/similarity.binary_quantize / binary_topk)."""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_crypto_btc_spark.operators.similarity import (
    binary_quantize,
    binary_topk,
    hamming_expr,
)


def test_codes_pack_sign_bits_into_32bit_words(spark):
    rows = [
        (0, [1.0, -1.0, 0.0, 2.0]),         # bits 0,3 → 9
        (1, [-1.0] * 33),                    # no bits, two words
        (2, [1.0] * 33),                     # all bits: 2^32-1, then 1
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r["bits"] for r in binary_quantize(df).collect()}
    assert out[0] == [9]
    assert out[1] == [0, 0]
    assert out[2] == [(1 << 32) - 1, 1]


def test_hamming_is_xor_popcount(spark):
    df = spark.createDataFrame(
        [([5, 0], [3, 1 << 31])], "a array<long>, b array<long>"
    )
    assert df.select(hamming_expr("a", "b").alias("h")).collect()[0][
        "h"
    ] == 3  # 5^3 = 6 (2 bits) + one high bit


def test_topk_finds_planted_twin_and_excludes_self(spark):
    import random

    rng = random.Random(5)
    base = [[rng.uniform(-1, 1) for _ in range(64)] for _ in range(30)]
    rows = [(i, v) for i, v in enumerate(base)]
    # vector 40 is a near-copy of query 3: tiny same-sign perturbation
    twin = [x + (0.01 if x > 0 else -0.01) for x in base[3]]
    rows.append((40, twin))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = binary_topk(df, query_filter="vec_id < 5", k=3)
    got = {
        (r["qid"], r["rnk"]): (r["nid"], r["hamming"])
        for r in out.collect()
    }
    assert all(nid != q for (q, _), (nid, _) in got.items())
    nid, ham = got[(3, 1)]
    assert nid == 40 and ham == 0  # identical sign pattern, top rerank
    # k rows per query, ranks contiguous
    assert sorted(r for (q, r) in got if q == 3) == [1, 2, 3]


def test_rerank_orders_by_exact_cosine_within_shortlist(spark):
    out = binary_topk(
        spark.createDataFrame(
            [
                (i, [float(i % 7) - 3.0 + 0.1 * j for j in range(64)])
                for i in range(25)
            ],
            "vec_id long, embedding array<double>",
        ),
        query_filter="vec_id < 2",
        k=5,
    ).collect()
    by_q: dict[int, list] = {}
    for r in out:
        by_q.setdefault(r["qid"], []).append(r)
    for rs in by_q.values():
        rs.sort(key=lambda r: r["rnk"])
        cosines = [r["cosine"] for r in rs]
        assert cosines == sorted(cosines, reverse=True)


def test_sweep_recall_monotone_and_asym_dominates(spark):
    # recall is monotone in oversample by construction: an exact-top-k
    # member in the shortlist always survives the cosine rerank (only
    # globally-higher cosines can displace it, and there are at most
    # k-1 of those), so hits = |exact ∩ shortlist| grows with the
    # shortlist.  The asymmetric scorer keeps the query's float
    # magnitudes, so at any oversample it should not trail Hamming on
    # a random corpus.
    import random

    from airflow_crypto_btc_spark.operators.similarity import (
        binary_topk_sweep,
    )

    rng = random.Random(11)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(120)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        (r["method"], r["oversample"]): r
        for r in binary_topk_sweep(
            df, query_filter="vec_id < 8", k=5, oversamples=(2, 4, 8)
        ).collect()
    }
    assert set(out) == {(m, o) for m in ("asym", "hamming") for o in (2, 4, 8)}
    for m in ("asym", "hamming"):
        rs = [out[(m, o)]["recall_ann"] for o in (2, 4, 8)]
        assert rs == sorted(rs), (m, rs)
        assert all(out[(m, o)]["shortlist"] == 5 * o for o in (2, 4, 8))
        assert all(
            out[(m, o)]["n_both"] <= out[(m, o)]["n_exact"] for o in (2, 4, 8)
        )
    assert (
        out[("asym", 8)]["recall_ann"] >= out[("hamming", 8)]["recall_ann"]
    )
