"""Similarity-search semantics vs a NumPy reference implementation."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from airflow_crypto_btc_spark.operators.similarity import (
    cosine_topk,
    embedding_near_dup_pairs,
    embedding_norms,
)

N, DIM = 60, 16


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.RandomState(3)
    V = rng.randn(N, DIM).astype(np.float32)
    V[7] = V[3] + rng.randn(DIM).astype(np.float32) * 0.01  # near-dup pair
    rows = [(i, V[i].tolist()) for i in range(N)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return V, df


def numpy_topk(V, qids, k):
    Vd = V.astype(np.float64)
    n = Vd / np.linalg.norm(Vd, axis=1, keepdims=True)
    out = {}
    for q in qids:
        cos = n @ n[q]
        order = sorted(
            (i for i in range(len(V)) if i != q),
            key=lambda i: (-round(cos[i], 6), i),
        )
        out[q] = [(i, round(cos[i], 6)) for i in order[:k]]
    return out


def test_cosine_topk_matches_numpy(vectors):
    V, df = vectors
    got = cosine_topk(df, query_filter="vec_id < 5", k=10).collect()
    by_q = {}
    for r in sorted(got, key=lambda r: (r["qid"], r["rnk"])):
        by_q.setdefault(r["qid"], []).append((r["nid"], r["cosine"]))
    expected = numpy_topk(V, range(5), 10)
    for q in range(5):
        assert [n for n, _ in by_q[q]] == [n for n, _ in expected[q]]
        np.testing.assert_allclose(
            [c for _, c in by_q[q]],
            [c for _, c in expected[q]],
            atol=2e-6,
        )


def test_near_dup_pair_found(vectors):
    V, df = vectors
    pairs = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_near_dup_pairs(
            df, planes=4, cosine_threshold=0.95
        ).collect()
    }
    assert (3, 7) in pairs and pairs[(3, 7)] > 0.99


def test_near_dup_bucket_cap_skips_hot_bucket(spark):
    """Engineered skew (the curation purge torture-test's shape): 20% of
    the corpus is one identical vector → one sign-bucket holds all of it
    plus whatever else collides.  The cap must (a) drop exactly the
    over-cap buckets' pairs, (b) be a no-op when generous, and (c) make
    the skipped mass observable through the accounting twin."""
    from airflow_crypto_btc_spark.operators.similarity import (
        embedding_near_dup_skipped_buckets,
        hyperplane_bucket_expr,
    )

    rng = np.random.RandomState(17)
    n, dim, hot = 100, 8, 20
    V = rng.randn(n, dim).astype(np.float64)
    V[:hot] = np.full(dim, 1.0)  # 20% identical → one hot bucket
    df = spark.createDataFrame(
        [(i, V[i].tolist()) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    kw = dict(planes=4, cosine_threshold=0.5)
    uncapped = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_near_dup_pairs(df, **kw).collect()
    }
    capped = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_near_dup_pairs(
            df, max_bucket_size=10, **kw
        ).collect()
    }
    report = embedding_near_dup_skipped_buckets(
        df, planes=4, max_bucket_size=10
    ).collect()
    assert report and all(r["bucket_size"] > 10 for r in report)
    skipped = {r["bucket"] for r in report}
    bucket_of = {
        r["vec_id"]: r["b"]
        for r in df.select(
            "vec_id", hyperplane_bucket_expr("embedding", 4).alias("b")
        ).collect()
    }
    # pairs only form within a bucket → capped = uncapped minus pairs
    # living in a skipped bucket; the hot identical block must be gone
    assert capped == {
        p: c
        for p, c in uncapped.items()
        if bucket_of[p[0]] not in skipped
    }
    assert all(not (a < hot and b < hot) for a, b in capped)
    # the candidate join is bounded: ≤ cap·(cap−1)/2 pairs per surviving
    # bucket — the skew-safety claim in operator form
    from collections import Counter

    per_bucket = Counter(bucket_of[a] for a, _ in capped)
    assert all(v <= 10 * 9 // 2 for v in per_bucket.values())
    # a generous cap changes nothing
    assert uncapped == {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_near_dup_pairs(
            df, max_bucket_size=n, **kw
        ).collect()
    }


def test_hyperplane_bucket_literal_weights_match_hof(spark, sf_dir):
    """The literal-weight (dim-known, codegen) bucket expression must
    agree with the generic md5-in-HOF form on EVERY vector — bucket keys
    are persisted in indexes, so the two forms must be one function.
    Probed at dim ≤ _UNROLL_MAX_DIM (the only widths where the literal
    path engages — wider inputs are gated back to the HOF form, which
    the second assertion pins)."""
    from airflow_crypto_btc_spark.operators.similarity import (
        _UNROLL_MAX_DIM,
        hyperplane_bucket_expr,
    )
    from airflow_crypto_btc_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    # 16-wide slices of the real fixture (inside the unroll gate)
    narrow = emb.select(
        "vec_id", F.expr("slice(embedding, 1, 16)").alias("embedding")
    )
    for planes in (4, 8):
        mism = narrow.select(
            hyperplane_bucket_expr("embedding", planes).alias("hof"),
            hyperplane_bucket_expr("embedding", planes, 16).alias("lit"),
        ).filter("hof != lit")
        assert mism.count() == 0
    # beyond the gate the two calls build the SAME (HOF) expression
    wide_dim = len(emb.select("embedding").first()[0])
    assert wide_dim > _UNROLL_MAX_DIM
    a = hyperplane_bucket_expr("embedding", 4, wide_dim)
    b = hyperplane_bucket_expr("embedding", 4)
    assert str(a) == str(b)


def test_norms(vectors):
    V, df = vectors
    got = {r["vec_id"]: r for r in embedding_norms(df).collect()}
    for i in (0, 5, 59):
        assert got[i]["dim"] == DIM
        assert got[i]["l2_norm"] == pytest.approx(
            float(np.linalg.norm(V[i].astype(np.float64))), abs=2e-6
        )


def test_ivf_topk_structure_and_recall(spark, sf_dir):
    from airflow_crypto_btc_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
    )
    from airflow_crypto_btc_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    exact = cosine_topk(emb, k=10).toPandas()
    approx = ivf_topk(emb, n_probe=4, k=10).toPandas()

    # structural: ≤ k per query, ranks contiguous from 1, cosine descending
    for qid, grp in approx.groupby("qid"):
        grp = grp.sort_values("rnk")
        assert list(grp["rnk"]) == list(range(1, len(grp) + 1))
        assert (grp["cosine"].diff().dropna() <= 1e-12).all()

    # recall@10 vs brute force: probing 4 of ~20 lists must stay useful
    exact_sets = exact.groupby("qid")["nid"].apply(set)
    approx_sets = approx.groupby("qid")["nid"].apply(set)
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets.index
    ]
    assert sum(recalls) / len(recalls) >= 0.3


def test_cosine_topk_fast_matches_exact_operator(spark, sf_dir):
    """The vectorized mapInPandas path returns the same neighbors as the
    HOF-exact operator (cosines agree to 1e-6; identical tie-breaks)."""
    from airflow_crypto_btc_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_fast,
    )
    from airflow_crypto_btc_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    exact = cosine_topk(emb, k=10).toPandas()
    fast = cosine_topk_fast(emb, k=10).toPandas()
    key = ["qid", "rnk"]
    e = exact.sort_values(key).reset_index(drop=True)
    f = fast.sort_values(key).reset_index(drop=True)
    assert len(e) == len(f)
    assert (e["qid"] == f["qid"]).all()
    assert (e["nid"] == f["nid"]).all()
    assert (e["cosine"] - f["cosine"]).abs().max() <= 2e-6


def numpy_kmeans(V, seed_ids, iterations=2):
    """Lloyd reference with the engine's determinism rules: cosine rounded
    to 6 before argmax, smaller-cid tie-break, per-dim mean rounded to 6."""
    Vd = V.astype(np.float64)
    norms = np.linalg.norm(Vd, axis=1)
    cents = {int(c): Vd[c].copy() for c in seed_ids}
    assign = None
    for _ in range(iterations):
        cids = sorted(cents)
        C = np.array([cents[c] for c in cids])
        cn = np.linalg.norm(C, axis=1)
        assign = {}
        for i in range(len(Vd)):
            best = max(
                range(len(cids)),
                key=lambda j: (
                    round(Vd[i] @ C[j] / (norms[i] * cn[j]), 6)
                    if norms[i] * cn[j] != 0
                    else -2.0,
                    -cids[j],
                ),
            )
            assign[i] = cids[best]
        cents = {}
        for cid in set(assign.values()):
            members = [i for i, c in assign.items() if c == cid]
            cents[cid] = np.round(Vd[members].mean(axis=0), 6)
    return cents, assign


def test_kmeans_train_matches_numpy_lloyd(vectors):
    from airflow_crypto_btc_spark.operators.similarity import kmeans_train

    V, df = vectors
    got = kmeans_train(df, seed_filter="vec_id % 25 = 7", iterations=2)
    pdf = got.toPandas()
    seed_ids = [i for i in range(N) if i % 25 == 7]
    cents, assign = numpy_kmeans(V, seed_ids, iterations=2)

    assert set(pdf["cid"]) == set(cents)
    counts = {c: sum(1 for a in assign.values() if a == c) for c in cents}
    for cid, grp in pdf.groupby("cid"):
        assert set(grp["pos"]) == set(range(1, DIM + 1))
        assert (grp["n_members"] == counts[cid]).all()
        vals = grp.sort_values("pos")["val"].to_numpy()
        np.testing.assert_allclose(vals, cents[cid], atol=2e-6)


def test_kmeans_improves_quantizer_recall(spark, sf_dir):
    """Trained centroids must not hurt ANN recall vs seed centroids (the
    whole point of training the coarse quantizer)."""
    from airflow_crypto_btc_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
        kmeans_centroid_arrays,
    )
    from airflow_crypto_btc_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    exact = cosine_topk(emb, k=10).toPandas()
    cent = kmeans_centroid_arrays(emb, iterations=2)
    trained = ivf_topk(emb, n_probe=4, k=10, centroids=cent).toPandas()
    seeded = ivf_topk(emb, n_probe=4, k=10).toPandas()

    exact_sets = exact.groupby("qid")["nid"].apply(set)

    def mean_recall(approx):
        sets = approx.groupby("qid")["nid"].apply(set)
        return sum(
            len(exact_sets[q] & sets.get(q, set())) / len(exact_sets[q])
            for q in exact_sets.index
        ) / len(exact_sets)

    r_trained, r_seeded = mean_recall(trained), mean_recall(seeded)
    assert r_trained >= 0.3
    assert r_trained >= r_seeded - 0.05  # training never craters recall


def test_lsh_topk_exhaustive_probe_equals_brute_force(vectors):
    """With max_hamming=None every bucket is probed, so the candidate set
    is the full table and lsh_topk must equal cosine_topk row for row."""
    from airflow_crypto_btc_spark.operators.similarity import lsh_topk

    _, df = vectors
    exact = cosine_topk(df, query_filter="vec_id < 5", k=8).toPandas()
    lsh = lsh_topk(
        df, planes=4, query_filter="vec_id < 5", k=8, max_hamming=None
    ).toPandas()
    key = ["qid", "rnk"]
    pdt = __import__("pandas").testing
    pdt.assert_frame_equal(
        lsh.sort_values(key).reset_index(drop=True),
        exact.sort_values(key).reset_index(drop=True),
    )


def test_lsh_topk_probe_sets_nest(vectors):
    """hamming-0 candidates ⊆ hamming-1 candidates ⊆ all, and every
    reported cosine equals the exact pair cosine (pruning never changes
    values, only candidate coverage)."""
    from airflow_crypto_btc_spark.operators.similarity import lsh_topk

    _, df = vectors
    got = {
        h: lsh_topk(
            df, planes=4, query_filter="vec_id < 5", k=60, max_hamming=h
        ).toPandas()
        for h in (0, 1, None)
    }
    pairs = {
        h: set(zip(g["qid"], g["nid"])) for h, g in got.items()
    }
    assert pairs[0] <= pairs[1] <= pairs[None]
    assert len(pairs[1]) > 0
    exact = {
        (r.qid, r.nid): r.cosine
        for r in cosine_topk(df, query_filter="vec_id < 5", k=60)
        .toPandas()
        .itertuples()
    }
    for r in got[1].itertuples():
        assert exact[(r.qid, r.nid)] == r.cosine


# ----------------------------- int8 quantization (round-2 wave)


def test_int8_quantize_bounds_and_zero_vector(spark):
    from airflow_crypto_btc_spark.operators.similarity import int8_quantize

    df = spark.createDataFrame(
        [
            (1, [1.0, -2.0, 0.5]),
            (2, [0.0, 0.0, 0.0]),  # zero vector: no scale
        ],
        "vec_id long, embedding array<float>",
    )
    rows = {r["vec_id"]: r for r in int8_quantize(df).collect()}
    assert rows[1]["q_vec"] == [64, -127, 32]  # 127/2 per unit
    assert max(abs(x) for x in rows[1]["q_vec"]) == 127
    assert rows[2]["q_vec"] is None and rows[2]["q_scale"] is None


def test_quantized_topk_recall_vs_exact(spark, sf_dir):
    """int8 quantization must preserve neighbor structure: recall@10 vs the
    exact float cosine top-k stays high on the fixture embeddings."""
    from airflow_crypto_btc_spark.operators.similarity import (
        cosine_topk,
        quantized_topk,
    )
    from airflow_crypto_btc_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    exact = cosine_topk(emb).collect()
    quant = quantized_topk(emb).collect()
    truth = {}
    for r in exact:
        truth.setdefault(r["qid"], set()).add(r["nid"])
    got = {}
    for r in quant:
        got.setdefault(r["qid"], set()).add(r["nid"])
    assert set(got) == set(truth)
    recalls = [
        len(truth[q] & got[q]) / len(truth[q]) for q in truth
    ]
    assert sum(recalls) / len(recalls) >= 0.8, recalls


def test_quantized_topk_plan_broadcasts_queries(spark, sf_dir):
    from airflow_crypto_btc_spark.operators.similarity import quantized_topk
    from airflow_crypto_btc_spark.sources.tables import load_table

    plan = (
        quantized_topk(load_table(spark, sf_dir, "embeddings"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "Python" not in plan


def test_pq_topk_recall_with_rerank(spark, sf_dir):
    """PQ-ADC shortlist + exact rerank must recover most of the exact
    top-10 (the production serving pattern: quantization error only
    affects which candidates ENTER the shortlist)."""
    from airflow_crypto_btc_spark.operators.similarity import (
        cosine_topk,
        pq_topk,
    )
    from airflow_crypto_btc_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    exact = cosine_topk(emb).collect()
    approx = pq_topk(emb).collect()
    truth, got = {}, {}
    for r in exact:
        truth.setdefault(r["qid"], set()).add(r["nid"])
    for r in approx:
        got.setdefault(r["qid"], set()).add(r["nid"])
    assert set(got) == set(truth)
    recalls = [len(truth[q] & got[q]) / len(truth[q]) for q in truth]
    mean_recall = sum(recalls) / len(recalls)
    # 0.925 observed at sf0.01 after fixing self-exclusion to per-pair
    # (nid != qid) — a blanket isin(qids) exclusion cost ~0.035 recall
    assert mean_recall >= 0.85, (mean_recall, recalls)
    # reranked cosines are EXACT: any overlapping (qid, nid) pair agrees
    exact_cos = {(r["qid"], r["nid"]): r["cosine"] for r in exact}
    for r in approx:
        key = (r["qid"], r["nid"])
        if key in exact_cos:
            assert r["cosine"] == exact_cos[key]


def test_pq_codebooks_deterministic(spark, sf_dir):
    import numpy as np

    from airflow_crypto_btc_spark.operators.similarity import (
        pq_train_codebooks,
    )
    from airflow_crypto_btc_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    b1 = pq_train_codebooks(emb)
    b2 = pq_train_codebooks(emb)
    assert len(b1) == 4  # trainer default m stays 4
    for a, b in zip(b1, b2):
        np.testing.assert_array_equal(a, b)


def test_pq_codebooks_persist_roundtrip(spark, sf_dir, tmp_path):
    """Offline-train/online-serve: books saved to a snapshot table and
    loaded back must be bit-identical, and pq_topk served from the
    loaded books must equal pq_topk that trains fresh."""
    import numpy as np

    from airflow_crypto_btc_spark.operators.similarity import (
        pq_load_codebooks,
        pq_save_codebooks,
        pq_topk,
        pq_train_codebooks,
    )
    from airflow_crypto_btc_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    books = pq_train_codebooks(emb, m=8, sample_cap=50000)
    table = str(tmp_path / "pq_books")
    pq_save_codebooks(spark, books, table)
    loaded = pq_load_codebooks(spark, table)
    assert len(loaded) == len(books)
    for a, b in zip(books, loaded):
        np.testing.assert_array_equal(a, b)
    fresh = {tuple(r) for r in pq_topk(emb).collect()}
    served = {tuple(r) for r in pq_topk(emb, books=loaded).collect()}
    assert fresh == served and served


def test_pq_sampled_training_matches_oracle(spark, sf_dir):
    """With a cap SMALL enough to actually sample (cap=100 over 500
    vectors → pmod(id, 5) = 0 training slice), the full pipeline must
    still match the DuckDB replay bit-for-bit — proving the SQL's
    sampling rule is the engine's, not an approximation — and keep
    usable recall versus the exact operator."""
    import duckdb

    from airflow_crypto_btc_spark.operators.similarity import (
        cosine_topk,
        pq_topk,
    )
    from airflow_crypto_btc_spark.plans.registry_ml import _pq_topk_sql
    from airflow_crypto_btc_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    got = {
        (r["qid"], r["nid"], r["cosine"], r["rnk"])
        for r in pq_topk(emb, sample_cap=100).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS "
        f"SELECT * FROM '{sf_dir}/embeddings.parquet'"
    )
    want = {
        (r[0], r[1], r[2], r[3])
        for r in con.execute(_pq_topk_sql(sample_cap=100)).fetchall()
    }
    assert got == want and got
    truth, approx = {}, {}
    for r in cosine_topk(emb).collect():
        truth.setdefault(r["qid"], set()).add(r["nid"])
    for q, n, _, _ in got:
        approx.setdefault(q, set()).add(n)
    recalls = [
        len(truth[q] & approx.get(q, set())) / len(truth[q]) for q in truth
    ]
    # codebooks from a 20% slice still recover most of the exact top-10
    assert sum(recalls) / len(recalls) >= 0.7, recalls


def test_pq_train_corpus_rows_from_stats(spark, sf_dir):
    """The sampling modulus must be derivable from table statistics
    (parquet footers) with NO count() pre-pass: stats-provided
    corpus_rows trains bit-identical codebooks to the counting
    fallback, and the stats value itself equals the scan count."""
    import os

    from airflow_crypto_btc_spark.operators.similarity import (
        pq_train_codebooks,
    )
    from airflow_crypto_btc_spark.sources.tables import (
        load_table,
        parquet_row_count,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    n = parquet_row_count(os.path.join(sf_dir, "embeddings.parquet"))
    assert n == emb.count()  # footers are exact, not an estimate
    b_stat = pq_train_codebooks(
        emb, m=8, sample_cap=100, corpus_rows=n
    )
    b_scan = pq_train_codebooks(emb, m=8, sample_cap=100)
    assert all(
        np.array_equal(x, y) for x, y in zip(b_stat, b_scan)
    ) and len(b_stat) == 8
    # the parameter is honored: a different n shifts the deterministic
    # modulus and therefore the trained books
    b_other = pq_train_codebooks(
        emb, m=8, sample_cap=100, corpus_rows=3 * n
    )
    assert not all(
        np.array_equal(x, y) for x, y in zip(b_stat, b_other)
    )


def test_pq_topk_batch_invariant(spark, sf_dir):
    """The PQ shortlist must not depend on how the corpus is batched:
    a single-partition run (query's own row shares the batch with ALL
    its candidates — the self-row-displacement case) must equal the
    default multi-partition run."""
    from airflow_crypto_btc_spark.operators.similarity import pq_topk
    from airflow_crypto_btc_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    multi = {
        tuple(r) for r in pq_topk(emb).collect()
    }
    single = {
        tuple(r) for r in pq_topk(emb.coalesce(1)).collect()
    }
    assert multi == single and multi


def test_ann_index_persist_probe_matches_inplan(spark, sf_dir, tmp_path):
    """Serving from the persisted hyperplane index must equal the
    in-plan multi-probe operator row-for-row, and a stale source
    version must be refused before any data read."""
    import pytest as _pytest

    from airflow_crypto_btc_spark.operators.similarity import (
        build_ann_index,
        lsh_topk,
        lsh_topk_from_index,
    )
    from airflow_crypto_btc_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    table = str(tmp_path / "ann")
    build_ann_index(spark, emb, table, source_version="emb@v1", planes=4)
    served = {
        tuple(r)
        for r in lsh_topk_from_index(
            spark, table, emb.filter("vec_id < 20"),
            planes=4, k=10, max_hamming=1, expect_source="emb@v1",
        ).collect()
    }
    inplan = {
        tuple(r)
        for r in lsh_topk(
            emb, planes=4, query_filter="vec_id < 20",
            k=10, max_hamming=1,
        ).collect()
    }
    assert served == inplan and served
    with _pytest.raises(ValueError, match="stale ANN index"):
        lsh_topk_from_index(
            spark, table, emb.filter("vec_id < 20"),
            planes=4, expect_source="emb@v2",
        )


def test_ann_index_build_skew_audit(spark, tmp_path):
    """A degenerate corpus concentrates the STORED index into one
    sign-bucket: the build must record the bucket census in commit meta
    and warn at build time (not leave it to query-time discovery); a
    balanced corpus must build silently."""
    import warnings as _warnings

    import pytest as _pytest

    from airflow_crypto_btc_spark.operators.similarity import (
        ann_index_skew_report,
        build_ann_index,
        lsh_topk_from_index,
    )

    rng = np.random.RandomState(23)
    n, dim = 200, 16
    V = rng.randn(n, dim).astype(np.float64)
    balanced = spark.createDataFrame(
        [(i, V[i].tolist()) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    t_ok = str(tmp_path / "ann_ok")
    with _warnings.catch_warnings():
        _warnings.simplefilter("error")  # any warning fails the build
        build_ann_index(spark, balanced, t_ok, "v1", planes=4)
    stats = ann_index_skew_report(t_ok)
    assert stats["total_rows"] == n
    assert 0 < stats["max_bucket"] <= 0.2 * n
    assert stats["nonempty_buckets"] > 1

    V[: n // 2] = np.full(dim, 3.0)  # 50% identical → one hot bucket
    skewed = spark.createDataFrame(
        [(i, V[i].tolist()) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    t_hot = str(tmp_path / "ann_hot")
    with _pytest.warns(UserWarning, match="ANN index skew"):
        build_ann_index(spark, skewed, t_hot, "v1", planes=4)
    stats = ann_index_skew_report(t_hot)
    assert stats["max_bucket"] >= n // 2
    assert stats["hot_bucket"] is not None
    # the index still serves correctly — the audit observes, never drops
    out = lsh_topk_from_index(
        spark, t_hot, skewed.filter("vec_id >= 198"),
        planes=4, k=5, expect_source="v1",
    ).collect()
    assert out


def test_ann_index_rebuild_and_planes_pinning(spark, sf_dir, tmp_path):
    """Rebuild replaces the previous generation (no doubled top-k rows),
    and probing with a different planes value than the index was built
    with fails loudly instead of returning an empty result."""
    import pytest as _pytest

    from airflow_crypto_btc_spark.operators.similarity import (
        build_ann_index,
        lsh_topk,
        lsh_topk_from_index,
    )
    from airflow_crypto_btc_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    table = str(tmp_path / "ann")
    build_ann_index(
        spark, emb.filter("vec_id < 100"), table,
        source_version="v1", planes=4,
    )
    build_ann_index(spark, emb, table, source_version="v2", planes=4)
    served = {
        tuple(r)
        for r in lsh_topk_from_index(
            spark, table, emb.filter("vec_id < 20"),
            planes=4, k=10, max_hamming=1, expect_source="v2",
        ).collect()
    }
    inplan = {
        tuple(r)
        for r in lsh_topk(
            emb, planes=4, query_filter="vec_id < 20",
            k=10, max_hamming=1,
        ).collect()
    }
    assert served == inplan and served
    with _pytest.raises(ValueError, match="planes"):
        lsh_topk_from_index(
            spark, table, emb.filter("vec_id < 20"),
            planes=8, expect_source="v2",
        )


def test_pq_index_serving_matches_fresh(spark, sf_dir, tmp_path):
    """Serving from persisted books+codes must be bit-identical to the
    fresh pq_topk pipeline, a partial rebuild (books/codes version
    mismatch) is refused, and so is a stale expectation."""
    import pytest as _pytest

    from airflow_crypto_btc_spark.operators.similarity import (
        pq_save_index,
        pq_topk,
        pq_topk_from_index,
    )
    from airflow_crypto_btc_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    root = str(tmp_path / "pq_index")
    pq_save_index(spark, emb, root, source_version="v1", m=8)
    served = {
        tuple(r)
        for r in pq_topk_from_index(
            spark, root, emb, expect_source="v1"
        ).collect()
    }
    fresh = {tuple(r) for r in pq_topk(emb).collect()}
    assert served == fresh and served
    with _pytest.raises(ValueError, match="stale PQ index"):
        pq_topk_from_index(spark, root, emb, expect_source="v2")
    # partial rebuild: books at v2, codes still v1 → refused
    from airflow_crypto_btc_spark.operators.similarity import (
        pq_train_codebooks,
    )
    from airflow_crypto_btc_spark.sources.snapshot_table import overwrite

    books = pq_train_codebooks(emb, m=8, sample_cap=50000)
    rows = [
        (s, r, [float(x) for x in book[r]])
        for s, book in enumerate(books)
        for r in range(book.shape[0])
    ]
    overwrite(
        spark,
        spark.createDataFrame(rows, "s int, rnk int, ce array<double>"),
        root + "/books",
        meta={"source_version": "v2", "m": 8},
    )
    with _pytest.raises(ValueError, match="disagree"):
        pq_topk_from_index(spark, root, emb)


# ------------------------------------------------------- semantic purge


def _numpy_semantic_purge(V, seed_ids, threshold):
    """Reference SemDeDup labeling: nearest-seed assignment (6-dp cosine,
    cid tie-break) then min-smaller-id dup within each cluster."""
    Vd = V.astype(np.float64)
    n = Vd / np.linalg.norm(Vd, axis=1, keepdims=True)
    assign = {}
    for i in range(len(V)):
        best = min(
            seed_ids, key=lambda c: (-round(float(n[i] @ n[c]), 6), c)
        )
        assign[i] = best
    out = {}
    for i in range(len(V)):
        mates = [
            j
            for j in range(i)
            if assign[j] == assign[i]
            and round(float(n[i] @ n[j]), 6) >= threshold
        ]
        out[i] = (assign[i], min(mates) if mates else None)
    return out


def test_semantic_purge_matches_numpy(vectors):
    from airflow_crypto_btc_spark.operators.similarity import semantic_purge

    V, df = vectors
    seed_ids = [i for i in range(N) if i % 7 == 2]
    got = semantic_purge(
        df, centroid_filter="vec_id % 7 = 2", cosine_threshold=0.5
    ).collect()
    expected = _numpy_semantic_purge(V, seed_ids, 0.5)
    assert len(got) == N
    for r in got:
        cid, dup_of = expected[r["vec_id"]]
        assert r["cid"] == cid, r
        assert r["dup_of"] == dup_of, r
        assert r["keep"] == (dup_of is None), r
    # the purge is non-degenerate on this fixture: some rows dropped,
    # some kept, and the planted near-dup pair collapsed
    dropped = {r["vec_id"] for r in got if not r["keep"]}
    assert dropped and len(dropped) < N


def test_semantic_purge_trained_centroids_catch_planted_dup(vectors):
    """With a TRAINED quantizer (kmeans_centroid_arrays) the planted
    near-identical pair (3, 7) lands in one cluster and 7 purges as a
    dup of 3 at a high threshold; everything else survives."""
    from airflow_crypto_btc_spark.operators.similarity import (
        kmeans_centroid_arrays,
        semantic_purge,
    )

    V, df = vectors
    cents = kmeans_centroid_arrays(df, seed_filter="vec_id % 7 = 2")
    out = {
        r["vec_id"]: r
        for r in semantic_purge(
            df, centroids=cents, cosine_threshold=0.99
        ).collect()
    }
    assert len(out) == N
    assert out[7]["dup_of"] == 3 and not out[7]["keep"]
    assert all(r["keep"] for i, r in out.items() if i != 7)
    # labeling invariants: dup_of always names a smaller same-cluster id
    for r in out.values():
        if r["dup_of"] is not None:
            assert r["dup_of"] < r["vec_id"]
            assert out[r["dup_of"]]["cid"] == r["cid"]


def test_semantic_purge_cluster_cap_skips_hot_cluster(spark):
    """Engineered semantic skew: 20% of the corpus is one identical
    vector -> one cluster holds the whole block.  The cap must skip that
    cluster WHOLE (its members all keep=true, not silently vanish), leave
    other clusters' purges untouched, report through the accounting twin,
    and be a no-op when generous."""
    from airflow_crypto_btc_spark.operators.similarity import (
        semantic_purge,
        semantic_purge_skipped_clusters,
    )

    rng = np.random.RandomState(23)
    n, dim, hot = 100, 8, 20
    V = rng.randn(n, dim).astype(np.float64)
    V[:hot] = np.full(dim, 1.0)
    df = spark.createDataFrame(
        [(i, V[i].tolist()) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    kw = dict(centroid_filter="vec_id % 10 = 0", cosine_threshold=0.5)
    uncapped = {
        r["vec_id"]: r for r in semantic_purge(df, **kw).collect()
    }
    capped = {
        r["vec_id"]: r
        for r in semantic_purge(df, max_cluster_size=15, **kw).collect()
    }
    assert len(capped) == n  # skipped members still labeled
    report = semantic_purge_skipped_clusters(
        df, centroid_filter="vec_id % 10 = 0", max_cluster_size=15
    ).collect()
    assert report and all(r["cluster_size"] > 15 for r in report)
    skipped = {r["cid"] for r in report}
    hot_cid = uncapped[0]["cid"]
    assert hot_cid in skipped
    for i, r in capped.items():
        assert r["cid"] == uncapped[i]["cid"]  # assignment unchanged
        if r["cid"] in skipped:
            assert r["keep"] and r["dup_of"] is None
        else:
            assert r["dup_of"] == uncapped[i]["dup_of"]
            assert r["keep"] == uncapped[i]["keep"]
    # the identical block deduped uncapped, but survived under the cap
    assert not uncapped[1]["keep"] and capped[1]["keep"]
    # a generous cap changes nothing
    generous = {
        r["vec_id"]: (r["cid"], r["dup_of"], r["keep"])
        for r in semantic_purge(df, max_cluster_size=n, **kw).collect()
    }
    assert generous == {
        i: (r["cid"], r["dup_of"], r["keep"]) for i, r in uncapped.items()
    }


def test_semantic_index_roundtrip_identity(vectors, spark, tmp_path):
    """labeling(corpus) == labeling(old) ∪ delta-probe(Δ) EXACTLY, with
    the index passing through its persisted snapshot-table form."""
    from airflow_crypto_btc_spark.operators.similarity import (
        build_semantic_index,
        semantic_purge,
        semantic_purge_delta,
        semantic_purge_from_tables,
    )

    V, df = vectors
    old, delta = df.filter("vec_id < 40"), df.filter("vec_id >= 40")
    seeds = old.filter("vec_id % 7 = 2").selectExpr(
        "vec_id AS cid", "embedding AS ce"
    )
    ct, mt = str(tmp_path / "centroids"), str(tmp_path / "members")
    build_semantic_index(
        spark, old, ct, mt, source_version="v1",
        centroid_filter="vec_id % 7 = 2",
    )
    full = {
        r["vec_id"]: (r["cid"], r["dup_of"], r["keep"])
        for r in semantic_purge(
            df, centroids=seeds, cosine_threshold=0.5
        ).collect()
    }
    old_lab = semantic_purge(
        old, centroids=seeds, cosine_threshold=0.5
    ).collect()
    delta_lab = semantic_purge_from_tables(
        spark, ct, mt, delta, cosine_threshold=0.5, expect_source="v1"
    ).collect()
    got = {
        r["vec_id"]: (r["cid"], r["dup_of"], r["keep"])
        for r in old_lab + delta_lab
    }
    assert got == full and len(got) == N
    # some delta row deduped against an OLD member (the decomposition's
    # interesting case actually exercised, not vacuously true)
    assert any(
        r["dup_of"] is not None and r["dup_of"] < 40 for r in delta_lab
    )
    # the frame-level core gives the same answer as the table path
    from airflow_crypto_btc_spark.sources.snapshot_table import (
        read_snapshot,
    )

    direct = semantic_purge_delta(
        read_snapshot(spark, ct), read_snapshot(spark, mt), delta,
        cosine_threshold=0.5,
    ).collect()
    assert {
        r["vec_id"]: (r["cid"], r["dup_of"], r["keep"]) for r in direct
    } == {
        r["vec_id"]: (r["cid"], r["dup_of"], r["keep"]) for r in delta_lab
    }


def test_semantic_index_pinning_refusals(vectors, spark, tmp_path):
    from airflow_crypto_btc_spark.operators.similarity import (
        build_semantic_index,
        semantic_purge_from_tables,
    )

    V, df = vectors
    old, delta = df.filter("vec_id < 40"), df.filter("vec_id >= 40")
    ct, mt = str(tmp_path / "centroids"), str(tmp_path / "members")
    build_semantic_index(
        spark, old, ct, mt, source_version="v1",
        centroid_filter="vec_id % 7 = 2",
    )
    # stale: caller expects a newer corpus version
    with pytest.raises(ValueError, match="stale semantic index"):
        semantic_purge_from_tables(
            spark, ct, mt, delta, expect_source="v2"
        )
    # interleaved delta id <= indexed max_id → refused (old labelings
    # would silently change)
    with pytest.raises(ValueError, match="append-only"):
        semantic_purge_from_tables(
            spark, ct, mt, df.filter("vec_id >= 39"), expect_source="v1"
        )
    # mixed generation: centroids rebuilt at v2, members still v1
    ct2 = str(tmp_path / "centroids2")
    build_semantic_index(
        spark, old, ct2, mt + "_scratch", source_version="v2",
        centroid_filter="vec_id % 7 = 2",
    )
    with pytest.raises(ValueError, match="mixed-generation"):
        semantic_purge_from_tables(spark, ct2, mt, delta)
    # trained centroids without a model version tag → refused at build
    with pytest.raises(ValueError, match="quantizer version"):
        build_semantic_index(
            spark, old, ct, mt, source_version="v1",
            centroids=old.selectExpr("vec_id AS cid", "embedding AS ce"),
        )


def test_semantic_index_skew_warning_and_delta_cap(spark, tmp_path):
    """A hot cluster (identical boilerplate) warns at BUILD time and is
    capped on the member side at PROBE time — delta rows landing there
    lose stored mates but still dedup among themselves."""
    import warnings as _w

    from airflow_crypto_btc_spark.operators.similarity import (
        build_semantic_index,
        semantic_purge_from_tables,
    )

    rng = np.random.RandomState(31)
    n, dim, hot = 50, 8, 20
    V = rng.randn(n, dim).astype(np.float64)
    V[:hot] = np.full(dim, 1.0)  # 40% identical → one hot cluster
    old = spark.createDataFrame(
        [(i, V[i].tolist()) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    ct, mt = str(tmp_path / "c"), str(tmp_path / "m")
    with pytest.warns(UserWarning, match="semantic index skew"):
        build_semantic_index(
            spark, old, ct, mt, source_version="v1",
            centroid_filter="vec_id % 10 = 0",
        )
    from airflow_crypto_btc_spark.operators.similarity import (
        semantic_purge_skipped_clusters,
    )
    from airflow_crypto_btc_spark.sources.snapshot_table import (
        current_snapshot,
    )

    stats = current_snapshot(mt).meta["cluster_stats"]
    assert stats["total_rows"] == n and stats["max_cluster"] >= hot
    # two identical delta arrivals: uncapped they dup against stored
    # members; with the hot cluster capped out they dup only each other
    delta = spark.createDataFrame(
        [(100, np.full(dim, 1.0).tolist()),
         (101, np.full(dim, 1.0).tolist())],
        "vec_id long, embedding array<double>",
    )
    with _w.catch_warnings():
        _w.simplefilter("ignore")
        uncapped = {
            r["vec_id"]: r["dup_of"]
            for r in semantic_purge_from_tables(
                spark, ct, mt, delta, cosine_threshold=0.9
            ).collect()
        }
        capped = {
            r["vec_id"]: r["dup_of"]
            for r in semantic_purge_from_tables(
                spark, ct, mt, delta, cosine_threshold=0.9,
                max_cluster_size=10,
            ).collect()
        }
    assert uncapped[100] == 0 and uncapped[101] == 0
    assert capped[100] is None  # stored mates capped away, no smaller Δ
    assert capped[101] == 100  # still dedups against the smaller arrival


def test_ivf_from_tables_matches_inplan(vectors, spark, tmp_path):
    """Serving from the persisted inverted lists reproduces the in-plan
    ivf_topk exactly (same centroid set), and the shared meta gate
    refuses a mixed-generation index."""
    from airflow_crypto_btc_spark.operators.similarity import (
        build_semantic_index,
        ivf_topk,
        ivf_topk_from_tables,
    )

    V, df = vectors
    ct, mt = str(tmp_path / "cent"), str(tmp_path / "members")
    build_semantic_index(
        spark, df, ct, mt, source_version="v1",
        centroid_filter="vec_id % 7 = 2",
    )
    got = {
        (r["qid"], r["rnk"]): (r["nid"], r["cosine"])
        for r in ivf_topk_from_tables(
            spark, ct, mt, df.filter("vec_id < 5"), n_probe=3, k=8,
            expect_source="v1",
        ).collect()
    }
    want = {
        (r["qid"], r["rnk"]): (r["nid"], r["cosine"])
        for r in ivf_topk(
            df, centroid_filter="vec_id % 7 = 2",
            query_filter="vec_id < 5", n_probe=3, k=8,
        ).collect()
    }
    assert got == want and got
    with pytest.raises(ValueError, match="stale semantic index"):
        ivf_topk_from_tables(
            spark, ct, mt, df.filter("vec_id < 5"), expect_source="v9"
        )
    # mixed generation: centroids from a different build
    ct2 = str(tmp_path / "cent2")
    build_semantic_index(
        spark, df, ct2, mt + "_scratch", source_version="v2",
        centroid_filter="vec_id % 7 = 2",
    )
    with pytest.raises(ValueError, match="mixed-generation"):
        ivf_topk_from_tables(spark, ct2, mt, df.filter("vec_id < 5"))


def test_nearest_centroid_assignment_tie_and_null_semantics(spark):
    """The keep=1 assignment aggregate must reproduce the window's
    (cosine desc-nulls-last, cid asc) contract on its two edge cases:
    exact cosine ties break toward the smallest cid, and a zero-norm
    vector (every cosine NULL) assigns to the smallest cid."""
    from airflow_crypto_btc_spark.operators.similarity import (
        _nearest_centroids,
        _vector_kernels,
    )

    df = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),   # equidistant from the twin centroids
            (1, [0.0, 0.0]),   # zero norm: all cosines NULL
            (2, [0.0, 1.0]),   # clearly nearest centroid 9
        ],
        "vec_id long, embedding array<double>",
    )
    cent = spark.createDataFrame(
        # cids deliberately unsorted; 7 and 3 are identical vectors
        [(7, [1.0, 1.0]), (3, [1.0, 1.0]), (9, [0.0, 2.0])],
        "cid long, ce array<double>",
    )
    dot, nrm2, _dim = _vector_kernels(df, "embedding")
    got = {
        r["id"]: r["cid"]
        for r in _nearest_centroids(
            df.selectExpr("vec_id AS id", "embedding AS e"),
            cent.withColumn("cn", F.sqrt(nrm2("ce"))),
            dot,
            nrm2,
            "id",
            "e",
            keep=1,
        ).collect()
    }
    assert got == {0: 3, 1: 3, 2: 9}


def test_semantic_delta_plan_prunes_index_map_side(vectors, spark, tmp_path):
    """The delta labeling must semi-join the index down to the delta's
    touched clusters via a BROADCAST join (map-side — the index is
    never shuffled for the prune): the checkpointed delta leaf carries
    no stats, so this is pinned as a plan regression test, not left to
    the planner."""
    from airflow_crypto_btc_spark.operators.similarity import (
        build_semantic_index,
        semantic_purge_delta,
    )
    from airflow_crypto_btc_spark.sources.snapshot_table import (
        read_snapshot,
    )

    V, df = vectors
    ct, mt = str(tmp_path / "cent"), str(tmp_path / "members")
    build_semantic_index(
        spark, df.filter("vec_id < 40"), ct, mt, source_version="v1",
        centroid_filter="vec_id % 7 = 2",
    )
    plan = (
        semantic_purge_delta(
            read_snapshot(spark, ct),
            read_snapshot(spark, mt),
            df.filter("vec_id >= 40"),
            cosine_threshold=0.5,
        )
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "LeftSemi" in plan and "Broadcast" in plan
    assert "Python" not in plan


def test_ivf_from_tables_prunes_clustered_files(vectors, spark, tmp_path):
    """With the members table cid-clustered by compaction, a narrow
    probe must OPEN fewer files than the table holds (log-level
    skipping) while returning exactly the unpruned answer."""
    from airflow_crypto_btc_spark.operators.similarity import (
        build_semantic_index,
        ivf_topk_from_tables,
    )
    from airflow_crypto_btc_spark.sources.snapshot_table import (
        compact,
        current_snapshot,
    )

    V, df = vectors
    ct, mt = str(tmp_path / "cent"), str(tmp_path / "members")
    build_semantic_index(
        spark, df, ct, mt, source_version="v1",
        centroid_filter="vec_id % 7 = 2",
    )
    compact(spark, mt, target_parts=4, cluster_by=["cid"])
    n_parts = len(current_snapshot(mt).files)
    assert n_parts >= 3  # clustering produced a real multi-file layout
    q = df.filter("vec_id = 2")  # one query, n_probe=1 → one cid
    pruned = ivf_topk_from_tables(
        spark, ct, mt, q, n_probe=1, k=5,
    )
    unpruned = ivf_topk_from_tables(
        spark, ct, mt, q, n_probe=1, k=5, prune_lists=False,
    )
    key = lambda rows: [  # noqa: E731
        (r["qid"], r["rnk"], r["nid"], r["cosine"]) for r in rows
    ]
    assert key(pruned.collect()) == key(unpruned.collect())
    opened = {
        f for f in pruned.inputFiles() if f"members" in f
    }
    assert 0 < len(opened) < n_parts


def test_lsh_from_index_prunes_clustered_files(vectors, spark, tmp_path):
    """Same physical-pruning contract as the IVF path, on the hyperplane
    index: with the index bnum-clustered by compaction, a single-bucket
    probe opens fewer files than the table holds and returns exactly
    the unpruned answer."""
    from airflow_crypto_btc_spark.operators.similarity import (
        build_ann_index,
        lsh_topk_from_index,
    )
    from airflow_crypto_btc_spark.sources.snapshot_table import (
        compact,
        current_snapshot,
    )

    V, df = vectors
    t = str(tmp_path / "ann")
    build_ann_index(spark, df, t, source_version="v1", planes=4)
    compact(spark, t, target_parts=4, cluster_by=["bnum"])
    n_parts = len(current_snapshot(t).files)
    assert n_parts >= 3
    q = df.filter("vec_id = 0")
    kw = dict(planes=4, k=5, max_hamming=0)  # exactly one probed bucket
    pruned = lsh_topk_from_index(spark, t, q, **kw)
    unpruned = lsh_topk_from_index(
        spark, t, q, prune_buckets=False, **kw
    )
    key = lambda rows: [  # noqa: E731
        (r["qid"], r["rnk"], r["nid"], r["cosine"]) for r in rows
    ]
    assert key(pruned.collect()) == key(unpruned.collect())
    assert 0 < len(set(pruned.inputFiles())) < n_parts


def test_semantic_delta_prunes_untouched_cluster_files(
    vectors, spark, tmp_path
):
    """The table-path delta purge must SKIP the files of clusters the
    delta never touches (file-level skipping matching the plan-level
    semi-join), including files BETWEEN two touched clusters — scattered
    multi-range pruning — while labeling the delta exactly as the
    unpruned read does."""
    from airflow_crypto_btc_spark.operators.similarity import (
        build_semantic_index,
        semantic_purge_from_tables,
    )
    from airflow_crypto_btc_spark.sources.snapshot_table import (
        compact,
        current_snapshot,
    )

    V, df = vectors
    ct, mt = str(tmp_path / "cent"), str(tmp_path / "members")
    build_semantic_index(
        spark, df, ct, mt, source_version="v1",
        centroid_filter="vec_id % 7 = 2",  # cids 2, 9, ..., 58
    )
    compact(spark, mt, target_parts=4, cluster_by=["cid"])
    n_parts = len(current_snapshot(mt).files)
    assert n_parts >= 4
    # delta rows = copies of the FIRST and LAST centroids with fresh ids
    # (> max_id): they assign to cids {2, 58}, the ends of the clustered
    # key range — the [2, 58] envelope would keep every file
    delta = spark.createDataFrame(
        [(100, V[2].tolist()), (101, V[58].tolist())],
        "vec_id long, embedding array<float>",
    )
    pruned = semantic_purge_from_tables(
        spark, ct, mt, delta, cosine_threshold=0.5
    )
    unpruned = semantic_purge_from_tables(
        spark, ct, mt, delta, cosine_threshold=0.5, prune_clusters=False
    )
    key = lambda rows: sorted(  # noqa: E731
        (r["vec_id"], r["cid"], r["dup_of"], r["keep"]) for r in rows
    )
    got = key(pruned.collect())
    assert got == key(unpruned.collect())
    # both delta rows are exact copies of indexed vectors → labeled dups
    assert [r[3] for r in got] == [False, False]
    opened = {f for f in pruned.inputFiles() if "members" in f}
    assert 0 < len(opened) < n_parts


def test_probe_concurrent_with_compaction_sees_one_generation(
    vectors, spark, tmp_path
):
    """A serving probe racing a clustered compaction commit on the SAME
    index table must observe exactly one generation — old or new, never
    a mix and never a dead-file read.  Three commit-crossing shapes:
    (a) a free-running prober thread while compact+vacuum cycles run,
    (b) a probe PLANNED before each compaction and EXECUTED after its
    vacuum (the in-flight reader the vacuum horizon protects), and
    (c) a fresh post-everything probe.  All must equal the pre-race
    answer: both generations hold identical rows by construction, so
    any mix/partial read would change the top-k."""
    import threading

    from airflow_crypto_btc_spark.operators.similarity import (
        build_ann_index,
        lsh_topk_from_index,
    )
    from airflow_crypto_btc_spark.sources.snapshot_table import (
        compact,
        vacuum,
    )

    V, df = vectors
    t = str(tmp_path / "ann")
    build_ann_index(spark, df, t, source_version="v1", planes=4)
    q = df.filter("vec_id < 4")
    kw = dict(planes=4, k=5, max_hamming=1)
    key = lambda rows: sorted(  # noqa: E731
        (r["qid"], r["rnk"], r["nid"], r["cosine"]) for r in rows
    )
    ref = key(lsh_topk_from_index(spark, t, q, **kw).collect())
    assert ref  # non-degenerate: the race has something to corrupt

    probed, errs = [], []
    stop = threading.Event()

    def prober():
        while not stop.is_set():
            try:
                probed.append(
                    key(lsh_topk_from_index(spark, t, q, **kw).collect())
                )
            except Exception as exc:  # noqa: BLE001 — recorded, asserted
                errs.append(exc)
                return

    th = threading.Thread(target=prober)
    th.start()
    try:
        for parts in (3, 5, 2):
            # plan against the CURRENT snapshot, execute after the next
            # compaction has committed and vacuumed — keep_versions=3
            # gives an in-flight reader two commits of grace, the same
            # horizon contract vacuum documents
            spanning = lsh_topk_from_index(spark, t, q, **kw)
            compact(spark, t, target_parts=parts, cluster_by=["bnum"])
            vacuum(t, keep_versions=3)
            assert key(spanning.collect()) == ref
    finally:
        stop.set()
        th.join()
    assert not errs
    assert probed and all(r == ref for r in probed)
    assert key(lsh_topk_from_index(spark, t, q, **kw).collect()) == ref


def test_ivf_scattered_probe_prunes_between_ranges(
    vectors, spark, tmp_path
):
    """A SCATTERED probe set (two cids at the extremes of the domain)
    must skip the cid-clustered files BETWEEN them — the round-7
    single-envelope prune collapsed {min, max} to [min, max] and kept
    every file — while returning exactly the unpruned answer."""
    from airflow_crypto_btc_spark.operators.similarity import (
        build_semantic_index,
        ivf_topk_from_tables,
    )
    from airflow_crypto_btc_spark.sources.snapshot_table import (
        compact,
        current_snapshot,
    )

    V, df = vectors
    ct, mt = str(tmp_path / "cent"), str(tmp_path / "members")
    build_semantic_index(
        spark, df, ct, mt, source_version="v1",
        centroid_filter="vec_id % 7 = 2",  # cids 2, 9, ..., 58
    )
    compact(spark, mt, target_parts=4, cluster_by=["cid"])
    n_parts = len(current_snapshot(mt).files)
    assert n_parts >= 4
    # each query IS its centroid → n_probe=1 assigns it to itself:
    # probed cids = {2, 58}, the two ends of the clustered key range
    q = df.filter("vec_id in (2, 58)")
    pruned = ivf_topk_from_tables(spark, ct, mt, q, n_probe=1, k=5)
    unpruned = ivf_topk_from_tables(
        spark, ct, mt, q, n_probe=1, k=5, prune_lists=False,
    )
    key = lambda rows: [  # noqa: E731
        (r["qid"], r["rnk"], r["nid"], r["cosine"]) for r in rows
    ]
    assert key(pruned.collect()) == key(unpruned.collect())
    opened = {f for f in pruned.inputFiles() if "members" in f}
    # the [2, 58] envelope spans every part; per-cid ranges must not
    assert 0 < len(opened) < n_parts


def test_centroid_drift_zero_on_self_and_signed_on_skew(spark, vectors):
    from airflow_crypto_btc_spark.operators.similarity import (
        centroid_drift_report,
        kmeans_centroid_arrays,
    )

    _, df = vectors
    # arrival slice == reference corpus: zero drift in every centroid
    same = centroid_drift_report(
        df, df, centroid_filter="vec_id % 10 = 1"
    ).collect()
    assert len(same) > 1
    assert {r["drift_micro"] for r in same} == {0}
    assert all(r["ref_share"] == r["arr_share"] for r in same)
    # skewed arrivals: signed drifts, summing to ~0 (partition of unity)
    skew = centroid_drift_report(
        df, df.filter("vec_id % 4 = 2"), centroid_filter="vec_id % 10 = 1"
    ).collect()
    assert any(r["drift_micro"] != 0 for r in skew)
    assert abs(sum(r["drift_micro"] for r in skew)) <= len(skew)
    # every centroid row survives even when arrivals miss it entirely
    assert sum(r["arr_n"] for r in skew) == 15
    assert sum(r["ref_n"] for r in skew) == 60
    # trained-quantizer mode: same report shape under kmeans centroids
    trained = centroid_drift_report(
        df,
        df.filter("vec_id % 4 = 2"),
        centroids=kmeans_centroid_arrays(
            df, seed_filter="vec_id % 15 = 1", iterations=2
        ),
    ).collect()
    assert len(trained) <= 4
    assert abs(sum(r["drift_micro"] for r in trained)) <= len(trained)


def test_rrf_topk_rank_fusion_semantics(spark):
    from airflow_crypto_btc_spark.operators.similarity import rrf_topk

    la = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)], ["qid", "nid", "rnk"]
    )
    lb = spark.createDataFrame(
        [(1, 11, 1), (1, 13, 2)], ["qid", "nid", "rnk"]
    )
    got = {
        r["nid"]: (r["rrf_micro"], r["n_lists"], r["rnk"])
        for r in rrf_topk([la, lb], k=10).collect()
    }
    m = lambda r: (2 * 1_000_000 + (60 + r)) // (2 * (60 + r))
    # doc 11 appears in both lists (ranks 2 and 1) and must fuse on top
    assert got[11] == (m(2) + m(1), 2, 1)
    assert got[10] == (m(1), 1, 2)
    assert got[13] == (m(2), 1, 3)
    assert got[12] == (m(3), 1, 4)
    # fused order never depends on score calibration, only on ranks
    assert [n for n, v in sorted(got.items(), key=lambda kv: kv[1][2])] == [
        11, 10, 13, 12
    ]


def test_vec_dim_from_schema_metadata_beats_probe_gate(spark):
    """The round-9 width channel: `annotate_vec_dim` stamps the width
    into column metadata, which rides the attribute through joins and
    aggregates — so `_vec_dim` resolves on DERIVED frames where the
    plan-shape probe gate (the node-name fallback) must refuse."""
    from airflow_crypto_btc_spark.operators.similarity import (
        _plan_is_cheap_scan,
        _vec_dim,
        annotate_vec_dim,
    )

    vecs = spark.createDataFrame(
        [(i, [float(i), 1.0, 2.0]) for i in range(6)],
        "vec_id long, embedding array<double>",
    )
    # explicit dim= channel
    stamped = annotate_vec_dim(vecs, "embedding", dim=3)
    assert _vec_dim(stamped, "embedding") == 3
    # probe-at-scan channel (bare local relation)
    assert _vec_dim(annotate_vec_dim(vecs, "embedding"), "embedding") == 3

    # a derived frame: self-join + dedup — the probe gate refuses it...
    other = stamped.select(
        F.col("vec_id").alias("vid2"), F.col("embedding").alias("e2")
    )
    derived = (
        stamped.join(other, stamped["vec_id"] == F.col("vid2"))
        .select("vec_id", "embedding")
        .dropDuplicates(["vec_id"])
    )
    assert not _plan_is_cheap_scan(derived)
    # ...but the metadata survived the derivation: no probe needed
    assert _vec_dim(derived, "embedding") == 3
    # unannotated twin of the same derived plan: correctly None
    bare = (
        vecs.join(other, vecs["vec_id"] == F.col("vid2"))
        .select("vec_id", "embedding")
        .dropDuplicates(["vec_id"])
    )
    assert _vec_dim(bare, "embedding") is None


def test_annotated_and_bare_frames_agree_on_buckets(spark):
    """The width channel changes WHICH kernel form runs, never the
    values: hyperplane buckets from an annotated frame (literal-weight
    unrolled path, dim<=16) equal the generic-HOF buckets bit-for-bit."""
    from airflow_crypto_btc_spark.operators.similarity import (
        annotate_vec_dim,
        hyperplane_bucket_expr,
    )

    vecs = spark.createDataFrame(
        [(i, [float(i % 7) - 3, float(i % 5) - 2, 1.5, -0.5])
         for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    generic = {
        r["vec_id"]: r["b"]
        for r in vecs.select(
            "vec_id", hyperplane_bucket_expr("embedding", 6, None).alias("b")
        ).collect()
    }
    stamped = annotate_vec_dim(vecs, "embedding", dim=4)
    unrolled = {
        r["vec_id"]: r["b"]
        for r in stamped.select(
            "vec_id", hyperplane_bucket_expr("embedding", 6, 4).alias("b")
        ).collect()
    }
    assert generic == unrolled


def test_ivfpq_with_big_shortlist_equals_ivf_exact(spark, sf_dir):
    """Semantic pin for the combined index: with a shortlist at least as
    large as any query's probed candidate pool, the ADC cut drops
    nothing, so IVF-PQ (probe + quantize + rerank) must return EXACTLY
    the plain-IVF result (probe + exact cosine) — the quantization layer
    only ever narrows WITHIN the probed lists, never changes them."""
    from airflow_crypto_btc_spark.operators.similarity import (
        ivf_topk,
        ivfpq_topk,
    )
    from airflow_crypto_btc_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    want = {
        (r["qid"], r["nid"], r["cosine"], r["rnk"])
        for r in ivf_topk(
            emb, centroid_filter="vec_id % 25 = 7",
            query_filter="vec_id < 5", n_probe=2, k=5,
        ).collect()
    }
    got = {
        (r["qid"], r["nid"], r["cosine"], r["rnk"])
        for r in ivfpq_topk(
            emb, centroid_filter="vec_id % 25 = 7",
            query_filter="vec_id < 5", n_probe=2, m=4,
            shortlist=100000, k=5,
        ).collect()
    }
    assert got == want


def test_ivfpq_warm_books_equal_inline_training(spark, sf_dir):
    """Offline-train/online-serve split: passing pre-trained codebooks
    must reproduce the inline-training output bit-for-bit (the landing
    zone serves the same model the cold path would train)."""
    from airflow_crypto_btc_spark.operators.similarity import (
        ivfpq_topk,
        pq_train_codebooks,
    )
    from airflow_crypto_btc_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    books = pq_train_codebooks(emb, m=4)
    cold = ivfpq_topk(emb, m=4, k=5).collect()
    warm = ivfpq_topk(emb, m=4, k=5, books=books).collect()
    assert sorted(map(tuple, cold)) == sorted(map(tuple, warm))
    with pytest.raises(ValueError):
        ivfpq_topk(emb, m=8, books=books)  # m / books mismatch refused


@pytest.mark.smoke
def test_rrf_recall_report_fusion_wins(spark, sf_dir):
    """The fusion quality report: recall@10 of IVF, LSH, and their RRF
    fusion vs exact cosine top-k.  The reason to fuse — the fused list
    recovers at least what either component recovers alone — must hold
    as a measured fact on the fixture query set, and the report's
    internal accounting must be consistent."""
    from airflow_crypto_btc_spark.plans.registry_ext import q_sim_rrf_recall

    r = q_sim_rrf_recall(spark, sf_dir).collect()[0]
    assert r["n_exact"] > 0
    for n in ("n_ivf", "n_lsh", "n_rrf"):
        assert 0 <= r[n] <= r["n_exact"]
    assert r["fused_ge_components"] == 1
    assert r["recall_rrf"] >= max(r["recall_ivf"], r["recall_lsh"])
    # fusion genuinely adds over the components on this fixture (each
    # index has blind spots the other covers)
    assert r["n_rrf"] > max(r["n_ivf"], r["n_lsh"])


def test_ivfpq_from_index_equals_fused_and_refuses_stale(
    spark, sf_dir, tmp_path
):
    """The persisted-index serve path must reproduce the fused pipeline
    bit-for-bit on the index's own corpus, refuse a stale generation,
    and refuse a partial rebuild (artifact tables disagreeing on
    version)."""
    from airflow_crypto_btc_spark.operators.similarity import (
        ivfpq_save_index,
        ivfpq_topk,
        ivfpq_topk_from_index,
    )
    from airflow_crypto_btc_spark.sources.snapshot_table import overwrite
    from airflow_crypto_btc_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    root = str(tmp_path / "ivfpq")
    ivfpq_save_index(spark, emb, root, "v1", m=4)
    fused = sorted(
        map(tuple, ivfpq_topk(emb, m=4, k=5, shortlist=50).collect())
    )
    served = sorted(
        map(
            tuple,
            ivfpq_topk_from_index(
                spark, root, emb, k=5, shortlist=50, expect_source="v1"
            ).collect(),
        )
    )
    assert served == fused
    with pytest.raises(ValueError, match="stale IVF-PQ index"):
        ivfpq_topk_from_index(spark, root, emb, expect_source="v2")
    # partial rebuild: one table re-landed under a new version
    import os

    overwrite(
        spark,
        spark.createDataFrame([(0, 0)], "nid long, cid long"),
        os.path.join(root, "lists"),
        meta={"source_version": "v2", "m": 4},
    )
    with pytest.raises(ValueError, match="disagree"):
        ivfpq_topk_from_index(spark, root, emb, expect_source="v1")
