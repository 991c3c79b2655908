"""Count-Min sketch: one-sided error (estimate ≥ truth, exact for
tokens with no cell collisions), additivity under union, and the
streaming maintainer's exactly-once + merge invariants."""

from __future__ import annotations

from collections import Counter

from airflow_crypto_btc_spark.operators.sketch import (
    cms_build,
    cms_estimate,
    cms_from_table,
)
from airflow_crypto_btc_spark.sources.snapshot_table import (
    current_snapshot,
)
from airflow_crypto_btc_spark.streaming.sketch_stream import (
    cms_merge,
    cms_sink,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _truth(rows):
    c = Counter()
    for _, text in rows:
        c.update(t for t in text.split() if t)
    return c


def test_cms_overestimates_never_under(spark):
    rows = [
        (i, f"tok{i % 13} tok{i % 7} common common") for i in range(50)
    ]
    docs = _docs(spark, rows)
    sketch = cms_build(docs, depth=4, width=64)
    probes = spark.createDataFrame(
        [(t,) for t in _truth(rows)], "token string"
    )
    est = {
        r["token"]: r["est"]
        for r in cms_estimate(sketch, probes, depth=4, width=64).collect()
    }
    truth = _truth(rows)
    assert set(est) == set(truth)
    for t, n in truth.items():
        assert est[t] >= n  # the CM guarantee: one-sided error
    # total mass per depth row equals the token count exactly
    total = sum(r["cnt"] for r in sketch.collect())
    assert total == 4 * sum(truth.values())


def test_cms_wide_sketch_is_exact_on_small_vocab(spark):
    rows = [(i, f"a{i % 5} b{i % 3}") for i in range(30)]
    sketch = cms_build(_docs(spark, rows), depth=4, width=4096)
    probes = spark.createDataFrame(
        [(t,) for t in _truth(rows)], "token string"
    )
    est = {
        r["token"]: r["est"]
        for r in cms_estimate(
            sketch, probes, depth=4, width=4096
        ).collect()
    }
    assert est == dict(_truth(rows))  # 8 tokens, 4096 cells: no collision


def test_cms_streaming_additive_exactly_once_and_merge(spark, tmp_path):
    t = str(tmp_path / "cms")
    sink = cms_sink(t, query_name="cms", depth=4, width=64)
    b0 = [(1, "x y x"), (2, "y z")]
    b1 = [(3, "x q"), (4, "z z z")]
    sink(_docs(spark, b0), 0)
    sink(_docs(spark, b1), 1)
    # crash-replay folds nothing (txn-id idempotent append)
    v = current_snapshot(t).version
    sink(_docs(spark, b1), 1)
    assert current_snapshot(t).version == v
    merged = {
        (r["d"], r["w"]): r["cnt"] for r in cms_from_table(spark, t).collect()
    }
    oneshot = {
        (r["d"], r["w"]): r["cnt"]
        for r in cms_build(_docs(spark, b0 + b1), depth=4, width=64).collect()
    }
    assert merged == oneshot  # additivity: sum of partials == one-shot
    # explicit merge collapses rows without changing any cell
    cms_merge(spark, t)
    assert {
        (r["d"], r["w"]): r["cnt"] for r in cms_from_table(spark, t).collect()
    } == oneshot


def test_hll_estimate_accuracy_and_mergeability(spark):
    from airflow_crypto_btc_spark.operators.sketch import (
        hll_estimate,
        hll_registers,
    )
    from pyspark.sql import functions as F

    docs = _docs(
        spark, [(i, f"document body number {i}") for i in range(500)]
    )
    regs = hll_registers(docs, m=16)
    est = hll_estimate(regs, m=16).collect()[0]
    assert est["m"] == 16
    # raw HLL on 500 distinct with m=16: relative error ~1.04/sqrt(16)
    assert 500 * 0.5 <= est["est"] <= 500 * 1.7
    # mergeability: per-bucket MAX of two half sketches == one-shot
    ra = hll_registers(docs.filter("doc_id % 2 = 0"), m=16)
    rb = hll_registers(docs.filter("doc_id % 2 = 1"), m=16)
    merged = (
        ra.unionByName(rb)
        .groupBy("bucket")
        .agg(F.max("register").cast("long").alias("register"))
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, regs.collect())
    )
    # duplicates don't move the sketch: cardinality, not count
    doubled = docs.unionByName(docs)
    assert sorted(map(tuple, hll_registers(doubled, m=16).collect())) == \
        sorted(map(tuple, regs.collect()))


def test_hll_streaming_merge_by_max_and_replay(spark, tmp_path):
    from airflow_crypto_btc_spark.operators.sketch import (
        hll_from_table,
        hll_registers,
    )
    from airflow_crypto_btc_spark.streaming.sketch_stream import hll_sink

    t = str(tmp_path / "hll")
    sink = hll_sink(t, query_name="hll", m=16, merge_every=2)
    b0 = [(i, f"body {i}") for i in range(40)]
    b1 = [(i, f"body {i}") for i in range(30, 80)]  # overlaps b0
    sink(_docs(spark, b0), 0)
    sink(_docs(spark, b1), 1)  # triggers merge+vacuum
    v = current_snapshot(t).version
    sink(_docs(spark, b1), 1)  # crash-replay: txn-id no-op
    assert current_snapshot(t).version == v
    merged = sorted(map(tuple, hll_from_table(spark, t).collect()))
    oneshot = sorted(
        map(tuple, hll_registers(_docs(spark, b0 + b1), m=16).collect())
    )
    # max-merge makes the overlap harmless: merged == one-shot over union
    assert merged == oneshot


# ----------------------------------------- quantile registers (qhist)


def _vals(spark, vals):
    return spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)],
        "event_id long, value double",
    )


def test_qhist_registers_fixed_grid_and_clamping(spark):
    from airflow_crypto_btc_spark.operators.sketch import qhist_registers

    # width 2.0: 0.0→b0, 1.99→b0, 2.0→b1, 1023.9→b511, 5000→clamp b511
    regs = {
        r["bucket"]: r["cnt"]
        for r in qhist_registers(
            _vals(spark, [0.0, 1.99, 2.0, 1023.9, 5000.0, -3.0])
        ).collect()
    }
    assert regs[0] == 3  # 0.0, 1.99, and -3.0 clamped up
    assert regs[1] == 1
    assert regs[511] == 2  # top edge + overflow clamp


def test_qhist_quantile_interpolates_by_rank(spark):
    from airflow_crypto_btc_spark.operators.sketch import (
        qhist_quantile,
        qhist_registers,
    )

    # 100 values uniform over [0, 2): all in bucket 0 → p50 needs rank
    # 50 of 100 → est = 0 + (50 * 2_000_000) // 100 = 1_000_000
    est = {
        r["p_micro"]: r["est_micro"]
        for r in qhist_quantile(
            qhist_registers(_vals(spark, [i * 0.02 for i in range(100)])),
            probs_micro=(500_000,),
        ).collect()
    }
    assert est[500_000] == 1_000_000


def test_qhist_estimate_within_bucket_width_of_exact(spark):
    from airflow_crypto_btc_spark.operators.sketch import (
        qhist_quantile,
        qhist_registers,
    )

    import random

    rng = random.Random(11)
    vals = [rng.uniform(0, 400) for _ in range(5000)]
    est = {
        r["p_micro"]: r["est_micro"]
        for r in qhist_quantile(qhist_registers(_vals(spark, vals))).collect()
    }
    sv = sorted(vals)
    for p, e in est.items():
        exact = sv[int(len(sv) * p / 1_000_000)]
        # a rank-interpolated fixed-grid estimate is within one bucket
        # width (2.0 = 2_000_000 micro) of the exact quantile
        assert abs(e - exact * 1_000_000) <= 2_000_000


def test_qhist_streaming_additive_exactly_once_and_merge(spark, tmp_path):
    from airflow_crypto_btc_spark.operators.sketch import (
        qhist_from_table,
        qhist_registers,
    )
    from airflow_crypto_btc_spark.streaming.sketch_stream import qhist_sink

    t = str(tmp_path / "qhist")
    sink = qhist_sink(t, query_name="qh")
    b0 = [3.0, 5.5, 900.0]
    b1 = [3.1, 77.0, 77.2, 1.0]
    sink(_vals(spark, b0), 0)
    sink(_vals(spark, b1), 1)
    v = current_snapshot(t).version
    sink(_vals(spark, b1), 1)  # crash-replay: no double count
    assert current_snapshot(t).version == v
    merged = {
        r["bucket"]: r["cnt"] for r in qhist_from_table(spark, t).collect()
    }
    oneshot = {
        r["bucket"]: r["cnt"]
        for r in qhist_registers(_vals(spark, b0 + b1)).collect()
    }
    assert merged == oneshot


# --------------------------------------------- KMV / theta sketch


def _kmv(spark, ids, side="a", k=4):
    from airflow_crypto_btc_spark.operators.sketch import kmv_sketch

    df = spark.createDataFrame(
        [(side, i) for i in ids], "side string, key long"
    )
    return kmv_sketch(df, "cast(key as string)", ["side"], k=k)


def _h32(v) -> int:
    import hashlib

    return int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16)


def test_kmv_sketch_is_the_k_smallest_distinct_hashes(spark):
    import random

    rng = random.Random(7)
    ids = [rng.randrange(10**6) for _ in range(60)]
    rows = _kmv(spark, ids, k=8).collect()
    want = sorted({_h32(i) for i in ids})[:8]
    assert [r["h32"] for r in sorted(rows, key=lambda r: r["pos"])] == want
    assert [r["pos"] for r in sorted(rows, key=lambda r: r["pos"])] == list(
        range(1, 9)
    )


def test_kmv_union_merge_is_sketch_of_union(spark):
    """The theta-sketch union law: k smallest of (sketch_A ∪ sketch_B)
    == the sketch of (A ∪ B) — what makes per-shard sketches foldable
    without revisiting base data."""
    import random

    from airflow_crypto_btc_spark.operators.sketch import kmv_sketch

    rng = random.Random(13)
    a = [rng.randrange(10**6) for _ in range(40)]
    b = [rng.randrange(10**6) for _ in range(40)]
    k = 6
    sk_a = {r["h32"] for r in _kmv(spark, a, k=k).collect()}
    sk_b = {r["h32"] for r in _kmv(spark, b, k=k).collect()}
    merged = sorted(sk_a | sk_b)[:k]
    direct = _kmv(spark, a + b, k=k).collect()
    assert [r["h32"] for r in sorted(direct, key=lambda r: r["pos"])] == merged


def test_kmv_estimate_is_exact_below_k(spark):
    from airflow_crypto_btc_spark.operators.sketch import (
        kmv_estimate,
        kmv_sketch,
    )

    df = spark.createDataFrame(
        [("a", i) for i in range(5)], "side string, key long"
    )
    sk = kmv_sketch(df, "cast(key as string)", ["side"], k=32)
    row = kmv_estimate(sk, ["side"], k=32).collect()[0]
    assert row["n_sketch"] == 5 and row["est"] == 5.0


def test_theta_ops_exact_when_both_sides_fit(spark):
    """Both sides below k → θ = 2^32 → the 'estimates' are the exact
    distinct-hash intersection/union counts (graceful degradation)."""
    from airflow_crypto_btc_spark.operators.sketch import (
        kmv_sketch,
        kmv_theta_ops,
    )

    a = list(range(10))
    b = list(range(5, 15))
    rows = [("a", i) for i in a] + [("b", i) for i in b]
    df = spark.createDataFrame(rows, "side string, key long")
    sk = kmv_sketch(df, "cast(key as string)", ["side"], k=64)
    r = kmv_theta_ops(sk, k=64).collect()[0]
    assert r["theta"] == 1 << 32
    assert r["n_cand"] == 5 and r["est_inter"] == 5.0
    assert r["n_union_cand"] == 15 and r["est_union"] == 15.0


def test_theta_ops_estimates_track_truth_on_overlap(spark):
    """k=128 sketches over two 500-element sets sharing 250 members:
    both estimates land within 20% (measured on this deterministic
    fixture: inter 269.37/250 = 1.08, union 866.48/750 = 1.16 — the
    same fixture at k=64 sits 33% high on the intersection, the
    1/√k variance law in action)."""
    from airflow_crypto_btc_spark.operators.sketch import (
        kmv_sketch,
        kmv_theta_ops,
    )

    a = list(range(500))
    b = list(range(250, 750))
    rows = [("a", i) for i in a] + [("b", i) for i in b]
    df = spark.createDataFrame(rows, "side string, key long")
    sk = kmv_sketch(df, "cast(key as string)", ["side"], k=128)
    r = kmv_theta_ops(sk, k=128).collect()[0]
    assert abs(r["est_inter"] - 250) <= 0.2 * 250
    assert abs(r["est_union"] - 750) <= 0.2 * 750


def test_kmv_streaming_union_exactly_once_and_merge(spark, tmp_path):
    """The kmv_sink twin of the CMS sink test: three batches fold to
    the one-shot sketch (theta union law through the commit log), a
    crash-replayed batch id folds nothing, and kmv_merge collapses the
    history without changing a single minimum."""
    from airflow_crypto_btc_spark.operators.sketch import (
        kmv_from_table,
        kmv_sketch,
    )
    from airflow_crypto_btc_spark.sources.snapshot_table import (
        read_snapshot,
    )
    from airflow_crypto_btc_spark.streaming.sketch_stream import (
        kmv_merge,
        kmv_sink,
    )

    t = str(tmp_path / "kmv")
    sink = kmv_sink(
        t, query_name="kmv", key_expr="cast(key as string)",
        group_cols=["side"], k=5,
    )

    def _frame(ids):
        return spark.createDataFrame(
            [("a", i) for i in ids], "side string, key long"
        )

    sink(_frame(range(0, 30)), 0)
    sink(_frame(range(20, 60)), 1)
    v = current_snapshot(t).version
    sink(_frame(range(20, 60)), 1)  # crash-replay: no-op
    assert current_snapshot(t).version == v
    sink(_frame(range(50, 90)), 2)

    def _rows(df):
        return [
            (r["side"], r["pos"], r["h32"])
            for r in sorted(df.collect(), key=lambda r: r["pos"])
        ]

    oneshot = _rows(
        kmv_sketch(
            _frame(range(0, 90)), "cast(key as string)", ["side"], k=5
        )
    )
    assert _rows(kmv_from_table(spark, t, ["side"], k=5)) == oneshot
    kmv_merge(spark, t, ["side"], k=5)
    assert _rows(kmv_from_table(spark, t, ["side"], k=5)) == oneshot
    # the merge collapsed the history to exactly the sketch rows
    assert read_snapshot(spark, t).count() == 5


def test_kmv_sketch_excludes_null_keys(spark):
    """A NULL key hashes to NULL, which Spark's ascending sort would
    place FIRST (stealing pos 1) while DuckDB sorts it LAST — the
    sketch excludes NULL keys outright, matching the oracle SQLs'
    h32 IS NOT NULL guard (round-14 self-review)."""
    from airflow_crypto_btc_spark.operators.sketch import (
        kmv_estimate,
        kmv_sketch,
    )

    rows = [("a", str(i)) for i in range(10)] + [("a", None)] * 3
    df = spark.createDataFrame(rows, "side string, key string")
    sk = kmv_sketch(df, "key", ["side"], k=4)
    got = sk.collect()
    assert all(r["h32"] is not None for r in got)
    want = sorted(_h32(i) for i in range(10))[:4]
    assert sorted(r["h32"] for r in got) == want
    # and the estimator sees a consistent (n_sketch, kth) pair
    est = kmv_estimate(sk, ["side"], k=4).collect()[0]
    assert est["n_sketch"] == 4 and est["kth"] == want[-1]
