"""Streaming frozen-probe quality gate: decisions equal the batch
scorer on the same weights, replay and re-delivery fold nothing, and a
model rebuild stops the stream instead of mixing scoring regimes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airflow_crypto_btc_spark.operators.probe import (
    build_probe_model,
    quality_probe_scores,
    quality_probe_train,
)
from airflow_crypto_btc_spark.sources.snapshot_table import (
    current_snapshot,
    read_snapshot,
)
from airflow_crypto_btc_spark.streaming.probe_stream import probe_gate_sink


def _separable(spark, n=120, dim=4):
    """Same deterministic linearly separable fixture as test_probe.py
    (duplicated rather than cross-imported: the test tree is not a
    package, so module imports between test files depend on the pytest
    invocation directory)."""
    rows = []
    for i in range(n):
        pos = i % 2 == 0
        base = 0.8 if pos else -0.8
        vec = [base + ((i * 7) % 5 - 2) * 0.02] + [
            ((i * 13 + j) % 7 - 3) * 0.05 for j in range(1, dim)
        ]
        rows.append((i, [float(v) for v in vec], 9 if pos else 0))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def _arrivals(spark, lo, hi):
    emb = _separable(spark, n=hi)
    return emb.filter(
        (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
    ).drop("label")


def test_streaming_gate_matches_batch_scorer(spark, tmp_path):
    emb = _separable(spark, n=40)
    mt, dt = str(tmp_path / "weights"), str(tmp_path / "decisions")
    build_probe_model(
        spark, emb, mt, source_version="v1", iterations=3, lr_num=4
    )
    sink = probe_gate_sink(mt, dt, query_name="gate", expect_source="v1")
    sink(_arrivals(spark, 0, 25), 0)
    sink(_arrivals(spark, 25, 40), 1)

    got = {
        r["vec_id"]: (r["score_micro"], r["passed"])
        for r in read_snapshot(spark, dt).collect()
    }
    w = quality_probe_train(emb, iterations=3, lr_num=4)
    want = {
        r["vec_id"]: r["score_micro"]
        for r in quality_probe_scores(emb, w).collect()
    }
    assert {k: v[0] for k, v in got.items()} == want
    assert all(
        v[1] == (v[0] >= 500_000) for v in got.values()
    )
    # the separable fixture's positives pass, negatives fail
    assert got[0][1] and not got[1][1]

    # replay + re-delivery fold nothing
    v = current_snapshot(dt).version
    sink(_arrivals(spark, 25, 40), 1)
    assert current_snapshot(dt).version == v
    sink(_arrivals(spark, 0, 10), 2)
    assert len(read_snapshot(spark, dt).collect()) == 40


def test_streaming_gate_frozen_model_refusals(spark, tmp_path):
    emb = _separable(spark, n=20)
    mt, dt = str(tmp_path / "weights"), str(tmp_path / "decisions")
    build_probe_model(spark, emb, mt, source_version="v1", iterations=1)
    with pytest.raises(ValueError, match="stale probe model"):
        probe_gate_sink(mt, dt, query_name="g", expect_source="v2")
    sink = probe_gate_sink(mt, dt, query_name="g", expect_source="v1")
    sink(_arrivals(spark, 0, 10), 0)
    # weights rebuilt (same source tag, new commit) under the stream
    build_probe_model(spark, emb, mt, source_version="v1", iterations=2)
    with pytest.raises(ValueError, match="changed under a running"):
        sink(_arrivals(spark, 10, 20), 1)


def test_streaming_gate_compaction_bounds_files(spark, tmp_path):
    emb = _separable(spark, n=30)
    mt, dt = str(tmp_path / "weights"), str(tmp_path / "decisions")
    build_probe_model(spark, emb, mt, source_version="v1", iterations=1)
    sink = probe_gate_sink(
        mt, dt, query_name="g", expect_source="v1",
        compact_every=2, compact_target_parts=2,
    )
    for b in range(4):
        lo, hi = b * 7, min(30, (b + 1) * 7)
        sink(_arrivals(spark, lo, hi), b)
    assert len(current_snapshot(dt).files) <= 2
    assert len(read_snapshot(spark, dt).collect()) == 28
