"""Trainable quality-probe tests: learning sanity on a separable
synthetic target, exact repartition invariance (the decimal-sum /
integer-arithmetic determinism contract), model persistence round-trip,
and the stale-model refusal."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airflow_crypto_btc_spark.operators.probe import (
    build_probe_model,
    probe_model_rows,
    quality_probe_eval,
    quality_probe_scores,
    quality_probe_scores_from_model,
    quality_probe_train,
    weights_from_model_rows,
)


def _separable(spark, n=120, dim=4):
    """Deterministic linearly separable set: label 9 (positive) vectors
    point along +e1 with a fixed offset pattern, label 0 along -e1."""
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


def test_probe_learns_separable_target(spark):
    emb = _separable(spark)
    w = quality_probe_train(emb, iterations=4, lr_num=4)
    scores = quality_probe_scores(emb, w)
    acc = scores.agg(F.avg("correct")).first()[0]
    assert acc == 1.0, f"separable target not learned: acc={acc}"
    # scores are genuinely separated, not hovering at the 0.5 boundary
    margins = scores.agg(
        F.min(F.abs(F.col("score_micro") - 500000)).alias("m")
    ).first()["m"]
    assert margins > 1000


def test_probe_training_is_repartition_invariant(spark):
    """The determinism contract: gradient sums are decimal (associative)
    and everything else is integer, so the trained weights are IDENTICAL
    under any physical partitioning — not merely close."""
    emb = _separable(spark)
    w3 = quality_probe_train(emb.repartition(3), iterations=3).first()
    w7 = quality_probe_train(emb.repartition(7), iterations=3).first()
    assert list(w3["warr"]) == list(w7["warr"])


def test_probe_all_integer_outputs(spark):
    emb = _separable(spark, n=30)
    w = quality_probe_train(emb, iterations=2)
    scores = quality_probe_scores(emb, w)
    types = dict(scores.dtypes)
    assert types == {
        "vec_id": "bigint",
        "y_true": "int",
        "score_micro": "bigint",
        "pred": "int",
        "correct": "int",
    }
    bounds = scores.agg(
        F.min("score_micro").alias("lo"), F.max("score_micro").alias("hi")
    ).first()
    assert 0 <= bounds["lo"] and bounds["hi"] <= 1_000_000


def test_probe_eval_counts_and_shares(spark):
    emb = _separable(spark, n=40)
    w = quality_probe_train(emb, iterations=4, lr_num=4)
    ev = quality_probe_eval(quality_probe_scores(emb, w))
    rows = {(r["y_true"], r["pred"]): r for r in ev.collect()}
    assert sum(r["n"] for r in rows.values()) == 40
    # perfect separation → only the two diagonal cells
    assert set(rows) == {(0, 0), (1, 1)}
    assert rows[(0, 0)]["share"] == 0.5
    assert rows[(1, 1)]["share"] == 0.5


def test_probe_model_roundtrip_identical_scores(spark, tmp_path):
    emb = _separable(spark, n=60)
    table = str(tmp_path / "probe_weights")
    build_probe_model(
        spark, emb, table, source_version="v1", iterations=3, lr_num=4
    )
    served = quality_probe_scores_from_model(
        spark, emb, table, expect_source="v1"
    )
    inline = quality_probe_scores(
        emb, quality_probe_train(emb, iterations=3, lr_num=4)
    )
    assert sorted(map(tuple, served.collect())) == sorted(
        map(tuple, inline.collect())
    )


def test_probe_model_refuses_stale_source(spark, tmp_path):
    emb = _separable(spark, n=20)
    table = str(tmp_path / "probe_weights")
    build_probe_model(
        spark, emb, table, source_version="v1", iterations=1
    )
    with pytest.raises(ValueError, match="stale probe model"):
        quality_probe_scores_from_model(
            spark, emb, table, expect_source="v2"
        )


def test_probe_weight_rows_roundtrip(spark):
    emb = _separable(spark, n=20)
    w = quality_probe_train(emb, iterations=2)
    back = weights_from_model_rows(probe_model_rows(w))
    assert back.first()["warr"] == w.first()["warr"]


def test_probe_calibration_buckets_and_rates(spark):
    emb = _separable(spark, n=80)
    w = quality_probe_train(emb, iterations=4, lr_num=4)
    from airflow_crypto_btc_spark.operators.probe import (
        quality_probe_calibration,
    )

    cal = quality_probe_calibration(quality_probe_scores(emb, w))
    rows = {r["bucket"]: r for r in cal.collect()}
    assert sum(r["n"] for r in rows.values()) == 80
    assert all(0 <= b <= 9 for b in rows)
    # separable fixture: a well-calibrated probe's low buckets are pure
    # negatives, high buckets pure positives
    assert rows[min(rows)]["pos_rate"] == 0.0
    assert rows[max(rows)]["pos_rate"] == 1.0
