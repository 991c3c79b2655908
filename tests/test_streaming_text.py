"""Streaming frozen-model quality gate: scores equal the batch
from-model operator, gate flags recorded with evidence, replay and
re-delivery fold nothing, a model rebuild stops the stream."""

from __future__ import annotations

import pytest

from airflow_crypto_btc_spark.operators.text import (
    build_text_models,
    unigram_logprob_from_model,
)
from airflow_crypto_btc_spark.sources.snapshot_table import (
    current_snapshot,
    read_snapshot,
)
from airflow_crypto_btc_spark.streaming.text_stream import (
    quality_scores_sink,
)


def _fixtures(spark, tmp_path):
    corpus = spark.createDataFrame(
        [(i, "the cat sat on the mat") for i in range(10)],
        "doc_id long, text string",
    )
    it, ut = str(tmp_path / "idf"), str(tmp_path / "unigram")
    build_text_models(spark, corpus, it, ut, source_version="v1")
    arrivals = spark.createDataFrame(
        [
            (100, "the cat sat"),
            (101, "zxqv wvvq qqzx"),
            (102, "the mat"),
            (103, ""),
        ],
        "doc_id long, text string",
    )
    return ut, arrivals


def test_streaming_scores_match_batch_and_gate(spark, tmp_path):
    ut, arrivals = _fixtures(spark, tmp_path)
    st = str(tmp_path / "scores")
    sink = quality_scores_sink(
        ut, st, query_name="gate", min_logprob=-3.0, expect_source="v1"
    )
    sink(arrivals.filter("doc_id < 102"), 0)
    sink(arrivals.filter("doc_id >= 102"), 1)
    got = {
        r["doc_id"]: (r["n_tokens"], r["mean_logprob"], r["passed"])
        for r in read_snapshot(spark, st).collect()
    }
    want = {
        r["doc_id"]: (r["n_tokens"], r["mean_logprob"])
        for r in unigram_logprob_from_model(
            spark, arrivals, ut
        ).collect()
    }
    assert {k: v[:2] for k, v in got.items()} == want
    # fluent passes, gibberish fails, empty doc (null score) fails
    # explicitly rather than passing vacuously
    assert got[100][2] and got[102][2]
    assert not got[101][2] and not got[103][2]
    # replay + re-delivery fold nothing
    v = current_snapshot(st).version
    sink(arrivals.filter("doc_id >= 102"), 1)
    assert current_snapshot(st).version == v
    sink(arrivals.filter("doc_id = 100"), 2)
    assert len(read_snapshot(spark, st).collect()) == 4


def test_streaming_scores_frozen_model_refusals(spark, tmp_path):
    ut, arrivals = _fixtures(spark, tmp_path)
    st = str(tmp_path / "scores")
    with pytest.raises(ValueError, match="stale text model"):
        quality_scores_sink(ut, st, query_name="g", expect_source="v2")
    sink = quality_scores_sink(
        ut, st, query_name="g", expect_source="v1"
    )
    sink(arrivals.filter("doc_id < 102"), 0)
    # model rebuilt (same meta, new commit) under the running stream
    corpus2 = spark.createDataFrame(
        [(0, "entirely different corpus")], "doc_id long, text string"
    )
    build_text_models(
        spark, corpus2, str(tmp_path / "idf2"), ut, source_version="v1"
    )
    with pytest.raises(ValueError, match="changed under a running"):
        sink(arrivals.filter("doc_id >= 102"), 1)
