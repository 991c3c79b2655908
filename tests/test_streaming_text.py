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


def test_streaming_gram_index_scores_and_grows(spark, tmp_path):
    """The duplicated-span maintainer: arrivals score against the index
    AS OF arrival (a batch-1 doc duplicating a batch-0 doc is caught —
    proof the index grew), replay/re-delivery fold nothing, and the
    stored distinct-doc frequencies are exact."""
    from airflow_crypto_btc_spark.operators.text import build_gram_index
    from airflow_crypto_btc_spark.streaming.text_stream import (
        gram_index_sink,
    )

    span_a = "a b c d e f g h"      # seeded in the base corpus
    span_b = "p1 p2 p3 p4 p5 p6 p7 p8"  # first appears in batch 0
    corpus = spark.createDataFrame(
        [(1, f"{span_a} tail x y z"),
         (2, "totally different words here one two three four five")],
        "doc_id long, text string",
    )
    gt = str(tmp_path / "grams")
    build_gram_index(spark, corpus, gt, source_version="v1")
    st, it = str(tmp_path / "scores"), str(tmp_path / "ids")
    sink = gram_index_sink(gt, st, it, query_name="g",
                           expect_source="v1", compact_every=1)

    b0 = spark.createDataFrame(
        [(10, f"lead {span_a} q r s"),        # dup vs corpus doc 1
         (11, f"{span_b} novel tail words")],  # novel NOW
        "doc_id long, text string",
    )
    b1 = spark.createDataFrame(
        [(12, f"{span_b} other suffix toks"),  # dup vs doc 11 (batch 0!)
         (13, "fresh unseen u1 u2 u3 u4 u5 u6 u7 u8 u9")],
        "doc_id long, text string",
    )
    sink(b0, 0)
    sink(b1, 1)
    got = {
        r["doc_id"]: r["n_dup_grams"]
        for r in read_snapshot(spark, st).collect()
    }
    assert got[10] >= 1 and got[11] == 0
    # doc 12's span came from batch 0's doc 11 — the index grew
    assert got[12] >= 1 and got[13] == 0
    # replay folds nothing anywhere: with compact_every=1 the versions
    # still advance (compaction rewrites commit), so assert CONTENT —
    # rows identical, dfs not double-counted
    def _contents():
        return tuple(
            sorted(map(tuple, read_snapshot(spark, t).collect()))
            for t in (st, gt, it)
        )

    before = _contents()
    sink(b1, 1)
    assert _contents() == before
    # re-delivery of an already-indexed doc in a later batch: no rows
    sink(b0.filter("doc_id = 10"), 2)
    assert len(read_snapshot(spark, st).collect()) == 4
    # distinct-doc frequency of span_a's first gram is exact: docs 1, 10
    import hashlib

    h = hashlib.md5(span_a.encode()).hexdigest()
    df_row = [r for r in read_snapshot(spark, gt).collect()
              if r["h"] == h]
    assert df_row and df_row[0]["df"] == 2


# ---------------------------------------------------- bigram LM gate


def _bigram_fixtures(spark, tmp_path):
    from airflow_crypto_btc_spark.operators.text import build_bigram_lm

    corpus = spark.createDataFrame(
        [(i, "the cat sat on the mat") for i in range(10)],
        "doc_id long, text string",
    )
    bt, ut = str(tmp_path / "bi"), str(tmp_path / "uni")
    build_bigram_lm(spark, corpus, bt, ut, source_version="v1")
    arrivals = spark.createDataFrame(
        [
            (100, "the cat sat on"),   # in-distribution order
            (101, "mat the on sat"),   # same vocabulary, scrambled
            (102, "solo"),             # no bigrams → null, gate fails
        ],
        "doc_id long, text string",
    )
    return bt, ut, arrivals


def test_streaming_bigram_gate_matches_batch_and_orders(spark, tmp_path):
    from airflow_crypto_btc_spark.operators.text import (
        bigram_logprob_from_model,
    )
    from airflow_crypto_btc_spark.streaming.text_stream import (
        bigram_scores_sink,
    )

    bt, ut, arrivals = _bigram_fixtures(spark, tmp_path)
    st = str(tmp_path / "scores")
    sink = bigram_scores_sink(
        bt, ut, st, query_name="bg", min_logprob=-1.5, expect_source="v1"
    )
    sink(arrivals.filter("doc_id < 102"), 0)
    sink(arrivals.filter("doc_id >= 102"), 1)
    got = {
        r["doc_id"]: (r["n_bigrams"], r["mean_logprob"], r["passed"])
        for r in read_snapshot(spark, st).collect()
    }
    want = {
        r["doc_id"]: (r["n_bigrams"], r["mean_logprob"])
        for r in bigram_logprob_from_model(
            spark, arrivals, bt, ut
        ).collect()
    }
    assert {k: v[:2] for k, v in got.items()} == want
    # the gate's reason to exist: scrambled order fails where the
    # unigram gate could not tell; bigram-less docs fail explicitly
    assert got[100][2]
    assert got[101][1] < got[100][1] and not got[101][2]
    assert not got[102][2] and got[102][1] is None
    # replay + re-delivery fold nothing
    v = current_snapshot(st).version
    sink(arrivals.filter("doc_id >= 102"), 1)
    assert current_snapshot(st).version == v
    sink(arrivals.filter("doc_id = 100"), 2)
    assert len(read_snapshot(spark, st).collect()) == 3


def test_streaming_bigram_gate_frozen_model_refusals(spark, tmp_path):
    from airflow_crypto_btc_spark.operators.text import build_bigram_lm
    from airflow_crypto_btc_spark.streaming.text_stream import (
        bigram_scores_sink,
    )

    bt, ut, arrivals = _bigram_fixtures(spark, tmp_path)
    st = str(tmp_path / "scores")
    with pytest.raises(ValueError, match="stale bigram LM"):
        bigram_scores_sink(bt, ut, st, query_name="g", expect_source="v2")
    sink = bigram_scores_sink(bt, ut, st, query_name="g",
                              expect_source="v1")
    sink(arrivals.filter("doc_id < 102"), 0)
    # either table rebuilt under the running stream → refuse
    corpus2 = spark.createDataFrame(
        [(0, "entirely different corpus text")],
        "doc_id long, text string",
    )
    build_bigram_lm(
        spark, corpus2, bt, str(tmp_path / "uni2"), source_version="v1"
    )
    with pytest.raises(ValueError, match="changed under a running"):
        sink(arrivals.filter("doc_id >= 102"), 1)
