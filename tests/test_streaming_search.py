"""Streaming BM25 index maintenance: drained index serves the same
ranking as the inline operator, re-delivery is harmless, crash replays
fold nothing new."""

from __future__ import annotations

import pytest

from airflow_crypto_btc_spark.operators import search as S
from airflow_crypto_btc_spark.sources.tables import load_table
from airflow_crypto_btc_spark.sources.snapshot_table import (
    current_snapshot,
    read_snapshot,
)
from airflow_crypto_btc_spark.streaming import search_stream as st


def _topk(df):
    return sorted(map(tuple, df.collect()))


def test_streaming_bm25_index_matches_inline(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    landing = str(tmp_path / "landing")
    for pred in ("doc_id % 2 = 0", "doc_id % 2 = 1"):
        docs.filter(pred).coalesce(1).write.mode("append").parquet(landing)
    p_tbl, d_tbl = str(tmp_path / "post"), str(tmp_path / "dlen")
    q = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
        .writeStream.foreachBatch(
            st.bm25_index_sink(p_tbl, d_tbl, query_name="bm25-test")
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    queries = S.default_queries(docs)
    served = _topk(S.bm25_topk_from_index(spark, p_tbl, d_tbl, queries))
    inline = _topk(S.bm25_topk(docs, queries))
    assert served == inline and served

    # re-delivery of an already-indexed slice is a no-op at the data
    # level (a new doclen fold with fresh txn commits empty content)
    sink = st.bm25_index_sink(p_tbl, d_tbl, query_name="bm25-test2")
    sink(docs.filter("doc_id % 2 = 0"), 0)
    assert read_snapshot(spark, d_tbl).count() == docs.count()
    assert _topk(
        S.bm25_topk_from_index(spark, p_tbl, d_tbl, queries)
    ) == inline

    # replaying the ORIGINAL batch (same txn ids) changes nothing at all
    v_d = current_snapshot(d_tbl).version
    v_p = current_snapshot(p_tbl).version
    st.bm25_index_sink(p_tbl, d_tbl, query_name="bm25-test")(
        docs.filter("doc_id % 2 = 0"), 0
    )
    assert current_snapshot(d_tbl).version == v_d
    assert current_snapshot(p_tbl).version == v_p


def test_streaming_bm25_crash_between_appends_replays_clean(
    spark, tmp_path, monkeypatch
):
    docs = spark.createDataFrame(
        [(0, "alpha beta"), (1, "beta gamma"), (2, "gamma delta")],
        "doc_id bigint, text string",
    )
    p_tbl, d_tbl = str(tmp_path / "post"), str(tmp_path / "dlen")
    sink = st.bm25_index_sink(p_tbl, d_tbl, query_name="crash")
    sink(docs.filter("doc_id = 0"), 0)

    real_append = st.append
    def crashing(spark_, df, table, txn_id=None, **kw):
        if table == p_tbl and txn_id == "crash:1:postings":
            raise RuntimeError("simulated crash")
        return real_append(spark_, df, table, txn_id=txn_id, **kw)

    monkeypatch.setattr(st, "append", crashing)
    with pytest.raises(RuntimeError, match="simulated crash"):
        sink(docs.filter("doc_id > 0"), 1)
    # crash window: docs registered (dl live) but postings absent
    assert read_snapshot(spark, d_tbl).count() == 3
    monkeypatch.setattr(st, "append", real_append)

    sink(docs.filter("doc_id > 0"), 1)  # engine replay
    queries = spark.createDataFrame(
        [(9, "beta"), (9, "delta")], "query_id bigint, token string"
    )
    served = _topk(S.bm25_topk_from_index(spark, p_tbl, d_tbl, queries))
    assert served == _topk(S.bm25_topk(docs, queries))
    # idempotent: one more replay moves nothing
    v_d, v_p = (
        current_snapshot(d_tbl).version,
        current_snapshot(p_tbl).version,
    )
    sink(docs.filter("doc_id > 0"), 1)
    assert (
        current_snapshot(d_tbl).version,
        current_snapshot(p_tbl).version,
    ) == (v_d, v_p)
