"""Streaming leakage-safe split maintenance: the drained state must
equal the one-shot batch split, cluster merges must emit moved-docs
audit rows, and crash replays must fold nothing new."""

from __future__ import annotations

import pytest

from airflow_crypto_btc_spark.operators.curation import leakage_safe_split
from airflow_crypto_btc_spark.operators.dedup import (
    minhash_lsh_pairs,
    near_dup_clusters,
)
from airflow_crypto_btc_spark.sources.tables import load_table
from airflow_crypto_btc_spark.sources.snapshot_table import (
    append,
    current_snapshot,
    read_snapshot,
    read_snapshot_or_none,
)
from airflow_crypto_btc_spark.streaming import split_stream as ss


def _rows(df):
    return {
        (r["doc_id"], r["cluster_id"], r["split"], r["moved"])
        for r in df.collect()
    }


def _batch_want(spark, docs):
    pairs = minhash_lsh_pairs(
        docs, num_hashes=12, bands=4, jaccard_threshold=0.5
    )
    return _rows(leakage_safe_split(docs, near_dup_clusters(docs, pairs)))


def test_streaming_split_matches_batch(spark, sf_dir, tmp_path):
    """Docs arrive in two micro-batches over a fully-built pairs table;
    the drained latest-wins view must equal the one-shot batch split."""
    docs = load_table(spark, sf_dir, "documents")
    pairs_tbl = str(tmp_path / "pairs")
    append(
        spark,
        minhash_lsh_pairs(
            docs, num_hashes=12, bands=4, jaccard_threshold=0.5
        ),
        pairs_tbl,
    )
    landing = str(tmp_path / "landing")
    for pred in ("doc_id % 2 = 0", "doc_id % 2 = 1"):
        docs.filter(pred).coalesce(1).write.mode("append").parquet(landing)

    splits_tbl = str(tmp_path / "splits")
    moves_tbl = str(tmp_path / "moves")
    q = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
        .writeStream.foreachBatch(
            ss.leakage_split_sink(
                pairs_tbl, splits_tbl, moves_tbl, query_name="split-test"
            )
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = _rows(ss.split_assignments(spark, splits_tbl))
    assert got == _batch_want(spark, docs)

    # exactly-once: replaying a fold (same txn ids) changes nothing
    v = current_snapshot(splits_tbl).version
    ss.leakage_split_sink(
        pairs_tbl, splits_tbl, moves_tbl, query_name="split-test"
    )(docs.filter("doc_id % 2 = 0"), 0)
    assert current_snapshot(splits_tbl).version == v
    assert _rows(ss.split_assignments(spark, splits_tbl)) == got


def test_streaming_split_merge_emits_moves_and_bounds_writes(
    spark, tmp_path
):
    """A later-discovered edge merges two clusters; exactly the docs
    whose SIDE flips land in the moves feed, and untouched clusters'
    assignments are never rewritten."""
    # hand-built graph: cluster {1,2} and {30,31} plus singletons 50, 51
    docs = spark.createDataFrame(
        [(i,) for i in (1, 2, 30, 31, 50, 51)], "doc_id bigint"
    )
    pairs_tbl = str(tmp_path / "pairs")
    splits_tbl = str(tmp_path / "splits")
    moves_tbl = str(tmp_path / "moves")
    sink = ss.leakage_split_sink(
        pairs_tbl, splits_tbl, moves_tbl, query_name="merge-test"
    )

    append(
        spark,
        spark.createDataFrame([(1, 2), (30, 31)], "id_a bigint, id_b bigint"),
        pairs_tbl,
    )
    sink(docs, 0)
    state0 = {
        r["doc_id"]: (r["cluster_id"], r["split"])
        for r in ss.split_assignments(spark, splits_tbl).collect()
    }
    assert state0[1][0] == state0[2][0] == 1
    assert state0[30][0] == state0[31][0] == 30
    assert state0[50][0] == 50 and state0[51][0] == 51

    # batch 1: no new docs, one bridging edge 2-30 -> {1,2,30,31}
    append(
        spark,
        spark.createDataFrame([(2, 30)], "id_a bigint, id_b bigint"),
        pairs_tbl,
    )
    sink(spark.createDataFrame([], "doc_id bigint"), 1)
    state1 = {
        r["doc_id"]: (r["cluster_id"], r["split"])
        for r in ss.split_assignments(spark, splits_tbl).collect()
    }
    assert {state1[i][0] for i in (1, 2, 30, 31)} == {1}
    assert state1[50] == state0[50] and state1[51] == state0[51]

    # bounded writes: batch 1 appended rows ONLY for the merged cluster
    log = read_snapshot(spark, splits_tbl)
    b1 = {r["doc_id"] for r in log.filter("as_of_batch = 1").collect()}
    assert b1 == {30, 31}  # 1,2 keep cluster 1: unchanged, not rewritten

    # moves feed: exactly the docs whose side flipped
    flipped = {
        d for d in (30, 31) if state1[d][1] != state0[d][1]
    }
    moves = read_snapshot_or_none(spark, moves_tbl)
    got_moves = (
        {r["doc_id"] for r in moves.filter("as_of_batch = 1").collect()}
        if moves is not None
        else set()
    )
    assert got_moves == flipped
    # matches the batch operator on the final graph
    all_pairs = spark.createDataFrame(
        [(1, 2), (30, 31), (2, 30)], "id_a bigint, id_b bigint"
    )
    want = _rows(
        leakage_safe_split(docs, near_dup_clusters(docs, all_pairs))
    )
    assert _rows(ss.split_assignments(spark, splits_tbl)) == want


def test_streaming_split_crash_between_commits_replays_clean(
    spark, tmp_path, monkeypatch
):
    """Crash after the splits CAS but before the moves append: the
    replayed fold recomputes from the pinned pre-fold state and lands
    the identical moves rows exactly once."""
    docs = spark.createDataFrame([(i,) for i in (1, 2, 30, 31)],
                                 "doc_id bigint")
    pairs_tbl = str(tmp_path / "pairs")
    splits_tbl = str(tmp_path / "splits")
    moves_tbl = str(tmp_path / "moves")
    sink = ss.leakage_split_sink(
        pairs_tbl, splits_tbl, moves_tbl, query_name="crash-test"
    )
    append(
        spark,
        spark.createDataFrame([(1, 2), (30, 31)], "id_a bigint, id_b bigint"),
        pairs_tbl,
    )
    sink(docs, 0)

    append(
        spark,
        spark.createDataFrame([(2, 30)], "id_a bigint, id_b bigint"),
        pairs_tbl,
    )

    real_append = ss.append
    def crashing_append(spark_, df, table, txn_id=None, **kw):
        if table == moves_tbl and txn_id == "crash-test:1:moves":
            raise RuntimeError("simulated crash")
        return real_append(spark_, df, table, txn_id=txn_id, **kw)

    monkeypatch.setattr(ss, "append", crashing_append)
    with pytest.raises(RuntimeError, match="simulated crash"):
        sink(spark.createDataFrame([], "doc_id bigint"), 1)
    monkeypatch.setattr(ss, "append", real_append)

    sink(spark.createDataFrame([], "doc_id bigint"), 1)  # engine replay
    # replaying once more folds nothing
    v_splits = current_snapshot(splits_tbl).version
    v_moves = current_snapshot(moves_tbl).version
    sink(spark.createDataFrame([], "doc_id bigint"), 1)
    assert current_snapshot(splits_tbl).version == v_splits
    assert current_snapshot(moves_tbl).version == v_moves

    all_pairs = spark.createDataFrame(
        [(1, 2), (30, 31), (2, 30)], "id_a bigint, id_b bigint"
    )
    want = _rows(
        leakage_safe_split(docs, near_dup_clusters(docs, all_pairs))
    )
    assert _rows(ss.split_assignments(spark, splits_tbl)) == want
    # the merged cluster's movers appear exactly once in the feed
    moves = read_snapshot(spark, moves_tbl)
    ids = [r["doc_id"] for r in moves.collect()]
    assert len(ids) == len(set(ids))


def test_streaming_split_survives_checkpoint_restart(spark, tmp_path):
    """Batch ids RESTART at 0 when a stream is re-pointed at a fresh
    checkpoint/query name.  A post-restart fold that merges clusters
    then appends rows with a SMALLER as_of_batch than the docs'
    pre-restart rows — a batch-ordered latest-wins window would serve
    the stale pre-restart assignment forever (the round-11 advice
    finding).  The shared cluster_id-ordered window must serve the
    merged cluster, and the fold's own prior read must seed from it."""
    pairs_tbl = str(tmp_path / "pairs")
    splits_tbl = str(tmp_path / "splits")
    moves_tbl = str(tmp_path / "moves")

    # stream A: two folds build clusters {1,2} and {30,31}, then merge
    # them to cluster 1 at as_of_batch=1
    sink_a = ss.leakage_split_sink(
        pairs_tbl, splits_tbl, moves_tbl, query_name="restart-a"
    )
    docs0 = spark.createDataFrame(
        [(i,) for i in (1, 2, 30, 31)], "doc_id bigint"
    )
    append(
        spark,
        spark.createDataFrame(
            [(1, 2), (30, 31)], "id_a bigint, id_b bigint"
        ),
        pairs_tbl,
    )
    sink_a(docs0, 0)
    append(
        spark,
        spark.createDataFrame([(2, 30)], "id_a bigint, id_b bigint"),
        pairs_tbl,
    )
    sink_a(spark.createDataFrame([], "doc_id bigint"), 1)

    # restart: stream B starts over at batch_id=0 and folds a NEW doc 0
    # with an edge (0, 1) — the whole component's min label drops to 0,
    # so every member appends a row with as_of_batch=0, SMALLER than
    # their live as_of_batch=1 rows from stream A
    sink_b = ss.leakage_split_sink(
        pairs_tbl, splits_tbl, moves_tbl, query_name="restart-b"
    )
    append(
        spark,
        spark.createDataFrame([(0, 1)], "id_a bigint, id_b bigint"),
        pairs_tbl,
    )
    sink_b(spark.createDataFrame([(0,)], "doc_id bigint"), 0)

    docs = spark.createDataFrame(
        [(i,) for i in (0, 1, 2, 30, 31)], "doc_id bigint"
    )
    all_pairs = spark.createDataFrame(
        [(1, 2), (30, 31), (2, 30), (0, 1)], "id_a bigint, id_b bigint"
    )
    want = _rows(
        leakage_safe_split(docs, near_dup_clusters(docs, all_pairs))
    )
    got = _rows(ss.split_assignments(spark, splits_tbl))
    assert got == want
    assert {c for (_, c, _, _) in got} == {0}  # the merge actually served

    # a FURTHER post-restart fold must seed its prior from the merged
    # state (the fold-internal window had the same bug): a no-op batch
    # appends ZERO rows because nothing changed (the commit itself still
    # lands — empty folds version the changelog by design)
    n = read_snapshot(spark, splits_tbl).count()
    sink_b(spark.createDataFrame([], "doc_id bigint"), 1)
    assert read_snapshot(spark, splits_tbl).count() == n
    assert _rows(ss.split_assignments(spark, splits_tbl)) == want
