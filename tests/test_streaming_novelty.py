"""Streaming novelty guard: drained novel set equals the batch
operator over the union, each content emitted once, replays fold
nothing, bloom state stays fixed-size, param mismatch is refused."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airflow_crypto_btc_spark.sources.snapshot_table import (
    current_snapshot,
    read_snapshot,
)
from airflow_crypto_btc_spark.sources.tables import load_table
from airflow_crypto_btc_spark.streaming.novelty_stream import novelty_sink


def _tables(tmp_path):
    return (
        str(tmp_path / "digests"),
        str(tmp_path / "novel"),
        str(tmp_path / "bloom"),
    )


def test_streaming_novelty_matches_batch(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    d_tbl, n_tbl, b_tbl = _tables(tmp_path)
    sink = novelty_sink(d_tbl, n_tbl, b_tbl, query_name="nov")
    # three arrival waves with overlapping CONTENT across waves
    waves = [
        docs.filter("doc_id % 3 = 0"),
        docs.filter("doc_id % 3 <= 1"),  # re-delivers wave 1 content
        docs,                            # re-delivers everything
    ]
    for i, wdf in enumerate(waves):
        sink(wdf, i)
    got_digests = {
        r["digest"] for r in read_snapshot(spark, d_tbl).collect()
    }
    norm = "md5(lower(trim(regexp_replace(text, '\\\\s+', ' '))))"
    want = {
        r["d"]
        for r in docs.select(F.expr(norm).alias("d")).distinct().collect()
    }
    assert got_digests == want
    # each content exactly once in the novel table
    novel = read_snapshot(spark, n_tbl).collect()
    assert len(novel) == len({r["digest"] for r in novel}) == len(want)
    # replaying the last batch folds nothing (txn skip + idempotent OR)
    v_d = current_snapshot(d_tbl).version
    bm_before = read_snapshot(spark, b_tbl).collect()[0]["bm"]
    sink(docs, 2)
    assert current_snapshot(d_tbl).version == v_d
    assert bytes(
        read_snapshot(spark, b_tbl).collect()[0]["bm"]
    ) == bytes(bm_before)


def test_streaming_novelty_bloom_state_fixed_size(spark, tmp_path):
    d_tbl, n_tbl, b_tbl = _tables(tmp_path)
    sink = novelty_sink(
        d_tbl, n_tbl, b_tbl, query_name="sz", n_bits=1 << 12
    )
    schema = "doc_id long, text string"
    for i in range(3):
        sink(
            spark.createDataFrame(
                [(i * 10 + j, f"doc {i} {j} content") for j in range(5)],
                schema,
            ),
            i,
        )
    bm = read_snapshot(spark, b_tbl).collect()
    assert len(bm) == 1 and len(bytes(bm[0]["bm"])) == (1 << 12) // 8
    assert current_snapshot(b_tbl).meta == {"n_bits": 1 << 12, "k": 5}


def test_streaming_novelty_param_mismatch_refused(spark, tmp_path):
    d_tbl, n_tbl, b_tbl = _tables(tmp_path)
    schema = "doc_id long, text string"
    novelty_sink(d_tbl, n_tbl, b_tbl, query_name="p", n_bits=1 << 12)(
        spark.createDataFrame([(1, "x")], schema), 0
    )
    with pytest.raises(ValueError, match="n_bits"):
        novelty_sink(
            d_tbl, n_tbl, b_tbl, query_name="p", n_bits=1 << 13
        )(spark.createDataFrame([(2, "y")], schema), 1)


def test_streaming_novelty_crash_between_appends_replays_clean(
    spark, tmp_path, monkeypatch
):
    """Commit order is load-bearing: a crash AFTER the novel append but
    BEFORE the digests append must replay to the identical novel set.
    The dangerous row is a bloom FALSE POSITIVE (suspect path): with
    digests-first ordering the replay would anti-join it against its
    own half-committed digest and lose it forever — this test finds
    such a row deterministically against a tiny filter and pins that
    it survives."""
    from airflow_crypto_btc_spark.operators.bloom import (
        _digest_cols,
        bloom_flags,
    )
    from airflow_crypto_btc_spark.streaming import novelty_stream as ns

    d_tbl, n_tbl, b_tbl = _tables(tmp_path)
    schema = "doc_id long, text string"
    sink = ns.novelty_sink(
        d_tbl, n_tbl, b_tbl, query_name="crash", n_bits=8, k=3
    )
    sink(spark.createDataFrame([(1, "seed document alpha")], schema), 0)

    # deterministic search: a NOVEL text the 8-bit bloom flags as
    # maybe-seen (false positive) — hashes are deterministic, so the
    # found candidate is stable across runs
    bitmap = bytes(read_snapshot(spark, b_tbl).collect()[0]["bm"])
    fp_text = None
    for j in range(300):
        cand = spark.createDataFrame(
            [(2, f"candidate novel text {j}")], schema
        )
        hashed = _digest_cols(cand, "text").selectExpr(
            "doc_id AS id", "_h1", "_h2"
        )
        if bloom_flags(hashed, bitmap, 8, 3).collect()[0]["maybe_seen"]:
            fp_text = f"candidate novel text {j}"
            break
    assert fp_text is not None, "no false positive found in 300 tries"

    real_append = ns.append
    calls = {"n": 0}

    def crashing_append(spark_, df, table, txn_id=None, **kw):
        calls["n"] += 1
        if calls["n"] == 2:  # after digests (call 1), before novel —
            # the round-9 digests-first order: the replay must recompute
            # its novel set from the digests txn's change feed, because
            # the live anti-join would now see the batch's own digests
            # and silently drop the bloom-false-positive row
            raise RuntimeError("simulated crash")
        return real_append(spark_, df, table, txn_id=txn_id, **kw)

    monkeypatch.setattr(ns, "append", crashing_append)
    batch1 = spark.createDataFrame([(2, fp_text)], schema)
    with pytest.raises(RuntimeError, match="simulated crash"):
        sink(batch1, 1)
    monkeypatch.setattr(ns, "append", real_append)
    sink(batch1, 1)  # the streaming engine replays batch 1

    novel = read_snapshot(spark, n_tbl).collect()
    assert sorted(r["id"] for r in novel) == [1, 2]  # fp row survived
    assert len(novel) == 2  # and exactly once
    digests = {r["digest"] for r in read_snapshot(spark, d_tbl).collect()}
    assert len(digests) == 2
    # a later re-delivery of the same content contributes nothing
    sink(spark.createDataFrame([(9, fp_text)], schema), 2)
    assert len(read_snapshot(spark, n_tbl).collect()) == 2
