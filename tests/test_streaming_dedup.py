"""Streaming near-dup detection (streaming/dedup_stream.py): the
micro-batch-maintained LSH index must emit exactly the one-shot batch
pair set, each pair once, and replays must fold nothing."""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_crypto_btc_spark.operators.dedup import minhash_lsh_pairs
from airflow_crypto_btc_spark.sources.tables import load_table
from airflow_crypto_btc_spark.streaming.dedup_stream import (
    near_dup_index_sink,
)


def _pairs_set(df):
    return {tuple(r) for r in df.collect()}


def test_streaming_dedup_matches_batch(spark, sf_dir, tmp_path):
    """Documents arrive in ≥2 micro-batches; cross-batch near-dup pairs
    must surface when their LATER endpoint arrives, and the drained
    pairs table must equal the one-shot batch operator."""
    docs = load_table(spark, sf_dir, "documents")
    landing = str(tmp_path / "landing")
    # split so near-dup pairs straddle the batch boundary
    for pred in ("doc_id % 2 = 0", "doc_id % 2 = 1"):
        docs.filter(pred).coalesce(1).write.mode("append").parquet(landing)

    sets_tbl = str(tmp_path / "lsh_sets")
    bands_tbl = str(tmp_path / "lsh_bands")
    pairs_tbl = str(tmp_path / "pairs")
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
    )
    q = (
        stream.writeStream.foreachBatch(
            near_dup_index_sink(
                sets_tbl, bands_tbl, pairs_tbl, query_name="dedup-test"
            )
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    from airflow_crypto_btc_spark.sources.snapshot_table import (
        current_snapshot,
        read_snapshot,
    )

    got = _pairs_set(read_snapshot(spark, pairs_tbl))
    want = _pairs_set(minhash_lsh_pairs(docs))
    assert got == want and got

    # exactly-once: replaying a batch's fold (same txn ids) changes nothing
    v_before = current_snapshot(pairs_tbl).version
    near_dup_index_sink(
        sets_tbl, bands_tbl, pairs_tbl, query_name="dedup-test"
    )(docs.filter("doc_id % 2 = 0"), 0)
    assert current_snapshot(pairs_tbl).version == v_before
    assert _pairs_set(read_snapshot(spark, pairs_tbl)) == want


def test_streaming_dedup_pairs_emitted_once(spark, tmp_path):
    """A pair whose endpoints arrive in different batches appears exactly
    once, tagged to the later batch."""
    a = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows1 = [(1, a), (2, "totally unrelated text about engines and turbines here now")]
    rows2 = [(3, a.replace("lazy", "sleepy"))]
    schema = "doc_id long, text string"
    sink = near_dup_index_sink(
        str(tmp_path / "s"), str(tmp_path / "b"), str(tmp_path / "p"),
        query_name="once",
    )
    sink(spark.createDataFrame(rows1, schema), 0)
    sink(spark.createDataFrame(rows2, schema), 1)

    from airflow_crypto_btc_spark.sources.snapshot_table import (
        read_snapshot,
    )

    pairs = read_snapshot(spark, str(tmp_path / "p")).collect()
    assert [(r["id_a"], r["id_b"]) for r in pairs] == [(1, 3)]


def test_streaming_contamination_guard_matches_batch(spark, sf_dir, tmp_path):
    """Train docs arrive in ≥2 micro-batches; the union of per-batch
    contamination flags must equal the one-shot batch sweep, and a
    replayed batch must append nothing."""
    from airflow_crypto_btc_spark.operators.curation import (
        contamination_pairs,
    )
    from airflow_crypto_btc_spark.operators.text import train_test_split
    from airflow_crypto_btc_spark.sources.snapshot_table import (
        current_snapshot,
        read_snapshot,
    )
    from airflow_crypto_btc_spark.streaming.dedup_stream import (
        contamination_guard_sink,
    )

    docs = train_test_split(load_table(spark, sf_dir, "documents"))
    train = docs.filter("split = 'train'").select("doc_id", "text")
    eval_docs = docs.filter("split = 'test'").select("doc_id", "text")

    landing = str(tmp_path / "landing")
    for pred in ("doc_id % 2 = 0", "doc_id % 2 = 1"):
        train.filter(pred).coalesce(1).write.mode("append").parquet(landing)

    flags_tbl = str(tmp_path / "flags")
    q = (
        spark.readStream.schema(train.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
        .writeStream.foreachBatch(
            contamination_guard_sink(
                eval_docs, flags_tbl, query_name="contam-test"
            )
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = _pairs_set(read_snapshot(spark, flags_tbl))
    want = _pairs_set(contamination_pairs(train, eval_docs))
    assert got == want and got

    v = current_snapshot(flags_tbl).version
    contamination_guard_sink(
        eval_docs, flags_tbl, query_name="contam-test"
    )(train.filter("doc_id % 2 = 0"), 0)
    assert current_snapshot(flags_tbl).version == v


def test_streaming_dedup_redelivery_is_harmless(spark, tmp_path):
    """An at-least-once source re-delivering a document in a LATER batch
    must not duplicate index rows or re-emit its pairs."""
    from airflow_crypto_btc_spark.sources.snapshot_table import (
        read_snapshot,
    )
    from airflow_crypto_btc_spark.streaming.dedup_stream import (
        near_dup_index_sink,
    )

    a = "the quick brown fox jumps over the lazy dog near the river bank today"
    schema = "doc_id long, text string"
    sink = near_dup_index_sink(
        str(tmp_path / "s"), str(tmp_path / "b"), str(tmp_path / "p"),
        query_name="redeliver",
    )
    sink(spark.createDataFrame([(1, a)], schema), 0)
    # batch 1 re-delivers doc 1 (and carries it twice) plus a near-dup
    sink(
        spark.createDataFrame(
            [(1, a), (1, a), (2, a.replace("lazy", "sleepy"))], schema
        ),
        1,
    )
    sink(spark.createDataFrame([(1, a)], schema), 2)  # and again

    sets = read_snapshot(spark, str(tmp_path / "s")).collect()
    assert sorted(r["id"] for r in sets) == [1, 2]  # one index row per id
    pairs = read_snapshot(spark, str(tmp_path / "p")).collect()
    assert [(r["id_a"], r["id_b"]) for r in pairs] == [(1, 2)]


def test_streaming_dedup_crash_between_appends_replays_clean(
    spark, tmp_path, monkeypatch
):
    """Crash mid-batch (after the bands fold, before sets/pairs — the
    round-9 bands-first CAS order): the replayed batch must read the
    PRE-FOLD index snapshots (the live bands now hold its own rows,
    which would empty the fresh set), land the missing commits without
    duplicating index rows or pairs, and a subsequent batch must see a
    consistent index."""
    from airflow_crypto_btc_spark.sources import snapshot_table as st
    from airflow_crypto_btc_spark.streaming import dedup_stream as ds

    a = "the quick brown fox jumps over the lazy dog near the river bank today"
    schema = "doc_id long, text string"
    s_tbl, b_tbl, p_tbl = (
        str(tmp_path / "s"), str(tmp_path / "b"), str(tmp_path / "p")
    )
    sink = ds.near_dup_index_sink(s_tbl, b_tbl, p_tbl, query_name="crash")
    sink(spark.createDataFrame([(1, a)], schema), 0)

    real_append = ds.append
    calls = {"n": 0}

    def crashing_append(spark_, df, table, txn_id=None, **kw):
        calls["n"] += 1
        if calls["n"] == 2:  # after bands (call 1), before sets (call 2)
            raise RuntimeError("simulated crash")
        return real_append(spark_, df, table, txn_id=txn_id, **kw)

    monkeypatch.setattr(ds, "append", crashing_append)
    batch1 = spark.createDataFrame(
        [(2, a.replace("lazy", "sleepy"))], schema
    )
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="simulated crash"):
        sink(batch1, 1)
    monkeypatch.setattr(ds, "append", real_append)
    sink(batch1, 1)  # the streaming engine replays batch 1

    from airflow_crypto_btc_spark.sources.snapshot_table import (
        read_snapshot,
    )

    assert sorted(
        r["id"] for r in read_snapshot(spark, s_tbl).collect()
    ) == [1, 2]
    pairs = read_snapshot(spark, p_tbl).collect()
    assert [(r["id_a"], r["id_b"]) for r in pairs] == [(1, 2)]
    # a later near-dup still pairs against the repaired index: the
    # drained table must equal the one-shot batch operator over all
    # three docs (which pairs band together is LSH's call, not ours)
    third = spark.createDataFrame([(3, a.replace("lazy", "dozy"))], schema)
    sink(third, 2)
    all_docs = spark.createDataFrame(
        [(1, a), (2, a.replace("lazy", "sleepy")),
         (3, a.replace("lazy", "dozy"))], schema
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in read_snapshot(spark, p_tbl).collect()
    }
    want = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(all_docs).collect()
    }
    assert got == want and (1, 2) in got and (2, 3) in got


def test_streaming_dedup_id_col_named_id(spark, tmp_path):
    """The sink must work when the caller's id column is literally
    named 'id' (regression: unqualified reference was ambiguous)."""
    from airflow_crypto_btc_spark.sources.snapshot_table import (
        read_snapshot,
    )
    from airflow_crypto_btc_spark.streaming.dedup_stream import (
        near_dup_index_sink,
    )

    a = "the quick brown fox jumps over the lazy dog near the river bank today"
    schema = "id long, text string"
    sink = near_dup_index_sink(
        str(tmp_path / "s"), str(tmp_path / "b"), str(tmp_path / "p"),
        query_name="idcol", id_col="id",
    )
    sink(spark.createDataFrame([(1, a)], schema), 0)
    sink(spark.createDataFrame(
        [(2, a.replace("lazy", "sleepy"))], schema), 1)
    pairs = read_snapshot(spark, str(tmp_path / "p")).collect()
    assert [(r["id_a"], r["id_b"]) for r in pairs] == [(1, 2)]


def test_streaming_dedup_compaction_bounds_parts(spark, tmp_path):
    """With compact_every set, a long run's live part count stays
    bounded (appends accumulate, every Nth batch rewrites to
    target_parts) and the drained pairs equal an uncompacted run."""
    from airflow_crypto_btc_spark.sources.snapshot_table import (
        current_snapshot,
        read_snapshot,
    )

    a = "the quick brown fox jumps over the lazy dog near the river bank today"
    schema = "doc_id long, text string"
    batches = [
        spark.createDataFrame([(i, a.replace("lazy", f"w{i}"))], schema)
        for i in range(12)
    ]
    sink = near_dup_index_sink(
        str(tmp_path / "s"), str(tmp_path / "b"), str(tmp_path / "p"),
        query_name="compacted", compact_every=4, compact_target_parts=1,
    )
    plain = near_dup_index_sink(
        str(tmp_path / "s0"), str(tmp_path / "b0"), str(tmp_path / "p0"),
        query_name="plain",
    )
    for i, b in enumerate(batches):
        sink(b, i)
        plain(b, i)
        # invariant at EVERY point of the run, not just the end: live
        # parts never exceed one compaction target plus one append window
        for t in ("s", "b"):
            n_live = len(current_snapshot(str(tmp_path / t)).files)
            assert n_live <= 1 + 4, (t, i, n_live)
    # final batch index 11 triggered compaction: fully collapsed
    assert len(current_snapshot(str(tmp_path / "s")).files) == 1
    assert len(current_snapshot(str(tmp_path / "b")).files) == 1
    got = _pairs_set(read_snapshot(spark, str(tmp_path / "p")))
    want = _pairs_set(read_snapshot(spark, str(tmp_path / "p0")))
    assert got == want and got


def test_streaming_dedup_conflicting_redelivery_quarantined(spark, tmp_path):
    """A re-delivered id with DIFFERENT text keeps its original index
    rows (insert-only contract) but lands in the conflicts table;
    identical re-delivery and batch replay record nothing."""
    from airflow_crypto_btc_spark.sources.snapshot_table import (
        current_snapshot,
        read_snapshot,
    )

    a = "the quick brown fox jumps over the lazy dog near the river bank today"
    b = "completely different replacement content for document one arrives now"
    schema = "doc_id long, text string"
    c_tbl = str(tmp_path / "conflicts")
    sink = near_dup_index_sink(
        str(tmp_path / "s"), str(tmp_path / "b"), str(tmp_path / "p"),
        query_name="quarantine", conflicts_table=c_tbl,
    )
    sink(spark.createDataFrame([(1, a)], schema), 0)
    # updated content for an indexed id → quarantined, index content
    # untouched (batch 1 still commits its empty-append versions)
    sink(spark.createDataFrame([(1, b)], schema), 1)
    v_sets = current_snapshot(str(tmp_path / "s")).version
    rows = read_snapshot(spark, c_tbl).collect()
    assert [(r["id"],) for r in rows] == [(1,)]
    assert rows[0]["digest_new"] != rows[0]["digest_indexed"]
    sets = read_snapshot(spark, str(tmp_path / "s")).collect()
    assert len(sets) == 1 and sets[0]["digest"] == rows[0]["digest_indexed"]
    # replaying the SAME batch folds nothing (txn id skip)
    v_c = current_snapshot(c_tbl).version
    sink(spark.createDataFrame([(1, b)], schema), 1)
    assert current_snapshot(c_tbl).version == v_c
    assert current_snapshot(str(tmp_path / "s")).version == v_sets
    # identical re-delivery in a NEW batch: dropped silently, no conflict
    sink(spark.createDataFrame([(1, a)], schema), 2)
    assert len(read_snapshot(spark, c_tbl).collect()) == 1
