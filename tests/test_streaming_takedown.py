"""Streaming takedown queue (streaming/takedown_stream.py): a real
deletion-request stream cascades per batch, batched takedowns compose
to the one-shot rebuild, and crash replays complete without
double-applying or double-reporting."""

from __future__ import annotations

import pytest

from airflow_crypto_btc_spark.operators.search import (
    bm25_topk,
    bm25_topk_from_index,
    build_bm25_index,
    default_queries,
)
from airflow_crypto_btc_spark.sources.snapshot_table import (
    current_snapshot,
    read_snapshot,
    read_snapshot_or_none,
)
from airflow_crypto_btc_spark.sources.tables import load_table
from airflow_crypto_btc_spark.streaming import takedown_stream as ts


def test_streamed_deletion_batches_compose_to_one_shot(
    spark, sf_dir, tmp_path
):
    """D arrives through a REAL availableNow stream in per-file
    batches; the drained index equals the one-shot rebuild on
    corpus − D, and the audit table carries each batch's rows exactly
    once."""
    docs = load_table(spark, sf_dir, "documents")
    post, dlen = str(tmp_path / "post"), str(tmp_path / "dlen")
    build_bm25_index(spark, docs, post, dlen, source_version="v1")

    landing = str(tmp_path / "queue")
    for pred in ("doc_id % 20 = 3", "doc_id % 20 = 13"):
        docs.filter(pred).select("doc_id").coalesce(1).write.mode(
            "append"
        ).parquet(landing)

    audit = str(tmp_path / "audit")
    q = (
        spark.readStream.schema("doc_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
        .writeStream.foreachBatch(
            ts.takedown_sink(
                query_name="tdq",
                bm25=(post, dlen),
                report_table=audit,
            )
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    remaining = docs.filter("doc_id % 10 != 3")
    queries = default_queries(remaining)
    got = sorted(
        map(tuple, bm25_topk_from_index(
            spark, post, dlen, queries
        ).collect())
    )
    want = sorted(map(tuple, bm25_topk(remaining, queries).collect()))
    assert got == want

    rep = read_snapshot(spark, audit)
    assert {r["batch_id"] for r in rep.collect()} == {0, 1}
    per_batch = {
        (r["batch_id"], r["artifact"]) for r in rep.collect()
    }
    assert len(per_batch) == rep.count()  # no duplicate audit rows


def test_streamed_takedown_crash_replays_clean(
    spark, sf_dir, tmp_path, monkeypatch
):
    """Crash between the cascade and the audit append: the replayed
    batch skips the landed evictions (txn ids) and lands the audit
    exactly once."""
    docs = load_table(spark, sf_dir, "documents")
    post, dlen = str(tmp_path / "post"), str(tmp_path / "dlen")
    build_bm25_index(spark, docs, post, dlen, source_version="v1")
    audit = str(tmp_path / "audit")
    sink = ts.takedown_sink(
        query_name="tdq", bm25=(post, dlen), report_table=audit
    )

    real_append = ts.append

    def crashing_append(spark_, df, table, txn_id=None, **kw):
        if table == audit and txn_id == "tdq:0:report":
            raise RuntimeError("simulated crash")
        return real_append(spark_, df, table, txn_id=txn_id, **kw)

    monkeypatch.setattr(ts, "append", crashing_append)
    d = docs.filter("doc_id % 10 = 3").select("doc_id")
    with pytest.raises(RuntimeError, match="simulated crash"):
        sink(d, 0)
    monkeypatch.setattr(ts, "append", real_append)

    v_post = current_snapshot(post).version  # evictions already landed
    sink(d, 0)  # engine replay
    assert current_snapshot(post).version == v_post  # skip, not re-apply
    rep = read_snapshot_or_none(spark, audit)
    assert rep is not None and rep.filter("batch_id = 0").count() > 0
    # a second replay changes nothing anywhere
    v_audit = current_snapshot(audit).version
    sink(d, 0)
    assert current_snapshot(audit).version == v_audit
    # the report rows pinned the ORIGINAL eviction counts (commit meta)
    n = {r["artifact"]: r["rows_removed"] for r in rep.collect()}
    assert n["bm25_doclen"] == d.count()


def test_deferred_sink_queues_tombstones_and_applies_on_cadence(
    spark, sf_dir, tmp_path
):
    """The merge-on-read erasure queue: every batch is O(|batch|)
    tombstones (target versions unchanged), MoR serve hides each batch
    as it lands, and the cadence batch triggers the ONE amortized
    physical apply that drains the DV table."""
    from airflow_crypto_btc_spark.operators import takedown as td
    from airflow_crypto_btc_spark.operators.search import build_bm25_index
    from airflow_crypto_btc_spark.sources.snapshot_table import (
        current_snapshot,
        read_snapshot,
    )
    from airflow_crypto_btc_spark.sources.tables import load_table
    from airflow_crypto_btc_spark.streaming import takedown_stream as ts

    docs = load_table(spark, sf_dir, "documents")
    post, dlen = str(tmp_path / "post"), str(tmp_path / "dlen")
    dv = str(tmp_path / "dv")
    build_bm25_index(spark, docs, post, dlen, source_version="v1")
    v_post = current_snapshot(post).version

    sink = ts.deferred_takedown_sink(
        "q", dv, [(post, "doc_id"), (dlen, "doc_id")], apply_every=3
    )
    batches = [
        docs.filter(f"doc_id % 10 = {m}").select("doc_id")
        for m in (3, 5, 7)
    ]
    gone: set = set()
    for i, b in enumerate(batches[:2]):
        sink(b, i)
        gone |= {r["doc_id"] for r in b.collect()}
        # tombstones only: the targets' data files never moved
        assert current_snapshot(post).version == v_post
        served = {
            r["doc_id"]
            for r in td.read_snapshot_mor(spark, dlen, dv, "doc_id")
            .collect()
        }
        assert served.isdisjoint(gone)

    sink(batches[2], 2)  # (2+1) % 3 == 0: the apply fires
    gone |= {r["doc_id"] for r in batches[2].collect()}
    assert current_snapshot(dv).files == []  # queue drained
    physical = {
        r["doc_id"] for r in read_snapshot(spark, dlen).collect()
    }
    assert physical.isdisjoint(gone)
    assert physical == {
        r["doc_id"]
        for r in docs.filter(
            "doc_id % 10 NOT IN (3, 5, 7)"
        ).collect()
    }

    # engine replay of the cadence batch: exact no-op
    vs = (current_snapshot(post).version,
          current_snapshot(dlen).version,
          current_snapshot(dv).version)
    sink(batches[2], 2)
    assert vs == (
        current_snapshot(post).version,
        current_snapshot(dlen).version,
        current_snapshot(dv).version,
    )
