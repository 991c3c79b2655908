"""Streaming per-domain quota gate: arrival-order parity with the batch
operator, permanent drops with audit evidence, replay/re-delivery
idempotence, and bounded state."""

from __future__ import annotations

import pytest

from airflow_crypto_btc_spark.operators.curation import domain_quota
from airflow_crypto_btc_spark.sources.snapshot_table import (
    current_snapshot,
    read_snapshot,
)
from airflow_crypto_btc_spark.streaming.quota_stream import (
    domain_quota_sink,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, lang string, source string"
    )


def _tables(tmp_path):
    return (
        str(tmp_path / "decisions"),
        str(tmp_path / "counts"),
        str(tmp_path / "ids"),
    )


def test_streaming_quota_matches_batch_operator_in_id_order(
    spark, tmp_path
):
    """Fed the corpus in id order, the streamed admitted set must equal
    the batch operator's answer exactly — maintenance preserves the
    (order-dependent) spec."""
    dt, ct, it = _tables(tmp_path)
    rows = [(i, "en", f"s{i % 3}") for i in range(20)]
    corpus = _docs(spark, rows)
    sink = domain_quota_sink(dt, ct, it, query_name="q", cap=4)
    sink(corpus.filter("doc_id < 7"), 0)
    sink(corpus.filter("doc_id >= 7 and doc_id < 15"), 1)
    sink(corpus.filter("doc_id >= 15"), 2)

    admitted = {
        r.doc_id
        for r in read_snapshot(spark, dt).filter("admitted").collect()
    }
    want = {r.doc_id for r in domain_quota(corpus, cap=4).collect()}
    assert admitted == want
    # ... and the FULL audit frame (rank + verdict for every doc)
    # equals the oracle-backed batch twin row-for-row
    from airflow_crypto_btc_spark.operators.curation import (
        quota_decisions,
    )

    streamed = {
        (r.doc_id, r.source, r.admit_rank, r.admitted)
        for r in read_snapshot(spark, dt).collect()
    }
    twin = {
        (r.doc_id, r.source, r.admit_rank, r.admitted)
        for r in quota_decisions(corpus, cap=4).collect()
    }
    assert streamed == twin
    # counts table carries per-domain seen totals (the rank base) and
    # the derived admitted totals
    counts = {
        r.domain_key: (r.n_seen, r.n_admitted)
        for r in read_snapshot(spark, ct).collect()
    }
    assert counts == {"s0": (7, 4), "s1": (7, 4), "s2": (6, 4)}


def test_streaming_quota_drops_are_permanent_and_audited(
    spark, tmp_path
):
    """Over-cap arrivals are recorded with admitted=false and an
    admit_rank > cap; they never resurface, and a later batch from a
    fresh domain is unaffected."""
    dt, ct, it = _tables(tmp_path)
    sink = domain_quota_sink(dt, ct, it, query_name="q", cap=2)
    sink(_docs(spark, [(i, "en", "hot") for i in range(5)]), 0)
    dec = {
        r.doc_id: (r.admit_rank, r.admitted)
        for r in read_snapshot(spark, dt).collect()
    }
    assert dec == {
        0: (1, True), 1: (2, True), 2: (3, False),
        3: (4, False), 4: (5, False),
    }
    # the dropped doc re-arriving is re-delivery, not a second chance
    v = current_snapshot(dt).version
    sink(_docs(spark, [(4, "en", "hot"), (10, "en", "cold")]), 1)
    dec = {
        r.doc_id: r.admitted
        for r in read_snapshot(spark, dt).collect()
    }
    assert dec[4] is False and dec[10] is True
    assert current_snapshot(dt).version > v


def test_streaming_quota_replay_folds_nothing(spark, tmp_path):
    """Replaying a committed batch (crash-recovery) must change no
    table: every commit skips via its txn id, so counts never inflate
    and no decision flips."""
    dt, ct, it = _tables(tmp_path)
    sink = domain_quota_sink(dt, ct, it, query_name="q", cap=3)
    b0 = _docs(spark, [(i, "en", "hot") for i in range(5)])
    sink(b0, 0)
    versions = tuple(current_snapshot(t).version for t in (dt, ct, it))
    counts0 = {
        r.domain_key: r.n_admitted
        for r in read_snapshot(spark, ct).collect()
    }
    sink(b0, 0)  # replay
    assert (
        tuple(current_snapshot(t).version for t in (dt, ct, it))
        == versions
    )
    assert {
        r.domain_key: r.n_admitted
        for r in read_snapshot(spark, ct).collect()
    } == counts0


def test_streaming_quota_state_is_domains_not_corpus(spark, tmp_path):
    """The gate's working state (counts table) holds one row per domain
    regardless of arrival volume — the broadcastable-forever contract."""
    dt, ct, it = _tables(tmp_path)
    sink = domain_quota_sink(dt, ct, it, query_name="q", cap=1)
    sink(
        _docs(spark, [(i, "en", f"s{i % 4}") for i in range(40)]), 0
    )
    sink(
        _docs(
            spark, [(100 + i, "en", f"s{i % 4}") for i in range(40)]
        ),
        1,
    )
    assert read_snapshot(spark, ct).count() == 4


def test_streaming_quota_compaction_bounds_decision_parts(
    spark, tmp_path
):
    """Periodic compaction keeps the decisions table's file count
    bounded under many small batches."""
    dt, ct, it = _tables(tmp_path)
    sink = domain_quota_sink(
        dt, ct, it, query_name="q", cap=100,
        compact_every=4, compact_target_parts=2,
    )
    for b in range(4):
        sink(
            _docs(
                spark,
                [(b * 10 + i, "en", f"s{i % 2}") for i in range(6)],
            ),
            b,
        )
    files = read_snapshot(spark, dt).inputFiles()
    assert len(files) <= 2
    # nothing lost to compaction
    assert read_snapshot(spark, dt).count() == 24


def test_streaming_quota_rejects_negative_cap(spark, tmp_path):
    dt, ct, it = _tables(tmp_path)
    with pytest.raises(ValueError, match="nonnegative"):
        domain_quota_sink(dt, ct, it, query_name="q", cap=-1)


def test_streaming_quota_null_domain_is_one_capped_group(
    spark, tmp_path
):
    """Documents with a NULL domain must be capped as one group across
    batches, not silently dropped or rank-reset per batch (the
    inner-join-on-null failure mode) — and the decisions keep the
    original null value."""
    dt, ct, it = _tables(tmp_path)
    sink = domain_quota_sink(dt, ct, it, query_name="q", cap=2)
    sink(_docs(spark, [(0, "en", None), (1, "en", None)]), 0)
    sink(_docs(spark, [(2, "en", None), (3, "en", "ok")]), 1)
    dec = {
        r.doc_id: (r.source, r.admit_rank, r.admitted)
        for r in read_snapshot(spark, dt).collect()
    }
    assert dec == {
        0: (None, 1, True),
        1: (None, 2, True),
        2: (None, 3, False),  # cap carried ACROSS batches
        3: ("ok", 1, True),
    }
