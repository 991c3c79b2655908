"""Streaming frozen-map shard assignment: decisions equal the batch
from-map operator, every arrival finds the complete map, replay and
re-delivery fold nothing, and a map rebuild stops the stream."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airflow_crypto_btc_spark.operators.curation import (
    build_shard_map,
    shards_from_map,
)
from airflow_crypto_btc_spark.sources.snapshot_table import (
    current_snapshot,
    read_snapshot,
)
from airflow_crypto_btc_spark.streaming.shard_stream import (
    shard_assignments_sink,
)


def _docs(spark, lo, hi):
    return spark.createDataFrame(
        [(i, "tok " * (1 + i % 23)) for i in range(lo, hi)],
        "doc_id long, text string",
    )


def test_streaming_assignments_match_batch_from_map(spark, tmp_path):
    reference = _docs(spark, 0, 120)
    mt = str(tmp_path / "map")
    at = str(tmp_path / "assignments")
    build_shard_map(
        spark, reference, mt, source_version="v1", shards=4, oversample=4
    )
    sink = shard_assignments_sink(
        mt, at, query_name="shards", expect_source="v1"
    )
    # arrivals the census NEVER saw (ids beyond the reference corpus)
    sink(_docs(spark, 200, 240), 0)
    sink(_docs(spark, 240, 260), 1)

    got = {
        (r["doc_id"], r["n_tokens"], r["micro_shard"], r["shard"])
        for r in read_snapshot(spark, at).collect()
    }
    want = {
        tuple(r)
        for r in shards_from_map(
            spark, _docs(spark, 200, 260), mt, expect_source="v1"
        ).collect()
    }
    assert got == want
    assert len(got) == 60  # complete map: nothing dropped

    # replay + re-delivery fold nothing
    v = current_snapshot(at).version
    sink(_docs(spark, 240, 260), 1)
    assert current_snapshot(at).version == v
    sink(_docs(spark, 200, 210), 2)
    assert len(read_snapshot(spark, at).collect()) == 60


def test_streaming_assignments_frozen_map_refusals(spark, tmp_path):
    reference = _docs(spark, 0, 50)
    mt = str(tmp_path / "map")
    at = str(tmp_path / "assignments")
    build_shard_map(spark, reference, mt, source_version="v1")
    with pytest.raises(ValueError, match="stale shard map"):
        shard_assignments_sink(mt, at, query_name="s", expect_source="v2")
    sink = shard_assignments_sink(
        mt, at, query_name="s", expect_source="v1"
    )
    sink(_docs(spark, 100, 110), 0)
    build_shard_map(spark, reference, mt, source_version="v1")
    with pytest.raises(ValueError, match="changed under a running"):
        sink(_docs(spark, 110, 120), 1)


def test_shard_map_is_complete_and_batch_op_refuses_stale(spark, tmp_path):
    reference = _docs(spark, 0, 10)  # tiny census: most micro-shards empty
    mt = str(tmp_path / "map")
    build_shard_map(
        spark, reference, mt, source_version="v1", shards=4, oversample=8
    )
    mapping = read_snapshot(spark, mt)
    assert mapping.count() == 32  # complete over all micro-shards
    assert {
        r["micro_shard"] for r in mapping.collect()
    } == set(range(32))
    # every shard gets exactly oversample micro-shards
    per = mapping.groupBy("shard").count().collect()
    assert {r["count"] for r in per} == {8}
    with pytest.raises(ValueError, match="stale shard map"):
        shards_from_map(
            spark, reference, mt, expect_source="v2"
        ).collect()


def test_shard_drift_report_zero_on_design_corpus(spark, tmp_path):
    """Drift against the map's own census corpus is exactly zero in
    every shard; a skewed arrival slice shows nonzero integer drift
    that sums to ~0 (shares are a partition of unity)."""
    from airflow_crypto_btc_spark.operators.curation import (
        build_shard_map,
        shard_drift_report,
    )

    reference = _docs(spark, 0, 160)
    mt = str(tmp_path / "map")
    build_shard_map(
        spark, reference, mt, source_version="v1", shards=4, oversample=4
    )
    same = shard_drift_report(
        spark, reference, mt, expect_source="v1"
    ).collect()
    assert {r["drift_micro"] for r in same} == {0}
    skewed = shard_drift_report(
        spark, reference.filter("doc_id % 4 = 1"), mt,
        expect_source="v1",
    ).collect()
    assert any(r["drift_micro"] != 0 for r in skewed)
    assert abs(sum(r["drift_micro"] for r in skewed)) <= len(skewed)
