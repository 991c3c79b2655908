"""Bloom-pruned cross-corpus novelty: exactness vs a plain anti-join,
the no-false-negative guarantee, and real pruning."""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_crypto_btc_spark.operators.bloom import (
    build_digest_bloom,
    novel_documents,
)
from airflow_crypto_btc_spark.sources.tables import load_table


def test_novel_documents_exact_vs_anti_join(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter("doc_id % 10 != 0")
    incoming = docs  # 10% truly new + 90% already-seen content
    got = {
        r["doc_id"]
        for r in novel_documents(corpus, incoming)
        .selectExpr("id AS doc_id")
        .collect()
    }
    norm = "md5(lower(trim(regexp_replace(text, '\\\\s+', ' '))))"
    want = {
        r["doc_id"]
        for r in incoming.withColumn("d", F.expr(norm))
        .join(
            corpus.select(F.expr(norm).alias("d")).distinct(),
            "d",
            "left_anti",
        )
        .select("doc_id")
        .collect()
    }
    assert got == want and got


def test_bloom_no_false_negatives_and_prunes(spark, sf_dir):
    """Every corpus digest must hit the bloom (no false negative —
    correctness depends on it), and on a DISJOINT incoming set most
    rows must be cleared without the join (the perf point)."""
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter("doc_id % 2 = 0")
    fresh = spark.createDataFrame(
        [(10_000 + i, f"entirely novel document {i} {i * 3} xyz")
         for i in range(200)],
        "doc_id long, text string",
    )
    out = novel_documents(corpus, fresh).collect()
    assert len(out) == 200  # all novel
    cleared = sum(1 for r in out if r["is_bloom_certain"])
    # with 10 bits/item the fp rate is ~1%; demand most rows skip the join
    assert cleared >= 190, cleared
    # no false negatives: re-checking the corpus against itself finds
    # nothing novel
    assert novel_documents(corpus, corpus).count() == 0


def test_build_digest_bloom_fixed_size(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    bm_small = build_digest_bloom(docs.limit(10), n_bits=1 << 12)
    bm_all = build_digest_bloom(docs, n_bits=1 << 12)
    assert len(bm_small) == len(bm_all) == (1 << 12) // 8


def test_sharded_bloom_matches_single_bitmap_output(spark, sf_dir, tmp_path):
    """The sharded persisted state must produce EXACTLY the novel set of
    the single-bitmap operator (both are exact by construction — this
    pins the plumbing: shard routing, per-shard probes, missing-shard
    handling), the stored rows must be per-shard-bitmap-sized, and a
    stale source version must be refused."""
    import pytest

    from airflow_crypto_btc_spark.operators.bloom import (
        build_sharded_digest_bloom,
        novel_documents_sharded,
    )
    from airflow_crypto_btc_spark.sources.snapshot_table import (
        current_snapshot,
        read_snapshot,
    )

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter("doc_id % 10 != 0")
    table = str(tmp_path / "bloom")
    build_sharded_digest_bloom(
        spark, corpus, table, shards=8, n_bits_per_shard=1 << 14,
        source_version="docs@v1",
    )
    rows = read_snapshot(spark, table).collect()
    # one fixed-size bitmap row per nonempty shard — per-shard memory is
    # n_bits_per_shard/8 no matter the corpus size
    assert 1 <= len(rows) <= 8
    assert all(len(bytes(r["bm"])) == (1 << 14) // 8 for r in rows)
    assert len({r["shard"] for r in rows}) == len(rows)
    got = {
        (r["id"],)
        for r in novel_documents_sharded(
            spark, table, corpus, docs, expect_source="docs@v1"
        ).collect()
    }
    want = {
        (r["id"],) for r in novel_documents(corpus, docs).collect()
    }
    assert got == want and got
    with pytest.raises(ValueError, match="stale sharded bloom"):
        novel_documents_sharded(
            spark, table, corpus, docs, expect_source="docs@v2"
        )


def test_sharded_bloom_no_false_negatives_and_missing_shards(spark, tmp_path):
    """Replaying the corpus against its own sharded state finds nothing
    novel (no false negatives across shard boundaries), and incoming
    rows routed to shards the corpus never touched come back definitely
    new without testing a single bit."""
    from airflow_crypto_btc_spark.operators.bloom import (
        build_sharded_digest_bloom,
        novel_documents_sharded,
    )

    corpus = spark.createDataFrame(
        [(i, f"historical doc {i} alpha") for i in range(50)],
        "doc_id long, text string",
    )
    table = str(tmp_path / "bloom")
    # many shards vs few docs → some shards are guaranteed empty
    build_sharded_digest_bloom(
        spark, corpus, table, shards=64, n_bits_per_shard=1 << 10
    )
    assert (
        novel_documents_sharded(spark, table, corpus, corpus).count() == 0
    )
    fresh = spark.createDataFrame(
        [(1000 + i, f"brand new doc {i} omega") for i in range(100)],
        "doc_id long, text string",
    )
    out = novel_documents_sharded(spark, table, corpus, fresh).collect()
    assert len(out) == 100
    assert sum(1 for r in out if r["is_bloom_certain"]) >= 95
