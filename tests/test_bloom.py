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
