"""Corpus-curation operator tests: TF-IDF ranking, contamination
detection on planted duplicates, packing invariants + determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_crypto_btc_spark.operators.curation import (
    contamination_pairs,
    pack_sequences,
    tfidf_top_terms,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_tfidf_ranks_rare_terms_over_common(spark):
    """A token present in every doc has idf=ln(4/4)=0 → tfidf 0; each
    doc's distinctive token must rank first."""
    docs = _docs(
        spark,
        [
            (1, "common alpha alpha"),
            (2, "common beta"),
            (3, "common gamma"),
        ],
    )
    top = tfidf_top_terms(docs, k=1).collect()
    assert {r.doc_id: r.token for r in top} == {
        1: "alpha",
        2: "beta",
        3: "gamma",
    }
    assert all(r.tfidf > 0 for r in top)
    # doc 1's 'alpha' appears twice → tf=2 amplifies its score
    assert {r.doc_id: r.tf for r in top}[1] == 2


def test_contamination_finds_planted_eval_dup(spark):
    """A test doc copied verbatim into train must surface with
    containment 1.0; an unrelated train doc must not pair at all."""
    text = "one two three four five six seven eight nine ten"
    train = _docs(
        spark,
        [(100, text), (101, "totally different words with no overlap at all")],
    )
    test = _docs(spark, [(200, text), (201, "another clean eval document here")])
    got = contamination_pairs(train, test).collect()
    assert len(got) == 1
    row = got[0]
    assert (row.test_doc_id, row.train_doc_id) == (200, 100)
    assert row.containment == 1.0


def test_contamination_partial_overlap_containment(spark):
    """Half-contained eval doc: overlap counts shingles of the shared
    prefix only, normalized by the TEST doc's shingle count."""
    shared = "a b c d e f g h"          # 8 tokens → 4 distinct 5-shingles
    train = _docs(spark, [(1, shared + " x1 y1 z1 w1 v1 u1 t1 s1")])
    test = _docs(spark, [(2, shared)])
    got = contamination_pairs(train, test).collect()
    assert len(got) == 1
    assert got[0].overlap == 4
    assert got[0].containment == 1.0  # every test shingle appears in train


def test_pack_sequences_invariants_and_determinism(spark, sf_dir):
    from airflow_crypto_btc_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    packed = pack_sequences(docs, budget=512).toPandas()
    assert (packed.bin_offset < 512).all()
    assert (packed.bin_offset >= 0).all()
    # within a shard, bins are non-decreasing in doc order and contiguous
    for _, g in packed.sort_values("doc_id").groupby("shard"):
        bins = g.bin.tolist()
        assert bins == sorted(bins)
        assert set(range(max(bins) + 1)) == set(bins)
    # shuffling the input cannot change the packing
    repacked = (
        pack_sequences(docs.repartition(13), budget=512)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert repacked.equals(
        packed.sort_values("doc_id").reset_index(drop=True)
    )


def test_contamination_prunes_train_side_with_broadcast(spark, sf_dir):
    """The eval-side shingles must reach the train side as a broadcast —
    the decontamination scale contract (train corpus never shuffles
    full-width)."""
    from airflow_crypto_btc_spark.plans.catalog import ALL_QUERIES

    df = ALL_QUERIES["curate_contamination"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
