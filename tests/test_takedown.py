"""Cascading takedown semantics (operators/takedown.py): eviction from
every persisted artifact equals a from-scratch rebuild on (corpus − D),
the split rebase handles cluster SPLITS and min-label raises, crashes
replay to identical state, and the CAS refuses stale anchors."""

from __future__ import annotations

import pytest

from airflow_crypto_btc_spark.operators import takedown as td
from airflow_crypto_btc_spark.operators.curation import leakage_safe_split
from airflow_crypto_btc_spark.operators.dedup import (
    build_minhash_index,
    minhash_lsh_pairs,
    minhash_lsh_pairs_from_index_tables,
    near_dup_clusters,
)
from airflow_crypto_btc_spark.operators.search import (
    bm25_topk,
    bm25_topk_from_index,
    build_bm25_index,
    default_queries,
)
from airflow_crypto_btc_spark.sources.snapshot_table import (
    CommitConflictError,
    append,
    current_snapshot,
    read_snapshot,
)
from airflow_crypto_btc_spark.sources.tables import load_table
from airflow_crypto_btc_spark.streaming import split_stream as ss


def _ids(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "doc_id bigint")


@pytest.mark.smoke
def test_takedown_bm25_equals_rebuild(spark, sf_dir, tmp_path):
    """Post-takedown index serve == inline BM25 on (corpus − D):
    postings/doclen eviction restores exact rebuild semantics because
    df and corpus stats derive from the stored rows at serve time."""
    docs = load_table(spark, sf_dir, "documents")
    post, dlen = str(tmp_path / "post"), str(tmp_path / "dlen")
    build_bm25_index(spark, docs, post, dlen, source_version="v1")

    d = docs.filter("doc_id % 10 = 3").select("doc_id")
    report = td.takedown_bm25(spark, d, post, dlen, txn_id="t1")
    assert dict((r[0], r[1]) for r in report) == {
        "bm25_postings": "evicted", "bm25_doclen": "evicted",
    }
    assert all(r[2] > 0 for r in report)

    remaining = docs.filter("doc_id % 10 != 3")
    queries = default_queries(remaining)
    got = bm25_topk_from_index(spark, post, dlen, queries).collect()
    want = bm25_topk(remaining, queries).collect()
    key = lambda r: (r["query_id"], r["rnk"])  # noqa: E731
    assert sorted(map(tuple, got), key=lambda t: (t[0], t[1])) == sorted(
        map(tuple, want), key=lambda t: (t[0], t[1])
    )

    # idempotent replay: same txn -> no new version, same counts
    v = current_snapshot(post).version
    again = td.takedown_bm25(spark, d, post, dlen, txn_id="t1")
    assert current_snapshot(post).version == v
    assert [r[2] for r in again] == [r[2] for r in report]


def test_takedown_lsh_equals_rebuild(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    sets_t, bands_t = str(tmp_path / "sets"), str(tmp_path / "bands")
    build_minhash_index(spark, docs, sets_t, bands_t,
                        source_version="v1")
    d = docs.filter("doc_id % 10 = 3").select("doc_id")
    report = td.takedown_lsh(spark, d, sets_t, bands_t, txn_id="t1")
    assert all(r[2] > 0 for r in report)

    remaining = docs.filter("doc_id % 10 != 3")
    got = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs_from_index_tables(
            spark, sets_t, bands_t,
            remaining.selectExpr("doc_id AS id"),
            jaccard_threshold=0.5,
        ).collect()
    }
    want = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(
            remaining, num_hashes=12, bands=4, jaccard_threshold=0.5
        ).collect()
    }
    assert got == want


def _split_state(spark, tmp_path, docs, pair_rows):
    """Fold a split state through the streaming sink (one batch)."""
    pairs_tbl = str(tmp_path / "pairs")
    splits_tbl = str(tmp_path / "splits")
    moves_tbl = str(tmp_path / "moves")
    append(
        spark,
        spark.createDataFrame(pair_rows, "id_a bigint, id_b bigint"),
        pairs_tbl,
    )
    ss.leakage_split_sink(
        pairs_tbl, splits_tbl, moves_tbl, query_name="td-seed"
    )(docs, 0)
    return pairs_tbl, splits_tbl, moves_tbl


def test_takedown_split_handles_cluster_split_and_label_raise(
    spark, tmp_path
):
    """Removing a BRIDGE doc splits its cluster; removing the MIN
    member raises the survivors' cluster id.  The rebase must serve
    exactly the batch rebuild on (docs − D, pairs − incident(D)), emit
    moves rows for side flips only, and keep unaffected clusters'
    rows byte-identical."""
    docs = _ids(spark, [1, 2, 3, 30, 31, 50, 51])
    # one chain 1-2-3 (cluster 1; 2 is a bridge), one pair {30,31},
    # singletons 50, 51
    pairs = [(1, 2), (2, 3), (30, 31)]
    pairs_tbl, splits_tbl, moves_tbl = _split_state(
        spark, tmp_path, docs, pairs
    )
    before = {
        r["doc_id"]: (r["cluster_id"], r["split"])
        for r in ss.split_assignments(spark, splits_tbl).collect()
    }
    assert before[1][0] == before[2][0] == before[3][0] == 1

    # D = {2 (bridge of 1-2-3), 30 (min of {30,31})}
    d = _ids(spark, [2, 30])
    report = td.takedown_split(
        spark, d, pairs_tbl, splits_tbl, moves_tbl, txn_id="t1"
    )
    rep = {r[0]: (r[1], r[2]) for r in report}
    assert rep["split_assignments"] == ("rebased", 2)  # 2 and 30 left
    assert rep["dedup_pairs"][1] == 3  # all three edges touched D? no:
    # (1,2),(2,3) touch 2; (30,31) touches 30 -> all 3 evicted

    got = {
        r["doc_id"]: (r["cluster_id"], r["split"], r["moved"])
        for r in ss.split_assignments(spark, splits_tbl).collect()
    }
    remaining = _ids(spark, [1, 3, 31, 50, 51])
    want = {
        r["doc_id"]: (r["cluster_id"], r["split"], r["moved"])
        for r in leakage_safe_split(
            remaining,
            near_dup_clusters(
                remaining,
                spark.createDataFrame([], "id_a bigint, id_b bigint"),
            ),
        ).collect()
    }
    assert got == want
    # cluster split: 1 and 3 are singletons now; label raise: 31 owns
    # its own (larger) cluster id
    assert got[1][0] == 1 and got[3][0] == 3 and got[31][0] == 31
    # moves audit: exactly the docs whose SIDE flipped
    flipped = {
        doc for doc, v in got.items()
        if doc in before and before[doc][1] != v[1]
    }
    moves = read_snapshot(spark, moves_tbl)
    audited = {
        r["doc_id"]
        for r in moves.filter("old_split != new_split").collect()
        if r["as_of_batch"] == 0 and r["old_cluster_id"] is not None
    }
    # seed fold emitted no moves (batch 0 has no priors with splits),
    # so every audited row is the takedown's
    assert audited >= flipped
    # pairs table no longer holds any D-incident edge
    left = read_snapshot(spark, pairs_tbl).collect()
    assert all(r["id_a"] not in (2, 30) and r["id_b"] not in (2, 30)
               for r in left)


def test_takedown_split_crash_replays_identically(
    spark, tmp_path, monkeypatch
):
    """Crash after the splits rebase but before the moves append: the
    replay recomputes from the pre-takedown changelog (pinned at
    committed_version − 1) and lands the identical moves exactly
    once."""
    docs = _ids(spark, [1, 2, 3, 30, 31])
    pairs_tbl, splits_tbl, moves_tbl = _split_state(
        spark, tmp_path, docs, [(1, 2), (2, 3), (30, 31)]
    )
    real_append = td.append

    def crashing_append(spark_, df, table, txn_id=None, **kw):
        if table == moves_tbl and txn_id == "t1:moves":
            raise RuntimeError("simulated crash")
        return real_append(spark_, df, table, txn_id=txn_id, **kw)

    monkeypatch.setattr(td, "append", crashing_append)
    d = _ids(spark, [2])
    with pytest.raises(RuntimeError, match="simulated crash"):
        td.takedown_split(
            spark, d, pairs_tbl, splits_tbl, moves_tbl, txn_id="t1"
        )
    monkeypatch.setattr(td, "append", real_append)

    report = td.takedown_split(
        spark, d, pairs_tbl, splits_tbl, moves_tbl, txn_id="t1"
    )
    assert {r[0] for r in report} == {
        "split_assignments", "split_moves_audit", "dedup_pairs",
    }
    got = {
        r["doc_id"]: (r["cluster_id"], r["split"])
        for r in ss.split_assignments(spark, splits_tbl).collect()
    }
    remaining = _ids(spark, [1, 3, 30, 31])
    want = {
        r["doc_id"]: (r["cluster_id"], r["split"])
        for r in leakage_safe_split(
            remaining,
            near_dup_clusters(
                remaining,
                spark.createDataFrame(
                    [(30, 31)], "id_a bigint, id_b bigint"
                ),
            ),
        ).collect()
    }
    assert got == want
    # replaying the whole cascade once more changes nothing
    v_s = current_snapshot(splits_tbl).version
    v_m = current_snapshot(moves_tbl).version
    td.takedown_split(
        spark, d, pairs_tbl, splits_tbl, moves_tbl, txn_id="t1"
    )
    assert current_snapshot(splits_tbl).version == v_s
    assert current_snapshot(moves_tbl).version == v_m
    ids = [r["doc_id"] for r in read_snapshot(spark, moves_tbl).collect()]
    assert len(ids) == len(set(ids))


def test_evict_rows_cas_refuses_stale_anchor(spark, tmp_path, monkeypatch):
    """A writer landing between evict's read and its commit must
    surface as CommitConflictError, never a silent lost update."""
    table = str(tmp_path / "t")
    append(spark, _ids(spark, [1, 2, 3]), table)

    import airflow_crypto_btc_spark.operators.takedown as tdm
    real_write = tdm._write_parts

    def racing_write(df, tbl):
        out = real_write(df, tbl)
        # a racing writer commits AFTER evict pinned its snapshot
        append(spark, _ids(spark, [99]), tbl)
        return out

    monkeypatch.setattr(tdm, "_write_parts", racing_write)
    with pytest.raises(CommitConflictError):
        td.evict_rows(spark, table, _ids(spark, [2]), "doc_id", "t1")
    monkeypatch.setattr(tdm, "_write_parts", real_write)
    # retry from a fresh read succeeds and keeps the racer's row
    out = td.evict_rows(spark, table, _ids(spark, [2]), "doc_id", "t2")
    assert out["rows_removed"] == 1
    assert {r["doc_id"] for r in read_snapshot(spark, table).collect()} \
        == {1, 3, 99}


def test_cascade_report_includes_sketch_policy_rows(spark, tmp_path):
    """CMS/HLL/bloom/KMV are non-decrementable: the cascade's report
    says so explicitly instead of pretending to evict."""
    report = td.cascade_takedown(
        spark, _ids(spark, [1]), txn_id="t1"
    ).collect()
    got = {(r["artifact"], r["action"]) for r in report}
    assert got == {
        ("cms_sketch", "rebuild_required"),
        ("hll_registers", "rebuild_required"),
        ("bloom_bitmap", "rebuild_required"),
        ("kmv_minima", "rebuild_required"),
    }


def test_stream_folds_continue_after_takedown_rebase(spark, tmp_path):
    """The maintainer keeps working on top of a rebased changelog: a
    post-takedown fold that merges two surviving clusters must serve
    the merged state (the rebase resets as_of_batch to 0, and the
    latest-wins view orders by cluster_id, so post-rebase appends win
    exactly when they lower the label)."""
    docs = _ids(spark, [1, 2, 3, 30, 31])
    pairs_tbl, splits_tbl, moves_tbl = _split_state(
        spark, tmp_path, docs, [(1, 2), (2, 3), (30, 31)]
    )
    td.takedown_split(
        spark, _ids(spark, [2]), pairs_tbl, splits_tbl, moves_tbl,
        txn_id="t1",
    )
    # post-takedown: {1}, {3}, {30,31}; now a NEW edge 3-30 arrives and
    # a new doc 60 lands, folded by the (restarted) stream at batch 0
    append(
        spark,
        spark.createDataFrame([(3, 30)], "id_a bigint, id_b bigint"),
        pairs_tbl,
    )
    ss.leakage_split_sink(
        pairs_tbl, splits_tbl, moves_tbl, query_name="td-resume"
    )(spark.createDataFrame([(60,)], "doc_id bigint"), 0)

    remaining = _ids(spark, [1, 3, 30, 31, 60])
    want = {
        r["doc_id"]: (r["cluster_id"], r["split"])
        for r in leakage_safe_split(
            remaining,
            near_dup_clusters(
                remaining,
                spark.createDataFrame(
                    [(30, 31), (3, 30)], "id_a bigint, id_b bigint"
                ),
            ),
        ).collect()
    }
    got = {
        r["doc_id"]: (r["cluster_id"], r["split"])
        for r in ss.split_assignments(spark, splits_tbl).collect()
    }
    assert got == want
    assert got[30][0] == 3 and got[31][0] == 3  # merged under min=3


def test_takedown_racing_live_maintainer_serializes(
    spark, tmp_path, monkeypatch
):
    """A stream fold committing between the takedown's read and its
    rebase commit must surface as a CAS conflict (the takedown's
    recompute is stale), never a silent lost fold."""
    from airflow_crypto_btc_spark.sources.snapshot_table import (
        CommitConflictError,
    )

    docs = _ids(spark, [1, 2, 3, 30, 31])
    pairs_tbl, splits_tbl, moves_tbl = _split_state(
        spark, tmp_path, docs, [(1, 2), (2, 3), (30, 31)]
    )
    sink = ss.leakage_split_sink(
        pairs_tbl, splits_tbl, moves_tbl, query_name="racer"
    )

    import airflow_crypto_btc_spark.operators.takedown as tdm
    real_write = tdm._write_parts
    fired = {"n": 0}

    def racing_write(df, tbl):
        out = real_write(df, tbl)
        if tbl == splits_tbl and fired["n"] == 0:
            fired["n"] = 1
            # the maintainer folds a new doc AFTER the takedown pinned
            # its snapshot but BEFORE its rebase commit
            sink(spark.createDataFrame([(70,)], "doc_id bigint"), 0)
        return out

    monkeypatch.setattr(tdm, "_write_parts", racing_write)
    with pytest.raises(CommitConflictError):
        td.takedown_split(
            spark, _ids(spark, [2]), pairs_tbl, splits_tbl, moves_tbl,
            txn_id="t1",
        )
    monkeypatch.setattr(tdm, "_write_parts", real_write)
    # retry FROM THE READ succeeds and keeps the racer's doc 70
    td.takedown_split(
        spark, _ids(spark, [2]), pairs_tbl, splits_tbl, moves_tbl,
        txn_id="t2",
    )
    got = {
        r["doc_id"]
        for r in ss.split_assignments(spark, splits_tbl).collect()
    }
    assert got == {1, 3, 30, 31, 70}


def test_takedown_gram_index_decrement_equals_rebuild(spark, tmp_path):
    """The gram index is DECREMENTABLE (df = distinct docs per gram,
    per-doc contributions independent): subtracting D's per-doc-deduped
    gram counts and deleting zero rows equals a rebuild on corpus − D.
    Planted cases: a gram only in D vanishes; a shared gram
    decrements."""
    from airflow_crypto_btc_spark.operators.text import build_gram_index

    shared = "one two three four five six seven eight"  # k=8 gram
    only_d = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, f"{shared} filler"),
        (2, f"{shared} other"),
        (3, f"{shared} AND {only_d}"),   # D member: shares + owns
        (4, "completely unrelated words live here today now"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    gram_t = str(tmp_path / "grams")
    build_gram_index(spark, docs, gram_t, source_version="v1")

    d_docs = docs.filter("doc_id = 3")
    report = td.takedown_gram_index(spark, d_docs, gram_t, txn_id="t1")
    rep = {r[0]: r[2] for r in report}
    assert rep["gram_index"] > 0 and rep["gram_index_rows"] > 0

    got = {
        (r["h"], r["df"])
        for r in read_snapshot(spark, gram_t).collect()
    }
    want_t = str(tmp_path / "grams_rebuild")
    build_gram_index(
        spark, docs.filter("doc_id != 3"), want_t, source_version="v1"
    )
    want = {
        (r["h"], r["df"])
        for r in read_snapshot(spark, want_t).collect()
    }
    assert got == want
    # replay: identical report, no new version
    v = current_snapshot(gram_t).version
    again = td.takedown_gram_index(spark, d_docs, gram_t, txn_id="t1")
    assert current_snapshot(gram_t).version == v
    assert {r[0]: r[2] for r in again} == rep


def test_takedown_pq_codes_under_frozen_codebooks(spark, sf_dir, tmp_path):
    """PQ codes eviction: the codebooks stay (frozen model), D's code
    rows leave, and the served top-k never returns a deleted vector as
    query or neighbor."""
    from airflow_crypto_btc_spark.operators.similarity import (
        pq_save_index,
        pq_topk_from_index,
    )
    from airflow_crypto_btc_spark.sources.tables import parquet_row_count
    import os

    emb = load_table(spark, sf_dir, "embeddings")
    root = str(tmp_path / "pq")
    pq_save_index(
        spark, emb, root, source_version="v1", m=8,
        corpus_rows=parquet_row_count(
            os.path.join(sf_dir, "embeddings.parquet")
        ),
    )
    d = emb.filter("vec_id % 10 = 3").select("vec_id")
    n_d = d.count()
    codes_t = os.path.join(root, "codes")
    before = read_snapshot(spark, codes_t).count()
    report = td.takedown_pq_codes(spark, d, codes_t, txn_id="t1")
    assert report[0][2] == n_d
    assert read_snapshot(spark, codes_t).count() == before - n_d

    out = pq_topk_from_index(
        spark, root, emb.filter("vec_id % 10 != 3"),
        query_filter="vec_id < 20", expect_source="v1",
    ).collect()
    assert out, "serve returned nothing"
    assert all(r["nid"] % 10 != 3 and r["qid"] % 10 != 3 for r in out)


def test_takedown_plus_vacuum_erases_bytes(spark, sf_dir, tmp_path):
    """The erasure guarantee: takedown + vacuum(keep_versions=1) leaves
    NO data file on disk containing the deleted documents — time travel
    to the pre-takedown state dies with the vacuum, exactly the
    Delta/Iceberg DELETE+VACUUM compliance story."""
    import glob
    import os

    from airflow_crypto_btc_spark.sources.snapshot_table import vacuum

    docs = load_table(spark, sf_dir, "documents")
    post, dlen = str(tmp_path / "post"), str(tmp_path / "dlen")
    build_bm25_index(spark, docs, post, dlen, source_version="v1")
    d = docs.filter("doc_id % 10 = 3").select("doc_id")
    d_ids = {r["doc_id"] for r in d.collect()}
    td.takedown_bm25(spark, d, post, dlen, txn_id="t1")

    # pre-vacuum: time travel still serves the deleted docs (by design)
    from airflow_crypto_btc_spark.sources.snapshot_table import (
        read_snapshot as rs,
    )
    old = rs(spark, post, version=0)
    assert old.filter(old.doc_id.isin(list(d_ids))).count() > 0

    for table in (post, dlen):
        vacuum(table, keep_versions=1)
        # every parquet file still on disk is free of D
        part_dirs = glob.glob(os.path.join(table, "data", "part-*"))
        assert part_dirs, "vacuum deleted the live data"
        remaining = spark.read.parquet(*part_dirs)
        assert (
            remaining.filter(
                remaining.doc_id.isin(list(d_ids))
            ).count()
            == 0
        ), f"deleted doc bytes survive in {table}"


def test_takedown_semantic_relabels_and_resurrects(spark, tmp_path):
    """Taking down a doc that others reference as dup_of must relabel
    exactly those docs: the next-smallest qualifying mate takes over,
    or the doc is RESURRECTED (keep flips true) — and the final table
    equals the purge rebuilt on corpus − D under the frozen quantizer."""
    from airflow_crypto_btc_spark.operators.similarity import (
        build_semantic_index,
        semantic_purge,
    )
    from airflow_crypto_btc_spark.sources.snapshot_table import append

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),      # centroid + min of the chain
        (1, [1.0, 0.01, 0.0, 0.0]),     # dup_of 0
        (2, [1.0, 0.02, 0.0, 0.0]),     # dup_of 0
        (3, [1.0, 0.03, 0.0, 0.0]),     # dup_of 0
        (10, [0.0, 1.0, 0.0, 0.0]),     # unrelated, keeps
    ]
    emb = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    )
    cent_t = str(tmp_path / "cent")
    memb_t = str(tmp_path / "memb")
    labels_t = str(tmp_path / "labels")
    build_semantic_index(
        spark, emb, cent_t, memb_t, source_version="v1",
        centroid_filter="vec_id = 0",
    )
    append(
        spark,
        semantic_purge(
            emb, centroid_filter="vec_id = 0", cosine_threshold=0.99
        ),
        labels_t,
    )
    before = {
        r["vec_id"]: (r["dup_of"], r["keep"])
        for r in read_snapshot(spark, labels_t).collect()
    }
    assert before[1] == (0, False) and before[2] == (0, False)
    assert before[10] == (None, True)

    d = _ids(spark, [0, 1]).selectExpr("doc_id AS vec_id")
    report = td.takedown_semantic(
        spark, d, labels_t, memb_t, txn_id="t1", cosine_threshold=0.99
    )
    rep = {r[0]: r[2] for r in report}
    assert rep["semantic_members"] == 2
    assert rep["semantic_labels"] == 2
    assert rep["semantic_resurrected"] == 1  # doc 2 has no smaller mate

    got = {
        r["vec_id"]: (r["dup_of"], r["keep"])
        for r in read_snapshot(spark, labels_t).collect()
    }
    assert set(got) == {2, 3, 10}
    assert got[2] == (None, True)     # resurrected
    assert got[3] == (2, False)       # relabeled to the next-smallest
    assert got[10] == (None, True)    # untouched carry-over

    # equals the rebuild under the FROZEN centroid frame
    cent = read_snapshot(spark, cent_t).selectExpr(
        "cid", "ce"
    )
    want = {
        r["vec_id"]: (r["dup_of"], r["keep"])
        for r in semantic_purge(
            emb.filter("vec_id NOT IN (0, 1)"),
            centroids=cent,
            cosine_threshold=0.99,
        ).collect()
    }
    assert got == want

    # replay: identical report, no new version
    v = current_snapshot(labels_t).version
    again = td.takedown_semantic(
        spark, d, labels_t, memb_t, txn_id="t1", cosine_threshold=0.99
    )
    assert current_snapshot(labels_t).version == v
    assert {r[0]: r[2] for r in again} == rep


def test_empty_takedown_set_rewrites_nothing(spark, sf_dir, tmp_path):
    """Post-chain self-review guard: an EMPTY deletion set (an idle
    erasure-queue tick) must not pay a copy-on-write rewrite of every
    artifact — the cascade short-circuits to the policy rows and no
    table gains a version."""
    docs = load_table(spark, sf_dir, "documents")
    post, dlen = str(tmp_path / "post"), str(tmp_path / "dlen")
    build_bm25_index(spark, docs, post, dlen, source_version="v1")
    v_post = current_snapshot(post).version
    v_dlen = current_snapshot(dlen).version

    empty = spark.createDataFrame([], "doc_id bigint")
    report = td.cascade_takedown(
        spark, empty, txn_id="t-empty", bm25=(post, dlen)
    ).collect()
    assert {r["artifact"] for r in report} == set(td.NON_DECREMENTABLE)
    assert current_snapshot(post).version == v_post
    assert current_snapshot(dlen).version == v_dlen

    # the streaming sink's idle tick is equally silent (no audit rows)
    from airflow_crypto_btc_spark.sources.snapshot_table import (
        read_snapshot_or_none,
    )
    from airflow_crypto_btc_spark.streaming import takedown_stream as ts

    audit = str(tmp_path / "audit")
    ts.takedown_sink(
        query_name="idle", bm25=(post, dlen), report_table=audit
    )(empty, 0)
    assert current_snapshot(post).version == v_post
    assert read_snapshot_or_none(spark, audit) is None


def test_takedown_split_replay_pins_pairs_version(
    spark, tmp_path, monkeypatch
):
    """ADVICE r12: a pairs append landing between a crash (after the
    splits rebase, before the moves append) and the replay must not
    change the replayed moves audit — the replay reads pairs at the
    version pinned in the rebase commit meta.  Control run (no
    interleaved append) and raced run must land identical moves rows;
    unpinned, the raced replay would re-cluster the two survivors over
    the NEW edge and audit an extra side flip (doc 9) the committed
    rebase never produced."""

    def run(subdir: str, interleave: bool):
        base = tmp_path / subdir
        base.mkdir()
        # chain 9-2-3: cluster id = min = 2 (bucket 5 -> 'test' side)
        docs = _ids(spark, [2, 3, 9])
        pairs_tbl, splits_tbl, moves_tbl = _split_state(
            spark, base, docs, [(2, 3), (2, 9)]
        )
        real_append = td.append

        def crashing_append(spark_, df, table, txn_id=None, **kw):
            if table == moves_tbl and txn_id == "t1:moves":
                raise RuntimeError("simulated crash")
            return real_append(spark_, df, table, txn_id=txn_id, **kw)

        monkeypatch.setattr(td, "append", crashing_append)
        d = _ids(spark, [2])
        with pytest.raises(RuntimeError, match="simulated crash"):
            td.takedown_split(
                spark, d, pairs_tbl, splits_tbl, moves_tbl, txn_id="t1"
            )
        monkeypatch.setattr(td, "append", real_append)
        if interleave:
            # racing maintainer joins the two survivors of the split
            # cluster — invisible to a correctly pinned replay
            append(
                spark,
                spark.createDataFrame(
                    [(3, 9)], "id_a bigint, id_b bigint"
                ),
                pairs_tbl,
            )
        report = td.takedown_split(
            spark, d, pairs_tbl, splits_tbl, moves_tbl, txn_id="t1"
        )
        moves = sorted(
            tuple(r)
            for r in read_snapshot(spark, moves_tbl)
            .select(
                "doc_id", "old_cluster_id", "cluster_id",
                "old_split", "new_split",
            )
            .collect()
        )
        return sorted(tuple(r) for r in report), moves

    control_rep, control_moves = run("control", interleave=False)
    raced_rep, raced_moves = run("raced", interleave=True)
    # doc 3 flips test->train when it loses bridge 2; doc 9 must NOT
    # flip (it only would under the post-crash edge)
    assert [m[0] for m in control_moves] == [3]
    assert raced_moves == control_moves
    assert raced_rep == control_rep


def test_takedown_semantic_relabel_pins_member_eviction_version(
    spark, tmp_path
):
    """ADVICE r12: a members append landing between the member
    eviction and the (crash-replayed) label rewrite must not change
    which member state the relabel reads — the read pins to the
    version the eviction commit produced, so the relabel anchors on
    exactly the rows the eviction txn saw."""
    from airflow_crypto_btc_spark.operators.similarity import (
        build_semantic_index,
        semantic_purge,
    )

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 0.01, 0.0, 0.0]),
        (2, [1.0, 0.02, 0.0, 0.0]),
        (3, [1.0, 0.03, 0.0, 0.0]),
        (10, [0.0, 1.0, 0.0, 0.0]),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    )
    cent_t = str(tmp_path / "cent")
    memb_t = str(tmp_path / "memb")
    labels_t = str(tmp_path / "labels")
    build_semantic_index(
        spark, emb, cent_t, memb_t, source_version="v1",
        centroid_filter="vec_id = 0",
    )
    append(
        spark,
        semantic_purge(
            emb, centroid_filter="vec_id = 0", cosine_threshold=0.99
        ),
        labels_t,
    )
    d = _ids(spark, [0, 1]).selectExpr("doc_id AS vec_id")
    # crash window: member eviction landed, labels rewrite did not
    td.evict_rows(spark, memb_t, d, "id", "t1:sem_members")
    # racing ingest re-lands id 1 (same cluster, qualifying cosine) —
    # an unpinned relabel would resurrect nothing and label 2 and 3
    # as dup_of 1, contradicting the eviction txn's anchor
    vn = (1.0 + 0.015**2) ** 0.5
    append(
        spark,
        spark.createDataFrame(
            [(1, [1.0, 0.015, 0.0, 0.0], vn, 0)],
            "id bigint, e array<double>, vn double, cid bigint",
        ),
        memb_t,
    )
    report = td.takedown_semantic(
        spark, d, labels_t, memb_t, txn_id="t1", cosine_threshold=0.99
    )
    rep = {r[0]: r[2] for r in report}
    assert rep["semantic_resurrected"] == 1
    got = {
        r["vec_id"]: (r["dup_of"], r["keep"])
        for r in read_snapshot(spark, labels_t).collect()
    }
    assert got[2] == (None, True)   # resurrected, racer invisible
    assert got[3] == (2, False)     # next-smallest SURVIVING mate
    assert got[10] == (None, True)


def test_takedown_sink_audits_gram_skip_when_text_missing(
    spark, sf_dir, tmp_path
):
    """ADVICE r12: gram_table configured but the deletion batch ships
    no text column — the decrement is impossible, and the audit must
    SAY so (an explicit skipped_no_text row) instead of letting the
    gram index silently retain the deleted docs' counts."""
    from airflow_crypto_btc_spark.streaming import takedown_stream as ts

    docs = load_table(spark, sf_dir, "documents")
    post, dlen = str(tmp_path / "post"), str(tmp_path / "dlen")
    build_bm25_index(spark, docs, post, dlen, source_version="v1")
    gram_t = str(tmp_path / "gram")
    audit_t = str(tmp_path / "audit")

    batch = docs.select("doc_id").limit(3)  # no text column
    ts.takedown_sink(
        query_name="q",
        bm25=(post, dlen),
        gram_table=gram_t,
        report_table=audit_t,
    )(batch, 0)
    audit = {
        (r["artifact"], r["action"]): r["rows_removed"]
        for r in read_snapshot(spark, audit_t).collect()
    }
    assert audit[("gram_index", "skipped_no_text")] == 0
    assert ("bm25_postings", "evicted") in audit


def test_evict_rows_rewrites_only_stat_overlapping_files(
    spark, tmp_path
):
    """Round 13: the copy-on-write eviction narrows to the files whose
    logged [min,max] id stats overlap D — an id-clustered table keeps
    its untouched parts BY REFERENCE (same part names in the new
    snapshot), a D outside every range commits metadata only, and the
    final content still equals the full anti-join."""
    table = str(tmp_path / "narrow")
    # three id-clustered parts: [0,100) [100,200) [200,300)
    for lo in (0, 100, 200):
        append(
            spark,
            spark.range(lo, lo + 100).selectExpr(
                "id AS doc_id", "id * 2 AS val"
            ),
            table,
            txn_id=f"seed-{lo}",
        )
    before = current_snapshot(table)
    assert len(before.files) == 3

    # D inside the middle part only
    r = td.evict_rows(
        spark, table, _ids(spark, [110, 150, 199]), "doc_id", "t-mid"
    )
    assert r == {"rows_removed": 3, "replayed": False}
    after = current_snapshot(table)
    carried = set(before.files) & set(after.files)
    assert len(carried) == 2, "untouched parts must carry by reference"
    assert len(after.files) == 3  # 2 carried + 1 rewritten
    got = {
        r["doc_id"] for r in read_snapshot(spark, table).collect()
    }
    assert got == set(range(300)) - {110, 150, 199}

    # D provably outside every file range: metadata-only commit
    v = current_snapshot(table).version
    r2 = td.evict_rows(
        spark, table, _ids(spark, [9999]), "doc_id", "t-miss"
    )
    assert r2 == {"rows_removed": 0, "replayed": False}
    miss = current_snapshot(table)
    assert miss.version == v + 1          # txn recorded for replay
    assert set(miss.files) == set(after.files)  # zero bytes moved
    from airflow_crypto_btc_spark.sources.snapshot_table import txn_meta
    assert int(txn_meta(table, "t-miss")["rows_removed"]) == 0

    # evicting EVERY row of a part commits no empty part for it
    r3 = td.evict_rows(
        spark,
        table,
        spark.range(200, 300).selectExpr("id AS doc_id"),
        "doc_id",
        "t-tail",
    )
    assert r3["rows_removed"] == 100
    tail = current_snapshot(table)
    assert len(tail.files) == 2  # the [200,300) part simply vanished
    assert {
        r["doc_id"] for r in read_snapshot(spark, table).collect()
    } == set(range(200)) - {110, 150, 199}


def test_evict_rows_keeps_schema_tombstone_when_table_empties(
    spark, tmp_path
):
    """Evicting EVERY row must leave one zero-row part (the store keeps
    schema in part footers), so the emptied table stays readable."""
    table = str(tmp_path / "empty_out")
    append(
        spark,
        spark.range(5).selectExpr("id AS doc_id", "id AS val"),
        table,
    )
    r = td.evict_rows(
        spark, table, spark.range(5).selectExpr("id AS doc_id"),
        "doc_id", "t-all",
    )
    assert r["rows_removed"] == 5
    snap = current_snapshot(table)
    assert len(snap.files) == 1  # the schema tombstone
    back = read_snapshot(spark, table)
    assert back.count() == 0
    assert set(back.columns) == {"doc_id", "val"}


def test_deferred_takedown_mor_serve_and_apply(
    spark, sf_dir, tmp_path, monkeypatch
):
    """Merge-on-read takedown lifecycle: defer writes O(|D|) tombstones
    (zero data-file moves), the MoR serve equals the eager eviction,
    apply_deletion_vectors physically evicts and truncates exactly the
    applied DV files (tombstones landing in the crash window survive to
    the next apply), and replays change nothing."""
    docs = load_table(spark, sf_dir, "documents")
    post, dlen = str(tmp_path / "post"), str(tmp_path / "dlen")
    dv = str(tmp_path / "dv")
    build_bm25_index(spark, docs, post, dlen, source_version="v1")
    v_post = current_snapshot(post).version
    v_dlen = current_snapshot(dlen).version

    d1 = docs.filter("doc_id % 10 = 3").select("doc_id")
    r = td.takedown_deferred(spark, d1, dv, "doc_id", "t1")
    assert r["replayed"] is False and r["tombstones"] == d1.count()
    # zero rewrite at takedown time
    assert current_snapshot(post).version == v_post
    assert current_snapshot(dlen).version == v_dlen
    # replay: exact no-op
    again = td.takedown_deferred(spark, d1, dv, "doc_id", "t1")
    assert again["replayed"] is True
    assert current_snapshot(dv).version == 0

    # the MoR serve equals filtering the survivors
    want = {
        r["doc_id"]
        for r in read_snapshot(spark, dlen)
        .filter("doc_id % 10 != 3")
        .collect()
    }
    got = {
        r["doc_id"]
        for r in td.read_snapshot_mor(spark, dlen, dv, "doc_id")
        .collect()
    }
    assert got == want

    # crash between the apply's eviction and its DV truncate, with a
    # NEW tombstone batch landing in the window
    real_commit = td.commit

    def crashing_commit(table, **kw):
        if kw.get("operation") == "dv_truncate":
            raise RuntimeError("simulated crash")
        return real_commit(table, **kw)

    monkeypatch.setattr(td, "commit", crashing_commit)
    with pytest.raises(RuntimeError, match="simulated crash"):
        td.apply_deletion_vectors(
            spark, dv, [(post, "doc_id"), (dlen, "doc_id")], "opt1"
        )
    monkeypatch.setattr(td, "commit", real_commit)
    d2 = docs.filter("doc_id % 10 = 7").select("doc_id")
    td.takedown_deferred(spark, d2, dv, "doc_id", "t2")

    out = td.apply_deletion_vectors(
        spark, dv, [(post, "doc_id"), (dlen, "doc_id")], "opt1"
    )
    assert out["applied"] == 2
    # the data now physically excludes d1 ONLY (d2 landed after the
    # pinned DV version and must survive the truncate as tombstones)
    assert {
        r["doc_id"] for r in read_snapshot(spark, dlen).collect()
    } == want
    dv_left = {
        r["doc_id"] for r in read_snapshot(spark, dv).collect()
    }
    assert dv_left == {r["doc_id"] for r in d2.collect()}
    # MoR still hides d2 until the next apply
    assert {
        r["doc_id"]
        for r in td.read_snapshot_mor(spark, dlen, dv, "doc_id")
        .collect()
    } == want - dv_left

    # replaying the whole apply changes nothing
    vs = (current_snapshot(post).version, current_snapshot(dlen).version,
          current_snapshot(dv).version)
    rep = td.apply_deletion_vectors(
        spark, dv, [(post, "doc_id"), (dlen, "doc_id")], "opt1"
    )
    assert rep["replayed"] is True
    assert rep["rows_removed"] == out["rows_removed"]
    assert vs == (
        current_snapshot(post).version,
        current_snapshot(dlen).version,
        current_snapshot(dv).version,
    )

    # the second apply drains d2 and empties the DV table
    td.apply_deletion_vectors(
        spark, dv, [(post, "doc_id"), (dlen, "doc_id")], "opt2"
    )
    assert current_snapshot(dv).files == []
    assert {
        r["doc_id"] for r in read_snapshot(spark, dlen).collect()
    } == want - dv_left
    # an emptied DV table serves the plain snapshot again
    assert td.read_snapshot_mor(
        spark, dlen, dv, "doc_id"
    ).count() == len(want - dv_left)


def test_dv_apply_replay_pins_version_regardless_of_target_order(
    spark, sf_dir, tmp_path, monkeypatch
):
    """Round-13 post-chain self-review: a crash after applying the
    FIRST target, a new tombstone batch landing in the window, then a
    replay with the targets list REVERSED — the replay must evict the
    not-yet-applied target against the pinned DV version (the set the
    landed target used) and truncate only those files, leaving the
    new tombstones queued for the next apply."""
    docs = load_table(spark, sf_dir, "documents")
    post, dlen = str(tmp_path / "post"), str(tmp_path / "dlen")
    dv = str(tmp_path / "dv")
    build_bm25_index(spark, docs, post, dlen, source_version="v1")
    d1 = docs.filter("doc_id % 10 = 3").select("doc_id")
    td.takedown_deferred(spark, d1, dv, "doc_id", "t1")

    real_evict = td.evict_rows
    calls = {"n": 0}

    def crashing_evict(spark_, table, ids, id_col, a_txn, **kw):
        r = real_evict(spark_, table, ids, id_col, a_txn, **kw)
        calls["n"] += 1
        if calls["n"] == 1:  # crash after the first target lands
            raise RuntimeError("simulated crash")
        return r

    monkeypatch.setattr(td, "evict_rows", crashing_evict)
    with pytest.raises(RuntimeError, match="simulated crash"):
        td.apply_deletion_vectors(
            spark, dv, [(post, "doc_id"), (dlen, "doc_id")], "opt1"
        )
    monkeypatch.setattr(td, "evict_rows", real_evict)

    # new tombstones land in the crash window
    d2 = docs.filter("doc_id % 10 = 7").select("doc_id")
    td.takedown_deferred(spark, d2, dv, "doc_id", "t2")

    # replay with the targets REVERSED: dlen (not yet applied) first
    out = td.apply_deletion_vectors(
        spark, dv, [(dlen, "doc_id"), (post, "doc_id")], "opt1"
    )
    assert out["applied"] == 2
    # both targets evicted exactly d1 — never d2
    for t in (post, dlen):
        left = {r["doc_id"] for r in read_snapshot(spark, t)
                .select("doc_id").distinct().collect()}
        assert left.isdisjoint(
            {r["doc_id"] for r in d1.collect()}
        )
        assert {r["doc_id"] for r in d2.collect()} <= left
    # d2's tombstones survived the truncate, queued for the next apply
    dv_left = {r["doc_id"] for r in read_snapshot(spark, dv).collect()}
    assert dv_left == {r["doc_id"] for r in d2.collect()}


from hypothesis import HealthCheck, given, settings as hyp_settings
from hypothesis import strategies as st

_dv_ops = st.lists(
    st.one_of(
        st.tuples(st.just("append"), st.integers(1, 8)),
        st.tuples(
            st.just("defer"),
            st.sets(st.integers(0, 59), max_size=12),
        ),
        st.tuples(st.just("apply"), st.just(0)),
    ),
    min_size=1,
    max_size=7,
)


@given(ops=_dv_ops)
@hyp_settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_dv_lifecycle_matches_set_model(spark, tmp_path_factory, ops):
    """Model-based property: ANY interleaving of appends, deferred
    takedowns, and applies leaves (physical, merge-on-read, queue)
    exactly where naive set semantics puts them — physical = appended −
    applied tombstones, MoR = physical − queued tombstones, queue =
    tombstones deferred since the last apply.  Tombstones for ids that
    were never appended (or already evicted) are harmless no-ops."""
    base = tmp_path_factory.mktemp("dvprop")
    tbl, dv = str(base / "t"), str(base / "dv")
    physical = set(range(10))
    queue: list[set] = []
    append(
        spark,
        spark.createDataFrame(
            [(i, i) for i in sorted(physical)], "doc_id bigint, val bigint"
        ),
        tbl,
    )
    next_id = 100
    for i, (kind, arg) in enumerate(ops):
        if kind == "append":
            ids = set(range(next_id, next_id + arg))
            next_id += arg
            append(
                spark,
                spark.createDataFrame(
                    [(d, d) for d in sorted(ids)],
                    "doc_id bigint, val bigint",
                ),
                tbl,
                txn_id=f"a{i}",
            )
            physical |= ids
        elif kind == "defer":
            td.takedown_deferred(
                spark,
                spark.createDataFrame(
                    [(d,) for d in sorted(arg)] or [(None,)],
                    "doc_id bigint",
                ).filter("doc_id IS NOT NULL"),
                dv,
                "doc_id",
                txn_id=f"d{i}",
            )
            queue.append(set(arg))
        else:  # apply
            td.apply_deletion_vectors(
                spark, dv, [(tbl, "doc_id")], txn_id=f"o{i}"
            )
            physical -= set().union(*queue) if queue else set()
            queue = []
    got_phys = {
        r["doc_id"] for r in read_snapshot(spark, tbl).collect()
    }
    assert got_phys == physical
    queued = set().union(*queue) if queue else set()
    got_mor = {
        r["doc_id"]
        for r in td.read_snapshot_mor(spark, tbl, dv, "doc_id").collect()
    }
    assert got_mor == physical - queued


def test_deferred_takedown_reaches_byte_erasure_after_apply_and_vacuum(
    spark, sf_dir, tmp_path
):
    """The deferred path's erasure end-state: tombstones alone leave
    D's bytes on disk BY DESIGN (and even record D's ids in the DV
    table), but apply + vacuum on the targets AND the DV table leaves
    no parquet file containing a deleted doc's rows or its tombstone —
    deferred converges to the eager path's compliance story, one
    OPTIMIZE later."""
    import glob
    import os

    from airflow_crypto_btc_spark.sources.snapshot_table import vacuum

    docs = load_table(spark, sf_dir, "documents")
    post, dlen = str(tmp_path / "post"), str(tmp_path / "dlen")
    dv = str(tmp_path / "dv")
    build_bm25_index(spark, docs, post, dlen, source_version="v1")
    d = docs.filter("doc_id % 10 = 3").select("doc_id")
    d_ids = {r["doc_id"] for r in d.collect()}
    td.takedown_deferred(spark, d, dv, "doc_id", "t1")

    # tombstones alone: D's bytes still live in the targets (the
    # documented trade) and D's ids now ALSO live in the DV table
    dlen_now = read_snapshot(spark, dlen)
    assert dlen_now.filter(
        dlen_now.doc_id.isin(list(d_ids))
    ).count() > 0

    td.apply_deletion_vectors(
        spark, dv, [(post, "doc_id"), (dlen, "doc_id")], "opt1"
    )
    for table in (post, dlen, dv):
        vacuum(table, keep_versions=1)
        part_dirs = glob.glob(os.path.join(table, "data", "part-*"))
        if table == dv:
            # the truncated DV table may keep zero data files; any
            # that remain must not carry a deleted id
            if not part_dirs:
                continue
        else:
            assert part_dirs, "vacuum deleted the live data"
        remaining = spark.read.parquet(*part_dirs)
        assert (
            remaining.filter(
                remaining.doc_id.isin(list(d_ids))
            ).count()
            == 0
        ), f"deleted doc bytes survive in {table}"


def test_mor_overdue_gate_counts_distinct_tombstones(spark, tmp_path):
    """Round-14 self-review: deferred takedowns of OVERLAPPING id sets
    append duplicate tombstone rows by design, but the broadcast side
    is the distinct set — the overdue gate must confirm with a
    distinct count before declaring the apply overdue, not warn on the
    raw row count."""
    import warnings

    from airflow_crypto_btc_spark.sources.snapshot_table import append

    state = str(tmp_path / "state")
    dv = str(tmp_path / "dv")
    append(
        spark,
        spark.range(0, 40).selectExpr("id AS doc_id", "id * 2 AS v"),
        state,
    )
    ids = spark.range(0, 6).selectExpr("id AS doc_id")
    td.takedown_deferred(spark, ids, dv, "doc_id", "t1")
    td.takedown_deferred(spark, ids, dv, "doc_id", "t2")  # duplicates
    # raw rows = 12 > cap = 8 > distinct = 6: must stay on broadcast
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        got = {
            r["doc_id"]
            for r in td.read_snapshot_mor(
                spark, state, dv, "doc_id", broadcast_cap=8
            ).collect()
        }
    assert got == set(range(6, 40))
    # and a genuinely-overdue queue (distinct > cap) still warns
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        got2 = {
            r["doc_id"]
            for r in td.read_snapshot_mor(
                spark, state, dv, "doc_id", broadcast_cap=3
            ).collect()
        }
    assert got2 == got
    assert any("overdue" in str(x.message) for x in w)
