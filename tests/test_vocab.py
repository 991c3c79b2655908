"""Tokenizer-vocab lifecycle: deterministic ranked build, frozen-vocab
encode with OOV accounting, stale-generation refusal."""

from __future__ import annotations

import pytest

from airflow_crypto_btc_spark.operators.vocab import (
    build_vocab_table,
    encode_from_vocab,
    vocab_build,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_vocab_build_rank_order_and_boundary_ties(spark):
    docs = _docs(
        spark,
        [(1, "aa aa aa bb bb cc"), (2, "bb dd cc"), (3, "ee")],
    )
    v = {r["token"]: (r["token_id"], r["cnt"])
         for r in vocab_build(docs, size=3).collect()}
    # counts: aa=3 bb=3 cc=2 dd=1 ee=1 — tie aa/bb broken by token asc,
    # the size-3 cut lands after cc deterministically
    assert v == {"aa": (1, 3), "bb": (2, 3), "cc": (3, 2)}


def test_encode_from_vocab_ids_oov_and_refusal(spark, tmp_path):
    docs = _docs(spark, [(1, "aa bb zz aa"), (2, ""), (3, "zz qq")])
    vt = str(tmp_path / "vocab")
    build_vocab_table(
        spark,
        _docs(spark, [(9, "aa aa bb")]),
        vt,
        size=5,
        source_version="v1",
    )
    got = {
        r["doc_id"]: (r["ids_str"], r["n_tokens"], r["n_oov"])
        for r in encode_from_vocab(
            spark, docs, vt, expect_source="v1"
        ).collect()
    }
    # vocab from the OTHER corpus: aa=1, bb=2; zz/qq are OOV -> -1
    assert got[1] == ("1 2 -1 1", 4, 1)
    assert got[2] == ("", 0, 0)  # empty doc: empty ids, zero counts
    assert got[3] == ("-1 -1", 2, 2)
    with pytest.raises(ValueError, match="stale vocab"):
        encode_from_vocab(spark, docs, vt, expect_source="v2")


def test_streaming_encode_matches_batch_and_refuses_rebuild(
    spark, tmp_path
):
    from airflow_crypto_btc_spark.sources.snapshot_table import (
        current_snapshot,
        read_snapshot,
    )
    from airflow_crypto_btc_spark.streaming.vocab_stream import (
        encoded_sink,
    )

    vt, et = str(tmp_path / "vocab"), str(tmp_path / "enc")
    corpus = _docs(spark, [(9, "aa aa bb cc")])
    build_vocab_table(spark, corpus, vt, size=3, source_version="v1")
    with pytest.raises(ValueError, match="stale vocab"):
        encoded_sink(vt, et, query_name="e", expect_source="v2")
    sink = encoded_sink(vt, et, query_name="e", expect_source="v1")
    arrivals = _docs(
        spark, [(1, "aa zz"), (2, "bb"), (3, "cc qq aa")]
    )
    sink(arrivals.filter("doc_id < 3"), 0)
    sink(arrivals.filter("doc_id >= 3"), 1)
    got = {
        r["doc_id"]: (r["ids_str"], r["n_oov"])
        for r in read_snapshot(spark, et).collect()
    }
    want = {
        r["doc_id"]: (r["ids_str"], r["n_oov"])
        for r in encode_from_vocab(spark, arrivals, vt).collect()
    }
    assert got == want
    # replay + re-delivery fold nothing
    v = current_snapshot(et).version
    sink(arrivals.filter("doc_id >= 3"), 1)
    assert current_snapshot(et).version == v
    sink(arrivals.filter("doc_id = 1"), 2)
    assert len(read_snapshot(spark, et).collect()) == 3
    # a vocab rebuild mid-stream stops the sink, never mixes id spaces
    build_vocab_table(spark, corpus, vt, size=2, source_version="v2")
    with pytest.raises(ValueError, match="changed under a running"):
        sink(_docs(spark, [(4, "aa")]), 3)


def test_pack_bins_reconstruct_and_budget(spark, tmp_path):
    from airflow_crypto_btc_spark.operators.vocab import (
        pack_bins_from_vocab,
    )

    vt = str(tmp_path / "vocab")
    corpus = _docs(spark, [(9, "aa aa bb")])
    build_vocab_table(spark, corpus, vt, size=2, source_version="v1")
    docs = _docs(
        spark,
        [(i, " ".join(["aa"] * 3)) for i in range(40)] + [(100, "")],
    )
    bins = pack_bins_from_vocab(
        spark, docs, vt, budget=7, shards=2, expect_source="v1"
    ).collect()
    # every doc lands in exactly one bin; token mass conserved
    assert sum(r["n_docs"] for r in bins) == 41
    assert sum(r["bin_tokens"] for r in bins) == 120
    for r in bins:
        # each bin's ids string has exactly bin_tokens ids, all vocab id 1
        ids = r["bin_ids"].split() if r["bin_ids"] else []
        assert len(ids) == r["bin_tokens"]
        assert set(ids) <= {"1"}
        # a bin STARTS under budget (a straddler may overflow it):
        # 3-token docs, budget 7 -> at most 9 tokens per bin
        assert r["bin_tokens"] <= 7 + 2
    # bins within a shard are contiguous from 0
    by_shard = {}
    for r in bins:
        by_shard.setdefault(r["shard"], []).append(r["bin"])
    for bs in by_shard.values():
        assert sorted(bs) == list(range(len(bs)))


def test_release_pipeline_gates_dedups_and_packs(spark, tmp_path):
    from airflow_crypto_btc_spark.operators.vocab import (
        release_pipeline,
    )

    vt = str(tmp_path / "vocab")
    good = (
        "the cat and the dog are in the house with a ball near the "
        "door and the tree by the red wall"
    )
    build_vocab_table(
        spark, _docs(spark, [(9, good)]), vt, size=10,
        source_version="v1",
    )
    docs = _docs(
        spark,
        [
            (1, good),
            (2, good),        # exact dup of 1: keep-first drops it
            (3, "zz zz zz"),  # degenerate: fails the quality gate
            (4, good + " extra words here"),
        ],
    )
    bins = release_pipeline(
        spark, docs, vt, budget=64, expect_source="v1"
    ).collect()
    kept_docs = sum(r["n_docs"] for r in bins)
    assert kept_docs == 2  # 1 survives, 2 deduped, 3 gated, 4 survives
    # the gated and deduped docs contribute no tokens anywhere
    total = sum(r["bin_tokens"] for r in bins)
    assert total == len(good.split()) + len(good.split()) + 3
    # every id is from the frozen vocab or the OOV sentinel
    for r in bins:
        assert set(r["bin_ids"].split()) <= {str(i) for i in range(1, 11)} | {"-1"}


@pytest.mark.smoke
def test_bpe_train_textbook_merges_and_encode(spark):
    """Sennrich et al.'s classic low/lower corpus shape: the merge order
    is hand-checkable ((w,</w>) first at count 7, then (l,o), (n,e),
    (lo,w</w>) — 'low' fully merged — ...), and the encode counts follow
    from applying those merges in training order."""
    from airflow_crypto_btc_spark.operators.vocab import (
        bpe_encode_counts,
        bpe_train,
    )

    docs = spark.createDataFrame(
        [(1, "low lower lowest low low"),
         (2, "new newer newest new"),
         (3, "low new")],
        "doc_id long, text string",
    )
    m = bpe_train(docs, merges=6)
    assert [(s, l, r) for s, l, r, _ in m] == [
        (1, "w", "</w>"), (2, "l", "o"), (3, "n", "e"),
        (4, "lo", "w</w>"), (5, "w", "e"), (6, "ne", "w</w>"),
    ]
    assert m[0][3] == 7  # 'w </w>' occurs in all 7 w-final words? no:
    # low(3) + new(2) + 'low new' doc: low, new -> 7 total w-final words
    got = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in bpe_encode_counts(docs, m).collect()
    }
    # doc 3 "low new": both words fully merged -> 1 BPE token each
    assert got[3] == (2, 2)
    assert got[1][0] == 5 and got[2][0] == 4
    # subword counts strictly exceed word counts for partially-merged
    # docs, never fall below them... per-word tokens >= 1
    assert got[1][1] >= got[1][0] and got[2][1] >= got[2][0]


def test_bpe_merge_is_greedy_left_to_right_nonoverlapping(spark):
    """'aaa' under merge (a,a) must become (aa, a) — the first
    occurrence wins and the shared middle symbol is consumed, the
    classic non-overlapping rule both engines' replace() implements."""
    from airflow_crypto_btc_spark.operators.vocab import (
        bpe_encode_counts,
        bpe_train,
    )

    docs = spark.createDataFrame(
        [(1, "aaa aaa")], "doc_id long, text string"
    )
    m = bpe_train(docs, merges=1)
    assert (m[0][1], m[0][2]) == ("a", "a")
    got = bpe_encode_counts(docs, m).collect()[0]
    # per word: aa, a, </w> -> 3 tokens; 2 words -> 6
    assert (got["n_words"], got["n_bpe_tokens"]) == (2, 6)


def test_bpe_repeated_symbol_runs_merge_canonically(spark):
    """Round-10 ADVICE fix: a run of 4+ identical symbols must merge
    left-to-right canonically (Sennrich apply) — ``b b b b`` → ``bb bb``
    — not alternately (``bb b b``, the space-consuming replace bug).
    The marker encoding makes both engines' literal replace canonical;
    checked through BOTH the encode count and the step-2 census (which
    sees the merged sequences and diverges if step 1 was applied
    alternately)."""
    from airflow_crypto_btc_spark.operators.vocab import (
        bpe_encode_counts,
        bpe_train,
    )

    docs = spark.createDataFrame(
        [(1, "bbbb")], "doc_id long, text string"
    )
    m = bpe_train(docs, merges=2)
    assert (m[0][1], m[0][2], m[0][3]) == ("b", "b", 3)
    # after a CANONICAL step 1 the word is (bb, bb, </w>): step 2's
    # census is {(bb,bb):1, (bb,</w>):1} and the tie-break (l asc, then
    # r asc: '<' sorts before 'b') picks (bb, </w>).  The alternate-
    # merge bug would leave (bb, b, b, </w>) and pick (b, </w>) instead.
    assert (m[1][1], m[1][2]) == ("bb", "</w>")
    got = bpe_encode_counts(docs, m[:1]).collect()[0]
    # canonical: bb bb </w> -> 3 subword tokens (alternate bug: 4)
    assert got["n_bpe_tokens"] == 3
    # odd run: bb bb b </w> -> 4
    docs5 = spark.createDataFrame(
        [(1, "bbbbb")], "doc_id long, text string"
    )
    got5 = bpe_encode_counts(docs5, m[:1]).collect()[0]
    assert got5["n_bpe_tokens"] == 4


def test_bpe_local_and_distributed_training_identical(spark):
    """bpe_train's driver-batched fast path (collect the word table
    once, greedy loop in memory) and the distributed per-step loop must
    produce bit-identical merge lists — counts, order, tie-breaks —
    including on repeated-symbol runs and across an exhausted census."""
    from airflow_crypto_btc_spark.operators.vocab import bpe_train

    docs = spark.createDataFrame(
        [
            (1, "low lower lowest low low"),
            (2, "new newer newest new"),
            (3, "aaaa aaa bbbb bbbb"),
            (4, "ab ab abc bc"),
        ],
        "doc_id long, text string",
    )
    local = bpe_train(docs, merges=10)
    distributed = bpe_train(docs, merges=10, driver_rows_cap=0)
    assert local == distributed
    # degenerate corpus: census exhausts before the requested steps on
    # both paths, at the same step, with the same prefix
    tiny = spark.createDataFrame([(1, "a b a")], "doc_id long, text string")
    lt = bpe_train(tiny, merges=8)
    dt = bpe_train(tiny, merges=8, driver_rows_cap=0)
    assert lt == dt
    assert len(lt) < 8  # it DID exhaust


def test_bpe_merge_delta_equals_full_recensus_property():
    """The trainer's O(matches) boundary-delta update must equal the
    full before/after pair-census diff on ANY symbol sequence —
    including overlapping runs, matches at either end, and stale
    probes (no match → empty delta, sequence unchanged)."""
    from collections import Counter

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from airflow_crypto_btc_spark.operators.vocab import (
        _bpe_merge_deltas,
    )

    sym = st.sampled_from(["a", "b", "c", "ab", "bb", "</w>"])
    seqs = st.lists(sym, min_size=1, max_size=12)

    @settings(max_examples=300, deadline=None)
    @given(seqs, sym, sym)
    def check(syms, l, r):
        merged, delta = _bpe_merge_deltas(syms, l, r)
        before = Counter(zip(syms, syms[1:]))
        after = Counter(zip(merged, merged[1:]))
        want = {
            p: after[p] - before[p]
            for p in set(before) | set(after)
            if after[p] != before[p]
        }
        assert delta == want
        if not delta:
            assert merged == syms

    check()


def test_bpe_oracle_replays_training_in_lockstep_on_edge_corpora(spark):
    """The DuckDB training-replay CTE chain (registry_ext._bpe_merges_sql
    / _bpe_encode_sql) against the engine on corpora the fixtures don't
    exercise: repeated-symbol runs (canonical apply) and a census that
    exhausts before the fixed 6 steps (the coalesce-sentinel fix — an
    empty best{k} must become a no-op, not a NULL bomb that zeroes
    n_bpe_tokens)."""
    import duckdb

    from airflow_crypto_btc_spark.operators.vocab import (
        bpe_encode_counts,
        bpe_train,
    )
    from airflow_crypto_btc_spark.plans.registry_ext import (
        _bpe_encode_sql,
        _bpe_merges_sql,
    )

    corpora = {
        "runs": [(1, "bbbb bbbb aaa"), (2, "bbbbb ab")],
        "exhausts": [(1, "a b a"), (2, "b a")],
    }
    for name, rows in corpora.items():
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        m = bpe_train(docs, merges=6)
        enc = {
            (r["doc_id"], r["n_words"], r["n_bpe_tokens"])
            for r in bpe_encode_counts(docs, m).collect()
        }
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE documents AS SELECT * FROM (VALUES "
            + ",".join(f"({i}, '{t}')" for i, t in rows)
            + ") t(doc_id, text)"
        )
        om = [tuple(r) for r in con.execute(
            _bpe_merges_sql() + " ORDER BY step"
        ).fetchall()]
        assert om == m, f"{name}: merge lists diverge"
        oenc = {tuple(r) for r in con.execute(_bpe_encode_sql()).fetchall()}
        assert oenc == enc, f"{name}: encode counts diverge"
        con.close()


def test_bpe_frozen_model_refusal_and_serve_parity(spark, tmp_path):
    from airflow_crypto_btc_spark.operators.vocab import (
        bpe_encode_counts,
        bpe_train,
        build_bpe_table,
        encode_from_bpe,
    )

    docs = spark.createDataFrame(
        [(1, "ab ab abc"), (2, "bc abc ab")], "doc_id long, text string"
    )
    t = str(tmp_path / "bpe")
    trained = build_bpe_table(spark, docs, t, merges=4, source_version="v1")
    with pytest.raises(ValueError, match="stale BPE merges"):
        encode_from_bpe(spark, docs, t, expect_source="v2")
    served = sorted(
        map(tuple, encode_from_bpe(spark, docs, t, expect_source="v1").collect())
    )
    inline = sorted(map(tuple, bpe_encode_counts(docs, trained).collect()))
    assert served == inline
