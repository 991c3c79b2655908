"""WordPiece greedy MaxMatch semantics (operators/wordpiece.py)."""

from __future__ import annotations

import pytest

from airflow_crypto_btc_spark.operators.wordpiece import (
    UNK,
    build_wordpiece_table,
    wordpiece_encode,
    wordpiece_encode_from_model,
    wordpiece_segment,
    wordpiece_vocab_build,
)


def _vocab(spark, pieces):
    return spark.createDataFrame(
        [(p, i + 1) for i, p in enumerate(pieces)],
        "piece string, piece_id long",
    )


def _seg(spark, words, pieces, maxl=3):
    wdf = spark.createDataFrame([(w,) for w in words], "word string")
    out = wordpiece_segment(wdf, _vocab(spark, pieces), max_piece_len=maxl)
    return {r["word"]: r for r in out.collect()}


def test_greedy_longest_match_first(spark):
    # at each position the LONGEST piece wins: 'ab ##c', never 'a ##bc'
    r = _seg(spark, ["abc"], ["ab", "##c", "a", "##bc"])
    assert r["abc"]["pieces_str"] == "ab ##c"
    assert r["abc"]["n_pieces"] == 2
    assert not r["abc"]["is_unk"]


def test_unk_fails_the_whole_word(spark):
    # 'z' has no continuation piece: the word is [UNK], not 'b ##a ?'
    r = _seg(spark, ["baz", "ba"], ["b", "##a", "a"])
    assert r["baz"]["pieces_str"] == UNK
    assert r["baz"]["n_pieces"] == 1
    assert r["baz"]["is_unk"]
    assert r["ba"]["pieces_str"] == "b ##a"


def test_continuation_namespace_is_distinct(spark):
    # start-form 'x' alone cannot match past position 1
    r = _seg(spark, ["xx", "x"], ["x"])
    assert r["x"]["pieces_str"] == "x"
    assert r["xx"]["pieces_str"] == UNK


def test_max_piece_len_bounds_the_match(spark):
    # 'abcd' in vocab but maxl=3 means it can never match
    r = _seg(spark, ["abcd"], ["abcd", "abc", "##d"], maxl=3)
    assert r["abcd"]["pieces_str"] == "abc ##d"


def test_vocab_two_tier_alphabet(spark):
    # 'q' appears once in 41 chars (< 10% bar) → not alphabet; common
    # chars enter in BOTH forms and rank before every multi-char piece
    docs = spark.createDataFrame(
        [(0, "aaaa aaaa aaaa aaaa aaaa bbbb bbbb bbbb quab")],
        "doc_id long, text string",
    )
    v = {
        r["piece"]: r["piece_id"]
        for r in wordpiece_vocab_build(
            docs, size=12, alphabet_min_permille=100
        ).collect()
    }
    assert "q" not in v and "##q" not in v
    alphabet = {"a", "##a", "b", "##b"}
    assert alphabet <= set(v)
    multi = [p for p in v if len(p.replace("##", "", 1)) > 1]
    assert multi, "multi-char pieces should fill remaining slots"
    assert max(v[p] for p in alphabet) < min(v[p] for p in multi)


def test_encode_counts_and_empty_doc(spark):
    docs = spark.createDataFrame(
        [(0, "abc ab zz"), (1, "  ")],
        "doc_id long, text string",
    )
    enc = {
        r["doc_id"]: r
        for r in wordpiece_encode(
            docs, size=6, alphabet_min_permille=0
        ).collect()
    }
    # permille=0 → every char qualifies: alphabet {##b, a, ##c, ##z, z}
    # (5 pieces), one slot left for the top multi-char piece 'ab'
    # (cnt 2) — so: abc → 'ab ##c', ab → 'ab', zz → 'z ##z'
    assert enc[0]["wp_str"] == "ab ##c ab z ##z"
    assert enc[0]["n_pieces"] == 5
    assert enc[0]["n_unk_words"] == 0
    assert enc[1]["wp_str"] == ""
    assert enc[1]["n_pieces"] == 0
    assert enc[1]["n_unk_words"] == 0


def test_from_model_matches_inline_and_refuses_stale(spark, tmp_path):
    docs = spark.createDataFrame(
        [(0, "scan the scan"), (1, "stream big table")],
        "doc_id long, text string",
    )
    table = str(tmp_path / "wp_vocab")
    build_wordpiece_table(
        spark, docs, table, size=24, source_version="v1"
    )
    served = wordpiece_encode_from_model(
        spark, docs, table, expect_source="v1"
    )
    inline = wordpiece_encode(docs, size=24)
    assert sorted(map(tuple, served.collect())) == sorted(
        map(tuple, inline.collect())
    )
    with pytest.raises(ValueError, match="stale WordPiece vocab"):
        wordpiece_encode_from_model(
            spark, docs, table, expect_source="v2"
        )


def test_serve_segments_unseen_words(spark, tmp_path):
    # the frozen-vocab walk needs no word table: a word never seen at
    # build time still segments (or honestly UNKs) at serve time
    train = spark.createDataFrame(
        [(0, "ab ab ab ba ba")], "doc_id long, text string"
    )
    table = str(tmp_path / "wp_vocab")
    build_wordpiece_table(
        spark, train, table, size=8, source_version="v1"
    )
    serve = spark.createDataFrame(
        [(9, "abba baab xq")], "doc_id long, text string"
    )
    r = wordpiece_encode_from_model(spark, serve, table).collect()[0]
    parts = r["wp_str"].split(" ")
    assert parts[:2] == ["ab", "##b"] or parts[0] in {"ab", "a"}
    assert r["n_unk_words"] == 1  # 'xq': x,q never seen at build


@pytest.mark.smoke
def test_wordpiece_byte_fallback_zero_unk_and_roundtrip(spark, tmp_path):
    """byte_fallback serve: a failed word decomposes into <0xNN> UTF-8
    byte pieces instead of [UNK] — n_unk_words is structurally 0, the
    fallback is audited, vocab words segment exactly as before, and
    the byte pieces round-trip to the original word."""
    train = spark.createDataFrame(
        [(0, "abba baab abab bb aa")], "doc_id long, text string"
    )
    build_wordpiece_table(
        spark, train, str(tmp_path / "v"), size=8, source_version="v1"
    )
    serve = spark.createDataFrame(
        [(0, "abba"), (1, "Ωmega!"), (2, "bb Ωmega! abba")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in wordpiece_encode_from_model(
            spark, serve, str(tmp_path / "v"),
            expect_source="v1", byte_fallback=True,
        ).collect()
    }
    assert all(r["n_unk_words"] == 0 for r in out.values())
    assert "[UNK]" not in out[2]["wp_str"]
    assert out[0]["n_fallback_words"] == 0
    assert out[1]["n_fallback_words"] == 1
    assert out[2]["n_fallback_words"] == 1
    # 'Ωmega!' is 7 UTF-8 bytes (Ω = 2) -> 7 byte pieces
    assert out[1]["n_pieces"] == 7
    hexes = [p[3:5] for p in out[1]["wp_str"].split(" ")]
    assert bytes.fromhex("".join(hexes)).decode("utf-8") == "Ωmega!"
    # vocab words still segment identically to the plain serve
    plain = {
        r["doc_id"]: r
        for r in wordpiece_encode_from_model(
            spark, serve, str(tmp_path / "v"), expect_source="v1"
        ).collect()
    }
    assert out[0]["wp_str"] == plain[0]["wp_str"]
