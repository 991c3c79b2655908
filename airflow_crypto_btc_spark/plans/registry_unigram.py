"""Unigram-LM (SentencePiece) tokenizer registry: training, inline
encode, and frozen-model serve — see ``operators/unigram.py`` for the
algorithm and scale design (Kudo 2018, deterministic hard-EM variant).

Oracle strategy: the DuckDB SQL replays the ENTIRE lifecycle —
substring-census seed, every hard-EM round (a recursive-CTE Viterbi
DP carrying the per-word dynamic-programming table as a list column,
then the recount/retention), the two-tier final cut, and the
document-level broadcast-map projection — so engine/oracle agreement
proves the segmentations and the integer micro-unit likelihoods
value-for-value, not just row counts.  Per the iterative-oracle
doctrine every non-recursive CTE in the chain is MATERIALIZED
(an inlined CTE re-derives its whole upstream chain per referencing
row — the BPE-replay lesson).

Cross-engine determinism: piece scores are ``round(ln(cnt/total) *
1e6)`` BIGINTs — both engines evaluate ln on the identical rational
double and round half-away (the text-model recipe) — and every DP
comparison after that is exact integer arithmetic with the
(score, l, seg) struct tie-break, which Spark's ``array_max`` and
DuckDB's ``list_sort(...)[-1]`` order identically.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_crypto_btc_spark.plans.registry import QuerySpec
from airflow_crypto_btc_spark.plans.registry_ext import tokens_sql
from airflow_crypto_btc_spark.sources.tables import load_table

#: catalog build configuration.  size=40 (not the operator's default
#: 64) is the deliberately TIGHT cut: the fixture's rarest-char pieces
#: (the 'q' family) fall below it, so the [UNK] serve path is honestly
#: exercised at every SF (~900 UNK word instances at sf0.01) instead
#: of riding along vacuously — the seeded-near-dup doctrine.
_U_SIZE = 40
_U_SEED = 256
_U_MAXL = 3
_U_EM = 2
_U_PERMILLE = 10
_U_UNK_LP = -25_000_000

_D_TOKENS = tokens_sql()


def _dp_ctes(tag: str, map_cte: str, keep_lp: bool) -> str:
    """One Viterbi pass as CTEs: ``uni_dp{tag}`` is the recursive DP —
    each word carries its DP table ``t`` (list of (score, l, seg)
    structs, NULL = unreachable prefix) and each recursion step
    appends the best candidate for the next prefix — and
    ``uni_seg{tag}`` extracts the terminal (seg/lp NULL = the word
    has no segmentation).  Mirrors ``operators/unigram._viterbi_expr``
    including the (score, l, seg) tie-break."""
    lp_col = (
        ",\n    t[len(word) + 1].score AS lp" if keep_lp else ""
    )
    return f"""
uni_dp{tag} AS (
  SELECT word, cnt, 1 AS pos,
    [{{'score': CAST(0 AS BIGINT), 'l': 0, 'seg': ''}}] AS t
  FROM uni_words
  UNION ALL
  SELECT word, cnt, pos + 1,
    list_append(t, (
      list_sort(list_filter(list_transform(
        generate_series(1, least({_U_MAXL}, pos)), l ->
          CASE WHEN t[pos - l + 1] IS NOT NULL
                AND len(map_extract(vm, substr(word, pos - l + 1, l))) > 0
          THEN {{'score': t[pos - l + 1].score
                  + map_extract(vm, substr(word, pos - l + 1, l))[1],
                'l': l,
                'seg': CASE WHEN pos = l
                       THEN substr(word, pos - l + 1, l)
                       ELSE t[pos - l + 1].seg || ' '
                            || substr(word, pos - l + 1, l) END}}
          END), c -> c IS NOT NULL))[-1]))
  FROM uni_dp{tag}, {map_cte} WHERE pos <= len(word)),
uni_seg{tag} AS MATERIALIZED (
  SELECT word, cnt, t[len(word) + 1].seg AS seg{lp_col}
  FROM uni_dp{tag} WHERE pos = len(word) + 1)"""


def _em_ctes(r: int, prev_universe: str, prev_map: str) -> str:
    """One hard-EM round: Viterbi under the previous scores, recount
    pieces from the one-best segmentations, retain counted pieces plus
    the tier-0 alphabet floored at count 1."""
    return f"""{_dp_ctes(str(r), prev_map, keep_lp=False)},
uni_cnt{r} AS MATERIALIZED (
  SELECT piece, CAST(SUM(cnt) AS BIGINT) AS vcnt
  FROM (SELECT unnest(str_split(seg, ' ')) AS piece, cnt
        FROM uni_seg{r} WHERE seg IS NOT NULL)
  GROUP BY 1),
uni_u{r} AS MATERIALIZED (
  SELECT u.piece,
    CAST(CASE WHEN u.tier = 0
         THEN greatest(COALESCE(c.vcnt, 0), 1)
         ELSE c.vcnt END AS BIGINT) AS cnt,
    u.tier
  FROM {prev_universe} u LEFT JOIN uni_cnt{r} c USING (piece)
  WHERE u.tier = 0 OR COALESCE(c.vcnt, 0) > 0),
uni_lp{r} AS MATERIALIZED (
  SELECT piece, CAST(round(ln(CAST(cnt AS DOUBLE)
    / CAST(t.tot AS DOUBLE)) * 1000000) AS BIGINT) AS lp
  FROM uni_u{r},
       (SELECT CAST(SUM(cnt) AS BIGINT) AS tot FROM uni_u{r}) t),
uni_map{r} AS MATERIALIZED (
  SELECT MAP(list(piece), list(lp)) AS vm FROM uni_lp{r})"""


def _train_ctes() -> str:
    """Seed census → em_rounds of hard EM → two-tier final cut with
    micro-unit rescoring over the retained mass (mirrors
    ``operators/unigram._train_from_words``)."""
    parts = [
        f"""
ut AS ({_D_TOKENS}),
uni_words AS MATERIALIZED (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM (SELECT unnest(tokens) AS word FROM ut) GROUP BY 1),
uni_census AS MATERIALIZED (
  SELECT piece, CAST(SUM(cnt) AS BIGINT) AS cnt
  FROM (
    SELECT substr(w.word, gs.p, gl.l) AS piece, w.cnt
    FROM uni_words w,
         LATERAL (SELECT unnest(generate_series(1, len(w.word))) AS p) gs,
         LATERAL (SELECT unnest(generate_series(1,
           least({_U_MAXL}, len(w.word) - gs.p + 1))) AS l) gl)
  GROUP BY 1),
uni_chars AS (
  SELECT piece AS ch, cnt AS ccnt FROM uni_census WHERE len(piece) = 1),
uni_tot AS (SELECT CAST(SUM(ccnt) AS BIGINT) AS tot_chars FROM uni_chars),
uni_u0 AS MATERIALIZED (
  SELECT piece, cnt, tier FROM (
    SELECT c.piece, c.cnt,
      CASE WHEN len(c.piece) = 1
            AND h.ccnt * 1000 >= t.tot_chars * {_U_PERMILLE}
           THEN 0 ELSE 1 END AS tier
    FROM uni_census c
    LEFT JOIN uni_chars h ON h.ch = c.piece
    CROSS JOIN uni_tot t)
  ORDER BY tier, cnt DESC, piece LIMIT {_U_SEED}),
uni_lp0 AS MATERIALIZED (
  SELECT piece, CAST(round(ln(CAST(cnt AS DOUBLE)
    / CAST(t.tot AS DOUBLE)) * 1000000) AS BIGINT) AS lp
  FROM uni_u0,
       (SELECT CAST(SUM(cnt) AS BIGINT) AS tot FROM uni_u0) t),
uni_map0 AS MATERIALIZED (
  SELECT MAP(list(piece), list(lp)) AS vm FROM uni_lp0)"""
    ]
    for r in range(1, _U_EM + 1):
        parts.append(_em_ctes(r, f"uni_u{r - 1}", f"uni_map{r - 1}"))
    parts.append(
        f"""
uni_vocab AS MATERIALIZED (
  SELECT piece, cnt,
    CAST(row_number() OVER (ORDER BY tier, cnt DESC, piece)
      AS BIGINT) AS piece_id
  FROM (SELECT piece, cnt, tier FROM uni_u{_U_EM}
        ORDER BY tier, cnt DESC, piece LIMIT {_U_SIZE})),
uni_final AS MATERIALIZED (
  SELECT piece, piece_id, cnt,
    CAST(round(ln(CAST(cnt AS DOUBLE)
      / CAST(t.tot AS DOUBLE)) * 1000000) AS BIGINT) AS logp_micro
  FROM uni_vocab,
       (SELECT CAST(SUM(cnt) AS BIGINT) AS tot FROM uni_vocab) t)"""
    )
    return ",".join(parts)


_SQL_TEXT_UNIGRAM_VOCAB = f"""
    WITH RECURSIVE {_train_ctes()}
    SELECT piece, piece_id, cnt, logp_micro FROM uni_final
"""

#: DuckDB mirror of operators/unigram.byte_pieces_sql — verified
#: byte-identical to the Spark expression on multi-byte inputs
_DUCK_BYTE_PIECES = (
    "array_to_string(list_transform("
    "generate_series(1, octet_length(encode(word))), "
    "i -> '<0x' || substr(hex(encode(word)), 2*i - 1, 2) || '>'), ' ')"
)

_U_BYTE_LP = -20_000_000


def _encode_sql(byte_fallback: bool = False) -> str:
    """The encode oracle, parameterized by the UNK policy: plain mode
    emits '[UNK]' (1 piece, UNK_LOGP_MICRO), byte-fallback mode the
    SentencePiece ``<0xNN>`` decomposition (octet_length pieces,
    BYTE_LOGP_MICRO each) plus the structural n_unk_words = 0 and the
    n_fallback_words audit column."""
    if byte_fallback:
        fb_ps, fb_n = _DUCK_BYTE_PIECES, "octet_length(encode(word))"
        fb_lp = f"octet_length(encode(word)) * {_U_BYTE_LP}"
        extra = f""",
      CAST(0 AS BIGINT) AS n_unk_words,
      CAST(len(list_filter(tokens,
        tk -> map_extract(sm, tk)[1].unk)) AS BIGINT) AS n_fallback_words"""
    else:
        fb_ps, fb_n, fb_lp = "'[UNK]'", "1", str(_U_UNK_LP)
        extra = """,
      CAST(len(list_filter(tokens,
        tk -> map_extract(sm, tk)[1].unk)) AS BIGINT) AS n_unk_words"""
    return f"""
    WITH RECURSIVE {_train_ctes()},
    uni_mapf AS MATERIALIZED (
      SELECT MAP(list(piece), list(logp_micro)) AS vm FROM uni_final),
    {_dp_ctes("f", "uni_mapf", keep_lp=True)},
    uni_emap AS MATERIALIZED (
      SELECT MAP(list(word),
                 list({{'ps': CASE WHEN seg IS NULL THEN {fb_ps}
                              ELSE seg END,
                       'n': CAST(CASE WHEN seg IS NULL THEN {fb_n}
                            ELSE len(str_split(seg, ' ')) END AS BIGINT),
                       'lp': CAST(COALESCE(lp, {fb_lp}) AS BIGINT),
                       'unk': seg IS NULL}})) AS sm
      FROM uni_segf)
    SELECT doc_id,
      array_to_string(list_transform(tokens,
        tk -> map_extract(sm, tk)[1].ps), ' ') AS up_str,
      CAST(COALESCE(list_sum(list_transform(tokens,
        tk -> map_extract(sm, tk)[1].n)), 0) AS BIGINT) AS n_pieces,
      CAST(COALESCE(list_sum(list_transform(tokens,
        tk -> map_extract(sm, tk)[1].lp)), 0) AS BIGINT) AS logp_micro{extra}
    FROM ut, uni_emap
"""


_SQL_TEXT_UNIGRAM_ENCODE = _encode_sql(byte_fallback=False)
_SQL_TEXT_UNIGRAM_BYTE_FALLBACK = _encode_sql(byte_fallback=True)


def q_text_unigram_vocab(spark, sf_dir):
    """Unigram-LM piece model trained by deterministic hard EM:
    substring-census seed (qualified-alphabet tier rule), 2 rounds of
    Viterbi-E / recount-M, two-tier top-40 cut, integer micro-unit
    log probabilities; see operators/unigram.unigram_train."""
    from airflow_crypto_btc_spark.operators.unigram import unigram_train

    return unigram_train(
        load_table(spark, sf_dir, "documents"),
        size=_U_SIZE,
        seed_size=_U_SEED,
        max_piece_len=_U_MAXL,
        em_rounds=_U_EM,
        alphabet_min_permille=_U_PERMILLE,
    )


def q_text_unigram_encode(spark, sf_dir):
    """Viterbi subword encode, model trained in-line: distinct words
    segment row-locally against the broadcast score map (an
    ``aggregate`` DP carrying the per-word table — no UDF, no driver
    pacing), documents take a single broadcast-map projection; the
    tight 40-piece cut drops the fixture's 'q' pieces, so [UNK]
    words (and their UNK_LOGP_MICRO charge) appear at every SF; see
    operators/unigram.unigram_encode."""
    from airflow_crypto_btc_spark.operators.unigram import unigram_encode

    return unigram_encode(
        load_table(spark, sf_dir, "documents"),
        size=_U_SIZE,
        seed_size=_U_SEED,
        max_piece_len=_U_MAXL,
        em_rounds=_U_EM,
        alphabet_min_permille=_U_PERMILLE,
    )


def _unigram_zone(spark, sf_dir):
    import os

    from airflow_crypto_btc_spark.operators.unigram import (
        build_unigram_table,
    )
    from airflow_crypto_btc_spark.plans.registry_more import _landing_zone

    docs = load_table(spark, sf_dir, "documents")
    stat = os.stat(os.path.join(sf_dir, "documents.parquet"))
    source_version = f"documents@{stat.st_size}_{stat.st_mtime_ns}"

    def _land(staging: str) -> None:
        build_unigram_table(
            spark,
            docs,
            os.path.join(staging, "unigram_model"),
            size=_U_SIZE,
            seed_size=_U_SEED,
            max_piece_len=_U_MAXL,
            em_rounds=_U_EM,
            alphabet_min_permille=_U_PERMILLE,
            source_version=source_version,
        )

    return (
        _landing_zone(sf_dir, "documents", "unigram_model", _land),
        source_version,
    )


def q_text_unigram_from_model(spark, sf_dir):
    """The FROZEN-model serve path: encode against the persisted
    version-pinned piece table.  Nothing but the piece model is
    needed at serve time — an unseen word segments with the same
    row-local Viterbi DP over the broadcast scores (max_piece_len
    rides the commit meta, so a mismatched-width serve cannot
    exist); identical answer to the in-line build on the same
    corpus, which the shared oracle asserts; see
    operators/unigram.unigram_encode_from_model."""
    import os

    from airflow_crypto_btc_spark.operators.unigram import (
        unigram_encode_from_model,
    )

    zone, source_version = _unigram_zone(spark, sf_dir)
    return unigram_encode_from_model(
        spark,
        load_table(spark, sf_dir, "documents"),
        os.path.join(zone, "unigram_model"),
        expect_source=source_version,
    )


def q_text_unigram_byte_fallback(spark, sf_dir):
    """The PRODUCTION serve mode: frozen-model encode with
    SentencePiece ``--byte_fallback`` semantics — a word with no
    segmentation decomposes into its UTF-8 ``<0xNN>`` byte pieces
    instead of ``[UNK]``, so no input is ever unencodable
    (n_unk_words is structurally 0; the fallback count is audited in
    n_fallback_words, non-vacuous at every SF because the tight
    40-piece cut drops the fixture's 'q' pieces).  Same one-broadcast
    plan as text_unigram_from_model; see
    operators/unigram._encode_against."""
    import os

    from airflow_crypto_btc_spark.operators.unigram import (
        unigram_encode_from_model,
    )

    zone, source_version = _unigram_zone(spark, sf_dir)
    return unigram_encode_from_model(
        spark,
        load_table(spark, sf_dir, "documents"),
        os.path.join(zone, "unigram_model"),
        expect_source=source_version,
        byte_fallback=True,
    )


UNIGRAM_REGISTRY: dict[str, QuerySpec] = {
    "text_unigram_vocab": QuerySpec(
        q_text_unigram_vocab, _SQL_TEXT_UNIGRAM_VOCAB
    ),
    "text_unigram_encode": QuerySpec(
        q_text_unigram_encode, _SQL_TEXT_UNIGRAM_ENCODE
    ),
    "text_unigram_from_model": QuerySpec(
        q_text_unigram_from_model, _SQL_TEXT_UNIGRAM_ENCODE
    ),
    "text_unigram_byte_fallback": QuerySpec(
        q_text_unigram_byte_fallback, _SQL_TEXT_UNIGRAM_BYTE_FALLBACK
    ),
}


# ------------------------------------------------- tokenizer comparison
def q_text_tokenizer_report(spark, sf_dir):
    """The tokenizer-family capstone: BPE, WordPiece, and unigram-LM
    (the HF ``tokenizers`` trio) encode the SAME corpus from their
    persisted frozen models, and one report row per tokenizer states
    the numbers a vocabulary decision is made on — total pieces,
    fertility (pieces per whitespace word, exact micro-units), and the
    UNK word rate (BPE is open-vocabulary by construction: a word
    segments to characters at worst, so its UNK count is structurally
    zero).  All three serves are broadcast-map projections over one
    corpus scan each; the aggregate is alphabet-small."""
    from airflow_crypto_btc_spark.functions.hashing import (
        ratio_micro,
        tokens_expr,
    )
    from airflow_crypto_btc_spark.plans.registry_ext import (
        q_text_bpe_encode_from_model,
        q_text_wordpiece_from_model,
    )

    docs = load_table(spark, sf_dir, "documents")
    stats = docs.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.size(tokens_expr("text"))).cast("long").alias("n_words"),
    )

    def row(name, df, pieces_col, unk_col):
        agg = df.agg(
            F.sum(pieces_col).cast("long").alias("n_pieces"),
            (
                F.sum(unk_col).cast("long")
                if unk_col
                else F.lit(0).cast("long")
            ).alias("n_unk_words"),
        )
        return agg.select(F.lit(name).alias("tokenizer"), "*")

    report = (
        row("bpe", q_text_bpe_encode_from_model(spark, sf_dir),
            "n_bpe_tokens", None)
        .unionByName(
            row("unigram", q_text_unigram_from_model(spark, sf_dir),
                "n_pieces", "n_unk_words")
        )
        .unionByName(
            row("wordpiece", q_text_wordpiece_from_model(spark, sf_dir),
                "n_pieces", "n_unk_words")
        )
    )
    return report.crossJoin(F.broadcast(stats)).select(
        "tokenizer",
        "n_docs",
        "n_words",
        "n_pieces",
        "n_unk_words",
        ratio_micro("n_pieces", "n_words").alias("fertility"),
        ratio_micro("n_unk_words", "n_words").alias("unk_per_word"),
    )


def _tokenizer_report_sql() -> str:
    from airflow_crypto_btc_spark.plans.registry_ext import (
        _SQL_TEXT_WORDPIECE_ENCODE,
        _bpe_encode_sql,
    )

    ratio = (
        "((2 * CAST({n} AS BIGINT) * 1000000 + CAST(n_words AS BIGINT))"
        " // (2 * CAST(n_words AS BIGINT)) / 1000000.0)"
    )
    return f"""
    WITH tr_stats AS MATERIALIZED (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(len(list_filter(
          regexp_split_to_array(text, '[ \\t\\n\\x0b\\f\\r]+'),
          t -> t <> ''))) AS BIGINT) AS n_words
      FROM documents),
    tr_rows AS (
      SELECT 'bpe' AS tokenizer,
        CAST(sum(n_bpe_tokens) AS BIGINT) AS n_pieces,
        CAST(0 AS BIGINT) AS n_unk_words
      FROM ({_bpe_encode_sql()})
      UNION ALL
      SELECT 'unigram',
        CAST(sum(n_pieces) AS BIGINT),
        CAST(sum(n_unk_words) AS BIGINT)
      FROM ({_SQL_TEXT_UNIGRAM_ENCODE})
      UNION ALL
      SELECT 'wordpiece',
        CAST(sum(n_pieces) AS BIGINT),
        CAST(sum(n_unk_words) AS BIGINT)
      FROM ({_SQL_TEXT_WORDPIECE_ENCODE}))
    SELECT tokenizer, n_docs, n_words, n_pieces, n_unk_words,
      {ratio.format(n='n_pieces')} AS fertility,
      {ratio.format(n='n_unk_words')} AS unk_per_word
    FROM tr_rows, tr_stats
"""


UNIGRAM_REGISTRY["text_tokenizer_report"] = QuerySpec(
    q_text_tokenizer_report, _tokenizer_report_sql()
)


def q_text_tokenizer_report_fallback(spark, sf_dir):
    """The byte-fallback companion of text_tokenizer_report: unigram
    and WordPiece re-encode the corpus from the same frozen models in
    production ``byte_fallback`` mode, and the report shows the
    closed-vocabulary OOV gap ELIMINATED — oov_per_word is
    structurally 0 for both (no [UNK] can be emitted), the price paid
    is visible as fallback words and the fertility delta (each
    fallback word costs octet_length pieces instead of 1).  BPE is
    absent by design: it is open-vocabulary by construction and has
    nothing to fall back from."""
    from airflow_crypto_btc_spark.functions.hashing import (
        ratio_micro,
        tokens_expr,
    )
    from airflow_crypto_btc_spark.plans.registry_ext import (
        q_text_wordpiece_byte_fallback,
    )

    docs = load_table(spark, sf_dir, "documents")
    stats = docs.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.size(tokens_expr("text"))).cast("long").alias("n_words"),
    )

    def row(name, df):
        agg = df.agg(
            F.sum("n_pieces").cast("long").alias("n_pieces"),
            F.sum("n_unk_words").cast("long").alias("n_unk_words"),
            F.sum("n_fallback_words")
            .cast("long")
            .alias("n_fallback_words"),
        )
        return agg.select(F.lit(name).alias("tokenizer"), "*")

    report = row(
        "unigram_bytefb", q_text_unigram_byte_fallback(spark, sf_dir)
    ).unionByName(
        row(
            "wordpiece_bytefb",
            q_text_wordpiece_byte_fallback(spark, sf_dir),
        )
    )
    return report.crossJoin(F.broadcast(stats)).select(
        "tokenizer",
        "n_docs",
        "n_words",
        "n_pieces",
        "n_unk_words",
        "n_fallback_words",
        ratio_micro("n_pieces", "n_words").alias("fertility"),
        ratio_micro("n_unk_words", "n_words").alias("unk_per_word"),
        ratio_micro("n_fallback_words", "n_words").alias(
            "fallback_per_word"
        ),
    )


def _tokenizer_report_fallback_sql() -> str:
    from airflow_crypto_btc_spark.plans.registry_ext import (
        _SQL_TEXT_WORDPIECE_BYTE_FALLBACK,
    )

    ratio = (
        "((2 * CAST({n} AS BIGINT) * 1000000 + CAST(n_words AS BIGINT))"
        " // (2 * CAST(n_words AS BIGINT)) / 1000000.0)"
    )
    return f"""
    WITH trf_stats AS MATERIALIZED (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(len(list_filter(
          regexp_split_to_array(text, '[ \\t\\n\\x0b\\f\\r]+'),
          t -> t <> ''))) AS BIGINT) AS n_words
      FROM documents),
    trf_rows AS (
      SELECT 'unigram_bytefb' AS tokenizer,
        CAST(sum(n_pieces) AS BIGINT) AS n_pieces,
        CAST(sum(n_unk_words) AS BIGINT) AS n_unk_words,
        CAST(sum(n_fallback_words) AS BIGINT) AS n_fallback_words
      FROM ({_SQL_TEXT_UNIGRAM_BYTE_FALLBACK})
      UNION ALL
      SELECT 'wordpiece_bytefb',
        CAST(sum(n_pieces) AS BIGINT),
        CAST(sum(n_unk_words) AS BIGINT),
        CAST(sum(n_fallback_words) AS BIGINT)
      FROM ({_SQL_TEXT_WORDPIECE_BYTE_FALLBACK}))
    SELECT tokenizer, n_docs, n_words, n_pieces, n_unk_words,
      n_fallback_words,
      {ratio.format(n='n_pieces')} AS fertility,
      {ratio.format(n='n_unk_words')} AS unk_per_word,
      {ratio.format(n='n_fallback_words')} AS fallback_per_word
    FROM trf_rows, trf_stats
"""


UNIGRAM_REGISTRY["text_tokenizer_report_fallback"] = QuerySpec(
    q_text_tokenizer_report_fallback, _tokenizer_report_fallback_sql()
)
