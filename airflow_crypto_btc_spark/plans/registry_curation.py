"""Registry entries for the corpus-curation operators (TF-IDF,
contamination detection, sequence packing) — see operators/curation.py
for the scale design of each.

Determinism notes (plans/registry.py rules): idf is round-6'd BEFORE the
tf multiply and the product round-6'd again (Spark's and DuckDB's libm
``ln`` may differ in the last ulp); every count is cast to long on the
Spark side; packing is pure integer arithmetic.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_crypto_btc_spark.operators.curation import (
    chunk_documents,
    contamination_pairs,
    pack_sequences,
    stratified_sample,
    tfidf_top_terms,
)
from airflow_crypto_btc_spark.operators.text import train_test_split
from airflow_crypto_btc_spark.plans.registry import QuerySpec
from airflow_crypto_btc_spark.sources.tables import load_table

_D_TOKENS = """
    SELECT doc_id,
           list_filter(regexp_split_to_array(text, '[ \\t\\n\\x0b\\f\\r]+'), t -> t <> '')
             AS tokens
    FROM documents
"""

# 5-token shingles, distinct, md5'd — mirrors shingles_expr(k=5) + md5.
_D_SHINGLES5 = f"""
    SELECT doc_id,
      list_distinct(
        CASE WHEN len(tokens) >= 5 THEN
          list_transform(range(1, len(tokens)-3),
            i -> md5(tokens[i] || ' ' || tokens[i+1] || ' ' || tokens[i+2]
                     || ' ' || tokens[i+3] || ' ' || tokens[i+4]))
        ELSE [] END) AS shs
    FROM ({_D_TOKENS})
"""

_D_SPLIT_BUCKET = (
    "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100"
)


def q_text_tfidf_top_terms(spark, sf_dir):
    return tfidf_top_terms(load_table(spark, sf_dir, "documents"), k=3)


_SQL_TEXT_TFIDF_TOP_TERMS = f"""
    WITH toks AS (
      SELECT doc_id, unnest(tokens) AS token FROM ({_D_TOKENS})
    ),
    tf AS (
      SELECT doc_id, token, COUNT(*) AS tf
      FROM toks GROUP BY doc_id, token
    ),
    dfreq AS (
      SELECT token, COUNT(*) AS df FROM tf GROUP BY token
    ),
    scored AS (
      SELECT tf.doc_id, tf.token, tf.tf,
        round(tf.tf * round(ln((n.n_docs + 1.0) / (dfreq.df + 1.0)), 6), 6)
          AS tfidf
      FROM tf
      JOIN dfreq USING (token)
      CROSS JOIN (SELECT COUNT(*) AS n_docs FROM documents) n
    ),
    ranked AS (
      SELECT doc_id, token, tf, tfidf,
        ROW_NUMBER() OVER (PARTITION BY doc_id
                           ORDER BY tfidf DESC, token ASC) AS rnk
      FROM scored
    )
    SELECT doc_id, rnk, token, tf, tfidf FROM ranked WHERE rnk <= 3
"""


def q_curate_contamination(spark, sf_dir):
    """Eval-set decontamination over the deterministic hash split: which
    train documents share ≥10% of a test document's 5-gram shingles."""
    docs = train_test_split(load_table(spark, sf_dir, "documents"))
    return contamination_pairs(
        docs.filter(F.col("split") == "train").select("doc_id", "text"),
        docs.filter(F.col("split") == "test").select("doc_id", "text"),
    )


_SQL_CURATE_CONTAMINATION = f"""
    WITH sh AS ({_D_SHINGLES5}),
    split AS (
      SELECT doc_id, shs,
        CASE WHEN {_D_SPLIT_BUCKET} < 10 THEN 'test' ELSE 'train' END
          AS split
      FROM sh
    ),
    test_sh AS (
      SELECT doc_id AS t_id, unnest(shs) AS sh FROM split
      WHERE split = 'test'
    ),
    train_sh AS (
      SELECT doc_id AS tr_id, unnest(shs) AS sh FROM split
      WHERE split = 'train'
    ),
    sizes AS (
      SELECT t_id, COUNT(*) AS test_shingles FROM test_sh GROUP BY t_id
    ),
    hits AS (
      SELECT t_id, tr_id, COUNT(*) AS overlap
      FROM train_sh JOIN test_sh USING (sh)
      GROUP BY t_id, tr_id
    )
    SELECT t_id AS test_doc_id, tr_id AS train_doc_id, overlap,
           ((2 * CAST(overlap AS BIGINT) * 1000000 + CAST(test_shingles AS BIGINT)) // (2 * CAST(test_shingles AS BIGINT)) / 1000000.0) AS containment
    FROM hits JOIN sizes USING (t_id)
    WHERE ((2 * CAST(overlap AS BIGINT) * 1000000 + CAST(test_shingles AS BIGINT)) // (2 * CAST(test_shingles AS BIGINT)) / 1000000.0) >= 0.1
"""


def q_curate_domain_quota(spark, sf_dir):
    """C4/RefinedWeb-style per-domain cap: keep the first 10 documents
    (by doc_id) of every source, with the domain total as evidence — see
    operators/curation.domain_quota for the under-cap fast path that
    windows ONLY over-cap domains' rows."""
    from airflow_crypto_btc_spark.operators.curation import domain_quota

    return domain_quota(load_table(spark, sf_dir, "documents"), cap=10)


_SQL_CURATE_DOMAIN_QUOTA = """
    WITH census AS (
      SELECT source, COUNT(*) AS n_domain_docs FROM documents GROUP BY source
    ),
    ranked AS (
      SELECT d.doc_id, d.lang, d.source, c.n_domain_docs,
             row_number() OVER (PARTITION BY d.source ORDER BY d.doc_id)
               AS rn
      FROM documents d JOIN census c USING (source)
    )
    SELECT doc_id, lang, source,
           CAST(n_domain_docs AS BIGINT) AS n_domain_docs
    FROM ranked WHERE rn <= 10
"""


def q_curate_domain_census(spark, sf_dir):
    """Per-domain quota accounting (seen / kept / dropped under cap=10)
    — one map-side-combined aggregate, no second documents pass."""
    from airflow_crypto_btc_spark.operators.curation import (
        domain_quota_census,
    )

    return domain_quota_census(
        load_table(spark, sf_dir, "documents"), cap=10
    )


_SQL_CURATE_DOMAIN_CENSUS = """
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(least(COUNT(*), 10) AS BIGINT) AS n_kept,
           CAST(greatest(COUNT(*) - 10, 0) AS BIGINT) AS n_dropped
    FROM documents GROUP BY source
"""


def q_curate_quota_decisions(spark, sf_dir):
    """Full admission audit frame (every doc's in-domain arrival rank +
    verdict, cap=10) — the batch twin of the streaming quota sink's
    decisions table; see operators/curation.quota_decisions."""
    from airflow_crypto_btc_spark.operators.curation import (
        quota_decisions,
    )

    return quota_decisions(load_table(spark, sf_dir, "documents"), cap=10)


_SQL_CURATE_QUOTA_DECISIONS = """
    SELECT doc_id, source,
           CAST(row_number() OVER w AS BIGINT) AS admit_rank,
           row_number() OVER w <= 10 AS admitted
    FROM documents
    WINDOW w AS (PARTITION BY source ORDER BY doc_id)
"""


def q_curate_pack_sequences(spark, sf_dir):
    return pack_sequences(load_table(spark, sf_dir, "documents"))


_SQL_CURATE_PACK_SEQUENCES = f"""
    WITH n AS (
      SELECT doc_id,
        ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 8
          AS shard,
        len(tokens) AS n_tokens
      FROM ({_D_TOKENS})
    ),
    c AS (
      SELECT doc_id, shard, n_tokens,
        CAST(COALESCE(SUM(n_tokens) OVER (
          PARTITION BY shard ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
          AS cum_excl
      FROM n
    )
    SELECT doc_id, shard, n_tokens,
           cum_excl // 512 AS bin, cum_excl % 512 AS bin_offset
    FROM c
"""


def q_curate_chunk_documents(spark, sf_dir):
    return chunk_documents(load_table(spark, sf_dir, "documents"))


_SQL_CURATE_CHUNK_DOCUMENTS = f"""
    WITH t AS ({_D_TOKENS}),
    s AS (
      SELECT doc_id, tokens, len(tokens) AS n,
             unnest(range(0, len(tokens), 96)) AS start
      FROM t WHERE len(tokens) > 0
    )
    SELECT doc_id,
           CAST(start // 96 AS BIGINT) AS chunk_idx,
           array_to_string(tokens[start + 1 : least(start + 128, n)], ' ')
             AS chunk_text,
           CAST(least(start + 128, n) - start AS BIGINT) AS n_chunk_tokens
    FROM s
"""


def q_curate_stratified_sample(spark, sf_dir):
    return stratified_sample(load_table(spark, sf_dir, "documents"))


_SQL_CURATE_STRATIFIED_SAMPLE = """
    SELECT doc_id, source, sample_rank
    FROM (
      SELECT doc_id, source,
        ROW_NUMBER() OVER (
          PARTITION BY source
          ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
        ) AS sample_rank
      FROM documents
    )
    WHERE sample_rank <= 20
"""


# ------------------------------------- cross-document duplicated spans


def q_text_dup_ngram_coverage(spark, sf_dir):
    """Per-doc fraction of 8-token gram positions duplicated in ≥2
    distinct documents — the shuffle-friendly core of exact-substring
    dedup (Lee et al. 2022); see operators/text.dup_ngram_coverage."""
    from airflow_crypto_btc_spark.operators.text import (
        dup_ngram_coverage,
    )

    return dup_ngram_coverage(load_table(spark, sf_dir, "documents"))


_GRAM8 = " || ' ' || ".join(f"tokens[i+{j}]" for j in range(8))

_SQL_TEXT_DUP_NGRAM_COVERAGE = f"""
    WITH tok AS (SELECT doc_id, tokens FROM ({_D_TOKENS})),
    g AS (SELECT doc_id, md5(gram) AS h FROM (
      SELECT doc_id, unnest(CASE WHEN len(tokens) >= 8 THEN
        list_transform(range(1, len(tokens)-6), i -> {_GRAM8})
      ELSE [] END) AS gram
      FROM tok)),
    dfreq AS (SELECT h, count(*) AS df FROM (
      SELECT DISTINCT doc_id, h FROM g) GROUP BY h),
    dup AS (SELECT doc_id, count(*) AS n_dup
            FROM g JOIN dfreq USING (h) WHERE df >= 2 GROUP BY doc_id),
    sizes AS (SELECT doc_id,
      CAST(CASE WHEN len(tokens) >= 8 THEN len(tokens) - 7 ELSE 0 END
           AS BIGINT) AS n_grams FROM tok)
    SELECT s.doc_id, n_grams,
      CAST(coalesce(n_dup, 0) AS BIGINT) AS n_dup_grams,
      CASE WHEN n_grams > 0 THEN
        ((2 * CAST(coalesce(n_dup, 0) AS BIGINT) * 1000000 + n_grams)
         // (2 * n_grams) / 1000000.0) END AS dup_coverage
    FROM sizes s LEFT JOIN dup USING (doc_id)
"""


def q_text_dup_span_scrub(spark, sf_dir):
    """Cross-document exact-substring SCRUB (Lee et al. 2022) — the
    curation action whose accounting half is text_dup_ngram_coverage:
    tokens covered by any k-gram occurring in ≥2 distinct documents are
    removed from every document (the released deduplicate-text-datasets
    semantics: all copies cut).  Untouched docs never leave a pure
    projection; affected docs pay posexplode → anti-join → reassembly;
    see operators/text.dup_span_scrub."""
    from airflow_crypto_btc_spark.operators.text import dup_span_scrub

    return dup_span_scrub(load_table(spark, sf_dir, "documents"))


def _dup_span_scrub_sql(census: str) -> str:
    """The scrub oracle, parameterized by the duplication census CTE —
    documents mode dedups (doc_id, h) first, occurrences mode counts
    raw gram rows (the cited tool's semantics)."""
    return f"""
    WITH tok AS (SELECT doc_id, tokens FROM ({_D_TOKENS})),
    g0 AS (SELECT doc_id, unnest(CASE WHEN len(tokens) >= 8 THEN
        list_transform(range(1, len(tokens)-6),
          i -> struct_pack(gpos := i, gram := {_GRAM8}))
      ELSE [] END) AS s FROM tok),
    g AS (SELECT doc_id, s.gpos AS gpos, md5(s.gram) AS h FROM g0),
    dfreq AS ({census}),
    cov AS (SELECT DISTINCT doc_id, p FROM (
      SELECT doc_id, unnest(range(gpos, gpos + 8)) AS p
      FROM g JOIN dfreq USING (h) WHERE df >= 2)),
    covl AS (SELECT doc_id, list(p) AS ps FROM cov GROUP BY doc_id)
    SELECT t.doc_id,
      CAST(len(tokens) AS BIGINT) AS n_tokens,
      CAST(coalesce(len(ps), 0) AS BIGINT) AS n_scrubbed,
      CASE WHEN ps IS NULL THEN array_to_string(tokens, ' ')
           ELSE coalesce(array_to_string(list_transform(
             list_filter(range(1, len(tokens) + 1),
               p -> NOT list_contains(ps, p)),
             p -> tokens[p]), ' '), '') END AS clean_text
    FROM tok t LEFT JOIN covl USING (doc_id)
"""


_SQL_TEXT_DUP_SPAN_SCRUB = _dup_span_scrub_sql(
    "SELECT h, count(*) AS df FROM ("
    "SELECT DISTINCT doc_id, h FROM g) GROUP BY h"
)

_SQL_TEXT_DUP_SPAN_SCRUB_OCC = _dup_span_scrub_sql(
    "SELECT h, count(*) AS df FROM g GROUP BY h"
)


def q_text_dup_span_scrub_occ(spark, sf_dir):
    """ExactSubstr scrub in OCCURRENCE-census mode — the cited tool's
    exact semantics (Lee et al. 2022 released code counts total
    corpus-wide occurrences): a k-gram repeated only WITHIN one
    document is scrubbed too.  Same plan as text_dup_span_scrub minus
    the census's per-doc dedup exchange; scrubs a superset of the
    documents-mode tokens (the delta is the intra-doc repeats — equal
    on this fixture corpus, which has none; the mode difference is
    unit-test-pinned on planted repeats)."""
    from airflow_crypto_btc_spark.operators.text import dup_span_scrub

    return dup_span_scrub(
        load_table(spark, sf_dir, "documents"), count_mode="occurrences"
    )


def q_text_dup_coverage_from_index(spark, sf_dir):
    """The SERVING shape of duplicated-span accounting: the gram-
    frequency index lives in a snapshot table built once per corpus
    version (landing-zone keyed by the fixture fingerprint) over the
    NON-delta 90% of documents; each increment scores against the
    frozen index through the version-pinned front end.  The oracle is
    the one-shot full-corpus recompute restricted to delta ids, so
    passing proves the frozen-index decomposition is exact for
    arrivals (one corpus occurrence + one delta occurrence ≥ 2
    distinct docs — see operators/text.dup_coverage_from_index)."""
    import os

    from airflow_crypto_btc_spark.operators.text import (
        build_gram_index,
        dup_coverage_from_index,
    )
    from airflow_crypto_btc_spark.plans.registry_more import _landing_zone

    docs = load_table(spark, sf_dir, "documents")
    stat = os.stat(os.path.join(sf_dir, "documents.parquet"))
    source_version = f"documents@{stat.st_size}_{stat.st_mtime_ns}"

    def _land(staging: str) -> None:
        build_gram_index(
            spark,
            docs.filter("doc_id % 10 != 0"),
            staging,
            source_version=source_version,
        )

    idx = _landing_zone(sf_dir, "documents", "gram_index", _land)
    return dup_coverage_from_index(
        spark,
        docs.filter("doc_id % 10 = 0"),
        idx,
        expect_source=source_version,
    )


_SQL_TEXT_DUP_FROM_INDEX = f"""
    WITH full_scores AS ({_SQL_TEXT_DUP_NGRAM_COVERAGE})
    SELECT * FROM full_scores WHERE doc_id % 10 = 0
"""


def q_curate_span_gate(spark, sf_dir):
    """Doc-level training gate on cross-document duplicated-span
    coverage — the drop-the-document policy pipelines use when they
    cannot rewrite span content in place: keep documents whose 8-gram
    dup_coverage is under 0.5 (docs too short to have grams keep —
    absence of evidence is not duplication).  Returns kept docs WITH
    the evidence columns, so the gate decision is auditable."""
    from airflow_crypto_btc_spark.operators.text import (
        dup_ngram_coverage,
    )

    docs = load_table(spark, sf_dir, "documents")
    cov = dup_ngram_coverage(docs)
    return (
        docs.select("doc_id", "lang", "source")
        .join(cov, "doc_id")
        .filter(
            F.col("dup_coverage").isNull()
            | (F.col("dup_coverage") < 0.5)
        )
        .select(
            "doc_id", "lang", "source",
            "n_grams", "n_dup_grams", "dup_coverage",
        )
    )


_SQL_CURATE_SPAN_GATE = f"""
    WITH cov AS ({_SQL_TEXT_DUP_NGRAM_COVERAGE})
    SELECT d.doc_id, d.lang, d.source,
           n_grams, n_dup_grams, dup_coverage
    FROM documents d JOIN cov ON d.doc_id = cov.doc_id
    WHERE dup_coverage IS NULL OR dup_coverage < 0.5
"""


# ---------------------------------------------- repetition quality signals


def q_text_repetition_score(spark, sf_dir):
    """Gopher-style per-doc repetition signals (top-token fraction,
    type-token ratio, duplicate-bigram fraction) — see
    operators/text.repetition_scores for the one-scan no-self-join design."""
    from airflow_crypto_btc_spark.operators.text import repetition_scores

    return repetition_scores(load_table(spark, sf_dir, "documents"))


_SQL_TEXT_REPETITION_SCORE = f"""
    WITH tok AS (
      SELECT doc_id, tokens FROM ({_D_TOKENS}) WHERE len(tokens) > 0
    ),
    bstats AS (
      SELECT doc_id,
        len(bigrams) AS n_bi,
        len(list_distinct(bigrams)) AS n_bi_d
      FROM (
        SELECT doc_id,
          CASE WHEN len(tokens) >= 2 THEN
            list_transform(range(1, len(tokens)),
                           i -> tokens[i] || ' ' || tokens[i+1])
          ELSE [] END AS bigrams
        FROM tok
      )
    ),
    counts AS (
      SELECT doc_id, u.t AS t, count(*) AS c
      FROM (
        SELECT doc_id,
          unnest(list_transform(tokens, t -> {{'t': t}})) AS u
        FROM tok
      )
      GROUP BY 1, 2
    ),
    stats AS (
      SELECT doc_id,
        CAST(sum(c) AS BIGINT) AS n_tokens,
        CAST(count(*) AS BIGINT) AS n_types,
        max(c) AS top_cnt
      FROM counts GROUP BY 1
    )
    SELECT s.doc_id, s.n_tokens, s.n_types,
      round((top_cnt * 1.0) / n_tokens, 6) AS top_token_frac,
      round((n_types * 1.0) / n_tokens, 6) AS type_token_ratio,
      round(CASE WHEN n_bi > 0
                 THEN 1.0 - (n_bi_d * 1.0) / n_bi END, 6) AS dup_bigram_frac
    FROM stats s JOIN bstats b ON s.doc_id = b.doc_id
"""


# ------------------------------------------------- bigram PMI collocations


def q_text_bigram_pmi(spark, sf_dir):
    """Corpus-level top-20 bigram collocations by PMI (min count 5) — see
    operators/text.bigram_pmi for the broadcast-vocabulary scale design."""
    from airflow_crypto_btc_spark.operators.text import bigram_pmi

    return bigram_pmi(load_table(spark, sf_dir, "documents"))


_SQL_TEXT_BIGRAM_PMI = f"""
    WITH tok AS (
      SELECT doc_id, tokens FROM ({_D_TOKENS}) WHERE len(tokens) > 0
    ),
    uni AS (
      SELECT u.t AS t, count(*) AS c
      FROM (SELECT unnest(list_transform(tokens, t -> {{'t': t}})) AS u
            FROM tok)
      GROUP BY 1
    ),
    big AS (
      SELECT u.b AS bigram, count(*) AS c_ab
      FROM (
        SELECT unnest(list_transform(
          CASE WHEN len(tokens) >= 2 THEN
            list_transform(range(1, len(tokens)),
                           i -> tokens[i] || ' ' || tokens[i+1])
          ELSE [] END, b -> {{'b': b}})) AS u
        FROM tok
      )
      GROUP BY 1
      HAVING count(*) >= 5
    ),
    totals AS (
      -- NB = NU - #docs: every doc with n >= 1 tokens has n-1 bigrams
      SELECT CAST(sum(len(tokens)) AS DOUBLE) AS nu,
             CAST(sum(len(tokens)) - count(*) AS DOUBLE) AS nb
      FROM tok
    )
    SELECT bigram,
      CAST(c_ab AS BIGINT) AS c_ab,
      CAST(a.c AS BIGINT) AS c_a,
      CAST(b2.c AS BIGINT) AS c_b,
      round(ln((CAST(c_ab AS DOUBLE) * nu * nu)
               / (nb * a.c * b2.c)), 6) AS pmi
    FROM big
    JOIN uni a ON a.t = string_split(bigram, ' ')[1]
    JOIN uni b2 ON b2.t = string_split(bigram, ' ')[2]
    CROSS JOIN totals
    ORDER BY pmi DESC, bigram
    LIMIT 20
"""


CURATION_REGISTRY: dict[str, QuerySpec] = {
    "text_dup_ngram_coverage": QuerySpec(
        q_text_dup_ngram_coverage, _SQL_TEXT_DUP_NGRAM_COVERAGE
    ),
    "text_dup_span_scrub_occ": QuerySpec(
        q_text_dup_span_scrub_occ, _SQL_TEXT_DUP_SPAN_SCRUB_OCC
    ),
    "text_dup_span_scrub": QuerySpec(
        q_text_dup_span_scrub, _SQL_TEXT_DUP_SPAN_SCRUB
    ),
    "text_dup_coverage_from_index": QuerySpec(
        q_text_dup_coverage_from_index, _SQL_TEXT_DUP_FROM_INDEX
    ),
    "curate_span_gate": QuerySpec(
        q_curate_span_gate, _SQL_CURATE_SPAN_GATE
    ),
    "text_repetition_score": QuerySpec(
        q_text_repetition_score, _SQL_TEXT_REPETITION_SCORE
    ),
    "text_bigram_pmi": QuerySpec(q_text_bigram_pmi, _SQL_TEXT_BIGRAM_PMI),
    "curate_stratified_sample": QuerySpec(
        q_curate_stratified_sample, _SQL_CURATE_STRATIFIED_SAMPLE
    ),
    "curate_chunk_documents": QuerySpec(
        q_curate_chunk_documents, _SQL_CURATE_CHUNK_DOCUMENTS
    ),
    "text_tfidf_top_terms": QuerySpec(
        q_text_tfidf_top_terms, _SQL_TEXT_TFIDF_TOP_TERMS
    ),
    "curate_contamination": QuerySpec(
        q_curate_contamination, _SQL_CURATE_CONTAMINATION
    ),
    "curate_pack_sequences": QuerySpec(
        q_curate_pack_sequences, _SQL_CURATE_PACK_SEQUENCES
    ),
    "curate_domain_quota": QuerySpec(
        q_curate_domain_quota, _SQL_CURATE_DOMAIN_QUOTA
    ),
    "curate_domain_census": QuerySpec(
        q_curate_domain_census, _SQL_CURATE_DOMAIN_CENSUS
    ),
    "curate_quota_decisions": QuerySpec(
        q_curate_quota_decisions, _SQL_CURATE_QUOTA_DECISIONS
    ),
}


def q_curate_balanced_shards(spark, sf_dir):
    """Balanced output sharding (8 shards, 64 micro-shards): hash
    micro-shard + serpentine LPT over the bounded census — no global
    sort, the only window runs over 64 rows; see
    operators/curation.balanced_shards."""
    from airflow_crypto_btc_spark.operators.curation import (
        balanced_shards,
    )

    return balanced_shards(load_table(spark, sf_dir, "documents"))


def q_curate_shard_summary(spark, sf_dir):
    """Per-shard balance report (doc count, token mass, exact micro-unit
    corpus share) over the balanced assignment — what the sharding job
    logs to prove its output is balanced."""
    from airflow_crypto_btc_spark.operators.curation import (
        balanced_shards,
        shard_summary,
    )

    return shard_summary(
        balanced_shards(load_table(spark, sf_dir, "documents"))
    )


_SQL_BALANCED_ASSIGN = f"""
    n AS (
      SELECT doc_id,
        ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 64
          AS micro_shard,
        len(tokens) AS n_tokens
      FROM ({_D_TOKENS})
    ),
    census AS (
      SELECT micro_shard, SUM(n_tokens) AS tok_total
      FROM n GROUP BY micro_shard
    ),
    ranked AS (
      SELECT micro_shard,
        row_number() OVER (ORDER BY tok_total DESC, micro_shard ASC)
          AS rk
      FROM census
    ),
    assign AS (
      SELECT micro_shard,
        CAST(CASE WHEN (rk - 1) % 16 < 8 THEN (rk - 1) % 16
             ELSE 15 - ((rk - 1) % 16) END AS BIGINT) AS shard
      FROM ranked
    )
"""

_SQL_CURATE_BALANCED_SHARDS = f"""
    WITH {_SQL_BALANCED_ASSIGN}
    SELECT n.doc_id, n.n_tokens, n.micro_shard, a.shard
    FROM n JOIN assign a USING (micro_shard)
"""

_SQL_CURATE_SHARD_SUMMARY = f"""
    WITH {_SQL_BALANCED_ASSIGN},
    joined AS (
      SELECT a.shard, n.n_tokens
      FROM n JOIN assign a USING (micro_shard)
    ),
    tot AS (SELECT SUM(n_tokens) AS tok_corpus FROM joined)
    SELECT shard, COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS tok_total,
           ((2 * CAST(SUM(n_tokens) AS BIGINT) * 1000000 + t.tok_corpus)
            // (2 * t.tok_corpus) / 1000000.0) AS share
    FROM joined, tot t
    GROUP BY shard, t.tok_corpus
"""


def _shard_map_zone(spark, sf_dir):
    """Landing-zone build of the persisted shard map — one serpentine
    plan per fixture version, shared by the from-map entry.  Returns
    (zone_path, source_version)."""
    import os

    from airflow_crypto_btc_spark.operators.curation import (
        build_shard_map,
    )
    from airflow_crypto_btc_spark.plans.registry_more import _landing_zone

    docs = load_table(spark, sf_dir, "documents")
    stat = os.stat(os.path.join(sf_dir, "documents.parquet"))
    source_version = f"documents@{stat.st_size}_{stat.st_mtime_ns}"

    def _land(staging: str) -> None:
        build_shard_map(
            spark,
            docs,
            os.path.join(staging, "map"),
            source_version=source_version,
        )

    return (
        _landing_zone(sf_dir, "documents", "shard_map", _land),
        source_version,
    )


def q_curate_shards_from_map(spark, sf_dir):
    """Shard assignment served from the PERSISTED map: the serpentine
    deal is planned once per fixture version into a snapshot table and
    assignment is one broadcast map join — no census aggregation, no
    window.  The oracle replays the COMPLETE-census plan (all 64
    micro-shards ranked, absent ones at zero) — the map-build
    semantics, which differ from the inline entry's census exactly when
    a micro-shard is unpopulated."""
    import os

    from airflow_crypto_btc_spark.operators.curation import (
        shards_from_map,
    )

    zone, source_version = _shard_map_zone(spark, sf_dir)
    return shards_from_map(
        spark,
        load_table(spark, sf_dir, "documents"),
        os.path.join(zone, "map"),
        expect_source=source_version,
    )


_SQL_CURATE_SHARDS_FROM_MAP = f"""
    WITH n AS (
      SELECT doc_id,
        ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 64
          AS micro_shard,
        len(tokens) AS n_tokens
      FROM ({_D_TOKENS})
    ),
    census AS (
      SELECT micro_shard, SUM(n_tokens) AS tok_total
      FROM n GROUP BY micro_shard
    ),
    complete AS (
      SELECT m.ms AS micro_shard, COALESCE(c.tok_total, 0) AS tok_total
      FROM (SELECT unnest(range(0, 64)) AS ms) m
      LEFT JOIN census c ON c.micro_shard = m.ms
    ),
    ranked AS (
      SELECT micro_shard,
        row_number() OVER (ORDER BY tok_total DESC, micro_shard ASC)
          AS rk
      FROM complete
    ),
    assign AS (
      SELECT micro_shard,
        CAST(CASE WHEN (rk - 1) % 16 < 8 THEN (rk - 1) % 16
             ELSE 15 - ((rk - 1) % 16) END AS BIGINT) AS shard
      FROM ranked
    )
    SELECT n.doc_id, n.n_tokens, n.micro_shard, a.shard
    FROM n JOIN assign a USING (micro_shard)
"""


def q_curate_shard_drift(spark, sf_dir):
    """Balance-drift monitor: the frozen map's DESIGN token shares vs
    the OBSERVED shares of a later arrival slice (``doc_id % 3 = 0`` —
    a deterministic "this month's traffic" stand-in), drift as an exact
    integer micro-unit difference; see
    operators/curation.shard_drift_report."""
    import os

    from airflow_crypto_btc_spark.operators.curation import (
        shard_drift_report,
    )

    zone, source_version = _shard_map_zone(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    return shard_drift_report(
        spark,
        docs.filter("doc_id % 3 = 0"),
        os.path.join(zone, "map"),
        expect_source=source_version,
    )


_SQL_CURATE_SHARD_DRIFT = f"""
    WITH n AS (
      SELECT doc_id,
        ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 64
          AS micro_shard,
        len(tokens) AS n_tokens
      FROM ({_D_TOKENS})
    ),
    census AS (
      SELECT micro_shard, SUM(n_tokens) AS tok_total
      FROM n GROUP BY micro_shard
    ),
    complete AS (
      SELECT m.ms AS micro_shard, COALESCE(c.tok_total, 0) AS tok_total
      FROM (SELECT unnest(range(0, 64)) AS ms) m
      LEFT JOIN census c ON c.micro_shard = m.ms
    ),
    ranked AS (
      SELECT micro_shard, tok_total,
        row_number() OVER (ORDER BY tok_total DESC, micro_shard ASC)
          AS rk
      FROM complete
    ),
    assign AS (
      SELECT micro_shard, tok_total,
        CAST(CASE WHEN (rk - 1) % 16 < 8 THEN (rk - 1) % 16
             ELSE 15 - ((rk - 1) % 16) END AS BIGINT) AS shard
      FROM ranked
    ),
    design AS (
      SELECT shard, CAST(SUM(tok_total) AS BIGINT) AS design_tokens
      FROM assign GROUP BY shard
    ),
    obs AS (
      SELECT a.shard, CAST(SUM(n.n_tokens) AS BIGINT) AS obs_tokens
      FROM n JOIN assign a USING (micro_shard)
      WHERE n.doc_id % 3 = 0
      GROUP BY a.shard
    ),
    ot AS (SELECT CAST(SUM(obs_tokens) AS BIGINT) AS obs_corpus
           FROM obs),
    dt AS (SELECT CAST(SUM(design_tokens) AS BIGINT) AS design_corpus
           FROM design)
    SELECT o.shard, o.obs_tokens, d.design_tokens,
      ((2 * o.obs_tokens * 1000000 + ot.obs_corpus)
       // (2 * ot.obs_corpus) / 1000000.0) AS obs_share,
      ((2 * d.design_tokens * 1000000 + dt.design_corpus)
       // (2 * dt.design_corpus) / 1000000.0) AS design_share,
      CAST((2 * o.obs_tokens * 1000000 + ot.obs_corpus)
            // (2 * ot.obs_corpus)
         - (2 * d.design_tokens * 1000000 + dt.design_corpus)
            // (2 * dt.design_corpus) AS BIGINT) AS drift_micro
    FROM obs o
    JOIN design d USING (shard), ot, dt
"""


def q_curate_data_card(spark, sf_dir):
    """Per-language release data card: doc counts, exact-dup accounting,
    token totals (whitespace + BPE-ish), token share, mean quality — one
    corpus scan, digest-level shuffles only; see
    operators/curation.corpus_data_card."""
    from airflow_crypto_btc_spark.operators.curation import (
        corpus_data_card,
    )

    return corpus_data_card(load_table(spark, sf_dir, "documents"))


def _data_card_sql() -> str:
    from airflow_crypto_btc_spark.operators.text import QUALITY_MICRO_SQL
    from airflow_crypto_btc_spark.plans.registry_ext import (
        _duck_stop,
        tokens_sql,
    )

    q_micro = QUALITY_MICRO_SQL.replace(" div ", " // ")
    return f"""
    WITH t AS ({tokens_sql()}),
    per AS (
      SELECT doc_id,
        CAST(len(tokens) AS BIGINT) AS n_tokens,
        CAST({_duck_stop('en')} AS BIGINT) AS stop_cnt,
        {_duck_stop('fr')} AS score_fr,
        {_duck_stop('de')} AS score_de,
        {_duck_stop('es')} AS score_es,
        len(regexp_extract_all(text, '(\\p{{Han}})', 1)) AS score_zh,
        CAST(len(list_distinct(tokens)) AS BIGINT) AS n_uniq_tokens,
        CAST(len(regexp_extract_all(text, '([a-z]+|[0-9]+|[^a-z0-9\\s])', 1))
          AS BIGINT) AS n_bpe_tokens,
        md5(lower(trim(regexp_replace(text, '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g'))))
          AS fp_md5
      FROM t
    ),
    lp AS (
      SELECT *,
        CASE WHEN score_zh > 0 THEN 'zh'
             WHEN stop_cnt = 0 AND score_fr = 0 AND score_de = 0
                  AND score_es = 0 THEN 'unknown'
             WHEN stop_cnt >= score_fr AND stop_cnt >= score_de
                  AND stop_cnt >= score_es THEN 'en'
             WHEN score_fr >= score_de AND score_fr >= score_es THEN 'fr'
             WHEN score_de >= score_es THEN 'de'
             ELSE 'es' END AS lang,
        CASE WHEN n_tokens > 0 THEN {q_micro}
             ELSE 0 END AS quality_micro
      FROM per
    ),
    g AS (
      SELECT fp_md5, lang, COUNT(*) AS n_fl, SUM(n_tokens) AS tok,
             SUM(n_bpe_tokens) AS bpe, SUM(quality_micro) AS qm
      FROM lp GROUP BY 1, 2
    ),
    gf AS (
      SELECT *, SUM(n_fl) OVER (PARTITION BY fp_md5) AS n_f FROM g
    ),
    l AS (
      SELECT lang, CAST(SUM(n_fl) AS BIGINT) AS n_docs,
        CAST(SUM(CASE WHEN n_f > 1 THEN n_fl ELSE 0 END) AS BIGINT)
          AS n_dup_docs,
        CAST(SUM(tok) AS BIGINT) AS total_tokens,
        CAST(SUM(bpe) AS BIGINT) AS total_bpe_tokens,
        CAST(SUM(qm) AS BIGINT) AS sum_qm
      FROM gf GROUP BY 1
    ),
    c AS (SELECT CAST(SUM(total_tokens) AS BIGINT) AS corpus FROM l)
    SELECT lang, n_docs, n_dup_docs, total_tokens, total_bpe_tokens,
      ((2 * total_tokens * 1000000 + corpus) // (2 * corpus)
        / 1000000.0) AS token_share,
      ((2 * sum_qm + n_docs) // (2 * n_docs) / 1000000.0) AS mean_quality
    FROM l, c
"""


CURATION_REGISTRY["curate_data_card"] = QuerySpec(
    q_curate_data_card, _data_card_sql()
)


def _corpus_versions_zone(spark, sf_dir):
    """Landing-zone two-version corpus: v_first = the %7 slice, then an
    OVERWRITE to the %5 slice — a span with both inserts (docs in the
    new slice only) and deletes (docs in the old slice only), forcing
    the change feed's multiset-exact rewrite fallback."""
    import os

    from airflow_crypto_btc_spark.plans.registry_more import (
        _landing_zone,
    )
    from airflow_crypto_btc_spark.sources.snapshot_table import (
        append,
        overwrite,
    )

    docs = load_table(spark, sf_dir, "documents")

    def _land(staging: str) -> None:
        t = os.path.join(staging, "corpus")
        append(spark, docs.filter("doc_id % 7 != 3"), t)
        overwrite(spark, docs.filter("doc_id % 5 != 0"), t)

    return _landing_zone(sf_dir, "documents", "corpus_versions", _land)


def q_curate_corpus_diff(spark, sf_dir):
    """Per-language release diff between the two landed corpus versions
    (insert = in the %5 slice but not the %7 slice; delete = the
    reverse), served from the commit-log change feed; see
    operators/curation.corpus_diff_report."""
    import os

    from airflow_crypto_btc_spark.operators.curation import (
        corpus_diff_report,
    )
    from airflow_crypto_btc_spark.sources.snapshot_table import (
        current_snapshot,
    )

    zone = _corpus_versions_zone(spark, sf_dir)
    t = os.path.join(zone, "corpus")
    v_new = current_snapshot(t).version
    return corpus_diff_report(spark, t, from_version=v_new - 1)


def _corpus_diff_sql() -> str:
    from airflow_crypto_btc_spark.plans.registry_ext import (
        _duck_stop,
        tokens_sql,
    )

    return f"""
    WITH t AS ({tokens_sql()}),
    per AS (
      SELECT doc_id,
        CAST(len(tokens) AS BIGINT) AS n_tokens,
        CAST({_duck_stop('en')} AS BIGINT) AS score_en,
        {_duck_stop('fr')} AS score_fr,
        {_duck_stop('de')} AS score_de,
        {_duck_stop('es')} AS score_es,
        len(regexp_extract_all(text, '(\\p{{Han}})', 1)) AS score_zh
      FROM t
    ),
    lp AS (
      SELECT doc_id, n_tokens,
        CASE WHEN score_zh > 0 THEN 'zh'
             WHEN score_en = 0 AND score_fr = 0 AND score_de = 0
                  AND score_es = 0 THEN 'unknown'
             WHEN score_en >= score_fr AND score_en >= score_de
                  AND score_en >= score_es THEN 'en'
             WHEN score_fr >= score_de AND score_fr >= score_es THEN 'fr'
             WHEN score_de >= score_es THEN 'de'
             ELSE 'es' END AS lang
      FROM per
    ),
    ch AS (
      SELECT lang, n_tokens, 'insert' AS ct FROM lp
      WHERE doc_id % 7 = 3 AND doc_id % 5 != 0
      UNION ALL
      SELECT lang, n_tokens, 'delete' AS ct FROM lp
      WHERE doc_id % 5 = 0 AND doc_id % 7 != 3
    )
    SELECT lang,
      CAST(SUM(CASE WHEN ct = 'insert' THEN 1 ELSE 0 END) AS BIGINT)
        AS docs_added,
      CAST(SUM(CASE WHEN ct = 'insert' THEN n_tokens ELSE 0 END)
        AS BIGINT) AS tokens_added,
      CAST(SUM(CASE WHEN ct = 'delete' THEN 1 ELSE 0 END) AS BIGINT)
        AS docs_removed,
      CAST(SUM(CASE WHEN ct = 'delete' THEN n_tokens ELSE 0 END)
        AS BIGINT) AS tokens_removed
    FROM ch
    GROUP BY lang
"""


CURATION_REGISTRY["curate_corpus_diff"] = QuerySpec(
    q_curate_corpus_diff, _corpus_diff_sql()
)


def q_curate_data_card_from_facts(spark, sf_dir):
    """The release card served from the PERSISTED facts table: the
    ingest-time projection (tokenize/score/digest) is landed once per
    fixture version; serving is the digest-level rollup only — no
    document body is read.  Oracle: identical to the inline data card
    (facts ∘ rollup ≡ one-shot card, the composition identity the
    streaming maintainer relies on)."""
    import os

    from airflow_crypto_btc_spark.streaming.card_stream import (
        data_card_from_facts_table,
    )

    zone = _card_facts_zone(spark, sf_dir)
    return data_card_from_facts_table(
        spark, os.path.join(zone, "facts")
    )


def _card_facts_zone(spark, sf_dir):
    import os

    from airflow_crypto_btc_spark.operators.curation import card_facts
    from airflow_crypto_btc_spark.plans.registry_more import (
        _landing_zone,
    )
    from airflow_crypto_btc_spark.sources.snapshot_table import append

    docs = load_table(spark, sf_dir, "documents")

    def _land(staging: str) -> None:
        append(spark, card_facts(docs), os.path.join(staging, "facts"))

    return _landing_zone(sf_dir, "documents", "card_facts", _land)


CURATION_REGISTRY["curate_data_card_from_facts"] = QuerySpec(
    q_curate_data_card_from_facts, _data_card_sql()
)


_D_ORDER = f"""
    SELECT doc_id,
      md5('epoch0:' || CAST(doc_id AS VARCHAR)) AS order_key,
      CAST(len(tokens) AS BIGINT) AS n_tokens,
      ('0x' || substr(md5('epoch0:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
        % 8 AS shard
    FROM ({_D_TOKENS})
"""


def q_curate_training_order(spark, sf_dir):
    """Reproducible global training order: deterministic (shard,
    position, order_key) per document — per-shard sorts, never a global
    one; see operators/curation.training_order."""
    from airflow_crypto_btc_spark.operators.curation import (
        training_order,
    )

    return training_order(load_table(spark, sf_dir, "documents"))


_SQL_CURATE_TRAINING_ORDER = f"""
    SELECT doc_id, shard,
      CAST(row_number() OVER (PARTITION BY shard
                              ORDER BY order_key, doc_id) AS BIGINT)
        AS position,
      order_key, n_tokens
    FROM ({_D_ORDER})
"""


def q_curate_token_budget_head(spark, sf_dir):
    """First-10000-tokens prefix of the epoch-0 training order via the
    distributed prefix-sum (per-shard totals → broadcast offsets →
    in-shard cumsum); see operators/curation.token_budget_head."""
    from airflow_crypto_btc_spark.operators.curation import (
        token_budget_head,
    )

    return token_budget_head(
        load_table(spark, sf_dir, "documents"), budget=10_000
    )


_SQL_CURATE_TOKEN_BUDGET_HEAD = f"""
    WITH o AS (
      SELECT doc_id, shard,
        CAST(row_number() OVER (PARTITION BY shard
                                ORDER BY order_key, doc_id) AS BIGINT)
          AS position,
        n_tokens
      FROM ({_D_ORDER})
    ),
    c AS (
      SELECT *,
        CAST(COALESCE(SUM(n_tokens) OVER (
          ORDER BY shard, position
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          AS BIGINT) AS global_offset
      FROM o
    )
    SELECT doc_id, shard, position, n_tokens, global_offset
    FROM c WHERE global_offset < 10000
"""


CURATION_REGISTRY["curate_training_order"] = QuerySpec(
    q_curate_training_order, _SQL_CURATE_TRAINING_ORDER
)
CURATION_REGISTRY["curate_token_budget_head"] = QuerySpec(
    q_curate_token_budget_head, _SQL_CURATE_TOKEN_BUDGET_HEAD
)


# ------------------------------------------------ temperature mixture
def q_curate_temperature_mixture(spark, sf_dir):
    """Derive the mixture plan by α-temperature sampling (mT5/XLM-R,
    α=0.3): per-language quota ∝ (token share)^0.3 over a 100-doc
    budget, apportioned by Hamilton largest remainder — Σquota == 100
    exactly; see operators/curation.temperature_mixture_plan."""
    from airflow_crypto_btc_spark.operators.curation import (
        temperature_mixture_plan,
    )

    return temperature_mixture_plan(load_table(spark, sf_dir, "documents"))


_SQL_CURATE_TEMPERATURE_MIXTURE = r"""
    WITH tl AS (
      SELECT lang,
        CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(len(list_filter(
          regexp_split_to_array(text, '[ \t\n\x0b\f\r]+'),
          t -> t <> ''))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY 1),
    tt AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS t_total FROM tl),
    wd AS (
      SELECT lang, n_docs, n_tokens,
        CAST((2 * n_tokens * 1000000 + t_total)
          // (2 * t_total) AS BIGINT) AS share_micro,
        CAST(round(pow(CAST(n_tokens AS DOUBLE)
          / CAST(t_total AS DOUBLE), 0.3) * 1000000) AS BIGINT)
          AS weight_micro
      FROM tl, tt),
    wt AS (SELECT CAST(SUM(weight_micro) AS BIGINT) AS w_total FROM wd),
    fl AS (
      SELECT wd.*,
        (100 * weight_micro) // w_total AS q_floor,
        (100 * weight_micro) % w_total AS q_rem
      FROM wd, wt),
    sp AS (SELECT CAST(100 - SUM(q_floor) AS BIGINT) AS n_spill FROM fl)
    SELECT lang, n_docs, n_tokens, share_micro, weight_micro,
      CAST(q_floor + CASE WHEN row_number() OVER
        (ORDER BY q_rem DESC, lang) <= n_spill
        THEN 1 ELSE 0 END AS BIGINT) AS quota
    FROM fl, sp
"""


CURATION_REGISTRY["curate_temperature_mixture"] = QuerySpec(
    q_curate_temperature_mixture, _SQL_CURATE_TEMPERATURE_MIXTURE
)
