"""Round-4 query entries.  This registry is merged LAST into the catalog
so late additions never reorder the driver's first-50 correctness window.

``rollup_incremental_ohlc`` proves the partial-aggregate merge algebra
(operators/incremental.py) against a full-recompute oracle: the events
table is split into a "history" half and a "delta" half, each is reduced
to mergeable OHLC state, the states are merged, and the served rollup
must equal a single aggregation over all rows — i.e.
``merge(state(x), state(y)) == state(x ∪ y)``, the property that makes
O(|delta|) maintenance sound.

``curate_near_dup_purge`` is the end-to-end dedup-purge shape a training
corpus actually ships through: MinHash-LSH pairs → connected components →
keep ONE representative per cluster, reporting how many near-dups each
survivor absorbed.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_crypto_btc_spark.operators.incremental import (
    merge_ohlc_states,
    ohlc_state,
    state_to_ohlc,
)
from airflow_crypto_btc_spark.plans.registry import QuerySpec, _SQL_DAILY
from airflow_crypto_btc_spark.plans.registry_ext import (
    _SQL_CURATE_LEAKAGE_SAFE_SPLIT,
    _SQL_DEDUP_MINHASH_LSH_PAIRS,
    _SQL_DEDUP_NEAR_CLUSTERS,
    _SQL_DEDUP_SEMANTIC_PURGE,
    _SQL_SIM_IVF_TOPK,
    _SQL_SIM_LSH_TOPK,
    _semantic_purge_sql,
    q_dedup_semantic_purge,
)
from airflow_crypto_btc_spark.plans import registry_ml as _reg_ml
from airflow_crypto_btc_spark.plans.registry_curation import (
    _SQL_TEXT_TFIDF_TOP_TERMS,
)
from airflow_crypto_btc_spark.functions.hashing import ratio_micro
from airflow_crypto_btc_spark.sources.tables import load_table


def q_rollup_incremental_ohlc(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    # any deterministic row partition works; mid-month split exercises
    # groups whose open and close land in different batches
    hist = ev.filter(F.dayofmonth("ts") <= 15)
    delta = ev.filter(F.dayofmonth("ts") > 15)
    state = merge_ohlc_states(ohlc_state(hist), ohlc_state(delta))
    return state_to_ohlc(state)


def q_curate_near_dup_purge(spark, sf_dir):
    """Survivors of near-dup purging: one representative (min doc id) per
    LSH/connected-component cluster, with the purge accounting a corpus
    pipeline reports.  Reuses the exact pair/cluster operators the
    standalone entries check, composed into one lazy plan.

    The docs ⋈ reps join is deliberately NOT broadcast (the one new
    sort-merge join in PLANS.md): survivors are O(corpus) — at 100 TB
    this is a large-large equi-join on doc_id and key-distributed
    shuffle is the correct physical plan."""
    from airflow_crypto_btc_spark.operators.dedup import (
        minhash_lsh_pairs,
        near_dup_clusters,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        docs, num_hashes=12, bands=4, jaccard_threshold=0.5
    )
    clusters = near_dup_clusters(docs, pairs)
    sizes = clusters.groupBy("cluster_id").agg(
        F.count("*").alias("cluster_size")
    )
    reps = clusters.filter(F.col("doc_id") == F.col("cluster_id"))
    return (
        docs.select("doc_id", "source")
        .join(reps.select("doc_id"), "doc_id")
        .join(
            sizes.withColumnRenamed("cluster_id", "doc_id"), "doc_id"
        )
        .select(
            "doc_id",
            "source",
            "cluster_size",
            (F.col("cluster_size") - 1).alias("n_purged"),
        )
    )


_SQL_CURATE_NEAR_DUP_PURGE = f"""
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
    ),
    clusters AS (
      SELECT id AS doc_id, min(label) AS cluster_id FROM reach GROUP BY id
    ),
    sizes AS (
      SELECT cluster_id, count(*) AS cluster_size
      FROM clusters GROUP BY cluster_id
    )
    SELECT d.doc_id, d.source, s.cluster_size,
           s.cluster_size - 1 AS n_purged
    FROM documents d
    JOIN clusters c ON c.doc_id = d.doc_id AND c.cluster_id = d.doc_id
    JOIN sizes s ON s.cluster_id = c.cluster_id
"""


def q_curate_semantic_purge(spark, sf_dir):
    """End-to-end semantic-purge shape (SemDeDup applied to a corpus):
    documents whose embeddings survive cluster-bounded semantic dedup,
    each with the purge accounting a curation pipeline reports — its
    semantic cluster and how many cluster-mates were dropped.  Reuses
    the exact ``semantic_purge`` labeling the standalone entry checks.

    The docs ⋈ survivors join is deliberately NOT broadcast: survivors
    are O(corpus), so at 100 TB this is a large-large equi-join on
    doc_id and a key-distributed shuffle is the correct physical plan
    (same rationale as ``curate_near_dup_purge``)."""
    from airflow_crypto_btc_spark.operators.similarity import (
        semantic_purge,
    )

    docs = load_table(spark, sf_dir, "documents")
    labeling = semantic_purge(
        load_table(spark, sf_dir, "embeddings"),
        centroid_filter="vec_id % 25 = 7",
        cosine_threshold=0.3,
    ).localCheckpoint(eager=False)
    # ^ two consumers (per-cluster purge counts + the survivors join):
    # without the cut the purge's pair join executes twice
    per_cluster = labeling.groupBy("cid").agg(
        F.count(F.when(~F.col("keep"), F.lit(1))).alias(
            "n_purged_in_cluster"
        )
    )
    return (
        docs.select("doc_id", "source")
        .join(
            labeling.filter("keep").select(
                F.col("vec_id").alias("doc_id"), "cid"
            ),
            "doc_id",
        )
        .join(per_cluster, "cid")
        .select("doc_id", "source", "cid", "n_purged_in_cluster")
    )


_SQL_CURATE_SEMANTIC_PURGE = f"""
    WITH labeling AS ({_SQL_DEDUP_SEMANTIC_PURGE}),
    per_cluster AS (
      SELECT cid, count(*) FILTER (WHERE NOT keep) AS n_purged_in_cluster
      FROM labeling GROUP BY cid
    )
    SELECT d.doc_id, d.source, l.cid, p.n_purged_in_cluster
    FROM documents d
    JOIN labeling l ON l.vec_id = d.doc_id AND l.keep
    JOIN per_cluster p ON p.cid = l.cid
"""


def q_dedup_semantic_delta(spark, sf_dir):
    """The SERVING shape of semantic dedup: the frozen quantizer +
    assigned corpus live in snapshot tables built ONCE per corpus
    version (landing-zone keyed by the fixture fingerprint) and the
    increment is labeled through the version-PINNED table-path front end
    — `semantic_purge_from_tables` refuses stale / mixed-generation /
    id-interleaved probes before reading any data.  Full labeling =
    labeling(old) ∪ delta-probe(Δ); the oracle is the one-shot
    full-corpus SQL under the same frozen (old-corpus) seed quantizer,
    so passing proves the persisted decomposition is exact, commit-log
    round-trip included."""
    import os

    from airflow_crypto_btc_spark.operators.similarity import (
        build_semantic_index,
        semantic_purge,
        semantic_purge_from_tables,
    )
    from airflow_crypto_btc_spark.plans.registry_more import _landing_zone

    emb = load_table(spark, sf_dir, "embeddings")
    old = emb.filter("vec_id < 400")
    stat = os.stat(os.path.join(sf_dir, "embeddings.parquet"))
    source_version = f"embeddings@{stat.st_size}_{stat.st_mtime_ns}"

    def _land(staging: str) -> None:
        build_semantic_index(
            spark,
            old,
            os.path.join(staging, "centroids"),
            os.path.join(staging, "members"),
            source_version=source_version,
            centroid_filter="vec_id % 25 = 7",
        )

    idx = _landing_zone(sf_dir, "embeddings", "semantic_index", _land)
    old_labeling = semantic_purge(
        old, centroid_filter="vec_id % 25 = 7", cosine_threshold=0.3
    )
    delta_labeling = semantic_purge_from_tables(
        spark,
        os.path.join(idx, "centroids"),
        os.path.join(idx, "members"),
        emb.filter("vec_id >= 400"),
        cosine_threshold=0.3,
        expect_source=source_version,
    )
    return old_labeling.unionByName(delta_labeling)


def q_sim_ivf_topk_from_index(spark, sf_dir):
    """IVF serving from the PERSISTED semantic index: the members table
    (one inverted list per coarse cell) is built once per fixture
    version and queries probe only their n_probe nearest stored lists —
    the online counterpart of the in-plan ``sim_ivf_topk`` entry, which
    is also its oracle: same SQL, so passing proves the persisted
    round-trip changes nothing."""
    import os

    from airflow_crypto_btc_spark.operators.similarity import (
        build_semantic_index,
        ivf_topk_from_tables,
    )
    from airflow_crypto_btc_spark.plans.registry_more import _landing_zone

    emb = load_table(spark, sf_dir, "embeddings")
    stat = os.stat(os.path.join(sf_dir, "embeddings.parquet"))
    source_version = f"embeddings@{stat.st_size}_{stat.st_mtime_ns}"

    def _land(staging: str) -> None:
        build_semantic_index(
            spark,
            emb,
            os.path.join(staging, "centroids"),
            os.path.join(staging, "members"),
            source_version=source_version,
            centroid_filter="vec_id % 25 = 7",
        )

    idx = _landing_zone(sf_dir, "embeddings", "ivf_index", _land)
    out = ivf_topk_from_tables(
        spark,
        os.path.join(idx, "centroids"),
        os.path.join(idx, "members"),
        emb.filter("vec_id < 20"),
        n_probe=4,
        k=10,
        expect_source=source_version,
    )
    return out.select(
        "qid", "nid", "cosine", F.col("rnk").cast("long").alias("rnk")
    )


def _text_models_zone(spark, sf_dir):
    """Landing-zone build of the persisted text models (IDF + unigram
    LM) — one build per fixture version, shared by both from-model
    entries.  Returns (zone_path, source_version)."""
    import os

    from airflow_crypto_btc_spark.operators.text import build_text_models
    from airflow_crypto_btc_spark.plans.registry_more import _landing_zone

    docs = load_table(spark, sf_dir, "documents")
    stat = os.stat(os.path.join(sf_dir, "documents.parquet"))
    source_version = f"documents@{stat.st_size}_{stat.st_mtime_ns}"

    def _land(staging: str) -> None:
        build_text_models(
            spark,
            docs,
            os.path.join(staging, "idf"),
            os.path.join(staging, "unigram"),
            source_version=source_version,
        )

    return (
        _landing_zone(sf_dir, "documents", "text_models", _land),
        source_version,
    )


def q_text_tfidf_from_model(spark, sf_dir):
    """TF-IDF served from the PERSISTED IDF model: the corpus statistics
    are fit once per fixture version and scoring joins the broadcast
    model — the online counterpart of the in-plan
    ``text_tfidf_top_terms`` entry, which is also its oracle: same SQL,
    so passing proves the persisted round-trip changes nothing (on the
    model's own corpus the OOV fallback never fires)."""
    import os

    from airflow_crypto_btc_spark.operators.text import (
        tfidf_top_terms_from_model,
    )

    zone, source_version = _text_models_zone(spark, sf_dir)
    return tfidf_top_terms_from_model(
        spark,
        load_table(spark, sf_dir, "documents"),
        os.path.join(zone, "idf"),
        k=3,
        expect_source=source_version,
    )


def q_text_logprob_from_model(spark, sf_dir):
    """Perplexity-proxy scoring served from the PERSISTED unigram LM —
    the online counterpart of ``text_unigram_logprob`` (same oracle:
    scoring the model's own corpus must equal the inline
    self-estimate)."""
    import os

    from airflow_crypto_btc_spark.operators.text import (
        unigram_logprob_from_model,
    )

    zone, source_version = _text_models_zone(spark, sf_dir)
    return unigram_logprob_from_model(
        spark,
        load_table(spark, sf_dir, "documents"),
        os.path.join(zone, "unigram"),
        expect_source=source_version,
    )


def q_dedup_semantic_quality(spark, sf_dir):
    """Approximation ACCOUNTING for the semantic-dedup path: the
    cluster-bounded purge's DROP DECISIONS measured against the exact
    all-pairs rule (drop every doc with ANY smaller-id neighbor at
    cosine ≥ t, cluster or not) — the cross-cluster miss rate SemDeDup's
    clustering trades away, until now documented but never measured.
    Precision is 1.0 by construction (every purge drop names a real
    ≥-threshold smaller-id neighbor — this entry value-checks that
    contract end-to-end); recall is the fraction of exact drops the
    clustering retains.  The exact baseline is all-pairs (the
    small-corpus verification shape); catalog-only accounting, not a
    headline query."""
    from airflow_crypto_btc_spark.operators.similarity import (
        _vector_kernels,
        semantic_purge,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    # unrolled codegen'd dot/norm kernels (value-identical to the HOF
    # folds — left-associated adds): the |v|²/2 pair stream is exactly
    # where interpreted-lambda dispatch dominates (r14 opt: this entry's
    # exact baseline measured 25 s of HOF evaluation at sf0.1)
    dot, nrm2, _dim = _vector_kernels(emb, "embedding")
    a = emb.select(
        F.col("vec_id").alias("ida"), F.col("embedding").alias("ea")
    ).withColumn("na", F.sqrt(nrm2("ea")))
    b = emb.select(
        F.col("vec_id").alias("idb"), F.col("embedding").alias("eb")
    ).withColumn("nb", F.sqrt(nrm2("eb")))
    cos = F.when(
        F.col("na") * F.col("nb") != 0,
        F.round(dot("ea", "eb") / (F.col("na") * F.col("nb")), 6),
    )
    # LEFT SEMI with the threshold in the join condition: "has ANY
    # smaller-id neighbor ≥ t" is an EXISTS — the nested-loop probe
    # short-circuits at the first qualifying neighbor instead of
    # materializing all |v|²/2 cosines and distinct-ing afterwards.
    # Same set by construction (emb ids are unique, so semi-out rows
    # are already distinct ida).  Each drop set still feeds two
    # consumers (its count + the intersection semi-join), so the
    # lineage is cut once per side.
    exact_drops = (
        a.join(
            b,
            (F.col("ida") > F.col("idb")) & (cos >= 0.3),
            "left_semi",
        )
        .select(F.col("ida").alias("vec_id"))
        .localCheckpoint(eager=False)
    )
    purge_drops = (
        semantic_purge(
            emb, centroid_filter="vec_id % 25 = 7", cosine_threshold=0.3
        )
        .filter(~F.col("keep"))
        .select("vec_id")
        .localCheckpoint(eager=False)
    )
    e = exact_drops.agg(F.count("*").alias("n_exact"))
    p = purge_drops.agg(F.count("*").alias("n_purge"))
    both = exact_drops.join(purge_drops, ["vec_id"], "left_semi").agg(
        F.count("*").alias("n_both")
    )
    return (
        e.crossJoin(p)
        .crossJoin(both)
        .select(
            "n_exact",
            "n_purge",
            "n_both",
            F.when(
                F.col("n_purge") > 0, ratio_micro("n_both", "n_purge")
            ).alias("precision_purge"),
            F.when(
                F.col("n_exact") > 0, ratio_micro("n_both", "n_exact")
            ).alias("recall_purge"),
        )
    )


def _semantic_quality_sql() -> str:
    from airflow_crypto_btc_spark.plans.registry_ext import _D_COS

    micro = (
        "((2 * CAST(n_both AS BIGINT) * 1000000 + CAST({d} AS BIGINT))"
        " // (2 * CAST({d} AS BIGINT)) / 1000000.0)"
    )
    return f"""
    WITH labeling AS ({_SQL_DEDUP_SEMANTIC_PURGE}),
    exact_drops AS (
      SELECT DISTINCT a.vec_id
      FROM embeddings a JOIN embeddings b ON a.vec_id > b.vec_id
      WHERE {_D_COS.format(a="a.embedding", b="b.embedding")} >= 0.3
    ),
    purge_drops AS (SELECT vec_id FROM labeling WHERE NOT keep),
    e AS (SELECT count(*) AS n_exact FROM exact_drops),
    p AS (SELECT count(*) AS n_purge FROM purge_drops),
    bd AS (SELECT count(*) AS n_both FROM (
      SELECT vec_id FROM exact_drops
      INTERSECT
      SELECT vec_id FROM purge_drops))
    SELECT n_exact, n_purge, n_both,
      CASE WHEN n_purge > 0
           THEN {micro.format(d="n_purge")} END AS precision_purge,
      CASE WHEN n_exact > 0
           THEN {micro.format(d="n_exact")} END AS recall_purge
    FROM e, p, bd
"""


def q_dedup_lsh_quality(spark, sf_dir):
    """Approximation ACCOUNTING for the LSH dedup path: banded-MinHash
    pair generation measured against the exact all-pairs n-gram Jaccard
    baseline at the same threshold — the one-row report (pair counts,
    precision, recall) an operator reads before trusting banding
    parameters on a new corpus.  Precision is 1.0 by construction
    (candidates are exact-verified on the same shingle sets — this entry
    value-checks that contract end-to-end); recall is the banding miss
    rate, the number the (num_hashes, bands) trade actually buys.  The
    exact baseline is the documented small-corpus verification operator
    — this entry is catalog-only accounting, not a headline query."""
    from airflow_crypto_btc_spark.operators.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    # each pair set feeds two consumers (its count + the intersection
    # semi-join); without the lineage cut the exact all-pairs baseline —
    # the catalog's single most expensive subplan — and the full LSH
    # pipeline BOTH execute twice (both outputs are bounded pair lists)
    exact = ngram_jaccard_pairs(docs, threshold=0.5).select(
        "id_a", "id_b"
    ).localCheckpoint(eager=False)
    lsh = minhash_lsh_pairs(
        docs, num_hashes=12, bands=4, jaccard_threshold=0.5
    ).select("id_a", "id_b").localCheckpoint(eager=False)
    e = exact.agg(F.count("*").alias("n_exact"))
    l_ = lsh.agg(F.count("*").alias("n_lsh"))
    b = exact.join(lsh, ["id_a", "id_b"], "left_semi").agg(
        F.count("*").alias("n_both")
    )
    return (
        e.crossJoin(l_)
        .crossJoin(b)
        .select(
            "n_exact",
            "n_lsh",
            "n_both",
            F.when(
                F.col("n_lsh") > 0,
                ratio_micro("n_both", "n_lsh"),
            ).alias("precision_lsh"),
            F.when(
                F.col("n_exact") > 0,
                ratio_micro("n_both", "n_exact"),
            ).alias("recall_lsh"),
        )
    )


def _lsh_quality_sql() -> str:
    from airflow_crypto_btc_spark.plans.registry_ext import (
        _SQL_DEDUP_NGRAM_JACCARD_PAIRS,
    )

    return f"""
    WITH exact_pairs AS ({_SQL_DEDUP_NGRAM_JACCARD_PAIRS}),
    lsh_pairs AS ({_SQL_DEDUP_MINHASH_LSH_PAIRS}),
    e AS (SELECT count(*) AS n_exact FROM exact_pairs),
    l AS (SELECT count(*) AS n_lsh FROM lsh_pairs),
    b AS (SELECT count(*) AS n_both FROM (
      SELECT id_a, id_b FROM exact_pairs
      INTERSECT
      SELECT id_a, id_b FROM lsh_pairs))
    SELECT n_exact, n_lsh, n_both,
      CASE WHEN n_lsh > 0
           THEN ((2 * CAST(n_both AS BIGINT) * 1000000 + CAST(n_lsh AS BIGINT)) // (2 * CAST(n_lsh AS BIGINT)) / 1000000.0) END
        AS precision_lsh,
      CASE WHEN n_exact > 0
           THEN ((2 * CAST(n_both AS BIGINT) * 1000000 + CAST(n_exact AS BIGINT)) // (2 * CAST(n_exact AS BIGINT)) / 1000000.0) END
        AS recall_lsh
    FROM e, l, b
"""


def q_dedup_near_clusters_two_star(spark, sf_dir):
    """Round-5 CC variant entry: the large-star/small-star algorithm
    (O(log n) rounds — see operators/dedup._two_star_components) must
    produce the exact min-id labeling the recursive-CTE oracle computes,
    i.e. the same answer as the label-propagation entry."""
    from airflow_crypto_btc_spark.operators.dedup import (
        minhash_lsh_pairs,
        near_dup_clusters,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        docs, num_hashes=12, bands=4, jaccard_threshold=0.5
    )
    return near_dup_clusters(docs, pairs, algorithm="two_star")


def q_dedup_lsh_pairs_capped(spark, sf_dir):
    """Round-5 skew-guard entry: LSH pairs with a bucket-size cap.  The
    oracle replays the cap in SQL (bucket census → only under-cap
    buckets join), proving the guard drops exactly the over-cap buckets
    and nothing else.  On the clean fixture a generous cap changes
    nothing; the engineered-hot-bucket behavior is pinned in
    tests/test_dedup.py."""
    from airflow_crypto_btc_spark.operators.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(
        load_table(spark, sf_dir, "documents"),
        num_hashes=12,
        bands=4,
        jaccard_threshold=0.5,
        max_bucket_size=50,
    )


def _capped_pairs_sql(cap: int = 50) -> str:
    from airflow_crypto_btc_spark.plans.registry_ext import lsh_pairs_sql

    return lsh_pairs_sql(max_bucket_size=cap)


def q_dedup_incremental_pairs(spark, sf_dir):
    """Incremental corpus dedup: documents split into a 90% "existing"
    corpus and a 10% "daily increment"; the full near-dup pair set is
    reproduced as  pairs(old) ∪ pairs_incremental(corpus, delta)  — the
    identity that lets a 100 TB corpus dedup each increment against a
    persisted band index instead of re-pairing everything.  The oracle
    is the ONE-SHOT full-corpus LSH pair query: passing proves the
    decomposition is exact."""
    from airflow_crypto_btc_spark.operators.dedup import (
        minhash_lsh_pairs,
        minhash_lsh_pairs_incremental,
    )

    docs = load_table(spark, sf_dir, "documents")
    old_pairs = minhash_lsh_pairs(
        docs.filter("doc_id % 10 != 0"),
        num_hashes=12, bands=4, jaccard_threshold=0.5,
    )
    delta_pairs = minhash_lsh_pairs_incremental(
        docs, "doc_id % 10 = 0",
        num_hashes=12, bands=4, jaccard_threshold=0.5,
    )
    # the two terms are disjoint by construction (old-old vs >=1-new);
    # union keeps the plan append-shaped, no dedup shuffle needed
    return old_pairs.unionByName(delta_pairs)


def q_dedup_pairs_from_persisted_index(spark, sf_dir):
    """The SERVING shape of incremental dedup: the LSH index (shingle
    sets + band keys) lives in a pair of snapshot tables built ONCE per
    corpus version (landing-zone keyed by the fixture fingerprint) and
    each increment probes it through the version-PINNED table-path front
    end — `minhash_lsh_pairs_from_index_tables` refuses a stale or
    mixed-version index before reading any data.  Full pair set =
    pairs(old) ∪ index-probe(delta); the oracle is the one-shot
    full-corpus SQL, so passing proves the persisted decomposition is
    exact, commit-log round-trip included."""
    import os

    from airflow_crypto_btc_spark.operators.dedup import (
        build_minhash_index,
        minhash_band_rows,
        minhash_lsh_pairs,
        minhash_lsh_pairs_from_index_tables,
    )
    from airflow_crypto_btc_spark.plans.registry_more import _landing_zone

    docs = load_table(spark, sf_dir, "documents")
    stat = os.stat(os.path.join(sf_dir, "documents.parquet"))
    source_version = f"documents@{stat.st_size}_{stat.st_mtime_ns}"

    def _land(staging: str) -> None:
        build_minhash_index(
            spark,
            docs,
            os.path.join(staging, "sets"),
            os.path.join(staging, "bands"),
            source_version=source_version,
        )

    idx = _landing_zone(sf_dir, "documents", "lsh_index", _land)
    old_pairs = minhash_lsh_pairs(
        docs.filter("doc_id % 10 != 0"),
        num_hashes=12, bands=4, jaccard_threshold=0.5,
    )
    delta = docs.filter("doc_id % 10 = 0")
    delta_pairs = minhash_lsh_pairs_from_index_tables(
        spark,
        os.path.join(idx, "sets"),
        os.path.join(idx, "bands"),
        delta.selectExpr("doc_id AS id"),
        jaccard_threshold=0.5,
        expect_source=source_version,
        # |delta|-sized recompute of the delta's band rows: enables
        # file-level bucket pruning on a bkn-clustered bands table
        delta_banded=minhash_band_rows(delta, num_hashes=12, bands=4),
    )
    return old_pairs.unionByName(delta_pairs)


def q_text_scrub_pii(spark, sf_dir):
    """PII redaction over the corpus (operators/text.scrub_pii): typed
    placeholder masking with per-rule audit counts, pure per-row JVM
    regex fused into the document scan.  The fixture corpus contains no
    PII, so this entry value-checks the no-op path end-to-end
    (clean_text byte-equal to text, all counts 0); the rule chain is
    additionally replayed against DuckDB on REAL matches in
    tests/test_text.py — patterns live in the Java-regex ∩ RE2 common
    subset, so both checks are byte-exact."""
    from airflow_crypto_btc_spark.operators.text import scrub_pii

    return scrub_pii(load_table(spark, sf_dir, "documents"))


def _scrub_pii_sql() -> str:
    from airflow_crypto_btc_spark.operators.text import PII_RULES

    counts, prev = [], "text"
    names = {"<EMAIL>": "n_emails", "<PHONE>": "n_phones",
             "<IP>": "n_ips", "<ID>": "n_ids"}
    for ph, pat in PII_RULES:
        counts.append(
            f"CAST(len(regexp_extract_all({prev}, '{pat}')) AS BIGINT) "
            f"AS {names[ph]}"
        )
        prev = f"regexp_replace({prev}, '{pat}', '{ph}', 'g')"
    return (
        f"SELECT doc_id, {prev} AS clean_text, {', '.join(counts)} "
        "FROM documents"
    )


def q_text_strip_markup(spark, sf_dir):
    """Markup stripping over the corpus (operators/text.strip_markup):
    tag removal, entity decode (amp last), whitespace collapse — same
    fuse-into-the-scan shape as the PII pass, oracle-replayed on the
    full fixture (whitespace collapse DOES fire on it, so this entry
    value-checks real rewrites, not a no-op)."""
    from airflow_crypto_btc_spark.operators.text import strip_markup

    return strip_markup(load_table(spark, sf_dir, "documents"))


_SQL_TEXT_STRIP_MARKUP = r"""
    SELECT doc_id,
      trim(regexp_replace(
        replace(replace(replace(replace(
          regexp_replace(text, '<[^>]*>', '', 'g'),
          '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&amp;', '&'),
        '[ \t\n\r\f]+', ' ', 'g')) AS clean_text,
      CAST(len(text) - len(trim(regexp_replace(
        replace(replace(replace(replace(
          regexp_replace(text, '<[^>]*>', '', 'g'),
          '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&amp;', '&'),
        '[ \t\n\r\f]+', ' ', 'g'))) AS BIGINT) AS n_removed
    FROM documents
"""


def q_sim_lsh_topk_from_index(spark, sf_dir):
    """ANN serving from a PERSISTED hyperplane index
    (operators/similarity.build_ann_index → lsh_topk_from_index): the
    corpus is hashed/normed once per fixture version into a snapshot
    table, and queries probe the stored buckets with version pinning —
    the online counterpart of the in-plan ``sim_lsh_topk`` entry, which
    is also its oracle: same SQL, so passing proves the persisted
    round-trip changes nothing."""
    import os

    from airflow_crypto_btc_spark.operators.similarity import (
        build_ann_index,
        lsh_topk_from_index,
    )
    from airflow_crypto_btc_spark.plans.registry_more import _landing_zone

    emb = load_table(spark, sf_dir, "embeddings")
    stat = os.stat(os.path.join(sf_dir, "embeddings.parquet"))
    source_version = f"embeddings@{stat.st_size}_{stat.st_mtime_ns}"

    def _land(staging: str) -> None:
        build_ann_index(
            spark, emb, os.path.join(staging, "ann"),
            source_version=source_version, planes=4,
        )

    idx = _landing_zone(sf_dir, "embeddings", "ann_index", _land)
    out = lsh_topk_from_index(
        spark,
        os.path.join(idx, "ann"),
        emb.filter("vec_id < 20"),
        planes=4,
        k=10,
        max_hamming=1,
        expect_source=source_version,
    )
    return out.select(
        "qid", "nid", "cosine", F.col("rnk").cast("long").alias("rnk")
    )


def q_dedup_novel_documents(spark, sf_dir):
    """Bloom-pruned cross-corpus novelty (operators/bloom): which
    incoming documents has the 90% "historical" corpus never seen?
    The bloom pre-filter is perf-only — rows it clears skip the exact
    anti-join, but the OUTPUT is exact, so the oracle is the plain
    anti-join on the normalized content digest.  The entry drops the
    per-row ``is_bloom_certain`` observability flag (it depends on the
    filter's false-positive coin flips, not on the data contract);
    tests/test_bloom.py pins the flag's no-false-negative and pruning
    properties."""
    from airflow_crypto_btc_spark.operators.bloom import novel_documents

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter("doc_id % 10 != 0")
    return novel_documents(corpus, docs).selectExpr("id AS doc_id")


_SQL_DEDUP_NOVEL_DOCUMENTS = r"""
    WITH nd AS (
      SELECT doc_id,
        md5(lower(trim(regexp_replace(text, '[ \t\n\x0b\f\r]+', ' ', 'g')))) AS d
      FROM documents
    ),
    corpus AS (
      SELECT DISTINCT d FROM nd WHERE doc_id % 10 != 0
    )
    SELECT i.doc_id FROM nd i
    WHERE NOT EXISTS (SELECT 1 FROM corpus c WHERE c.d = i.d)
"""


def q_dedup_novel_sharded(spark, sf_dir):
    """Novelty served from PERSISTED, key-space-SHARDED bloom state
    (operators/bloom.build_sharded_digest_bloom →
    novel_documents_sharded): per-shard bitmaps live as snapshot-table
    rows and each incoming row co-groups with only its shard's bitmap —
    the beyond-driver-scale layout where no process ever holds the full
    filter.  The bloom remains perf-only state, so the oracle is the
    SAME exact anti-join as dedup_novel_documents: passing proves the
    sharded round-trip (build → store → per-shard probe → exact verify)
    changes nothing about the answer.  The state lands once per fixture
    fingerprint (landing zone) — the offline-build/online-probe split."""
    import os

    from airflow_crypto_btc_spark.operators.bloom import (
        build_sharded_digest_bloom,
        novel_documents_sharded,
    )
    from airflow_crypto_btc_spark.plans.registry_more import _landing_zone

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter("doc_id % 10 != 0")
    stat = os.stat(os.path.join(sf_dir, "documents.parquet"))
    source_version = f"documents@{stat.st_size}_{stat.st_mtime_ns}"

    def _land(staging: str) -> None:
        build_sharded_digest_bloom(
            spark, corpus, staging, shards=16,
            n_bits_per_shard=1 << 16, source_version=source_version,
        )

    table = _landing_zone(sf_dir, "documents", "sharded_bloom", _land)
    return novel_documents_sharded(
        spark, table, corpus, docs, expect_source=source_version
    ).selectExpr("id AS doc_id")


def q_sim_pq_topk_from_codes(spark, sf_dir):
    """PQ serving from the FULLY persisted index (codebooks AND codes —
    operators/similarity.pq_save_index → pq_topk_from_index): queries
    scan only the m-byte codes table plus a shortlist rerank; the float
    corpus is never re-encoded.  Oracle = the same full-replay SQL as
    sim_pq_topk, so passing proves the persisted round-trip (train →
    encode → store → serve) is bit-identical to the fresh pipeline."""
    import os

    from airflow_crypto_btc_spark.operators.similarity import (
        pq_save_index,
        pq_topk_from_index,
    )
    from airflow_crypto_btc_spark.plans.registry_more import _landing_zone

    emb = load_table(spark, sf_dir, "embeddings")
    stat = os.stat(os.path.join(sf_dir, "embeddings.parquet"))
    source_version = f"embeddings@{stat.st_size}_{stat.st_mtime_ns}"

    def _land(staging: str) -> None:
        from airflow_crypto_btc_spark.sources.tables import (
            parquet_row_count,
        )

        pq_save_index(
            spark, emb, staging, source_version=source_version, m=8,
            corpus_rows=parquet_row_count(
                os.path.join(sf_dir, "embeddings.parquet")
            ),
        )

    root = _landing_zone(sf_dir, "embeddings", "pq_index", _land)
    out = pq_topk_from_index(
        spark, root, emb, expect_source=source_version
    )
    return out.withColumn("rnk", F.col("rnk").cast("long"))


def q_text_unigram_logprob(spark, sf_dir):
    """Perplexity-proxy scoring (operators/text.unigram_logprob_score):
    corpus-estimated add-one unigram LM, per-doc mean token log
    probability — the cheap model-quality gate a curation pipeline runs
    before GPU-based filtering.  Fully oracle-replayed (per-token log P
    rounded to 6 dp, decimal-cast mean)."""
    from airflow_crypto_btc_spark.operators.text import (
        unigram_logprob_score,
    )

    return unigram_logprob_score(load_table(spark, sf_dir, "documents"))


_SQL_TEXT_UNIGRAM_LOGPROB = r"""
    WITH toks AS (
      SELECT doc_id,
        unnest(list_filter(regexp_split_to_array(text, '[ \t\n\x0b\f\r]+'),
                           t -> t <> '')) AS token
      FROM documents
    ),
    vocab AS (SELECT token, count(*) AS c FROM toks GROUP BY token),
    totals AS (
      SELECT sum(c) AS n_total, count(*) AS n_vocab FROM vocab
    ),
    scored AS (
      SELECT t.doc_id,
        round(ln(CAST(v.c + 1 AS DOUBLE)
                 / CAST(tt.n_total + tt.n_vocab AS DOUBLE)), 6) AS lp
      FROM toks t JOIN vocab v USING (token) CROSS JOIN totals tt
    ),
    sums AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        SUM(CAST(round(lp * 1000000) AS BIGINT)) AS s6,
        count(*) AS n
      FROM scored GROUP BY doc_id
    ),
    agg AS (
      SELECT doc_id, n_tokens,
        (CASE WHEN s6 < 0 THEN -((2 * (-s6) + n) // (2 * n))
              ELSE (2 * s6 + n) // (2 * n) END) / 1000000.0
          AS mean_logprob
      FROM sums
    )
    SELECT d.doc_id,
      coalesce(a.n_tokens, 0) AS n_tokens,
      a.mean_logprob
    FROM documents d LEFT JOIN agg a USING (doc_id)
"""


def q_curate_ppl_buckets(spark, sf_dir):
    """CCNet-style perplexity bucketing
    (operators/curation.perplexity_buckets): the corpus split into
    head/middle/tail thirds by LM score, reported per bucket — the
    classic quality-stratification step before mixing training data.
    The engine computes the exact global ntile WITHOUT a global sort
    (value-band rank decomposition — see the operator docstring); the
    oracle replays it as a plain ntile window, so the decomposition's
    equivalence is value-checked at every scale factor."""
    from airflow_crypto_btc_spark.operators.curation import (
        perplexity_buckets,
    )

    per_doc = perplexity_buckets(load_table(spark, sf_dir, "documents"))
    return per_doc.groupBy("bucket").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("bucket_tokens"),
        F.min("mean_logprob").alias("lp_min"),
        F.max("mean_logprob").alias("lp_max"),
    )


_SQL_CURATE_PPL_BUCKETS = f"""
    WITH lp AS ({_SQL_TEXT_UNIGRAM_LOGPROB}),
    scored AS (
      SELECT doc_id, n_tokens, mean_logprob FROM lp WHERE n_tokens > 0
    ),
    b AS (
      SELECT doc_id, n_tokens, mean_logprob,
        CAST(ntile(3) OVER (ORDER BY mean_logprob DESC, doc_id)
          AS BIGINT) AS bucket
      FROM scored
    )
    SELECT bucket,
      CAST(count(*) AS BIGINT) AS n_docs,
      CAST(sum(n_tokens) AS BIGINT) AS bucket_tokens,
      min(mean_logprob) AS lp_min,
      max(mean_logprob) AS lp_max
    FROM b GROUP BY bucket
"""


def q_curate_ppl_gate_from_model(spark, sf_dir):
    """The SERVE half of the CCNet split: arrivals score against the
    PERSISTED unigram LM and classify against PERSISTED tercile cutoffs
    (the boundary scores of the reference split, landing-zoned per
    fixture with the source version pinned in the commit meta) — one
    comparison per row, no ranking, no window, so the gate runs at scan
    cost however large the arrival stream.  Boundary ties go to the
    better bucket (threshold semantics), unlike the equal-count build —
    the standard frozen-percentile asymmetry, replayed by the oracle."""
    import os

    from airflow_crypto_btc_spark.operators.curation import (
        perplexity_buckets,
        ppl_cutoffs,
        ppl_gate_from_cutoffs,
    )
    from airflow_crypto_btc_spark.operators.text import (
        unigram_logprob_from_model,
    )
    from airflow_crypto_btc_spark.plans.registry_more import _landing_zone
    from airflow_crypto_btc_spark.sources.snapshot_table import (
        append as snap_append,
        current_snapshot,
        read_snapshot,
    )

    zone, source_version = _text_models_zone(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")

    def _land(staging: str) -> None:
        snap_append(
            spark,
            ppl_cutoffs(perplexity_buckets(docs)),
            os.path.join(staging, "cutoffs"),
            meta={"source_version": source_version, "n_buckets": 3},
        )

    path = _landing_zone(sf_dir, "documents", "ppl_cutoffs", _land)
    cuts_table = os.path.join(path, "cutoffs")
    meta = current_snapshot(cuts_table).meta
    if meta.get("source_version") != source_version:
        raise ValueError(
            f"stale perplexity cutoffs: built from "
            f"{meta.get('source_version')!r}, gate expects "
            f"{source_version!r} — rebuild before gating"
        )
    cuts = read_snapshot(spark, cuts_table).collect()[0]  # one row
    scored = unigram_logprob_from_model(
        spark, docs, os.path.join(zone, "unigram"),
        expect_source=source_version,
    )
    return ppl_gate_from_cutoffs(
        scored, cuts["cut_head"], cuts["cut_middle"]
    )


_SQL_CURATE_PPL_GATE = f"""
    WITH lp AS ({_SQL_TEXT_UNIGRAM_LOGPROB}),
    scored AS (
      SELECT doc_id, n_tokens, mean_logprob FROM lp WHERE n_tokens > 0
    ),
    b AS (
      SELECT mean_logprob,
        CAST(ntile(3) OVER (ORDER BY mean_logprob DESC, doc_id)
          AS BIGINT) AS bucket
      FROM scored
    ),
    cuts AS (
      SELECT
        min(CASE WHEN bucket = 1 THEN mean_logprob END) AS cut_head,
        min(CASE WHEN bucket = 2 THEN mean_logprob END) AS cut_middle
      FROM b
    )
    SELECT s.doc_id, s.n_tokens, s.mean_logprob,
      CAST(CASE WHEN s.mean_logprob >= c.cut_head THEN 1
                WHEN s.mean_logprob >= c.cut_middle THEN 2
                ELSE 3 END AS BIGINT) AS bucket
    FROM scored s, cuts c
"""


def q_curate_ingest_pipeline(spark, sf_dir):
    """The WHOLE corpus-ingest pipeline as ONE lazy plan — the fused
    form a training-data user actually runs: language/quality gate →
    exact-dedup representative selection → near-dup purge (LSH pairs +
    connected components, Arrow kernel) → token-budget sequence packing
    of the survivors.  Each stage is an already-oracle-checked operator;
    this entry proves the COMPOSITION end-to-end against one DuckDB
    replay (recursive-CTE components included).

    Scale shape: the gates fuse into the document scan (per-row
    expressions), exact dedup is one digest groupBy, the near-dup stage
    is the banded pair path over only the gate's survivors, and packing
    is one hash-shard window — no stage widens beyond the previous
    stage's output."""
    from airflow_crypto_btc_spark.operators.curation import pack_sequences
    from airflow_crypto_btc_spark.operators.dedup import (
        exact_dedup,
        minhash_lsh_pairs,
        near_dup_clusters,
    )
    from airflow_crypto_btc_spark.operators.text import (
        lang_id,
        quality_score,
    )

    docs = load_table(spark, sf_dir, "documents")
    lang = lang_id(docs).select("doc_id", "lang_pred")
    qual = quality_score(docs).select("doc_id", "quality")
    reps = exact_dedup(docs).select(F.col("rep_id").alias("doc_id"))
    kept = (
        docs.select("doc_id", "text")
        .join(lang, "doc_id")
        .join(qual, "doc_id")
        .join(reps, "doc_id")
        .filter((F.col("lang_pred") == "en") & (F.col("quality") >= 0.5))
        .select("doc_id", "text")
        .localCheckpoint(eager=False)
    )  # three consumers (LSH prep, cluster spine, survivors join):
    # without the cut the gate's lang/quality/dedup joins execute 3×
    pairs = minhash_lsh_pairs(
        kept, num_hashes=12, bands=4, jaccard_threshold=0.5
    )
    clusters = near_dup_clusters(kept, pairs)
    survivors = kept.join(
        clusters.filter(F.col("doc_id") == F.col("cluster_id")).select(
            "doc_id"
        ),
        "doc_id",
    )
    return pack_sequences(survivors)


def _ingest_pipeline_sql() -> str:
    from airflow_crypto_btc_spark.plans.registry_ext import (
        _SQL_DEDUP_EXACT,
        _SQL_TEXT_LANG_ID,
        _SQL_TEXT_QUALITY_SCORE,
        lsh_pairs_sql,
        tokens_sql,
    )

    return f"""
    WITH RECURSIVE lang AS ({_SQL_TEXT_LANG_ID}),
    qual AS ({_SQL_TEXT_QUALITY_SCORE}),
    reps AS ({_SQL_DEDUP_EXACT}),
    kept AS (
      SELECT d.doc_id, d.text
      FROM documents d
      JOIN lang USING (doc_id)
      JOIN qual USING (doc_id)
      JOIN reps ON reps.rep_id = d.doc_id
      WHERE lang.lang_pred = 'en' AND qual.quality >= 0.5
    ),
    verified AS ({lsh_pairs_sql("kept")}),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM verified
      UNION ALL
      SELECT id_b AS src, id_a AS dst FROM verified
    ),
    reach(id, label) AS (
      SELECT doc_id, doc_id FROM kept
      UNION
      SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.id
    ),
    clusters AS (
      SELECT id AS doc_id, min(label) AS cluster_id FROM reach GROUP BY id
    ),
    survivors AS (
      SELECT k.doc_id, k.text FROM kept k
      JOIN clusters c ON c.doc_id = k.doc_id AND c.cluster_id = k.doc_id
    ),
    stoks AS ({tokens_sql("survivors")}),
    n AS (
      SELECT doc_id,
        ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 8
          AS shard,
        len(tokens) AS n_tokens
      FROM stoks
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


def q_src_jsonl_documents(spark, sf_dir):
    """JSONL ingestion round-trip — the de-facto landing format for
    training corpora: the documents table is written as JSON-lines
    through Spark's executor-side json writer, then read back with an
    EXPLICIT schema (schema inference is a full extra pass over 100 TB
    of text — never pay it) and filtered.  Passing the oracle (which
    reads the original parquet) proves the JSONL round-trip is lossless
    for the corpus columns, unicode text included.

    The landing zone is written at most once per FIXTURE VERSION: the
    cache path is keyed by the source parquet's identity fingerprint
    (so regenerated fixtures never serve a stale copy) and the write
    lands in a staging dir atomically renamed into place (so concurrent
    sessions race safely — first rename wins, losers discard).
    Plan-only consumers (plan audits, repeated test runs) never
    re-write the corpus or accumulate temp copies."""
    from airflow_crypto_btc_spark.plans.registry_more import (
        _landing_zone,
    )

    path = _landing_zone(
        sf_dir, "documents", "jsonl",
        lambda staging: load_table(spark, sf_dir, "documents")
        .write.mode("overwrite").json(staging),
    )
    return (
        spark.read.schema(
            "doc_id long, text string, lang string, "
            "source string, n_chars long"
        )
        .json(path)
        .filter(F.col("lang") == "en")
        .select("doc_id", "text", "lang", "source", "n_chars")
    )


_SQL_SRC_JSONL_DOCUMENTS = """
    SELECT doc_id, text, lang, source, n_chars
    FROM documents WHERE lang = 'en'
"""


def q_src_orc_documents(spark, sf_dir):
    """ORC ingestion round-trip — the other JVM-native columnar format a
    reference user's warehouse may already hold (Spark ships the reader;
    no package install).  Same landing-zone discipline as the JSONL
    twin: written at most once per fixture version, read back with the
    table's own schema (ORC carries it — no inference pass), pushed
    filter.  Passing the parquet-backed oracle proves the ORC round-trip
    is lossless for the corpus columns."""
    from airflow_crypto_btc_spark.plans.registry_more import (
        _landing_zone,
    )

    path = _landing_zone(
        sf_dir, "documents", "orc",
        lambda staging: load_table(spark, sf_dir, "documents")
        .write.mode("overwrite").orc(staging),
    )
    return (
        spark.read.orc(path)
        .filter(F.col("lang") == "en")
        .select("doc_id", "text", "lang", "source", "n_chars")
    )


INCREMENTAL_REGISTRY: dict[str, QuerySpec] = {
    # oracle is the FULL recompute — passing means the incremental merge
    # reproduces it exactly
    "rollup_incremental_ohlc": QuerySpec(
        q_rollup_incremental_ohlc, _SQL_DAILY
    ),
    "curate_near_dup_purge": QuerySpec(
        q_curate_near_dup_purge, _SQL_CURATE_NEAR_DUP_PURGE
    ),
    # same oracle as dedup_near_clusters: the two CC algorithms are
    # contract-equal (min-id labeling), so the recursive CTE checks both
    "dedup_near_clusters_two_star": QuerySpec(
        q_dedup_near_clusters_two_star, _SQL_DEDUP_NEAR_CLUSTERS
    ),
    "dedup_lsh_pairs_capped": QuerySpec(
        q_dedup_lsh_pairs_capped, _capped_pairs_sql()
    ),
    "src_jsonl_documents": QuerySpec(
        q_src_jsonl_documents, _SQL_SRC_JSONL_DOCUMENTS
    ),
    # same oracle: the ORC round-trip must be equally lossless
    "src_orc_documents": QuerySpec(
        q_src_orc_documents, _SQL_SRC_JSONL_DOCUMENTS
    ),
    # oracle = the one-shot full-corpus pair query: incremental
    # decomposition must reproduce it exactly (holds because both runs
    # are uncapped — see minhash_lsh_pairs_incremental's docstring for
    # why a bucket cap breaks the identity)
    "dedup_incremental_pairs": QuerySpec(
        q_dedup_incremental_pairs, _SQL_DEDUP_MINHASH_LSH_PAIRS
    ),
    # same oracle again: the PERSISTED (snapshot-table, version-pinned)
    # index probe must also reproduce the one-shot pair set exactly
    "dedup_pairs_from_persisted_index": QuerySpec(
        q_dedup_pairs_from_persisted_index, _SQL_DEDUP_MINHASH_LSH_PAIRS
    ),
    "curate_ingest_pipeline": QuerySpec(
        q_curate_ingest_pipeline, _ingest_pipeline_sql()
    ),
    "text_scrub_pii": QuerySpec(q_text_scrub_pii, _scrub_pii_sql()),
    # oracle = the in-plan sim_lsh_topk SQL: serving from the persisted
    # index must reproduce the one-shot computation exactly
    "sim_lsh_topk_from_index": QuerySpec(
        q_sim_lsh_topk_from_index, _SQL_SIM_LSH_TOPK
    ),
    "text_strip_markup": QuerySpec(
        q_text_strip_markup, _SQL_TEXT_STRIP_MARKUP
    ),
    "text_unigram_logprob": QuerySpec(
        q_text_unigram_logprob, _SQL_TEXT_UNIGRAM_LOGPROB
    ),
    # CCNet head/middle/tail stratification: exact global ntile via the
    # value-band rank decomposition (no global sort), ntile-replayed
    "curate_ppl_buckets": QuerySpec(
        q_curate_ppl_buckets, _SQL_CURATE_PPL_BUCKETS
    ),
    # ...and its serve half: frozen LM + frozen cutoffs, one comparison
    # per arrival — no ranking at scan time
    "curate_ppl_gate_from_model": QuerySpec(
        q_curate_ppl_gate_from_model, _SQL_CURATE_PPL_GATE
    ),
    "dedup_novel_documents": QuerySpec(
        q_dedup_novel_documents, _SQL_DEDUP_NOVEL_DOCUMENTS
    ),
    # same oracle: the sharded persisted bloom is perf-only state — the
    # per-shard probe must reproduce the exact anti-join verbatim
    "dedup_novel_sharded": QuerySpec(
        q_dedup_novel_sharded, _SQL_DEDUP_NOVEL_DOCUMENTS
    ),
    # oracle = the same full PQ replay as sim_pq_topk: the persisted
    # train→encode→store→serve round-trip must be bit-identical
    "sim_pq_topk_from_codes": QuerySpec(
        q_sim_pq_topk_from_codes, _reg_ml._pq_topk_sql()
    ),
    # SemDeDup-shaped cluster-bounded embedding dedup (function + SQL in
    # registry_ext; registered here so the first-50 window stays stable)
    "dedup_semantic_purge": QuerySpec(
        q_dedup_semantic_purge, _SQL_DEDUP_SEMANTIC_PURGE
    ),
    "curate_semantic_purge": QuerySpec(
        q_curate_semantic_purge, _SQL_CURATE_SEMANTIC_PURGE
    ),
    # oracle = the one-shot full-corpus labeling under the frozen
    # old-corpus quantizer: the persisted old ∪ delta decomposition must
    # reproduce it exactly
    "dedup_semantic_delta": QuerySpec(
        q_dedup_semantic_delta,
        _semantic_purge_sql("vec_id % 25 = 7 AND vec_id < 400"),
    ),
    # oracle = the in-plan sim_ivf_topk SQL: serving from the persisted
    # inverted lists must reproduce the one-shot computation exactly
    "sim_ivf_topk_from_index": QuerySpec(
        q_sim_ivf_topk_from_index, _SQL_SIM_IVF_TOPK
    ),
    # oracles = the inline self-estimate entries' SQL: scoring the
    # model's own corpus from the persisted artifact must be identical
    "text_tfidf_from_model": QuerySpec(
        q_text_tfidf_from_model, _SQL_TEXT_TFIDF_TOP_TERMS
    ),
    "text_logprob_from_model": QuerySpec(
        q_text_logprob_from_model, _SQL_TEXT_UNIGRAM_LOGPROB
    ),
    # approximation accounting: banded LSH vs the exact-Jaccard baseline
    "dedup_semantic_quality": QuerySpec(
        q_dedup_semantic_quality, _semantic_quality_sql()
    ),
    "dedup_lsh_quality": QuerySpec(
        q_dedup_lsh_quality, _lsh_quality_sql()
    ),
}

# Multimodal block-hash family — defined beside the other mm_* entries in
# registry_ext.py, registered here so the driver's first-50 window keeps
# its established membership (see catalog.py ordering note).
from airflow_crypto_btc_spark.plans.registry_ext import (  # noqa: E402
    _SQL_MM_BLOCK_HASH,
    _SQL_MM_BLOCK_HASH_NEAR_DUP,
    q_mm_block_hash,
    q_mm_block_hash_near_dup,
)

INCREMENTAL_REGISTRY.update(
    {
        "mm_block_hash": QuerySpec(q_mm_block_hash, _SQL_MM_BLOCK_HASH),
        "mm_block_hash_near_dup": QuerySpec(
            q_mm_block_hash_near_dup, _SQL_MM_BLOCK_HASH_NEAR_DUP
        ),
    }
)


# ----------------------------------------------------- skew-machinery proofs
#
# operators/physical.salted_aggregate / salted_join were equivalence-
# tested only (tests/test_physical.py); these entries additionally pin
# each against the DuckDB oracle: the salted plan must produce the PLAIN
# plan's answer bit-for-bit — salting is a physical rewrite, never a
# semantic one.  Decimal-cast sums make the double addition
# order-insensitive across shard counts and engines.


def q_phys_salted_aggregate(spark, sf_dir):
    """Two-phase skew-safe groupBy over events (salt=16): a hot
    event_type fans out over 16 reducers in phase 1; phase 2 re-combines
    the decomposed partials.  Answer == plain groupBy, oracle-pinned."""
    from airflow_crypto_btc_spark.operators.physical import (
        salted_aggregate,
    )
    from airflow_crypto_btc_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").withColumn(
        "value_dec", F.col("value").cast("decimal(38,6)")
    )
    out = salted_aggregate(
        ev,
        ["event_type"],
        [
            ("value_dec", "sum", "sum_value"),
            ("event_id", "count", "n_events"),
            ("value_dec", "max", "max_value"),
        ],
        salt=16,
    )
    return out.select(
        "event_type",
        F.col("sum_value").cast("double").alias("sum_value"),
        F.col("n_events").cast("long").alias("n_events"),
        F.col("max_value").cast("double").alias("max_value"),
    )


_SQL_PHYS_SALTED_AGGREGATE = """
    SELECT event_type,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value,
           CAST(COUNT(event_id) AS BIGINT) AS n_events,
           CAST(MAX(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS max_value
    FROM events GROUP BY event_type
"""


def q_phys_salted_join(spark, sf_dir):
    """Skew-proof equi-join (salt=8): events joined to a 5-row type dim
    with the small side replicated per shard and the big side scattered
    by a deterministic row hash.  Aggregated per (type, tier) so the
    result is compact; answer == the plain join, oracle-pinned."""
    from airflow_crypto_btc_spark.operators.physical import salted_join
    from airflow_crypto_btc_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    dim = spark.createDataFrame(
        [
            ("click", "engage"),
            ("view", "engage"),
            ("purchase", "revenue"),
            ("signup", "growth"),
            ("error", "ops"),
        ],
        "event_type string, tier string",
    )
    joined = salted_join(ev, dim, key="event_type", salt=8)
    return (
        joined.groupBy("event_type", "tier")
        .agg(
            F.count("event_id").cast("long").alias("n_events"),
            F.sum(F.col("value").cast("decimal(38,6)"))
            .cast("double")
            .alias("sum_value"),
        )
    )


_SQL_PHYS_SALTED_JOIN = """
    WITH dim(event_type, tier) AS (VALUES
      ('click', 'engage'), ('view', 'engage'), ('purchase', 'revenue'),
      ('signup', 'growth'), ('error', 'ops'))
    SELECT e.event_type, d.tier,
           CAST(COUNT(e.event_id) AS BIGINT) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
    FROM events e JOIN dim d USING (event_type)
    GROUP BY e.event_type, d.tier
"""


INCREMENTAL_REGISTRY.update(
    {
        "phys_salted_aggregate": QuerySpec(
            q_phys_salted_aggregate, _SQL_PHYS_SALTED_AGGREGATE
        ),
        "phys_salted_join": QuerySpec(
            q_phys_salted_join, _SQL_PHYS_SALTED_JOIN
        ),
    }
)

# Balanced output sharding — defined beside the other curation entries in
# registry_curation.py, registered here so the driver's first-50 window
# keeps its established membership (see catalog.py ordering note).
from airflow_crypto_btc_spark.plans.registry_curation import (  # noqa: E402
    _SQL_CURATE_BALANCED_SHARDS,
    _SQL_CURATE_SHARD_SUMMARY,
    q_curate_balanced_shards,
    q_curate_shard_summary,
)

INCREMENTAL_REGISTRY.update(
    {
        "curate_balanced_shards": QuerySpec(
            q_curate_balanced_shards, _SQL_CURATE_BALANCED_SHARDS
        ),
        "curate_shard_summary": QuerySpec(
            q_curate_shard_summary, _SQL_CURATE_SHARD_SUMMARY
        ),
    }
)

# Quality-aware canonical selection — the composition a production purge
# actually runs: survivors are the HIGHEST-QUALITY member of each
# near-dup cluster, not the smallest id (min-id is an arbitrary tie-break
# that systematically keeps whatever crawled first; quality-aware
# selection keeps the cleanest rendition of the duplicated content).


def q_curate_best_rep_purge(spark, sf_dir):
    """Near-dup purge with quality-aware representative selection: LSH
    pairs → connected components → per-cluster argmax of the quality
    score (id tie-break), reporting cluster size, purge count, the
    winner's quality, and whether quality-selection disagreed with the
    min-id rule (``rep_shifted``).  One partial-aggregatable
    ``max_by(struct(quality, -doc_id))`` per cluster — the reduction
    shuffles one row per member, never materializing a per-cluster
    sort."""
    from airflow_crypto_btc_spark.operators.dedup import (
        minhash_lsh_pairs,
        near_dup_clusters,
    )
    from airflow_crypto_btc_spark.operators.text import quality_score

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        docs, num_hashes=12, bands=4, jaccard_threshold=0.5
    )
    clusters = near_dup_clusters(docs, pairs)
    qual = quality_score(docs).select("doc_id", "quality")
    joined = clusters.join(qual, "doc_id")
    return (
        joined.groupBy("cluster_id")
        .agg(
            F.max_by(
                "doc_id",
                F.struct(
                    F.col("quality").alias("q"),
                    (-F.col("doc_id")).alias("t"),
                ),
            ).alias("rep_id"),
            F.max(
                F.struct(
                    F.col("quality").alias("q"),
                    (-F.col("doc_id")).alias("t"),
                )
            )["q"].alias("rep_quality"),
            F.count("*").alias("cluster_size"),
        )
        .select(
            "cluster_id",
            "rep_id",
            "rep_quality",
            "cluster_size",
            (F.col("cluster_size") - 1).alias("n_purged"),
            (F.col("rep_id") != F.col("cluster_id"))
            .cast("int")
            .alias("rep_shifted"),
        )
    )


from airflow_crypto_btc_spark.plans.registry_ext import (  # noqa: E402
    _SQL_TEXT_QUALITY_SCORE,
)

_SQL_CURATE_BEST_REP_PURGE = f"""
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
    ),
    clusters AS (
      SELECT id AS doc_id, min(label) AS cluster_id FROM reach GROUP BY id
    ),
    qual AS ({_SQL_TEXT_QUALITY_SCORE}),
    ranked AS (
      SELECT c.cluster_id, c.doc_id, q.quality,
        row_number() OVER (PARTITION BY c.cluster_id
          ORDER BY q.quality DESC, c.doc_id ASC) AS r,
        COUNT(*) OVER (PARTITION BY c.cluster_id) AS cluster_size
      FROM clusters c JOIN qual q USING (doc_id)
    )
    SELECT cluster_id, doc_id AS rep_id, quality AS rep_quality,
           cluster_size, cluster_size - 1 AS n_purged,
           CAST(rep_id <> cluster_id AS INT) AS rep_shifted
    FROM ranked WHERE r = 1
"""

INCREMENTAL_REGISTRY.update(
    {
        "curate_best_rep_purge": QuerySpec(
            q_curate_best_rep_purge, _SQL_CURATE_BEST_REP_PURGE
        ),
    }
)

from airflow_crypto_btc_spark.plans.registry_curation import (  # noqa: E402
    _SQL_CURATE_SHARDS_FROM_MAP,
    q_curate_shards_from_map,
)

INCREMENTAL_REGISTRY.update(
    {
        "curate_shards_from_map": QuerySpec(
            q_curate_shards_from_map, _SQL_CURATE_SHARDS_FROM_MAP
        ),
    }
)

from airflow_crypto_btc_spark.plans.registry_curation import (  # noqa: E402
    _SQL_CURATE_SHARD_DRIFT,
    q_curate_shard_drift,
)

INCREMENTAL_REGISTRY.update(
    {
        "curate_shard_drift": QuerySpec(
            q_curate_shard_drift, _SQL_CURATE_SHARD_DRIFT
        ),
    }
)


# ------------------------------------------------------------ Z-order layout
# Morton-curve clustering for multi-dimension file skipping (the
# OPTIMIZE ZORDER shape); see operators/zorder.py.  Dimensions:
# events (user_id, epoch-µs ts) — the classic entity×time pair.  All
# integer arithmetic, so the oracle replays codes, envelopes, and the
# pruning report exactly.

#: normalized 16-bit coordinates + 32-bit Morton code, DuckDB side
_SQL_ZORDER_CODED = """
zc AS (
  SELECT event_id, user_id AS xv, epoch_us(ts) AS yv
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL),
zb AS (
  SELECT MIN(xv) AS x_mn, MAX(xv) AS x_mx,
         MIN(yv) AS y_mn, MAX(yv) AS y_mx
  FROM zc),
zu AS (
  SELECT event_id,
    CAST(CASE WHEN x_mx > x_mn
         THEN ((xv - x_mn) * 65535) // (x_mx - x_mn) ELSE 0 END
      AS INT) AS x_u16,
    CAST(CASE WHEN y_mx > y_mn
         THEN ((yv - y_mn) * 65535) // (y_mx - y_mn) ELSE 0 END
      AS INT) AS y_u16
  FROM zc, zb),
zcoded AS (
  SELECT event_id, x_u16, y_u16,
    CAST(list_sum(list_transform(generate_series(0, 15), i ->
      (((x_u16 >> i) & 1)::BIGINT << (2 * i))
      + (((y_u16 >> i) & 1)::BIGINT << (2 * i + 1)))) AS BIGINT)
      AS zcode
  FROM zu)
"""

#: per-bucket two-dimension envelopes for a given code; span 2^32 for
#: the Morton code, 2^16 for the x-only strawman layout
def _sql_zorder_buckets(code: str, span: int, n_buckets: int = 64) -> str:
    return f"""
  SELECT CAST(({code} * {n_buckets}) // {span} AS INT) AS bucket,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         MIN(x_u16) AS x_min, MAX(x_u16) AS x_max,
         MIN(y_u16) AS y_min, MAX(y_u16) AS y_max
  FROM zcoded GROUP BY 1
"""


def q_phys_zorder_code(spark, sf_dir):
    """Morton codes for events over (user_id, epoch-µs ts): integer
    grid normalization from a one-row broadcast bounds aggregate, then
    a row-local 16-step bit-interleave fold — zero UDFs, zero extra
    shuffles beyond the bounds scalar; see operators/zorder.zorder_code."""
    from airflow_crypto_btc_spark.operators.zorder import zorder_code
    from airflow_crypto_btc_spark.sources.tables import load_table

    return zorder_code(
        load_table(spark, sf_dir, "events"),
        "user_id",
        "unix_micros(cast(ts as timestamp))",
    )


_SQL_PHYS_ZORDER_CODE = f"""
    WITH {_SQL_ZORDER_CODED}
    SELECT event_id, x_u16, y_u16, zcode FROM zcoded
"""


def q_phys_zorder_layout_stats(spark, sf_dir):
    """The written layout modeled as 64 fixed-width code ranges (the
    files a range-partitioned write produces), each reporting its
    min/max envelope in BOTH dimensions — the column statistics a scan
    planner prunes with.  Fixed-width buckets, not ntile: rank-based
    splits are a global sort through one partition; see
    operators/zorder.bucket_stats."""
    from airflow_crypto_btc_spark.operators.zorder import (
        bucket_stats,
        zorder_code,
    )
    from airflow_crypto_btc_spark.sources.tables import load_table

    return bucket_stats(
        zorder_code(
            load_table(spark, sf_dir, "events"),
            "user_id",
            "unix_micros(cast(ts as timestamp))",
        )
    )


_SQL_PHYS_ZORDER_LAYOUT_STATS = f"""
    WITH {_SQL_ZORDER_CODED}
    {_sql_zorder_buckets('zcode', 1 << 32)}
"""


def q_phys_zorder_prune_report(spark, sf_dir):
    """Skip quality MEASURED for one 2-D box (lower-quarter users ×
    middle-quarter time): files touched and rows scanned under the
    z-order layout vs an x-sorted layout of the same file count —
    the number an operator reads before paying the layout shuffle at
    100 TB; see operators/zorder.prune_report."""
    from airflow_crypto_btc_spark.operators.zorder import (
        prune_report,
        zorder_code,
    )
    from airflow_crypto_btc_spark.sources.tables import load_table

    return prune_report(
        zorder_code(
            load_table(spark, sf_dir, "events"),
            "user_id",
            "unix_micros(cast(ts as timestamp))",
        ),
        x_lo=0,
        x_hi=16383,
        y_lo=24576,
        y_hi=40959,
    )


_SQL_PHYS_ZORDER_PRUNE_REPORT = f"""
    WITH {_SQL_ZORDER_CODED},
    zstats AS ({_sql_zorder_buckets('zcode', 1 << 32)}),
    xstats AS ({_sql_zorder_buckets('x_u16::BIGINT', 1 << 16)}),
    zl AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS z_files,
        CAST(SUM(CASE WHEN NOT (x_max < 0 OR x_min > 16383
          OR y_max < 24576 OR y_min > 40959) THEN 1 ELSE 0 END)
          AS BIGINT) AS z_files_touched,
        CAST(SUM(CASE WHEN NOT (x_max < 0 OR x_min > 16383
          OR y_max < 24576 OR y_min > 40959) THEN n_rows ELSE 0 END)
          AS BIGINT) AS z_rows_scanned
      FROM zstats),
    xl AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS x_files,
        CAST(SUM(CASE WHEN NOT (x_max < 0 OR x_min > 16383
          OR y_max < 24576 OR y_min > 40959) THEN 1 ELSE 0 END)
          AS BIGINT) AS x_files_touched,
        CAST(SUM(CASE WHEN NOT (x_max < 0 OR x_min > 16383
          OR y_max < 24576 OR y_min > 40959) THEN n_rows ELSE 0 END)
          AS BIGINT) AS x_rows_scanned
      FROM xstats),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS rows_total,
        CAST(SUM(CASE WHEN x_u16 BETWEEN 0 AND 16383
          AND y_u16 BETWEEN 24576 AND 40959 THEN 1 ELSE 0 END)
          AS BIGINT) AS rows_match
      FROM zcoded)
    SELECT rows_total, rows_match,
      z_files, z_files_touched, z_rows_scanned,
      x_files, x_files_touched, x_rows_scanned,
      ((rows_total - z_rows_scanned) * 1000000) // rows_total
        AS z_skip_micro,
      ((rows_total - x_rows_scanned) * 1000000) // rows_total
        AS x_skip_micro
    FROM tot, zl, xl
"""


INCREMENTAL_REGISTRY.update(
    {
        "phys_zorder_code": QuerySpec(
            q_phys_zorder_code, _SQL_PHYS_ZORDER_CODE
        ),
        "phys_zorder_layout_stats": QuerySpec(
            q_phys_zorder_layout_stats, _SQL_PHYS_ZORDER_LAYOUT_STATS
        ),
        "phys_zorder_prune_report": QuerySpec(
            q_phys_zorder_prune_report, _SQL_PHYS_ZORDER_PRUNE_REPORT
        ),
    }
)


# ------------------------------------------------------- bigram LM scoring
# interpolated bigram quality gate — the n-gram upgrade of the unigram
# perplexity proxy (one step toward CCNet's 5-gram KenLM gate); see
# operators/text.bigram_logprob_score.  λ=0.5, add-one smoothing on
# both components; the oracle replays pair building, both count
# tables, the interpolated log, and the micro-unit mean exactly.

_SQL_TEXT_BIGRAM_LOGPROB = r"""
    WITH btoks AS (
      SELECT doc_id,
        list_filter(regexp_split_to_array(text, '[ \t\n\x0b\f\r]+'),
                    t -> t <> '') AS tokens
      FROM documents
    ),
    bpairs AS (
      SELECT doc_id, tokens[i] AS prev, tokens[i + 1] AS tok
      FROM btoks,
           LATERAL (SELECT unnest(generate_series(1, len(tokens) - 1))
                    AS i) g
    ),
    bbi AS (SELECT prev, tok, count(*) AS c_uv FROM bpairs GROUP BY 1, 2),
    buni AS (
      SELECT token, count(*) AS c
      FROM (SELECT unnest(tokens) AS token FROM btoks) GROUP BY 1
    ),
    btot AS (SELECT sum(c) AS n_total, count(*) AS n_vocab FROM buni),
    bscored AS (
      SELECT p.doc_id,
        round(ln(
          0.5 * (CAST(b.c_uv + 1 AS DOUBLE)
                 / CAST(u.c + tt.n_vocab AS DOUBLE))
          + 0.5 * (CAST(v.c + 1 AS DOUBLE)
                   / CAST(tt.n_total + tt.n_vocab AS DOUBLE))), 6) AS lp
      FROM bpairs p
      JOIN bbi b ON b.prev = p.prev AND b.tok = p.tok
      JOIN buni u ON u.token = p.prev
      JOIN buni v ON v.token = p.tok
      CROSS JOIN btot tt
    ),
    bsums AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        SUM(CAST(round(lp * 1000000) AS BIGINT)) AS s6,
        count(*) AS n
      FROM bscored GROUP BY doc_id
    ),
    bagg AS (
      SELECT doc_id, n_bigrams,
        (CASE WHEN s6 < 0 THEN -((2 * (-s6) + n) // (2 * n))
              ELSE (2 * s6 + n) // (2 * n) END) / 1000000.0
          AS mean_logprob
      FROM bsums
    )
    SELECT d.doc_id,
      coalesce(a.n_bigrams, 0) AS n_bigrams,
      a.mean_logprob
    FROM documents d LEFT JOIN bagg a USING (doc_id)
"""


def q_text_bigram_logprob(spark, sf_dir):
    """Interpolated bigram LM score per document (word order now
    matters — scrambled fluent vocabulary scores low where the unigram
    proxy cannot tell); pairs build row-locally, the bigram table is
    key-distributed, unigram/totals broadcast; see
    operators/text.bigram_logprob_score."""
    from airflow_crypto_btc_spark.operators.text import (
        bigram_logprob_score,
    )

    return bigram_logprob_score(load_table(spark, sf_dir, "documents"))


def _bigram_lm_zone(spark, sf_dir):
    import os

    from airflow_crypto_btc_spark.operators.text import build_bigram_lm
    from airflow_crypto_btc_spark.plans.registry_more import _landing_zone

    docs = load_table(spark, sf_dir, "documents")
    stat = os.stat(os.path.join(sf_dir, "documents.parquet"))
    source_version = f"documents@{stat.st_size}_{stat.st_mtime_ns}"

    def _land(staging: str) -> None:
        build_bigram_lm(
            spark,
            docs,
            os.path.join(staging, "bigram"),
            os.path.join(staging, "unigram"),
            source_version=source_version,
        )

    return (
        _landing_zone(sf_dir, "documents", "bigram_lm", _land),
        source_version,
    )


def q_text_bigram_from_model(spark, sf_dir):
    """Bigram scoring served from the FROZEN persisted LM (same oracle:
    scoring the model's own corpus must equal the inline
    self-estimate); unseen pairs coalesce to the add-one floor, and a
    stale source_version is refused from metadata alone."""
    import os

    from airflow_crypto_btc_spark.operators.text import (
        bigram_logprob_from_model,
    )

    zone, source_version = _bigram_lm_zone(spark, sf_dir)
    return bigram_logprob_from_model(
        spark,
        load_table(spark, sf_dir, "documents"),
        os.path.join(zone, "bigram"),
        os.path.join(zone, "unigram"),
        expect_source=source_version,
    )


INCREMENTAL_REGISTRY.update(
    {
        "text_bigram_logprob": QuerySpec(
            q_text_bigram_logprob, _SQL_TEXT_BIGRAM_LOGPROB
        ),
        "text_bigram_from_model": QuerySpec(
            q_text_bigram_from_model, _SQL_TEXT_BIGRAM_LOGPROB
        ),
    }
)


# --------------------------------------------- streamed leakage-safe split
def _split_state_zone(spark, sf_dir):
    """Landing-zone build of the streaming-maintained split state: the
    LSH pair table grows in three appends interleaved with three
    document folds — each pair lands in the batch of its LATER-arriving
    endpoint (arrival batch of doc d is d % 3), so the middle folds
    exercise real cluster merges, changed-row-only appends, and the
    moved-docs audit feed, not just a replayed one-shot."""
    import os

    from airflow_crypto_btc_spark.operators.dedup import minhash_lsh_pairs
    from airflow_crypto_btc_spark.plans.registry_more import _landing_zone
    from airflow_crypto_btc_spark.sources.snapshot_table import append
    from airflow_crypto_btc_spark.streaming.split_stream import (
        leakage_split_sink,
    )

    docs = load_table(spark, sf_dir, "documents")

    def _land(staging: str) -> None:
        pairs_tbl = os.path.join(staging, "pairs")
        sink = leakage_split_sink(
            pairs_tbl,
            os.path.join(staging, "splits"),
            os.path.join(staging, "moves"),
            query_name="split-zone",
        )
        all_pairs = minhash_lsh_pairs(
            docs, num_hashes=12, bands=4, jaccard_threshold=0.5
        ).localCheckpoint()  # one LSH run feeds all three arrival slices
        for b in range(3):
            arriving = all_pairs.filter(
                F.greatest(F.col("id_a") % 3, F.col("id_b") % 3) == b
            )
            if arriving.limit(1).count():
                append(spark, arriving, pairs_tbl)
            sink(docs.filter(f"doc_id % 3 = {b}"), b)

    return _landing_zone(sf_dir, "documents", "split_state", _land)


def q_curate_split_from_state(spark, sf_dir):
    """The SERVING shape of the leakage-safe split: assignments come
    from the changelog the streaming maintainer
    (streaming/split_stream.leakage_split_sink) folded batch-by-batch —
    documents arrived in three micro-batches, near-dup edges in the
    batch of their later endpoint, so mid-stream cluster merges and the
    moved-docs audit all happened on the way here.  The oracle is the
    ONE-SHOT batch split SQL: passing proves the incremental min-label
    folds converge to exactly the full-graph components and the
    latest-wins view serves them bit-compatibly."""
    import os

    from airflow_crypto_btc_spark.streaming.split_stream import (
        split_assignments,
    )

    zone = _split_state_zone(spark, sf_dir)
    return split_assignments(spark, os.path.join(zone, "splits"))


INCREMENTAL_REGISTRY["curate_split_from_state"] = QuerySpec(
    q_curate_split_from_state, _SQL_CURATE_LEAKAGE_SAFE_SPLIT
)


# ------------------------------------------------------------- BM25 serving
def q_search_bm25_from_index(spark, sf_dir):
    """BM25 served from the PERSISTED inverted index: postings and
    document lengths live in two snapshot tables built once per corpus
    version (landing-zone keyed by the fixture fingerprint, commit meta
    pins the source fingerprint and the serve path refuses a stale
    generation) — the scan a 100 TB retrieval-based curation query
    actually pays: no re-tokenization, postings pruned to the queried
    vocabulary at the join.  Same oracle as the inline entry: passing
    proves the index round-trips through the commit log exactly."""
    import os

    from airflow_crypto_btc_spark.operators.search import (
        build_bm25_index,
        bm25_topk_from_index,
        default_queries,
    )
    from airflow_crypto_btc_spark.plans.registry_more import _landing_zone

    docs = load_table(spark, sf_dir, "documents")
    stat = os.stat(os.path.join(sf_dir, "documents.parquet"))
    source_version = f"documents@{stat.st_size}_{stat.st_mtime_ns}"

    def _land(staging: str) -> None:
        build_bm25_index(
            spark,
            docs,
            os.path.join(staging, "postings"),
            os.path.join(staging, "doclen"),
            source_version=source_version,
        )

    zone = _landing_zone(sf_dir, "documents", "bm25_index", _land)
    return bm25_topk_from_index(
        spark,
        os.path.join(zone, "postings"),
        os.path.join(zone, "doclen"),
        default_queries(docs),
        expect_source=source_version,
    )


from airflow_crypto_btc_spark.plans.registry_ml import (  # noqa: E402
    _SQL_SEARCH_BM25_TOPK,
)

INCREMENTAL_REGISTRY["search_bm25_from_index"] = QuerySpec(
    q_search_bm25_from_index, _SQL_SEARCH_BM25_TOPK
)


def q_search_bm25_from_stream(spark, sf_dir):
    """BM25 served from an index the STREAMING maintainer built: the
    landing zone folds the corpus through ``bm25_index_sink`` in two
    micro-batches (odd ids, then even — the freshness anti-join, the
    doc-length CAS fold, and the postings append all run for real),
    then serves with the same pruned-postings scan.  The oracle is the
    ONE-SHOT BM25 SQL: passing proves the batch-by-batch index equals
    the all-at-once build, commit-log round-trip included."""
    import os

    from airflow_crypto_btc_spark.operators.search import (
        bm25_topk_from_index,
        default_queries,
    )
    from airflow_crypto_btc_spark.plans.registry_more import _landing_zone
    from airflow_crypto_btc_spark.streaming.search_stream import (
        bm25_index_sink,
    )

    docs = load_table(spark, sf_dir, "documents")

    def _land(staging: str) -> None:
        sink = bm25_index_sink(
            os.path.join(staging, "postings"),
            os.path.join(staging, "doclen"),
            query_name="bm25-zone",
        )
        sink(docs.filter("doc_id % 2 = 1"), 0)
        sink(docs.filter("doc_id % 2 = 0"), 1)

    zone = _landing_zone(sf_dir, "documents", "bm25_stream_index", _land)
    return bm25_topk_from_index(
        spark,
        os.path.join(zone, "postings"),
        os.path.join(zone, "doclen"),
        default_queries(docs),
    )


INCREMENTAL_REGISTRY["search_bm25_from_stream"] = QuerySpec(
    q_search_bm25_from_stream, _SQL_SEARCH_BM25_TOPK
)


# ------------------------------------------- CDC APPLY CHANGES (round 13)
def _cdc_changelog(daily, base):
    """The CDC fixture changelog shared by the one-shot and streamed
    zones (ONE source of truth against the shared oracle SQL).  Every
    per-key sequence MAXIMUM is unique across the whole changelog, so
    under the round-14 cross-batch high-watermark ANY delivery order
    converges to the same end state — which is exactly what the
    streamed twin demonstrates.  Returns the named change frames."""
    tag = lambda df, t, s: (  # noqa: E731
        df.withColumn("_change_type", F.lit(t))
        .withColumn("seq", F.lit(s).cast("int"))
    )
    upd = tag(
        base.filter(
            F.col("date").between("2024-01-05", "2024-01-08")
        ).withColumn("n_obs", F.col("n_obs") + 1000),
        "update", 1,
    )
    dels = tag(
        base.filter(
            (F.col("event_type") == "error")
            & (F.col("date") <= F.lit("2024-01-04").cast("date"))
        ).withColumn("n_obs", F.lit(0).cast("long")),
        "delete", 1,
    )
    ins = tag(
        daily.filter(
            F.col("date").between("2024-01-21", "2024-01-25")
        ),
        "insert", 1,
    )
    # latest-wins exercises: the seq-2 delete overrides the seq-1
    # update for ('click', 01-05); the seq-2 update RESURRECTS
    # ('error', 01-03), which seq 1 deleted
    late_del = tag(
        base.filter(
            (F.col("event_type") == "click")
            & (F.col("date") == F.lit("2024-01-05").cast("date"))
        ),
        "delete", 2,
    )
    late_upd = tag(
        base.filter(
            (F.col("event_type") == "error")
            & (F.col("date") == F.lit("2024-01-03").cast("date"))
        ).withColumn("n_obs", F.lit(777).cast("long")),
        "update", 2,
    )
    # the LATE OUT-OF-ORDER batch (round 14): two stale changes the
    # high-watermark must DISCARD (a seq-0 update under the day-5..8
    # keys' seq-1 watermark, and a seq-1 insert trying to resurrect
    # ('click', 01-05), which the seq-2 delete tombstoned) plus one
    # genuinely newer change that must apply (seq-3 update of
    # ('error', 01-03) from 777 to 888)
    stale_upd = tag(
        base.filter(
            F.col("date").between("2024-01-05", "2024-01-08")
        ).withColumn("n_obs", F.col("n_obs") + 5555),
        "update", 0,
    )
    stale_res = tag(
        base.filter(
            (F.col("event_type") == "click")
            & (F.col("date") == F.lit("2024-01-05").cast("date"))
        ).withColumn("n_obs", F.lit(12345).cast("long")),
        "insert", 1,
    )
    fresh_upd = tag(
        base.filter(
            (F.col("event_type") == "error")
            & (F.col("date") == F.lit("2024-01-03").cast("date"))
        ).withColumn("n_obs", F.lit(888).cast("long")),
        "update", 3,
    )
    return {
        "upd": upd, "dels": dels, "ins": ins,
        "late_del": late_del, "late_upd": late_upd,
        "stale_upd": stale_upd, "stale_res": stale_res,
        "fresh_upd": fresh_upd,
    }


def _cdc_daily_base(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("date")
    ).agg(F.count("*").cast("long").alias("n_obs"))
    base = daily.filter(
        F.col("date") <= F.lit("2024-01-20").cast("date")
    )
    return daily, base


def _cdc_zone(spark, sf_dir):
    import os

    from airflow_crypto_btc_spark.plans.registry_more import _landing_zone
    from airflow_crypto_btc_spark.plans.registry_takedown import (
        _fingerprint,
    )
    from airflow_crypto_btc_spark.sources.snapshot_table import (
        append as snap_append,
        apply_changes,
    )

    daily, base = _cdc_daily_base(spark, sf_dir)
    _ = _fingerprint(sf_dir, "events")  # zone keys on the events file

    def _land(staging: str) -> None:
        tbl = os.path.join(staging, "state")
        snap_append(spark, base, tbl)
        c = _cdc_changelog(daily, base)
        changes = (
            c["upd"].unionByName(c["dels"])
            .unionByName(c["ins"])
            .unionByName(c["late_del"])
            .unionByName(c["late_upd"])
        )
        apply_changes(
            spark, changes, tbl,
            key_cols=["event_type", "date"],
            sequence_col="seq",
            txn_id="cdc-batch",
        )
        late_batch = (
            c["stale_upd"].unionByName(c["stale_res"])
            .unionByName(c["fresh_upd"])
        )
        apply_changes(
            spark, late_batch, tbl,
            key_cols=["event_type", "date"],
            sequence_col="seq",
            txn_id="cdc-late-batch",
        )

    return _landing_zone(sf_dir, "events", "cdc_state2", _land)


def q_cdc_apply_changes(spark, sf_dir):
    """APPLY CHANGES INTO served end-to-end: a daily per-type state
    table folds one CDC changelog batch (updates for days 5-8, deletes
    for the early 'error' days, inserts for days 21-25, plus a seq-2
    delete that overrides a seq-1 update and a seq-2 update that
    RESURRECTS a seq-1 delete) via snapshot_table.apply_changes —
    keyed latest-wins by sequence, narrowed rewrite, exactly-once txn —
    then a LATE OUT-OF-ORDER batch (round 14, DLT SEQUENCE BY
    semantics): the cross-batch high-watermark discards a stale seq-0
    update sweep and a stale seq-1 insert trying to resurrect the
    seq-2-deleted ('click', 01-05) key (the delete-tombstone case),
    while the batch's one genuinely newer change (seq-3 update of
    ('error', 01-03) to 888) applies.  The oracle recomputes the end
    state relationally: base minus the touched keys, union the
    surviving upserts."""
    import os

    from airflow_crypto_btc_spark.sources.snapshot_table import (
        read_snapshot,
    )

    zone = _cdc_zone(spark, sf_dir)
    return read_snapshot(
        spark, os.path.join(zone, "state")
    ).select("event_type", "date", "n_obs")


_SQL_CDC_APPLY_CHANGES = """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS date,
             CAST(count(*) AS BIGINT) AS n_obs
      FROM events GROUP BY 1, 2
    ),
    base AS (SELECT * FROM daily WHERE date <= DATE '2024-01-20'),
    ups AS (
      SELECT event_type, date, n_obs + 1000 AS n_obs FROM base
      WHERE date BETWEEN DATE '2024-01-05' AND DATE '2024-01-08'
        AND NOT (event_type = 'click' AND date = DATE '2024-01-05')
      UNION ALL
      SELECT event_type, date, n_obs FROM daily
      WHERE date BETWEEN DATE '2024-01-21' AND DATE '2024-01-25'
      UNION ALL
      SELECT 'error', DATE '2024-01-03', CAST(888 AS BIGINT)
    ),
    touched AS (
      SELECT event_type, date FROM ups
      UNION
      SELECT event_type, date FROM base
      WHERE (event_type = 'error' AND date <= DATE '2024-01-04')
         OR (event_type = 'click' AND date = DATE '2024-01-05')
    )
    SELECT b.event_type, b.date, b.n_obs FROM base b
    WHERE NOT EXISTS (
      SELECT 1 FROM touched t
      WHERE t.event_type = b.event_type AND t.date = b.date
    )
    UNION ALL
    SELECT event_type, date, n_obs FROM ups
"""


INCREMENTAL_REGISTRY["cdc_apply_changes"] = QuerySpec(
    q_cdc_apply_changes, _SQL_CDC_APPLY_CHANGES
)


def _cdc_stream_zone(spark, sf_dir):
    import os

    from airflow_crypto_btc_spark.plans.registry_more import _landing_zone
    from airflow_crypto_btc_spark.plans.registry_takedown import (
        _fingerprint,
    )
    from airflow_crypto_btc_spark.sources.snapshot_table import (
        append as snap_append,
    )
    from airflow_crypto_btc_spark.streaming.snapshot_sink import (
        cdc_apply_sink,
    )

    daily, base = _cdc_daily_base(spark, sf_dir)
    _ = _fingerprint(sf_dir, "events")  # zone keys on the events file

    def _land(staging: str) -> None:
        tbl = os.path.join(staging, "state")
        snap_append(spark, base, tbl)
        c = _cdc_changelog(daily, base)
        # the SAME changelog as the one-shot zone, but delivered as
        # three micro-batches in SHUFFLED arrival order (the late
        # out-of-order batch FIRST) through the streaming sink — the
        # cross-batch high-watermark makes every delivery order fold
        # to the identical end state, so the oracle is shared verbatim
        # with `cdc_apply_changes`
        b_late = (
            c["stale_upd"].unionByName(c["stale_res"])
            .unionByName(c["fresh_upd"])
        )
        b1b = (
            c["ins"].unionByName(c["late_del"])
            .unionByName(c["late_upd"])
        )
        b1a = c["upd"].unionByName(c["dels"])
        sink = cdc_apply_sink(
            tbl, "cdc-stream-q", ["event_type", "date"], "seq"
        )
        sink(b_late, 0)
        sink(b_late, 0)  # engine replay of a delivered batch: no-op
        sink(b1b, 1)
        sink(b1a, 2)

    return _landing_zone(sf_dir, "events", "cdc_stream_state", _land)


def q_cdc_apply_from_stream(spark, sf_dir):
    """APPLY CHANGES INTO as a STREAM: the same CDC changelog as
    `cdc_apply_changes`, delivered through the foreachBatch sink
    (streaming/snapshot_sink.cdc_apply_sink) as three micro-batches in
    SHUFFLED arrival order — the late out-of-order batch lands FIRST,
    then the original batch split in two, plus one engine-style replay
    of a delivered batch (exactly-once no-op).  The round-14
    cross-batch sequence high-watermark guarantees every delivery
    order converges to the global-max-per-key end state (each per-key
    sequence maximum in the fixture changelog is unique), so the
    oracle is the SAME relational end state the one-shot entry hashes
    — proving arrival order is cancelled, not merely tolerated."""
    import os

    from airflow_crypto_btc_spark.sources.snapshot_table import (
        read_snapshot,
    )

    zone = _cdc_stream_zone(spark, sf_dir)
    return read_snapshot(
        spark, os.path.join(zone, "state")
    ).select("event_type", "date", "n_obs")


INCREMENTAL_REGISTRY["cdc_apply_from_stream"] = QuerySpec(
    q_cdc_apply_from_stream, _SQL_CDC_APPLY_CHANGES
)


# ----------------------------------- KMV sketch maintainer (round 14)


def q_approx_kmv_from_stream(spark, sf_dir):
    """The per-lang KMV document sketch served from a table the
    STREAMING maintainer built: the landing zone folds the corpus
    through ``sketch_stream.kmv_sink`` in three micro-batches
    (doc_id % 3) with one engine-style replay (exactly-once no-op) and
    one mid-stream ``kmv_merge`` — then serves the k=16 smallest
    normalized-content-digest hashes per lang via ``kmv_from_table``.
    The oracle is the ONE-SHOT k-min SQL: passing proves the theta
    union law end-to-end through the commit log (batch-by-batch
    minima == all-at-once minima), the same twin discipline as
    ``search_bm25_from_stream``."""
    import os

    from airflow_crypto_btc_spark.operators.dedup import NORMALIZED_TEXT
    from airflow_crypto_btc_spark.operators.sketch import kmv_from_table
    from airflow_crypto_btc_spark.plans.registry_more import _landing_zone
    from airflow_crypto_btc_spark.streaming.sketch_stream import kmv_sink

    docs = load_table(spark, sf_dir, "documents")
    key = f"md5({NORMALIZED_TEXT.format(col='text')})"

    def _land(staging: str) -> None:
        sink = kmv_sink(
            os.path.join(staging, "minima"),
            query_name="kmv-zone",
            key_expr=key,
            group_cols=["lang"],
            k=16,
            merge_every=2,
        )
        sink(docs.filter("doc_id % 3 = 0"), 0)
        sink(docs.filter("doc_id % 3 = 0"), 0)  # replay: no-op
        sink(docs.filter("doc_id % 3 = 1"), 1)  # triggers the merge
        sink(docs.filter("doc_id % 3 = 2"), 2)

    zone = _landing_zone(sf_dir, "documents", "kmv_sketch_stream", _land)
    return kmv_from_table(
        spark, os.path.join(zone, "minima"), ["lang"], k=16
    )


_SQL_APPROX_KMV_FROM_STREAM = """
    WITH h AS (
      SELECT DISTINCT lang,
        ('0x' || substr(md5(md5(lower(trim(regexp_replace(text,
          '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g'))))), 1, 8))::BIGINT AS h32
      FROM documents
      WHERE text IS NOT NULL
    ),
    r AS (
      SELECT lang, h32,
        row_number() OVER (PARTITION BY lang ORDER BY h32) AS pos
      FROM h
    )
    SELECT lang, CAST(pos AS BIGINT) AS pos, h32
    FROM r WHERE pos <= 16
"""


INCREMENTAL_REGISTRY["approx_kmv_from_stream"] = QuerySpec(
    q_approx_kmv_from_stream, _SQL_APPROX_KMV_FROM_STREAM
)
