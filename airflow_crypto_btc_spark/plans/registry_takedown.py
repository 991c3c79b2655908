"""Cascading-takedown catalog entries: every persisted artifact is
built on the FULL fixture corpus, a takedown set D (``doc_id % 10 = 3``
/ ``vec_id % 10 = 3``) is cascaded through it with
``operators/takedown.py``, and the entry SERVES from the post-takedown
state — while the DuckDB oracle rebuilds the answer FROM SCRATCH on
(corpus − D).  Agreement proves the eviction is semantically exact,
not merely row-complete: BM25's df/N/Σdl statistics shrink correctly,
LSH buckets stop pairing the deleted docs, the split re-clusters (a
removal can SPLIT a cluster and RAISE min labels — the rebase), and
IVF lists stop returning the deleted vectors under the frozen
quantizer.

The takedown set intersects the query sets on purpose (doc 3 and 13 /
vec 3 and 13 are inside the ``< 20`` probe prefix), so the entries also
prove deleted documents stop being QUERIES, and it never intersects
the IVF centroid filter (``vec_id % 25 = 7`` ∩ ``vec_id % 10 = 3`` = ∅
by CRT), so the frozen quantizer equals the rebuilt one and the oracle
can filter a single source relation.

Landing zones follow the persisted-artifact convention (one build per
fixture fingerprint, atomically renamed): each zone builds the
artifact AND applies the cascade inside ``_land``, so warm serves read
a deterministic post-takedown state.  The report zone also loads
``embeddings`` under the documents fingerprint key — the fixture pair
regenerates together (TESTDATA.md), noted here because a lone
embeddings regeneration would not re-key it.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from airflow_crypto_btc_spark.plans.registry import QuerySpec
from airflow_crypto_btc_spark.plans.registry_ext import (
    ivf_topk_sql,
    leakage_split_sql,
    lsh_pairs_sql,
)
from airflow_crypto_btc_spark.plans.registry_ml import bm25_topk_sql
from airflow_crypto_btc_spark.sources.tables import load_table

#: the takedown predicate — D and its complement, both engines
_D_PRED = "doc_id % 10 = 3"
_KEEP_PRED = "doc_id % 10 != 3"
_DOCS_MINUS_D = f"(SELECT * FROM documents WHERE {_KEEP_PRED})"
_EMB_MINUS_D = "(SELECT * FROM embeddings WHERE vec_id % 10 != 3)"


def _fingerprint(sf_dir: str, table: str) -> str:
    stat = os.stat(os.path.join(sf_dir, f"{table}.parquet"))
    return f"{table}@{stat.st_size}_{stat.st_mtime_ns}"


def _takedown_ids(docs):
    return docs.filter(_D_PRED).select("doc_id")


# ------------------------------------------------------------------ BM25
def _bm25_takedown_zone(spark, sf_dir):
    from airflow_crypto_btc_spark.operators.search import build_bm25_index
    from airflow_crypto_btc_spark.operators.takedown import takedown_bm25
    from airflow_crypto_btc_spark.plans.registry_more import _landing_zone

    docs = load_table(spark, sf_dir, "documents")
    source_version = _fingerprint(sf_dir, "documents")

    def _land(staging: str) -> None:
        post = os.path.join(staging, "postings")
        dlen = os.path.join(staging, "doclen")
        build_bm25_index(
            spark, docs, post, dlen, source_version=source_version
        )
        takedown_bm25(
            spark, _takedown_ids(docs), post, dlen, txn_id="takedown"
        )

    return (
        _landing_zone(sf_dir, "documents", "takedown_bm25", _land),
        source_version,
    )


def q_curate_takedown_bm25(spark, sf_dir):
    """BM25 served from a TAKEN-DOWN inverted index: postings and doc
    lengths were built on the full corpus, then D evicted via
    operators/takedown.takedown_bm25 (CAS overwrite commits).  The
    oracle rebuilds BM25 from scratch on (corpus − D) — passing proves
    df, N, and Σdl all shrank exactly (they derive from the stored
    rows at serve time), deleted docs neither score nor query, and
    the commit-log round-trip changed nothing else."""
    from airflow_crypto_btc_spark.operators.search import (
        bm25_topk_from_index,
        default_queries,
    )

    zone, source_version = _bm25_takedown_zone(spark, sf_dir)
    remaining = load_table(spark, sf_dir, "documents").filter(_KEEP_PRED)
    return bm25_topk_from_index(
        spark,
        os.path.join(zone, "postings"),
        os.path.join(zone, "doclen"),
        default_queries(remaining),
        expect_source=source_version,
    )


# ------------------------------------------------------------------- LSH
def _lsh_takedown_zone(spark, sf_dir):
    from airflow_crypto_btc_spark.operators.dedup import (
        build_minhash_index,
    )
    from airflow_crypto_btc_spark.operators.takedown import takedown_lsh
    from airflow_crypto_btc_spark.plans.registry_more import _landing_zone

    docs = load_table(spark, sf_dir, "documents")
    source_version = _fingerprint(sf_dir, "documents")

    def _land(staging: str) -> None:
        sets_t = os.path.join(staging, "sets")
        bands_t = os.path.join(staging, "bands")
        build_minhash_index(
            spark, docs, sets_t, bands_t, source_version=source_version
        )
        takedown_lsh(
            spark, _takedown_ids(docs), sets_t, bands_t,
            txn_id="takedown",
        )

    return (
        _landing_zone(sf_dir, "documents", "takedown_lsh", _land),
        source_version,
    )


def q_curate_takedown_lsh(spark, sf_dir):
    """Near-dup pairs served from a TAKEN-DOWN LSH index (full pair
    set: every surviving id probes).  Oracle = the one-shot LSH SQL on
    (corpus − D): passing proves deleted docs left every bucket and no
    surviving pair's candidacy or Jaccard moved (pairing is pairwise,
    reading only the two endpoint documents)."""
    from airflow_crypto_btc_spark.operators.dedup import (
        minhash_lsh_pairs_from_index_tables,
    )

    zone, source_version = _lsh_takedown_zone(spark, sf_dir)
    remaining = load_table(spark, sf_dir, "documents").filter(_KEEP_PRED)
    return minhash_lsh_pairs_from_index_tables(
        spark,
        os.path.join(zone, "sets"),
        os.path.join(zone, "bands"),
        remaining.selectExpr("doc_id AS id"),
        jaccard_threshold=0.5,
        expect_source=source_version,
    )


# ------------------------------------------------------------------- IVF
def _ann_takedown_zone(spark, sf_dir):
    from airflow_crypto_btc_spark.operators.similarity import (
        build_semantic_index,
    )
    from airflow_crypto_btc_spark.operators.takedown import (
        takedown_ann_members,
    )
    from airflow_crypto_btc_spark.plans.registry_more import _landing_zone

    emb = load_table(spark, sf_dir, "embeddings")
    source_version = _fingerprint(sf_dir, "embeddings")

    def _land(staging: str) -> None:
        cent = os.path.join(staging, "centroids")
        memb = os.path.join(staging, "members")
        build_semantic_index(
            spark, emb, cent, memb,
            source_version=source_version,
            centroid_filter="vec_id % 25 = 7",
        )
        takedown_ann_members(
            spark,
            emb.filter("vec_id % 10 = 3").select("vec_id"),
            memb,
            txn_id="takedown",
        )

    return (
        _landing_zone(sf_dir, "embeddings", "takedown_ann", _land),
        source_version,
    )


def q_curate_takedown_ann(spark, sf_dir):
    """IVF top-k served from TAKEN-DOWN member lists under the FROZEN
    coarse quantizer: member rows (vector codes) of D evicted, the
    centroid table untouched — the production ANN deletion contract
    (codes are retrievable content, centroids are trained parameters).
    Oracle = the IVF SQL on (corpus − D); exact because cell
    assignment is per-vector and the centroid filter never intersects
    D (CRT, see plans/registry_ext.ivf_topk_sql)."""
    from airflow_crypto_btc_spark.operators.similarity import (
        ivf_topk_from_tables,
    )

    zone, source_version = _ann_takedown_zone(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    out = ivf_topk_from_tables(
        spark,
        os.path.join(zone, "centroids"),
        os.path.join(zone, "members"),
        emb.filter("vec_id < 20 AND vec_id % 10 != 3"),
        n_probe=4,
        k=10,
        expect_source=source_version,
    )
    return out.select(
        "qid", "nid", "cosine", F.col("rnk").cast("long").alias("rnk")
    )


# -------------------------------------------------------------------- PQ
def _pq_takedown_zone(spark, sf_dir):
    from airflow_crypto_btc_spark.operators.similarity import (
        pq_save_index,
    )
    from airflow_crypto_btc_spark.operators.takedown import (
        takedown_pq_codes,
    )
    from airflow_crypto_btc_spark.plans.registry_more import _landing_zone
    from airflow_crypto_btc_spark.sources.tables import parquet_row_count

    emb = load_table(spark, sf_dir, "embeddings")
    source_version = _fingerprint(sf_dir, "embeddings")

    def _land(staging: str) -> None:
        pq_save_index(
            spark, emb, staging, source_version=source_version, m=8,
            corpus_rows=parquet_row_count(
                os.path.join(sf_dir, "embeddings.parquet")
            ),
        )
        takedown_pq_codes(
            spark,
            emb.filter("vec_id % 10 = 3").select("vec_id"),
            os.path.join(staging, "codes"),
            txn_id="takedown",
        )

    return (
        _landing_zone(sf_dir, "embeddings", "takedown_pq", _land),
        source_version,
    )


def q_curate_takedown_pq(spark, sf_dir):
    """PQ-ADC top-k served from TAKEN-DOWN code rows under the FROZEN
    codebooks: D's m-byte codes evicted, the codebooks (trained
    parameters) untouched — coding is per-vector, so eviction equals
    re-encoding (corpus − D) under the same model.  The oracle replays
    the full PQ lifecycle with the TWO-SOURCE split this contract
    implies: k-means training over the FULL corpus, encode/ADC/rerank
    over (corpus − D) — see plans/registry_ml._pq_topk_sql."""
    from airflow_crypto_btc_spark.operators.similarity import (
        pq_topk_from_index,
    )

    zone, source_version = _pq_takedown_zone(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    out = pq_topk_from_index(
        spark,
        zone,
        emb.filter("vec_id % 10 != 3"),
        query_filter="vec_id < 20",
        expect_source=source_version,
    )
    return out.withColumn("rnk", F.col("rnk").cast("long"))


# ------------------------------------------------------------ gram index
def _gram_takedown_zone(spark, sf_dir):
    from airflow_crypto_btc_spark.operators.takedown import (
        takedown_gram_index,
    )
    from airflow_crypto_btc_spark.operators.text import build_gram_index
    from airflow_crypto_btc_spark.plans.registry_more import _landing_zone

    docs = load_table(spark, sf_dir, "documents")
    source_version = _fingerprint(sf_dir, "documents")

    def _land(staging: str) -> None:
        gram_t = os.path.join(staging, "grams")
        build_gram_index(
            spark, docs, gram_t, source_version=source_version
        )
        takedown_gram_index(
            spark, docs.filter(_D_PRED), gram_t, txn_id="takedown"
        )

    return _landing_zone(sf_dir, "documents", "takedown_gram", _land)


def q_curate_takedown_gram(spark, sf_dir):
    """The DECREMENTED gram-frequency index state itself: df counts
    distinct documents per gram, documents contribute independently,
    so subtracting D's per-doc-deduped gram counts (and deleting rows
    that reach zero) equals a from-scratch rebuild on (corpus − D) —
    which is exactly what the oracle computes.  The one derived
    aggregate in the engine that IS decrementable, in contrast to the
    CMS/HLL/bloom policy rows; see
    operators/takedown.takedown_gram_index."""
    from airflow_crypto_btc_spark.sources.snapshot_table import (
        read_snapshot,
    )

    zone = _gram_takedown_zone(spark, sf_dir)
    return read_snapshot(spark, os.path.join(zone, "grams"))


def _gram_takedown_sql() -> str:
    from airflow_crypto_btc_spark.plans.registry_ext import tokens_sql

    gram8 = " || ' ' || ".join(f"tokens[i+{j}]" for j in range(8))
    return f"""
    WITH tok AS (
      SELECT doc_id, tokens FROM ({tokens_sql(_DOCS_MINUS_D)})),
    g AS (
      SELECT DISTINCT doc_id, md5(gram) AS h FROM (
        SELECT doc_id, unnest(CASE WHEN len(tokens) >= 8 THEN
            list_transform(range(1, len(tokens)-6), i -> {gram8})
          ELSE [] END) AS gram
        FROM tok))
    SELECT h, CAST(count(*) AS BIGINT) AS df FROM g GROUP BY h
"""


# ----------------------------------------------------------------- split
def _split_takedown_zone(spark, sf_dir):
    from airflow_crypto_btc_spark.operators.dedup import minhash_lsh_pairs
    from airflow_crypto_btc_spark.operators.takedown import takedown_split
    from airflow_crypto_btc_spark.plans.registry_more import _landing_zone
    from airflow_crypto_btc_spark.sources.snapshot_table import append
    from airflow_crypto_btc_spark.streaming.split_stream import (
        leakage_split_sink,
    )

    docs = load_table(spark, sf_dir, "documents")

    def _land(staging: str) -> None:
        pairs_tbl = os.path.join(staging, "pairs")
        splits_tbl = os.path.join(staging, "splits")
        moves_tbl = os.path.join(staging, "moves")
        # the streamed state first (3 arrival batches, real merges —
        # the split_state recipe), then the cascade on top of it
        sink = leakage_split_sink(
            pairs_tbl, splits_tbl, moves_tbl, query_name="td-zone"
        )
        all_pairs = minhash_lsh_pairs(
            docs, num_hashes=12, bands=4, jaccard_threshold=0.5
        ).localCheckpoint()
        for b in range(3):
            arriving = all_pairs.filter(
                F.greatest(F.col("id_a") % 3, F.col("id_b") % 3) == b
            )
            if arriving.limit(1).count():
                append(spark, arriving, pairs_tbl)
            sink(docs.filter(f"doc_id % 3 = {b}"), b)
        takedown_split(
            spark,
            _takedown_ids(docs),
            pairs_tbl,
            splits_tbl,
            moves_tbl,
            txn_id="takedown",
        )

    return _landing_zone(sf_dir, "documents", "takedown_split", _land)


def q_curate_takedown_split(spark, sf_dir):
    """The leakage-safe split served AFTER a takedown REBASE: the
    streamed changelog (3 arrival batches with real mid-stream merges)
    had D evicted via operators/takedown.takedown_split — affected
    clusters re-clustered over the surviving edges (splits and
    min-label raises included), changelog rebased to one canonical row
    per doc, side flips audited.  Oracle = the one-shot split SQL on
    (corpus − D): passing proves the blast-radius recompute equals the
    full-graph rebuild."""
    from airflow_crypto_btc_spark.streaming.split_stream import (
        split_assignments,
    )

    zone = _split_takedown_zone(spark, sf_dir)
    return split_assignments(spark, os.path.join(zone, "splits"))


# ---------------------------------------------------------- semantic dedup
def _semantic_takedown_zone(spark, sf_dir):
    from airflow_crypto_btc_spark.operators.similarity import (
        build_semantic_index,
        semantic_purge,
    )
    from airflow_crypto_btc_spark.operators.takedown import (
        takedown_semantic,
    )
    from airflow_crypto_btc_spark.plans.registry_more import _landing_zone
    from airflow_crypto_btc_spark.sources.snapshot_table import append

    emb = load_table(spark, sf_dir, "embeddings")
    source_version = _fingerprint(sf_dir, "embeddings")

    def _land(staging: str) -> None:
        cent = os.path.join(staging, "centroids")
        memb = os.path.join(staging, "members")
        labels = os.path.join(staging, "labels")
        build_semantic_index(
            spark, emb, cent, memb, source_version=source_version,
            centroid_filter="vec_id % 25 = 7",
        )
        append(
            spark,
            semantic_purge(
                emb,
                centroid_filter="vec_id % 25 = 7",
                cosine_threshold=0.3,
            ),
            labels,
        )
        takedown_semantic(
            spark,
            emb.filter("vec_id % 10 = 3").select("vec_id"),
            labels,
            memb,
            txn_id="takedown",
            cosine_threshold=0.3,
        )

    return _landing_zone(sf_dir, "embeddings", "takedown_sem", _land)


def q_curate_takedown_semantic(spark, sf_dir):
    """The SemDeDup labeling after a takedown RELABEL: documents whose
    ``dup_of`` pointed into D re-scan their (post-eviction) cluster
    mates — the next-smallest qualifying mate takes over, or the
    document is RESURRECTED (keep flips true: a takedown returns
    previously purged data to the training pool, which the audit
    surfaces).  Blast radius is exact — dup_of is a MINIMUM and
    removal only shrinks candidate sets, so only dup_of ∈ D rows
    change.  Oracle = the one-shot purge SQL on (corpus − D) under the
    same seed quantizer; see operators/takedown.takedown_semantic."""
    from airflow_crypto_btc_spark.sources.snapshot_table import (
        read_snapshot,
    )

    zone = _semantic_takedown_zone(spark, sf_dir)
    return read_snapshot(spark, os.path.join(zone, "labels"))


# ------------------------------------------------------------ queue serve
def _stream_takedown_zone(spark, sf_dir):
    from airflow_crypto_btc_spark.operators.search import build_bm25_index
    from airflow_crypto_btc_spark.plans.registry_more import _landing_zone
    from airflow_crypto_btc_spark.streaming.takedown_stream import (
        takedown_sink,
    )

    docs = load_table(spark, sf_dir, "documents")
    source_version = _fingerprint(sf_dir, "documents")

    def _land(staging: str) -> None:
        post = os.path.join(staging, "postings")
        dlen = os.path.join(staging, "doclen")
        build_bm25_index(
            spark, docs, post, dlen, source_version=source_version
        )
        # the erasure QUEUE: D arrives in two deletion batches
        # (doc_id % 20 = 3, then % 20 = 13 — together exactly _D_PRED)
        sink = takedown_sink(
            query_name="td-queue",
            bm25=(post, dlen),
            report_table=os.path.join(staging, "audit"),
        )
        sink(docs.filter("doc_id % 20 = 3").select("doc_id"), 0)
        sink(docs.filter("doc_id % 20 = 13").select("doc_id"), 1)

    return (
        _landing_zone(sf_dir, "documents", "takedown_stream", _land),
        source_version,
    )


def q_curate_takedown_from_stream(spark, sf_dir):
    """BM25 served after the STREAMING erasure queue drained: D arrived
    as two deletion batches folded by streaming/takedown_stream
    .takedown_sink (batch-txn-keyed cascades), proving takedowns
    COMPOSE — applying D₁ then D₂ batchwise equals the one-shot rebuild
    on corpus − (D₁ ∪ D₂), which is exactly the oracle (the same SQL as
    curate_takedown_bm25)."""
    from airflow_crypto_btc_spark.operators.search import (
        bm25_topk_from_index,
        default_queries,
    )

    zone, source_version = _stream_takedown_zone(spark, sf_dir)
    remaining = load_table(spark, sf_dir, "documents").filter(_KEEP_PRED)
    return bm25_topk_from_index(
        spark,
        os.path.join(zone, "postings"),
        os.path.join(zone, "doclen"),
        default_queries(remaining),
        expect_source=source_version,
    )


# ---------------------------------------------------------------- report
def _report_zone(spark, sf_dir):
    from airflow_crypto_btc_spark.operators.dedup import (
        build_minhash_index,
        minhash_lsh_pairs,
    )
    from airflow_crypto_btc_spark.operators.search import build_bm25_index
    from airflow_crypto_btc_spark.operators.similarity import (
        build_semantic_index,
    )
    from airflow_crypto_btc_spark.operators.takedown import (
        cascade_takedown,
    )
    from airflow_crypto_btc_spark.plans.registry_more import _landing_zone
    from airflow_crypto_btc_spark.sources.snapshot_table import append
    from airflow_crypto_btc_spark.streaming.split_stream import (
        leakage_split_sink,
    )

    from airflow_crypto_btc_spark.operators.similarity import (
        pq_save_index,
        semantic_purge,
    )
    from airflow_crypto_btc_spark.operators.text import build_gram_index
    from airflow_crypto_btc_spark.sources.tables import parquet_row_count

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    doc_v = _fingerprint(sf_dir, "documents")
    emb_v = _fingerprint(sf_dir, "embeddings")

    def _land(staging: str) -> None:
        post = os.path.join(staging, "postings")
        dlen = os.path.join(staging, "doclen")
        sets_t = os.path.join(staging, "sets")
        bands_t = os.path.join(staging, "bands")
        cent = os.path.join(staging, "centroids")
        memb = os.path.join(staging, "members")
        pairs_tbl = os.path.join(staging, "pairs")
        splits_tbl = os.path.join(staging, "splits")
        moves_tbl = os.path.join(staging, "moves")
        gram_t = os.path.join(staging, "grams")
        build_bm25_index(spark, docs, post, dlen, source_version=doc_v)
        build_minhash_index(
            spark, docs, sets_t, bands_t, source_version=doc_v
        )
        build_semantic_index(
            spark, emb, cent, memb, source_version=emb_v,
            centroid_filter="vec_id % 25 = 7",
        )
        pq_save_index(
            spark, emb, os.path.join(staging, "pq"),
            source_version=emb_v, m=8,
            corpus_rows=parquet_row_count(
                os.path.join(sf_dir, "embeddings.parquet")
            ),
        )
        build_gram_index(spark, docs, gram_t, source_version=doc_v)
        # the semantic labeling gets its OWN members table: the cascade
        # evicts members once per artifact txn, and sharing the IVF
        # members table would make the second eviction a no-op and the
        # audit counts order-dependent
        sem_cent = os.path.join(staging, "sem_centroids")
        sem_memb = os.path.join(staging, "sem_members")
        sem_labels = os.path.join(staging, "sem_labels")
        build_semantic_index(
            spark, emb, sem_cent, sem_memb, source_version=emb_v,
            centroid_filter="vec_id % 25 = 7",
        )
        append(
            spark,
            semantic_purge(
                emb,
                centroid_filter="vec_id % 25 = 7",
                cosine_threshold=0.3,
            ),
            sem_labels,
        )
        append(
            spark,
            minhash_lsh_pairs(
                docs, num_hashes=12, bands=4, jaccard_threshold=0.5
            ),
            pairs_tbl,
        )
        leakage_split_sink(
            pairs_tbl, splits_tbl, moves_tbl, query_name="td-report"
        )(docs, 0)
        report = cascade_takedown(
            spark,
            _takedown_ids(docs),
            txn_id="takedown",
            bm25=(post, dlen),
            lsh=(sets_t, bands_t),
            ann_members=memb,
            split=(pairs_tbl, splits_tbl, moves_tbl),
            pq_codes=os.path.join(staging, "pq", "codes"),
            gram=(gram_t, docs.filter(_D_PRED)),
            semantic=(sem_labels, sem_memb),
            semantic_threshold=0.3,
        )
        append(spark, report, os.path.join(staging, "report"))

    return _landing_zone(sf_dir, "documents", "takedown_report", _land)


def q_curate_takedown_report(spark, sf_dir):
    """The full-cascade AUDIT: every persisted artifact family is
    built on the fixture corpus, one ``cascade_takedown`` evicts D
    from all of them, and this entry serves the audit rows — one
    (artifact, action, rows_removed) per artifact plus one explicit
    ``rebuild_required`` policy row per non-decrementable sketch
    family.  Every count is independently derivable from the corpus,
    which is exactly what the oracle does: posting rows of D, |D|,
    band rows, member vectors, D-incident pairs, and the side-flip
    count as the DIFFERENCE of the full and (corpus − D) one-shot
    splits — so a wrong eviction anywhere in the cascade shows up as
    a wrong number here."""
    from airflow_crypto_btc_spark.sources.snapshot_table import (
        read_snapshot,
    )

    zone = _report_zone(spark, sf_dir)
    return read_snapshot(spark, os.path.join(zone, "report"))


_SQL_TAKEDOWN_REPORT = f"""
    WITH RECURSIVE dd AS (SELECT * FROM documents WHERE {_D_PRED}),
    dtoks AS (
      SELECT doc_id,
        unnest(list_filter(
          regexp_split_to_array(text, '[ \\t\\n\\x0b\\f\\r]+'),
          t -> t <> '')) AS token
      FROM dd),
    n_post AS (SELECT CAST(count(*) AS BIGINT) AS c
               FROM (SELECT DISTINCT doc_id, token FROM dtoks)),
    n_d AS (SELECT CAST(count(*) AS BIGINT) AS c FROM dd),
    n_vec AS (SELECT CAST(count(*) AS BIGINT) AS c
              FROM embeddings WHERE vec_id % 10 = 3),
    d_grams AS (
      SELECT h, CAST(count(*) AS BIGINT) AS d_cnt FROM (
        SELECT DISTINCT doc_id, md5(gram) AS h FROM (
          SELECT doc_id, unnest(CASE WHEN len(tokens) >= 8 THEN
              list_transform(range(1, len(tokens)-6),
                i -> {" || ' ' || ".join(f"tokens[i+{j}]" for j in range(8))})
            ELSE [] END) AS gram
          FROM (SELECT doc_id,
                  list_filter(regexp_split_to_array(
                    text, '[ \\t\\n\\x0b\\f\\r]+'), t -> t <> '') AS tokens
                FROM dd)))
      GROUP BY h),
    full_grams AS (
      SELECT h, CAST(count(*) AS BIGINT) AS df FROM (
        SELECT DISTINCT doc_id, md5(gram) AS h FROM (
          SELECT doc_id, unnest(CASE WHEN len(tokens) >= 8 THEN
              list_transform(range(1, len(tokens)-6),
                i -> {" || ' ' || ".join(f"tokens[i+{j}]" for j in range(8))})
            ELSE [] END) AS gram
          FROM (SELECT doc_id,
                  list_filter(regexp_split_to_array(
                    text, '[ \\t\\n\\x0b\\f\\r]+'), t -> t <> '') AS tokens
                FROM documents)))
      GROUP BY h),
    n_gram_touch AS (SELECT CAST(count(*) AS BIGINT) AS c FROM d_grams),
    n_gram_del AS (
      SELECT CAST(count(*) AS BIGINT) AS c
      FROM d_grams d JOIN full_grams f USING (h)
      WHERE f.df = d.d_cnt),
    all_pairs AS ({lsh_pairs_sql()}),
    n_pairs AS (SELECT CAST(count(*) AS BIGINT) AS c FROM all_pairs
                WHERE id_a % 10 = 3 OR id_b % 10 = 3),
    split_full AS ({leakage_split_sql()}),
    split_minus AS ({leakage_split_sql(_DOCS_MINUS_D)}),
    n_moves AS (
      SELECT CAST(count(*) AS BIGINT) AS c
      FROM split_full f JOIN split_minus m USING (doc_id)
      WHERE f.split != m.split),
    purge_full AS ({{PURGE_FULL}}),
    purge_minus AS ({{PURGE_MINUS}}),
    n_resurrected AS (
      SELECT CAST(count(*) AS BIGINT) AS c
      FROM purge_full f JOIN purge_minus m USING (vec_id)
      WHERE f.dup_of % 10 = 3 AND m.keep)
    SELECT 'bm25_postings' AS artifact, 'evicted' AS action,
           (SELECT c FROM n_post) AS rows_removed
    UNION ALL SELECT 'bm25_doclen', 'evicted', (SELECT c FROM n_d)
    UNION ALL SELECT 'lsh_sets', 'evicted', (SELECT c FROM n_d)
    UNION ALL SELECT 'lsh_bands', 'evicted', 4 * (SELECT c FROM n_d)
    UNION ALL SELECT 'ann_members', 'evicted', (SELECT c FROM n_vec)
    UNION ALL SELECT 'pq_codes', 'evicted', (SELECT c FROM n_vec)
    UNION ALL SELECT 'semantic_members', 'evicted', (SELECT c FROM n_vec)
    UNION ALL SELECT 'semantic_labels', 'evicted', (SELECT c FROM n_vec)
    UNION ALL SELECT 'semantic_resurrected', 'relabeled',
                     (SELECT c FROM n_resurrected)
    UNION ALL SELECT 'gram_index', 'decremented',
                     (SELECT c FROM n_gram_touch)
    UNION ALL SELECT 'gram_index_rows', 'deleted',
                     (SELECT c FROM n_gram_del)
    UNION ALL SELECT 'split_assignments', 'rebased',
                     (SELECT c FROM n_d)
    UNION ALL SELECT 'split_moves_audit', 'appended',
                     (SELECT c FROM n_moves)
    UNION ALL SELECT 'dedup_pairs', 'evicted', (SELECT c FROM n_pairs)
    UNION ALL SELECT 'cms_sketch', 'rebuild_required', 0
    UNION ALL SELECT 'hll_registers', 'rebuild_required', 0
    UNION ALL SELECT 'bloom_bitmap', 'rebuild_required', 0
    UNION ALL SELECT 'kmv_minima', 'rebuild_required', 0
"""


def _finish_report_sql() -> str:
    """Substitute the semantic-purge twin CTEs (full corpus vs
    corpus − D, same frozen seed quantizer) into the report oracle —
    kept out of the f-string so the purge SQL's own braces survive."""
    from airflow_crypto_btc_spark.plans.registry_ext import (
        _semantic_purge_sql,
    )

    return _SQL_TAKEDOWN_REPORT.replace(
        "{PURGE_FULL}", _semantic_purge_sql()
    ).replace("{PURGE_MINUS}", _semantic_purge_sql(source=_EMB_MINUS_D))


def _pq_takedown_sql() -> str:
    from airflow_crypto_btc_spark.plans.registry_ml import _pq_topk_sql

    return _pq_topk_sql(
        corpus_source=_EMB_MINUS_D, train_source="embeddings"
    )


def _semantic_takedown_sql() -> str:
    from airflow_crypto_btc_spark.plans.registry_ext import (
        _semantic_purge_sql,
    )

    return _semantic_purge_sql(source=_EMB_MINUS_D)


# ----------------------------------------- merge-on-read (round 13)
def _deferred_takedown_zone(spark, sf_dir, apply_dv: bool):
    from airflow_crypto_btc_spark.operators.search import build_bm25_index
    from airflow_crypto_btc_spark.operators.takedown import (
        apply_deletion_vectors,
        takedown_deferred,
    )
    from airflow_crypto_btc_spark.plans.registry_more import _landing_zone

    docs = load_table(spark, sf_dir, "documents")
    source_version = _fingerprint(sf_dir, "documents")

    def _land(staging: str) -> None:
        post = os.path.join(staging, "postings")
        dlen = os.path.join(staging, "doclen")
        dv = os.path.join(staging, "dv")
        build_bm25_index(
            spark, docs, post, dlen, source_version=source_version
        )
        takedown_deferred(
            spark, _takedown_ids(docs), dv, "doc_id", txn_id="defer"
        )
        if apply_dv:
            apply_deletion_vectors(
                spark, dv, [(post, "doc_id"), (dlen, "doc_id")],
                txn_id="optimize",
            )

    name = "takedown_dv_applied" if apply_dv else "takedown_deferred"
    return (
        _landing_zone(sf_dir, "documents", name, _land),
        source_version,
    )


def _dv_stream_zone(spark, sf_dir):
    from airflow_crypto_btc_spark.operators.search import build_bm25_index
    from airflow_crypto_btc_spark.plans.registry_more import _landing_zone
    from airflow_crypto_btc_spark.streaming.takedown_stream import (
        deferred_takedown_sink,
    )

    docs = load_table(spark, sf_dir, "documents")
    source_version = _fingerprint(sf_dir, "documents")

    def _land(staging: str) -> None:
        post = os.path.join(staging, "postings")
        dlen = os.path.join(staging, "doclen")
        dv = os.path.join(staging, "dv")
        build_bm25_index(
            spark, docs, post, dlen, source_version=source_version
        )
        # the MoR erasure queue: D arrives in two tombstone batches
        # (together exactly _D_PRED); no apply cadence fires, so the
        # serve is pure merge-on-read over the queued tombstones
        sink = deferred_takedown_sink(
            query_name="dv-queue",
            dv_table=dv,
            targets=[(post, "doc_id"), (dlen, "doc_id")],
            apply_every=None,
        )
        sink(docs.filter("doc_id % 20 = 3").select("doc_id"), 0)
        sink(docs.filter("doc_id % 20 = 13").select("doc_id"), 1)

    return (
        _landing_zone(sf_dir, "documents", "takedown_dv_stream", _land),
        source_version,
    )


def q_curate_takedown_dv_from_stream(spark, sf_dir):
    """BM25 served merge-on-read over a STREAMED tombstone queue: two
    deletion batches landed as deletion vectors (zero data-file moves,
    streaming/takedown_stream.deferred_takedown_sink), no OPTIMIZE has
    run, and the serve anti-joins the queue out of postings and doc
    lengths.  Same oracle as the eager queue entry — the rebuild on
    (corpus − D) — proving batch-wise tombstones compose to the one-
    shot deletion under merge-on-read."""
    from airflow_crypto_btc_spark.operators.search import (
        bm25_topk_from_parts,
        default_queries,
    )
    from airflow_crypto_btc_spark.operators.takedown import (
        read_snapshot_mor,
    )

    zone, _src = _dv_stream_zone(spark, sf_dir)
    post = os.path.join(zone, "postings")
    dlen = os.path.join(zone, "doclen")
    dv = os.path.join(zone, "dv")
    remaining = load_table(spark, sf_dir, "documents").filter(_KEEP_PRED)
    return bm25_topk_from_parts(
        read_snapshot_mor(spark, post, dv, "doc_id"),
        read_snapshot_mor(spark, dlen, dv, "doc_id"),
        default_queries(remaining),
    )


def q_curate_takedown_deferred(spark, sf_dir):
    """BM25 served MERGE-ON-READ: the index still physically contains
    D (takedown wrote only O(|D|) tombstones — the answer to the
    scattered-deletion full-rewrite worst case the round-13 probe
    measured), and the serve anti-joins the deletion vectors out of
    both postings and doc lengths (operators/takedown.read_snapshot_mor).
    The oracle rebuilds BM25 from scratch on (corpus − D): agreement
    proves df, N and Σdl all shrink exactly under the DV mask, before
    any physical rewrite has happened."""
    from airflow_crypto_btc_spark.operators.search import (
        bm25_topk_from_parts,
        default_queries,
    )
    from airflow_crypto_btc_spark.operators.takedown import (
        read_snapshot_mor,
    )

    zone, _src = _deferred_takedown_zone(spark, sf_dir, apply_dv=False)
    post = os.path.join(zone, "postings")
    dlen = os.path.join(zone, "doclen")
    dv = os.path.join(zone, "dv")
    remaining = load_table(spark, sf_dir, "documents").filter(_KEEP_PRED)
    return bm25_topk_from_parts(
        read_snapshot_mor(spark, post, dv, "doc_id"),
        read_snapshot_mor(spark, dlen, dv, "doc_id"),
        default_queries(remaining),
    )


def q_curate_takedown_dv_applied(spark, sf_dir):
    """The deferred path's OPTIMIZE end-state: the deletion vectors
    applied physically (one file-narrowed rewrite per artifact, DV
    table truncated by file provenance) and BM25 served from the plain
    snapshot — same oracle as the eager eviction, proving deferred +
    apply converges to the identical state one rewrite later."""
    from airflow_crypto_btc_spark.operators.search import (
        bm25_topk_from_index,
        default_queries,
    )

    zone, src = _deferred_takedown_zone(spark, sf_dir, apply_dv=True)
    remaining = load_table(spark, sf_dir, "documents").filter(_KEEP_PRED)
    return bm25_topk_from_index(
        spark,
        os.path.join(zone, "postings"),
        os.path.join(zone, "doclen"),
        default_queries(remaining),
        expect_source=src,
    )


TAKEDOWN_REGISTRY: dict[str, QuerySpec] = {
    "curate_takedown_bm25": QuerySpec(
        q_curate_takedown_bm25, bm25_topk_sql(_DOCS_MINUS_D)
    ),
    "curate_takedown_deferred": QuerySpec(
        q_curate_takedown_deferred, bm25_topk_sql(_DOCS_MINUS_D)
    ),
    "curate_takedown_dv_applied": QuerySpec(
        q_curate_takedown_dv_applied, bm25_topk_sql(_DOCS_MINUS_D)
    ),
    "curate_takedown_dv_from_stream": QuerySpec(
        q_curate_takedown_dv_from_stream, bm25_topk_sql(_DOCS_MINUS_D)
    ),
    "curate_takedown_pq": QuerySpec(
        q_curate_takedown_pq, _pq_takedown_sql()
    ),
    "curate_takedown_gram": QuerySpec(
        q_curate_takedown_gram, _gram_takedown_sql()
    ),
    "curate_takedown_lsh": QuerySpec(
        q_curate_takedown_lsh, lsh_pairs_sql(_DOCS_MINUS_D)
    ),
    "curate_takedown_ann": QuerySpec(
        q_curate_takedown_ann, ivf_topk_sql(_EMB_MINUS_D)
    ),
    "curate_takedown_split": QuerySpec(
        q_curate_takedown_split, leakage_split_sql(_DOCS_MINUS_D)
    ),
    "curate_takedown_report": QuerySpec(
        q_curate_takedown_report, _finish_report_sql()
    ),
    "curate_takedown_from_stream": QuerySpec(
        q_curate_takedown_from_stream, bm25_topk_sql(_DOCS_MINUS_D)
    ),
    "curate_takedown_semantic": QuerySpec(
        q_curate_takedown_semantic, _semantic_takedown_sql()
    ),
}
