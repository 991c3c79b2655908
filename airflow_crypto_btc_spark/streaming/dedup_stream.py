"""Streaming near-duplicate detection against a persisted LSH index.

The batch-side architecture (operators/dedup.minhash_lsh_pairs_from_index)
made the index a pair of snapshot tables — band keys and shingle sets —
that an increment probes.  This module runs that maintenance ON a stream:
each micro-batch of documents

1. computes its own index rows (one Arrow scan,
   ``operators/dedup_fast.minhash_prep_fast``),
2. transactionally appends them to the index tables
   (txn ``<query>:<batch_id>:sets`` / ``:bands`` — replays skip),
3. probes the WHOLE index (which now includes the batch) for pairs with
   at least one endpoint in the batch, and appends them to the pairs
   table under ``<query>:<batch_id>:pairs``.

Every near-dup pair is emitted exactly once — in the micro-batch of its
LATER endpoint: the earlier endpoint is already indexed but not "new",
the candidate join requires a new endpoint, and txn-id idempotence makes
replays no-ops at every step (crash between the three appends resumes
correctly because reads follow the commits: the index read happens after
the batch's index append, so a half-applied batch recomputes identical
pairs).

Scale shape per batch: one Arrow scan of the batch, an append of
|batch|·bands index rows, and a bucket join sized by the batch's bucket
mates — never a corpus re-pair.  The reference has no streaming surface;
this extends its dedup family (SURVEY §2 extension) to the
Structured-Streaming execution model.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_crypto_btc_spark.operators.dedup import (
    minhash_lsh_pairs_from_index,
)
from airflow_crypto_btc_spark.operators.dedup_fast import minhash_prep_fast
from airflow_crypto_btc_spark.sources.snapshot_table import (
    append,
    read_snapshot,
)


def near_dup_index_sink(
    sets_table: str,
    bands_table: str,
    pairs_table: str,
    query_name: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k_shingle: int = 3,
    num_hashes: int = 12,
    bands: int = 4,
    jaccard_threshold: float = 0.5,
    max_bucket_size: int | None = None,
):
    """``foreachBatch`` callback maintaining the LSH index tables and the
    emitted-pairs table with exactly-once semantics."""

    def _fold(batch_df, batch_id: int) -> None:
        spark = batch_df.sparkSession
        prep = minhash_prep_fast(
            batch_df, id_col, text_col, k_shingle, num_hashes, bands
        ).localCheckpoint(eager=False)  # one Arrow scan feeds both tables
        batch_sets = prep.select("id", "shingle_set", "set_size")
        batch_bands = prep.select(
            "id", F.posexplode("band_keys").alias("band_idx", "band_key")
        )
        append(
            spark, batch_sets, sets_table,
            txn_id=f"{query_name}:{batch_id}:sets",
        )
        append(
            spark, batch_bands, bands_table,
            txn_id=f"{query_name}:{batch_id}:bands",
        )
        # probe AFTER the index append: the committed index includes the
        # batch, so a replayed half-applied batch recomputes identically
        pairs = minhash_lsh_pairs_from_index(
            read_snapshot(spark, sets_table),
            read_snapshot(spark, bands_table),
            batch_sets.select("id"),
            jaccard_threshold,
            max_bucket_size,
        )
        append(
            spark, pairs, pairs_table,
            txn_id=f"{query_name}:{batch_id}:pairs",
        )

    return _fold


def contamination_guard_sink(
    eval_docs,
    flags_table: str,
    query_name: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 5,
    min_containment: float = 0.1,
):
    """``foreachBatch`` callback running eval-set decontamination on an
    ARRIVING corpus: each micro-batch of candidate training documents is
    checked against the static eval set (broadcast shingles — the
    batch-side asymmetry, unchanged) and the flagged (test, train) pairs
    are appended to ``flags_table`` under ``<query>:<batch_id>``.

    A contamination pair depends only on its two documents, so checking
    each train doc once — in its arrival batch — yields exactly the
    batch operator's output over the union of all batches; replays are
    txn-id no-ops.  This is the ingest-time guard: contaminated
    documents are flagged BEFORE they ever join the training corpus,
    instead of by a corpus-wide sweep after the fact."""
    from airflow_crypto_btc_spark.operators.curation import (
        contamination_pairs,
    )

    def _check(batch_df, batch_id: int) -> None:
        flagged = contamination_pairs(
            batch_df,
            eval_docs,
            id_col=id_col,
            text_col=text_col,
            shingle_k=shingle_k,
            min_containment=min_containment,
        )
        append(
            batch_df.sparkSession, flagged, flags_table,
            txn_id=f"{query_name}:{batch_id}",
        )

    return _check
