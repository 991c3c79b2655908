"""Streaming corpus data card: maintain the per-document card FACTS
table incrementally as documents arrive, so the release card is always
one cheap digest-level rollup away.

The split mirrors the batch operator exactly (``operators/curation``):
``card_facts`` is the ingest-time projection — tokenize, language-score,
quality-score, and digest each document ONCE, at arrival — and
``card_from_facts`` is the serve-time rollup over skinny
(id, digest, lang, counts) rows.  The expensive text work is never
repeated: re-rendering the card after N arrivals costs O(|facts|) skinny
rows, not O(corpus bytes), and exact-duplicate accounting needs no
transition bookkeeping because the rollup always sees every digest's
full multiplicity.

Per batch: deterministic within-batch dedup, already-ingested ids
anti-join away (re-delivery; append-ignore semantics — a mutated body
under a seen id is NOT re-scored, same contract as the S5 sink), one
txn-id idempotent append.  Periodic compaction keeps the facts table's
file count bounded under long streams.

The reference has no streaming surface; this extends its report family
(SURVEY §2.1 S9's daily summary shape) to the Structured-Streaming
execution model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from airflow_crypto_btc_spark.operators.curation import (
    card_facts,
    card_from_facts,
)
from airflow_crypto_btc_spark.operators.incremental import (
    ConcurrentMaintenanceError,
)
from airflow_crypto_btc_spark.sources.snapshot_table import (
    CommitConflictError,
    append,
    compact,
    current_snapshot,
    read_snapshot,
    read_snapshot_or_none,
    vacuum,
)


def card_facts_sink(
    facts_table: str,
    query_name: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    compact_every: int | None = None,
    compact_target_parts: int = 4,
):
    """``foreachBatch`` callback appending each arriving document's card
    facts exactly once."""

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # CAS anchor: the facts version the dedup anti-join is based on
        # (same closure as maintain_ohlc_rollup — the commit lands only
        # if no other writer advanced the table between our read and our
        # commit, so a racing fold can never double-ingest a doc id)
        facts_v = current_snapshot(facts_table).version
        w = Window.partitionBy(id_col).orderBy(F.md5(F.col(text_col)))
        fresh = (
            batch_df.withColumn("_rn", F.row_number().over(w))
            .filter("_rn = 1")
            .drop("_rn")
        )
        committed = read_snapshot_or_none(spark, facts_table)
        if committed is not None:
            fresh = fresh.join(
                committed.select(F.col(id_col).alias("_seen")),
                fresh[id_col] == F.col("_seen"),
                "left_anti",
            )
        try:
            append(
                spark,
                card_facts(fresh, text_col, id_col),
                facts_table,
                txn_id=f"{query_name}:{batch_id}",
                expect_version=facts_v,
            )
        except CommitConflictError as exc:
            raise ConcurrentMaintenanceError(str(exc)) from exc
        if compact_every and (batch_id + 1) % compact_every == 0:
            try:
                compact(
                    spark, facts_table,
                    target_parts=compact_target_parts,
                )
            except ValueError:
                return
            vacuum(facts_table)

    return _fold


def data_card_from_facts_table(
    spark: SparkSession, facts_table: str
) -> DataFrame:
    """The release card served from the maintained facts table — the
    digest-level rollup only; no document body is read or re-scored."""
    return card_from_facts(read_snapshot(spark, facts_table))
