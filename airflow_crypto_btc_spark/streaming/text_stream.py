"""Streaming model-based text quality gating: score arriving documents
against the PERSISTED unigram LM (``operators/text.build_text_models``)
and append each document's score exactly once.

This is the ingest-time shape the persisted model exists for: a quality
gate must not re-estimate corpus statistics per micro-batch (the inline
``unigram_logprob_score`` self-estimate would both rescan the corpus
and DRIFT — the same document scoring differently as unrelated arrivals
shift the distribution).  Here the model is FROZEN: loaded once at sink
construction, version-asserted every batch — a model rebuild under a
running stream stops it rather than silently mixing scoring regimes
(same doctrine as ``ann_stream.pq_codes_sink``'s codebooks and
``semantic_stream``'s quantizer).

Per batch: deterministic within-batch dedup, already-scored ids
anti-join away (re-delivery), survivors score via one broadcast model
join (|batch| × tokens rows, never a corpus aggregate), and the single
append is txn-id idempotent.  With ``min_logprob`` set, each row also
carries a ``passed`` flag — the gate decision is recorded WITH the
evidence, so downstream consumers filter on it without re-scoring, and
an audit can always ask "why was this dropped".

The reference has no streaming surface; this extends its text family
(SURVEY §2 extension) to the Structured-Streaming execution model.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from airflow_crypto_btc_spark.operators.text import (
    unigram_logprob_from_model,
)
from airflow_crypto_btc_spark.sources.snapshot_table import (
    append,
    compact,
    current_snapshot,
    read_snapshot_or_none,
    vacuum,
)


def quality_scores_sink(
    unigram_table: str,
    scores_table: str,
    query_name: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_logprob: float | None = None,
    expect_source: str | None = None,
    compact_every: int | None = None,
    compact_target_parts: int = 4,
):
    """``foreachBatch`` callback appending arriving documents' frozen-
    model quality scores — (doc_id, n_tokens, mean_logprob[, passed]) —
    with exactly-once semantics.  ``expect_source`` pins the model to
    the corpus generation the gate was calibrated on (checked once at
    construction); every batch then asserts the model table is still
    the SAME COMMIT by version."""

    model_snap = current_snapshot(unigram_table)
    if (
        expect_source is not None
        and model_snap.meta.get("source_version") != expect_source
    ):
        raise ValueError(
            f"stale text model: built from "
            f"{model_snap.meta.get('source_version')!r}, sink expects "
            f"{expect_source!r} — rebuild before streaming scores"
        )

    def _fold(batch_df, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if current_snapshot(unigram_table).version != model_snap.version:
            raise ValueError(
                "text model changed under a running scoring stream — "
                "restart the sink against the new generation (scores "
                "from different model generations are not comparable)"
            )
        w = Window.partitionBy(id_col).orderBy(F.md5(F.col(text_col)))
        fresh = (
            batch_df.withColumn("_rn", F.row_number().over(w))
            .filter("_rn = 1")
            .drop("_rn")
        )
        committed = read_snapshot_or_none(spark, scores_table)
        if committed is not None:
            fresh = fresh.join(
                committed.select(F.col(id_col).alias("_seen")),
                fresh[id_col] == F.col("_seen"),
                "left_anti",
            )
        scores = unigram_logprob_from_model(
            spark,
            fresh.select(F.col(id_col).alias("doc_id"), text_col),
            unigram_table,
            text_col,
        ).withColumnRenamed("doc_id", id_col)
        if min_logprob is not None:
            scores = scores.withColumn(
                "passed",
                F.coalesce(
                    F.col("mean_logprob") >= min_logprob, F.lit(False)
                ),
            )
        append(
            spark, scores, scores_table,
            txn_id=f"{query_name}:{batch_id}",
        )
        if compact_every and (batch_id + 1) % compact_every == 0:
            try:
                compact(
                    spark, scores_table,
                    target_parts=compact_target_parts,
                )
            except ValueError:
                return
            vacuum(scores_table)

    return _fold
