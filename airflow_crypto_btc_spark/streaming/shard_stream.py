"""Streaming consistent output sharding: assign arriving documents to
their training shard against the PERSISTED shard map
(``operators/curation.build_shard_map``) and append each assignment
exactly once.

This is the ingest-time shape the persisted map exists for: the
serpentine balance plan is computed ONCE on a reference corpus census
and frozen — re-planning per micro-batch would move already-assigned
documents between shards as the observed token distribution drifts
(a shard assignment, like a quality score, must not change because
unrelated documents arrived).  The map is loaded once at sink
construction, version-asserted every batch: a rebuild under a running
stream stops the sink rather than silently splitting the corpus across
two shard plans (the same doctrine as ``probe_stream`` /
``text_stream`` / ``semantic_stream``).

Per batch: deterministic within-batch dedup, already-assigned ids
anti-join away (re-delivery), survivors assign via one broadcast join
on the bounded map — no census, no window, no exchange beyond the
batch's own rows — and the single append is txn-id idempotent.  The
assignment lands WITH its evidence (``n_tokens``, ``micro_shard``), so
a balance audit over the decisions table needs no re-tokenization.

The reference has no streaming surface; this extends the curation
family (SURVEY §2 extension) to the Structured-Streaming execution
model.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

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


def shard_assignments_sink(
    map_table: str,
    assignments_table: str,
    query_name: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    expect_source: str | None = None,
    compact_every: int | None = None,
    compact_target_parts: int = 4,
):
    """``foreachBatch`` callback appending arriving documents' frozen-map
    shard assignments — ``(id, n_tokens, micro_shard, shard)`` — with
    exactly-once semantics.  ``expect_source`` pins the map to the
    census generation it was planned on (checked once at construction);
    every batch then asserts the map table is still the SAME COMMIT by
    version.  Because the persisted map is complete over every
    micro-shard, an arrival can never miss it — there is no fallback
    path whose behavior could diverge from the batch operator."""
    from airflow_crypto_btc_spark.functions.hashing import tokens_expr

    map_snap = current_snapshot(map_table)
    if (
        expect_source is not None
        and map_snap.meta.get("source_version") != expect_source
    ):
        raise ValueError(
            f"stale shard map: planned on "
            f"{map_snap.meta.get('source_version')!r}, sink expects "
            f"{expect_source!r} — rebuild before streaming assignments"
        )
    m = int(map_snap.meta["shards"]) * int(map_snap.meta["oversample"])

    def _fold(batch_df, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if current_snapshot(map_table).version != map_snap.version:
            raise ValueError(
                "shard map changed under a running assignment stream — "
                "restart the sink against the new generation (documents "
                "assigned under different plans would split the corpus)"
            )
        # CAS anchor: the assignments version the dedup anti-join is
        # based on — a racing fold can never double-assign an id (the
        # map-version assert above stays as the cross-table fast-fail)
        assignments_v = current_snapshot(assignments_table).version
        w = Window.partitionBy(id_col).orderBy(F.md5(F.col(text_col)))
        fresh = (
            batch_df.withColumn("_rn", F.row_number().over(w))
            .filter("_rn = 1")
            .drop("_rn")
        )
        committed = read_snapshot_or_none(spark, assignments_table)
        if committed is not None:
            fresh = fresh.join(
                committed.select(F.col(id_col).alias("_seen")),
                fresh[id_col] == F.col("_seen"),
                "left_anti",
            )
        mapping = read_snapshot(spark, map_table).select(
            "micro_shard", "shard"
        )
        assigned = (
            fresh.select(
                F.col(id_col),
                F.expr(
                    f"cast(conv(substr(md5(cast({id_col} as string))"
                    f",1,8),16,10) as bigint) % {m}"
                ).alias("micro_shard"),
                F.size(tokens_expr(text_col)).cast("long").alias(
                    "n_tokens"
                ),
            )
            .join(F.broadcast(mapping), "micro_shard")
            .select(id_col, "n_tokens", "micro_shard", "shard")
        )
        try:
            append(
                spark, assigned, assignments_table,
                txn_id=f"{query_name}:{batch_id}",
                expect_version=assignments_v,
            )
        except CommitConflictError as exc:
            raise ConcurrentMaintenanceError(str(exc)) from exc
        if compact_every and (batch_id + 1) % compact_every == 0:
            try:
                compact(
                    spark, assignments_table,
                    target_parts=compact_target_parts,
                )
            except ValueError:
                return
            vacuum(assignments_table)

    return _fold
