"""Streaming per-domain quota admission: the online twin of
``operators/curation.domain_quota``.

At ingest time a per-domain cap cannot be a retroactive batch job — by
the time a nightly pass runs, the hot domain has already flooded the
landing zone.  This sink admits or drops each arriving document AT
ARRIVAL against a persisted per-domain admitted-count table, so the
quota holds continuously and the decision is recorded with evidence.

Semantics are defined under ARRIVAL ORDER (batch sequence, then id
inside a batch) — the same contract as ``text_stream.gram_index_sink``:
maintenance PRESERVES exactness because the spec itself is
order-dependent.  Fed the corpus in id order, the admitted set equals
the batch operator's answer exactly (pinned by test).  A document of a
full domain is dropped PERMANENTLY (recorded in the decisions table
with ``admitted = false``); quota is admission control, not dedup — a
later capacity bump never resurrects a dropped arrival.

Per batch, everything is bounded by the batch and the domain count
table (#domains rows, kilobytes at web scale — it rides a broadcast
join, never a shuffle of arrivals):

1. deterministic within-batch dedup + already-decided ids anti-joined
   away (re-delivery safe);
2. one window over the BATCH ONLY (rank per domain by id — batch-sized,
   not corpus-sized);
3. admit where prior_count + rank ≤ cap, one decisions append and one
   counts keyed-upsert, each txn-id idempotent — a crash between the
   two replays the batch and every commit lands or skips by its txn id.

Commit order decisions → counts → ids: freshness keys off the FINAL
commit, so a replayed batch can never double-admit or double-count.

The reference has no streaming surface; this extends the curation
family (SURVEY §2 extension) to the Structured-Streaming model.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from airflow_crypto_btc_spark.sources.snapshot_table import (
    append,
    compact,
    read_snapshot_or_none,
    upsert,
    vacuum,
)


def domain_quota_sink(
    decisions_table: str,
    counts_table: str,
    ids_table: str,
    query_name: str,
    cap: int = 10,
    id_col: str = "doc_id",
    domain_col: str = "source",
    compact_every: int | None = None,
    compact_target_parts: int = 4,
):
    """``foreachBatch`` callback enforcing a per-domain admission cap.

    Tables (all log-structured snapshot tables):

    - ``decisions_table``: (doc_id, source, admit_rank, admitted) — one
      row per DISTINCT arrival, admitted or not; ``admit_rank`` is the
      document's 1-based position within its domain's arrival order
      (> cap ⇔ dropped), so the audit trail shows exactly why.
    - ``counts_table``: (domain_key, n_seen, n_admitted) keyed by the
      null-coalesced domain —
      the only state the gate needs, #domains rows total.  ``n_seen``
      (ALL decided arrivals, admitted or not) is the rank base: the
      arrival rank must keep counting past the cap, or a dropped
      document would erase its successors' positions and the audit
      trail would disagree with the batch twin
      (operators/curation.quota_decisions).  ``n_admitted`` =
      least(n_seen, cap) rides along for direct consumption.
    - ``ids_table``: (id) — decided ids for re-delivery suppression.
    """
    if cap < 0:
        raise ValueError("cap must be nonnegative")

    def _gate(batch_df, batch_id: int) -> None:
        spark = batch_df.sparkSession

        w = Window.partitionBy(id_col).orderBy(F.md5(F.col(domain_col)))
        fresh = (
            batch_df.withColumn("_rn", F.row_number().over(w))
            .filter("_rn = 1")
            .drop("_rn")
        )
        seen = read_snapshot_or_none(spark, ids_table)
        if seen is not None:
            fresh = fresh.join(
                seen.select(F.col("id").alias("_seen")),
                fresh[id_col] == F.col("_seen"),
                "left_anti",
            )
        # NULL domains group as ONE domain under an internal coalesced
        # key (same doctrine as operators/curation.domain_quota): a null
        # key would match nothing in the counts join and its rank would
        # silently reset every batch.  The audit rows keep the original
        # (possibly null) domain value; only the counts table is keyed
        # by the sentinel.
        dom = F.coalesce(
            F.col(domain_col), F.lit("\x00__null_domain__")
        )
        fresh = (
            fresh.select(id_col, domain_col)
            .withColumn("_dom", dom)
            .localCheckpoint(eager=False)
        )  # feeds decisions, counts, and ids

        counts = read_snapshot_or_none(spark, counts_table)
        if counts is None:
            prior = F.lit(0)
            with_prior = fresh.withColumn("_prior", prior)
        else:
            with_prior = fresh.join(
                F.broadcast(
                    counts.select(
                        "domain_key", F.col("n_seen").alias("_prior")
                    )
                ),
                fresh["_dom"] == F.col("domain_key"),
                "left",
            ).withColumn("_prior", F.coalesce("_prior", F.lit(0)))

        batch_w = Window.partitionBy("_dom").orderBy(id_col)
        decided = (
            with_prior.withColumn("_brn", F.row_number().over(batch_w))
            .withColumn(
                "admit_rank",
                (F.col("_prior") + F.col("_brn")).cast("long"),
            )
            .withColumn("admitted", F.col("admit_rank") <= cap)
            .select(id_col, domain_col, "_dom", "admit_rank", "admitted")
            .localCheckpoint(eager=False)  # decisions AND counts
        )
        append(
            spark, decided.drop("_dom"), decisions_table,
            txn_id=f"{query_name}:{batch_id}:decisions",
        )
        new_counts = (
            decided.groupBy(F.col("_dom").alias("domain_key"))
            .agg(F.max("admit_rank").cast("long").alias("n_seen"))
            .withColumn(
                "n_admitted",
                F.least(F.col("n_seen"), F.lit(cap)).cast("long"),
            )
        )
        if counts is None:  # bootstrap: first write creates the table
            append(
                spark, new_counts, counts_table,
                txn_id=f"{query_name}:{batch_id}:counts",
            )
        else:
            upsert(
                spark, new_counts, counts_table, ["domain_key"],
                txn_id=f"{query_name}:{batch_id}:counts",
            )
        append(
            spark,
            fresh.select(F.col(id_col).alias("id")),
            ids_table,
            txn_id=f"{query_name}:{batch_id}:ids",
        )
        if compact_every and (batch_id + 1) % compact_every == 0:
            for table in (decisions_table, ids_table):
                try:
                    compact(
                        spark, table, target_parts=compact_target_parts
                    )
                except ValueError:
                    continue
                vacuum(table)
            vacuum(counts_table)  # upserts are rewrites: drop old gens

    return _gate
