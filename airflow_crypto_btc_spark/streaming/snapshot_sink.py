"""Exactly-once streaming sink into the log-structured snapshot table.

Structured Streaming's file sink is append-only with its own manifest; the
engine's snapshot table (sources/snapshot_table.py) already has an ACID
commit log with idempotent ``txn_id`` commits.  Marrying them via
``foreachBatch`` gives streaming writes the same guarantee Delta's
``txnAppId``/``txnVersion`` pattern provides:

- each micro-batch commits once, keyed ``<query_name>:<batch_id>``;
- a REPLAYED batch (failure between sink write and checkpoint advance, or
  a full re-run against a fresh checkpoint) finds its txn_id already in
  the log and stages nothing — at-least-once delivery from the source
  becomes exactly-once table state (asserted in
  tests/test_streaming_joins.py::test_snapshot_sink_replay_is_exactly_once).

Readers concurrently see only whole committed versions — never a torn
micro-batch — because visibility is the atomic log append, not the data
file write.
"""

from __future__ import annotations

from airflow_crypto_btc_spark.sources.snapshot_table import append


def snapshot_append_sink(table: str, query_name: str):
    """``foreachBatch`` callback: idempotent transactional append of each
    micro-batch into ``table``."""

    def _write(batch_df, batch_id: int) -> None:
        append(
            batch_df.sparkSession,
            batch_df,
            table,
            txn_id=f"{query_name}:{batch_id}",
        )

    return _write
