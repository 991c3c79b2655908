"""Streaming Count-Min sketch maintenance: fold each micro-batch's
token frequencies into a persisted sketch table by APPENDING the
batch's partial sketch — CM sketches are additive under union, so the
merged sketch is just the cell-wise sum over everything committed and
a batch contributes its counts exactly once via the txn-id idempotent
append (crash-replay of a batch id is a no-op commit, not a double
count).

This is the sketch's scale story: the hot path never reads the
existing sketch (no read-modify-write, no upsert contention — one
bounded append of ≤ depth × width skinny rows per batch), and serving
(``operators/sketch.cms_from_table``) folds the history with one
bounded aggregation.  ``merge_every`` bounds the history: every N
batches the history is re-aggregated to ≤ depth × width rows and
committed as one overwrite.  The merge preserves every estimate
bit-for-bit (sum of sums); because txn ids live in the commit LOG,
which ``vacuum`` trims, the merge+vacuum pair assumes the stream's
replay horizon is the most recent batch (Structured Streaming's
contract) — the same quiesced-maintenance doctrine as clustered
compaction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airflow_crypto_btc_spark.operators.sketch import cms_build
from airflow_crypto_btc_spark.sources.snapshot_table import (
    append,
    overwrite,
    read_snapshot,
    vacuum,
)


def cms_merge(spark: SparkSession, sketch_table: str) -> None:
    """Collapse the per-batch history to one ≤ depth × width row set
    (one overwrite commit).  Cell-wise sum of sums — no estimate
    changes.  Run from the maintenance path (or ``merge_every``), not
    concurrently with an unbounded replay horizon."""
    merged = (
        read_snapshot(spark, sketch_table)
        .groupBy("d", "w")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    overwrite(spark, merged, sketch_table)
    vacuum(sketch_table)


def cms_sink(
    sketch_table: str,
    query_name: str,
    depth: int = 4,
    width: int = 256,
    text_col: str = "text",
    merge_every: int | None = None,
):
    """``foreachBatch`` callback folding each batch's partial sketch
    into the table."""

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        part = cms_build(
            batch_df, depth=depth, width=width, text_col=text_col
        )
        committed = append(
            spark, part, sketch_table,
            txn_id=f"{query_name}:{batch_id}",
        )
        if committed == -1:
            # crash-replay of an already-committed batch: the append
            # was an idempotent no-op, so maintenance must not commit
            # either — a replay folds NOTHING, not even a merge
            return
        if merge_every and (batch_id + 1) % merge_every == 0:
            cms_merge(spark, sketch_table)

    return _fold


def hll_sink(
    registers_table: str,
    query_name: str,
    m: int = 16,
    text_col: str = "text",
    merge_every: int | None = None,
):
    """``foreachBatch`` callback folding each batch's partial HLL
    registers into the table — same no-read-modify-write shape as
    ``cms_sink``; the merge is per-bucket MAX instead of sum, which
    additionally makes RE-DELIVERED DATA harmless (max is idempotent:
    replaying rows can never inflate a register, only the txn-id guard
    is needed for commit dedup)."""
    from airflow_crypto_btc_spark.operators.sketch import (
        hll_from_table,
        hll_registers,
    )

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        part = hll_registers(batch_df, m=m, text_col=text_col)
        committed = append(
            spark, part, registers_table,
            txn_id=f"{query_name}:{batch_id}",
        )
        if committed == -1:
            return  # replay: no append, no maintenance (see cms_sink)
        if merge_every and (batch_id + 1) % merge_every == 0:
            merged = hll_from_table(spark, registers_table)
            overwrite(spark, merged, registers_table)
            vacuum(registers_table)

    return _fold


def qhist_sink(
    registers_table: str,
    query_name: str,
    value_col: str = "value",
    merge_every: int | None = None,
):
    """``foreachBatch`` callback folding each batch's partial quantile
    registers into the table — the CM-sketch shape exactly (counts are
    additive under union, the grid is fixed so batch registers always
    align cell-for-cell): one bounded append of ≤n_buckets skinny rows
    per batch, txn-id idempotent, no read-modify-write on the hot
    path; serving folds history with ``sketch.qhist_from_table``."""
    from airflow_crypto_btc_spark.operators.sketch import (
        qhist_from_table,
        qhist_registers,
    )

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        part = qhist_registers(batch_df, value_col=value_col)
        committed = append(
            spark, part, registers_table,
            txn_id=f"{query_name}:{batch_id}",
        )
        if committed == -1:
            return  # replay: no append, no maintenance (see cms_sink)
        if merge_every and (batch_id + 1) % merge_every == 0:
            merged = qhist_from_table(spark, registers_table)
            overwrite(spark, merged, registers_table)
            vacuum(registers_table)

    return _fold


def kmv_merge(
    spark: SparkSession,
    sketch_table: str,
    group_cols: list[str],
    k: int = 32,
) -> None:
    """Collapse the per-batch KMV history to the merged ≤ k rows per
    group (one overwrite commit).  The theta union law (k smallest of
    the unioned sketches == sketch of the union) means no estimate
    changes — same maintenance doctrine as :func:`cms_merge`."""
    from airflow_crypto_btc_spark.operators.sketch import kmv_from_table

    overwrite(
        spark, kmv_from_table(spark, sketch_table, group_cols, k=k),
        sketch_table,
    )
    vacuum(sketch_table)


def kmv_sink(
    sketch_table: str,
    query_name: str,
    key_expr: str,
    group_cols: list[str],
    k: int = 32,
    merge_every: int | None = None,
):
    """``foreachBatch`` callback folding each batch's partial KMV
    sketch into the table — the same no-read-modify-write shape as
    :func:`cms_sink`: the hot path appends the batch's own ≤ k rows
    per group (txn-id idempotent; a crash-replayed batch folds
    nothing), and serving (``operators/sketch.kmv_from_table``) takes
    the k smallest of the unioned history.  KMV is the one register
    sketch here that is NOT decrementable even in principle (an
    evicted key may have displaced other minima that are gone for
    good), so takedown policy lists ``kmv_minima`` as
    rebuild_required (operators/takedown.NON_DECREMENTABLE)."""
    from airflow_crypto_btc_spark.operators.sketch import kmv_sketch

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        part = kmv_sketch(batch_df, key_expr, group_cols, k=k)
        committed = append(
            spark, part, sketch_table,
            txn_id=f"{query_name}:{batch_id}",
        )
        if committed == -1:
            return  # crash-replay: fold nothing, merge nothing
        if merge_every and (batch_id + 1) % merge_every == 0:
            kmv_merge(spark, sketch_table, group_cols, k=k)

    return _fold
