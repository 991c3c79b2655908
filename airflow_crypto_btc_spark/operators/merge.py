"""Merge writers — unique-index semantics without an index (S5, S8, S7).

The reference relies on SQLite machinery Spark does not have:

- ``INSERT OR IGNORE`` + unique index on ``(ts_utc, asset)``
  (``/root/reference/dags/dag_btc_daily.py:147-155``): on key collision the
  EXISTING row wins (first-writer-wins).          → :func:`append_ignore`
- ``INSERT ... ON CONFLICT(date) DO UPDATE`` (``:219-230``): on collision the
  NEW row wins for the updated columns (last-writer-wins).
                                                  → :func:`upsert_by_key`
- ``BEGIN; DELETE; INSERT; COMMIT`` transactional rewrite (``:287-295``).
                                                  → :func:`overwrite_atomic`

Scale notes: both merges are joins on the key.  ``append_ignore`` is a
left-anti join — when the incoming batch is small relative to stored state
(the reference's case: one day vs full history), Spark should broadcast the
*incoming* side; we hint that explicitly when ``broadcast_incoming=True``.
At 100 TB the stored side is never collected or broadcast; with the state
bucketed/partitioned by the key the anti-join is shuffle-free on the stored
side (DPP prunes untouched day-partitions).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_keep_first(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str | Sequence[str],
) -> DataFrame:
    """D1 ``drop_duplicates(subset=...)`` keep='first'
    (reference ``:93``) made deterministic: survivor = min ``order_col`` row
    per key via row_number, never shuffle-order-dependent ``dropDuplicates``.
    ``order_col`` may be a list — add a unique tie-breaker column when the
    primary order can tie.
    """
    from pyspark.sql import Window

    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def append_ignore(
    existing: DataFrame,
    incoming: DataFrame,
    key_cols: Sequence[str],
    order_col: str | None = None,
    broadcast_incoming: bool = False,
) -> DataFrame:
    """S5: append ``incoming`` rows whose key is absent from ``existing``;
    existing rows win.  Within ``incoming``, intra-batch duplicates keep the
    first occurrence by ``order_col`` (mirrors unique-index behavior row by
    row).  Returns the merged table (caller writes it / inspects it).
    """
    if order_col is not None:
        incoming = dedup_keep_first(incoming, key_cols, order_col)
    inc = F.broadcast(incoming) if broadcast_incoming else incoming
    new_rows = inc.join(existing.select(*key_cols), list(key_cols), "left_anti")
    return existing.unionByName(new_rows.select(*existing.columns))


def upsert_by_key(
    existing: DataFrame,
    incoming: DataFrame,
    key_cols: Sequence[str],
    update_cols: Sequence[str] | None = None,
) -> DataFrame:
    """S8: keyed upsert — new row wins for ``update_cols``, columns not in
    ``update_cols`` keep the existing value (the reference's upsert updates
    OHLC but leaves ret/ma7/ma30/vol30 untouched, ``:219-230``).

    Implemented as a full outer join on the key:
      - key only in existing → existing row unchanged
      - key only in incoming → new row (non-update columns null, as in the
        reference where indicators start NULL, ``:207-215``)
      - key in both → update_cols from incoming, rest from existing
    """
    keys = list(key_cols)
    non_keys = [c for c in existing.columns if c not in keys]
    if update_cols is None:
        update_cols = [c for c in incoming.columns if c not in keys]

    # Presence marker: a data column being null must not be confused with
    # "key absent from incoming".
    e = existing.alias("e")
    i = incoming.withColumn("__in_incoming", F.lit(True)).alias("i")
    joined = e.join(i, keys, "full_outer")
    in_incoming = F.col("i.__in_incoming").isNotNull()
    # Key columns survive the join unqualified (join on name list).
    cols = [F.col(k) for k in keys]
    for c in non_keys:
        if c in update_cols and c in incoming.columns:
            cols.append(
                F.when(in_incoming, F.col(f"i.{c}"))
                .otherwise(F.col(f"e.{c}"))
                .alias(c)
            )
        else:
            cols.append(F.col(f"e.{c}").alias(c))
    return joined.select(*cols)


def overwrite_atomic(df: DataFrame, path: str) -> None:
    """S7: transactional full-table rewrite.  Spark's ``mode("overwrite")``
    stages to ``_temporary`` and commits via rename — readers of the old
    snapshot never see a half-written table (Delta/Iceberg make this fully
    ACID; plain parquet is atomic per job commit)."""
    df.write.mode("overwrite").parquet(path)


def overwrite_day_partitions(
    df: DataFrame, path: str, partition_col: str = "date"
) -> None:
    """Dynamic partition overwrite: rewrite ONLY the partitions present in
    ``df``, leaving sibling partitions' files untouched — the idempotent
    per-day re-run the reference gets from its day-keyed upsert
    (``/root/reference/dags/dag_btc_daily.py:219-230``), expressed as a
    partitioned-table write.  At 100 TB this is the difference between
    re-running one day (one partition swap) and rewriting the table."""
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(path)
    )
