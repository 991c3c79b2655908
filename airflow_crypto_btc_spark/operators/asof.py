"""As-of join and sessionization — time-series operators Spark lacks as
built-ins, composed from existing DataFrame ops (no UDFs, no Catalyst
extensions).

The reference aligns its daily series with ``lag`` over one global ordering
(``/root/reference/dags/dag_btc_daily.py:264``); these operators are the
multi-stream generalization a market-data / training-data pipeline needs.

**As-of join, the scalable way.**  The naive rendering — per left row, a
range-filtered subquery — is O(n·m) and unshufflable.  The union trick is
the Spark-first shape: tag both sides, union on the shared time axis, one
window pass carries the latest right-side payload forward, then keep left
rows.  Cost = one shuffle on the partition key + one sort: identical to a
sort-merge join, and skew-safe because the window key is the ``by`` entity.

**Sessionization** uses the native ``F.session_window`` gap-merge (batch and
streaming share it), so Catalyst plans a single aggregation — parallelism =
#entities, state bounded by the gap in streaming mode.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    by: Sequence[str] = (),
    value_cols: Sequence[str] | None = None,
    right_prefix: str = "r_",
) -> DataFrame:
    """Backward (most-recent-at-or-before) as-of left join.

    For each left row, attach the latest right row with
    ``right.ts <= left.ts`` within the same ``by`` group; nulls when no
    right row precedes.  Equivalent to DuckDB/pandas ``ASOF LEFT JOIN``.

    Implementation: union both sides over the time axis; within each ``by``
    partition ordered by (ts, side) — right rows sort before left rows at
    equal ts so "at-or-before" is inclusive — carry the last non-null right
    payload forward with ``last(ignorenulls)``; keep left rows.
    """
    if value_cols is None:
        value_cols = [
            c for c in right.columns if c != right_ts and c not in by
        ]
    by = list(by)

    payload = F.struct(
        F.col(right_ts).alias("__ts"),
        *[F.col(c) for c in value_cols],
    )
    # One frame shape = left's columns + (__t, __side, __payload); the `by`
    # columns ride inside left's columns on both sides.
    r = right.select(
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),  # right first at equal ts → inclusive
        payload.alias("__payload"),
        *[
            F.col(c) if c in by
            else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
        ],
    )
    l = left.select(  # noqa: E741
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
        *left.columns,
    )

    w = (
        Window.partitionBy(*by) if by else Window.partitionBy()
    ).orderBy("__t", "__side").rowsBetween(Window.unboundedPreceding, 0)
    carried = l.unionByName(r.select(*l.columns)).withColumn(
        "__match", F.last("__payload", ignorenulls=True).over(w)
    )
    out_cols = [F.col(c) for c in left.columns]
    out_cols.append(F.col("__match.__ts").alias(f"{right_prefix}{right_ts}"))
    out_cols += [
        F.col(f"__match.{c}").alias(f"{right_prefix}{c}") for c in value_cols
    ]
    return carried.filter(F.col("__side") == 1).select(*out_cols)


def sessionize(
    events: DataFrame,
    ts_col: str = "ts",
    key_cols: Sequence[str] = ("user_id",),
    gap: str = "30 minutes",
) -> DataFrame:
    """Gap-based sessionization: events of one entity belong to one session
    while consecutive gaps stay under ``gap``.  Native ``session_window``
    aggregation — one shuffle on the entity key, works identically over
    ``readStream`` (with a watermark) for the streaming variant."""
    return (
        events.groupBy(
            *key_cols, F.session_window(F.col(ts_col), gap).alias("w")
        )
        .agg(
            F.count("*").alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
        )
        .select(
            *key_cols,
            "session_start",
            "session_end",
            "n_events",
            (
                F.unix_micros(F.col("session_end").cast("timestamp"))
                - F.unix_micros(F.col("session_start").cast("timestamp"))
            ).alias("duration_us"),
        )
    )
