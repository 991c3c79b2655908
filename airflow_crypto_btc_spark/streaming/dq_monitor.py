"""Streaming data-quality monitor (SURVEY §2.11 as a continuous process).

The reference runs ``quality_checks`` once per day after the fact
(`/root/reference/dags/dag_btc_daily.py:373-443`).  At pipeline scale the
same invariants want to be a *standing streaming aggregation*: every
(entity, 1-day window) accumulates row counts, null counts, and range
violations as rows arrive, and emits a pass/fail verdict as soon as the
watermark closes the window — no orchestrated audit run, no second scan of
the day's data.

One metric builder, two execution modes:

- ``quality_metrics(batch_df)``  → batch DQ report (DuckDB-oracle-checkable)
- ``streaming_quality_monitor(stream_df)`` → the same plan over
  ``readStream`` with a watermark; associative aggregates only (count /
  conditional count / min / max / decimal sum), so streaming partial
  merges are micro-batch-boundary independent and batch ≡ stream by
  construction (asserted in tests/test_streaming.py).

Scale: state is one small struct per (key, window) — bounded by watermark
eviction; the shuffle key is (key, window) so parallelism grows with both.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quality_metrics(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    key_cols: Sequence[str] = ("event_type",),
    window: str = "1 day",
    min_rows: int = 20,
    value_lo: float = 0.0,
    value_hi: float = 1e9,
) -> DataFrame:
    """Per-(key, window) DQ metrics + verdicts.

    Checks rendered as columns (reference rule → column):

    - Q2 row-count threshold → ``ok_rows``  (n_rows ≥ min_rows)
    - Q3 null-free values    → ``ok_nulls`` (n_null = 0)
    - range invariant        → ``ok_range`` (no value outside [lo, hi])
    - overall                → ``passed``   (conjunction)

    The mean uses a decimal sum (associative, shuffle-order-proof) rounded
    to 6 — identical under streaming partial-aggregate merge order.
    """
    val = F.col(value_col)
    agg = events.groupBy(
        *key_cols, F.window(F.col(ts_col), window).alias("win")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(val.isNull().cast("long")).alias("n_null"),
        F.sum((val < value_lo).cast("long")).alias("n_below"),
        F.sum((val > value_hi).cast("long")).alias("n_above"),
        F.min(val).alias("min_value"),
        F.max(val).alias("max_value"),
        F.sum(val.cast("decimal(38,6)")).alias("__sum_dec"),
        F.count(val).alias("__n_val"),
    )
    mean = F.when(
        F.col("__n_val") > 0,
        F.round(F.col("__sum_dec").cast("double") / F.col("__n_val"), 6),
    )
    return (
        agg.withColumn("mean_value", mean)
        .withColumn("ok_rows", F.col("n_rows") >= min_rows)
        .withColumn("ok_nulls", F.col("n_null") == 0)
        .withColumn(
            "ok_range", (F.col("n_below") == 0) & (F.col("n_above") == 0)
        )
        .withColumn(
            "passed",
            F.col("ok_rows") & F.col("ok_nulls") & F.col("ok_range"),
        )
        .select(
            *key_cols,
            F.col("win.start").cast("date").alias("date"),
            "n_rows",
            "n_null",
            "n_below",
            "n_above",
            "min_value",
            "max_value",
            "mean_value",
            "ok_rows",
            "ok_nulls",
            "ok_range",
            "passed",
        )
    )


def streaming_quality_monitor(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    key_cols: Sequence[str] = ("event_type",),
    window: str = "1 day",
    watermark: str = "1 day",
    min_rows: int = 20,
    value_lo: float = 0.0,
    value_hi: float = 1e9,
) -> DataFrame:
    """The same DQ aggregation over a stream: rows later than ``watermark``
    are dropped, windows finalize (and their state evicts) once the
    watermark passes, and each closed window emits exactly one verdict row
    in append mode."""
    return quality_metrics(
        events.withWatermark(ts_col, watermark),
        ts_col=ts_col,
        value_col=value_col,
        key_cols=key_cols,
        window=window,
        min_rows=min_rows,
        value_lo=value_lo,
        value_hi=value_hi,
    )
