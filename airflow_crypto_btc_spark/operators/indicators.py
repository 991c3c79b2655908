"""Rolling-window indicators (operators W1-W4) with exact pandas semantics.

Reference (``/root/reference/dags/dag_btc_daily.py:264-267``):

    ret   = close.pct_change()                      # W1
    ma7   = close.rolling(7,  min_periods=7).mean() # W2
    ma30  = close.rolling(30, min_periods=30).mean()# W3
    vol30 = ret.rolling(30, min_periods=30).std()   # W4  (sample std, ddof=1)

Semantics that must hold exactly (SURVEY §2.5, §7 "hard parts" #1):

- ``min_periods`` counts **non-null** values in the trailing frame →
  ``F.when(F.count(x).over(frame) >= k, agg.over(frame))``.  ``F.count(col)``
  counts non-nulls, matching pandas precisely.
- ``vol30`` is a rolling std of a *derived null-leading* column (``ret[0]``
  is null), so its first non-null value lands one row AFTER ``ma30``'s.
- pandas ``.std()`` default is ddof=1 → ``stddev_samp``, never ``stddev_pop``.

Scale notes: all frames share one window family
(``partitionBy(keys).orderBy(date)``), so Catalyst plans a single
exchange+sort and evaluates every indicator in one Window operator pass.
Parallelism = #keys (assets/entities); per-key history is bounded (days), so
no single partition can blow up even at 100 TB of raw events — the window
input is the *aggregated* daily table.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _gated_rolling(col: Column, frame, agg, min_periods: int) -> Column:
    """pandas ``rolling(w, min_periods=k)`` gate: null until k non-null
    values are inside the trailing frame."""
    return F.when(F.count(col).over(frame) >= min_periods, agg.over(frame))


def with_indicators(
    df: DataFrame,
    date_col: str = "date",
    close_col: str = "close",
    key_cols: Sequence[str] = ("event_type",),
    ma_short: int = 7,
    ma_long: int = 30,
    vol_window: int = 30,
) -> DataFrame:
    """Append ret / ma7 / ma30 / vol30 columns (names fixed to match the
    reference's ``daily_metrics`` DDL, ``:203-217``)."""
    w = Window.partitionBy(*[F.col(k) for k in key_cols]).orderBy(date_col)
    f_short = w.rowsBetween(-(ma_short - 1), 0)
    f_long = w.rowsBetween(-(ma_long - 1), 0)
    f_vol = w.rowsBetween(-(vol_window - 1), 0)

    close = F.col(close_col)
    prev = F.lag(close, 1).over(w)
    # pandas pct_change on a 0 previous close yields ±inf (x/0) or NaN
    # (0/0).  Spark 4 runs ANSI mode by default, where a bare division by
    # zero THROWS — so the zero-divisor branches are made explicit, both
    # reproducing the reference semantics (SURVEY §7 hard-part 5) and
    # keeping the pipeline alive on degenerate data.  (DuckDB returns NULL
    # for double x/0 — the oracle fixtures contain no zero closes, so the
    # engines agree wherever the comparison runs.)
    ret = (
        F.when(prev.isNull(), F.lit(None).cast("double"))
        .when(prev != 0, close / prev - F.lit(1.0))
        .when(close > 0, F.lit(float("inf")))
        .when(close < 0, F.lit(float("-inf")))
        .otherwise(F.lit(float("nan")))
    )

    df = df.withColumn("ret", ret)
    r = F.col("ret")
    return (
        df.withColumn(
            "ma7", _gated_rolling(close, f_short, F.avg(close), ma_short)
        )
        .withColumn(
            "ma30", _gated_rolling(close, f_long, F.avg(close), ma_long)
        )
        .withColumn(
            "vol30", _gated_rolling(r, f_vol, F.stddev_samp(r), vol_window)
        )
    )


def trailing_days_slice(
    df: DataFrame, end_date, days: int = 60, date_col: str = "date"
) -> DataFrame:
    """W5 / P6: last-N-calendar-days view (reference ``:339-341``), inclusive
    on both ends — a partition-prunable filter, not a window."""
    end = F.lit(end_date).cast("date")
    return df.filter(F.col(date_col).between(F.date_sub(end, days), end))
