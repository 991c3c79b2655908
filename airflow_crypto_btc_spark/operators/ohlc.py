"""Daily OHLC aggregation (operator A1, `agg_ohlc_daily`).

Reference semantics (``/root/reference/dags/dag_btc_daily.py:196-199``): from
the day's rows *ordered by timestamp*, ``open = first(price)``,
``high = max``, ``low = min``, ``close = last(price)``.

Spark-first rendering: the reference relies on a pre-sorted frame and
positional ``iloc[0]/iloc[-1]``; after a shuffle that order is gone, and
``F.first/F.last`` are nondeterministic.  ``min_by``/``max_by`` make the
order explicit *inside the aggregate*, so the plan is a single hash
aggregation with map-side partial aggregation — no sort, no window, one
shuffle on the grouping key.  At 100 TB this is the cheapest possible shape:
partial OHLC states are combined associatively across executors.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def daily_ohlc(
    df: DataFrame,
    ts_col: str = "ts",
    price_col: str = "value",
    key_cols: Sequence[str] = ("event_type",),
) -> DataFrame:
    """Aggregate per-(key, day) OHLC + observation count.

    ``n_obs`` doubles as the data-quality row-count input (Q2,
    reference ``:398-411`` — expects ≥20 hourly candles per day).
    """
    return (
        df.groupBy(*key_cols, F.to_date(F.col(ts_col)).alias("date"))
        .agg(
            F.min_by(price_col, ts_col).alias("open"),
            F.max(price_col).alias("high"),
            F.min(price_col).alias("low"),
            F.max_by(price_col, ts_col).alias("close"),
            F.count(price_col).alias("n_obs"),
        )
    )
