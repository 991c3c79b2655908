"""Technical-analysis extensions beyond the reference's four indicators.

The reference computes ret / ma7 / ma30 / vol30 with pandas rolling windows
(``/root/reference/dags/dag_btc_daily.py:264-267``).  This module widens the
same *family* — trailing-window indicators over a keyed daily series — with
the standard crypto-TA set a user of that pipeline would add next: RSI,
Bollinger bands, rolling median, z-score outlier flags, and the recursive
EWM family (EMA / MACD / signal line).

Design split:

- Everything with a *finite* trailing frame (RSI, Bollinger, median,
  z-score) is a pure window expression — JVM-side, one exchange+sort shared
  across the whole indicator family, parallel in the number of keys.
- The EWM family is **recursive** (``ema_t = a*x_t + (1-a)*ema_{t-1}``) —
  inexpressible as a Spark window frame.  It runs as an Arrow-batched
  ``applyInPandas`` per key: the input is the *aggregated daily* table, so a
  key's whole history is a few thousand rows even after decades; parallelism
  is #keys and state is O(1) per key.  At 100 TB of raw events the daily
  table this consumes is still tiny — the heavy lifting happened in the
  upstream OHLC groupBy.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _gate(col: Column, frame, agg: Column, min_periods: int) -> Column:
    """pandas ``rolling(w, min_periods=k)`` gate (non-null count)."""
    return F.when(F.count(col).over(frame) >= min_periods, agg)


def with_rsi(
    df: DataFrame,
    date_col: str = "date",
    close_col: str = "close",
    key_cols: Sequence[str] = ("event_type",),
    period: int = 14,
    out_col: str = "rsi14",
) -> DataFrame:
    """Cutler's RSI (simple-moving-average variant): trailing mean of gains
    over trailing mean of losses.  ``rsi = 100 - 100/(1 + gain/loss)``; a
    zero average loss pegs RSI at 100.  Null until `period` non-null diffs
    exist — same ``min_periods`` discipline as W2-W4."""
    w = Window.partitionBy(*key_cols).orderBy(date_col)
    f = w.rowsBetween(-(period - 1), 0)
    close = F.col(close_col)
    diff = close - F.lag(close, 1).over(w)
    df = df.withColumn("_diff", diff)
    d = F.col("_diff")
    gain = F.greatest(d, F.lit(0.0))
    loss = F.greatest(-d, F.lit(0.0))
    avg_gain = F.avg(gain).over(f)
    avg_loss = F.avg(loss).over(f)
    rsi = F.when(avg_loss == 0, F.lit(100.0)).otherwise(
        F.lit(100.0) - F.lit(100.0) / (F.lit(1.0) + avg_gain / avg_loss)
    )
    return df.withColumn(out_col, _gate(d, f, rsi, period)).drop("_diff")


def with_bollinger(
    df: DataFrame,
    date_col: str = "date",
    close_col: str = "close",
    key_cols: Sequence[str] = ("event_type",),
    period: int = 20,
    n_std: float = 2.0,
) -> DataFrame:
    """Bollinger bands: mid = trailing mean, upper/lower = mid ± n·stddev
    (sample std, matching the reference's ddof=1 choice for vol30), and
    %B = (close − lower)/(upper − lower).  All gated at `period`."""
    w = Window.partitionBy(*key_cols).orderBy(date_col)
    f = w.rowsBetween(-(period - 1), 0)
    close = F.col(close_col)
    mid = _gate(close, f, F.avg(close).over(f), period)
    sd = _gate(close, f, F.stddev_samp(close).over(f), period)
    df = df.withColumn("bb_mid", mid).withColumn("_sd", sd)
    upper = F.col("bb_mid") + F.lit(n_std) * F.col("_sd")
    lower = F.col("bb_mid") - F.lit(n_std) * F.col("_sd")
    # ANSI mode: guard the zero-width band (flat window) division.
    pct_b = F.when(
        F.col("_sd") > 0, (close - lower) / (upper - lower)
    )
    return (
        df.withColumn("bb_upper", upper)
        .withColumn("bb_lower", lower)
        .withColumn("bb_pct_b", pct_b)
        .drop("_sd")
    )


def with_rolling_median(
    df: DataFrame,
    date_col: str = "date",
    close_col: str = "close",
    key_cols: Sequence[str] = ("event_type",),
    period: int = 7,
    out_col: str = "median7",
) -> DataFrame:
    """Exact trailing median (odd `period` → order statistic, no
    interpolation ambiguity across engines).  Spark's exact ``median`` /
    ``percentile`` aggregates reject window frames, so the frame is
    materialized with ``collect_list`` (a constant `period` values per
    key-day — bounded state) and the middle order statistic selected with
    ``array_sort`` + ``element_at``."""
    if period % 2 == 0:
        raise ValueError("period must be odd for an exact order statistic")
    w = Window.partitionBy(*key_cols).orderBy(date_col)
    f = w.rowsBetween(-(period - 1), 0)
    close = F.col(close_col)
    mid = F.element_at(
        F.array_sort(F.collect_list(close).over(f)), (period + 1) // 2
    )
    return df.withColumn(out_col, _gate(close, f, mid, period))


def with_zscore_outliers(
    df: DataFrame,
    date_col: str = "date",
    close_col: str = "close",
    key_cols: Sequence[str] = ("event_type",),
    period: int = 30,
    threshold: float = 2.0,
) -> DataFrame:
    """Return z-score vs the trailing window: z = (ret − mean)/std over the
    last `period` rows, gated like vol30; flags |z| > threshold.  The
    anomaly-detection twin of W4."""
    w = Window.partitionBy(*key_cols).orderBy(date_col)
    f = w.rowsBetween(-(period - 1), 0)
    close = F.col(close_col)
    prev = F.lag(close, 1).over(w)
    ret = F.when(prev != 0, close / prev - F.lit(1.0))
    df = df.withColumn("ret", ret)
    r = F.col("ret")
    mean = F.avg(r).over(f)
    sd = F.stddev_samp(r).over(f)
    z = _gate(r, f, F.when(sd > 0, (r - mean) / sd), period)
    # Non-null boolean: an ungated/undefined z-score is "not an outlier"
    # (nullable booleans surface as NaN-vs-None across engine boundaries).
    return df.withColumn("zscore", z).withColumn(
        "is_outlier",
        F.coalesce(F.abs(F.col("zscore")) > threshold, F.lit(False)),
    )


def ewm_indicators(
    df: DataFrame,
    date_col: str = "date",
    close_col: str = "close",
    key_cols: Sequence[str] = ("event_type",),
    span_fast: int = 12,
    span_slow: int = 26,
    span_signal: int = 9,
) -> DataFrame:
    """EMA(fast) / EMA(slow) / MACD / signal line, pandas ``ewm(span,
    adjust=False)`` semantics seeded at the first value:

        ema_1 = x_1;   ema_t = a·x_t + (1−a)·ema_{t-1},  a = 2/(span+1)

    Recursive state ⇒ not a window frame.  Runs as ``applyInPandas`` over
    key groups: Arrow-batched, one linear pass per key, parallel in #keys.
    The recurrence is written with exactly the ``a·x + (1−a)·prev``
    floating-point operation order so a recursive-CTE oracle using the same
    expression reproduces it bit-for-bit (then both sides round)."""
    a_fast = 2.0 / (span_fast + 1)
    a_slow = 2.0 / (span_slow + 1)
    a_sig = 2.0 / (span_signal + 1)
    keys = list(key_cols)

    key_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.name in keys
    )
    date_type = df.schema[date_col].dataType.simpleString()
    out_schema = (
        f"{key_fields}, {date_col} {date_type}, {close_col} double, "
        "ema_fast double, ema_slow double, macd double, signal double"
    )

    def _ewm(x: np.ndarray, alpha: float) -> np.ndarray:
        out = np.empty_like(x)
        prev = x[0]
        out[0] = prev
        for i in range(1, len(x)):
            prev = alpha * x[i] + (1.0 - alpha) * prev
            out[i] = prev
        return out

    def compute(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(date_col).reset_index(drop=True)
        x = pdf[close_col].to_numpy(dtype=np.float64)
        ema_f = _ewm(x, a_fast)
        ema_s = _ewm(x, a_slow)
        macd = ema_f - ema_s
        sig = _ewm(macd, a_sig)
        return pd.DataFrame(
            {
                **{k: pdf[k] for k in keys},
                date_col: pdf[date_col],
                close_col: pdf[close_col],
                "ema_fast": ema_f,
                "ema_slow": ema_s,
                "macd": macd,
                "signal": sig,
            }
        )

    cols = keys + [date_col, close_col]
    return df.select(*cols).groupBy(*keys).applyInPandas(compute, out_schema)
