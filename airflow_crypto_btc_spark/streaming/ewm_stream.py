"""Streaming EWM family (EMA / MACD / signal) with O(1) state per key.

The batch operator (`operators/ta.ewm_indicators`) replays each key's whole
history per run; the recursive form ``ema_t = a·x_t + (1−a)·ema_{t-1}``
needs only the previous EMA — so the streaming rendering carries exactly
four doubles per entity (ema_fast, ema_slow, signal, seeded flag) and does
O(new rows) work per micro-batch.  This is the strongest contrast with the
windowed indicators (`indicators_stream` buffers max(window) values): EWM
state does not grow with the window at all.

The fold uses the identical floating-point operation order as the batch
operator and its recursive-CTE oracle, so all three agree bit-for-bit
before rounding.  Same arrival contract as `streaming_indicators`:
per-key chronological across micro-batches, sorted within a batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    DateType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

_STATE_SCHEMA = StructType(
    [
        StructField("ema_fast", DoubleType()),
        StructField("ema_slow", DoubleType()),
        StructField("signal", DoubleType()),
        StructField("seeded", BooleanType()),
    ]
)


def _out_schema(key_col: str) -> StructType:
    return StructType(
        [
            StructField(key_col, StringType()),
            StructField("date", DateType()),
            StructField("close", DoubleType()),
            StructField("ema_fast", DoubleType()),
            StructField("ema_slow", DoubleType()),
            StructField("macd", DoubleType()),
            StructField("signal", DoubleType()),
        ]
    )


def _fold_ewm(
    closes: list,
    state: tuple,
    a_fast: float,
    a_slow: float,
    a_sig: float,
) -> tuple[dict, tuple]:
    """Fold new closes onto (ema_fast, ema_slow, signal, seeded) — the
    exact ``a·x + (1−a)·prev`` op order of operators/ta.ewm_indicators."""
    ef, es, sig, seeded = state
    out = {"ema_fast": [], "ema_slow": [], "macd": [], "signal": []}
    for x in closes:
        if not seeded:
            ef, es = x, x
            sig = 0.0  # macd_1 = x - x = 0 seeds the signal line
            seeded = True
        else:
            ef = a_fast * x + (1.0 - a_fast) * ef
            es = a_slow * x + (1.0 - a_slow) * es
            sig = a_sig * (ef - es) + (1.0 - a_sig) * sig
        out["ema_fast"].append(ef)
        out["ema_slow"].append(es)
        out["macd"].append(ef - es)
        out["signal"].append(sig)
    return out, (ef, es, sig, seeded)


def streaming_ewm(
    daily: DataFrame,
    key_col: str = "asset",
    date_col: str = "date",
    close_col: str = "close",
    span_fast: int = 12,
    span_slow: int = 26,
    span_signal: int = 9,
) -> DataFrame:
    a_fast = 2.0 / (span_fast + 1)
    a_slow = 2.0 / (span_slow + 1)
    a_sig = 2.0 / (span_signal + 1)
    schema = _out_schema(key_col)

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        pdf = (
            pd.concat(list(pdfs), ignore_index=True)
            .sort_values(date_col)
            .reset_index(drop=True)
        )
        st = state.get if state.exists else (0.0, 0.0, 0.0, False)
        closes = [float(c) for c in pdf[close_col].tolist()]
        cols, st = _fold_ewm(closes, st, a_fast, a_slow, a_sig)
        state.update(st)
        yield pd.DataFrame(
            {
                key_col: [key[0]] * len(pdf),
                "date": pdf[date_col].values,
                "close": pdf[close_col].values,
                **cols,
            }
        )

    return (
        daily.select(
            F.col(key_col),
            F.col(date_col).alias("date"),
            F.col(close_col).alias("close"),
        )
        .groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType=schema,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
