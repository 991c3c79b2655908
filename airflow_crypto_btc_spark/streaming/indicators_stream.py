"""Incremental indicators as a custom stateful streaming operator.

The reference recomputes ret/ma7/ma30/vol30 over the ENTIRE daily history
on every run (``/root/reference/dags/dag_btc_daily.py:254-295``) — O(history)
work per day, the anti-pattern called out in SURVEY §4.1.  This module is
the truly-incremental rendering: per-entity state carries only the trailing
``max(window)`` closes and returns, so each micro-batch does O(new rows)
work and emits exactly the same W1-W4 values the batch window operator
produces (``operators/indicators.py``).

One pure fold (``_fold_indicators``), two execution modes:

- ``batch_indicators_incremental``  — ``groupBy(key).applyInPandas`` over a
  bounded table; used by the ``indicators_incremental`` registry entry and
  oracle-checked against DuckDB window SQL.
- ``streaming_indicators`` — ``applyInPandasWithState`` over an unbounded
  stream: state = two ≤30-element double arrays per entity, checkpointed;
  restart resumes mid-history (tests/test_streaming_indicators.py).

Exact-semantics notes (mirrors operators/indicators.py line by line):

- ``min_periods`` gate: a k-row frame needs k non-null values → frame full
  AND every value present.  Null is carried as Python ``None`` in state
  (ArrayType(Double) keeps nulls); a genuine NaN (0/0 pct_change) counts as
  *present*, matching Spark's ``F.count`` (NaN is not null) rather than
  pandas' count — the engines only diverge on zero closes, which the
  fixtures exclude (see plans/registry.py determinism notes).
- Means accumulate left-to-right in frame order, exactly like Spark's
  WindowExec re-accumulation of sliding frames — bitwise-equal ma7/ma30.
- Sample std (ddof=1) is two-pass here vs Spark's moment accumulation: the
  last-ulp difference is why every consumer rounds vol columns to 6 before
  comparison (same rule as every windowed stddev in the registry).

Scale: the shuffle key is the entity; state per entity is two tiny arrays
(bounded by the largest window), evicted never (entities are long-lived) —
RocksDB state store holds millions of entities without pressure.  The input
is the *daily* table (already aggregated), so per-key volume is days, not
raw events.
"""

from __future__ import annotations

import math
from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DateType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

_STATE_SCHEMA = StructType(
    [
        StructField("closes", ArrayType(DoubleType(), True)),
        StructField("rets", ArrayType(DoubleType(), True)),
    ]
)


def _output_schema(
    key_col: str, ma_windows: Sequence[int], vol_windows: Sequence[int]
) -> StructType:
    fields = [
        StructField(key_col, StringType()),
        StructField("date", DateType()),
        StructField("close", DoubleType()),
        StructField("ret", DoubleType()),
    ]
    fields += [StructField(f"ma{k}", DoubleType()) for k in ma_windows]
    fields += [StructField(f"vol{k}", DoubleType()) for k in vol_windows]
    return StructType(fields)


def _gated_mean(buf: list, k: int):
    """pandas rolling(k, min_periods=k).mean() over the buffer tail: the
    frame must hold k rows, all non-null; sum left-to-right (= Spark's
    in-order frame accumulation)."""
    win = buf[-k:]
    if len(win) < k or any(v is None for v in win):
        return None
    acc = 0.0
    for v in win:
        acc += v
    return acc / k


def _gated_std(buf: list, k: int):
    """rolling(k, min_periods=k).std() — SAMPLE std (ddof=1), two-pass."""
    win = buf[-k:]
    if len(win) < k or any(v is None for v in win):
        return None
    mean = 0.0
    for v in win:
        mean += v
    mean /= k
    m2 = 0.0
    for v in win:
        m2 += (v - mean) ** 2
    return math.sqrt(m2 / (k - 1))


def _fold_indicators(
    closes_in: list,
    state_closes: list,
    state_rets: list,
    ma_windows: Sequence[int],
    vol_windows: Sequence[int],
) -> tuple[dict, list, list]:
    """Fold new daily closes (chronological) onto carried buffers; returns
    per-row indicator columns and the trimmed new buffers.  The ret kernel
    replicates operators/indicators.py branch for branch (±inf on x/0, NaN
    on 0/0 — pandas pct_change semantics, SURVEY §7 hard-part 5)."""
    keep_c = max(ma_windows)
    keep_r = max(vol_windows)
    out: dict[str, list] = {"ret": []}
    for k in ma_windows:
        out[f"ma{k}"] = []
    for k in vol_windows:
        out[f"vol{k}"] = []
    for close in closes_in:
        prev = state_closes[-1] if state_closes else None
        if prev is None or close is None:
            ret = None
        elif prev != 0:
            ret = close / prev - 1.0
        elif close > 0:
            ret = float("inf")
        elif close < 0:
            ret = float("-inf")
        else:
            ret = float("nan")
        state_closes.append(close)
        del state_closes[:-keep_c]
        state_rets.append(ret)
        del state_rets[:-keep_r]
        out["ret"].append(ret)
        for k in ma_windows:
            out[f"ma{k}"].append(_gated_mean(state_closes, k))
        for k in vol_windows:
            out[f"vol{k}"].append(_gated_std(state_rets, k))
    return out, state_closes, state_rets


def _row_closes(pdf: pd.DataFrame, close_col: str) -> list:
    """float-or-None closes: a Spark null surfaces as NaN after Arrow —
    map it back to None (fixtures have no genuine-NaN closes)."""
    return [
        None if pd.isna(c) else float(c) for c in pdf[close_col].tolist()
    ]


def _out_pdf(
    key_val, key_col: str, pdf: pd.DataFrame, cols: dict
) -> pd.DataFrame:
    data = {
        key_col: [key_val] * len(pdf),
        "date": pdf["date"].values,
        "close": pdf["close"].values,
    }
    # object dtype keeps None (→ Spark null) distinct from float NaN
    for name, values in cols.items():
        data[name] = pd.Series(values, dtype="object")
    return pd.DataFrame(data)


def batch_indicators_incremental(
    daily: DataFrame,
    key_col: str = "event_type",
    date_col: str = "date",
    close_col: str = "close",
    ma_windows: Sequence[int] = (7, 30),
    vol_windows: Sequence[int] = (30,),
) -> DataFrame:
    """The same fold over a bounded table: one pass per key from empty
    state.  Exists so the stateful kernel is DuckDB-oracle-checkable (the
    streaming variant is bit-identical by construction — same function)."""
    schema = _output_schema(key_col, ma_windows, vol_windows)

    def fn(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(date_col).reset_index(drop=True)
        cols, _, _ = _fold_indicators(
            _row_closes(pdf, close_col), [], [], ma_windows, vol_windows
        )
        return _out_pdf(key[0], key_col, pdf, cols)

    return (
        daily.select(
            F.col(key_col),
            F.col(date_col).alias("date"),
            F.col(close_col).alias("close"),
        )
        .groupBy(key_col)
        .applyInPandas(fn, schema)
    )


def streaming_indicators(
    daily: DataFrame,
    key_col: str = "asset",
    date_col: str = "date",
    close_col: str = "close",
    ma_windows: Sequence[int] = (7, 30),
    vol_windows: Sequence[int] = (30,),
) -> DataFrame:
    """W1-W4 as an incremental stateful streaming operator.  Assumes
    per-key chronological arrival across micro-batches (the landing pattern
    of the reference's daily catchup); within a batch rows are sorted.
    Late/replayed days need the batch path — same rule as the reference,
    which re-runs a day rather than reordering history."""
    schema = _output_schema(key_col, ma_windows, vol_windows)

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        pdf = (
            pd.concat(list(pdfs), ignore_index=True)
            .sort_values(date_col)
            .reset_index(drop=True)
        )
        if state.exists:
            closes, rets = state.get
            closes, rets = list(closes), list(rets)
        else:
            closes, rets = [], []
        cols, closes, rets = _fold_indicators(
            _row_closes(pdf, close_col), closes, rets, ma_windows,
            vol_windows,
        )
        state.update((closes, rets))
        yield _out_pdf(key[0], key_col, pdf, cols)

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
            # each day is emitted exactly once, when first folded — append
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
