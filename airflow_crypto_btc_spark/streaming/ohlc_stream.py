"""Structured Streaming rendering of the daily OHLC pipeline (SURVEY §2.9).

The reference is strictly batch, but its schedule — ``@daily`` with
``catchup=True`` and per-day idempotent folds
(``/root/reference/dags/dag_btc_daily.py:15-16, :52-53``) — is exactly the
incremental micro-batch pattern.  This module is the streaming-native
variant:

- **Source**: a file stream over the events directory (new parquet files =
  new data; at scale this is Kafka/object-store notifications, same API).
- **Tumbling 1-day windows + watermark** replace the per-day re-run: late
  rows within the watermark update their day's OHLC automatically instead of
  requiring an orchestrated backfill.
- **Stateful incremental indicators** via ``applyInPandasWithState``:
  per-key state carries the last close, so each micro-batch emits daily
  returns touching only the NEW days — O(new data), versus the reference's
  O(full history) rewrite per run (its own anti-pattern, SURVEY §4.1).

Scale notes: the shuffle key is (entity, day-window) — parallelism grows
with both; state size is one tiny struct per entity (bounded), checkpointed
incrementally (RocksDB state store on a real cluster).
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DateType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: events fixture schema with µs timestamps (what the batch loader produces;
#: a streaming source must declare its schema explicitly — no inference).
EVENT_STREAM_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_event_stream(
    spark: SparkSession,
    path: str,
    schema: StructType = EVENT_STREAM_SCHEMA,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-stream source: every parquet file that lands under ``path`` is
    one slice of new data (the streaming analog of the reference's per-day
    CSV landing, ``:92-95``)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def streaming_daily_ohlc(
    events: DataFrame,
    ts_col: str = "ts",
    price_col: str = "value",
    key_cols: Sequence[str] = ("event_type",),
    watermark: str = "1 day",
) -> DataFrame:
    """A1 as a streaming aggregation: tumbling 1-day window per key, with a
    watermark bounding how late a row may arrive and still update its day.

    Same order-deterministic ``min_by``/``max_by`` open/close as the batch
    operator — streaming partial aggregates merge associatively, so results
    are micro-batch-boundary independent.
    """
    e = events.withWatermark(ts_col, watermark)
    return (
        e.groupBy(
            *key_cols, F.window(F.col(ts_col), "1 day").alias("win")
        )
        .agg(
            F.min_by(price_col, ts_col).alias("open"),
            F.max(price_col).alias("high"),
            F.min(price_col).alias("low"),
            F.max_by(price_col, ts_col).alias("close"),
            F.count(price_col).alias("n_obs"),
        )
        .select(
            *key_cols,
            F.col("win.start").cast("date").alias("date"),
            "open",
            "high",
            "low",
            "close",
            "n_obs",
        )
    )


def streaming_sessionize(
    events: DataFrame,
    ts_col: str = "ts",
    key_cols: Sequence[str] = ("user_id",),
    gap: str = "30 minutes",
    watermark: str = "1 day",
) -> DataFrame:
    """Sessionization over a stream: the SAME ``session_window`` gap-merge
    as the batch operator (operators/asof.sessionize), plus a watermark so
    closed sessions finalize and state is evicted.  Batch/stream parity is
    by construction — one operator definition, two execution modes."""
    from airflow_crypto_btc_spark.operators.asof import sessionize

    return sessionize(
        events.withWatermark(ts_col, watermark),
        ts_col=ts_col,
        key_cols=key_cols,
        gap=gap,
    )


# ------------------------------------------------- stateful incremental ret

_RET_OUTPUT_SCHEMA = StructType(
    [
        StructField("asset", StringType()),
        StructField("date", DateType()),
        StructField("close", DoubleType()),
        StructField("ret", DoubleType()),
    ]
)

_RET_STATE_SCHEMA = StructType(
    [
        StructField("last_close", DoubleType()),
    ]
)


def _ret_func(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-key kernel: fold this micro-batch's daily closes (date-ordered)
    onto the carried last close; emit W1 ``ret = close/prev − 1`` rows."""
    batch = pd.concat(list(pdfs), ignore_index=True).sort_values("date")
    (last_close,) = state.get if state.exists else (None,)
    rets = []
    for close in batch["close"]:
        rets.append(
            None
            if last_close is None or pd.isna(close)
            else float(close) / float(last_close) - 1.0
        )
        last_close = float(close) if not pd.isna(close) else last_close
    state.update((last_close,))
    out = pd.DataFrame(
        {
            "asset": key[0],
            "date": batch["date"].values,
            "close": batch["close"].values,
            "ret": pd.array(rets, dtype="float64"),
        }
    )
    yield out


def streaming_pct_change(
    daily: DataFrame, key_col: str = "asset"
) -> DataFrame:
    """W1 as a custom stateful streaming operator: per-entity last-close
    state + per-batch fold.  Each micro-batch does O(new rows) work — the
    incremental version of the reference's full-history recompute
    (``:254-295``).  State: one double per entity, grows with #entities
    only."""
    grouped = daily.groupBy(F.col(key_col).alias("asset"))
    return grouped.applyInPandasWithState(
        _ret_func,
        outputStructType=_RET_OUTPUT_SCHEMA,
        stateStructType=_RET_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ------------------------------------------------------------------- runners


def run_available_now(
    df: DataFrame,
    checkpoint_dir: str,
    sink_path: str | None = None,
    output_mode: str = "append",
    foreach_batch=None,
    query_name: str = "engine_stream",
) -> None:
    """Drain everything currently available, then stop — the streaming analog
    of one catchup run.  Restarting later with the same checkpoint resumes
    exactly where this left off (state + source offsets)."""
    writer = df.writeStream.option("checkpointLocation", checkpoint_dir)
    if foreach_batch is not None:
        writer = writer.foreachBatch(foreach_batch)
    else:
        writer = writer.format("parquet").option("path", sink_path)
    q = (
        writer.outputMode(output_mode)
        .trigger(availableNow=True)
        .queryName(query_name)
        .start()
    )
    q.awaitTermination()


def run_complete_to_memory(
    df: DataFrame, table_name: str, checkpoint_dir: str
) -> None:
    """Complete-mode memory sink: deterministic full-result snapshot for
    tests (all windows, no watermark-emission timing dependence)."""
    q = (
        df.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
