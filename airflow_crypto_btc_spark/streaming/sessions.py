"""Streaming gap-based sessionization.

The batch operator (`operators/asof.sessionize`) is already expressed with
``F.session_window``, which Structured Streaming executes natively: the
same groupBy over a watermarked stream becomes a stateful session merge —
per-key session state is buffered, extended while events keep arriving
within the gap, and emitted (append mode) once the watermark passes
``session_end + gap``.  Batch/stream parity is therefore *by construction*
(same expression tree), which tests/test_streaming_sessions.py verifies by
draining a file stream and comparing against the batch twin.

Scale notes: state is one (key, open-session) struct per active entity —
bounded by the active-user cardinality, not history; the watermark bounds
how long a session can stay open in state.  Shuffle key is the entity key,
so parallelism = #entities, and late events inside the watermark merge into
their session instead of forcing an orchestrated backfill (the streaming
answer to the reference's ``catchup=True`` re-runs,
``/root/reference/dags/dag_btc_daily.py:15-16``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def streaming_sessionize(
    stream: DataFrame,
    ts_col: str = "ts",
    key_cols: Sequence[str] = ("user_id",),
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked streaming variant of `operators/asof.sessionize` — the
    identical aggregation over ``withWatermark``, emitting finalized
    sessions in append mode."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(*key_cols, F.session_window(F.col(ts_col), gap).alias("w"))
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
