"""Stream-stream joins and streaming dedup (SURVEY §2.9 extensions).

The reference has no joins at all, but a pipeline folding raw events into
per-day state at scale inevitably needs (a) event-to-event attribution
(which click led to this purchase?) and (b) at-least-once-source dedup.
Both are Spark-native stateful operators — this module renders them with
the engine's determinism discipline and batch twins for the oracle gate.

- **Range-join attribution**: purchases matched to the same user's clicks
  within a trailing window.  Batch form is a plain time-range equi+range
  join (DuckDB-checkable); streaming form adds watermarks on BOTH sides so
  the join state (buffered clicks awaiting purchases, and vice versa) is
  evicted once no counterpart can still arrive — bounded state at any
  volume.
- **Dedup within watermark**: ``dropDuplicatesWithinWatermark`` — the
  streaming rendering of the reference's INSERT-OR-IGNORE unique index
  (`/root/reference/dags/dag_btc_daily.py:147-155`): first row with a key
  wins, later duplicates are dropped as long as they arrive within the
  watermark (the at-least-once redelivery horizon).

Scale notes: both operators shuffle by user/key, so parallelism grows with
key cardinality; state per key is bounded by the watermark horizon, and
the range condition keeps each buffered row's lifetime to the attribution
window, not the stream's lifetime.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join_attribution(
    events: DataFrame,
    cause_type: str = "click",
    effect_type: str = "purchase",
    ts_col: str = "ts",
    user_col: str = "user_id",
    window: str = "1 hour",
) -> DataFrame:
    """Batch twin: every (cause, effect) pair for the same user with the
    effect inside ``[cause_ts, cause_ts + window]``.  An effect can match
    several causes (multi-touch attribution) — downstream pick-one logic
    is a window top-1, not this operator's concern."""
    cause = events.filter(F.col("event_type") == cause_type).select(
        F.col(user_col).alias("user_id"),
        F.col("event_id").alias("cause_id"),
        F.col(ts_col).alias("cause_ts"),
    )
    effect = events.filter(F.col("event_type") == effect_type).select(
        F.col(user_col).alias("e_user_id"),
        F.col("event_id").alias("effect_id"),
        F.col(ts_col).alias("effect_ts"),
        F.col("value").alias("effect_value"),
    )
    return (
        cause.join(
            effect,
            (F.col("user_id") == F.col("e_user_id"))
            & (F.col("effect_ts") >= F.col("cause_ts"))
            & (
                F.col("effect_ts")
                <= F.col("cause_ts") + F.expr(f"INTERVAL {window}")
            ),
        )
        .select(
            "user_id",
            "cause_id",
            "cause_ts",
            "effect_id",
            "effect_ts",
            "effect_value",
        )
    )


def streaming_range_join_attribution(
    events: DataFrame,
    cause_type: str = "click",
    effect_type: str = "purchase",
    ts_col: str = "ts",
    user_col: str = "user_id",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """The same join over one unbounded stream split into two sides.

    Watermarks on both inputs + the time-range join condition let Spark
    prove when a buffered row can no longer find a partner and evict it:
    cause-side state lives ``watermark + window``, effect-side state lives
    ``watermark``.  Without the range bound the state would be unbounded —
    that bound is the scale-critical part of the operator, not an
    optimization."""
    cause = (
        events.filter(F.col("event_type") == cause_type)
        .select(
            F.col(user_col).alias("user_id"),
            F.col("event_id").alias("cause_id"),
            F.col(ts_col).alias("cause_ts"),
        )
        .withWatermark("cause_ts", watermark)
    )
    effect = (
        events.filter(F.col("event_type") == effect_type)
        .select(
            F.col(user_col).alias("e_user_id"),
            F.col("event_id").alias("effect_id"),
            F.col(ts_col).alias("effect_ts"),
            F.col("value").alias("effect_value"),
        )
        .withWatermark("effect_ts", watermark)
    )
    return cause.join(
        effect,
        (F.col("user_id") == F.col("e_user_id"))
        & (F.col("effect_ts") >= F.col("cause_ts"))
        & (
            F.col("effect_ts")
            <= F.col("cause_ts") + F.expr(f"INTERVAL {window}")
        ),
    ).select(
        "user_id",
        "cause_id",
        "cause_ts",
        "effect_id",
        "effect_ts",
        "effect_value",
    )


def streaming_dedup_within_watermark(
    events: DataFrame,
    key_cols: Sequence[str] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """First-writer-wins dedup over a stream: duplicates of a key arriving
    within the watermark horizon are dropped; state for a key is evicted
    once the watermark passes its event time.  The streaming analog of the
    reference's unique-index INSERT OR IGNORE (S5) and of the batch
    left-anti merge writer (operators/merge.append_ignore)."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


def streaming_enrich_with_dim(
    stream: DataFrame,
    dim: DataFrame,
    on: str = "user_id",
) -> DataFrame:
    """Stream-static dimension enrichment: every micro-batch inner-joins
    the (small, broadcast) static dimension — no state, no watermark; the
    dim is re-resolvable per batch, so a replaced dim table is picked up
    on the next trigger.  The streaming rendering of the reference's
    constant `asset` dimension column
    (`/root/reference/dags/dag_btc_daily.py:130`) generalized to a real
    dimension join."""
    from pyspark.sql import functions as F

    return stream.join(F.broadcast(dim), on, "inner")


def streaming_left_outer_attribution(
    events: DataFrame,
    cause_type: str = "click",
    effect_type: str = "purchase",
    ts_col: str = "ts",
    user_col: str = "user_id",
    window: str = "1 hour",
    watermark: str = "10 minutes",
) -> DataFrame:
    """LEFT OUTER stream-stream range join: every cause row eventually
    emits — matched rows as soon as the partner arrives, UNMATCHED rows
    with null effect columns once the watermark proves no partner can
    still come.  The outer side is the strictly harder stateful case
    (Spark must hold the cause row until the watermark passes
    ``cause_ts + window`` before declaring it unmatched); inner joins
    only ever emit on match.  The batch twin is the same join with
    ``how='left'``."""
    cause = (
        events.filter(F.col("event_type") == cause_type)
        .select(
            F.col(user_col).alias("user_id"),
            F.col("event_id").alias("cause_id"),
            F.col(ts_col).alias("cause_ts"),
        )
        .withWatermark("cause_ts", watermark)
    )
    effect = (
        events.filter(F.col("event_type") == effect_type)
        .select(
            F.col(user_col).alias("e_user_id"),
            F.col("event_id").alias("effect_id"),
            F.col(ts_col).alias("effect_ts"),
        )
        .withWatermark("effect_ts", watermark)
    )
    return cause.join(
        effect,
        (F.col("user_id") == F.col("e_user_id"))
        & (F.col("effect_ts") >= F.col("cause_ts"))
        & (
            F.col("effect_ts")
            <= F.col("cause_ts") + F.expr(f"INTERVAL {window}")
        ),
        "leftOuter",
    ).select("user_id", "cause_id", "cause_ts", "effect_id", "effect_ts")
