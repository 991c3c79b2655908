"""Technical-analysis query wave: the indicator family a user of the
reference pipeline (`/root/reference/dags/dag_btc_daily.py:264-267`) would
add next, over the same keyed daily-OHLC base as W1-W4.

All finite-frame indicators (RSI / Bollinger / median / z-score) are pure
window expressions sharing one exchange+sort per query; the EWM family is
the designed Arrow slow-path (`operators/ta.ewm_indicators`) with an exact
recursive-CTE oracle.  Gap-fill and TWAP extend the time-series surface
(resampling + irregular-interval weighting).

Float discipline follows `registry.py`: sliding-frame aggregates are
rounded to 6 decimals on both engines; recursive accumulations use the
identical floating-point operation order on both sides before rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from airflow_crypto_btc_spark.operators.ta import (
    ewm_indicators,
    with_bollinger,
    with_rolling_median,
    with_rsi,
    with_zscore_outliers,
)
from airflow_crypto_btc_spark.plans.registry import (
    QuerySpec,
    _events_daily,
    _SQL_DAILY,
)
from airflow_crypto_btc_spark.sources.tables import load_table


# ------------------------------------------------------------------- RSI 14

def q_win_rsi14(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = with_rsi(_events_daily(spark, sf_dir))
    return out.select(
        "event_type", "date", "close", F.round("rsi14", 6).alias("rsi14")
    )


_SQL_WIN_RSI14 = f"""
    WITH d AS (
      SELECT event_type, date, close,
        close - lag(close) OVER w AS diff
      FROM ({_SQL_DAILY})
      WINDOW w AS (PARTITION BY event_type ORDER BY date)
    )
    SELECT event_type, date, close,
      round(CASE WHEN count(diff) OVER f >= 14 THEN
        CASE WHEN avg(greatest(-diff, 0.0)) OVER f = 0 THEN 100.0
             ELSE 100.0 - 100.0 /
                  (1.0 + (avg(greatest(diff, 0.0)) OVER f)
                       / (avg(greatest(-diff, 0.0)) OVER f))
        END END, 6) AS rsi14
    FROM d
    WINDOW f AS (PARTITION BY event_type ORDER BY date
                 ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
"""


# --------------------------------------------------------- Bollinger bands

def q_win_bollinger(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = with_bollinger(_events_daily(spark, sf_dir))
    return out.select(
        "event_type", "date", "close",
        F.round("bb_mid", 6).alias("bb_mid"),
        F.round("bb_upper", 6).alias("bb_upper"),
        F.round("bb_lower", 6).alias("bb_lower"),
        F.round("bb_pct_b", 6).alias("bb_pct_b"),
    )


_SQL_WIN_BOLLINGER = f"""
    WITH d AS (SELECT event_type, date, close FROM ({_SQL_DAILY})),
    g AS (
      SELECT event_type, date, close,
        CASE WHEN count(close) OVER f >= 20
             THEN avg(close) OVER f END AS mid,
        CASE WHEN count(close) OVER f >= 20
             THEN stddev_samp(close) OVER f END AS sd
      FROM d
      WINDOW f AS (PARTITION BY event_type ORDER BY date
                   ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, date, close,
      round(mid, 6) AS bb_mid,
      round(mid + 2.0 * sd, 6) AS bb_upper,
      round(mid - 2.0 * sd, 6) AS bb_lower,
      round(CASE WHEN sd > 0 THEN
        (close - (mid - 2.0 * sd)) / ((mid + 2.0 * sd) - (mid - 2.0 * sd))
      END, 6) AS bb_pct_b
    FROM g
"""


# ---------------------------------------------------------- rolling median

def q_win_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = with_rolling_median(_events_daily(spark, sf_dir))
    return out.select(
        "event_type", "date", "close",
        F.round("median7", 6).alias("median7"),
    )


_SQL_WIN_ROLLING_MEDIAN = f"""
    SELECT event_type, date, close,
      round(CASE WHEN count(close) OVER f >= 7
                 THEN median(close) OVER f END, 6) AS median7
    -- DuckDB's windowed median on an odd 7-row frame is the same exact
    -- middle order statistic the Spark plan selects via array_sort.
    FROM ({_SQL_DAILY})
    WINDOW f AS (PARTITION BY event_type ORDER BY date
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
"""


# --------------------------------------------------------- z-score outliers

def q_win_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = with_zscore_outliers(_events_daily(spark, sf_dir))
    return out.select(
        "event_type", "date",
        F.round("ret", 6).alias("ret"),
        F.round("zscore", 6).alias("zscore"),
        "is_outlier",
    )


_SQL_WIN_ZSCORE_OUTLIERS = f"""
    WITH d AS (
      SELECT event_type, date, close,
        close / lag(close) OVER w - 1.0 AS ret
      FROM ({_SQL_DAILY})
      WINDOW w AS (PARTITION BY event_type ORDER BY date)
    ),
    z AS (
      SELECT event_type, date, ret,
        CASE WHEN count(ret) OVER f >= 30 THEN
          CASE WHEN stddev_samp(ret) OVER f > 0 THEN
            (ret - avg(ret) OVER f) / (stddev_samp(ret) OVER f)
          END END AS zscore
      FROM d
      WINDOW f AS (PARTITION BY event_type ORDER BY date
                   ROWS BETWEEN 29 PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, date, round(ret, 6) AS ret,
      round(zscore, 6) AS zscore,
      coalesce(abs(zscore) > 2.0, false) AS is_outlier
    FROM z
"""


# ----------------------------------------------- EWM family (recursive op)

def q_ewm_macd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EMA12/EMA26/MACD/signal — the recursive slow-path operator.  The
    oracle is a DuckDB recursive CTE stepping the same recurrence in the
    same floating-point operation order."""
    out = ewm_indicators(_events_daily(spark, sf_dir))
    return out.select(
        "event_type", "date", "close",
        F.round("ema_fast", 6).alias("ema12"),
        F.round("ema_slow", 6).alias("ema26"),
        F.round("macd", 6).alias("macd"),
        F.round("signal", 6).alias("signal"),
    )


# Recurrence (both engines, identical op order):
#   ema_t = a*x_t + (1-a)*ema_{t-1};  seeded ema_1 = x_1
#   macd_t = ema12_t - ema26_t;       signal seeded at macd_1
_SQL_EWM_MACD = f"""
    WITH RECURSIVE base AS (
      SELECT event_type, date, close,
        row_number() OVER (PARTITION BY event_type ORDER BY date) AS rn
      FROM ({_SQL_DAILY})
    ),
    rec AS (
      SELECT event_type, date, close, rn,
        close AS ema12, close AS ema26,
        CAST(0.0 AS DOUBLE) AS macd, CAST(0.0 AS DOUBLE) AS signal
      FROM base WHERE rn = 1
      UNION ALL
      SELECT b.event_type, b.date, b.close, b.rn,
        (2.0/13.0) * b.close + (1.0 - 2.0/13.0) * r.ema12,
        (2.0/27.0) * b.close + (1.0 - 2.0/27.0) * r.ema26,
        ((2.0/13.0) * b.close + (1.0 - 2.0/13.0) * r.ema12)
          - ((2.0/27.0) * b.close + (1.0 - 2.0/27.0) * r.ema26),
        (2.0/10.0) * (((2.0/13.0) * b.close + (1.0 - 2.0/13.0) * r.ema12)
                      - ((2.0/27.0) * b.close + (1.0 - 2.0/27.0) * r.ema26))
          + (1.0 - 2.0/10.0) * r.signal
      FROM base b JOIN rec r
        ON b.event_type = r.event_type AND b.rn = r.rn + 1
    )
    SELECT event_type, date, close,
      round(ema12, 6) AS ema12,
      round(ema26, 6) AS ema26,
      round(macd, 6) AS macd,
      round(signal, 6) AS signal
    FROM rec
"""


# ------------------------------------------------- calendar spine gap-fill

def q_ts_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample each key's daily series onto a dense calendar spine
    (`sequence` + `explode` — generated, not shuffled) and forward-fill
    close with `last(ignorenulls)`.  The classic time-series regularization
    op; spine generation is per-key and embarrassingly parallel."""
    d = _events_daily(spark, sf_dir).select("event_type", "date", "close")
    spine = (
        d.groupBy("event_type")
        .agg(F.min("date").alias("mn"), F.max("date").alias("mx"))
        .select(
            "event_type",
            F.explode(F.sequence("mn", "mx")).alias("date"),
        )
    )
    joined = spine.join(d, ["event_type", "date"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("date")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        "event_type", "date", "close",
        F.last("close", ignorenulls=True).over(w).alias("close_ffill"),
        F.col("close").isNull().alias("is_gap"),
    )


_SQL_TS_GAP_FILL = f"""
    WITH d AS (SELECT event_type, date, close FROM ({_SQL_DAILY})),
    b AS (
      SELECT event_type, min(date) AS mn, max(date) AS mx
      FROM d GROUP BY 1
    ),
    spine AS (
      SELECT event_type, CAST(g AS DATE) AS date
      FROM (
        SELECT event_type,
          unnest(generate_series(CAST(mn AS TIMESTAMP),
                                 CAST(mx AS TIMESTAMP),
                                 INTERVAL 1 DAY)) AS g
        FROM b
      )
    )
    SELECT s.event_type, s.date, d.close,
      last_value(d.close IGNORE NULLS) OVER (
        PARTITION BY s.event_type ORDER BY s.date
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS close_ffill,
      d.close IS NULL AS is_gap
    FROM spine s LEFT JOIN d
      ON s.event_type = d.event_type AND s.date = d.date
"""


# --------------------------------------------- time-weighted average price

def q_ts_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWAP over irregular intra-day observations: each event's value is
    weighted by the microseconds until the next event in the same
    (key, day); the day's last observation carries no weight.  Decimal
    accumulation keeps the weighted sum shuffle-order-insensitive."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.to_date("ts").alias("date"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "value",
    )
    w = Window.partitionBy("event_type", "date").orderBy("us")
    dt = (F.lead("us", 1).over(w) - F.col("us")).alias("dt")
    weighted = ev.select("event_type", "date", "value", dt)
    out = weighted.groupBy("event_type", "date").agg(
        F.count("*").alias("n_events"),
        F.coalesce(F.sum("dt"), F.lit(0)).alias("span_us"),
        F.round(
            F.sum((F.col("value") * F.col("dt")).cast("decimal(38,6)"))
            .cast("double")
            / F.when(F.sum("dt") > 0, F.sum("dt")),
            6,
        ).alias("twap"),
    )
    return out


_SQL_TS_TWAP = """
    WITH e AS (
      SELECT event_type, CAST(ts AS DATE) AS date, value,
        lead(epoch_us(ts)) OVER (
          PARTITION BY event_type, CAST(ts AS DATE) ORDER BY epoch_us(ts))
          - epoch_us(ts) AS dt
      FROM events
    )
    SELECT event_type, date,
      count(*) AS n_events,
      CAST(coalesce(sum(dt), 0) AS BIGINT) AS span_us,
      round(CAST(sum(CAST(value * dt AS DECIMAL(38,6))) AS DOUBLE)
            / CASE WHEN sum(dt) > 0 THEN sum(dt) END, 6) AS twap
    FROM e
    GROUP BY 1, 2
"""


# ------------------------------------------------------------ max drawdown


def q_win_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running peak / drawdown series per key with the trough flagged:
    ``dd = close/runmax − 1`` over an expanding window, trough = the
    deterministically-ranked minimum.  The running max is an exact
    comparison (no accumulation), so only the ratio is rounded."""
    d = _events_daily(spark, sf_dir).select("event_type", "date", "close")
    w = (
        Window.partitionBy("event_type")
        .orderBy("date")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    peak = F.max("close").over(w)
    d = d.withColumn("peak", peak)
    wr = Window.partitionBy("event_type").orderBy(
        F.asc("drawdown"), F.asc("date")
    )
    return (
        d.withColumn("drawdown", F.round(
            F.when(F.col("peak") != 0, F.col("close") / F.col("peak") - 1), 6
        ))
        .withColumn("is_trough", F.row_number().over(wr) == 1)
        .select("event_type", "date", "close", "peak", "drawdown",
                "is_trough")
    )


_SQL_WIN_MAX_DRAWDOWN = f"""
    WITH d AS (
      SELECT event_type, date, close,
        max(close) OVER (PARTITION BY event_type ORDER BY date
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          AS peak
      FROM ({_SQL_DAILY})
    ),
    dd AS (
      SELECT event_type, date, close, peak,
        round(CASE WHEN peak <> 0 THEN close / peak - 1 END, 6) AS drawdown
      FROM d
    )
    SELECT event_type, date, close, peak, drawdown,
      row_number() OVER (PARTITION BY event_type
                         ORDER BY drawdown ASC, date ASC) = 1 AS is_trough
    FROM dd
"""


# ----------------------------------------------- cross-asset correlation


def q_corr_matrix_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation of daily returns between asset keys:
    date-aligned self-join of the (tiny, aggregated) returns table, one
    co-moment aggregate per unordered pair.  The join input is days ×
    keys regardless of raw volume."""
    d = _events_daily(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("date")
    prev = F.lag("close", 1).over(w)
    r = d.select(
        "event_type", "date",
        F.when(prev != 0, F.col("close") / prev - 1).alias("ret"),
    ).filter(F.col("ret").isNotNull())
    a = r.select(
        F.col("event_type").alias("asset_a"),
        "date",
        F.col("ret").alias("ret_a"),
    )
    b = r.select(
        F.col("event_type").alias("asset_b"),
        "date",
        F.col("ret").alias("ret_b"),
    )
    return (
        a.join(b, "date")
        .filter(F.col("asset_a") < F.col("asset_b"))
        .groupBy("asset_a", "asset_b")
        .agg(
            F.round(F.corr("ret_a", "ret_b"), 6).alias("ret_corr"),
            F.count("*").cast("long").alias("n_days"),
        )
    )


_SQL_CORR_MATRIX_ASSETS = f"""
    WITH r AS (
      SELECT event_type, date,
        close / lag(close) OVER (PARTITION BY event_type ORDER BY date)
          - 1 AS ret
      FROM ({_SQL_DAILY})
    ),
    rr AS (SELECT * FROM r WHERE ret IS NOT NULL)
    SELECT a.event_type AS asset_a, b.event_type AS asset_b,
      round(corr(a.ret, b.ret), 6) AS ret_corr,
      CAST(count(*) AS BIGINT) AS n_days
    FROM rr a JOIN rr b ON a.date = b.date AND a.event_type < b.event_type
    GROUP BY 1, 2
"""


# ------------------------------------------- stochastic oscillator & ATR


def q_win_stochastic_atr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stochastic oscillator (%K over the trailing 14-day high/low range,
    %D = 3-day mean of %K) and Average True Range (Wilder's TR with a
    14-day simple mean) — both straight window expressions over the daily
    OHLC base, sharing one exchange+sort.  Flat-range days (%K undefined)
    stay null."""
    d = _events_daily(spark, sf_dir).select(
        "event_type", "date", "high", "low", "close"
    )
    w = Window.partitionBy("event_type").orderBy("date")
    f14 = w.rowsBetween(-13, 0)
    f3 = w.rowsBetween(-2, 0)
    hi14 = F.max("high").over(f14)
    lo14 = F.min("low").over(f14)
    n14 = F.count("close").over(f14)
    prev_close = F.lag("close", 1).over(w)
    pct_k = F.when(
        (n14 >= 14) & (hi14 != lo14),
        (F.col("close") - lo14) / (hi14 - lo14) * 100.0,
    )
    d = d.withColumn("pct_k", F.round(pct_k, 6))
    pct_d = F.when(
        F.count("pct_k").over(f3) >= 3, F.avg("pct_k").over(f3)
    )
    tr = F.greatest(
        F.col("high") - F.col("low"),
        F.abs(F.col("high") - prev_close),
        F.abs(F.col("low") - prev_close),
    )
    d = d.withColumn("tr", tr)
    atr = F.when(
        F.count("tr").over(f14) >= 14, F.avg("tr").over(f14)
    )
    return d.select(
        "event_type", "date", "close",
        "pct_k",
        F.round(pct_d, 6).alias("pct_d"),
        F.round("tr", 6).alias("tr"),
        F.round(atr, 6).alias("atr14"),
    )


_SQL_WIN_STOCHASTIC_ATR = f"""
    WITH d AS (SELECT event_type, date, high, low, close
               FROM ({_SQL_DAILY})),
    k AS (
      SELECT event_type, date, close, high, low,
        round(CASE WHEN count(close) OVER f14 >= 14
                    AND max(high) OVER f14 <> min(low) OVER f14
              THEN (close - min(low) OVER f14)
                   / (max(high) OVER f14 - min(low) OVER f14) * 100.0
              END, 6) AS pct_k,
        greatest(high - low,
                 abs(high - lag(close) OVER w),
                 abs(low  - lag(close) OVER w)) AS tr
      FROM d
      WINDOW
        f14 AS (PARTITION BY event_type ORDER BY date
                ROWS BETWEEN 13 PRECEDING AND CURRENT ROW),
        w AS (PARTITION BY event_type ORDER BY date)
    )
    SELECT event_type, date, close, pct_k,
      round(CASE WHEN count(pct_k) OVER f3 >= 3
                 THEN avg(pct_k) OVER f3 END, 6) AS pct_d,
      round(tr, 6) AS tr,
      round(CASE WHEN count(tr) OVER f14 >= 14
                 THEN avg(tr) OVER f14 END, 6) AS atr14
    FROM k
    WINDOW
      f3 AS (PARTITION BY event_type ORDER BY date
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
      f14 AS (PARTITION BY event_type ORDER BY date
              ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
"""


# ------------------------------------------- anomaly runs (gaps & islands)


def q_anomaly_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sustained-anomaly detection: consecutive days with |ret| above one
    trailing stddev (10-day frame) collapse into runs (gaps-and-islands over the outlier
    flag), reporting each run's span and peak |z|.  Composition of the
    z-score operator with the islands pattern — two window passes over the
    same keyed ordering + one aggregate."""
    from airflow_crypto_btc_spark.operators.ta import with_zscore_outliers

    z = with_zscore_outliers(
        _events_daily(spark, sf_dir), period=10, threshold=1.0
    ).select("event_type", "date", F.round("zscore", 6).alias("zscore"),
             "is_outlier")
    w = Window.partitionBy("event_type").orderBy("date")
    flag = F.col("is_outlier").cast("int")
    z = z.withColumn(
        "new_run",
        F.when(
            flag
            == 1,
            F.when(
                F.lag(flag, 1, 0).over(w) == 0, 1
            ).otherwise(0),
        ).otherwise(0),
    )
    z = z.withColumn(
        "run_id",
        F.when(
            F.col("is_outlier"),
            F.sum("new_run").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        ),
    )
    return (
        z.filter(F.col("is_outlier"))
        .groupBy("event_type", "run_id")
        .agg(
            F.min("date").alias("run_start"),
            F.max("date").alias("run_end"),
            F.count("*").cast("long").alias("run_days"),
            F.round(F.max(F.abs(F.col("zscore"))), 6).alias("peak_abs_z"),
        )
        .withColumn("run_id", F.col("run_id").cast("long"))
    )


_SQL_ANOMALY_RUNS = f"""
    WITH d AS (
      SELECT event_type, date, close,
        close / lag(close) OVER w - 1.0 AS ret
      FROM ({_SQL_DAILY})
      WINDOW w AS (PARTITION BY event_type ORDER BY date)
    ),
    z AS (
      SELECT event_type, date,
        round(CASE WHEN count(ret) OVER f >= 10 THEN
          CASE WHEN stddev_samp(ret) OVER f > 0 THEN
            (ret - avg(ret) OVER f) / (stddev_samp(ret) OVER f)
          END END, 6) AS zscore
      FROM d
      WINDOW f AS (PARTITION BY event_type ORDER BY date
                   ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
    ),
    flags AS (
      SELECT event_type, date, zscore,
        coalesce(abs(zscore) > 1.0, false) AS is_outlier
      FROM z
    ),
    starts AS (
      SELECT event_type, date, zscore, is_outlier,
        CASE WHEN is_outlier AND NOT coalesce(
               lag(is_outlier) OVER (PARTITION BY event_type ORDER BY date),
               false)
             THEN 1 ELSE 0 END AS new_run
      FROM flags
    ),
    runs AS (
      SELECT event_type, date, zscore, is_outlier,
        CASE WHEN is_outlier THEN
          sum(new_run) OVER (PARTITION BY event_type ORDER BY date
                             ROWS UNBOUNDED PRECEDING)
        END AS run_id
      FROM starts
    )
    SELECT event_type, CAST(run_id AS BIGINT) AS run_id,
      min(date) AS run_start,
      max(date) AS run_end,
      CAST(count(*) AS BIGINT) AS run_days,
      round(max(abs(zscore)), 6) AS peak_abs_z
    FROM runs
    WHERE is_outlier
    GROUP BY 1, 2
"""


# --------------------------------------------- OHLC resample daily→weekly


def q_ohlc_resample_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Granularity rollup of OHLC bars: weekly candles from daily candles
    (open = first-by-date, close = last-by-date, high/low = extrema,
    volume-proxy = summed n_obs) — the same order-deterministic
    min_by/max_by discipline as the daily aggregation (A1), applied one
    level up.  Mergeable: weekly bars from daily bars equal weekly bars
    from raw events."""
    d = _events_daily(spark, sf_dir)
    week = F.to_date(F.date_trunc("week", "date"))
    return (
        d.groupBy("event_type", week.alias("week"))
        .agg(
            F.expr("min_by(open, date)").alias("open"),
            F.max("high").alias("high"),
            F.min("low").alias("low"),
            F.expr("max_by(close, date)").alias("close"),
            F.sum("n_obs").cast("long").alias("n_obs"),
            F.count("*").cast("long").alias("n_days"),
        )
    )


_SQL_OHLC_RESAMPLE_WEEKLY = f"""
    SELECT event_type,
      CAST(date_trunc('week', date) AS DATE) AS week,
      arg_min(open, date) AS open,
      max(high) AS high,
      min(low) AS low,
      arg_max(close, date) AS close,
      CAST(sum(n_obs) AS BIGINT) AS n_obs,
      CAST(count(*) AS BIGINT) AS n_days
    FROM ({_SQL_DAILY})
    GROUP BY 1, 2
"""


# ------------------------------------------------- MA-crossover backtest


def q_backtest_ma_crossover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signal backtest over the indicator table: long when ma7 > ma30
    (positions lag the signal by one day — no lookahead), strategy return
    = position × daily return.  Per-key summary: days in market, signal
    flips, decimal-summed strategy vs buy-and-hold return.  The whole
    backtest is two window passes + one aggregation over the daily table
    — the pattern that makes parameter sweeps cheap at scale (each sweep
    point is another column, not another scan)."""
    from airflow_crypto_btc_spark.operators.indicators import with_indicators

    d = with_indicators(
        _events_daily(spark, sf_dir), ma_short=7, ma_long=10, vol_window=10
    )
    w = Window.partitionBy("event_type").orderBy("date")
    signal = F.when(
        F.col("ma7").isNotNull() & F.col("ma30").isNotNull(),
        (F.col("ma7") > F.col("ma30")).cast("int"),
    ).otherwise(0)
    d = d.withColumn("signal", signal)
    d = d.withColumn("position", F.lag("signal", 1, 0).over(w))
    d = d.withColumn(
        "strat_ret",
        F.when(
            (F.col("position") == 1) & F.col("ret").isNotNull(),
            F.col("ret"),
        ).otherwise(F.lit(0.0)),
    )
    flip = (F.col("signal") != F.lag("signal", 1, 0).over(w)).cast("int")
    d = d.withColumn("flip", flip)
    return d.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum("position").cast("long").alias("days_in_market"),
        F.sum("flip").cast("long").alias("n_flips"),
        F.round(
            F.sum(F.col("strat_ret").cast("decimal(38,12)")).cast("double"),
            6,
        ).alias("strategy_return"),
        F.round(
            F.sum(
                F.coalesce(F.col("ret"), F.lit(0.0)).cast("decimal(38,12)")
            ).cast("double"),
            6,
        ).alias("buy_hold_return"),
    )


# ma_long/vol shortened to 10 so signals exist inside the 30-day fixture
# window; the Spark side uses the identical windows via with_indicators
# (column names stay ma7/ma30 per the reference DDL).
_SQL_BACKTEST_MA_CROSSOVER = f"""
    WITH d AS (
      SELECT event_type, date, close,
        close / lag(close) OVER w - 1.0 AS ret,
        CASE WHEN count(close) OVER f7 >= 7
             THEN avg(close) OVER f7 END AS ma7,
        CASE WHEN count(close) OVER f10 >= 10
             THEN avg(close) OVER f10 END AS ma30
      FROM ({_SQL_DAILY})
      WINDOW
        w AS (PARTITION BY event_type ORDER BY date),
        f7 AS (PARTITION BY event_type ORDER BY date
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW),
        f10 AS (PARTITION BY event_type ORDER BY date
                ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
    ),
    sig AS (
      SELECT event_type, date, ret,
        CASE WHEN ma7 IS NOT NULL AND ma30 IS NOT NULL AND ma7 > ma30
             THEN 1 ELSE 0 END AS signal
      FROM d
    ),
    pos AS (
      SELECT event_type, date, ret, signal,
        coalesce(lag(signal) OVER w, 0) AS position,
        CASE WHEN signal <> coalesce(lag(signal) OVER w, 0)
             THEN 1 ELSE 0 END AS flip
      FROM sig
      WINDOW w AS (PARTITION BY event_type ORDER BY date)
    )
    SELECT event_type,
      CAST(count(*) AS BIGINT) AS n_days,
      CAST(sum(position) AS BIGINT) AS days_in_market,
      CAST(sum(flip) AS BIGINT) AS n_flips,
      round(CAST(sum(CAST(CASE WHEN position = 1 AND ret IS NOT NULL
                               THEN ret ELSE 0.0 END
                          AS DECIMAL(38,12))) AS DOUBLE), 6)
        AS strategy_return,
      round(CAST(sum(CAST(coalesce(ret, 0.0) AS DECIMAL(38,12)))
                 AS DOUBLE), 6) AS buy_hold_return
    FROM pos
    GROUP BY 1
"""


# --------------------------------------------- forecast baselines + MAE


def q_forecast_baselines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series forecasting baselines with walk-forward evaluation —
    the harness every real forecasting pipeline needs BEFORE any model:
    naive (yesterday's close), seasonal-naive (same weekday last week),
    and drift (yesterday + mean historical step), each scored per key by
    MAE and MAPE on the days where the forecast is defined.  All pure
    window expressions; the evaluation aggregate shares the key shuffle."""
    d = _events_daily(spark, sf_dir).select("event_type", "date", "close")
    w = Window.partitionBy("event_type").orderBy("date")
    hist = w.rowsBetween(Window.unboundedPreceding, -1)
    naive = F.lag("close", 1).over(w)
    snaive = F.lag("close", 7).over(w)
    # drift: previous close + mean of all previous daily steps
    step = F.col("close") - F.lag("close", 1).over(w)
    d = d.withColumn("_step", step)
    drift = F.lag("close", 1).over(w) + F.avg("_step").over(hist)
    d = (
        d.withColumn("f_naive", naive)
        .withColumn("f_snaive", snaive)
        .withColumn("f_drift", drift)
    )

    def _err(f):
        return F.abs(F.col(f) - F.col("close"))

    def _mae(f):
        return F.round(
            F.sum(_err(f).cast("decimal(38,12)")).cast("double")
            / F.when(F.count(f) > 0, F.count(f)),
            6,
        )

    def _mape(f):
        return F.round(
            F.sum(
                F.when(F.col("close") != 0, _err(f) / F.abs("close"))
                .cast("decimal(38,12)")
            ).cast("double")
            / F.when(F.count(f) > 0, F.count(f)),
            6,
        )

    return d.groupBy("event_type").agg(
        F.count("f_naive").cast("long").alias("n_naive"),
        _mae("f_naive").alias("mae_naive"),
        _mape("f_naive").alias("mape_naive"),
        F.count("f_snaive").cast("long").alias("n_snaive"),
        _mae("f_snaive").alias("mae_snaive"),
        _mape("f_snaive").alias("mape_snaive"),
        F.count("f_drift").cast("long").alias("n_drift"),
        _mae("f_drift").alias("mae_drift"),
        _mape("f_drift").alias("mape_drift"),
    )


_SQL_FORECAST_BASELINES = f"""
    WITH s AS (
      SELECT event_type, date, close,
        lag(close, 1) OVER w AS f_naive,
        lag(close, 7) OVER w AS f_snaive,
        close - lag(close, 1) OVER w AS step
      FROM ({_SQL_DAILY})
      WINDOW w AS (PARTITION BY event_type ORDER BY date)
    ),
    d AS (
      SELECT event_type, date, close, f_naive, f_snaive,
        f_naive + avg(step) OVER
          (PARTITION BY event_type ORDER BY date
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS f_drift
      FROM s
    )
    SELECT event_type,
      CAST(count(f_naive) AS BIGINT) AS n_naive,
      round(CAST(sum(CAST(abs(f_naive - close) AS DECIMAL(38,12)))
                 AS DOUBLE)
            / CASE WHEN count(f_naive) > 0 THEN count(f_naive) END, 6)
        AS mae_naive,
      round(CAST(sum(CAST(CASE WHEN close <> 0
                               THEN abs(f_naive - close) / abs(close) END
                          AS DECIMAL(38,12))) AS DOUBLE)
            / CASE WHEN count(f_naive) > 0 THEN count(f_naive) END, 6)
        AS mape_naive,
      CAST(count(f_snaive) AS BIGINT) AS n_snaive,
      round(CAST(sum(CAST(abs(f_snaive - close) AS DECIMAL(38,12)))
                 AS DOUBLE)
            / CASE WHEN count(f_snaive) > 0 THEN count(f_snaive) END, 6)
        AS mae_snaive,
      round(CAST(sum(CAST(CASE WHEN close <> 0
                               THEN abs(f_snaive - close) / abs(close) END
                          AS DECIMAL(38,12))) AS DOUBLE)
            / CASE WHEN count(f_snaive) > 0 THEN count(f_snaive) END, 6)
        AS mape_snaive,
      CAST(count(f_drift) AS BIGINT) AS n_drift,
      round(CAST(sum(CAST(abs(f_drift - close) AS DECIMAL(38,12)))
                 AS DOUBLE)
            / CASE WHEN count(f_drift) > 0 THEN count(f_drift) END, 6)
        AS mae_drift,
      round(CAST(sum(CAST(CASE WHEN close <> 0
                               THEN abs(f_drift - close) / abs(close) END
                          AS DECIMAL(38,12))) AS DOUBLE)
            / CASE WHEN count(f_drift) > 0 THEN count(f_drift) END, 6)
        AS mape_drift
    FROM d
    GROUP BY 1
"""


TA_REGISTRY: dict[str, QuerySpec] = {
    "forecast_baselines": QuerySpec(
        q_forecast_baselines, _SQL_FORECAST_BASELINES
    ),
    "ohlc_resample_weekly": QuerySpec(
        q_ohlc_resample_weekly, _SQL_OHLC_RESAMPLE_WEEKLY
    ),
    "backtest_ma_crossover": QuerySpec(
        q_backtest_ma_crossover, _SQL_BACKTEST_MA_CROSSOVER
    ),
    "win_stochastic_atr": QuerySpec(
        q_win_stochastic_atr, _SQL_WIN_STOCHASTIC_ATR
    ),
    "anomaly_runs": QuerySpec(q_anomaly_runs, _SQL_ANOMALY_RUNS),
    "win_max_drawdown": QuerySpec(q_win_max_drawdown, _SQL_WIN_MAX_DRAWDOWN),
    "corr_matrix_assets": QuerySpec(
        q_corr_matrix_assets, _SQL_CORR_MATRIX_ASSETS
    ),
    "win_rsi14": QuerySpec(q_win_rsi14, _SQL_WIN_RSI14),
    "win_bollinger": QuerySpec(q_win_bollinger, _SQL_WIN_BOLLINGER),
    "win_rolling_median": QuerySpec(
        q_win_rolling_median, _SQL_WIN_ROLLING_MEDIAN
    ),
    "win_zscore_outliers": QuerySpec(
        q_win_zscore_outliers, _SQL_WIN_ZSCORE_OUTLIERS
    ),
    "ewm_macd": QuerySpec(q_ewm_macd, _SQL_EWM_MACD),
    "ts_gap_fill": QuerySpec(q_ts_gap_fill, _SQL_TS_GAP_FILL),
    "ts_twap": QuerySpec(q_ts_twap, _SQL_TS_TWAP),
}
