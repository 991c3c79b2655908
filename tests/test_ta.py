"""Technical-analysis operator tests (operators/ta.py, registry_ta.py).

Semantics anchored to pandas — the reference's own engine for its rolling
indicators (`/root/reference/dags/dag_btc_daily.py:264-267`) — extended to
the TA family: RSI, Bollinger, rolling median, z-score outliers, EWM/MACD.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from airflow_crypto_btc_spark.operators.ta import (
    ewm_indicators,
    with_bollinger,
    with_rolling_median,
    with_rsi,
    with_zscore_outliers,
)


@pytest.fixture(scope="module")
def daily(spark):
    """Two keys, 40 days of deterministic prices (enough to clear every
    min_periods gate), one key with a price plateau (flat-window edge)."""
    rng = np.random.RandomState(7)
    rows = []
    for key in ("a", "b"):
        base = 100.0 if key == "a" else 50.0
        for i in range(40):
            price = base + float(rng.randn()) * 5.0
            if key == "b" and 10 <= i < 15:
                price = 77.0  # plateau: zero-std window edge case
            rows.append((key, dt.date(2024, 1, 1) + dt.timedelta(days=i), price))
    return spark.createDataFrame(
        rows, "event_type string, date date, close double"
    )


def _pdf(daily):
    return (
        daily.toPandas()
        .sort_values(["event_type", "date"])
        .reset_index(drop=True)
    )


def test_rsi_matches_pandas(spark, daily):
    got = (
        with_rsi(daily)
        .toPandas()
        .sort_values(["event_type", "date"])
        .reset_index(drop=True)
    )
    pdf = _pdf(daily)
    for key, g in pdf.groupby("event_type"):
        diff = g["close"].diff()
        gain = diff.clip(lower=0).rolling(14, min_periods=14).mean()
        loss = (-diff).clip(lower=0).rolling(14, min_periods=14).mean()
        rsi = np.where(loss == 0, 100.0, 100.0 - 100.0 / (1.0 + gain / loss))
        rsi = pd.Series(rsi, index=g.index).where(loss.notna())
        sub = got[got["event_type"] == key].reset_index(drop=True)
        pd.testing.assert_series_equal(
            sub["rsi14"],
            rsi.reset_index(drop=True).rename("rsi14"),
            rtol=1e-9,
        )


def test_rsi_gate_boundary(spark, daily):
    got = with_rsi(daily).filter("event_type = 'a'").orderBy("date").toPandas()
    # 14 diffs need 15 rows: rows 0..13 null, row 14 first non-null
    assert got["rsi14"].iloc[:14].isna().all()
    assert got["rsi14"].iloc[14:].notna().all()


def test_bollinger_matches_pandas(spark, daily):
    got = (
        with_bollinger(daily)
        .toPandas()
        .sort_values(["event_type", "date"])
        .reset_index(drop=True)
    )
    pdf = _pdf(daily)
    for key, g in pdf.groupby("event_type"):
        mid = g["close"].rolling(20, min_periods=20).mean()
        sd = g["close"].rolling(20, min_periods=20).std()  # ddof=1
        sub = got[got["event_type"] == key].reset_index(drop=True)
        np.testing.assert_allclose(
            sub["bb_upper"], (mid + 2 * sd).reset_index(drop=True), rtol=1e-9
        )
        np.testing.assert_allclose(
            sub["bb_lower"], (mid - 2 * sd).reset_index(drop=True), rtol=1e-9
        )


def test_rolling_median_matches_pandas(spark, daily):
    got = (
        with_rolling_median(daily)
        .toPandas()
        .sort_values(["event_type", "date"])
        .reset_index(drop=True)
    )
    pdf = _pdf(daily)
    expect = (
        pdf.groupby("event_type")["close"]
        .rolling(7, min_periods=7)
        .median()
        .reset_index(drop=True)
    )
    np.testing.assert_allclose(got["median7"], expect, rtol=1e-12)


def test_rolling_median_rejects_even_period(daily):
    with pytest.raises(ValueError, match="odd"):
        with_rolling_median(daily, period=6)


def test_zscore_outlier_flag_never_null(spark, daily):
    got = with_zscore_outliers(daily).toPandas()
    assert got["is_outlier"].notna().all()
    # gated region: no z-scores before 30 rets exist (31 rows)
    a = got[got["event_type"] == "a"].sort_values("date")
    assert a["zscore"].iloc[:30].isna().all()
    assert a["zscore"].iloc[30:].notna().all()


def test_ewm_matches_pandas(spark, daily):
    got = (
        ewm_indicators(daily)
        .toPandas()
        .sort_values(["event_type", "date"])
        .reset_index(drop=True)
    )
    pdf = _pdf(daily)
    for key, g in pdf.groupby("event_type"):
        e12 = g["close"].ewm(span=12, adjust=False).mean()
        e26 = g["close"].ewm(span=26, adjust=False).mean()
        macd = e12 - e26
        sig = macd.ewm(span=9, adjust=False).mean()
        sub = got[got["event_type"] == key].reset_index(drop=True)
        np.testing.assert_allclose(
            sub["ema_fast"], e12.reset_index(drop=True), rtol=1e-12
        )
        np.testing.assert_allclose(
            sub["ema_slow"], e26.reset_index(drop=True), rtol=1e-12
        )
        np.testing.assert_allclose(
            sub["macd"], macd.reset_index(drop=True), rtol=1e-9, atol=1e-12
        )
        np.testing.assert_allclose(
            sub["signal"], sig.reset_index(drop=True), rtol=1e-9, atol=1e-12
        )


def test_gap_fill_forward_fills_missing_days(spark):
    from airflow_crypto_btc_spark.plans.registry_ta import q_ts_gap_fill

    # craft a gappy series through the registry path's shape by checking
    # invariants on real fixture output instead: spine is dense, ffill is
    # never null after the first observed day, gaps flagged iff close null
    out = q_ts_gap_fill(spark, "/root/testdata/sf0.001").toPandas()
    for key, g in out.groupby("event_type"):
        g = g.sort_values("date").reset_index(drop=True)
        days = pd.to_datetime(g["date"])
        assert (days.diff().dropna() == pd.Timedelta(days=1)).all(), (
            "spine must be dense"
        )
        assert g["close_ffill"].notna().all()
        assert (g["is_gap"] == g["close"].isna()).all()


def test_gap_fill_ffill_values(spark):
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [
            ("a", dt.date(2024, 1, 1), 10.0),
            ("a", dt.date(2024, 1, 4), 13.0),
            ("a", dt.date(2024, 1, 6), 16.0),
        ],
        "event_type string, date date, close double",
    )
    spine = (
        df.groupBy("event_type")
        .agg(F.min("date").alias("mn"), F.max("date").alias("mx"))
        .select("event_type", F.explode(F.sequence("mn", "mx")).alias("date"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("date")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = (
        spine.join(df, ["event_type", "date"], "left")
        .select(
            "date",
            F.last("close", ignorenulls=True).over(w).alias("close_ffill"),
        )
        .orderBy("date")
        .toPandas()
    )
    assert out["close_ffill"].tolist() == [10.0, 10.0, 10.0, 13.0, 13.0, 16.0]


def test_twap_hand_computed(spark):
    from airflow_crypto_btc_spark.plans.registry_ta import q_ts_twap

    out = q_ts_twap(spark, "/root/testdata/sf0.001").toPandas()
    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    ev["date"] = ev["ts"].dt.date
    grp = ev.sort_values("ts").groupby(["event_type", "date"])
    for (key, day), g in list(grp)[:5]:
        us = g["ts"].astype("int64") // 1000  # ns → us
        dtv = us.diff().shift(-1)
        mask = dtv.notna()
        expect = (
            (g["value"][mask] * dtv[mask]).sum() / dtv[mask].sum()
            if mask.any()
            else None
        )
        row = out[(out["event_type"] == key) & (out["date"] == day)]
        assert len(row) == 1
        if expect is not None:
            assert row["twap"].iloc[0] == pytest.approx(expect, rel=1e-6)


def test_ta_plans_stay_jvm_side(spark, daily):
    """Everything except the EWM family must plan zero Python nodes, and
    each indicator family shares a single window sort."""
    for fn in (with_rsi, with_bollinger, with_rolling_median,
               with_zscore_outliers):
        plan = fn(daily)._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan, f"{fn.__name__} fell off the JVM path"
    ewm_plan = (
        ewm_indicators(daily)._jdf.queryExecution().executedPlan().toString()
    )
    assert "FlatMapGroupsInPandas" in ewm_plan


def test_max_drawdown_invariants(spark):
    from airflow_crypto_btc_spark.plans.registry_ta import q_win_max_drawdown

    got = q_win_max_drawdown(spark, "/root/testdata/sf0.001").toPandas()
    assert (got["drawdown"] <= 0).all()  # never above the running peak
    for et, g in got.groupby("event_type"):
        g = g.sort_values("date").reset_index(drop=True)
        assert (g["peak"].cummax() == g["peak"]).all()  # peak is monotone
        assert g["is_trough"].sum() == 1
        trough = g[g["is_trough"]].iloc[0]
        assert trough["drawdown"] == g["drawdown"].min()


def test_corr_matrix_symmetric_bounds(spark):
    from airflow_crypto_btc_spark.plans.registry_ta import (
        q_corr_matrix_assets,
    )

    got = q_corr_matrix_assets(spark, "/root/testdata/sf0.001").toPandas()
    assert (got["asset_a"] < got["asset_b"]).all()  # unordered pairs once
    assert got["ret_corr"].dropna().between(-1, 1).all()
    n = got[["asset_a", "asset_b"]].stack().nunique()
    assert len(got) == n * (n - 1) // 2  # full matrix upper triangle


def test_stochastic_atr_invariants(spark):
    from airflow_crypto_btc_spark.plans.registry_ta import (
        q_win_stochastic_atr,
    )

    got = q_win_stochastic_atr(spark, "/root/testdata/sf0.001").toPandas()
    k = got["pct_k"].dropna()
    assert k.between(0, 100).all()  # close sits inside the 14-day range
    assert (got["tr"].dropna() >= 0).all()
    assert (got["atr14"].dropna() >= 0).all()
    # %D only defined once 3 %K values exist
    for et, g in got.groupby("event_type"):
        g = g.sort_values("date")
        first_k = g["pct_k"].notna().idxmax()
        assert g["pct_d"].loc[:first_k].isna().all()


def test_anomaly_runs_are_maximal(spark):
    from airflow_crypto_btc_spark.plans.registry_ta import q_anomaly_runs

    got = q_anomaly_runs(spark, "/root/testdata/sf0.01").toPandas()
    assert len(got) > 0
    for et, g in got.groupby("event_type"):
        g = g.sort_values("run_start")
        # runs don't overlap and are separated by at least one calm day
        prev_end = None
        for _, r in g.iterrows():
            assert r["run_end"] >= r["run_start"]
            span = (r["run_end"] - r["run_start"]).days + 1
            assert span == r["run_days"]
            if prev_end is not None:
                assert (r["run_start"] - prev_end).days >= 2
            prev_end = r["run_end"]


def test_weekly_resample_merges_with_daily(spark):
    """Weekly bars re-aggregated from daily bars must equal weekly bars
    computed straight from raw events (mergeability of OHLC)."""
    from airflow_crypto_btc_spark.operators.ohlc import daily_ohlc
    from airflow_crypto_btc_spark.plans.registry_ta import (
        q_ohlc_resample_weekly,
    )
    from airflow_crypto_btc_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    got = (
        q_ohlc_resample_weekly(spark, sf)
        .toPandas()
        .sort_values(["event_type", "week"])
        .reset_index(drop=True)
    )
    ev = load_table(spark, sf, "events")
    direct = (
        daily_ohlc(
            ev.withColumn("ts_w", F.expr("date_trunc('week', ts)")),
            ts_col="ts",
            price_col="value",
            key_cols=("event_type",),
        )
    )
    # weekly from raw: group daily ohlc of week granularity
    import pandas as pd

    raw = ev.toPandas()
    raw["week"] = (
        pd.to_datetime(raw["ts"]).dt.to_period("W").dt.start_time.dt.date
    )
    raw = raw.sort_values("ts")
    ref = (
        raw.groupby(["event_type", "week"])
        .agg(
            open=("value", "first"),
            high=("value", "max"),
            low=("value", "min"),
            close=("value", "last"),
            n_obs=("value", "size"),
        )
        .reset_index()
        .sort_values(["event_type", "week"])
        .reset_index(drop=True)
    )
    for c in ("open", "high", "low", "close"):
        assert (got[c].values == ref[c].values).all(), c
    assert (got["n_obs"].values == ref["n_obs"].values).all()


def test_backtest_no_lookahead_and_consistency(spark):
    from airflow_crypto_btc_spark.plans.registry_ta import (
        q_backtest_ma_crossover,
    )

    got = q_backtest_ma_crossover(spark, "/root/testdata/sf0.01").toPandas()
    assert (got["days_in_market"] <= got["n_days"]).all()
    assert (got["days_in_market"] > 0).any()  # signals actually fire
    assert (got["n_flips"] >= 1).all() or (got["days_in_market"] == 0).any()


def test_forecast_baselines_sanity(spark):
    """Naive forecast is defined from day 2; seasonal-naive from day 8;
    errors are non-negative and MAPE is a sane magnitude."""
    from airflow_crypto_btc_spark.plans.registry_ta import (
        q_forecast_baselines,
    )

    got = q_forecast_baselines(spark, "/root/testdata/sf0.01").toPandas()
    assert (got["n_naive"] == got["n_snaive"] + 6).all()  # 7-lag loses 6 more
    for c in [c for c in got.columns if c.startswith(("mae", "mape"))]:
        assert (got[c].dropna() >= 0).all()
    # drift has the same support as naive (needs >= 1 historical step)
    assert (got["n_drift"] <= got["n_naive"]).all()
