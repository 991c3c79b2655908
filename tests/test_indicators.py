"""W1-W4 parity with the reference's exact pandas semantics
(/root/reference/dags/dag_btc_daily.py:264-267):

    ret   = close.pct_change()
    ma7   = close.rolling(7,  min_periods=7).mean()
    ma30  = close.rolling(30, min_periods=30).mean()
    vol30 = ret.rolling(30, min_periods=30).std()   # ddof=1

65 synthetic days cover every null→non-null transition: ret at row 2,
ma7 at row 7, ma30 at row 30, vol30 at row 31 (one row AFTER ma30, because
ret[0] is null and min_periods counts non-nulls).
"""

from __future__ import annotations

import datetime as dt
import math

import numpy as np
import pandas as pd
import pytest

from airflow_crypto_btc_spark.operators.indicators import (
    trailing_days_slice,
    with_indicators,
)

N_DAYS = 65


@pytest.fixture(scope="module")
def daily(spark):
    rng = np.random.RandomState(7)
    dates = [dt.date(2023, 1, 1) + dt.timedelta(days=i) for i in range(N_DAYS)]
    closes = (100 + np.cumsum(rng.randn(N_DAYS))).round(4).tolist()
    pdf = pd.DataFrame(
        {"asset": "BTC-USD", "date": dates, "close": closes}
    )
    sdf = spark.createDataFrame(pdf)
    return pdf, sdf


def reference_semantics(pdf: pd.DataFrame) -> pd.DataFrame:
    out = pdf.sort_values("date").reset_index(drop=True).copy()
    out["ret"] = out["close"].pct_change()
    out["ma7"] = out["close"].rolling(7, min_periods=7).mean()
    out["ma30"] = out["close"].rolling(30, min_periods=30).mean()
    out["vol30"] = out["ret"].rolling(30, min_periods=30).std()
    return out


def test_indicators_match_pandas(daily):
    pdf, sdf = daily
    expected = reference_semantics(pdf)
    got = (
        with_indicators(sdf, key_cols=("asset",))
        .orderBy("date")
        .toPandas()
    )
    for col in ["ret", "ma7", "ma30", "vol30"]:
        e, g = expected[col].to_numpy(), got[col].to_numpy(dtype=float)
        assert np.array_equal(np.isnan(e), np.isnan(g)), (
            f"{col}: null pattern mismatch"
        )
        np.testing.assert_allclose(
            g[~np.isnan(e)], e[~np.isnan(e)], rtol=1e-9, err_msg=col
        )


def test_null_transition_rows(daily):
    pdf, sdf = daily
    got = (
        with_indicators(sdf, key_cols=("asset",)).orderBy("date").toPandas()
    )

    def first_notnull(col):
        return int(got[col].notna().idxmax())

    assert first_notnull("ret") == 1
    assert first_notnull("ma7") == 6
    assert first_notnull("ma30") == 29
    # vol30 needs 30 non-null rets; ret[0] is null → row index 30.
    assert first_notnull("vol30") == 30


def test_vol30_is_sample_std(daily):
    pdf, sdf = daily
    got = (
        with_indicators(sdf, key_cols=("asset",)).orderBy("date").toPandas()
    )
    rets = pdf["close"].pct_change().to_numpy()
    window = rets[1:31]  # rows 1..30 = the 30 non-null rets at row 30
    expected = float(np.std(window, ddof=1))
    assert math.isclose(got["vol30"][30], expected, rel_tol=1e-9)


def test_multi_key_independence(spark, daily):
    """Windows partitioned by key: a second asset must not perturb the
    first's indicators (the scale path: parallelism = #entities)."""
    pdf, sdf = daily
    other = sdf.withColumn("asset", sdf.close * 0 + 1).selectExpr(
        "'ETH-USD' AS asset", "date", "close * 2 AS close"
    )
    both = with_indicators(
        sdf.unionByName(other), key_cols=("asset",)
    )
    btc = (
        both.filter("asset = 'BTC-USD'").orderBy("date").toPandas()
    )
    solo = (
        with_indicators(sdf, key_cols=("asset",)).orderBy("date").toPandas()
    )
    pd.testing.assert_frame_equal(btc, solo)


def test_trailing_days_slice(daily):
    pdf, sdf = daily
    end = dt.date(2023, 1, 1) + dt.timedelta(days=N_DAYS - 1)
    got = trailing_days_slice(sdf, end_date=end.isoformat(), days=60)
    dates = [r["date"] for r in got.select("date").collect()]
    assert min(dates) == end - dt.timedelta(days=60)
    assert max(dates) == end
    assert len(dates) == 61


def test_pct_change_zero_divisor_semantics(spark):
    """SURVEY §7 hard-part 5: pandas pct_change yields inf when the
    previous close is 0; Spark double division yields Infinity for x/0
    (x≠0) and NaN-free null for 0/0 only under ANSI off — pin the actual
    engine behavior so a Spark upgrade can't silently change it."""
    import math

    from airflow_crypto_btc_spark.operators.indicators import with_indicators

    rows = [
        ("A", "2024-01-01", 10.0),
        ("A", "2024-01-02", 0.0),
        ("A", "2024-01-03", 5.0),   # prev close 0 → 5/0 - 1 = +inf
        ("A", "2024-01-04", 0.0),   # 0/5 - 1 = -1
        ("A", "2024-01-05", 0.0),   # 0/0 - 1 → NaN
    ]
    df = spark.createDataFrame(rows, "asset string, date string, close double")
    got = {
        str(r["date"]): r["ret"]
        for r in with_indicators(
            df.selectExpr("asset", "cast(date as date) date", "close"),
            key_cols=("asset",),
        ).collect()
    }
    assert got["2024-01-01"] is None
    assert got["2024-01-02"] == -1.0
    assert math.isinf(got["2024-01-03"]) and got["2024-01-03"] > 0
    assert got["2024-01-04"] == -1.0
    assert math.isnan(got["2024-01-05"])


def test_spark_sql_entry_path_matches_dataframe(spark, sf_dir):
    """SURVEY §3 entry point 2: the engine exposes registered views for the
    spark.sql path; a SQL rendering of daily OHLC must equal the DataFrame
    operator output."""
    from airflow_crypto_btc_spark.operators.ohlc import daily_ohlc
    from airflow_crypto_btc_spark.sources.tables import (
        load_table,
        register_views,
    )

    register_views(spark, sf_dir)
    via_sql = spark.sql(
        """
        SELECT event_type, to_date(ts) AS date,
               min_by(value, ts) AS open, max(value) AS high,
               min(value) AS low, max_by(value, ts) AS close,
               count(value) AS n_obs
        FROM events GROUP BY 1, 2
        """
    ).orderBy("event_type", "date").collect()
    via_df = (
        daily_ohlc(load_table(spark, sf_dir, "events"))
        .orderBy("event_type", "date")
        .collect()
    )
    assert via_sql == via_df
