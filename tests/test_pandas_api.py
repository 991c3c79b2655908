"""Pandas-API-on-Spark bridge: the reference's OWN pandas idioms
(`/root/reference/dags/dag_btc_daily.py:264-267` — pct_change, rolling
min_periods means, rolling sample std) executed on the distributed pandas
API must equal the engine's window operators.  This pins the parity story
end-to-end: a reference user can run their literal pandas code on Spark
and get the engine's numbers."""

from __future__ import annotations

import warnings

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def ps(spark):
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        import pyspark.pandas as ps

    return ps


def test_reference_pandas_code_on_spark_matches_window_ops(spark, ps):
    from airflow_crypto_btc_spark.operators.indicators import with_indicators

    closes = [100.0 + 7 * np.sin(i * 0.6) + 0.2 * i for i in range(45)]
    pdf = pd.DataFrame(
        {
            "asset": "A",
            "date": pd.date_range("2024-01-01", periods=len(closes)).date,
            "close": closes,
        }
    )

    # the reference's exact expressions, on pandas-on-Spark
    psdf = ps.from_pandas(pdf).sort_values("date")
    psdf["ret"] = psdf["close"].pct_change()
    psdf["ma7"] = psdf["close"].rolling(7, min_periods=7).mean()
    psdf["ma30"] = psdf["close"].rolling(30, min_periods=30).mean()
    got = psdf.to_pandas().sort_values("date").reset_index(drop=True)

    want = (
        with_indicators(spark.createDataFrame(pdf), key_cols=("asset",))
        .orderBy("date")
        .toPandas()
    )
    for col in ("ret", "ma7", "ma30"):
        np.testing.assert_allclose(
            got[col].to_numpy(dtype=float),
            want[col].to_numpy(dtype=float),
            rtol=1e-9,
            err_msg=col,
        )


def test_pandas_api_rolling_std_divergence_documented(spark, ps):
    """rolling(30).std() (sample, ddof=1) on pandas-on-Spark equals the
    engine's stddev_samp kernel wherever both are defined — but
    pandas-on-Spark gates ``min_periods`` on frame ROW count while real
    pandas (and this engine, matching the reference) counts NON-NULL
    values.  On the null-leading ``ret`` series PS therefore emits vol30
    one row earlier (row 30 vs 31).  This test pins both the agreement
    and the one-row divergence so the engine's choice stays a conscious
    one (SURVEY §7 hard-part 1)."""
    from airflow_crypto_btc_spark.operators.indicators import with_indicators

    rng = np.random.RandomState(3)
    closes = (100 + np.cumsum(rng.randn(45))).tolist()
    pdf = pd.DataFrame(
        {
            "asset": "A",
            "date": pd.date_range("2024-01-01", periods=len(closes)).date,
            "close": closes,
        }
    )
    psdf = ps.from_pandas(pdf).sort_values("date")
    ret = psdf["close"].pct_change()
    got = (
        ret.rolling(30, min_periods=30)
        .std()
        .to_pandas()
        .reset_index(drop=True)
    )

    want = (
        with_indicators(spark.createDataFrame(pdf), key_cols=("asset",))
        .orderBy("date")
        .toPandas()["vol30"]
    )
    both = got.notna() & want.notna()
    assert both.sum() >= 14
    np.testing.assert_allclose(
        got[both].to_numpy(dtype=float),
        want[both].to_numpy(dtype=float),
        rtol=1e-9,
    )
    # the documented divergence: PS row-count gate fires at index 29
    # (30 frame rows incl. the null ret), engine/pandas at index 30
    assert got.notna().idxmax() == 29
    assert want.notna().idxmax() == 30
    # real pandas agrees with the engine, not with pandas-on-Spark
    pd_vol = pdf["close"].pct_change().rolling(30, min_periods=30).std()
    assert pd_vol.notna().idxmax() == 30
