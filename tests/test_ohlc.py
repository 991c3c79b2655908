"""A1 daily OHLC: order-deterministic open/close via min_by/max_by
(reference /root/reference/dags/dag_btc_daily.py:196-199 uses positional
iloc on a sorted frame; the engine must not depend on row order)."""

from __future__ import annotations

import datetime as dt

import pytest

from airflow_crypto_btc_spark.operators.ohlc import daily_ohlc


@pytest.fixture(scope="module")
def hourly(spark):
    rows = []
    base = dt.datetime(2024, 3, 1, 0, 0, 0)
    prices = [100.0, 105.0, 95.0, 102.0]  # open=100 high=105 low=95 close=102
    for h, p in enumerate(prices):
        rows.append(("BTC-USD", base + dt.timedelta(hours=h), p))
    # second day, reversed insertion order to prove order-independence
    base2 = dt.datetime(2024, 3, 2, 0, 0, 0)
    prices2 = [(3, 50.0), (0, 60.0), (2, 70.0), (1, 40.0)]
    for h, p in prices2:
        rows.append(("BTC-USD", base2 + dt.timedelta(hours=h), p))
    return spark.createDataFrame(rows, "asset string, ts timestamp, price double")


def test_ohlc_values(hourly):
    got = {
        str(r["date"]): r.asDict()
        for r in daily_ohlc(
            hourly, ts_col="ts", price_col="price", key_cols=("asset",)
        ).collect()
    }
    d1 = got["2024-03-01"]
    assert (d1["open"], d1["high"], d1["low"], d1["close"], d1["n_obs"]) == (
        100.0, 105.0, 95.0, 102.0, 4,
    )
    d2 = got["2024-03-02"]
    # open = price at earliest ts (hour 0 → 60), close = latest (hour 3 → 50)
    assert (d2["open"], d2["high"], d2["low"], d2["close"]) == (
        60.0, 70.0, 40.0, 50.0,
    )


def test_ohlc_shuffled_input_same_result(hourly):
    shuffled = hourly.orderBy("price").repartition(7)
    a = sorted(
        daily_ohlc(hourly, "ts", "price", ("asset",)).collect(),
        key=lambda r: str(r["date"]),
    )
    b = sorted(
        daily_ohlc(shuffled, "ts", "price", ("asset",)).collect(),
        key=lambda r: str(r["date"]),
    )
    assert a == b
