"""The stateful incremental-indicator kernel: batch twin ≡ window operator,
and the streaming variant ≡ the batch twin across micro-batch boundaries
(state carried between triggers)."""

from __future__ import annotations

import datetime as dt
import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from airflow_crypto_btc_spark.operators.indicators import with_indicators
from airflow_crypto_btc_spark.streaming.indicators_stream import (
    batch_indicators_incremental,
    streaming_indicators,
)


def _synthetic_daily(spark, days: int = 40):
    """Two assets, 40 days — long enough that ma30 (day 30+) and vol30
    (day 31+: ret[0] is null, SURVEY §7 hard-part 1) go non-null."""
    rows = []
    for a, base in (("AAA", 100.0), ("BBB", 50.0)):
        for i in range(days):
            rows.append(
                (
                    a,
                    dt.date(2024, 1, 1) + dt.timedelta(days=i),
                    base + 10.0 * math.sin(i * 0.7) + 0.3 * i,
                )
            )
    return spark.createDataFrame(
        rows, "asset string, date date, close double"
    )


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values(["asset", "date"]).reset_index(drop=True)
    for c in pdf.columns:
        if c not in ("asset", "date"):
            pdf[c] = pd.to_numeric(pdf[c]).round(9)
    return pdf


def test_batch_twin_matches_window_operator(spark):
    daily = _synthetic_daily(spark)
    want = (
        with_indicators(daily, key_cols=("asset",))
        .select("asset", "date", "close", "ret", "ma7", "ma30", "vol30")
        .toPandas()
    )
    got = batch_indicators_incremental(
        daily, key_col="asset"
    ).toPandas()
    pd.testing.assert_frame_equal(_canon(got), _canon(want[got.columns]))
    # the vol30 one-row-lag-behind-ma30 invariant (null-leading ret)
    g = _canon(got)
    a = g[g["asset"] == "AAA"].reset_index(drop=True)
    assert pd.isna(a.loc[29, "vol30"]) and not pd.isna(a.loc[29, "ma30"])
    assert not pd.isna(a.loc[30, "vol30"])


def test_batch_twin_min_periods_null_gates(spark):
    daily = _synthetic_daily(spark, days=8)
    got = _canon(
        batch_indicators_incremental(daily, key_col="asset").toPandas()
    )
    a = got[got["asset"] == "AAA"].reset_index(drop=True)
    assert pd.isna(a.loc[0, "ret"])          # W1 first row null
    assert a["ma7"].notna().tolist() == [False] * 6 + [True] * 2
    assert a["ma30"].isna().all()            # only 8 days of history


def test_streaming_indicators_carry_state_across_batches(
    spark, tmp_path
):
    """Land the 40-day history as 3 chronological parquet slices, drain
    with maxFilesPerTrigger=1 (⇒ ≥3 micro-batches): every indicator that
    straddles a batch boundary must use buffered state, not batch-local
    history.  Output must equal the batch twin on the full table."""
    daily = _synthetic_daily(spark)
    landing = str(tmp_path / "landing")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    bounds = [
        ("2024-01-01", "2024-01-11"),
        ("2024-01-11", "2024-01-26"),
        ("2024-01-26", "2024-03-01"),
    ]
    for lo, hi in bounds:
        daily.filter(
            (F.col("date") >= lo) & (F.col("date") < hi)
        ).coalesce(1).write.mode("append").parquet(landing)

    stream = spark.readStream.schema(
        "asset string, date date, close double"
    ).option("maxFilesPerTrigger", 1).parquet(landing)
    q = (
        streaming_indicators(stream, key_col="asset")
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = _canon(spark.read.parquet(sink).toPandas())
    want = _canon(
        batch_indicators_incremental(daily, key_col="asset").toPandas()
    )
    pd.testing.assert_frame_equal(got, want[got.columns.tolist()])
    # sanity: values genuinely straddle the 3 slices
    assert got["date"].nunique() == 40
    assert got["vol30"].notna().sum() > 0


@pytest.mark.parametrize("col,window", [("ma7", 7), ("ma30", 30)])
def test_incremental_means_are_bitwise_equal_to_window_op(
    spark, col, window
):
    """Means accumulate in frame order in both paths — no rounding needed
    for equality (stddev is exempt: two-pass vs moments, rounded by every
    consumer)."""
    daily = _synthetic_daily(spark)
    want = (
        with_indicators(daily, key_cols=("asset",))
        .select("asset", "date", col)
        .toPandas()
        .sort_values(["asset", "date"])
        .reset_index(drop=True)
    )
    got = (
        batch_indicators_incremental(daily, key_col="asset")
        .select("asset", "date", col)
        .toPandas()
        .sort_values(["asset", "date"])
        .reset_index(drop=True)
    )
    wv = want[col].astype(float)
    gv = pd.to_numeric(got[col])
    assert (wv.isna() == gv.isna()).all()
    assert (wv.dropna() == gv.dropna()).all()  # bitwise, not approx
