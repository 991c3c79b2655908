"""Streaming EWM (O(1) state) ≡ batch EWM operator across micro-batch
boundaries and across a checkpoint restart."""

from __future__ import annotations

import datetime as dt
import math

import pandas as pd
from pyspark.sql import functions as F

from airflow_crypto_btc_spark.operators.ta import ewm_indicators
from airflow_crypto_btc_spark.streaming.ewm_stream import streaming_ewm


def _synthetic_daily(spark, days: int = 40):
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


def _drain(spark, landing, sink, ckpt):
    stream = spark.readStream.schema(
        "asset string, date date, close double"
    ).option("maxFilesPerTrigger", 1).parquet(landing)
    q = (
        streaming_ewm(stream)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_streaming_ewm_matches_batch_across_restarts(spark, tmp_path):
    """Slice 1 drained, then slices 2-3 drained in a SECOND run with the
    same checkpoint: the recursion must resume from persisted state, and
    the union of outputs must equal the batch operator on the full data."""
    daily = _synthetic_daily(spark)
    landing = str(tmp_path / "landing")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    bounds = [
        ("2024-01-01", "2024-01-11"),
        ("2024-01-11", "2024-01-26"),
        ("2024-01-26", "2024-03-01"),
    ]

    def land(i):
        lo, hi = bounds[i]
        daily.filter(
            (F.col("date") >= F.lit(lo).cast("date"))
            & (F.col("date") < F.lit(hi).cast("date"))
        ).coalesce(1).write.mode("append").parquet(landing)

    land(0)
    _drain(spark, landing, sink, ckpt)
    land(1)
    land(2)
    _drain(spark, landing, sink, ckpt)  # restart from checkpoint

    got = _canon(spark.read.parquet(sink).toPandas())
    want = _canon(
        ewm_indicators(daily, key_cols=("asset",))
        .withColumnRenamed("event_type", "asset")
        .toPandas()[got.columns.tolist()]
    )
    pd.testing.assert_frame_equal(got, want)
    assert len(got) == 80
