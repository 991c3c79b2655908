"""Structured Streaming tests: streaming OHLC == batch OHLC on the same
data, and the stateful pct_change operator carries state across separate
runs (restart-from-checkpoint semantics)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from airflow_crypto_btc_spark.operators.ohlc import daily_ohlc
from airflow_crypto_btc_spark.sources.tables import load_table
from airflow_crypto_btc_spark.streaming.ohlc_stream import (
    read_event_stream,
    run_available_now,
    run_complete_to_memory,
    streaming_daily_ohlc,
    streaming_pct_change,
)


def _land_day_files(spark, sf_dir, days, target):
    """Simulate files arriving: one parquet file per day slice."""
    ev = load_table(spark, sf_dir, "events")
    for day in days:
        (
            ev.filter(F.to_date("ts") == F.lit(day).cast("date"))
            .coalesce(1)
            .write.mode("append")
            .parquet(target)
        )


def test_streaming_ohlc_matches_batch(spark, sf_dir, tmp_path):
    src = str(tmp_path / "landing")
    days = ["2024-01-01", "2024-01-02", "2024-01-03"]
    _land_day_files(spark, sf_dir, days, src)

    stream = streaming_daily_ohlc(read_event_stream(spark, src))
    run_complete_to_memory(
        stream, "ohlc_snapshot", str(tmp_path / "ckpt_ohlc")
    )
    got = (
        spark.table("ohlc_snapshot")
        .orderBy("event_type", "date")
        .toPandas()
        .reset_index(drop=True)
    )

    batch = (
        daily_ohlc(spark.read.parquet(src))
        .orderBy("event_type", "date")
        .toPandas()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, batch[got.columns.tolist()])
    assert sorted(got["date"].astype(str).unique()) == days


def test_stateful_pct_change_across_restarts(spark, sf_dir, tmp_path):
    """Feed days 1-2, drain; feed days 3-4, drain with the SAME checkpoint.
    ret for day 3 must use day 2's close from the carried state."""
    landing = str(tmp_path / "daily_landing")
    ckpt = str(tmp_path / "ckpt_ret")
    collected: list[pd.DataFrame] = []

    ev = load_table(spark, sf_dir, "events")
    all_daily = (
        daily_ohlc(ev)
        .withColumnRenamed("event_type", "asset")
        .select("asset", "date", "close")
    )

    def land(days):
        all_daily.filter(
            F.col("date").isin([pd.Timestamp(d).date() for d in days])
        ).coalesce(1).write.mode("append").parquet(landing)

    def drain():
        stream = spark.readStream.schema(
            "asset string, date date, close double"
        ).parquet(landing)
        out = streaming_pct_change(stream)
        run_available_now(
            out,
            ckpt,
            output_mode="update",
            foreach_batch=lambda df, _id: collected.append(df.toPandas()),
        )

    land(["2024-01-01", "2024-01-02"])
    drain()
    land(["2024-01-03", "2024-01-04"])
    drain()

    got = (
        pd.concat(collected, ignore_index=True)
        .sort_values(["asset", "date"])
        .reset_index(drop=True)
    )
    expected = (
        all_daily.filter(F.col("date") <= F.lit("2024-01-04").cast("date"))
        .toPandas()
        .sort_values(["asset", "date"])
        .reset_index(drop=True)
    )
    expected["ret"] = expected.groupby("asset")["close"].pct_change()

    assert len(got) == len(expected)
    pd.testing.assert_frame_equal(
        got[["asset", "date", "close", "ret"]],
        expected[["asset", "date", "close", "ret"]],
        check_dtype=False,
    )


def test_append_mode_emits_finalized_windows_to_parquet(
    spark, sf_dir, tmp_path
):
    """Append mode + 1-day watermark: a day's OHLC window lands in the
    parquet sink only after the watermark passes its end — earlier drains
    leave it in state, later drains emit it finalized, and the emitted
    values match the batch aggregation."""
    src = str(tmp_path / "landing")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        stream = streaming_daily_ohlc(
            read_event_stream(spark, src, max_files_per_trigger=1)
        )
        run_available_now(stream, ckpt, sink_path=sink, output_mode="append")

    _land_day_files(spark, sf_dir, ["2024-01-01", "2024-01-02"], src)
    drain()
    _land_day_files(spark, sf_dir, ["2024-01-03", "2024-01-04"], src)
    drain()

    got = spark.read.parquet(sink)
    emitted_days = sorted(
        r["date"].isoformat()
        for r in got.select("date").distinct().collect()
    )
    # data through Jan 4 ⇒ watermark ≈ Jan 3 → Jan 1 and Jan 2 finalized
    assert "2024-01-01" in emitted_days
    assert "2024-01-04" not in emitted_days  # not past watermark yet

    batch = daily_ohlc(spark.read.parquet(src)).toPandas()
    gpdf = got.toPandas()
    merged = gpdf.merge(
        batch,
        on=["event_type", "date"],
        suffixes=("", "_b"),
        validate="one_to_one",
    )
    assert len(merged) == len(gpdf)
    for c in ("open", "high", "low", "close", "n_obs"):
        assert (merged[c] == merged[f"{c}_b"]).all()


def test_streaming_sessionize_matches_batch_for_finalized(
    spark, sf_dir, tmp_path
):
    """Sessions finalized by the watermark must exactly match the batch
    sessionization of the same data (same operator, streaming mode)."""
    from airflow_crypto_btc_spark.operators.asof import sessionize
    from airflow_crypto_btc_spark.streaming.ohlc_stream import (
        streaming_sessionize,
    )

    src = str(tmp_path / "landing")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        stream = streaming_sessionize(
            read_event_stream(spark, src, max_files_per_trigger=1)
        )
        run_available_now(stream, ckpt, sink_path=sink, output_mode="append")

    _land_day_files(spark, sf_dir, ["2024-01-01", "2024-01-02"], src)
    drain()
    _land_day_files(spark, sf_dir, ["2024-01-03", "2024-01-04"], src)
    drain()

    got = (
        spark.read.parquet(sink)
        .toPandas()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )
    assert len(got) > 0
    batch = sessionize(spark.read.parquet(src)).toPandas()
    merged = got.merge(
        batch,
        on=["user_id", "session_start"],
        suffixes=("", "_b"),
        validate="one_to_one",
    )
    assert len(merged) == len(got)  # every emitted session exists in batch
    for c in ("session_end", "n_events", "duration_us"):
        assert (merged[c] == merged[f"{c}_b"]).all()


def test_streaming_dq_monitor_matches_batch(spark, sf_dir, tmp_path):
    """The DQ monitor is one metric builder in two modes: the streaming
    verdicts (complete snapshot) must equal the batch report row-for-row,
    and the chosen bounds must exercise both pass and fail verdicts."""
    from airflow_crypto_btc_spark.streaming.dq_monitor import (
        quality_metrics,
        streaming_quality_monitor,
    )

    src = str(tmp_path / "dq_landing")
    days = ["2024-01-01", "2024-01-02", "2024-01-03"]
    _land_day_files(spark, sf_dir, days, src)

    stream = streaming_quality_monitor(
        read_event_stream(spark, src), min_rows=5, value_lo=0.0,
        value_hi=200.0,
    )
    run_complete_to_memory(stream, "dq_snapshot", str(tmp_path / "ckpt_dq"))
    got = (
        spark.table("dq_snapshot")
        .orderBy("event_type", "date")
        .toPandas()
        .reset_index(drop=True)
    )

    batch = (
        quality_metrics(
            spark.read.parquet(src), min_rows=5, value_lo=0.0,
            value_hi=200.0,
        )
        .orderBy("event_type", "date")
        .toPandas()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, batch[got.columns.tolist()])
    assert got["passed"].any() and not got["passed"].all()


def test_observed_metrics_per_microbatch(spark, sf_dir, tmp_path):
    """The same observe() instrumentation on a streaming frame surfaces
    metrics in every micro-batch's StreamingQueryProgress."""
    from airflow_crypto_btc_spark.plans.quality import observed_metrics
    from airflow_crypto_btc_spark.streaming.ohlc_stream import (
        EVENT_STREAM_SCHEMA,
    )

    src = str(tmp_path / "landing")
    _land_day_files(spark, sf_dir, ["2024-01-01", "2024-01-02"], src)
    stream = (
        spark.readStream.schema(EVENT_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    inst, _ = observed_metrics(stream, name="dq_stream")
    q = (
        inst.writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    progresses = [p for p in q.recentProgress if p["numInputRows"] > 0]
    assert len(progresses) >= 2  # one per day file
    total = 0
    for p in progresses:
        m = p["observedMetrics"]["dq_stream"]
        assert m["null_values"] == 0
        total += m["n_rows"]
    batch_total = spark.read.parquet(src).count()
    assert total == batch_total
