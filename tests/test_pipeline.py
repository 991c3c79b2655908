"""End-to-end day-fold pipeline tests (SURVEY §5 pipeline-level plan):
run N consecutive days, check OHLC against an independent pandas
recomputation, prove day re-runs are idempotent, and check DQ gates fire.
"""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from airflow_crypto_btc_spark.operators.merge import dedup_keep_first
from airflow_crypto_btc_spark.pipeline import (
    Warehouse,
    normalize_klines,
    run_day,
    run_range,
)
from airflow_crypto_btc_spark.sources.tables import load_table

DAYS = ["2024-01-01", "2024-01-02", "2024-01-03"]


def _source_for_day(spark, sf_dir, day):
    """All event types of the day as one price series (the sf0.001 fixture
    has only ~5-11 rows per day per type; aggregate to get a dense day)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.to_date("ts") == F.lit(day).cast("date"))
        .select(
            F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("ts_utc"),
            F.col("value").alias("price"),
        )
        .transform(lambda d: dedup_keep_first(d, ["ts_utc"], "ts_utc"))
        .orderBy("ts_utc")
    )


@pytest.fixture()
def wh(tmp_path):
    return Warehouse(str(tmp_path / "warehouse"))


def _metrics_pdf(spark, wh) -> pd.DataFrame:
    return (
        spark.read.parquet(wh.daily_metrics)
        .orderBy("date")
        .toPandas()
        .reset_index(drop=True)
    )


def test_run_range_ohlc_matches_pandas(spark, sf_dir, wh):
    run_range(
        spark,
        wh,
        DAYS,
        lambda d: _source_for_day(spark, sf_dir, d),
        min_day_rows=10,
    )
    got = _metrics_pdf(spark, wh)
    assert list(got["date"].astype(str)) == DAYS

    # independent recomputation with reference semantics (iloc[0]/iloc[-1]
    # on the ts-sorted frame; pct_change)
    for _, row in got.iterrows():
        day = str(row["date"])
        pdf = (
            _source_for_day(spark, sf_dir, day)
            .toPandas()
            .sort_values("ts_utc")
        )
        assert row["open"] == pdf["price"].iloc[0]
        assert row["close"] == pdf["price"].iloc[-1]
        assert row["high"] == pdf["price"].max()
        assert row["low"] == pdf["price"].min()

    ret = got["close"].pct_change()
    assert pd.isna(got["ret"].iloc[0])
    assert got["ret"].iloc[1:].tolist() == pytest.approx(
        ret.iloc[1:].tolist()
    )
    # only 3 days of history → every min_periods-gated indicator is null
    assert got[["ma7", "ma30", "vol30"]].isna().all().all()


def test_rerun_day_is_idempotent(spark, sf_dir, wh):
    src = lambda d: _source_for_day(spark, sf_dir, d)  # noqa: E731
    run_range(spark, wh, DAYS[:2], src, min_day_rows=10)
    before = _metrics_pdf(spark, wh)
    raw_before = spark.read.parquet(wh.day_partition(DAYS[0])).count()

    run_day(spark, wh, DAYS[0], src(DAYS[0]), min_day_rows=10)  # re-run
    after = _metrics_pdf(spark, wh)
    raw_after = spark.read.parquet(wh.day_partition(DAYS[0])).count()

    pd.testing.assert_frame_equal(before, after)
    assert raw_before == raw_after


def test_quality_gate_fires_on_thin_day(spark, sf_dir, wh):
    with pytest.raises(AssertionError, match="day_rowcount"):
        run_day(
            spark,
            wh,
            DAYS[0],
            _source_for_day(spark, sf_dir, DAYS[0]),
            min_day_rows=1000,
        )


def test_normalize_klines_shape_and_dedup(spark):
    rows = [
        # open_time, o, h, l, close, vol, close_time, qv, n, tb, tq, ignore
        [1704067200000, "42000", "42100", "41900", "42050.5", "1", 0, 0, 0, 0, 0, 0],
        [1704070800000, "42050", "42200", "42000", "42150.0", "1", 0, 0, 0, 0, 0, 0],
        [1704067200000, "99999", "99999", "99999", "99999.0", "1", 0, 0, 0, 0, 0, 0],  # dup ts
    ]
    out = normalize_klines(spark, rows).toPandas()
    assert list(out.columns) == ["ts_utc", "asset", "price"]
    assert len(out) == 2  # keep-first dedup on ts_utc
    assert out["ts_utc"].iloc[0] == "2024-01-01T00:00:00Z"
    assert out["price"].iloc[0] == 42050.5
    assert (out["asset"] == "BTC-USD").all()


def test_incremental_indicators_match_full_recompute(spark, sf_dir, wh):
    """Seed daily_metrics from 30 days × 5 assets of events OHLC, enrich
    fully, scrub two days' indicators, then repair them incrementally —
    the incremental path must reproduce the full recompute exactly."""
    from pyspark.sql import functions as F

    from airflow_crypto_btc_spark.operators.ohlc import daily_ohlc
    from airflow_crypto_btc_spark.pipeline import (
        INDICATOR_COLS,
        OHLC_COLS,
        enrich_indicators,
        enrich_indicators_incremental,
    )
    from airflow_crypto_btc_spark.sources.tables import load_table

    base = (
        daily_ohlc(load_table(spark, sf_dir, "events"))
        .withColumnRenamed("event_type", "asset")
        .select(
            "date",
            "asset",
            *OHLC_COLS,
            *[F.lit(None).cast("double").alias(c) for c in INDICATOR_COLS],
        )
    )
    import os

    os.makedirs(wh.root, exist_ok=True)
    base.write.parquet(wh.daily_metrics)
    full = enrich_indicators(spark, wh).toPandas()

    scrub_days = ["2024-01-15", "2024-01-30"]
    scrubbed = spark.read.parquet(wh.daily_metrics).select(
        "date",
        "asset",
        *OHLC_COLS,
        *[
            F.when(
                F.col("date").isin(
                    [pd.Timestamp(d).date() for d in scrub_days]
                ),
                F.lit(None).cast("double"),
            )
            .otherwise(F.col(c))
            .alias(c)
            for c in INDICATOR_COLS
        ],
    )
    from airflow_crypto_btc_spark.pipeline import overwrite_staged

    overwrite_staged(scrubbed, wh.daily_metrics)

    for d in scrub_days:
        enrich_indicators_incremental(spark, wh, d)

    got = spark.read.parquet(wh.daily_metrics).toPandas()
    key = ["asset", "date"]
    pd.testing.assert_frame_equal(
        got.sort_values(key).reset_index(drop=True)[full.columns.tolist()],
        full.sort_values(key).reset_index(drop=True),
    )


def test_incremental_run_day_matches_full(spark, sf_dir, tmp_path):
    """run_day(incremental=True) produces the same daily_metrics as the
    full-rewrite path over a 3-day fold."""
    src = lambda d: _source_for_day(spark, sf_dir, d)  # noqa: E731
    wh_full = Warehouse(str(tmp_path / "full"))
    wh_inc = Warehouse(str(tmp_path / "inc"))
    for d in DAYS:
        run_day(spark, wh_full, d, src(d), min_day_rows=10)
        run_day(spark, wh_inc, d, src(d), min_day_rows=10, incremental=True)
    pd.testing.assert_frame_equal(
        _metrics_pdf(spark, wh_full), _metrics_pdf(spark, wh_inc)
    )


def test_multi_asset_day_folds_are_isolated(spark, sf_dir, tmp_path):
    """Two assets folded into one warehouse: per-asset extracts don't
    collide, the day partition holds both, and indicators are computed
    within each asset independently."""
    from airflow_crypto_btc_spark.pipeline import Warehouse as WH

    wh = WH(str(tmp_path / "multi"))

    def src(day, event_type):
        ev = load_table(spark, sf_dir, "events")
        return (
            ev.filter(
                (F.to_date("ts") == F.lit(day).cast("date"))
                & (F.col("event_type") == event_type)
            )
            .select(
                F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias(
                    "ts_utc"
                ),
                F.col("value").alias("price"),
            )
            .transform(lambda d: dedup_keep_first(d, ["ts_utc"], "ts_utc"))
        )

    for day in DAYS[:2]:
        for asset, etype in (("ERR", "error"), ("SGN", "signup")):
            run_day(
                spark, wh, day, src(day, etype), asset=asset, min_day_rows=2
            )

    got = (
        spark.read.parquet(wh.daily_metrics)
        .orderBy("asset", "date")
        .toPandas()
    )
    assert len(got) == 4  # 2 assets × 2 days
    assert sorted(got["asset"].unique()) == ["ERR", "SGN"]

    # per-asset OHLC equals its own single-asset source
    for asset, etype in (("ERR", "error"), ("SGN", "signup")):
        for day in DAYS[:2]:
            pdf = src(day, etype).toPandas().sort_values("ts_utc")
            row = got[
                (got["asset"] == asset) & (got["date"].astype(str) == day)
            ].iloc[0]
            assert row["open"] == pdf["price"].iloc[0]
            assert row["close"] == pdf["price"].iloc[-1]
    # ret partitions by asset: day-2 ret uses the SAME asset's day-1 close
    for asset in ("ERR", "SGN"):
        sub = got[got["asset"] == asset].sort_values("date")
        assert pd.isna(sub["ret"].iloc[0])
        expected = sub["close"].iloc[1] / sub["close"].iloc[0] - 1.0
        assert sub["ret"].iloc[1] == pytest.approx(expected)


def test_json_landing_roundtrip_matches_direct_normalization(spark, tmp_path):
    """Fetcher lands JSON-lines pages; the schema'd Spark scan of the
    landing zone equals direct in-memory normalization of the same rows."""
    from airflow_crypto_btc_spark.sources.json_landing import (
        land_klines_json,
        read_klines_landing,
    )

    rows = [
        [1704067200000, "42000", "42100", "41900", "42050.5", "1.0"],
        [1704070800000, "42050", "42200", "42000", "42150.0", "2.0"],
        [1704067200000, "9", "9", "9", "99999.0", "0.1"],  # dup ts, dropped
    ]
    landing = str(tmp_path / "landing")
    land_klines_json(rows[:2], landing, "2024-01-01")
    land_klines_json(rows[2:], landing, "2024-01-01b")

    via_landing = (
        read_klines_landing(spark, landing)
        .orderBy("ts_utc")
        .toPandas()
        .reset_index(drop=True)
    )
    via_direct = (
        normalize_klines(spark, [r + [0] * 6 for r in rows])
        .toPandas()
        .reset_index(drop=True)
    )
    assert len(via_landing) == 2
    assert list(via_landing["ts_utc"]) == list(via_direct["ts_utc"])
    # keep-first across files: the file-order winner for the dup ts is
    # whichever row dedup_keep_first ranks first on the tie-break — both
    # engines use the same rule, so prices agree
    assert via_landing["price"].iloc[1] == via_direct["price"].iloc[1]


def test_read_raw_range_prunes_partitions_at_planning_time(
    spark, sf_dir, wh
):
    """The hive-layout table must expose `date` as a partition column and
    push the day range into PartitionFilters — 1 of 3 day-directories
    never enters the scan."""
    from airflow_crypto_btc_spark.pipeline import (
        read_raw_day,
        read_raw_range,
    )

    run_range(
        spark,
        wh,
        DAYS,
        lambda d: _source_for_day(spark, sf_dir, d),
        min_day_rows=10,
    )
    assert len(DAYS) >= 3
    lo, hi = DAYS[0], DAYS[1]
    df = read_raw_range(spark, wh, lo, hi)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    expect = sum(
        read_raw_day(spark, wh, d).count() for d in (lo, hi)
    )
    # behavioral pruning proof: a corrupt file planted in the
    # out-of-range partition is never opened by the pruned scan (reading
    # it would throw), and the in-range data still comes back complete
    import os

    poison = os.path.join(
        wh.day_partition(DAYS[2]), "part-poison.parquet"
    )
    with open(poison, "wb") as f:
        f.write(b"this is not a parquet file")
    try:
        assert read_raw_range(spark, wh, lo, hi).count() == expect
    finally:
        os.remove(poison)
    assert set(
        r.date.isoformat() for r in df.select("date").distinct().collect()
    ) == {lo, hi}


def test_plot_report_artifact_branches(spark, sf_dir, wh):
    """The report stage always writes a real PNG (matplotlib when present,
    the stdlib zlib+struct rasterizer otherwise) plus a CSV twin carrying
    the exact window data — S9 no longer degrades to CSV-only in
    matplotlib-less environments."""
    from airflow_crypto_btc_spark.pipeline import plot_report

    run_range(
        spark,
        wh,
        DAYS,
        lambda d: _source_for_day(spark, sf_dir, d),
        min_day_rows=10,
    )
    out = plot_report(spark, wh, DAYS[-1])
    assert out.endswith(".png")
    with open(out, "rb") as fh:
        assert fh.read(8) == b"\x89PNG\r\n\x1a\n"
    assert os.path.getsize(out) > 500  # a drawn raster, not a husk
    pdf = pd.read_csv(out.replace(".png", ".csv"))
    assert list(pdf.columns) == ["date", "close", "ma7", "ma30"]
    assert len(pdf) == len(DAYS)


class _KlinesStub:
    """Local stand-in for the klines REST endpoint: scripted per-request
    behaviors ('500', 'empty', 'ok'), records received query params."""

    def __init__(self, behaviors):
        import http.server
        import json as _json
        import threading
        from urllib.parse import parse_qs, urlparse

        stub = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def do_GET(self):
                stub.requests.append(
                    {k: v[0] for k, v in
                     parse_qs(urlparse(self.path).query).items()}
                )
                mode = (
                    stub.behaviors[len(stub.requests) - 1]
                    if len(stub.requests) <= len(stub.behaviors)
                    else stub.behaviors[-1]
                )
                if mode == "500":
                    self.send_response(500)
                    self.end_headers()
                    return
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                body = [] if mode == "empty" else stub.klines
                self.wfile.write(_json.dumps(body).encode())

            def log_message(self, *a):  # keep pytest output clean
                pass

        self.behaviors = behaviors
        self.requests = []
        # two canned hourly candles in Binance's 12-column array shape
        self.klines = [
            [1704067200000, "42000.1", "42100", "41900", "42050.5",
             "10.5", 1704070799999, "441530", 120, "5.2", "218660", "0"],
            [1704070800000, "42050.5", "42200", "42000", "42150.0",
             "9.8", 1704074399999, "413070", 110, "4.9", "206530", "0"],
        ]
        self.server = http.server.ThreadingHTTPServer(
            ("127.0.0.1", 0), Handler
        )
        threading.Thread(
            target=self.server.serve_forever, daemon=True
        ).start()
        self.url = f"http://127.0.0.1:{self.server.server_port}/klines"

    def close(self):
        self.server.shutdown()
        self.server.server_close()  # release the listening socket


def test_fetch_klines_http_retry_ladder_and_parse(spark):
    """The real HTTP code path end-to-end against a local stub: a 500
    then an empty body are retried, the third attempt parses; the rows
    feed normalize_klines into the canonical batch; request params carry
    the day's UTC millisecond window."""
    from airflow_crypto_btc_spark.pipeline import fetch_klines_http

    stub = _KlinesStub(["500", "empty", "ok"])
    try:
        rows = fetch_klines_http(
            "BTCUSDT", "2024-01-01",
            base_url=stub.url, backoff_s=0.01,
        )
        assert len(rows) == 2 and rows[0][4] == "42050.5"
        assert len(stub.requests) == 3  # 500 → empty → ok
        p = stub.requests[0]
        assert p["symbol"] == "BTCUSDT" and p["interval"] == "1h"
        assert p["startTime"] == "1704067200000"
        assert p["endTime"] == str(1704067200000 + 86_400_000 - 1)
        batch = normalize_klines(spark, rows).collect()
        assert [r["ts_utc"] for r in batch] == [
            "2024-01-01T00:00:00Z", "2024-01-01T01:00:00Z",
        ]
        assert [r["price"] for r in batch] == [42050.5, 42150.0]
    finally:
        stub.close()


def test_fetch_klines_http_exhausts_attempts(spark):
    from airflow_crypto_btc_spark.pipeline import fetch_klines_http

    stub = _KlinesStub(["500"])
    try:
        with pytest.raises(RuntimeError, match="failed after 3"):
            fetch_klines_http(
                "BTCUSDT", "2024-01-01",
                attempts=3, base_url=stub.url, backoff_s=0.01,
            )
        assert len(stub.requests) == 3
    finally:
        stub.close()
