"""Incremental day-fold pipeline — the reference's whole DAG as one driver.

Reference lifecycle (``/root/reference/dags/dag_btc_daily.py:446-451``)::

    extract → load_raw → compute_daily_metrics → enrich_indicators
            → plot_report → quality_checks

re-expressed Spark-first (SURVEY §2.12, §7 step 8):

- Each stage builds a *lazy* DataFrame plan; stage boundaries that the
  reference realizes as XCom dicts + files on a shared volume become plain
  return values + parquet partitions in a warehouse directory.
- The unit of work is one logical day (the reference's ``catchup=True``
  daily schedule, ``:15-16``); re-running any day is idempotent because
  every writer is a merge (S5 first-writer-wins, S8 last-writer-wins) or an
  atomic staged overwrite (S7).
- Scale shape: ``raw_prices`` is stored day-partitioned
  (``date=YYYY-MM-DD/`` subdirs), so a day re-run touches exactly one
  partition — reads prune to it, and the merge swap rewrites only it.  The
  indicator pass runs over the *aggregated* daily table (365 rows/asset/yr),
  never the raw events, so its cost is independent of raw volume.
"""

from __future__ import annotations

import os
import shutil
import time
import uuid
from dataclasses import dataclass, field
from typing import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
)

from airflow_crypto_btc_spark.operators.indicators import (
    trailing_days_slice,
    with_indicators,
)
from airflow_crypto_btc_spark.operators.merge import (
    append_ignore,
    dedup_keep_first,
    upsert_by_key,
)
from airflow_crypto_btc_spark.operators.ohlc import daily_ohlc
from airflow_crypto_btc_spark.plans.quality import (
    CheckResult,
    check_artifact_nonempty,
    check_indicator_completeness,
    check_min_rows,
    check_not_null,
)

# --------------------------------------------------------------------- schemas

#: Canonical fact-table schema (reference DDL ``:138-144``) + day partition col.
RAW_PRICES_SCHEMA = StructType(
    [
        StructField("ts_utc", StringType()),  # ISO-8601 Z string, see F2
        StructField("asset", StringType()),
        StructField("price", DoubleType()),
    ]
)

#: Day-CSV interchange schema (reference ``:92-95``): explicit, never inferred.
DAY_CSV_SCHEMA = StructType(
    [
        StructField("ts_utc", StringType()),
        StructField("price", DoubleType()),
    ]
)

#: Binance klines page: 12 columns, numerics arrive as strings (S2,
#: reference ``:76-80``).
KLINES_COLUMNS = (
    "open_time",
    "open",
    "high",
    "low",
    "close",
    "volume",
    "close_time",
    "quote_volume",
    "trades",
    "taker_base",
    "taker_quote",
    "ignore",
)

OHLC_COLS = ("open", "high", "low", "close")
INDICATOR_COLS = ("ret", "ma7", "ma30", "vol30")


# ------------------------------------------------------------------- warehouse


@dataclass
class Warehouse:
    """Directory layout standing in for the reference's shared volume +
    SQLite file (``crypto.db``, reference ``:120``; volume map
    ``docker/docker-compose.yml:11-15``)."""

    root: str

    @property
    def data_dir(self) -> str:  # per-day CSV extracts (reference DATA_DIR)
        return os.path.join(self.root, "data")

    @property
    def reports_dir(self) -> str:  # report artifacts (reference REPORTS_DIR)
        return os.path.join(self.root, "reports")

    @property
    def raw_prices(self) -> str:
        return os.path.join(self.root, "raw_prices")

    @property
    def daily_metrics(self) -> str:
        return os.path.join(self.root, "daily_metrics")

    def day_csv(self, day: str, asset: str = "BTC-USD") -> str:
        # path scheme mirrors reference ``:49`` (btc_prices_<day>.csv);
        # the asset component generalizes the reference's single-asset
        # layout so one day's extracts for different assets never collide
        # with each other's idempotency short-circuit
        safe = asset.replace("/", "_")
        return os.path.join(self.data_dir, f"prices_{safe}_{day}.csv")

    def day_partition(self, day: str) -> str:
        return os.path.join(self.raw_prices, f"date={day}")

    def report_png(self, day: str) -> str:
        return os.path.join(self.reports_dir, f"daily_{day}.png")


def _swap_into_place(staging: str, final: str) -> None:
    """Atomic-rename commit: readers see the old snapshot or the new one,
    never a half-written directory (S7 transactional swap, ``:287-295``)."""
    tomb = final + ".old-" + uuid.uuid4().hex[:8]
    if os.path.exists(final):
        os.rename(final, tomb)
    os.rename(staging, final)
    if os.path.exists(tomb):
        shutil.rmtree(tomb)


def overwrite_staged(df: DataFrame, final_path: str) -> None:
    """S7 for a path that ``df``'s plan may itself be reading: stage the new
    snapshot to a sibling dir, then rename-swap.  ``mode("overwrite")``
    directly would delete the input files before the job reads them."""
    staging = final_path + ".staging-" + uuid.uuid4().hex[:8]
    df.write.mode("overwrite").parquet(staging)
    _swap_into_place(staging, final_path)


# ----------------------------------------------------------------- ingest (S1)


def normalize_klines(
    spark: SparkSession,
    rows: Sequence[Sequence],
    asset: str = "BTC-USD",
) -> DataFrame:
    """Klines page → canonical ``(ts_utc, asset, price)`` batch.

    Mirrors reference ``:76-94``: explicit 12-col schema (S2), epoch-ms →
    UTC timestamp (F1), ISO-8601 Z string form (F2), string→double cast
    (F3), keep-first dedup on ts (D1), sort by ts (O1).  All JVM-side
    expressions — no Python UDFs.
    """
    schema = StructType(
        [StructField(c, StringType()) for c in KLINES_COLUMNS]
    )
    raw = spark.createDataFrame(
        [[str(v) for v in r] for r in rows], schema=schema
    )
    batch = (
        raw.select(
            F.date_format(
                F.timestamp_millis(F.col("open_time").cast("long")),
                "yyyy-MM-dd'T'HH:mm:ss'Z'",
            ).alias("ts_utc"),
            F.col("close").cast("double").alias("price"),
        )
        .transform(lambda d: dedup_keep_first(d, ["ts_utc"], "ts_utc"))
        .withColumn("asset", F.lit(asset))
        .select("ts_utc", "asset", "price")
        .orderBy("ts_utc")
    )
    return batch


def fetch_klines_http(
    symbol: str,
    day: str,
    interval: str = "1h",
    timeout_s: int = 60,
    attempts: int = 4,
    base_url: str = "https://api.binance.com/api/v3/klines",
    backoff_s: float = 2.0,
) -> list[list]:
    """S1 adapter: REST GET of Binance klines with the reference's retry
    ladder (4 attempts, linear 2/4/6/8 s backoff, 60 s timeout — reference
    ``:64-104``).  Driver-side by design: at scale, land pages to object
    storage and ``spark.read.json`` them; never fan HTTP out of executors.

    ``base_url`` / ``backoff_s`` exist for the endpoint seam:
    tests/test_pipeline.py exercises the FULL ladder (5xx retry, empty
    body retry, success parse, exhaustion) against a local stub HTTP
    server, so the code path that talks to the real endpoint is covered
    without network access.  The public internet path differs only in
    the hostname.
    """
    import datetime as dt

    import requests  # baked into the container; no pip install

    start = dt.datetime.strptime(day, "%Y-%m-%d").replace(
        tzinfo=dt.timezone.utc
    )
    params = {
        "symbol": symbol,
        "interval": interval,
        "startTime": int(start.timestamp() * 1000),
        "endTime": int((start + dt.timedelta(days=1)).timestamp() * 1000) - 1,
        "limit": 1000,
    }
    last_err: Exception | None = None
    for attempt in range(1, attempts + 1):
        try:
            r = requests.get(base_url, params=params, timeout=timeout_s)
            if r.status_code != 200:
                raise RuntimeError(f"klines HTTP {r.status_code}")
            body = r.json()
            if not body:
                raise RuntimeError("klines empty body")
            return body
        except Exception as exc:  # noqa: BLE001 — retry ladder
            last_err = exc
            if attempt < attempts:
                time.sleep(backoff_s * attempt)
    raise RuntimeError(f"klines fetch failed after {attempts}") from last_err


def extract_day_from_events(
    spark: SparkSession,
    sf_dir: str,
    day: str,
    event_type: str = "purchase",
) -> DataFrame:
    """Fixture-backed stand-in for the HTTP source (SURVEY §2.1 S1 note):
    the ``events`` table's ``(ts, value)`` plays the klines ``(ts, price)``
    role; ``event_type`` plays the symbol."""
    from airflow_crypto_btc_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type") == event_type)
        .filter(F.to_date("ts") == F.lit(day).cast("date"))
        .select(
            F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("ts_utc"),
            F.col("value").alias("price"),
        )
        .transform(lambda d: dedup_keep_first(d, ["ts_utc"], "ts_utc"))
        .orderBy("ts_utc")
    )


# ------------------------------------------------------------------ stages 1-6


def extract(
    spark: SparkSession,
    wh: Warehouse,
    day: str,
    source: DataFrame,
    asset: str = "BTC-USD",
) -> str:
    """Stage 1 (reference ``:26-104``): land the day's ``(ts_utc, price)``
    batch as a CSV artifact.  Idempotency short-circuit: skip if the day's
    CSV already exists non-empty (``:52-53``)."""
    path = wh.day_csv(day, asset)
    if check_artifact_nonempty(path).passed:
        return path
    os.makedirs(wh.data_dir, exist_ok=True)
    pdf = source.select("ts_utc", "price").toPandas()  # ≤ ~24 rows/day/asset
    pdf.to_csv(path, index=False)
    return path


def load_raw(
    spark: SparkSession,
    wh: Warehouse,
    day: str,
    asset: str = "BTC-USD",
) -> DataFrame:
    """Stage 2 (reference ``:106-161``): CSV → ``raw_prices`` with
    INSERT-OR-IGNORE semantics (S5).  Only the day's partition is read and
    rewritten — the anti-join never touches other days."""
    csv = (
        spark.read.option("header", True)
        .schema(DAY_CSV_SCHEMA)
        .csv(wh.day_csv(day, asset))
    )
    if csv.isEmpty():  # P7 empty guard, reference ``:126-127``
        raise ValueError(f"empty day CSV for {day}")
    incoming = csv.withColumn("asset", F.lit(asset)).select(
        "ts_utc", "asset", "price"
    )

    part = wh.day_partition(day)
    if os.path.exists(part):
        existing = spark.read.schema(RAW_PRICES_SCHEMA).parquet(part)
        merged = append_ignore(
            existing,
            incoming,
            key_cols=("ts_utc", "asset"),
            order_col="ts_utc",
            broadcast_incoming=True,
        )
        staging = part + ".staging-" + uuid.uuid4().hex[:8]
        merged.write.mode("overwrite").parquet(staging)
        _swap_into_place(staging, part)
    else:
        os.makedirs(wh.raw_prices, exist_ok=True)
        dedup_keep_first(
            incoming, ("ts_utc", "asset"), "ts_utc"
        ).write.mode("overwrite").parquet(part)
    return read_raw_day(spark, wh, day)


def read_raw_range(
    spark: SparkSession, wh: Warehouse, lo_day: str, hi_day: str
) -> DataFrame:
    """Multi-day analytical scan of ``raw_prices`` via Hive-style partition
    discovery: the ``date=<day>`` directory layout becomes a real ``date``
    partition column and the range predicate is resolved at PLANNING time
    (``PartitionFilters`` in the scan node — directories outside the range
    are never listed into tasks, let alone read).

    This is the 100 TB path the day-granular layout exists for (SURVEY
    §4.3): a year-long backfill query over a petabyte table costs only the
    days it touches.  ``read_raw_day`` stays the single-partition fast
    path for the per-day pipeline fold.
    """
    df = spark.read.option("basePath", wh.raw_prices).parquet(wh.raw_prices)
    return df.filter(
        (F.col("date") >= F.lit(lo_day).cast("date"))
        & (F.col("date") <= F.lit(hi_day).cast("date"))
    )


def read_raw_day(spark: SparkSession, wh: Warehouse, day: str) -> DataFrame:
    """Partition-pruned day slice of ``raw_prices`` (P3+P4: the reference's
    ``asset=? AND ts_utc BETWEEN day 00:00:00Z AND 23:59:59Z``, ``:185``)."""
    return (
        spark.read.schema(RAW_PRICES_SCHEMA)
        .parquet(wh.day_partition(day))
        .withColumn("date", F.lit(day).cast("date"))
    )


def compute_daily_metrics(
    spark: SparkSession, wh: Warehouse, day: str, asset: str = "BTC-USD"
) -> DataFrame:
    """Stage 3 (reference ``:163-233``): day slice → OHLC row (A1 via
    min_by/max_by) → keyed upsert into ``daily_metrics`` (S8: OHLC columns
    last-writer-wins, indicator columns untouched)."""
    day_rows = read_raw_day(spark, wh, day).filter(F.col("asset") == asset)
    if day_rows.isEmpty():  # P7, reference ``:191-193``
        raise ValueError(f"no rows for {asset} on {day}")

    ohlc = (
        daily_ohlc(
            day_rows, ts_col="ts_utc", price_col="price", key_cols=("asset",)
        )
        .withColumn("date", F.lit(day).cast("date"))
        .select("date", "asset", *OHLC_COLS)
    )

    if os.path.exists(wh.daily_metrics):
        existing = spark.read.parquet(wh.daily_metrics)
        merged = upsert_by_key(
            existing, ohlc, key_cols=("date", "asset"), update_cols=OHLC_COLS
        )
    else:
        merged = ohlc.select(
            "date",
            "asset",
            *OHLC_COLS,
            *[F.lit(None).cast("double").alias(c) for c in INDICATOR_COLS],
        )
    overwrite_staged(merged, wh.daily_metrics)
    return spark.read.parquet(wh.daily_metrics)


def enrich_indicators(spark: SparkSession, wh: Warehouse) -> DataFrame:
    """Stage 4 (reference ``:235-297``): recompute ret/ma7/ma30/vol30 over
    the full daily history and transactionally rewrite the table.  The input
    is the *aggregated* table (rows = days×assets), so "full history" is
    cheap regardless of raw-event volume; parallelism = #assets."""
    metrics = spark.read.parquet(wh.daily_metrics)
    if metrics.isEmpty():  # P7, reference ``:259-261``
        raise ValueError("daily_metrics is empty")
    enriched = with_indicators(
        metrics.drop(*INDICATOR_COLS),
        date_col="date",
        close_col="close",
        key_cols=("asset",),
    ).select("date", "asset", *OHLC_COLS, *INDICATOR_COLS)
    overwrite_staged(enriched, wh.daily_metrics)
    return spark.read.parquet(wh.daily_metrics)


def enrich_indicators_incremental(
    spark: SparkSession,
    wh: Warehouse,
    day: str,
    lookback_rows: int = 30,
) -> DataFrame:
    """Stage 4, the O(new data) variant: the reference recomputes every
    indicator over the whole history each run (``:254-295`` — quadratic
    over the pipeline's lifetime).  All four indicators are trailing
    row-frames of ≤30 rows, so the target day's values depend on at most
    ``lookback_rows + 1`` trailing daily rows per asset: slice exactly
    those, window over the slice, and merge ONLY the day's indicator
    columns back (S8 update_cols semantics).

    At scale this is the difference between touching 365×assets rows and
    touching 31×assets rows per day — and the slice is partition-prunable
    when ``daily_metrics`` is stored date-partitioned.
    """
    from pyspark.sql import Window

    metrics = spark.read.parquet(wh.daily_metrics)
    d = F.lit(day).cast("date")
    # last (lookback+1) rows per asset at or before `day`: row frames are
    # ROW-based, so slice by trailing row rank, not calendar arithmetic
    w = Window.partitionBy("asset").orderBy(F.desc("date"))
    ctx = (
        metrics.filter(F.col("date") <= d)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= lookback_rows + 1)
        .drop("__rn")
    )
    enriched_day = (
        with_indicators(
            ctx.drop(*INDICATOR_COLS),
            date_col="date",
            close_col="close",
            key_cols=("asset",),
        )
        .filter(F.col("date") == d)
        .select("date", "asset", *INDICATOR_COLS)
    )
    merged = upsert_by_key(
        metrics,
        enriched_day,
        key_cols=("date", "asset"),
        update_cols=INDICATOR_COLS,
    )
    overwrite_staged(merged, wh.daily_metrics)
    return spark.read.parquet(wh.daily_metrics)


def plot_report(
    spark: SparkSession, wh: Warehouse, day: str, window_days: int = 60
) -> str:
    """Stage 5 (reference ``:299-371``): last-60-day close/ma7/ma30 chart.
    Driver-side sink by design — Arrow ``toPandas()`` on a ≤60-row slice.
    matplotlib is preferred when present; without it the chart is rasterized
    by the stdlib PNG renderer (``functions/rasterplot.py``, zlib+struct),
    so S9 produces a real PNG in every environment. A CSV twin with the
    exact window data is written alongside either way, so the numbers
    behind the raster stay machine-readable.
    """
    os.makedirs(wh.reports_dir, exist_ok=True)
    metrics = spark.read.parquet(wh.daily_metrics)
    window = trailing_days_slice(metrics, day, days=window_days)
    pdf = (
        window.select("date", "close", "ma7", "ma30")
        .orderBy("date")
        .toPandas()
    )
    if pdf.empty:  # P7, reference ``:331-332, :344-345``
        raise ValueError(f"no report window data ending {day}")
    out = wh.report_png(day)
    pdf.to_csv(out.replace(".png", ".csv"), index=False)
    title = f"daily close / ma7 / ma30 through {day}"
    try:
        import matplotlib  # noqa: F401 — preferred renderer when present

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(10, 5))
        for col in ("close", "ma7", "ma30"):
            ax.plot(pdf["date"], pdf[col], label=col)
        ax.legend()
        ax.set_title(title)
        fig.savefig(out, dpi=140)
        plt.close(fig)
    except ImportError:
        from .functions.rasterplot import render_line_chart

        render_line_chart(
            out,
            [str(d) for d in pdf["date"]],
            {c: pdf[c].tolist() for c in ("close", "ma7", "ma30")},
            title=title,
        )
    return out


def quality_checks(
    spark: SparkSession,
    wh: Warehouse,
    day: str,
    report_path: str,
    asset: str = "BTC-USD",
    min_day_rows: int = 20,
) -> list[CheckResult]:
    """Stage 6 (reference ``:373-443``): Q1-Q5 as one report; raises on the
    first failure like the reference's asserts."""
    metrics = spark.read.parquet(wh.daily_metrics)
    day_rows = read_raw_day(spark, wh, day).filter(F.col("asset") == asset)
    day_metrics = metrics.filter(F.col("date") == F.lit(day).cast("date"))
    results = [
        check_artifact_nonempty(wh.day_csv(day, asset), "day_csv"),  # Q1
        check_min_rows(day_rows, min_day_rows, "day_rowcount"),  # Q2
        check_not_null(day_metrics, list(OHLC_COLS), "ohlc_not_null"),  # Q3
        check_indicator_completeness(metrics, day),  # Q4
        check_artifact_nonempty(report_path, "report"),  # Q5
    ]
    for r in results:
        r.raise_if_failed()
    return results


# ---------------------------------------------------------------- orchestrator


def with_retries(
    fn: Callable[[], object], attempts: int = 3, delay_s: float = 0.0
):
    """Task-level retry wrapper (reference default_args ``retries=2``,
    ``:17`` — 3 total attempts)."""
    last: Exception | None = None
    for attempt in range(attempts):
        try:
            return fn()
        except Exception as exc:  # noqa: BLE001
            last = exc
            if attempt < attempts - 1 and delay_s:
                time.sleep(delay_s)
    raise last  # type: ignore[misc]


@dataclass
class RunResult:
    day: str
    csv_path: str
    report_path: str
    checks: list[CheckResult] = field(default_factory=list)


def run_day(
    spark: SparkSession,
    wh: Warehouse,
    day: str,
    source: DataFrame,
    asset: str = "BTC-USD",
    min_day_rows: int = 20,
    retries: int = 1,
    incremental: bool = False,
) -> RunResult:
    """One logical day through all six stages — re-run safe (S5/S8/S7 merge
    discipline), mirroring one Airflow DAG run of the reference.
    ``incremental=True`` swaps the full-history indicator rewrite for the
    O(new data) per-day repair (same results, see
    tests/test_pipeline.py)."""

    def _go() -> RunResult:
        csv_path = extract(spark, wh, day, source, asset=asset)
        load_raw(spark, wh, day, asset=asset)
        compute_daily_metrics(spark, wh, day, asset=asset)
        if incremental:
            enrich_indicators_incremental(spark, wh, day)
        else:
            enrich_indicators(spark, wh)
        report = plot_report(spark, wh, day)
        checks = quality_checks(
            spark, wh, day, report, asset=asset, min_day_rows=min_day_rows
        )
        return RunResult(day, csv_path, report, checks)

    return with_retries(_go, attempts=retries)  # type: ignore[return-value]


def run_range(
    spark: SparkSession,
    wh: Warehouse,
    days: Sequence[str],
    source_for_day: Callable[[str], DataFrame],
    **kwargs,
) -> list[RunResult]:
    """Backfill loop = the reference's ``catchup=True`` (``:15-16``)."""
    return [
        run_day(spark, wh, d, source_for_day(d), **kwargs) for d in days
    ]
