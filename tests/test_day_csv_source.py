"""Custom day_csv Python DataSource: round-trip fidelity, planning-time
file pruning via pushed filters, and the pushdown contract (foreign
predicates handed back to Spark)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    EqualTo,
    GreaterThanOrEqual,
    In,
    LessThan,
)

from airflow_crypto_btc_spark.sources.day_csv_source import (
    DayCsvReader,
    register,
    write_day_csvs,
)
from airflow_crypto_btc_spark.sources.tables import load_table


def _land(spark, sf_dir, tmp_path, days=5):
    ev = load_table(spark, sf_dir, "events")
    pdf = (
        ev.filter(F.col("ts") < F.lit(f"2024-01-{days + 1:02d}").cast("timestamp"))
        .select("ts", "value")
        .toPandas()
    )
    path = str(tmp_path / "landing")
    write_day_csvs(pdf, path)
    return pdf, path


def test_round_trip_exact(spark, sf_dir, tmp_path):
    pdf, path = _land(spark, sf_dir, tmp_path)
    register(spark)
    got = (
        spark.read.format("day_csv")
        .option("path", path)
        .load()
        .toPandas()
        .sort_values(["ts_utc"])
        .reset_index(drop=True)
    )
    want = pdf.sort_values("ts").reset_index(drop=True)
    assert (got["ts_utc"].values == want["ts"].values).all()
    assert (got["price"].values == want["value"].values).all()  # bitwise
    assert (
        got["day"] == got["ts_utc"].dt.strftime("%Y-%m-%d")
    ).all()


def test_push_filters_prune_file_list(spark, sf_dir, tmp_path):
    _, path = _land(spark, sf_dir, tmp_path)
    r = DayCsvReader({"path": path})
    assert len(r.partitions()) == 5

    leftover = list(r.pushFilters([EqualTo(("day",), "2024-01-02")]))
    assert leftover == []
    parts = r.partitions()
    assert [p.day for p in parts] == ["2024-01-02"]

    r2 = DayCsvReader({"path": path})
    leftover = list(
        r2.pushFilters(
            [
                GreaterThanOrEqual(("day",), "2024-01-02"),
                LessThan(("day",), "2024-01-05"),
                EqualTo(("price",), 1.0),  # not ours → handed back
            ]
        )
    )
    assert len(leftover) == 1 and isinstance(leftover[0], EqualTo)
    assert [p.day for p in r2.partitions()] == [
        "2024-01-02", "2024-01-03", "2024-01-04",
    ]

    r3 = DayCsvReader({"path": path})
    list(r3.pushFilters([In(("day",), ("2024-01-01", "2024-01-04"))]))
    assert [p.day for p in r3.partitions()] == [
        "2024-01-01", "2024-01-04",
    ]


def test_filtered_read_matches_source_table(spark, sf_dir, tmp_path):
    """End to end through Spark's planner: day range + a value predicate
    the source does NOT handle — results must equal the parquet path."""
    pdf, path = _land(spark, sf_dir, tmp_path)
    register(spark)
    got = (
        spark.read.format("day_csv")
        .option("path", path)
        .load()
        .filter(
            (F.col("day") >= "2024-01-02")
            & (F.col("day") < "2024-01-04")
            & (F.col("price") > 100.0)
        )
        .toPandas()
    )
    m = pdf["ts"].dt.strftime("%Y-%m-%d")
    want = pdf[(m >= "2024-01-02") & (m < "2024-01-04") & (pdf["value"] > 100.0)]
    assert sorted(got["ts_utc"]) == sorted(want["ts"])
    assert len(got) > 0


def test_streaming_tail_ingests_only_new_days_exactly_once(
    spark, sf_dir, tmp_path
):
    """availableNow run 1 ingests all landed days; after a new day lands,
    run 2 from the same checkpoint appends ONLY that day — no re-reads,
    no gaps (day-string offsets + immutable files = exactly-once)."""
    pdf, path = _land(spark, sf_dir, tmp_path, days=3)
    register(spark)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        q = (
            spark.readStream.format("day_csv")
            .option("path", path)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    got1 = spark.read.parquet(out)
    assert got1.count() == len(pdf)
    assert got1.select("day").distinct().count() == 3

    # a fourth day lands
    ev = load_table(spark, sf_dir, "events")
    late = (
        ev.filter(
            (F.col("ts") >= F.lit("2024-01-04").cast("timestamp"))
            & (F.col("ts") < F.lit("2024-01-05").cast("timestamp"))
        )
        .select("ts", "value")
        .toPandas()
    )
    write_day_csvs(late, path)
    run_once()
    got2 = spark.read.parquet(out)
    assert got2.count() == len(pdf) + len(late)
    assert got2.select("day", "ts_utc").distinct().count() == got2.count()


def test_streaming_max_days_per_batch_bounds_each_microbatch(
    spark, sf_dir, tmp_path
):
    """With max_days_per_batch=1, an availableNow run over a 3-day backlog
    must produce 3 one-day batches (bounded cold start), and still land
    every row exactly once."""
    pdf, path = _land(spark, sf_dir, tmp_path, days=3)
    register(spark)

    batches = []

    def sink(df, epoch_id):
        days = [r.day for r in df.select("day").distinct().collect()]
        batches.append(sorted(days))

    q = (
        spark.readStream.format("day_csv")
        .option("path", path)
        .option("max_days_per_batch", "1")
        .load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="50 milliseconds")
        .start()
    )
    import time

    try:
        deadline = time.time() + 90
        while (
            sum(len(b) for b in batches) < 3 and time.time() < deadline
        ):
            time.sleep(0.2)
    finally:
        q.stop()
    non_empty = [b for b in batches if b]
    assert non_empty == [
        ["2024-01-01"], ["2024-01-02"], ["2024-01-03"]
    ]


def test_writer_round_trips_through_the_day_layout(spark, sf_dir, tmp_path):
    """df → day_csv sink → day_csv source must round-trip exactly, with
    one file per day in the reference's naming scheme."""
    import glob
    import os

    pdf, src_path = _land(spark, sf_dir, tmp_path, days=3)
    register(spark)
    src = (
        spark.read.format("day_csv").option("path", src_path).load()
    )
    dst = str(tmp_path / "dst")
    (
        src.repartition("day")
        .write.format("day_csv")
        .option("path", dst)
        .mode("append")
        .save()
    )
    assert sorted(os.path.basename(p) for p in glob.glob(dst + "/*.csv")) == [
        f"btc_prices_2024-01-0{i}.csv" for i in (1, 2, 3)
    ]
    back = spark.read.format("day_csv").option("path", dst).load()
    a = src.orderBy("ts_utc").toPandas().reset_index(drop=True)
    b = back.orderBy("ts_utc").toPandas().reset_index(drop=True)
    assert a.equals(b)


def test_writer_append_refuses_existing_day_and_stays_clean(
    spark, sf_dir, tmp_path
):
    """Colliding with an already-landed day in append mode must fail the
    job AND leave no staging debris and the original file untouched;
    overwrite mode re-lands it."""
    import glob
    import os

    import pytest as _pytest

    _, src_path = _land(spark, sf_dir, tmp_path, days=2)
    register(spark)
    src = spark.read.format("day_csv").option("path", src_path).load()
    dst = str(tmp_path / "dst")

    def land(mode, df=src):
        (
            df.repartition("day")
            .write.format("day_csv")
            .option("path", dst)
            .mode(mode)
            .save()
        )

    land("append")
    before = open(dst + "/btc_prices_2024-01-01.csv").read()
    with _pytest.raises(Exception, match="already exist"):
        land("append", src.filter(F.col("day") == "2024-01-01"))
    assert open(dst + "/btc_prices_2024-01-01.csv").read() == before
    assert glob.glob(dst + "/.staging-*") == []
    land("overwrite", src.filter(F.col("day") == "2024-01-01"))
    assert open(dst + "/btc_prices_2024-01-01.csv").read() == before
