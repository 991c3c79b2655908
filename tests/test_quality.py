"""Q1-Q5 data-quality rules (reference
/root/reference/dags/dag_btc_daily.py:373-443) — both the passing and the
firing side of every rule."""

from __future__ import annotations

import pytest

from airflow_crypto_btc_spark.plans.quality import (
    check_artifact_nonempty,
    check_indicator_completeness,
    check_min_rows,
    check_not_null,
)


def test_artifact_nonempty(tmp_path):
    # Q5 contract: a .png artifact must carry the real PNG signature —
    # a non-empty husk that no decoder could open does not pass.
    fake = tmp_path / "report.png"
    fake.write_bytes(b"xx")
    assert not check_artifact_nonempty(str(fake)).passed
    real = tmp_path / "real.png"
    real.write_bytes(b"\x89PNG\r\n\x1a\n" + b"rest-of-chunks")
    assert check_artifact_nonempty(str(real)).passed
    csv = tmp_path / "data.csv"
    csv.write_bytes(b"a,b\n1,2\n")  # non-PNG artifacts: size check only
    assert check_artifact_nonempty(str(csv)).passed
    empty = tmp_path / "empty.csv"
    empty.write_bytes(b"")
    res = check_artifact_nonempty(str(empty))
    assert not res.passed
    with pytest.raises(AssertionError):
        res.raise_if_failed()


def test_min_rows(spark):
    df = spark.range(25)
    assert check_min_rows(df, 20).passed  # the ≥20 hourly-candle floor
    assert not check_min_rows(df, 26).passed


def test_not_null(spark):
    ok = spark.createDataFrame(
        [(1.0, 2.0)], "open double, close double"
    )
    assert check_not_null(ok, ["open", "close"]).passed
    bad = spark.createDataFrame(
        [(1.0, None)], "open double, close double"
    )
    res = check_not_null(bad, ["open", "close"])
    assert not res.passed and "close" in res.observed


def test_indicator_completeness_gate(spark):
    import datetime as dt

    rows = [
        (dt.date(2023, 1, 1) + dt.timedelta(days=i), 1.0, 1.0)
        for i in range(29)
    ]
    short = spark.createDataFrame(
        rows, "date date, ma30 double, vol30 double"
    )
    # history < 30 → gate inactive even with nulls
    short_nulls = spark.createDataFrame(
        [(d, None, None) for d, *_ in rows],
        "date date, ma30 double, vol30 double",
    )
    assert check_indicator_completeness(short_nulls, "2023-01-29").passed

    rows31 = [
        (dt.date(2023, 1, 1) + dt.timedelta(days=i), 1.0, 1.0)
        for i in range(31)
    ]
    full = spark.createDataFrame(
        rows31, "date date, ma30 double, vol30 double"
    )
    assert check_indicator_completeness(full, "2023-01-31").passed

    rows_bad = rows31[:-1] + [(dt.date(2023, 1, 31), None, 1.0)]
    broken = spark.createDataFrame(
        rows_bad, "date date, ma30 double, vol30 double"
    )
    assert not check_indicator_completeness(broken, "2023-01-31").passed


def test_expectation_suite_passes_on_fixture(spark, sf_dir):
    """All six declarative rules hold on clean fixture data, and the rule
    count adds no extra scans (single aggregate + stack unpivot)."""
    from airflow_crypto_btc_spark.plans.registry_ext2 import (
        q_dq_expectation_suite,
    )

    df = q_dq_expectation_suite(spark, sf_dir)
    rows = {r["rule"]: r for r in df.collect()}
    assert len(rows) == 6
    assert all(r["passed"] for r in rows.values()), rows
    plan = df._jdf.queryExecution().executedPlan().toString()
    # two distinct-aggregates (user_id, event_id) cost one extra scan;
    # scan count is a constant of the suite, not of the rule count
    assert plan.count("Scan parquet") <= 2


def test_expectation_suite_catches_violations(spark, tmp_path):
    """A corrupted slice (dup ids, null ts, bad type) must flip the
    matching rules to failed."""
    import datetime as dt

    from pyspark.sql import functions as F

    from airflow_crypto_btc_spark.plans.registry_ext2 import (
        q_dq_expectation_suite,
    )
    from airflow_crypto_btc_spark.sources.tables import load_table

    bad = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 2), 7, "bogus_type", 1.0, "{}"),
            (1, None, 8, "click", 2.0, "{}"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    src = load_table(spark, "/root/testdata/sf0.001", "events")
    bad = bad.withColumn("ts", F.col("ts").cast(src.schema["ts"].dataType))
    src.unionByName(bad).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    rows = {
        r["rule"]: r["passed"]
        for r in q_dq_expectation_suite(spark, str(tmp_path)).collect()
    }
    assert not rows["ts_not_null_frac"]
    assert not rows["event_type_valid_frac"]
    assert not rows["event_id_dup_rate_max"]
    assert rows["row_count_min"]


def test_observed_metrics_ride_the_action(spark, sf_dir):
    """observe() metrics accumulate during the consumer's own action —
    no second scan — and report the same facts a separate DQ query
    would."""
    from airflow_crypto_btc_spark.plans.quality import observed_metrics
    from airflow_crypto_btc_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    inst, obs = observed_metrics(ev)
    # the "business" action: count purchases (the metrics piggyback)
    n_purchases = inst.filter("event_type = 'purchase'").count()
    m = obs.get
    assert m["n_rows"] == ev.count()
    assert m["null_values"] == 0
    assert n_purchases > 0
    assert str(m["min_ts"]).startswith("2024-01-01")
    assert m["approx_users"] > 0
