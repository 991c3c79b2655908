"""S5/S8 merge-writer semantics (reference
/root/reference/dags/dag_btc_daily.py:147-155 and :219-230):

- append_ignore: first-writer-wins, idempotent under re-runs.
- upsert_by_key: last-writer-wins on update columns ONLY; untouched columns
  keep existing values; brand-new keys get nulls there.
- dedup_keep_first: deterministic survivor.
"""

from __future__ import annotations

import pytest

from airflow_crypto_btc_spark.operators.merge import (
    append_ignore,
    dedup_keep_first,
    upsert_by_key,
)

SCHEMA = "ts string, asset string, price double"


@pytest.fixture()
def tables(spark):
    existing = spark.createDataFrame(
        [("t1", "BTC", 1.0), ("t2", "BTC", 2.0)], SCHEMA
    )
    incoming = spark.createDataFrame(
        [("t2", "BTC", 99.0), ("t3", "BTC", 3.0)], SCHEMA
    )
    return existing, incoming


def test_append_ignore_first_writer_wins(tables):
    existing, incoming = tables
    got = {
        r["ts"]: r["price"]
        for r in append_ignore(existing, incoming, ["ts", "asset"]).collect()
    }
    assert got == {"t1": 1.0, "t2": 2.0, "t3": 3.0}  # t2 keeps OLD value


def test_append_ignore_idempotent(tables):
    existing, incoming = tables
    once = append_ignore(existing, incoming, ["ts", "asset"])
    twice = append_ignore(once, incoming, ["ts", "asset"])
    assert sorted(once.collect()) == sorted(twice.collect())


def test_append_ignore_intra_batch_keep_first(spark):
    existing = spark.createDataFrame([("t0", "BTC", 0.0)], SCHEMA)
    incoming = spark.createDataFrame(
        [("t1", "BTC", 10.0), ("t1", "BTC", 20.0)], SCHEMA
    )
    got = append_ignore(
        existing, incoming, ["ts", "asset"], order_col="price"
    ).collect()
    prices = {r["ts"]: r["price"] for r in got}
    assert prices == {"t0": 0.0, "t1": 10.0}


def test_upsert_last_writer_wins_update_cols_only(spark):
    existing = spark.createDataFrame(
        [("2024-01-01", 100.0, 7.0), ("2024-01-02", 200.0, 8.0)],
        "date string, close double, ma7 double",
    )
    incoming = spark.createDataFrame(
        [("2024-01-02", 222.0), ("2024-01-03", 333.0)],
        "date string, close double",
    )
    got = {
        r["date"]: (r["close"], r["ma7"])
        for r in upsert_by_key(
            existing, incoming, ["date"], update_cols=["close"]
        ).collect()
    }
    assert got["2024-01-01"] == (100.0, 7.0)   # untouched
    assert got["2024-01-02"] == (222.0, 8.0)   # close updated, ma7 kept
    assert got["2024-01-03"] == (333.0, None)  # new key, non-update col null


def test_upsert_idempotent(spark):
    existing = spark.createDataFrame(
        [("d1", 1.0, None)], "date string, close double, ma7 double"
    )
    incoming = spark.createDataFrame(
        [("d1", 5.0), ("d2", 6.0)], "date string, close double"
    )
    once = upsert_by_key(existing, incoming, ["date"], ["close"])
    twice = upsert_by_key(once, incoming, ["date"], ["close"])
    assert sorted(once.collect()) == sorted(twice.collect())


def test_upsert_null_update_value_still_wins(spark):
    """A null in the incoming update column must overwrite (presence is
    keyed on the row, not the value)."""
    existing = spark.createDataFrame(
        [("d1", 1.0, 9.0)], "date string, close double, ma7 double"
    )
    incoming = spark.createDataFrame(
        [("d1", None)], "date string, close double"
    )
    row = upsert_by_key(existing, incoming, ["date"], ["close"]).collect()[0]
    assert row["close"] is None and row["ma7"] == 9.0


def test_dedup_keep_first_deterministic(spark):
    df = spark.createDataFrame(
        [("k", 3, "c"), ("k", 1, "a"), ("k", 2, "b"), ("j", 9, "z")],
        "key string, seq int, payload string",
    )
    got = dedup_keep_first(df, ["key"], "seq").collect()
    assert {(r["key"], r["payload"]) for r in got} == {("k", "a"), ("j", "z")}
