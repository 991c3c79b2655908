"""Incremental rollup maintenance: the merge algebra and the snapshot-table
maintenance loop (operators/incremental.py)."""

import datetime as dt

from pyspark.sql import functions as F


def _rows(df):
    return {
        tuple(r[c] for c in sorted(df.columns)) for r in df.collect()
    }


def test_merge_equals_full_recompute(spark, sf_dir):
    """merge(state(x), state(y)) == state(x ∪ y) — the property that makes
    O(|delta|) maintenance correct."""
    from airflow_crypto_btc_spark.operators.incremental import (
        merge_ohlc_states,
        ohlc_state,
        state_to_ohlc,
    )
    from airflow_crypto_btc_spark.operators.ohlc import daily_ohlc
    from airflow_crypto_btc_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.dayofmonth("ts") <= 10)
    b = ev.filter(F.dayofmonth("ts").between(11, 20))
    c = ev.filter(F.dayofmonth("ts") > 20)
    merged = state_to_ohlc(
        merge_ohlc_states(ohlc_state(a), ohlc_state(b), ohlc_state(c))
    )
    full = daily_ohlc(ev)
    assert _rows(merged) == _rows(full)


def test_merge_is_commutative(spark, sf_dir):
    from airflow_crypto_btc_spark.operators.incremental import (
        merge_ohlc_states,
        ohlc_state,
        state_to_ohlc,
    )
    from airflow_crypto_btc_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    a = ohlc_state(ev.filter(F.dayofmonth("ts") <= 15))
    b = ohlc_state(ev.filter(F.dayofmonth("ts") > 15))
    ab = state_to_ohlc(merge_ohlc_states(a, b))
    ba = state_to_ohlc(merge_ohlc_states(b, a))
    assert _rows(ab) == _rows(ba)


def _mk_events(spark, day, values):
    return spark.createDataFrame(
        [
            ("purchase", dt.datetime(2024, 1, day, h), float(v))
            for h, v in enumerate(values, start=1)
        ],
        "event_type string, ts timestamp, value double",
    )


def test_maintenance_loop_matches_full_recompute(spark, tmp_path):
    """Three appends to the base snapshot table, three maintenance steps:
    the state table must serve exactly daily_ohlc(all rows), the delta
    scan must touch only files appended since the last step, and an
    idempotent re-run of a span must not change the state."""
    from airflow_crypto_btc_spark.operators.incremental import (
        maintain_ohlc_rollup,
        state_to_ohlc,
    )
    from airflow_crypto_btc_spark.operators.ohlc import daily_ohlc
    from airflow_crypto_btc_spark.sources.snapshot_table import (
        append,
        read_snapshot,
    )

    base = str(tmp_path / "events_tbl")
    state = str(tmp_path / "ohlc_state")

    batches = [
        _mk_events(spark, 1, [10.0, 12.0, 11.0]),
        # day 1 gets LATE rows (new close, new high) + day 2 opens
        _mk_events(spark, 2, [20.0, 19.0]).unionByName(
            spark.createDataFrame(
                [("purchase", dt.datetime(2024, 1, 1, 9), 15.0)],
                "event_type string, ts timestamp, value double",
            )
        ),
        _mk_events(spark, 3, [30.0]),
    ]
    seen = None
    for i, b in enumerate(batches):
        append(spark, b, base)
        version = maintain_ohlc_rollup(spark, base, state)
        seen = b if seen is None else seen.unionByName(b)
        got = _rows(state_to_ohlc(read_snapshot(spark, state)))
        want = _rows(daily_ohlc(seen))
        assert got == want, f"mismatch after batch {i}"

    # late row merged into day 1: close follows the max ts, high updated
    d1 = {
        str(r["date"]): r
        for r in state_to_ohlc(read_snapshot(spark, state)).collect()
    }
    assert d1["2024-01-01"]["close"] == 15.0
    assert d1["2024-01-01"]["high"] == 15.0
    assert d1["2024-01-01"]["open"] == 10.0
    assert d1["2024-01-01"]["n_obs"] == 4

    # the consumed base version is recorded in the STATE table's log, so a
    # retry (e.g. after a crash before any caller-side bookkeeping) sees
    # the mark and applies nothing — n_obs would double-count otherwise
    from airflow_crypto_btc_spark.operators.incremental import (
        rollup_high_water_mark,
    )

    assert rollup_high_water_mark(state) == version
    before = _rows(state_to_ohlc(read_snapshot(spark, state)))
    assert maintain_ohlc_rollup(spark, base, state) == version
    assert maintain_ohlc_rollup(spark, base, state) == version
    after = _rows(state_to_ohlc(read_snapshot(spark, state)))
    assert before == after


def test_maintenance_reads_only_appended_files(spark, tmp_path):
    """The delta feeding a maintenance step comes from the commit-log fast
    path: only files added after from_version are opened."""
    from airflow_crypto_btc_spark.sources.snapshot_table import (
        append,
        snapshot_changes,
    )

    import json as _json

    from airflow_crypto_btc_spark.sources.snapshot_table import _log_path

    base = str(tmp_path / "events_tbl")
    v1 = append(spark, _mk_events(spark, 1, [10.0, 12.0]), base)
    v2 = append(spark, _mk_events(spark, 2, [20.0]), base)
    with open(_log_path(base, v1)) as fh:
        v1_files = set(_json.load(fh)["add"])
    with open(_log_path(base, v2)) as fh:
        v2_files = set(_json.load(fh)["add"])
    delta = snapshot_changes(spark, base, from_version=v1)
    opened = {
        p.split("/data/")[1].split("/")[0] for p in delta.inputFiles()
    }
    assert opened and opened <= v2_files
    assert not opened & v1_files  # history files never touched


def test_ndv_sketch_merge_equals_full_sketch(spark, sf_dir):
    """HLL register-maxima are order/partitioning independent: the merged
    split-sketch estimate must EQUAL the full-data sketch estimate (not
    just approximate it), and both must sit within ~3*1.04/sqrt(2^12)
    of the exact distinct count."""
    from airflow_crypto_btc_spark.operators.incremental import (
        merge_ndv_states,
        ndv_state,
        state_to_ndv,
    )
    from airflow_crypto_btc_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.dayofmonth("ts") <= 15)
    b = ev.filter(F.dayofmonth("ts") > 15)
    merged = state_to_ndv(merge_ndv_states(ndv_state(a), ndv_state(b)))
    full = state_to_ndv(ndv_state(ev))
    assert _rows(merged) == _rows(full)

    exact = {
        (r["event_type"], r["date"]): r["exact"]
        for r in ev.groupBy(
            "event_type", F.to_date("ts").alias("date")
        )
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    rse = 3 * 1.04 / (2**12) ** 0.5  # lg_k=12 -> ~1.6% at 3 sigma
    for r in merged.collect():
        e = exact[(r["event_type"], r["date"])]
        assert abs(r["ndv"] - e) <= max(2.0, rse * e)
