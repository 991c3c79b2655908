"""as-of join + sessionization unit tests on hand-built frames: inclusive
at-or-before matching, no-predecessor nulls, per-group isolation, and the
strict session-gap boundary."""

from __future__ import annotations

import datetime as dt

from airflow_crypto_btc_spark.operators.asof import asof_join, sessionize


def _ts(minute, second=0):
    return dt.datetime(2024, 1, 1, 10, minute, second)


def test_asof_join_backward_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts(5)),   # matches r@5 (inclusive at equal ts)
            (2, "u1", _ts(9)),   # matches r@7 (latest ≤ 9)
            (3, "u1", _ts(1)),   # no predecessor → nulls
            (4, "u2", _ts(30)),  # other group: matches its own r@20
        ],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts(5), 50.0),
            ("u1", _ts(7), 70.0),
            ("u2", _ts(20), 200.0),
            ("u2", _ts(40), 400.0),  # after left@30 → never matched
        ],
        "user_id string, ts timestamp, value double",
    )
    out = {
        r["event_id"]: r
        for r in asof_join(
            left, right, "ts", "ts", by=("user_id",), value_cols=("value",)
        ).collect()
    }
    assert out[1]["r_value"] == 50.0 and out[1]["r_ts"] == _ts(5)
    assert out[2]["r_value"] == 70.0
    assert out[3]["r_value"] is None and out[3]["r_ts"] is None
    assert out[4]["r_value"] == 200.0
    assert set(out) == {1, 2, 3, 4}  # left-join: every left row survives


def test_sessionize_gap_boundary_is_inclusive(spark):
    events = spark.createDataFrame(
        [
            ("u1", _ts(0)),
            ("u1", _ts(29)),           # 29 min gap → same session
            ("u1", _ts(59)),           # exactly 30 min gap → still merged
            ("u1", _ts(59, second=1)),  # 30:01 after a NEW baseline? no —
            # 1 s after previous → same session
            ("u2", _ts(0)),
        ],
        "user_id string, ts timestamp",
    )
    out = sessionize(events, gap="30 minutes").orderBy(
        "user_id", "session_start"
    ).collect()
    u1 = [r for r in out if r["user_id"] == "u1"]
    assert [r["n_events"] for r in u1] == [4]
    assert u1[0]["session_start"] == _ts(0)
    assert u1[0]["session_end"] == _ts(59, second=1)

    # a gap strictly over 30 min DOES split
    events2 = events.union(
        events.sparkSession.createDataFrame(
            [("u1", _ts(59, second=1) + dt.timedelta(minutes=30, seconds=1))],
            "user_id string, ts timestamp",
        )
    )
    out2 = sessionize(events2, gap="30 minutes").filter(
        "user_id = 'u1'"
    ).orderBy("session_start").collect()
    assert [r["n_events"] for r in out2] == [4, 1]
    assert len([r for r in out if r["user_id"] == "u2"]) == 1
