"""Event-analytics wave invariants (plans/registry_analytics.py)."""

from __future__ import annotations

import pandas as pd

from airflow_crypto_btc_spark.plans.registry_analytics import (
    q_cohort_retention,
    q_funnel_stages,
    q_histogram_equidepth,
    q_histogram_equiwidth,
    q_scd2_intervals,
)
from airflow_crypto_btc_spark.sources.tables import load_table


def test_funnel_strict_ordering(spark, sf_dir):
    got = q_funnel_stages(spark, sf_dir).toPandas()
    # stage counts are monotone: stage k requires stage k-1
    assert (got["stage"] == got[["t_view", "t_click", "t_purchase"]]
            .notna().sum(axis=1)).all()
    both = got.dropna(subset=["t_view", "t_click"])
    assert (both["t_click"] > both["t_view"]).all()
    full = got.dropna(subset=["t_click", "t_purchase"])
    assert (full["t_purchase"] > full["t_click"]).all()
    # no stage can be populated without the previous one
    assert got[got["t_view"].isna()]["t_click"].isna().all()
    assert got[got["t_click"].isna()]["t_purchase"].isna().all()


def test_cohort_retention_offsets(spark, sf_dir):
    got = q_cohort_retention(spark, sf_dir).toPandas()
    assert (got["week_offset"] >= 0).all()
    # offset-0 cell of a cohort counts every cohort member (first-seen week
    # is by definition an active week)
    ev = load_table(spark, sf_dir, "events").toPandas()
    ev["week"] = pd.to_datetime(ev["ts"]).dt.to_period("W").dt.start_time
    cohort_sizes = ev.groupby("user_id")["week"].min().value_counts()
    zero = got[got["week_offset"] == 0].set_index("cohort_week")["n_active"]
    for wk, n in zero.items():
        assert n == cohort_sizes[pd.Timestamp(wk)]


def test_scd2_intervals_contiguous(spark, sf_dir):
    got = q_scd2_intervals(spark, sf_dir).toPandas()
    for uid, g in got.groupby("user_id"):
        g = g.sort_values("version").reset_index(drop=True)
        assert (g["version"] == range(1, len(g) + 1)).all()
        assert g["is_current"].sum() == 1 and bool(g["is_current"].iloc[-1])
        # intervals chain: valid_to of v == valid_from of v+1
        assert (
            g["valid_to"].iloc[:-1].reset_index(drop=True)
            == g["valid_from"].iloc[1:].reset_index(drop=True)
        ).all()


def test_equidepth_deciles_balanced(spark, sf_dir):
    got = q_histogram_equidepth(spark, sf_dir).toPandas()
    for et, g in got.groupby("event_type"):
        assert set(g["decile"]) == set(range(1, 11))
        assert g["n"].max() - g["n"].min() <= 1  # ntile balance
        g = g.sort_values("decile")
        # bucket ranges are non-overlapping and ordered
        assert (g["lo"].diff().dropna() >= 0).all()
        assert (g["hi"].values[:-1] <= g["lo"].values[1:]).all()


def test_equiwidth_bins_cover_all_rows(spark, sf_dir):
    got = q_histogram_equiwidth(spark, sf_dir).toPandas()
    total = load_table(spark, sf_dir, "events").count()
    assert got["n"].sum() == total
    assert got["bin"].between(0, 19).all()


def test_hll_rollup_accuracy_vs_exact(spark, sf_dir):
    """Merged per-day HLL sketches must estimate per-type distinct users
    within HLL's error envelope (lgK=12 → ~1.6% σ; allow 5%)."""
    from airflow_crypto_btc_spark.plans.registry_ext2 import (
        q_approx_hll_users_rollup,
    )
    from pyspark.sql import functions as F

    got = {
        r["event_type"]: r
        for r in q_approx_hll_users_rollup(spark, sf_dir).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for et, n in exact.items():
        # the entry hashes the envelope boolean; verify it here and
        # that the anchor it compares against is the true exact count
        assert got[et]["n_users_exact"] == n, (et, got[et], n)
        assert got[et]["approx_within_5pct"] is True, (et, got[et], n)
        assert got[et]["n_days_merged"] >= 1


def test_fuzzy_pairs_blocked_join_properties(spark, sf_dir):
    from airflow_crypto_btc_spark.plans.registry_ext2 import (
        q_fuzzy_name_pairs,
    )

    df = q_fuzzy_name_pairs(spark, sf_dir)
    got = df.toPandas()
    assert (got["lev"] <= 1).all()
    assert (got["custkey_a"] < got["custkey_b"]).all()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan  # blocking key = equi-join
