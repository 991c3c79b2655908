"""Physical-plan regression tests: the scale properties the engine claims
(pushdown, pruning, broadcast joins, shared window exchanges) are asserted
on the actual Catalyst output, so a refactor that silently de-optimizes a
plan fails here — not at 100 TB.
"""

from __future__ import annotations

import pytest

from airflow_crypto_btc_spark.plans.catalog import ALL_QUERIES
from airflow_crypto_btc_spark.sources.tables import load_table


def _plan(
    spark, sf_dir, name: str, mode: str = "formatted", execute: bool = False
) -> str:
    df = ALL_QUERIES[name].fn(spark, sf_dir)
    if execute:
        # AQE finalizes (and annotates codegen stages on) the plan only
        # after execution
        df.write.format("noop").mode("overwrite").save()
        df.collect()
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        mode
    )
    return df._jdf.queryExecution().explainString(jmode)


def test_q6_pushes_all_predicates_and_prunes_columns(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q6_forecast_revenue")
    pushed = next(
        line for line in plan.splitlines() if "PushedFilters" in line
    )
    for frag in (
        "GreaterThanOrEqual(l_shipdate",
        "LessThan(l_shipdate",
        "GreaterThanOrEqual(l_discount,0.05)",
        "LessThanOrEqual(l_discount,0.07)",
        "LessThan(l_quantity,24.0)",
    ):
        assert frag in pushed, f"{frag} not pushed to the scan"
    read = next(line for line in plan.splitlines() if "ReadSchema" in line)
    # projection pruned to exactly the 4 referenced columns
    for col in ("l_quantity", "l_extendedprice", "l_discount", "l_shipdate"):
        assert col in read
    assert "l_orderkey" not in read and "l_comment" not in read


def test_q5_broadcasts_every_dimension(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q5_nation_revenue", "simple")
    assert plan.count("BroadcastHashJoin") == 5
    assert "SortMergeJoin" not in plan  # fact table is never shuffled


def test_flagship_shares_one_window_exchange(spark, sf_dir):
    """All four indicators share one window family: Spark plans two Window
    operators (offset frame for lag, rolling frames for ma/vol) but they
    share ONE sort and the whole plan has exactly two exchanges (groupBy +
    window) — not one per indicator."""
    plan = _plan(spark, sf_dir, "flagship_daily_indicators", "simple")
    assert plan.count("Window") <= 2
    assert plan.count("Sort") == 1
    # two exchanges total: one for the OHLC groupBy, one for the window
    assert plan.count("Exchange") <= 2


def test_ohlc_uses_partial_aggregation_no_sort(spark, sf_dir):
    plan = _plan(spark, sf_dir, "agg_ohlc_daily", "simple")
    assert "HashAggregate" in plan
    assert "Sort" not in plan  # min_by/max_by, not sort+first/last
    assert plan.count("Exchange") == 1


def test_topk_query_broadcasts_the_bounded_query_side(spark, sf_dir):
    plan = _plan(spark, sf_dir, "sim_cosine_topk", "simple")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


@pytest.mark.parametrize(
    "name",
    ["q1_pricing_summary", "q3_shipping_priority", "q6_forecast_revenue"],
)
def test_tpch_shaped_queries_stay_in_codegen(spark, sf_dir, name):
    plan = _plan(spark, sf_dir, name, execute=True)
    assert "codegen id" in plan  # whole-stage codegen spans in final plan
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python UDFs

def test_q7_q10_broadcast_dims_fact_join_only_shuffle(spark, sf_dir):
    """The third TPC-H wave keeps the join discipline: every dimension
    broadcasts; only the lineitem⋈orders fact join may shuffle."""
    for name, n_bcast in (("q7_nation_pair_volume", 4),
                          ("q10_returned_items", 2)):
        plan = _plan(spark, sf_dir, name, "simple")
        assert plan.count("BroadcastHashJoin") >= n_bcast, name
        assert plan.count("SortMergeJoin") <= 1, name


def test_q13_outer_join_preserves_zero_order_customers(spark, sf_dir):
    """The c_count=0 bucket must exist (anti-regression for the classic
    inner-join mistake) whenever some customer has only URGENT orders."""
    from airflow_crypto_btc_spark.plans.registry_tpch2 import (
        q13_order_count_distribution,
    )

    pdf = q13_order_count_distribution(spark, sf_dir).toPandas()
    total = pdf["custdist"].sum()
    n_cust = load_table(spark, sf_dir, "customer").count()
    assert total == n_cust  # every customer lands in exactly one bucket


def test_q17_threshold_join_broadcasts_the_aggregate(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q17_small_quantity_revenue", "simple")
    assert "BroadcastHashJoin" in plan


def test_q8_market_share_broadcasts_all_six_dims(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q8_market_share", "simple")
    assert plan.count("BroadcastHashJoin") >= 5
    assert plan.count("SortMergeJoin") <= 1  # only lineitem⋈orders shuffles


def test_q21_self_joins_are_semi_and_anti(spark, sf_dir):
    """EXISTS/NOT EXISTS must compile to semi/anti joins — never an inner
    join + dedup, which would duplicate l1 rows per matching sibling."""
    plan = _plan(spark, sf_dir, "q21_waiting_suppliers", "simple")
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan


def test_q11_scalar_threshold_stays_broadcast(spark, sf_dir):
    """Q11's HAVING threshold is a one-row statistics aggregate — it must
    reach the per-part side as a broadcast (nested-loop or hash), never as
    a shuffled join on a degenerate key."""
    plan = _plan(spark, sf_dir, "q11_important_stock", "simple")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert plan.count("SortMergeJoin") == 0


def test_q16_exclusion_is_anti_join_distinct_agg_two_phase(spark, sf_dir):
    """NOT IN compiles to a broadcast anti-join, and the distinct count
    runs as partial-distinct + final (two Exchange max), not a raw
    collect-and-count."""
    plan = _plan(spark, sf_dir, "q16_supplier_part_counts", "simple")
    assert "BroadcastHashJoin" in plan  # anti + dim joins broadcast
    assert plan.count("SortMergeJoin") == 0
    assert plan.count("Exchange hashpartitioning") <= 2


def test_q20_group_and_window_share_one_shuffle(spark, sf_dir):
    """The explicit part-key repartition must serve both the
    (part, supplier) grouping and the per-part window — exactly one more
    hash exchange (the small supplier-distinct) is allowed."""
    plan = _plan(spark, sf_dir, "q20_dominant_suppliers", "simple")
    assert plan.count("Exchange hashpartitioning") <= 2
    assert plan.count("SortMergeJoin") == 0


def test_approx_percentiles_land_inside_exact_iqr_neighborhood(
    spark, sf_dir
):
    """The t-digest twin must produce quantiles within half an IQR of the
    exact interpolated values, per segment — the accuracy contract that
    justifies swapping it in at 100 TB."""
    from airflow_crypto_btc_spark.plans.registry_more import (
        q_percentile_approx_summary,
        q_percentile_summary,
    )

    exact = {
        r.c_mktsegment: r
        for r in q_percentile_summary(spark, sf_dir).collect()
    }
    approx = {
        r.c_mktsegment: r
        for r in q_percentile_approx_summary(spark, sf_dir).collect()
    }
    assert exact.keys() == approx.keys()
    for seg, e in exact.items():
        # the entry hashes the per-quantile rank-bracket booleans
        # (approx inside exact quantiles at p ± 0.01) — a tighter pin
        # than the old half-IQR neighborhood check
        assert approx[seg].q25_in_bounds is True, seg
        assert approx[seg].q50_in_bounds is True, seg
        assert approx[seg].q75_in_bounds is True, seg
        assert approx[seg].n_orders == e.n_orders
