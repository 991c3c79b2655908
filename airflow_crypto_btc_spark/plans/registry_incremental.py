"""Incremental-maintenance query entries (operators/incremental.py).

``rollup_incremental_ohlc`` proves the partial-aggregate merge algebra
against a full-recompute oracle: the events table is split into a
"history" half and a "delta" half, each is reduced to mergeable OHLC
state, the states are merged, and the served rollup must equal a single
aggregation over all rows — i.e. ``merge(state(x), state(y)) ==
state(x ∪ y)``, the property that makes O(|delta|) maintenance sound.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_crypto_btc_spark.operators.incremental import (
    merge_ohlc_states,
    ohlc_state,
    state_to_ohlc,
)
from airflow_crypto_btc_spark.plans.registry import QuerySpec, _SQL_DAILY
from airflow_crypto_btc_spark.sources.tables import load_table


def q_rollup_incremental_ohlc(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    # any deterministic row partition works; mid-month split exercises
    # groups whose open and close land in different batches
    hist = ev.filter(F.dayofmonth("ts") <= 15)
    delta = ev.filter(F.dayofmonth("ts") > 15)
    state = merge_ohlc_states(ohlc_state(hist), ohlc_state(delta))
    return state_to_ohlc(state)


INCREMENTAL_REGISTRY: dict[str, QuerySpec] = {
    # oracle is the FULL recompute — passing means the incremental merge
    # reproduces it exactly
    "rollup_incremental_ohlc": QuerySpec(
        q_rollup_incremental_ohlc, _SQL_DAILY
    ),
}
