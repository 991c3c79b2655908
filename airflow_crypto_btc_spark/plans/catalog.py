"""Combined query catalog: core reference operators + scale extensions."""

from __future__ import annotations

from airflow_crypto_btc_spark.plans.registry import REGISTRY, QuerySpec
from airflow_crypto_btc_spark.plans.registry_analytics import (
    ANALYTICS_REGISTRY,
)
from airflow_crypto_btc_spark.plans.registry_curation import CURATION_REGISTRY
from airflow_crypto_btc_spark.plans.registry_ext import EXT_REGISTRY
from airflow_crypto_btc_spark.plans.registry_ext2 import EXT2_REGISTRY
from airflow_crypto_btc_spark.plans.registry_incremental import (
    INCREMENTAL_REGISTRY,
)
from airflow_crypto_btc_spark.plans.registry_ml import ML_REGISTRY
from airflow_crypto_btc_spark.plans.registry_more import MORE_REGISTRY
from airflow_crypto_btc_spark.plans.registry_probe import PROBE_REGISTRY
from airflow_crypto_btc_spark.plans.registry_sql import SQL_REGISTRY
from airflow_crypto_btc_spark.plans.registry_stream import STREAM_REGISTRY
from airflow_crypto_btc_spark.plans.registry_ta import TA_REGISTRY
from airflow_crypto_btc_spark.plans.registry_tpch2 import TPCH2_REGISTRY
from airflow_crypto_btc_spark.plans.registry_tpch3 import TPCH3_REGISTRY

_MERGED: dict[str, QuerySpec] = {
    **REGISTRY,
    **EXT_REGISTRY,
    **EXT2_REGISTRY,
    **MORE_REGISTRY,
    **ML_REGISTRY,
    **TPCH2_REGISTRY,
    **TPCH3_REGISTRY,
    **CURATION_REGISTRY,
    **STREAM_REGISTRY,
    **TA_REGISTRY,
    **ANALYTICS_REGISTRY,
    **SQL_REGISTRY,
    # appended last: keeps the driver's first-50 correctness window stable
    **INCREMENTAL_REGISTRY,
    **PROBE_REGISTRY,
}

# Oracle-backed entries first, rows-only (sql=None) sketches last: the
# driver's hard correctness gate checks the FIRST 50 entries, and a slot
# spent on an entry it can only mark `no_oracle` is a wasted slot — every
# windowed entry should be value-checkable.  Relative order is preserved
# within each group, so the window stays stable round-to-round.
ALL_QUERIES: dict[str, QuerySpec] = {
    k: v for k, v in _MERGED.items() if v.sql is not None
}
ALL_QUERIES.update({k: v for k, v in _MERGED.items() if v.sql is None})
