"""PySpark-native analytics engine with the capabilities of
``simon2432/airflow-crypto-btc`` (reference at /root/reference, read-only).

The reference is an Airflow DAG (``dags/dag_btc_daily.py``) that ingests hourly
BTC candles, folds them into daily OHLC metrics, enriches with rolling-window
indicators, renders a report, and runs data-quality checks.  This package
re-expresses every one of those operators — plus the large-scale
training-data-pipeline extensions (dedup, similarity search, text analysis,
multimodal columns) — as idiomatic Spark DataFrame plans designed for a
multi-executor cluster at ~100 TB scale:

- declarative plans (Catalyst does pushdown/pruning/codegen),
- order-deterministic aggregation (``min_by``/``max_by``, never ``first``),
- windows partitioned by entity key so parallelism = #entities,
- merge writers (anti-join append, keyed upsert) instead of unique indexes,
- broadcast hints for dimension joins, AQE on for runtime re-planning.
"""

from airflow_crypto_btc_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
