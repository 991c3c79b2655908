"""Registry entries whose engines-side implementation is the *stateful
streaming kernel* run in batch mode.

``indicators_incremental`` executes the exact ``applyInPandasWithState``
fold from ``streaming/indicators_stream.py`` via its batch twin
(``applyInPandas`` from empty state) so the driver's DuckDB oracle checks
the kernel's arithmetic — the streaming variant then shares it function-
for-function (asserted in tests/test_streaming_indicators.py).

vol windows (10, 30): the fixture events table spans 30 days, so vol30
exercises the NULL gate (needs 30 non-null rets = 31 days) while vol10
exercises non-null sample-std values cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airflow_crypto_btc_spark.plans.registry import (
    QuerySpec,
    _SQL_RET,
    _events_daily,
)
from airflow_crypto_btc_spark.streaming.indicators_stream import (
    batch_indicators_incremental,
)


def q_indicators_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    out = batch_indicators_incremental(
        _events_daily(spark, sf_dir),
        key_col="event_type",
        ma_windows=(7, 30),
        vol_windows=(10, 30),
    )
    return out.select(
        "event_type",
        "date",
        "close",
        F.round("ret", 6).alias("ret"),
        F.round("ma7", 6).alias("ma7"),
        F.round("ma30", 6).alias("ma30"),
        F.round("vol10", 6).alias("vol10"),
        F.round("vol30", 6).alias("vol30"),
    )


_SQL_INDICATORS_INCREMENTAL = f"""
    SELECT event_type, date, close,
      round(ret_raw, 6) AS ret,
      round(CASE WHEN count(close) OVER w7 >= 7
                 THEN avg(close) OVER w7 END, 6) AS ma7,
      round(CASE WHEN count(close) OVER w30 >= 30
                 THEN avg(close) OVER w30 END, 6) AS ma30,
      round(CASE WHEN count(ret_raw) OVER w10 >= 10
                 THEN stddev_samp(ret_raw) OVER w10 END, 6) AS vol10,
      round(CASE WHEN count(ret_raw) OVER w30 >= 30
                 THEN stddev_samp(ret_raw) OVER w30 END, 6) AS vol30
    FROM ({_SQL_RET})
    WINDOW
      w7 AS (PARTITION BY event_type ORDER BY date
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW),
      w10 AS (PARTITION BY event_type ORDER BY date
              ROWS BETWEEN 9 PRECEDING AND CURRENT ROW),
      w30 AS (PARTITION BY event_type ORDER BY date
              ROWS BETWEEN 29 PRECEDING AND CURRENT ROW)
"""


def q_join_range_attribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from airflow_crypto_btc_spark.sources.tables import load_table
    from airflow_crypto_btc_spark.streaming.joins import (
        range_join_attribution,
    )

    return range_join_attribution(load_table(spark, sf_dir, "events"))


_SQL_JOIN_RANGE_ATTRIBUTION = """
    SELECT c.user_id,
           c.event_id AS cause_id,   c.ts    AS cause_ts,
           p.event_id AS effect_id,  p.ts    AS effect_ts,
           p.value    AS effect_value
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id
     AND p.ts >= c.ts
     AND p.ts <= c.ts + INTERVAL 1 HOUR
"""


STREAM_REGISTRY: dict[str, QuerySpec] = {
    "indicators_incremental": QuerySpec(
        q_indicators_incremental, _SQL_INDICATORS_INCREMENTAL
    ),
    "join_range_attribution": QuerySpec(
        q_join_range_attribution, _SQL_JOIN_RANGE_ATTRIBUTION
    ),
}
