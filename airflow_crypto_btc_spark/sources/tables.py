"""Parquet table sources for the driver fixtures (TESTDATA.md).

Plays the role of the reference's SQLite reads (`src_sql_table`,
``/root/reference/dags/dag_btc_daily.py:181-190, :254-258, :321-328``): a
projection/filter over a stored table.  In Spark the projection and filter are
expressed on the lazy DataFrame and Catalyst pushes them into the parquet
scan (PushedFilters / ReadSchema), so callers should NOT pre-materialize —
just ``load_table(...)`` and compose.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def sf_dir_from_env(default: str = "/root/testdata/sf0.001") -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", default)


# Columns stored as parquet TIMESTAMP(NANOS): Spark has no ns timestamp type
# and (with spark.sql.legacy.parquet.nanosAsLong) surfaces them as epoch-nanos
# longs.  We truncate to µs — integer division, NOT double division, which
# would lose precision at 1e18 magnitudes — matching DuckDB's ns→µs handling.
_NANOS_TS_COLS = {"events": ("ts",)}


def _ensure_session_confs(spark: SparkSession) -> None:
    """Pin the SQL confs the engine's semantics depend on, even when the
    caller built the SparkSession themselves (the verify driver does).  Both
    are runtime-settable SQL confs."""
    # ns-timestamp parquet (events fixture) is unreadable without this.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # UTC discipline (SURVEY §4.2 item 6): epoch→date conversions must not
    # shift with the host timezone.
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy parquet scan of one fixture table, timestamps normalized to
    TIMESTAMP_NTZ (value-preserving under the UTC session timezone) so Spark
    results schema-align with the DuckDB oracle's naive timestamps."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampType

    _ensure_session_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for c in _NANOS_TS_COLS.get(name, ()):
        if isinstance(df.schema[c].dataType, LongType):
            df = df.withColumn(
                c,
                F.timestamp_micros(F.expr(f"{c} div 1000")).cast(
                    "timestamp_ntz"
                ),
            )
    for field in df.schema.fields:
        if isinstance(field.dataType, TimestampType):
            df = df.withColumn(
                field.name, F.col(field.name).cast("timestamp_ntz")
            )
    return df


def parquet_row_count(path: str) -> int:
    """EXACT row count of a parquet file or directory from footer
    metadata — zero Spark jobs, driver-side only, O(#files) footer
    reads.  This is how table statistics replace a full corpus
    ``count()`` pre-pass (e.g. sizing the PQ training-sample modulus):
    parquet footers record exact ``num_rows``, so the value equals what
    a scan would count.

    Valid for plain parquet datasets (the driver fixtures).  For a
    snapshot table, sum the COMMIT LOG's live files instead — the table
    dir may hold dead parts awaiting vacuum that a blind glob would
    double-count."""
    import glob

    import pyarrow.parquet as pq

    if os.path.isdir(path):
        files = sorted(
            glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        )
    else:
        files = [path]
    return sum(pq.read_metadata(f).num_rows for f in files)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for the spark.sql path
    (the reference mixes imperative pandas and declarative SQL — SURVEY §3
    entry point 2; the engine exposes both)."""
    for t in TABLE_NAMES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
