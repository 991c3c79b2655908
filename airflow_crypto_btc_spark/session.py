"""SparkSession factory.

Small but load-bearing (SURVEY.md §7 step 1): the reference pipeline is
explicitly UTC everywhere (``/root/reference/dags/dag_btc_daily.py:83-86``
builds ``%Y-%m-%dT%H:%M:%SZ`` strings; ``:336-340`` re-localizes to UTC), so
the session timezone is pinned to UTC — otherwise epoch→date conversions
silently shift across machines.

Scale defaults:
- AQE on (adaptive shuffle coalescing, runtime broadcast-join selection,
  skew-join splitting) — at 100 TB the static plan is always wrong somewhere.
- Arrow on for the pandas boundary (report sink, Pandas UDFs).
- ``spark.sql.shuffle.partitions`` sized from the environment; on a real
  cluster this should be ~2-3× total cores and is the first knob to retune.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "airflow-crypto-btc-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession with engine defaults."""
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS")
            or os.environ.get("SPARK_GRAFT_CPUS", "32")
        )

    # local[32] in Spark's DEFAULT 1g heap is a misconfiguration on this
    # 128 GiB box: 32 executor threads share one driver JVM, and the
    # round-10 sf1 decade probe OOM'd a shuffle stage while the machine
    # sat 123 GiB free (GC-locker thrash well before that).  Sized so a
    # per-thread sort/hash working set is ~300 MB — still a tiny
    # fraction of the box; on a real cluster executor memory is its own
    # knob and this setting is inert.  Only effective when the JVM
    # starts with this session (true for bench/tools/tests — each
    # process builds its own); a pre-existing JVM keeps its heap.
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "12g")

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.driver.memory", driver_mem)
        # UTC discipline — SURVEY.md §4.2 item 6.
        .config("spark.sql.session.timeZone", "UTC")
        # Adaptive execution: coalesce shuffle partitions, pick broadcast
        # joins at runtime, split skewed partitions.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow for toPandas()/Pandas-UDF transfer (report sink, extensions).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Parquet TIMESTAMP(NANOS) (the events fixture) has no Spark type;
        # read as epoch-nanos long, converted to µs timestamps in
        # sources.tables.load_table (matches DuckDB's ns→µs truncation).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Quieter local runs; harmless on a cluster.
        .config("spark.ui.showConsoleProgress", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
