"""Second-wave query registry: time-series joins (as-of, sessionization)
and the wider star-schema surface (selective filter-agg, per-group top-k
ranking, rollup grouping sets).

Same determinism discipline as the core registry: decimal-cast group sums,
identical aliases on both engines, explicit tie-breaks on every ranking.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from airflow_crypto_btc_spark.operators.asof import asof_join, sessionize
from airflow_crypto_btc_spark.plans.registry import (
    QuerySpec,
    _dec_sum,
    _SQL_DAILY,
)
from airflow_crypto_btc_spark.sources.tables import load_table


# ---------------------------------------------------------------- as-of join


def q_asof_purchase_last_error(spark, sf_dir):
    """Each purchase event joined to the user's most recent error event at
    or before it (asof backward join, per-user)."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", "ts", "value"
    )
    return asof_join(
        purchases,
        errors,
        left_ts="ts",
        right_ts="ts",
        by=("user_id",),
        value_cols=("value",),
    )


_SQL_ASOF_PURCHASE_LAST_ERROR = """
    WITH p AS (SELECT event_id, user_id, ts, value FROM events
               WHERE event_type = 'purchase'),
         e AS (SELECT user_id, ts, value FROM events
               WHERE event_type = 'error')
    SELECT p.event_id, p.user_id, p.ts, p.value,
           e.ts AS r_ts, e.value AS r_value
    FROM p ASOF LEFT JOIN e
      ON p.user_id = e.user_id AND p.ts >= e.ts
"""


# ------------------------------------------------------------- sessionization


def q_session_stats(spark, sf_dir):
    """Per-user sessions with a 30-minute inactivity gap (native
    session_window gap-merge)."""
    ev = load_table(spark, sf_dir, "events")
    out = sessionize(ev, ts_col="ts", key_cols=("user_id",), gap="30 minutes")
    return out.select(
        "user_id",
        "session_start",
        "session_end",
        F.col("n_events").cast("long").alias("n_events"),
        "duration_us",
    )


# Same-session iff gap to previous event is ≤ 30 min — Spark's session
# window merges an event landing exactly at last+gap (verified in
# tests/test_asof.py), so the boundary is inclusive on both engines.
_SQL_SESSION_STATS = """
    WITH flags AS (
      SELECT user_id, ts,
        CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                  <= INTERVAL 30 MINUTE
             THEN 0 ELSE 1 END AS new_s
      FROM events
    ),
    sess AS (
      SELECT user_id, ts,
        sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                         ROWS UNBOUNDED PRECEDING) AS sid
      FROM flags
    )
    SELECT user_id,
      min(ts) AS session_start,
      max(ts) AS session_end,
      count(*) AS n_events,
      epoch_us(max(ts)) - epoch_us(min(ts)) AS duration_us
    FROM sess
    GROUP BY user_id, sid
"""


# ------------------------------------------------------------- star schema


def q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6-shaped: highly selective scan-filter-agg — the pushdown
    showcase (all three predicates reach the parquet reader)."""
    li = load_table(spark, sf_dir, "lineitem")
    out = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1994-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1995-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _dec_sum(
                F.col("l_extendedprice") * F.col("l_discount"), "revenue"
            ),
            F.count("*").alias("n_rows"),
        )
    )
    return out


_SQL_Q6_FORECAST_REVENUE = """
    SELECT
      CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(38,6)))
           AS DOUBLE) AS revenue,
      count(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1994-01-01'
      AND l_shipdate <  TIMESTAMP '1995-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
"""


def q_rank_top_customers_per_nation(spark, sf_dir):
    """Per-group top-k ranking: top 3 customers by order revenue within
    each nation (row_number with deterministic tie-break)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    rev = (
        orders.groupBy("o_custkey")
        .agg(_dec_sum(F.col("o_totalprice"), "revenue"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(nation),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
    )
    w = Window.partitionBy("n_name").orderBy(
        F.desc("revenue"), F.asc("o_custkey")
    )
    return (
        rev.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            "n_name",
            F.col("o_custkey").alias("custkey"),
            "revenue",
            F.col("rnk").cast("long").alias("rnk"),
        )
    )


_SQL_RANK_TOP_CUSTOMERS_PER_NATION = """
    WITH rev AS (
      SELECT o_custkey,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS revenue
      FROM orders GROUP BY o_custkey
    )
    SELECT n_name, o_custkey AS custkey, revenue, rnk FROM (
      SELECT n_name, o_custkey, revenue,
        row_number() OVER (PARTITION BY n_name
                           ORDER BY revenue DESC, o_custkey) AS rnk
      FROM rev
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey)
    WHERE rnk <= 3
"""


def q_rollup_revenue_nation_year(spark, sf_dir):
    """Grouping sets: revenue by (nation, order-year) with ROLLUP subtotals
    and grand total; NULL grouping slots labeled 'ALL' on both engines."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    joined = orders.join(
        F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey")
    ).join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
    out = (
        joined.select(
            F.col("n_name"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            "o_totalprice",
        )
        .rollup("n_name", "o_year")
        .agg(
            _dec_sum(F.col("o_totalprice"), "revenue"),
            F.count("*").alias("n_orders"),
        )
        .select(
            F.coalesce(F.col("n_name"), F.lit("ALL")).alias("nation"),
            F.coalesce(F.col("o_year").cast("string"), F.lit("ALL")).alias(
                "year"
            ),
            "revenue",
            "n_orders",
        )
    )
    return out


def q_cube_event_type_dow(spark, sf_dir):
    """Full CUBE over (event_type, day-of-week) with ``grouping_id`` to
    disambiguate subtotal rows from genuine NULL keys — the grouping-sets
    shape ROLLUP can't express (per-dow totals across all types need the
    (dow)-only grouping set).  Engine note: Spark's ``dayofweek`` is
    1-based Sunday=1, DuckDB's 0-based — the oracle shifts by +1; both
    engines put the leftmost cube column in the grouping id's MSB."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            "event_type",
            F.dayofweek("ts").cast("long").alias("dow"),
            "value",
        )
        .cube("event_type", "dow")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count("*").alias("n_events"),
            _dec_sum(F.col("value"), "total_value"),
        )
    )


_SQL_CUBE_EVENT_TYPE_DOW = """
    SELECT event_type, dow, GROUPING(event_type, dow) AS gid,
      COUNT(*) AS n_events,
      CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
    FROM (
      SELECT event_type, CAST(dayofweek(ts) + 1 AS BIGINT) AS dow, value
      FROM events
    )
    GROUP BY CUBE (event_type, dow)
"""


_SQL_ROLLUP_REVENUE_NATION_YEAR = """
    SELECT
      COALESCE(n_name, 'ALL') AS nation,
      COALESCE(CAST(o_year AS VARCHAR), 'ALL') AS year,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
      count(*) AS n_orders
    FROM (
      SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
             o_totalprice
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
    )
    GROUP BY ROLLUP (n_name, o_year)
"""


# ------------------------------------------------------- scalar fn battery


def q_scalar_functions(spark, sf_dir):
    """F1-F8 exercised in one projection over events: epoch round-trips,
    ISO formatting (lexicographic = chronological), date arithmetic, casts,
    null predicates, and the pct-change kernel — all JVM built-ins inside
    whole-stage codegen (SURVEY §2.8/§2.10)."""
    from airflow_crypto_btc_spark.functions.timeutil import (
        date_str,
        ts_to_iso,
    )

    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        ts_to_iso(F.col("ts")).alias("ts_iso"),  # F2
        date_str(F.to_date("ts")).alias("day_str"),  # F4
        F.unix_millis(F.col("ts").cast("timestamp")).alias("epoch_ms"),  # F1⁻¹
        F.date_sub(F.to_date("ts"), 60).alias("day_minus_60"),  # F6
        F.col("value").cast("string").cast("double").alias("value_rt"),  # F3
        F.col("props").isNull().alias("props_is_null"),  # F7
        F.round(
            F.col("value") / (F.col("value") + F.lit(1.0)) - F.lit(1.0), 6
        ).alias("ratio_m1"),  # F8 kernel shape (nonzero divisor)
    )


def q_scalar_string_battery(spark, sf_dir):
    """String-function surface over unicode documents (the fixtures carry
    CJK/accents, so every slice is CHARACTER-based in both engines):
    length, case, substring, translate, reverse, substring search, and
    levenshtein — the edit-distance primitive fuzzy dedup reaches for.
    All JVM built-ins, one codegen'd projection."""
    docs = load_table(spark, sf_dir, "documents")
    head20 = F.substring("text", 1, 20)
    return docs.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars_rt"),
        F.upper(head20).alias("head_upper"),
        F.translate(
            F.lower(F.substring("text", 1, 40)), "aeiou", "_____"
        ).alias("devoweled"),
        F.reverse(F.substring("text", 1, 10)).alias("head_rev"),
        F.instr("text", "the").cast("long").alias("the_pos"),
        F.levenshtein(head20, F.lit("the quick brown fox"))
        .cast("long")
        .alias("lev_to_pangram"),
    )


_SQL_SCALAR_STRING_BATTERY = """
    SELECT doc_id,
      length(text) AS n_chars_rt,
      upper(substr(text, 1, 20)) AS head_upper,
      translate(lower(substr(text, 1, 40)), 'aeiou', '_____') AS devoweled,
      reverse(substr(text, 1, 10)) AS head_rev,
      strpos(text, 'the') AS the_pos,
      levenshtein(substr(text, 1, 20), 'the quick brown fox')
        AS lev_to_pangram
    FROM documents
"""


def q_unpivot_ohlc_long(spark, sf_dir):
    """Wide→long reshaping (the inverse of pivot): per-day OHLC unpivoted
    to (event_type, date, metric, value) — one stack expression per row,
    no shuffle beyond the OHLC aggregate itself."""
    from airflow_crypto_btc_spark.plans.registry import _events_daily

    return _events_daily(spark, sf_dir).unpivot(
        ["event_type", "date"],
        ["open", "high", "low", "close"],
        "metric",
        "value",
    )


_SQL_UNPIVOT_OHLC_LONG = f"""
    WITH daily AS ({_SQL_DAILY})
    SELECT event_type, date, 'open' AS metric, open AS value FROM daily
    UNION ALL
    SELECT event_type, date, 'high', high FROM daily
    UNION ALL
    SELECT event_type, date, 'low', low FROM daily
    UNION ALL
    SELECT event_type, date, 'close', close FROM daily
"""


_SQL_SCALAR_FUNCTIONS = """
    SELECT event_id,
      strftime(ts, '%Y-%m-%dT%H:%M:%SZ') AS ts_iso,
      strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day_str,
      epoch_ms(ts) AS epoch_ms,
      CAST(ts AS DATE) - INTERVAL 60 DAY AS day_minus_60,
      CAST(CAST(value AS VARCHAR) AS DOUBLE) AS value_rt,
      props IS NULL AS props_is_null,
      round(value / (value + 1.0) - 1.0, 6) AS ratio_m1
    FROM events
"""


# -------------------------------------------------------------- DQ as data


def q_dq_day_completeness(spark, sf_dir):
    """Q2/Q3 rendered as a distributed report: per (event_type, day) row
    count against the ≥20 floor and null-value count — the quality stage as
    one aggregate pass instead of per-day point queries (SURVEY §2.11)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type", F.to_date("ts").alias("date"))
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.col("value").isNull().cast("long")).alias("n_null_value"),
        )
        .withColumn("pass_min_rows", F.col("n_rows") >= 20)
        .withColumn("pass_no_nulls", F.col("n_null_value") == 0)
    )


_SQL_DQ_DAY_COMPLETENESS = """
    SELECT event_type, CAST(ts AS DATE) AS date,
      count(*) AS n_rows,
      CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        AS n_null_value,
      count(*) >= 20 AS pass_min_rows,
      sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) = 0 AS pass_no_nulls
    FROM events
    GROUP BY 1, 2
"""


def q_dq_window_monitor(spark, sf_dir):
    """The streaming DQ monitor's aggregation in batch mode (one builder,
    two execution modes — streaming/dq_monitor.py; stream ≡ batch by
    construction, so THIS oracle also certifies the streaming plan)."""
    from airflow_crypto_btc_spark.streaming.dq_monitor import quality_metrics

    ev = load_table(spark, sf_dir, "events")
    return quality_metrics(
        ev, min_rows=20, value_lo=0.0, value_hi=450.0
    )


_SQL_DQ_WINDOW_MONITOR = """
    SELECT event_type, CAST(ts AS DATE) AS date,
      count(*) AS n_rows,
      CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        AS n_null,
      CAST(sum(CASE WHEN value < 0.0 THEN 1 ELSE 0 END) AS BIGINT)
        AS n_below,
      CAST(sum(CASE WHEN value > 450.0 THEN 1 ELSE 0 END) AS BIGINT)
        AS n_above,
      min(value) AS min_value,
      max(value) AS max_value,
      CASE WHEN count(value) > 0 THEN
        round(CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE)
              / count(value), 6) END AS mean_value,
      count(*) >= 20 AS ok_rows,
      sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) = 0 AS ok_nulls,
      sum(CASE WHEN value < 0.0 OR value > 450.0 THEN 1 ELSE 0 END) = 0
        AS ok_range,
      count(*) >= 20
        AND sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) = 0
        AND sum(CASE WHEN value < 0.0 OR value > 450.0 THEN 1 ELSE 0 END) = 0
        AS passed
    FROM events
    GROUP BY 1, 2
"""


def q_snapshot_table_lifecycle(spark, sf_dir):
    """End-to-end run of the log-structured snapshot format
    (sources/snapshot_table.py): append two days transactionally, re-run
    day 1 (idempotent skip via txn id — the reference's skip-if-done,
    :52-53), then read the committed snapshot and aggregate.  The oracle
    aggregates the raw fixture directly: any double-append, lost commit, or
    phantom read breaks the match."""
    import tempfile

    from airflow_crypto_btc_spark.sources.snapshot_table import (
        append,
        read_snapshot,
    )

    ev = load_table(spark, sf_dir, "events")

    def day(d):
        return ev.filter(F.to_date("ts") == F.lit(d).cast("date"))

    tbl = tempfile.mkdtemp(prefix="snaptbl_")
    append(spark, day("2024-01-01"), tbl, txn_id="day=2024-01-01")
    append(spark, day("2024-01-02"), tbl, txn_id="day=2024-01-02")
    append(spark, day("2024-01-01"), tbl, txn_id="day=2024-01-01")  # no-op
    return (
        read_snapshot(spark, tbl)
        .groupBy("event_type", F.to_date("ts").alias("date"))
        .agg(
            F.count("*").alias("n_rows"),
            _dec_sum(F.col("value"), "sum_value"),
        )
    )


_SQL_SNAPSHOT_TABLE_LIFECYCLE = """
    SELECT event_type, CAST(ts AS DATE) AS date,
      count(*) AS n_rows,
      CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
    FROM events
    WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-01' AND DATE '2024-01-02'
    GROUP BY 1, 2
"""


# -------------------------------------------------- more TPC-H join shapes


def q12_priority_shipping(spark, sf_dir):
    """TPC-H Q12-shaped: fact-fact join + CASE-conditional counts — per
    return flag, how many line items belong to high- vs low-priority
    orders.  The join is lineitem⋈orders on orderkey (the one big-big join
    in the fixture schema; at scale this is the bucketed-join candidate)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(high.cast("long")).alias("high_line_count"),
            F.sum((~high).cast("long")).alias("low_line_count"),
        )
    )


_SQL_Q12_PRIORITY_SHIPPING = """
    SELECT l_returnflag,
      CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
               THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
               THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY l_returnflag
"""


def q14_promo_revenue_share(spark, sf_dir):
    """TPC-H Q14-shaped: conditional-revenue ratio over a dimension join —
    the ECONOMY part type's share of one month's revenue.  Decimal sums on
    both numerator and denominator keep the ratio bit-stable."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1.0 - F.col("l_discount"))
    econ = F.when(F.col("p_type") == "ECONOMY", rev).otherwise(F.lit(0.0))
    out = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-09-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1995-10-01").cast("timestamp_ntz"))
        )
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            _dec_sum(econ, "econ_revenue"),
            _dec_sum(rev, "total_revenue"),
        )
        .select(
            "econ_revenue",
            "total_revenue",
            F.round(
                F.lit(100.0) * F.col("econ_revenue")
                / F.col("total_revenue"),
                6,
            ).alias("econ_share_pct"),
        )
    )
    return out


_SQL_Q14_PROMO_REVENUE_SHARE = """
    WITH agg AS (
      SELECT
        CAST(SUM(CAST(CASE WHEN p_type = 'ECONOMY'
                 THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END
                 AS DECIMAL(38,6))) AS DOUBLE) AS econ_revenue,
        CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
                 AS DECIMAL(38,6))) AS DOUBLE) AS total_revenue
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1995-09-01'
        AND l_shipdate <  TIMESTAMP '1995-10-01'
    )
    SELECT econ_revenue, total_revenue,
           round(100.0 * econ_revenue / total_revenue, 6) AS econ_share_pct
    FROM agg
"""


def q19_disjunctive_predicates(spark, sf_dir):
    """TPC-H Q19-shaped: OR-of-ANDs predicate across a join — the planner
    must push the common l_quantity bounds and evaluate the disjunction
    post-join without falling back to a cartesian shape."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & (F.col("l_quantity") >= 1)
            & (F.col("l_quantity") <= 11)
            & (F.col("p_size") <= 5)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & (F.col("l_quantity") >= 10)
            & (F.col("l_quantity") <= 20)
            & (F.col("p_size") <= 10)
        )
    )
    return joined.filter(cond).agg(
        _dec_sum(
            F.col("l_extendedprice") * (1.0 - F.col("l_discount")), "revenue"
        ),
        F.count("*").alias("n_rows"),
    )


_SQL_Q19_DISJUNCTIVE_PREDICATES = """
    SELECT
      CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6)))
           AS DOUBLE) AS revenue,
      count(*) AS n_rows
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 11
           AND p_size <= 5)
       OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 20
           AND p_size <= 10)
"""


def q15_top_supplier_revenue(spark, sf_dir):
    """TPC-H Q15-shaped: aggregate-of-aggregate — supplier revenue for a
    quarter, keep the max-revenue supplier(s).  The inner agg is reused by
    both the outer max and the final filter (a "view" in TPC-H terms);
    decimal sums make the max/equality comparison exact."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
        )
        .groupBy("l_suppkey")
        .agg(
            _dec_sum(
                F.col("l_extendedprice") * (1.0 - F.col("l_discount")),
                "total_revenue",
            )
        )
    )
    max_rev = rev.agg(F.max("total_revenue").alias("m"))
    return (
        rev.join(F.broadcast(max_rev), rev.total_revenue == max_rev.m)
        .join(F.broadcast(sup), rev.l_suppkey == sup.s_suppkey)
        .select(
            F.col("s_suppkey").alias("suppkey"),
            "s_name",
            "total_revenue",
        )
    )


_SQL_Q15_TOP_SUPPLIER_REVENUE = """
    WITH rev AS (
      SELECT l_suppkey,
        CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
                 AS DECIMAL(38,6))) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey AS suppkey, s_name, total_revenue
    FROM rev JOIN supplier ON l_suppkey = s_suppkey
    WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
"""


def q18_large_volume_customers(spark, sf_dir):
    """TPC-H Q18-shaped: HAVING on an aggregate feeding a semi-join —
    orders whose total quantity exceeds a threshold, with customer
    context."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(_dec_sum(F.col("l_quantity"), "sum_qty"))
        .filter(F.col("sum_qty") > 270)
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            F.col("c_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            "o_totalprice",
            "sum_qty",
        )
    )


_SQL_Q18_LARGE_VOLUME_CUSTOMERS = """
    WITH big AS (
      SELECT l_orderkey,
        CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(38,6))) > 270
    )
    SELECT c_custkey AS custkey, o_orderkey AS orderkey,
           o_totalprice, sum_qty
    FROM orders
    JOIN big ON o_orderkey = l_orderkey
    JOIN customer ON o_custkey = c_custkey
"""


def q_range_window_weekly_activity(spark, sf_dir):
    """True RANGE frame (calendar bound, not row count): per user, daily
    event count + trailing-7-calendar-day sum.  Users have SPARSE activity
    days, so a 7-ROW frame would be wrong — the range frame closes the gap
    the reference's row-frame indicators don't cover (SURVEY W5 note)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.to_date("ts").alias("date")
    ).agg(F.count("*").alias("n"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_date(F.col("date")))
        .rangeBetween(-6, 0)
    )
    return daily.select(
        "user_id",
        "date",
        "n",
        F.sum("n").over(w).cast("long").alias("n_7d"),
    )


_SQL_RANGE_WINDOW_WEEKLY_ACTIVITY = """
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS date, count(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT user_id, date, n,
      CAST(sum(n) OVER (PARTITION BY user_id
                   ORDER BY date_diff('day', DATE '1970-01-01', date)
                   RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
           AS BIGINT) AS n_7d
    FROM daily
"""


# ------------------------------------------------------- semi / anti joins


def q4_order_priority(spark, sf_dir):
    """TPC-H Q4-shaped: EXISTS semi-join — orders in a quarter having at
    least one late lineitem, counted per priority.  left_semi never
    duplicates or widens rows; the probe side is the filtered fact."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    window = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    flagged = li.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        window.join(
            flagged, window.o_orderkey == flagged.l_orderkey, "left_semi"
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


_SQL_Q4_ORDER_PRIORITY = """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
    GROUP BY o_orderpriority
"""


def q_anti_join_customers_without_orders(spark, sf_dir):
    """NOT EXISTS anti-join: customers with no 1995 orders, counted per
    market segment (the left-anti building block the merge writers use,
    surfaced as a query)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.year("o_orderdate") == 1995
    ).select("o_custkey")
    return (
        cust.join(
            orders, cust.c_custkey == orders.o_custkey, "left_anti"
        )
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


_SQL_ANTI_JOIN_CUSTOMERS_WITHOUT_ORDERS = """
    SELECT c_mktsegment, count(*) AS n_customers
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND year(o_orderdate) = 1995)
    GROUP BY c_mktsegment
"""


# --------------------------------------------------------- semi-structured


def q_json_props_stats(spark, sf_dir):
    """Semi-structured column path: parse the ``props`` JSON string,
    extract ``$.k``, aggregate per event type.  ``get_json_object`` is a
    JVM-side expression — at 100 TB prefer parsing once into a typed
    column at ingest, but the ad-hoc path must not fall back to Python."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


_SQL_JSON_PROPS_STATS = """
    SELECT event_type,
      count(k) AS n,
      CAST(sum(k) AS BIGINT) AS sum_k,
      min(k) AS min_k,
      max(k) AS max_k
    FROM (
      SELECT event_type, CAST(json_extract(props, '$.k') AS BIGINT) AS k
      FROM events
    )
    GROUP BY event_type
"""


# ------------------------------------------------------------ percentiles


def q_percentile_summary(spark, sf_dir):
    """Exact interpolated percentiles (median/IQR) of order totals per
    segment: Spark ``percentile`` and DuckDB ``quantile_cont`` share the
    linear-interpolation definition, so results round-match.  At 100 TB
    swap in ``percentile_approx`` (t-digest) — same query shape, bounded
    memory."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    joined = orders.join(
        F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey")
    )
    return joined.groupBy("c_mktsegment").agg(
        F.round(F.expr("percentile(o_totalprice, 0.25)"), 6).alias("p25"),
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 6).alias("median"),
        F.round(F.expr("percentile(o_totalprice, 0.75)"), 6).alias("p75"),
        F.count("*").alias("n_orders"),
    )


def q_percentile_approx_summary(spark, sf_dir):
    """The 100 TB path of `percentile_summary`: `approx_percentile`
    (bounded-memory sketch, mergeable across partitions — no global
    sort) over the same grouping.  ORACLE-BACKED via the bounds
    technique (round 13): the sketch's raw outputs are engine-specific,
    so the hashable contract is its RANK-ERROR envelope — accuracy
    10000 guarantees rank error ≤ 1/10000, and the entry emits one
    boolean per quantile asserting the approx value sits between the
    exact interpolated quantiles at p ± 0.01 (100× slack, still ~30
    rows wide at sf0.01).  A sketch regression walks a quantile out of
    its bracket, flips the boolean, and fails the driver's value hash;
    tests/test_plans.py additionally bounds the raw values in the exact
    IQR neighborhood."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    joined = orders.join(
        F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey")
    )
    agg = joined.groupBy("c_mktsegment").agg(
        F.expr(
            "approx_percentile(o_totalprice, array(0.25, 0.5, 0.75), 10000)"
        ).alias("aq"),
        F.expr(
            "percentile(o_totalprice,"
            " array(0.24, 0.26, 0.49, 0.51, 0.74, 0.76))"
        ).alias("eq"),
        F.count("*").cast("long").alias("n_orders"),
    )

    def _in(i: int, lo: int, hi: int):
        a = F.col("aq").getItem(i)
        return (
            (a >= F.col("eq").getItem(lo))
            & (a <= F.col("eq").getItem(hi))
        )

    return agg.select(
        "c_mktsegment",
        "n_orders",
        _in(0, 0, 1).alias("q25_in_bounds"),
        _in(1, 2, 3).alias("q50_in_bounds"),
        _in(2, 4, 5).alias("q75_in_bounds"),
    )


_SQL_PERCENTILE_APPROX_SUMMARY = """
    SELECT c_mktsegment,
      CAST(count(*) AS BIGINT) AS n_orders,
      TRUE AS q25_in_bounds,
      TRUE AS q50_in_bounds,
      TRUE AS q75_in_bounds
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
"""


_SQL_PERCENTILE_SUMMARY = """
    SELECT c_mktsegment,
      round(quantile_cont(o_totalprice, 0.25), 6) AS p25,
      round(quantile_cont(o_totalprice, 0.5), 6) AS median,
      round(quantile_cont(o_totalprice, 0.75), 6) AS p75,
      count(*) AS n_orders
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
"""


# ------------------------------------------------------------------- pivot


def q_pivot_daily_event_counts(spark, sf_dir):
    """Pivot (crosstab): events per day × type as columns.  Spark's pivot
    plans as a single aggregate with one output column per pivot value —
    values are enumerated explicitly so the plan is static (at scale,
    always pass the value list; inferring it costs an extra job)."""
    ev = load_table(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    out = (
        ev.groupBy(F.to_date("ts").alias("date"))
        .pivot("event_type", types)
        .count()
    )
    # pivot leaves missing cells null; normalize to 0 for both engines
    return out.select(
        "date", *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in types]
    )


_SQL_PIVOT_DAILY_EVENT_COUNTS = """
    SELECT CAST(ts AS DATE) AS date,
      CAST(sum(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END)
           AS BIGINT) AS click,
      CAST(sum(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END)
           AS BIGINT) AS error,
      CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           AS BIGINT) AS purchase,
      CAST(sum(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END)
           AS BIGINT) AS signup,
      CAST(sum(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END)
           AS BIGINT) AS view
    FROM events
    GROUP BY 1
"""


# ----------------------------------------------------- statistical aggregates


def q_stats_moments(spark, sf_dir):
    """Co-moment aggregate surface: Pearson correlation, sample covariance
    / stddev / variance per group — single-pass streaming moments that
    combine associatively across partitions (Catalyst's ImperativeAggregate
    path), rounded at 1e-6 where engines' merge orders differ."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
            "corr_qty_price"
        ),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 6).alias(
            "covar_qty_price"
        ),
        F.round(F.stddev_samp("l_quantity"), 6).alias("std_qty"),
        F.round(F.var_samp("l_discount"), 6).alias("var_discount"),
        F.count("*").alias("n"),
    )


_SQL_STATS_MOMENTS = """
    SELECT l_returnflag,
      round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
      round(covar_samp(l_quantity, l_extendedprice), 6) AS covar_qty_price,
      round(stddev_samp(l_quantity), 6) AS std_qty,
      round(var_samp(l_discount), 6) AS var_discount,
      count(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
"""


# --------------------------------------------------- ranking-function battery


def q_window_rank_battery(spark, sf_dir):
    """rank / dense_rank / ntile / lead in one window pass (SURVEY §2.5
    notes the reference uses none of these; the engine ships the full
    ranking surface).  Total order inside each partition (value desc,
    event_id asc) makes every output deterministic."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.desc("value"), F.asc("event_id")
    )
    return ev.select(
        "event_id",
        "event_type",
        "value",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.lead("value", 1).over(w).alias("next_value"),
    )


_SQL_WINDOW_RANK_BATTERY = """
    SELECT event_id, event_type, value,
      rank()       OVER w AS rnk,
      dense_rank() OVER w AS drnk,
      ntile(4)     OVER w AS quartile,
      lead(value)  OVER w AS next_value
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY value DESC, event_id)
"""


# ------------------------------------------------------------------- set ops


def q_setops_customer_cohorts(spark, sf_dir):
    """INTERSECT / EXCEPT over yearly customer cohorts: who ordered in both
    1994 and 1995, only 1994, only 1995."""
    orders = load_table(spark, sf_dir, "orders")

    def cohort(year):
        return (
            orders.filter(F.year("o_orderdate") == year)
            .select("o_custkey")
            .distinct()
        )

    a, b = cohort(1994), cohort(1995)
    return (
        a.intersect(b).withColumn("cohort", F.lit("both"))
        .unionByName(a.exceptAll(b).withColumn("cohort", F.lit("only_1994")))
        .unionByName(b.exceptAll(a).withColumn("cohort", F.lit("only_1995")))
    )


_SQL_SETOPS_CUSTOMER_COHORTS = """
    WITH a AS (SELECT DISTINCT o_custkey FROM orders
               WHERE year(o_orderdate) = 1994),
         b AS (SELECT DISTINCT o_custkey FROM orders
               WHERE year(o_orderdate) = 1995)
    SELECT o_custkey, 'both' AS cohort FROM (TABLE a INTERSECT TABLE b)
    UNION ALL
    SELECT o_custkey, 'only_1994' FROM (TABLE a EXCEPT TABLE b)
    UNION ALL
    SELECT o_custkey, 'only_1995' FROM (TABLE b EXCEPT TABLE a)
"""


# ----------------------------------------------------- embedding aggregation


def q_emb_label_centroids(spark, sf_dir):
    """Per-label centroid components in long form: posexplode the embedding
    array, aggregate (label, dim position) with decimal sums.  The
    distributed shape of k-means' M-step — shuffle carries (label, pos)
    partial sums, never whole vectors."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select(
            "label", F.posexplode("embedding").alias("pos", "x")
        )
        .groupBy("label", F.col("pos").cast("long").alias("pos"))
        .agg(
            F.round(
                F.sum(
                    F.col("x").cast("double").cast("decimal(38,12)")
                ).cast("double")
                / F.count("*"),
                6,
            ).alias("c"),
            F.count("*").alias("n"),
        )
    )


_SQL_EMB_LABEL_CENTROIDS = """
    SELECT label, u.pos AS pos,
      round(CAST(sum(CAST(CAST(u.x AS DOUBLE) AS DECIMAL(38,12)))
                 AS DOUBLE) / count(*), 6) AS c,
      count(*) AS n
    FROM (
      SELECT label,
        unnest(list_transform(range(1, len(embedding)+1),
          i -> {'pos': i-1, 'x': embedding[i]})) AS u
      FROM embeddings
    )
    GROUP BY 1, 2
"""


# ------------------------------------------------------- top tokens per source


def q_text_top_tokens(spark, sf_dir):
    """Top-5 tokens per source by frequency (explode → count → ranked
    window): the corpus-statistics shape — token partial counts combine
    map-side, the window sees only (source, token, count)."""
    from airflow_crypto_btc_spark.functions.hashing import tokens_expr

    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select("source", F.explode(tokens_expr("text")).alias("token"))
        .groupBy("source", "token")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("source").orderBy(
        F.desc("n"), F.asc("token")
    )
    return (
        counts.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 5)
    )


_SQL_TEXT_TOP_TOKENS = """
    WITH counts AS (
      SELECT source, u.t AS token, count(*) AS n
      FROM (
        SELECT source,
          unnest(list_transform(
            list_filter(regexp_split_to_array(text, '[ \\t\\n\\x0b\\f\\r]+'), t -> t <> ''),
            t -> {'t': t})) AS u
        FROM documents
      )
      GROUP BY 1, 2
    )
    SELECT source, token, n, rnk FROM (
      SELECT *, row_number() OVER (
        PARTITION BY source ORDER BY n DESC, token) AS rnk
      FROM counts)
    WHERE rnk <= 5
"""


def _landing_zone(sf_dir: str, table: str, fmt: str, land) -> str:
    """Cache a landed copy of a fixture table at most once per fixture
    VERSION: the path is keyed by the source parquet's (size, mtime)
    fingerprint — a regenerated fixture gets a fresh key, so a cached
    copy can never silently serve stale data while the oracle reads the
    new parquet.  ``land(staging_path)`` writes into a private staging
    dir which is atomically renamed into place; under a concurrent race
    the first rename wins and losers discard their staging, so readers
    only ever see a complete landing."""
    import os
    import shutil
    import uuid

    import glob

    src = os.path.join(sf_dir, f"{table}.parquet")
    stat = os.stat(src)
    sf_tag = os.path.basename(os.path.normpath(sf_dir))
    fp = f"{stat.st_size}_{stat.st_mtime_ns}"
    prefix = f"/tmp/spark_graft_{fmt}_{sf_tag}_"
    final = f"{prefix}{fp}"
    if os.path.isdir(final):
        # refresh mtime on EVERY resolve: the stale-cleanup grace window
        # below keys off mtime, so an actively-used landing must look
        # recent even if it was created days ago — otherwise a session
        # that just resolved it could have it deleted mid-read by a
        # concurrent session landing a regenerated fixture
        try:
            os.utime(final, None)
            return final
        except OSError:
            pass  # dir vanished under a racing cleanup — re-land below
    staging = f"{final}.staging-{uuid.uuid4().hex}"
    try:
        land(staging)
        os.rename(staging, final)
    except OSError:
        # only a concurrent winner is benign; anything else (ENOSPC,
        # EACCES, final is a plain file, ...) must surface at the cause
        if not os.path.isdir(final):
            raise
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    # bound /tmp to ONE copy per (format, sf): superseded fingerprints
    # (regenerated fixtures) are removed once the fresh copy is in place
    # — but only past a grace window: a concurrent session may still be
    # mid-read on a landing it resolved moments ago (e.g. a long oracle
    # run against a just-regenerated fixture), and yanking files under
    # an active reader fails its queries for no correctness gain.
    # Tunable for long runs via SPARK_GRAFT_LANDING_GRACE_S.
    import time

    grace_s = float(
        os.environ.get("SPARK_GRAFT_LANDING_GRACE_S", "3600")
    )
    now = time.time()
    for stale in glob.glob(f"{prefix}*"):
        if stale == final or ".staging-" in stale:
            continue
        if ".trash-" in stale:
            # orphan from a crash between rename and rmtree: already
            # unreachable by name resolution, safe to finish deleting
            shutil.rmtree(stale, ignore_errors=True)
            continue
        try:
            recent = now - os.stat(stale).st_mtime < grace_s
        except OSError:
            continue  # already gone (concurrent cleanup won)
        if not recent:
            # rename-then-rmtree: the delete is atomic from a reader's
            # view — a concurrent session that just RESOLVED the stale
            # path either still opens it whole (rename lost the race,
            # we retry next time) or fails fast at open with a clean
            # missing-path error, never mid-read on a half-deleted tree
            trash = f"{stale}.trash-{uuid.uuid4().hex}"
            try:
                os.rename(stale, trash)
            except OSError:
                continue  # a concurrent cleanup/reader won the rename
            shutil.rmtree(trash, ignore_errors=True)
    return final


def q_src_day_csv_pruned(spark, sf_dir):
    """S1/S3/S4 as a first-class Spark source: land events as the
    reference's one-CSV-per-day layout through the connector's own
    two-phase-commit WRITER (executor-side, one task per day after the
    repartition — no driver materialization of the table), read back
    through the custom ``day_csv`` Python DataSource, and prune days via
    pushed filters — only the 5 matching files are opened
    (tests/test_day_csv_source.py asserts the pruning; this entry
    oracle-checks the values)."""
    from airflow_crypto_btc_spark.sources import day_csv_source as dcs

    dcs.register(spark)

    def _land(staging: str) -> None:
        (
            load_table(spark, sf_dir, "events")
            .select(
                F.date_format("ts", "yyyy-MM-dd").alias("day"),
                F.col("ts").alias("ts_utc"),
                F.col("value").alias("price"),
            )
            .repartition("day")  # writer contract: one task per day file
            .write.format("day_csv")
            .option("path", staging)
            .mode("overwrite")
            .save()
        )

    path = _landing_zone(sf_dir, "events", "day_csv", _land)
    return (
        spark.read.format("day_csv")
        .option("path", path)
        .load()
        .filter((F.col("day") >= "2024-01-05") & (F.col("day") < "2024-01-10"))
    )


_SQL_SRC_DAY_CSV_PRUNED = """
    SELECT strftime(ts, '%Y-%m-%d') AS day, ts AS ts_utc, value AS price
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
      AND ts <  TIMESTAMP '2024-01-10 00:00:00'
"""


MORE_REGISTRY: dict[str, QuerySpec] = {
    "scalar_functions": QuerySpec(q_scalar_functions, _SQL_SCALAR_FUNCTIONS),
    "percentile_approx_summary": QuerySpec(
        q_percentile_approx_summary, _SQL_PERCENTILE_APPROX_SUMMARY
    ),
    "scalar_string_battery": QuerySpec(
        q_scalar_string_battery, _SQL_SCALAR_STRING_BATTERY
    ),
    "unpivot_ohlc_long": QuerySpec(
        q_unpivot_ohlc_long, _SQL_UNPIVOT_OHLC_LONG
    ),
    "src_day_csv_pruned": QuerySpec(
        q_src_day_csv_pruned, _SQL_SRC_DAY_CSV_PRUNED
    ),
    "q15_top_supplier_revenue": QuerySpec(
        q15_top_supplier_revenue, _SQL_Q15_TOP_SUPPLIER_REVENUE
    ),
    "q18_large_volume_customers": QuerySpec(
        q18_large_volume_customers, _SQL_Q18_LARGE_VOLUME_CUSTOMERS
    ),
    "range_window_weekly_activity": QuerySpec(
        q_range_window_weekly_activity, _SQL_RANGE_WINDOW_WEEKLY_ACTIVITY
    ),
    "q12_priority_shipping": QuerySpec(
        q12_priority_shipping, _SQL_Q12_PRIORITY_SHIPPING
    ),
    "q14_promo_revenue_share": QuerySpec(
        q14_promo_revenue_share, _SQL_Q14_PROMO_REVENUE_SHARE
    ),
    "q19_disjunctive_predicates": QuerySpec(
        q19_disjunctive_predicates, _SQL_Q19_DISJUNCTIVE_PREDICATES
    ),
    "q4_order_priority": QuerySpec(
        q4_order_priority, _SQL_Q4_ORDER_PRIORITY
    ),
    "anti_join_customers_without_orders": QuerySpec(
        q_anti_join_customers_without_orders,
        _SQL_ANTI_JOIN_CUSTOMERS_WITHOUT_ORDERS,
    ),
    "json_props_stats": QuerySpec(q_json_props_stats, _SQL_JSON_PROPS_STATS),
    "percentile_summary": QuerySpec(
        q_percentile_summary, _SQL_PERCENTILE_SUMMARY
    ),
    "stats_moments": QuerySpec(q_stats_moments, _SQL_STATS_MOMENTS),
    "pivot_daily_event_counts": QuerySpec(
        q_pivot_daily_event_counts, _SQL_PIVOT_DAILY_EVENT_COUNTS
    ),
    "window_rank_battery": QuerySpec(
        q_window_rank_battery, _SQL_WINDOW_RANK_BATTERY
    ),
    "setops_customer_cohorts": QuerySpec(
        q_setops_customer_cohorts, _SQL_SETOPS_CUSTOMER_COHORTS
    ),
    "emb_label_centroids": QuerySpec(
        q_emb_label_centroids, _SQL_EMB_LABEL_CENTROIDS
    ),
    "text_top_tokens": QuerySpec(q_text_top_tokens, _SQL_TEXT_TOP_TOKENS),
    "dq_day_completeness": QuerySpec(
        q_dq_day_completeness, _SQL_DQ_DAY_COMPLETENESS
    ),
    "dq_window_monitor": QuerySpec(
        q_dq_window_monitor, _SQL_DQ_WINDOW_MONITOR
    ),
    "snapshot_table_lifecycle": QuerySpec(
        q_snapshot_table_lifecycle, _SQL_SNAPSHOT_TABLE_LIFECYCLE
    ),
    "asof_purchase_last_error": QuerySpec(
        q_asof_purchase_last_error, _SQL_ASOF_PURCHASE_LAST_ERROR
    ),
    "session_stats": QuerySpec(q_session_stats, _SQL_SESSION_STATS),
    "q6_forecast_revenue": QuerySpec(
        q6_forecast_revenue, _SQL_Q6_FORECAST_REVENUE
    ),
    "rank_top_customers_per_nation": QuerySpec(
        q_rank_top_customers_per_nation, _SQL_RANK_TOP_CUSTOMERS_PER_NATION
    ),
    "cube_event_type_dow": QuerySpec(
        q_cube_event_type_dow, _SQL_CUBE_EVENT_TYPE_DOW
    ),
    "rollup_revenue_nation_year": QuerySpec(
        q_rollup_revenue_nation_year, _SQL_ROLLUP_REVENUE_NATION_YEAR
    ),
}
