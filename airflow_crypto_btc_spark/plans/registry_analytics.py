"""Event-analytics query wave: the product-analytics patterns a user of an
events warehouse runs daily — ordered funnels, weekly cohort retention,
SCD2 validity intervals, and equi-depth / equi-width histograms.

All five are pure DataFrame compositions (joins, windows, conditional
aggregation) — zero UDFs.  Scale notes per query in the docstrings; the
funnel's three stage-joins share the ``user_id`` shuffle key, so a real
cluster co-partitions them (AQE broadcasts the tiny aggregated sides at
test scale).

Determinism: timestamps are exact; every ordering that feeds a window
carries a unique (ts, event_id) tie-break; ratios/means round to 6.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from airflow_crypto_btc_spark.plans.registry import QuerySpec
from airflow_crypto_btc_spark.sources.tables import load_table


def _events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


# ---------------------------------------------------------- ordered funnel


def q_funnel_stages(spark, sf_dir):
    """Strictly-ordered funnel view → click → purchase: each stage's
    timestamp must follow the previous stage's.  Three conditional-min
    aggregations joined on user_id (one co-partitionable key); users who
    never viewed sit at stage 0."""
    ev = _events(spark, sf_dir)
    users = ev.select("user_id").distinct()
    s1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    out = (
        users.join(s1, "user_id", "left")
        .join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
    )
    stage = (
        F.col("t_view").isNotNull().cast("int")
        + F.col("t_click").isNotNull().cast("int")
        + F.col("t_purchase").isNotNull().cast("int")
    )
    return out.select(
        "user_id", "t_view", "t_click", "t_purchase",
        stage.cast("long").alias("stage"),
    )


_SQL_FUNNEL_STAGES = """
    WITH s1 AS (
      SELECT user_id, min(ts) AS t_view FROM events
      WHERE event_type = 'view' GROUP BY 1
    ),
    s2 AS (
      SELECT e.user_id, min(e.ts) AS t_click
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click' AND e.ts > s1.t_view
      GROUP BY 1
    ),
    s3 AS (
      SELECT e.user_id, min(e.ts) AS t_purchase
      FROM events e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t_click
      GROUP BY 1
    )
    SELECT u.user_id, s1.t_view, s2.t_click, s3.t_purchase,
      CAST((s1.user_id IS NOT NULL)::INT + (s2.user_id IS NOT NULL)::INT
           + (s3.user_id IS NOT NULL)::INT AS BIGINT) AS stage
    FROM (SELECT DISTINCT user_id FROM events) u
    LEFT JOIN s1 ON u.user_id = s1.user_id
    LEFT JOIN s2 ON u.user_id = s2.user_id
    LEFT JOIN s3 ON u.user_id = s3.user_id
"""


# ----------------------------------------------------- weekly cohort grid


def q_cohort_retention(spark, sf_dir):
    """Weekly cohort retention: users bucketed by first-seen ISO week;
    each (cohort_week, week_offset) cell counts users active that many
    weeks later.  Two aggregations + one user-keyed join — the
    (user, week) de-dup makes the final count a plain count(*)."""
    ev = _events(spark, sf_dir)
    week = lambda c: F.to_date(F.date_trunc("week", c))  # noqa: E731
    firsts = ev.groupBy("user_id").agg(
        week(F.min("ts")).alias("cohort_week")
    )
    actives = ev.select(
        "user_id", week(F.col("ts")).alias("active_week")
    ).distinct()
    joined = actives.join(firsts, "user_id")
    offset = (
        F.datediff(F.col("active_week"), F.col("cohort_week")) / 7
    ).cast("long")
    return (
        joined.select("cohort_week", offset.alias("week_offset"), "user_id")
        .groupBy("cohort_week", "week_offset")
        .agg(F.count("*").cast("long").alias("n_active"))
    )


_SQL_COHORT_RETENTION = """
    WITH firsts AS (
      SELECT user_id,
        CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
      FROM events GROUP BY 1
    ),
    actives AS (
      SELECT DISTINCT user_id,
        CAST(date_trunc('week', ts) AS DATE) AS active_week
      FROM events
    )
    SELECT cohort_week,
      CAST(date_diff('day', cohort_week, active_week) / 7 AS BIGINT)
        AS week_offset,
      CAST(count(*) AS BIGINT) AS n_active
    FROM actives JOIN firsts USING (user_id)
    GROUP BY 1, 2
"""


# ------------------------------------------------- SCD2 validity intervals


def q_scd2_intervals(spark, sf_dir):
    """Slowly-changing-dimension (type 2) build from an event log: each
    user's purchase-value history becomes versioned validity intervals
    [valid_from, valid_to), open-ended for the current version.  One
    window per user partition — the lakehouse dimension-build pattern."""
    ev = _events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        F.col("value").alias("attr_value"),
        F.col("ts").alias("valid_from"),
        F.lead("ts", 1).over(w).alias("valid_to"),
        F.row_number().over(w).cast("long").alias("version"),
        F.lead("ts", 1).over(w).isNull().alias("is_current"),
    )


_SQL_SCD2_INTERVALS = """
    SELECT user_id,
      value AS attr_value,
      ts AS valid_from,
      lead(ts) OVER w AS valid_to,
      CAST(row_number() OVER w AS BIGINT) AS version,
      lead(ts) OVER w IS NULL AS is_current
    FROM events
    WHERE event_type = 'purchase'
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


# ------------------------------------------------- equi-depth histogram


def q_histogram_equidepth(spark, sf_dir):
    """Per-type decile (equi-depth) histogram via ntile over a total
    order; bucket stats are exact mins/maxes + rounded means.  One
    window + one aggregation sharing the event_type shuffle."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return (
        ev.withColumn("decile", F.ntile(10).over(w).cast("long"))
        .groupBy("event_type", "decile")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
            F.round(
                F.sum(F.col("value").cast("decimal(38,6)")).cast("double")
                / F.count("*"),
                6,
            ).alias("mean_value"),
        )
    )


_SQL_HISTOGRAM_EQUIDEPTH = """
    SELECT event_type, decile,
      CAST(count(*) AS BIGINT) AS n,
      min(value) AS lo,
      max(value) AS hi,
      round(CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / count(*), 6)
        AS mean_value
    FROM (
      SELECT event_type, value,
        CAST(ntile(10) OVER (
          PARTITION BY event_type ORDER BY value, event_id) AS BIGINT)
          AS decile
      FROM events
    )
    GROUP BY 1, 2
"""


# ------------------------------------------------- equi-width histogram


def q_histogram_equiwidth(spark, sf_dir):
    """Per-type 20-bin equi-width histogram: bin bounds from one tiny
    per-type min/max aggregate (broadcast back), bin index as identical
    floating-point arithmetic on both engines.  The max value folds into
    the last bin."""
    ev = _events(spark, sf_dir)
    bounds = ev.groupBy("event_type").agg(
        F.min("value").alias("lo_all"), F.max("value").alias("hi_all")
    )
    j = ev.join(F.broadcast(bounds), "event_type")
    raw_bin = F.floor(
        (F.col("value") - F.col("lo_all"))
        * F.lit(20.0)
        / (F.col("hi_all") - F.col("lo_all"))
    )
    bin_ = F.least(raw_bin, F.lit(19)).cast("long")
    return (
        j.withColumn("bin", bin_)
        .groupBy("event_type", "bin")
        .agg(F.count("*").cast("long").alias("n"))
    )


_SQL_HISTOGRAM_EQUIWIDTH = """
    WITH bounds AS (
      SELECT event_type, min(value) AS lo_all, max(value) AS hi_all
      FROM events GROUP BY 1
    )
    SELECT event_type,
      CAST(least(floor((value - lo_all) * 20.0 / (hi_all - lo_all)), 19)
           AS BIGINT) AS bin,
      CAST(count(*) AS BIGINT) AS n
    FROM events JOIN bounds USING (event_type)
    GROUP BY 1, 2
"""


# ------------------------------------- TPC-DS-style moving-average deviation


def q_category_sales_deviation(spark, sf_dir):
    """TPC-DS Q47-shaped: monthly revenue per part category vs its
    centered 3-month moving average; report months deviating ≥ 10%.
    Fact-to-dim broadcast join → one (category, month) aggregate → one
    window pass over the tiny aggregate — raw-data growth only touches
    the first stage."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    monthly = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy(
            F.col("p_type").alias("category"),
            F.to_date(F.date_trunc("month", "l_shipdate")).alias("month"),
        )
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount")))
                .cast("decimal(38,6)")
            )
            .cast("double")
            .alias("revenue")
        )
    )
    w = Window.partitionBy("category").orderBy("month").rowsBetween(-1, 1)
    avg3 = F.when(
        F.count("revenue").over(w) == 3, F.avg("revenue").over(w)
    )
    out = monthly.withColumn("avg3", F.round(avg3, 6)).withColumn(
        "dev_ratio",
        F.round(
            F.when(F.col("avg3") > 0, F.col("revenue") / F.col("avg3")), 6
        ),
    )
    return out.filter(
        (F.col("dev_ratio") >= 1.1) | (F.col("dev_ratio") <= 0.9)
    ).select("category", "month", F.round("revenue", 6).alias("revenue"),
             "avg3", "dev_ratio")


_SQL_CATEGORY_SALES_DEVIATION = """
    WITH monthly AS (
      SELECT p.p_type AS category,
        CAST(date_trunc('month', l.l_shipdate) AS DATE) AS month,
        CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                      AS DECIMAL(38,6))) AS DOUBLE) AS revenue
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1, 2
    ),
    win AS (
      SELECT category, month, revenue,
        round(CASE WHEN count(revenue) OVER f = 3
                   THEN avg(revenue) OVER f END, 6) AS avg3
      FROM monthly
      WINDOW f AS (PARTITION BY category ORDER BY month
                   ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING)
    )
    SELECT category, month, round(revenue, 6) AS revenue, avg3,
      round(CASE WHEN avg3 > 0 THEN revenue / avg3 END, 6) AS dev_ratio
    FROM win
    WHERE round(CASE WHEN avg3 > 0 THEN revenue / avg3 END, 6) >= 1.1
       OR round(CASE WHEN avg3 > 0 THEN revenue / avg3 END, 6) <= 0.9
"""


ANALYTICS_REGISTRY: dict[str, QuerySpec] = {
    "category_sales_deviation": QuerySpec(
        q_category_sales_deviation, _SQL_CATEGORY_SALES_DEVIATION
    ),
    "funnel_stages": QuerySpec(q_funnel_stages, _SQL_FUNNEL_STAGES),
    "cohort_retention": QuerySpec(
        q_cohort_retention, _SQL_COHORT_RETENTION
    ),
    "scd2_intervals": QuerySpec(q_scd2_intervals, _SQL_SCD2_INTERVALS),
    "histogram_equidepth": QuerySpec(
        q_histogram_equidepth, _SQL_HISTOGRAM_EQUIDEPTH
    ),
    "histogram_equiwidth": QuerySpec(
        q_histogram_equiwidth, _SQL_HISTOGRAM_EQUIWIDTH
    ),
}
