"""Fourth TPC-H wave — the last three classic shapes (Q11, Q16, Q20),
completing 22/22 TPC-H query coverage over the driver's star-schema
fixtures.

The fixtures have no ``partsupp`` table, so (as in Q2/Q9 of the earlier
waves) the *observed* part-supplier relationship in ``lineitem`` plays its
role: per-(partkey, suppkey) aggregates over lineitem stand in for
``ps_availqty`` / ``ps_supplycost``.  The planner shapes the originals
stress are preserved exactly:

- **Q11** — scalar aggregate subquery as a HAVING threshold (a one-row
  broadcast against the grouped fact).  The original's ``> FRACTION *
  total`` threshold is replaced by the scale-free ``> 2 * total / cnt``
  (twice the mean per-part value) so the query returns a stable, non-empty
  slice at every SF instead of degenerating as the part count grows.
- **Q16** — distinct-count aggregation with an anti-join supplier
  exclusion (``NOT IN`` on a filtered dimension).
- **Q20** — nested aggregate threshold inside a semi-join chain:
  part-filter → dominant-share condition on grouped lineitem → supplier
  semi-join.

Reference parity note: the reference repo (dags/dag_btc_daily.py) has no
joins at all — SURVEY.md §2.3 mandates the full warehouse join surface
anyway; these fill in the last unexercised shapes (scalar-subquery HAVING,
distinct-agg + NOT IN, nested-agg semi-join).

Determinism (see plans/registry.py): every sum is an exact
``SUM(CAST(x AS DECIMAL(38,6)))`` cast back to double, so both engines
produce bit-identical doubles and the threshold comparisons
(``> 2.0 * total / cnt``, ``> 0.5 * qty_p``) evaluate identically.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from airflow_crypto_btc_spark.plans.registry import QuerySpec, _dec_sum
from airflow_crypto_btc_spark.sources.tables import load_table


def q11_important_stock(spark, sf_dir):
    """Q11-shaped: per-part 'stock value' (observed revenue as the
    availqty*supplycost proxy) restricted to one supplier nation, keeping
    parts whose value exceeds twice the mean per-part value.

    Plan: fact joins two broadcast dims, one shuffle for the per-part sum,
    then a single-row statistics aggregate broadcast back as the HAVING
    threshold — the scalar subquery never leaves the driver-size scale.
    """
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_7"
    )
    val = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_part = (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("l_partkey")
        .agg(_dec_sum(val, "stock_value"))
    )
    stats = per_part.agg(
        _dec_sum(F.col("stock_value"), "total"),
        F.count("*").alias("cnt"),
    )
    return (
        per_part.crossJoin(F.broadcast(stats))
        .filter(
            F.col("stock_value")
            > F.lit(2.0) * F.col("total") / F.col("cnt")
        )
        .select("l_partkey", "stock_value")
    )


_SQL_Q11_IMPORTANT_STOCK = """
    WITH per_part AS (
      SELECT l_partkey,
        CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                      AS DECIMAL(38,6))) AS DOUBLE) AS stock_value
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_7'
      GROUP BY l_partkey
    ),
    stats AS (
      SELECT CAST(SUM(CAST(stock_value AS DECIMAL(38,6))) AS DOUBLE)
               AS total,
             COUNT(*) AS cnt
      FROM per_part
    )
    SELECT l_partkey, stock_value
    FROM per_part, stats
    WHERE stock_value > 2.0 * total / cnt
"""


def q16_supplier_part_counts(spark, sf_dir):
    """Q16-shaped: how many distinct suppliers serve each surviving
    (brand, type, size) bucket — excluding one brand, one type prefix, a
    size whitelist, and (the NOT-IN leg) low-balance suppliers standing in
    for the original's complaint filter.

    Plan: broadcast anti-join for the exclusion, broadcast dim join for
    part attributes, then a distinct-count aggregation (Catalyst expands
    to a two-phase partial distinct, so the shuffle carries pre-deduped
    (group, suppkey) pairs, not raw lineitem).
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & (~F.col("p_type").like("MEDIUM%"))
        & (F.col("p_size").isin(1, 4, 7, 10))
    )
    bad_supp = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 1000.0
    )
    return (
        li.join(
            F.broadcast(bad_supp),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


_SQL_Q16_SUPPLIER_PART_COUNTS = """
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#13'
      AND p_type NOT LIKE 'MEDIUM%'
      AND p_size IN (1, 4, 7, 10)
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000.0
      )
    GROUP BY p_brand, p_type, p_size
"""


def q20_dominant_suppliers(spark, sf_dir):
    """Q20-shaped: suppliers (in a nation subset) who shipped MORE THAN
    HALF of a bolt-part's total 1996 volume — the original's
    ``ps_availqty > 0.5 * sum(l_quantity)`` nested-aggregate threshold,
    re-read over the observed shipment totals.

    Plan: the year filter pushes to the scan; one explicit repartition by
    part key serves BOTH the (part, supplier) grouping (a subset
    partitioning satisfies its clustered distribution) and the per-part
    window total — one shuffle where the naive plan takes two.  Skew
    tradeoff: partitioning drops the supplier key, so a pathologically hot
    part concentrates; acceptable because the part filter bounds per-part
    volume, and AQE skew-split covers the rest.  Part filter and the final
    supplier lookup are broadcast semi-joins.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part_keys = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%bolt")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3", "NATION_4")
    )
    shipped = (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
        )
        .join(
            F.broadcast(part_keys.select("p_partkey")),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .repartition("l_partkey")
        .groupBy("l_partkey", "l_suppkey")
        .agg(_dec_sum(F.col("l_quantity"), "qty_ps"))
    )
    qty_p = F.sum(F.col("qty_ps").cast("decimal(38,6)")).over(
        Window.partitionBy("l_partkey")
    ).cast("double")
    dominant = shipped.withColumn("qty_p", qty_p).filter(
        F.col("qty_ps") > F.lit(0.5) * F.col("qty_p")
    )
    return (
        supp.join(
            F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .join(
            dominant.select("l_suppkey").distinct(),
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_semi",
        )
        .select("s_suppkey", "s_name", "n_name")
    )


_SQL_Q20_DOMINANT_SUPPLIERS = """
    WITH shipped AS (
      SELECT l_partkey, l_suppkey,
        CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS qty_ps
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1997-01-01'
        AND l_partkey IN (
          SELECT p_partkey FROM part WHERE p_name LIKE '%bolt'
        )
      GROUP BY l_partkey, l_suppkey
    ),
    dominant AS (
      SELECT l_suppkey
      FROM (
        SELECT l_suppkey, qty_ps,
          CAST(SUM(CAST(qty_ps AS DECIMAL(38,6)))
               OVER (PARTITION BY l_partkey) AS DOUBLE) AS qty_p
        FROM shipped
      )
      WHERE qty_ps > 0.5 * qty_p
    )
    SELECT s_suppkey, s_name, n_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3', 'NATION_4')
      AND s_suppkey IN (SELECT l_suppkey FROM dominant)
"""


TPCH3_REGISTRY: dict[str, QuerySpec] = {
    "q11_important_stock": QuerySpec(
        q11_important_stock, _SQL_Q11_IMPORTANT_STOCK
    ),
    "q16_supplier_part_counts": QuerySpec(
        q16_supplier_part_counts, _SQL_Q16_SUPPLIER_PART_COUNTS
    ),
    "q20_dominant_suppliers": QuerySpec(
        q20_dominant_suppliers, _SQL_Q20_DOMINANT_SUPPLIERS
    ),
}
