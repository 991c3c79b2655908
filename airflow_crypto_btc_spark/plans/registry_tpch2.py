"""Third TPC-H wave: the remaining classic query shapes over the driver's
star-schema fixtures — correlated-min supplier selection (Q2), nation-pair
volume (Q7), returned-item top-k (Q10), outer-join count distribution
(Q13), correlated-average threshold (Q17), and scalar-subquery + anti-join
(Q22).

The reference repo has no joins at all (SURVEY §2.3) — this battery exists
because the engine must serve the full query surface a warehouse user
expects, and each shape stresses a different planner path: window-min vs
groupBy+self-join, big-big fact joins with broadcast dims, left-outer
aggregation preserving zero groups, and scalar broadcast subqueries.

Determinism rules as everywhere (see plans/registry.py): decimal sums cast
back to double, round(…, 6) before any threshold or ranking, explicit
tie-breaks on keys for every LIMIT.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from airflow_crypto_btc_spark.plans.registry import (
    QuerySpec,
    _dec_sum,
    _ts_bound,
)
from airflow_crypto_btc_spark.sources.tables import load_table


def q2_min_cost_supplier(spark, sf_dir):
    """Q2-shaped: for every smallish part, the EUROPE supplier(s) offering
    the minimum unit cost.  The fixture has no partsupp table, so observed
    unit price over lineitem (min per part-supplier) plays ps_supplycost —
    the correlated-min structure is identical.  Dims broadcast; the only
    shuffle is the per-part min.

    Unit cost is computed in EXACT integer micro-units (prices are
    cent-valued, quantities integral in the fixture): a 6-dp ROUND of
    the double quotient sat on rounding boundaries at sf0.1, and the
    winner-take-min structure amplifies a last-ulp engine split into
    whole-row differences — the half-away-from-zero integer tie-break
    is reproduced bit-for-bit by both engines (same doctrine as the
    unigram-LM mean)."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 15)
    unit = F.when(
        F.col("l_quantity") != 0,
        F.expr(
            "(2 * CAST(round(l_extendedprice * 100) AS BIGINT) * 10000"
            " + CAST(l_quantity AS BIGINT))"
            " div (2 * CAST(l_quantity AS BIGINT))"
        )
        / F.lit(1000000.0),
    )
    costs = (
        li.select("l_partkey", "l_suppkey", unit.alias("unit_cost"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("l_partkey", "s_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(F.min("unit_cost").alias("supply_cost"))
    )
    w = Window.partitionBy("l_partkey")
    best = costs.withColumn(
        "min_cost", F.min("supply_cost").over(w)
    ).filter(F.col("supply_cost") == F.col("min_cost"))
    return best.join(
        F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")
    ).select(
        "s_acctbal",
        "s_name",
        "n_name",
        "p_partkey",
        "p_type",
        F.col("supply_cost").alias("min_unit_cost"),
    )


_SQL_Q2_MIN_COST_SUPPLIER = """
    WITH costs AS (
      SELECT l_partkey, s_suppkey, s_name, s_acctbal, n_name,
        MIN((2 * CAST(round(l_extendedprice * 100) AS BIGINT) * 10000
             + CAST(l_quantity AS BIGINT))
            // (2 * CAST(l_quantity AS BIGINT)) / 1000000.0)
          AS supply_cost
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
      GROUP BY 1, 2, 3, 4, 5
    ),
    best AS (
      SELECT *, MIN(supply_cost) OVER (PARTITION BY l_partkey) AS min_cost
      FROM costs
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_type,
           supply_cost AS min_unit_cost
    FROM best JOIN part ON l_partkey = p_partkey
    WHERE supply_cost = min_cost AND p_size <= 15
"""


def q7_nation_pair_volume(spark, sf_dir):
    """Q7-shaped: shipping volume between two specific nations (either
    direction), by supplier nation / customer nation / ship year.  Two
    fact-fact joins (lineitem⋈orders, via supplier and customer to their
    nations); both nation dims broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    lo = _ts_bound(li, "l_shipdate", "1996-01-01 00:00:00")
    hi = _ts_bound(li, "l_shipdate", "1998-01-01 00:00:00")
    n1 = nat.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nat.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_3")
        & (F.col("cust_nation") == "NATION_7")
    ) | (
        (F.col("supp_nation") == "NATION_7")
        & (F.col("cust_nation") == "NATION_3")
    )
    volume = F.col("l_extendedprice") * (1.0 - F.col("l_discount"))
    return (
        li.filter(
            (F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi)
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(_dec_sum(volume, "volume"))
    )


_SQL_Q7_NATION_PAIR_VOLUME = """
    SELECT supp_nation, cust_nation, l_year,
      CAST(SUM(CAST(volume AS DECIMAL(38,6))) AS DOUBLE) AS volume
    FROM (
      SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
             EXTRACT(year FROM l_shipdate) AS l_year,
             l_extendedprice * (1.0 - l_discount) AS volume
      FROM lineitem
      JOIN orders    ON l_orderkey = o_orderkey
      JOIN customer  ON o_custkey = c_custkey
      JOIN supplier  ON l_suppkey = s_suppkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        AND ((sn.n_name = 'NATION_3' AND cn.n_name = 'NATION_7')
          OR (sn.n_name = 'NATION_7' AND cn.n_name = 'NATION_3'))
    )
    GROUP BY 1, 2, 3
"""


def q10_returned_items(spark, sf_dir):
    """Q10-shaped: top-20 customers by revenue lost to returns in one
    quarter — selective fact filter, fact-fact join, broadcast dims,
    deterministic top-k (revenue desc, custkey tie-break)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    lo = _ts_bound(orders, "o_orderdate", "1996-10-01 00:00:00")
    hi = _ts_bound(orders, "o_orderdate", "1997-01-01 00:00:00")
    revenue = F.col("l_extendedprice") * (1.0 - F.col("l_discount"))
    return (
        li.join(
            orders.filter(
                (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_dec_sum(revenue, "revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


_SQL_Q10_RETURNED_ITEMS = """
    SELECT c_custkey, c_name, c_acctbal, n_name,
      CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
                    AS DECIMAL(38,6))) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY 1, 2, 3, 4
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
"""


def q13_order_count_distribution(spark, sf_dir):
    """Q13-shaped: two-level aggregation with an OUTER join — customers
    with zero orders must appear in the c_count=0 bucket, which an inner
    join silently drops (the classic outer-agg trap)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(
            orders, F.col("c_custkey") == F.col("o_custkey"), "left_outer"
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


_SQL_Q13_ORDER_COUNT_DISTRIBUTION = """
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    GROUP BY c_count
"""


def q17_small_quantity_revenue(spark, sf_dir):
    """Q17-shaped: correlated average — revenue from line items whose
    quantity is below 20% of their part's average quantity.  The per-part
    average is a tiny aggregate joined back (broadcast), not a per-row
    subquery; decimal sum/count keeps the threshold cross-engine exact."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#13"
    )
    avg_qty = (
        li.groupBy(F.col("l_partkey").alias("ap_key"))
        .agg(
            F.round(
                F.sum(F.col("l_quantity").cast("decimal(38,6)")).cast(
                    "double"
                )
                / F.count("l_quantity"),
                6,
            ).alias("avg_qty")
        )
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(avg_qty), F.col("l_partkey") == F.col("ap_key"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(38,6)")
                ).cast("double")
                / 7.0,
                6,
            ).alias("avg_yearly")
        )
    )


_SQL_Q17_SMALL_QUANTITY_REVENUE = """
    WITH avg_qty AS (
      SELECT l_partkey AS ap_key,
        round(CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)
              / count(l_quantity), 6) AS avg_qty
      FROM lineitem GROUP BY 1
    )
    SELECT round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6)))
                 AS DOUBLE) / 7.0, 6) AS avg_yearly
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN avg_qty ON l_partkey = ap_key
    WHERE p_brand = 'Brand#13' AND l_quantity < 0.2 * avg_qty
"""


def q22_idle_rich_customers(spark, sf_dir):
    """Q22-shaped: scalar subquery + anti-join — customers whose balance
    beats the positive-balance average but who placed no RECENT order
    (every fixture customer has *some* order, so the idleness test is
    temporal), grouped by market segment.  The scalar average broadcasts
    as a 1-row cross join; the NOT EXISTS is a left-anti join on the
    recent order keys."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    cutoff = _ts_bound(orders, "o_orderdate", "1999-01-01 00:00:00")
    orders = orders.filter(F.col("o_orderdate") >= cutoff)
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg(
            F.round(
                F.sum(F.col("c_acctbal").cast("decimal(38,6)")).cast(
                    "double"
                )
                / F.count("c_acctbal"),
                6,
            ).alias("avg_bal")
        )
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            orders.select("o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            _dec_sum(F.col("c_acctbal"), "totacctbal"),
        )
    )


_SQL_Q22_IDLE_RICH_CUSTOMERS = """
    SELECT c_mktsegment, count(*) AS numcust,
      CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS totacctbal
    FROM customer
    WHERE c_acctbal > (
        SELECT round(CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE)
                     / count(c_acctbal), 6)
        FROM customer WHERE c_acctbal > 0.0
      )
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
      )
    GROUP BY c_mktsegment
"""


def q8_market_share(spark, sf_dir):
    """Q8-shaped: one supplier nation's share of MEDIUM-part volume sold to
    AMERICA-region customers, by order year.  Conditional-sum / total-sum
    over the same grouped rows — a single aggregation, no self-join; both
    sums decimal-exact so the division is bitwise reproducible, then
    round(…, 6) on both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "AMERICA"
    )
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "MEDIUM"
    )
    lo = _ts_bound(orders, "o_orderdate", "1996-01-01 00:00:00")
    hi = _ts_bound(orders, "o_orderdate", "1998-01-01 00:00:00")
    cn = nat.select(
        F.col("n_nationkey").alias("cn_key"),
        F.col("n_regionkey").alias("cn_regionkey"),
    )
    sn = nat.select(
        F.col("n_nationkey").alias("sn_key"),
        F.col("n_name").alias("supp_nation"),
    )
    volume = F.col("l_extendedprice") * (1.0 - F.col("l_discount"))
    nat_vol = F.when(F.col("supp_nation") == "NATION_3", volume).otherwise(
        0.0
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            orders.filter(
                (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(
            F.broadcast(reg), F.col("cn_regionkey") == F.col("r_regionkey")
        )
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(
                F.sum(nat_vol.cast("decimal(38,6)")).cast("double")
                / F.sum(volume.cast("decimal(38,6)")).cast("double"),
                6,
            ).alias("mkt_share")
        )
    )


_SQL_Q8_MARKET_SHARE = """
    SELECT EXTRACT(year FROM o_orderdate) AS o_year,
      round(
        CAST(SUM(CAST(CASE WHEN n2.n_name = 'NATION_3'
                   THEN l_extendedprice * (1.0 - l_discount)
                   ELSE 0.0 END AS DECIMAL(38,6))) AS DOUBLE)
        / CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
                   AS DECIMAL(38,6))) AS DOUBLE),
        6) AS mkt_share
    FROM lineitem
    JOIN part      ON l_partkey = p_partkey
    JOIN orders    ON l_orderkey = o_orderkey
    JOIN customer  ON o_custkey = c_custkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN region    ON n1.n_regionkey = r_regionkey
    JOIN supplier  ON l_suppkey = s_suppkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    WHERE p_type = 'MEDIUM' AND r_name = 'AMERICA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1
"""


def q9_product_type_profit(spark, sf_dir):
    """Q9-shaped: profit by supplier nation and order year over a
    part-name substring filter.  The fixture has no partsupp, so unit cost
    is modeled as 60% of p_retailprice — the join/agg structure (fact ⋈
    two broadcast dims ⋈ fact, two-key groupBy) is the point."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").contains("red")
    )
    profit = F.col("l_extendedprice") * (1.0 - F.col("l_discount")) - (
        0.6 * F.col("p_retailprice")
    ) * F.col("l_quantity")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            orders.select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(_dec_sum(profit, "sum_profit"))
    )


_SQL_Q9_PRODUCT_TYPE_PROFIT = """
    SELECT n_name AS nation, EXTRACT(year FROM o_orderdate) AS o_year,
      CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
                    - (0.6 * p_retailprice) * l_quantity
               AS DECIMAL(38,6))) AS DOUBLE) AS sum_profit
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN orders   ON l_orderkey = o_orderkey
    WHERE p_name LIKE '%red%'
    GROUP BY 1, 2
"""


def q21_waiting_suppliers(spark, sf_dir):
    """Q21-shaped: suppliers from one nation who were the *sole late
    supplier* in a finished multi-supplier order — EXISTS (another
    supplier shipped in the order) plus NOT EXISTS (another supplier was
    also late), rendered as a left-semi and a left-anti self-join on the
    fact table, both keyed on l_orderkey with a suppkey inequality.

    The fixture lineitem has no receipt/commit dates, so "late" is
    l_shipdate > o_orderdate + 1500 days (~p92 of the observed ship
    delay); the reshaped predicate keeps TPC-H Q21's planner structure
    intact (two correlated EXISTS over the same fact)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_9"
    )
    late = (
        li.join(
            orders.select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 1500 DAYS")
        )
        .select("l_orderkey", "l_suppkey")
    )
    l1 = late.join(
        F.broadcast(
            supp.join(
                F.broadcast(nat),
                F.col("s_nationkey") == F.col("n_nationkey"),
            ).select("s_suppkey", "s_name")
        ),
        F.col("l_suppkey") == F.col("s_suppkey"),
    )
    l2 = li.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
    )
    l3 = late.select(
        F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3")
    )
    return (
        l1.join(
            l2,
            (F.col("l_orderkey") == F.col("k2"))
            & (F.col("s2") != F.col("l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("k3"))
            & (F.col("s3") != F.col("l_suppkey")),
            "left_anti",
        )
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


_SQL_Q21_WAITING_SUPPLIERS = """
    WITH late AS (
      SELECT l_orderkey, l_suppkey
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'F'
        AND l_shipdate > o_orderdate + INTERVAL 1500 DAY
    )
    SELECT s_name, count(*) AS numwait
    FROM late l1
    JOIN supplier ON l1.l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_9'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM late l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name ASC
    LIMIT 20
"""


TPCH2_REGISTRY: dict[str, QuerySpec] = {
    "q2_min_cost_supplier": QuerySpec(
        q2_min_cost_supplier, _SQL_Q2_MIN_COST_SUPPLIER
    ),
    "q7_nation_pair_volume": QuerySpec(
        q7_nation_pair_volume, _SQL_Q7_NATION_PAIR_VOLUME
    ),
    "q8_market_share": QuerySpec(q8_market_share, _SQL_Q8_MARKET_SHARE),
    "q9_product_type_profit": QuerySpec(
        q9_product_type_profit, _SQL_Q9_PRODUCT_TYPE_PROFIT
    ),
    "q21_waiting_suppliers": QuerySpec(
        q21_waiting_suppliers, _SQL_Q21_WAITING_SUPPLIERS
    ),
    "q10_returned_items": QuerySpec(
        q10_returned_items, _SQL_Q10_RETURNED_ITEMS
    ),
    "q13_order_count_distribution": QuerySpec(
        q13_order_count_distribution, _SQL_Q13_ORDER_COUNT_DISTRIBUTION
    ),
    "q17_small_quantity_revenue": QuerySpec(
        q17_small_quantity_revenue, _SQL_Q17_SMALL_QUANTITY_REVENUE
    ),
    "q22_idle_rich_customers": QuerySpec(
        q22_idle_rich_customers, _SQL_Q22_IDLE_RICH_CUSTOMERS
    ),
}
