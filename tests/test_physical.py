"""Physical-layout operator tests: salted aggregation is semantics-
preserving, and bucketed tables join without an exchange."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airflow_crypto_btc_spark.operators.physical import (
    bucketed_join_is_exchange_free,
    salted_aggregate,
    write_bucketed,
)
from airflow_crypto_btc_spark.sources.tables import load_table


def test_salted_aggregate_equals_plain_groupby(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    aggs = [
        ("value", "sum", "sum_v"),
        ("value", "count", "n"),
        ("value", "min", "min_v"),
        ("value", "max", "max_v"),
    ]
    salted = {
        r["event_type"]: r
        for r in salted_aggregate(ev, ["event_type"], aggs, salt=8).collect()
    }
    plain = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.sum("value").alias("sum_v"),
            F.count("value").alias("n"),
            F.min("value").alias("min_v"),
            F.max("value").alias("max_v"),
        )
        .collect()
    }
    assert set(salted) == set(plain)
    for k in plain:
        assert salted[k]["n"] == plain[k]["n"]
        assert salted[k]["min_v"] == plain[k]["min_v"]
        assert salted[k]["max_v"] == plain[k]["max_v"]
        assert salted[k]["sum_v"] == pytest.approx(
            plain[k]["sum_v"], rel=1e-12
        )


def test_salted_aggregate_rejects_non_decomposable(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    with pytest.raises(ValueError, match="not decomposable"):
        salted_aggregate(ev, ["event_type"], [("value", "avg", "a")])


def test_bucketed_join_plans_without_exchange(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    write_bucketed(orders, "orders_b", ["o_custkey"], 8, ["o_custkey"])
    write_bucketed(
        cust.withColumnRenamed("c_custkey", "o_custkey"),
        "customer_b",
        ["o_custkey"],
        8,
        ["o_custkey"],
    )
    # force the big-big join shape bucketing exists for (otherwise the
    # planner broadcasts the small side and never consults the buckets)
    threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined, shuffle_free = bucketed_join_is_exchange_free(
            spark, "orders_b", "customer_b", ["o_custkey"]
        )
        assert shuffle_free, "bucketed join still shuffled"
        # sanity: the join result matches the unbucketed join
        expected = orders.join(
            cust, orders.o_custkey == cust.c_custkey
        ).count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)

def test_aqe_splits_skewed_join_partition(spark):
    """Runtime skew evidence: a 500k-row 99%-one-key fact joined to a
    dense key table under tight skew thresholds must come back from AQE
    with the skewed partition split (`isSkew=true` / skew=true marker in
    the final SMJ), while results stay exact."""
    conf = spark.conf
    saved = {
        k: conf.get(k, None)
        for k in (
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "64KB",
        )
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ

        fact = spark.range(500_000).selectExpr(
            "CASE WHEN id % 100 < 99 THEN 0 ELSE id % 1000 END AS k",
            "id AS v",
        )
        dim = spark.range(1000).selectExpr("id AS k", "id * 10 AS w")
        # no downstream grouping on the join key: requiring hash(k) after
        # the join would forbid the skew split (it breaks co-partitioning)
        joined = fact.join(dim, "k").selectExpr(
            "count(*) AS n", "sum(v) AS sv"
        )
        # execute THIS DataFrame's QueryExecution so AQE finalizes it
        row = joined.collect()[0]
        assert row.n == 500_000  # every fact row matches exactly one dim
        assert row.sv == 500_000 * 499_999 // 2
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan or "isSkew=true" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


def test_global_sorted_export_files_are_range_disjoint(spark, sf_dir, tmp_path):
    """Sorted export: repartitionByRange + sortWithinPartitions writes files
    whose [min,max] key ranges don't overlap — a totally-ordered layout
    (range-prunable, mergeable) without a single-reducer global sort."""
    import pyarrow.parquet as pq

    from airflow_crypto_btc_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    out = str(tmp_path / "sorted")
    (
        ev.repartitionByRange(4, "event_id")
        .sortWithinPartitions("event_id")
        .write.parquet(out)
    )
    ranges = []
    import glob

    for f in glob.glob(out + "/*.parquet"):
        t = pq.read_table(f, columns=["event_id"])["event_id"].to_pylist()
        assert t == sorted(t)  # sorted within file
        ranges.append((min(t), max(t)))
    ranges.sort()
    assert len(ranges) >= 3
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2  # disjoint, totally ordered across files


def test_binned_range_join_no_nested_loop_and_equivalent(spark, sf_dir):
    """The binned plan must contain a hash join (not BNLJ/cartesian) and
    produce exactly the naive range join's rows."""
    from airflow_crypto_btc_spark.operators.physical import binned_range_join
    from airflow_crypto_btc_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    days = (
        ev.select(F.to_date("ts").alias("d"))
        .agg(F.min("d").alias("mn"), F.max("d").alias("mx"))
        .select(F.explode(F.expr("sequence(mn, mx, interval 5 days)"))
                .alias("start_day"))
        .select("start_day", F.date_add("start_day", 2).alias("end_day"))
    )
    binned = binned_range_join(ev, days)
    plan = binned._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan

    naive = ev.join(
        days,
        F.to_date("ts").between(F.col("start_day"), F.col("end_day")),
    )
    got = binned.groupBy("start_day").count().toPandas()
    want = naive.groupBy("start_day").count().toPandas()
    got = got.set_index("start_day")["count"].to_dict()
    want = want.set_index("start_day")["count"].to_dict()
    assert got == want and sum(got.values()) > 0


def test_salted_join_equivalent_to_plain(spark, sf_dir):
    from airflow_crypto_btc_spark.operators.physical import salted_join
    from airflow_crypto_btc_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    dim = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
    )
    got = salted_join(ev, dim, "user_id", salt=4)
    want = ev.join(dim, "user_id")
    assert got.count() == want.count()
    a = got.groupBy("user_id").count().toPandas().set_index("user_id")
    b = want.groupBy("user_id").count().toPandas().set_index("user_id")
    assert a["count"].to_dict() == b["count"].to_dict()


def test_salted_join_salt_nonnegative_on_int_min_hash(spark):
    """Regression for the `abs(hash) % salt` salting bug: when murmur3
    returns Int32.MinValue, `abs` throws under ANSI mode and yields a
    negative (match-less → silently dropped) shard with ANSI off.  The
    fixed expression is `pmod(hash, salt)`; pin its semantics on the
    exact edge value plus ordinary negatives."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(-2147483648,), (-2147483647,), (-5,), (0,), (7,)], "h int"
    )
    for salt in (4, 8):
        out = df.select(F.pmod(F.col("h"), F.lit(salt)).alias("s")).collect()
        assert all(r["s"] is not None and 0 <= r["s"] < salt for r in out)
    # and the shipped operator must not contain the abs form anymore
    import inspect

    from airflow_crypto_btc_spark.operators import physical

    src = inspect.getsource(physical.salted_join)
    assert "pmod" in src and "F.abs" not in src
