"""Write-path semantics: dynamic partition overwrite (idempotent day
re-runs touch only their partition) and schema-evolution reads."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from airflow_crypto_btc_spark.operators.merge import overwrite_day_partitions


def _files(path, day):
    return sorted(glob.glob(os.path.join(path, f"date={day}", "*.parquet")))


def test_dynamic_overwrite_touches_only_its_partition(spark, tmp_path):
    target = str(tmp_path / "daily")
    base = spark.createDataFrame(
        [("2024-01-01", 1.0), ("2024-01-02", 2.0), ("2024-01-03", 3.0)],
        "date string, close double",
    )
    overwrite_day_partitions(base, target)
    before = {d: _files(target, d) for d in
              ("2024-01-01", "2024-01-02", "2024-01-03")}
    mtimes_before = {d: [os.path.getmtime(f) for f in fs]
                     for d, fs in before.items()}

    # re-run day 2 with corrected value
    fix = spark.createDataFrame(
        [("2024-01-02", 2.5)], "date string, close double"
    )
    overwrite_day_partitions(fix, target)

    got = {
        str(r["date"]): r["close"]  # partition values read back typed
        for r in spark.read.parquet(target).collect()
    }
    assert got == {"2024-01-01": 1.0, "2024-01-02": 2.5, "2024-01-03": 3.0}
    # untouched partitions keep their exact files
    for d in ("2024-01-01", "2024-01-03"):
        assert _files(target, d) == before[d]
        assert [os.path.getmtime(f) for f in _files(target, d)] == \
            mtimes_before[d]
    # day 2's files were replaced
    assert _files(target, "2024-01-02") != before["2024-01-02"]


def test_schema_evolution_merge_read(spark, tmp_path):
    """Old files lack the new column; mergeSchema unifies and backfills
    nulls — the append-only landing-zone evolution story."""
    target = str(tmp_path / "landing")
    v1 = spark.createDataFrame(
        [("2024-01-01", 10.0)], "date string, close double"
    )
    v1.write.mode("append").parquet(target)
    v2 = spark.createDataFrame(
        [("2024-01-02", 11.0, 42.0)],
        "date string, close double, volume double",
    )
    v2.write.mode("append").parquet(target)

    merged = spark.read.option("mergeSchema", True).parquet(target)
    assert set(merged.columns) == {"date", "close", "volume"}
    rows = {r["date"]: r for r in merged.collect()}
    assert rows["2024-01-01"]["volume"] is None
    assert rows["2024-01-02"]["volume"] == 42.0


def test_balanced_shards_partitioned_write_prunes(spark, tmp_path):
    """The sharding assignment tied to its physical layout: writing
    partitionBy('shard') produces one directory per shard, and a
    single-shard read scans only that directory (PartitionFilters, not a
    post-scan filter) — the layout a tokenizer job reads shard-by-shard."""
    from airflow_crypto_btc_spark.operators.curation import (
        balanced_shards,
    )

    docs = spark.createDataFrame(
        [(i, "tok " * (1 + i % 19)) for i in range(300)],
        "doc_id long, text string",
    )
    out = str(tmp_path / "shards")
    assigned = balanced_shards(docs, shards=4, oversample=8)
    docs.join(assigned.select("doc_id", "shard"), "doc_id").write.mode(
        "overwrite"
    ).partitionBy("shard").parquet(out)

    import os

    dirs = {d for d in os.listdir(out) if d.startswith("shard=")}
    assert dirs == {f"shard={s}" for s in range(4)}

    one = spark.read.parquet(out).filter("shard = 2")
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(shard" in plan
    # pruned read returns exactly the shard's docs
    want = {r["doc_id"] for r in assigned.filter("shard = 2").collect()}
    assert {r["doc_id"] for r in one.collect()} == want
