"""Z-order layout semantics (operators/zorder.py)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from airflow_crypto_btc_spark.operators.zorder import (
    bucket_stats,
    morton_expr,
    prune_report,
    zorder_code,
    zorder_repartition,
)


def test_morton_known_values(spark):
    rows = [(0, 3, 5), (1, 65535, 65535), (2, 0, 0), (3, 21845, 43690)]
    df = spark.createDataFrame(rows, "id long, x int, y int")
    out = {
        r["id"]: r["z"]
        for r in df.select("id", morton_expr("x", "y").alias("z")).collect()
    }
    # interleave(3=0b11, 5=0b101): x→bits 0,2; y→bits 1,5 = 39
    assert out[0] == 39
    assert out[1] == (1 << 32) - 1
    assert out[2] == 0
    # 0x5555 (even x-bits) + 0xAAAA (odd y-bits) → 0x99999999
    assert out[3] == 0x99999999


@pytest.fixture(scope="module")
def grid(spark):
    # a 40×40 uniform grid: ids encode the coordinates for checking
    rows = [(x * 100 + y, x, y * 10) for x in range(40) for y in range(40)]
    return spark.createDataFrame(rows, "id long, a long, b long")


def test_grid_normalization_is_exact(grid):
    coded = zorder_code(grid, "a", "b", id_cols=("id",))
    r = {x["id"]: x for x in coded.collect()}
    assert r[0]["x_u16"] == 0 and r[0]["y_u16"] == 0
    assert r[3939]["x_u16"] == 65535 and r[3939]["y_u16"] == 65535
    # degenerate range pins to cell 0
    one = zorder_code(
        grid.filter("a = 7"), "a", "b", id_cols=("id",)
    ).collect()
    assert all(x["x_u16"] == 0 for x in one)


def test_nulls_have_no_curve_position(spark):
    df = spark.createDataFrame(
        [(0, 1, 1), (1, None, 2), (2, 3, None)],
        "id long, a long, b long",
    )
    assert zorder_code(df, "a", "b", id_cols=("id",)).count() == 1


def test_wide_range_raises_instead_of_overflowing(spark):
    # a dimension range >= 2^47 would overflow (v-mn)*65535 in BIGINT
    # and emit wrong codes silently — the grid projection must raise
    df = spark.createDataFrame(
        [(0, 0, 1), (1, 1 << 47, 2)], "id long, a long, b long"
    )
    with pytest.raises(Exception, match="2\\^47"):
        zorder_code(df, "a", "b", id_cols=("id",)).collect()
    # just under the bound still codes exactly
    ok = spark.createDataFrame(
        [(0, 0, 1), (1, (1 << 47) - 1, 2)], "id long, a long, b long"
    )
    r = {
        x["id"]: x["x_u16"]
        for x in zorder_code(ok, "a", "b", id_cols=("id",)).collect()
    }
    assert r[0] == 0 and r[1] == 65535


def test_repartition_retains_null_dimension_rows(spark):
    # the write path must not lose rows: null-dim rows coalesce to
    # zcode -1 (below every real code) instead of dropping out
    df = spark.createDataFrame(
        [(0, 1, 1), (1, None, 2), (2, 3, None), (3, 4, 4)],
        "id long, a long, b long",
    )
    out = zorder_repartition(df, "a", "b", num_files=2, id_cols=("id",))
    rows = {r["id"]: r for r in out.collect()}
    assert set(rows) == {0, 1, 2, 3}
    assert rows[1]["zcode"] == -1 and rows[2]["zcode"] == -1
    assert rows[0]["zcode"] >= 0 and rows[3]["zcode"] >= 0


def test_prune_report_z_beats_single_dimension_layout(grid):
    coded = zorder_code(grid, "a", "b", id_cols=("id",))
    rep = prune_report(
        coded, x_lo=0, x_hi=16383, y_lo=24576, y_hi=40959
    ).collect()[0]
    assert rep["rows_total"] == 1600
    # scanned rows always cover the true answer, in any layout
    assert rep["z_rows_scanned"] >= rep["rows_match"] > 0
    assert rep["x_rows_scanned"] >= rep["rows_match"]
    # the point of the curve: on a both-dims-selective box, the
    # z-layout's envelopes skip strictly more than x-only clustering
    assert rep["z_rows_scanned"] < rep["x_rows_scanned"]
    assert rep["z_files_touched"] < rep["x_files_touched"]
    assert rep["z_skip_micro"] > rep["x_skip_micro"]


def test_bucket_stats_partition_the_rows(grid):
    coded = zorder_code(grid, "a", "b", id_cols=("id",))
    stats = bucket_stats(coded, n_buckets=16).collect()
    assert sum(s["n_rows"] for s in stats) == 1600
    assert all(0 <= s["bucket"] < 16 for s in stats)
    assert all(
        s["x_min"] <= s["x_max"] and s["y_min"] <= s["y_max"]
        for s in stats
    )


def test_zorder_repartition_tightens_file_envelopes(grid):
    def mean_envelope_area(df) -> float:
        parts = (
            df.withColumn("pid", F.spark_partition_id())
            .groupBy("pid")
            .agg(
                (
                    (F.max("a") - F.min("a") + 1)
                    * (F.max("b") - F.min("b") + 1)
                ).alias("area")
            )
            .collect()
        )
        return sum(p["area"] for p in parts) / len(parts)

    z = zorder_repartition(grid, "a", "b", num_files=8, id_cols=("id",))
    hashed = grid.repartition(8, "id")
    # hash layout: every file spans ~the full grid; z layout: each
    # file covers a compact curve segment — well under half the area
    assert mean_envelope_area(z) < 0.5 * mean_envelope_area(hashed)


def test_mixed_sign_wide_range_cannot_wrap_past_the_guard(spark):
    # mx - mn on a mixed-sign range (here 2^63) wraps BIGINT to a
    # NEGATIVE number, which would sail past a same-type >= 2^47 test;
    # the guard compares the range in DOUBLE, which cannot wrap
    df = spark.createDataFrame(
        [(0, -(1 << 62), 1), (1, (1 << 62), 2)], "id long, a long, b long"
    )
    with pytest.raises(Exception, match="2\\^47"):
        zorder_code(df, "a", "b", id_cols=("id",)).collect()
