"""Z-order (Morton) data layout: interleave the bits of two dimension
columns so that range-partitioning on ONE code yields files whose
min/max envelopes are tight in BOTH dimensions — multi-column file
skipping from single-column clustering (Morton 1966; the technique
behind Delta Lake's ``OPTIMIZE ZORDER BY`` and Hudi/Iceberg space-
filling-curve clustering).

Why this is a 100 TB operator: a table laid out by one column prunes
scans on that column only — a predicate on any other dimension reads
everything.  Interleaving maps the 2-D key space onto a 1-D curve
with locality in both inputs, so per-file column statistics (the
min/max every parquet footer and snapshot-table commit log already
records — see ``sources/snapshot_table.read_snapshot(prune=...)``)
become selective for EITHER predicate.  The layout costs one
range-shuffle at write time and nothing at read time.

Engine-exactness: everything is integer arithmetic — dimensions
normalize to a 16-bit grid with BIGINT multiply-divide (no float
rounding an engine could disagree on), the code is a 32-bit bit
interleave via higher-order ``aggregate`` (JVM-side, zero UDFs), and
the pruning REPORT measures skip quality in exact micro-units, so the
whole family is value-replayable by the DuckDB oracle.

Relationship to ``sources/snapshot_table._zorder_column``: the
snapshot store's OPTIMIZE path already z-orders rewrites (N-dim,
float-scaled — ordering is all a write needs, and a maintenance
command may collect bounds driver-side).  THIS module is the
measurement/serving side of the same idea: integer-exact codes the
DuckDB oracle replays value-for-value, per-file envelope statistics,
and the prune report that justifies paying the layout shuffle at all
— plus a standalone range-partitioned writer for plain parquet
outputs that never pass through the snapshot store.

No counterpart in the reference (``dags/dag_btc_daily.py`` writes
unclustered day CSVs); extends the SURVEY §2.11 physical-layout
family (salting, bucketing, clustered compaction) with the measured
multi-dimensional case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: grid resolution per dimension (16 bits → 32-bit Morton codes);
#: finer grids sharpen pruning but 2^16 cells per axis already puts
#: grid quantization far below per-file granularity at any file count
GRID_BITS = 16
GRID_MAX = (1 << GRID_BITS) - 1  # 65535
CODE_SPAN = 1 << (2 * GRID_BITS)  # 2^32, exclusive upper bound


def morton_expr(x_col: str, y_col: str) -> F.Column:
    """32-bit Morton interleave of two 16-bit grid coordinates: x in
    the even bit positions, y in the odd — one row-local fold, no UDF."""
    return F.expr(
        f"aggregate(sequence(0, {GRID_BITS - 1}), 0L, (acc, i) -> acc"
        f" + shiftleft(cast(shiftright({x_col}, i) & 1 as bigint), 2 * i)"
        f" + shiftleft(cast(shiftright({y_col}, i) & 1 as bigint),"
        " 2 * i + 1))"
    )


def zorder_code(
    df: DataFrame,
    x_expr: str,
    y_expr: str,
    id_cols: tuple[str, ...] = ("event_id",),
) -> DataFrame:
    """Normalize two BIGINT dimension expressions onto the 16-bit grid
    (min/max from a one-row broadcast aggregate; integer multiply-
    divide, so the cell assignment is engine-exact) and attach the
    Morton code.  Null dimensions are dropped — a null has no position
    on the curve (documented guard, mirrored by the oracle).  Returns
    (*id_cols, x_u16, y_u16, zcode)."""
    src = df.select(
        *id_cols,
        F.expr(x_expr).cast("long").alias("xv"),
        F.expr(y_expr).cast("long").alias("yv"),
    ).filter("xv IS NOT NULL AND yv IS NOT NULL")
    bounds = src.agg(
        F.min("xv").alias("x_mn"),
        F.max("xv").alias("x_mx"),
        F.min("yv").alias("y_mn"),
        F.max("yv").alias("y_mx"),
    )

    def u16(v: str, mn: str, mx: str) -> str:
        # (v-mn)*GRID_MAX spans ≤ range*65535: safe in BIGINT for any
        # dimension range below 2^47 (epoch-micros ranges included).
        # The bound is ENFORCED, not just commented: a wider range
        # would overflow the multiply silently and emit wrong Morton
        # codes, so the grid projection raises instead (the guard
        # compares two broadcast scalars per row — negligible next to
        # the 16-step interleave fold).
        # The guard itself must not wrap: a mixed-sign range (mx ~ 2^62,
        # mn ~ -2^62) overflows mx - mn in BIGINT and a wrapped negative
        # difference would sail past the >= 2^47 test — so the range is
        # compared in DOUBLE, which cannot wrap (53-bit mantissa error
        # at 2^64 is ~2^11, noise against the 2^47 threshold).
        rng_d = f"(cast({mx} as double) - cast({mn} as double))"
        return (
            f"cast(CASE WHEN {rng_d} >= {float(1 << 47)!r} THEN "
            f"raise_error(concat('zorder_code: dimension range ', "
            f"cast({rng_d} as string), ' >= 2^47 would overflow "
            f"the 16-bit grid normalization — pre-divide the "
            f"dimension (e.g. micros -> seconds) before coding')) "
            f"WHEN {mx} > {mn} THEN "
            f"(({v} - {mn}) * {GRID_MAX}) div ({mx} - {mn}) "
            "ELSE 0 END as int)"
        )

    return (
        src.crossJoin(F.broadcast(bounds))
        .select(
            *id_cols,
            F.expr(u16("xv", "x_mn", "x_mx")).alias("x_u16"),
            F.expr(u16("yv", "y_mn", "y_mx")).alias("y_u16"),
        )
        .select(
            *id_cols,
            "x_u16",
            "y_u16",
            morton_expr("x_u16", "y_u16").alias("zcode"),
        )
    )


def bucket_stats(
    coded: DataFrame,
    n_buckets: int = 64,
    code_col: str = "zcode",
    code_span: int = CODE_SPAN,
) -> DataFrame:
    """Model the written layout: rows fall into ``n_buckets``
    fixed-width code ranges (the "files" a range-partitioned write
    would produce) and each bucket reports the min/max envelope of
    BOTH dimensions plus its row count — exactly the column statistics
    a scan planner prunes with.  Fixed-width bucketing, not ntile: a
    rank-based split is a global sort through one partition, the trap
    this engine bans; width splits are one map-side-combinable
    aggregation.  Returns (bucket, n_rows, x_min, x_max, y_min,
    y_max)."""
    return (
        coded.select(
            F.expr(
                f"cast(({code_col} * {n_buckets}) div {code_span} as int)"
            ).alias("bucket"),
            "x_u16",
            "y_u16",
        )
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.min("x_u16").alias("x_min"),
            F.max("x_u16").alias("x_max"),
            F.min("y_u16").alias("y_min"),
            F.max("y_u16").alias("y_max"),
        )
    )


def prune_report(
    coded: DataFrame,
    x_lo: int,
    x_hi: int,
    y_lo: int,
    y_hi: int,
    n_buckets: int = 64,
) -> DataFrame:
    """The layout's value MEASURED, not asserted: for one 2-D box
    predicate, how many "files" (fixed-width buckets) must a planner
    touch — and how many rows do the touched files hold — under the
    Z-ORDER layout vs a SINGLE-DIMENSION (x-sorted) layout of the same
    file count?  A file is touched when its (x,y) min/max envelope
    overlaps the box; rows_match is the exact answer either layout
    returns.  One row: (rows_total, rows_match, z_files,
    z_files_touched, z_rows_scanned, x_files, x_files_touched,
    x_rows_scanned, z_skip_micro, x_skip_micro) — skip = fraction of
    rows the layout's statistics let the scan avoid, in exact
    micro-units."""
    touched = (
        f"NOT (x_max < {x_lo} OR x_min > {x_hi} "
        f"OR y_max < {y_lo} OR y_min > {y_hi})"
    )

    def layout(stats: DataFrame, prefix: str) -> DataFrame:
        return stats.agg(
            F.count("*").cast("long").alias(f"{prefix}_files"),
            F.sum(F.expr(f"CASE WHEN {touched} THEN 1 ELSE 0 END"))
            .cast("long")
            .alias(f"{prefix}_files_touched"),
            F.sum(F.expr(f"CASE WHEN {touched} THEN n_rows ELSE 0 END"))
            .cast("long")
            .alias(f"{prefix}_rows_scanned"),
        )

    z_stats = layout(bucket_stats(coded, n_buckets), "z")
    # the single-dimension strawman: same file count, laid out by x
    # alone (bucket by x cell — what a plain ORDER BY x write gives)
    x_coded = coded.withColumn("xb_code", F.col("x_u16").cast("long"))
    x_stats = layout(
        bucket_stats(
            x_coded,
            n_buckets,
            code_col="xb_code",
            code_span=GRID_MAX + 1,
        ),
        "x",
    )
    totals = coded.agg(
        F.count("*").cast("long").alias("rows_total"),
        F.sum(
            F.expr(
                f"CASE WHEN x_u16 BETWEEN {x_lo} AND {x_hi} "
                f"AND y_u16 BETWEEN {y_lo} AND {y_hi} "
                "THEN 1 ELSE 0 END"
            )
        )
        .cast("long")
        .alias("rows_match"),
    )
    return (
        totals.crossJoin(F.broadcast(z_stats))
        .crossJoin(F.broadcast(x_stats))
        .select(
            "rows_total",
            "rows_match",
            "z_files",
            "z_files_touched",
            "z_rows_scanned",
            "x_files",
            "x_files_touched",
            "x_rows_scanned",
            F.expr(
                "((rows_total - z_rows_scanned) * 1000000)"
                " div rows_total"
            ).alias("z_skip_micro"),
            F.expr(
                "((rows_total - x_rows_scanned) * 1000000)"
                " div rows_total"
            ).alias("x_skip_micro"),
        )
    )


def zorder_repartition(
    df: DataFrame,
    x_expr: str,
    y_expr: str,
    num_files: int,
    id_cols: tuple[str, ...],
) -> DataFrame:
    """The actionable write path: range-partition the rows by Morton
    code (one range shuffle — Spark samples split points, so files
    carry ~equal row counts even on skewed curves) and sort within
    each partition, so every written file gets the tight two-dimension
    min/max envelope the report measures.  Join back to the full rows
    by id so callers lay out ANY schema, not just the coded columns.

    Null-dimension rows are RETAINED: ``zorder_code`` gives a null no
    position on the curve, so the join back is a LEFT join and a null
    code coalesces to −1 — below every real 32-bit code, so such rows
    range-partition into the curve's leading file(s) instead of
    silently vanishing from the written output (Delta's ``OPTIMIZE
    ZORDER BY`` likewise keeps null rows; losing them from a write
    path would be data loss)."""
    coded = zorder_code(df, x_expr, y_expr, id_cols=id_cols)
    keyed = df.join(
        coded.select(*id_cols, "zcode"), list(id_cols), "left"
    ).withColumn("zcode", F.expr("coalesce(zcode, -1L)"))
    return keyed.repartitionByRange(num_files, "zcode").sortWithinPartitions(
        "zcode"
    )
