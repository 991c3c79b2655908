"""Count-Min sketch over token frequencies — a MERGEABLE, fixed-size
frequency summary (Cormode & Muthukrishnan 2005) for the corpus-scale
question "how often does this token appear?" without materializing the
full vocabulary.

Why this shape at 100 TB: the sketch is ``depth × width`` counters —
KILOBYTES, independent of corpus size — built by one map-side-combined
aggregation per depth row, additive under union (merge = cell-wise sum,
so per-batch sketches fold into a persisted table with plain appends),
and its estimate is min-over-depth of the probed cells: always an
OVERESTIMATE, never under (the property test pins this one-sided error).
Unlike the usual implementation-defined hash mix, cells are placed by
``md5(d ':' token)`` — deterministic and engine-portable, so every
entry here is EXACT-value oracle-checked against DuckDB (the sketch is
approximate w.r.t. truth, but bit-reproducible w.r.t. itself).

No counterpart in the reference (single-file pandas DAG,
``dags/dag_btc_daily.py`` has no sketch surface); this extends the
approx family (``approx_hll_users_rollup``) with a custom mergeable
sketch the brief's training-data pipeline needs for heavy-hitter and
stopword-budget decisions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airflow_crypto_btc_spark.functions.hashing import (
    hex8_to_bigint_sql,
    tokens_expr,
)


def _cell_expr(d: int, token_col: str, width: int) -> str:
    h = hex8_to_bigint_sql(f"md5(concat('{d}:', {token_col}))")
    return f"({h} % {width})"


def cms_build(
    docs: DataFrame,
    depth: int = 4,
    width: int = 256,
    text_col: str = "text",
) -> DataFrame:
    """Build the sketch: one token explode, then for each of ``depth``
    hash rows a (d, w) cell count — a single groupBy over (d, w) keys
    whose cardinality is ≤ depth × width regardless of corpus size, so
    partial aggregation collapses everything map-side and the exchange
    carries at most depth × width × #tasks rows.  Zero cells are not
    materialized (absent = 0, exactly as the estimate treats them).
    Returns (d, w, cnt)."""
    toks = docs.select(
        F.explode(tokens_expr(text_col)).alias("token")
    )
    # ONE pass: per token, the depth cell indexes as an array, then a
    # posexplode — not a union of per-depth branches, which would
    # recompute the token explode depth times
    cells = toks.select(
        F.posexplode(
            F.array(
                *[
                    F.expr(_cell_expr(d, "token", width))
                    for d in range(depth)
                ]
            )
        ).alias("d", "w")
    )
    return cells.groupBy(
        F.col("d").cast("long").alias("d"), "w"
    ).agg(F.count("*").cast("long").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    depth: int = 4,
    width: int = 256,
    token_col: str = "token",
) -> DataFrame:
    """Point-frequency estimates for ``probes`` (one ``token`` per row):
    hash each probe into its ``depth`` cells, look the cells up in the
    sketch, and take the MIN across depth rows (missing cell = 0).
    The sketch side is depth × width rows — broadcast; probes never
    shuffle wide.  Returns (token, est) with the CM guarantee
    est ≥ true_count."""
    cells = probes.select(
        F.col(token_col).alias("token"),
        F.posexplode(
            F.array(
                *[
                    F.expr(_cell_expr(d, token_col, width))
                    for d in range(depth)
                ]
            )
        ).alias("d", "w"),
    ).withColumn("d", F.col("d").cast("long"))
    looked = cells.join(F.broadcast(sketch), ["d", "w"], "left").select(
        "token",
        "d",
        F.coalesce("cnt", F.lit(0)).cast("long").alias("cell_cnt"),
    )
    return looked.groupBy("token").agg(
        F.min("cell_cnt").cast("long").alias("est")
    )


def cms_from_table(
    spark: SparkSession, sketch_table: str
) -> DataFrame:
    """The merged sketch served from its snapshot table: per-batch
    partial sketches fold by cell-wise SUM (CM sketches are additive
    under union), so the serve-time view is one bounded aggregation
    over ≤ depth × width × #commits skinny rows — compaction collapses
    the history without changing any estimate."""
    from airflow_crypto_btc_spark.sources.snapshot_table import (
        read_snapshot,
    )

    return (
        read_snapshot(spark, sketch_table)
        .groupBy("d", "w")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )
