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

from pyspark.sql import DataFrame, SparkSession, Window
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
    over ≤ depth × width × #commits skinny rows —
    ``sketch_stream.cms_merge`` collapses the row history (and file
    ``compact`` the part count) without changing any estimate."""
    from airflow_crypto_btc_spark.sources.snapshot_table import (
        read_snapshot,
    )

    return (
        read_snapshot(spark, sketch_table)
        .groupBy("d", "w")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


# HLL bias-correction constants (Flajolet et al. 2007) per register count.
_HLL_ALPHA = {16: 0.673, 32: 0.697, 64: 0.709}


def _hll_pieces(key_expr: str, m: int) -> tuple[str, str]:
    """(bucket, rho) SQL over a 32-bit md5 prefix of ``key_expr``:
    bucket = low log2(m) bits; rho = 1 + leading zeros of the remaining
    (32 − log2(m))-bit suffix, computed EXACTLY from the binary-string
    length (``bin()`` prints identically in Spark and DuckDB) — no
    float log2 anywhere."""
    import math

    b = int(math.log2(m))
    assert 2**b == m, "m must be a power of two"
    width = 32 - b
    h = hex8_to_bigint_sql(f"md5({key_expr})")
    bucket = f"({h} % {m})"
    v = f"({h} div {m})"
    rho = (
        f"(CASE WHEN {v} = 0 THEN {width + 1}"
        f" ELSE {width + 1} - length(bin({v})) END)"
    )
    return bucket, rho


def hll_registers(
    docs: DataFrame,
    m: int = 16,
    key_expr: str | None = None,
    text_col: str = "text",
) -> DataFrame:
    """HyperLogLog registers over a key expression (default: the
    normalized-content digest — "how many DISTINCT documents", the
    dedup-aware cardinality).  One aggregation with ≤``m`` output rows;
    registers are pure integer arithmetic on portable md5 bits, so the
    sketch — like the CM sketch — is bit-reproducible across engines
    and MERGEABLE (union = per-bucket max).  Returns (bucket, register).
    """
    from airflow_crypto_btc_spark.operators.dedup import NORMALIZED_TEXT

    if key_expr is None:
        key_expr = f"md5({NORMALIZED_TEXT.format(col=text_col)})"
    bucket, rho = _hll_pieces(key_expr, m)
    return (
        docs.select(
            F.expr(bucket).cast("long").alias("bucket"),
            F.expr(rho).cast("long").alias("rho"),
        )
        .groupBy("bucket")
        .agg(F.max("rho").cast("long").alias("register"))
    )


def hll_estimate(registers: DataFrame, m: int = 16) -> DataFrame:
    """The raw HLL cardinality estimate from a registers frame: one row
    (m, est).  Absent buckets count as register 0.  The power sums are
    exact binary doubles (powers of two), so the only rounding is the
    final round-6 on a deterministically-computed double — cross-engine
    safe without micro-units.  The small-range (linear counting) branch
    is deliberately NOT implemented: callers sketch key spaces whose
    cardinality exceeds 2.5·m (the registry entry sketches document
    digests, ≥500 at every scale factor against m=16) — for tiny key
    spaces use exact ``count(distinct ...)``, not a sketch."""
    alpha = _HLL_ALPHA[m]
    spark = registers.sparkSession
    full = spark.range(m).select(F.col("id").alias("bucket"))
    filled = full.join(registers, "bucket", "left").select(
        F.coalesce("register", F.lit(0)).alias("register")
    )
    return filled.agg(
        F.lit(m).cast("long").alias("m"),
        F.round(
            F.lit(alpha * m * m)
            / F.sum(F.expr("power(2.0, -register)")),
            6,
        ).alias("est"),
    )


def hll_from_table(
    spark: SparkSession, registers_table: str
) -> DataFrame:
    """The merged HLL served from its snapshot table: per-batch partial
    register sets fold by per-bucket MAX (the HLL merge), one bounded
    aggregation over ≤ m × #commits skinny rows."""
    from airflow_crypto_btc_spark.sources.snapshot_table import (
        read_snapshot,
    )

    return (
        read_snapshot(spark, registers_table)
        .groupBy("bucket")
        .agg(F.max("register").cast("long").alias("register"))
    )


# ------------------------------------- bounded-domain quantile registers


#: fixed grid for the events.value metric: [0, 1024) in 512 buckets of
#: exactly 2.0 (2_000_000 micro-units) — fixed and DATA-INDEPENDENT,
#: which is what makes the registers mergeable (cell-wise sum) across
#: partitions, batches, and days; out-of-range values clamp to the edge
#: buckets (documented bounded-domain trade — the Prometheus histogram
#: contract, where bucket bounds are configuration, not statistics)
QHIST_LO_MICRO = 0
QHIST_HI_MICRO = 1_024_000_000
QHIST_BUCKETS = 512


def qhist_registers(
    df: DataFrame,
    value_col: str = "value",
    lo_micro: int = QHIST_LO_MICRO,
    hi_micro: int = QHIST_HI_MICRO,
    n_buckets: int = QHIST_BUCKETS,
) -> DataFrame:
    """Quantile-sketch registers: per-bucket counts over the FIXED
    integer grid — the third register sketch beside CM (counts) and HLL
    (cardinality), completing the triad a 100 TB metrics pipeline
    maintains.  One map-side-combinable aggregation over ≤n_buckets
    keys; values go through the decimal(38,6) cast (the deterministic
    double→6-dp rounding both engines share) so bucket assignment can
    never split at a float boundary.  Returns (bucket, cnt)."""
    width = (hi_micro - lo_micro) // n_buckets
    if width * n_buckets != hi_micro - lo_micro:
        raise ValueError("grid must divide evenly into buckets")
    v = (
        f"cast(cast({value_col} as decimal(38,6)) * 1000000 as bigint)"
    )
    bucket = (
        f"least({n_buckets - 1}L, greatest(0L, "
        f"({v} - {lo_micro}) div {width}))"
    )
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(F.expr(bucket).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def qhist_quantile(
    registers: DataFrame,
    probs_micro: tuple[int, ...] = (500_000, 900_000, 990_000),
    lo_micro: int = QHIST_LO_MICRO,
    hi_micro: int = QHIST_HI_MICRO,
    n_buckets: int = QHIST_BUCKETS,
) -> DataFrame:
    """Serve quantile estimates from the registers — the
    ``histogram_quantile`` evaluation: cumulative counts over the
    bucket order (a ≤n_buckets-row frame — bounded single partition,
    the vocab-cut precedent), pick the first bucket whose cumulative
    count reaches ``ceil(p·total)``, and linearly interpolate WITHIN
    the bucket by rank — all in exact integer micro-units, no float an
    engine could round differently.  Returns (p_micro, est_micro,
    n_total)."""
    width = (hi_micro - lo_micro) // n_buckets
    spark = registers.sparkSession
    # cum over the bounded register frame (≤n_buckets rows)
    w = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = registers.select(
        "bucket", "cnt", F.sum("cnt").over(w).cast("long").alias("cum")
    )
    total = registers.agg(F.sum("cnt").cast("long").alias("n_total"))
    probs = spark.createDataFrame(
        [(int(p),) for p in probs_micro], "p_micro long"
    )
    need = "cast((p_micro * n_total + 999999) div 1000000 as bigint)"
    return (
        cum.crossJoin(F.broadcast(probs.crossJoin(total)))
        .filter(
            F.expr(f"cum >= {need} AND cum - cnt < {need}")
        )
        .select(
            "p_micro",
            F.expr(
                f"{lo_micro} + bucket * {width} + "
                f"(({need} - (cum - cnt)) * {width}) div cnt"
            ).alias("est_micro"),
            "n_total",
        )
    )


def qhist_from_table(
    spark: SparkSession, registers_table: str
) -> DataFrame:
    """Fold the per-batch register history into the merged sketch —
    cell-wise sum, the additivity the streaming maintainer relies on."""
    from airflow_crypto_btc_spark.sources.snapshot_table import (
        read_snapshot,
    )

    return (
        read_snapshot(spark, registers_table)
        .groupBy("bucket")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


# --------------------------------------------- KMV / theta sketch

#: the 32-bit hash space KMV samples from — ``h32`` is uniform in
#: [0, KMV_SPACE) by construction (md5 prefix), so a sketch's k-th
#: minimum is an order statistic of a uniform sample
KMV_SPACE = 1 << 32


def kmv_sketch(
    df: DataFrame,
    key_expr: str,
    group_cols: list[str],
    k: int = 32,
    fanout: int = 32,
) -> DataFrame:
    """K-minimum-values (theta) sketch per group: the ``k`` smallest
    32-bit md5 hashes over the DISTINCT keys — the FOURTH register
    sketch beside CM (counts), HLL (cardinality), and the quantile
    histogram, and the only one of the four whose sketches support SET
    OPERATIONS (Beyer et al. 2007; the Datasketches theta family):
    union = k smallest of the concatenated sketches, and intersection
    estimates fall out of :func:`kmv_theta_ops` — HLL registers cannot
    intersect without inclusion–exclusion blowup.

    Scale shape: one map-side-combined ``distinct`` over (group, h32),
    then TWO bounded window passes — the first partitions by (group,
    h32 % fanout) so no single task ever sorts a whole group's distinct
    hash set (the per-group k-min is a skew hazard: 'one giant group'
    is the common case for a global sketch), the second ranks the
    ≤ fanout·k survivors per group.  Output is ≤ k rows per group:
    (group…, pos, h32), pos = 1-based rank.  Deterministic and
    engine-portable: distinct h32 values order totally, md5 agrees
    bit-for-bit across engines (functions/hashing.py).

    No counterpart in the reference (dags/dag_btc_daily.py has no
    sketch surface); extends the approx family per the brief's
    training-pipeline mandate (shard-mergeable audience overlap)."""
    h = hex8_to_bigint_sql(f"md5({key_expr})")
    g = list(group_cols)
    d = (
        df.select(*g, F.expr(h).cast("long").alias("h32"))
        # a NULL key hashes to NULL, which Spark's ascending sort
        # places FIRST (pos 1, evicting a true minimum) while DuckDB
        # sorts it LAST — exclude NULL keys from the sketch outright
        # (cardinality of NULL is not a meaningful question here); the
        # oracle SQLs carry the equivalent pre-hash key-null guard
        # (key IS NOT NULL ⇔ h32 IS NOT NULL: md5 nulls only on NULL)
        .filter(F.col("h32").isNotNull())
        .distinct()
    )
    w1 = Window.partitionBy(*g, "__salt").orderBy("h32")
    cand = (
        d.withColumn("__salt", F.expr(f"h32 % {fanout}"))
        .withColumn("__rn", F.row_number().over(w1))
        .filter(F.col("__rn") <= k)
        .drop("__salt", "__rn")
    )
    w2 = Window.partitionBy(*g).orderBy("h32")
    return (
        cand.withColumn(
            "pos", F.row_number().over(w2).cast("long")
        )
        .filter(F.col("pos") <= k)
        .select(*g, "pos", "h32")
    )


def kmv_estimate(
    sketch: DataFrame, group_cols: list[str], k: int = 32
) -> DataFrame:
    """Distinct-count estimate from a KMV sketch: the unbiased
    (k−1)/U_(k) estimator on the k-th minimum as a uniform order
    statistic — ``est = (k−1) · 2^32 / h_(k)``.  A group with fewer
    than ``k`` distinct hashes IS its own sketch, so the estimate is
    the exact count.  One aggregation over ≤ k rows per group; returns
    (group…, n_sketch, kth, est) with the round-6 double convention."""
    g = list(group_cols)
    return sketch.groupBy(*g).agg(
        F.count("*").cast("long").alias("n_sketch"),
        F.max("h32").alias("kth"),
    ).select(
        *g,
        "n_sketch",
        "kth",
        F.when(
            F.col("n_sketch") < k,
            F.col("n_sketch").cast("double"),
        )
        .otherwise(
            F.round(
                F.lit(float(k - 1) * float(KMV_SPACE))
                / F.col("kth"),
                6,
            )
        )
        .alias("est"),
    )


def kmv_theta_ops(
    sketch: DataFrame,
    k: int,
    side_col: str = "side",
    a: str = "a",
    b: str = "b",
) -> DataFrame:
    """Theta-sketch SET OPERATIONS over a two-sided KMV sketch frame
    (``side_col`` ∈ {a, b}): θ = min over sides of (k-th minimum, or
    2^32 for a side whose whole set fit in the sketch); every retained
    hash below θ is a uniform sample of the key space at rate θ/2^32,
    so ``est = |candidates| · 2^32 / θ`` for both the intersection
    (hashes in BOTH sketches) and the union.  When both sides fit in
    their sketches, θ = 2^32 and both estimates are EXACT — the sketch
    degrades gracefully into the true set (test-pinned).

    Everything downstream of the sketches touches ≤ 2k rows: one
    conditional aggregate for the per-side stats, a semi-join and a
    distinct-union for the candidates, one crossJoin of single-row
    frames.  The sketch is localCheckpoint'd first — stats, sides, and
    candidates all branch from it, and without the cut each branch
    would re-run the base-data distinct+k-min lineage (the expensive
    part) once more.  Returns one row: (n_a, n_b, theta, n_cand,
    n_union_cand, est_inter, est_union)."""
    sketch = sketch.localCheckpoint(eager=False)
    sa = sketch.filter(F.col(side_col) == a).select("h32")
    sb = sketch.filter(F.col(side_col) == b).select("h32")
    stats = sketch.agg(
        F.count(F.when(F.col(side_col) == a, True))
        .cast("long")
        .alias("n_a"),
        F.count(F.when(F.col(side_col) == b, True))
        .cast("long")
        .alias("n_b"),
        F.max(F.when(F.col(side_col) == a, F.col("h32"))).alias(
            "mx_a"
        ),
        F.max(F.when(F.col(side_col) == b, F.col("h32"))).alias(
            "mx_b"
        ),
    ).select(
        "n_a",
        "n_b",
        F.least(
            F.when(F.col("n_a") < k, F.lit(KMV_SPACE)).otherwise(
                F.col("mx_a")
            ),
            F.when(F.col("n_b") < k, F.lit(KMV_SPACE)).otherwise(
                F.col("mx_b")
            ),
        ).alias("theta"),
    )
    ix = sa.join(sb, "h32", "left_semi")
    un = sa.unionByName(sb).distinct()
    n_cand = (
        ix.crossJoin(F.broadcast(stats.select("theta")))
        .filter(F.col("h32") < F.col("theta"))
        .agg(F.count("*").cast("long").alias("n_cand"))
    )
    n_union = (
        un.crossJoin(F.broadcast(stats.select("theta")))
        .filter(F.col("h32") < F.col("theta"))
        .agg(F.count("*").cast("long").alias("n_union_cand"))
    )
    return (
        stats.crossJoin(n_cand)
        .crossJoin(n_union)
        .select(
            "n_a",
            "n_b",
            "theta",
            "n_cand",
            "n_union_cand",
            F.round(
                F.col("n_cand") * F.lit(float(KMV_SPACE))
                / F.col("theta"),
                6,
            ).alias("est_inter"),
            F.round(
                F.col("n_union_cand") * F.lit(float(KMV_SPACE))
                / F.col("theta"),
                6,
            ).alias("est_union"),
        )
    )


def kmv_from_table(
    spark: SparkSession,
    sketch_table: str,
    group_cols: list[str],
    k: int = 32,
) -> DataFrame:
    """Serve the merged KMV sketch from its snapshot table: the theta
    UNION — distinct (group, h32) over every committed per-batch
    partial sketch, then the k smallest again (k-min of a union of
    k-mins equals the k-min of the union; test-pinned in
    tests/test_sketch.py).  The history is ≤ k rows per (group, batch)
    — bounded and skinny — so one window pass per group suffices on
    the serve path; the salted two-phase lives in :func:`kmv_sketch`
    where the base data is unbounded."""
    from airflow_crypto_btc_spark.sources.snapshot_table import (
        read_snapshot,
    )

    g = list(group_cols)
    hist = (
        read_snapshot(spark, sketch_table)
        .select(*g, "h32")
        # self-healing: a sketch table written before kmv_sketch's
        # NULL-key exclusion may still hold a (group, NULL) row, which
        # would sort to pos 1 and evict a true minimum — enforce the
        # no-NULL invariant on the serve path too
        .filter(F.col("h32").isNotNull())
        .distinct()
    )
    w = Window.partitionBy(*g).orderBy("h32")
    return (
        hist.withColumn(
            "pos", F.row_number().over(w).cast("long")
        )
        .filter(F.col("pos") <= k)
        .select(*g, "pos", "h32")
    )
