"""Trainable-quality-probe registry: distributed full-batch gradient
descent whose DuckDB oracle replays the ENTIRE training run bit-for-bit.

The reference (`/root/reference/dags/dag_btc_daily.py`) has no trainable
surface; this extends the curation family with the model-based quality
filter a pretraining pipeline runs at ingest (CCNet / GPT-3-style
classifier gates).  Everything past the initial feature quantization is
integer micro-unit arithmetic — the link function is the RATIONAL fast
sigmoid, every rounding division is half-away-from-zero with the sign
split out front — so the oracle below is not a tolerance check but an
exact replay (see operators/probe.py for the arithmetic contract).

The oracle CTE chain is GENERATED per iteration, like the k-means /
PQ training oracles in registry_ml.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_crypto_btc_spark.plans.registry import QuerySpec
from airflow_crypto_btc_spark.sources.tables import load_table

_ITERATIONS = 6
_LR_NUM = 4
_LR_DEN = 1
_POSITIVE_MIN = 5

# ------------------------------------------------------------------ oracle

# DuckDB integer fast-sigmoid in micro-units (z is the pico-unit margin);
# the 500000·|z| product goes through HUGEINT — it can exceed int64.
_D_SIG = (
    "(500000 + (CASE WHEN {z} < 0 THEN -1 ELSE 1 END)"
    " * CAST((2 * 500000 * CAST(abs({z}) AS HUGEINT)"
    "         + (1000000000000 + abs({z})))"
    "        // (2 * (1000000000000 + CAST(abs({z}) AS HUGEINT)))"
    "   AS BIGINT))"
)

# pico-unit margin of row x against weight list w (1-based list indexing)
_D_Z = (
    "CAST(list_sum(list_transform(range(1, len({x})+1),"
    " j -> {x}[j] * {w}[j])) AS BIGINT)"
)


def _probe_ctes(
    iterations: int = _ITERATIONS,
    lr_num: int = _LR_NUM,
    lr_den: int = _LR_DEN,
    positive_min: int = _POSITIVE_MIN,
    train_where: str = "TRUE",
) -> str:
    """x + tr + w0 + ``iterations`` GD rounds; final weights in
    w{iterations}.  Mirrors operators/probe.quality_probe_train step for
    step: quantize → margin → rational sigmoid → integer error →
    exact gradient sum → half-away micro-unit update.  ``train_where``
    restricts the rows gradient descent sees (holdout evaluation) —
    scoring CTEs still read the full ``x``."""
    parts = [
        f"""
    x AS (
      SELECT vec_id AS nid,
        list_prepend(CAST(1000000 AS BIGINT),
          list_transform(embedding, e ->
            CAST(FLOOR(CAST(e AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)))
          AS xqa,
        CAST(CASE WHEN label >= {positive_min} THEN 1000000 ELSE 0 END
             AS BIGINT) AS y
      FROM embeddings
    ),
    tr AS (SELECT * FROM x WHERE {train_where}),
    w0 AS (
      SELECT list_transform(xqa, x -> CAST(0 AS BIGINT)) AS warr
      FROM tr LIMIT 1
    )"""
    ]
    for i in range(1, iterations + 1):
        z = _D_Z.format(x="x.xqa", w="w.warr")
        parts.append(f"""
    e{i} AS (
      SELECT nid, xqa, ({_D_SIG.format(z="z")}) - y AS err
      FROM (SELECT x.nid, x.xqa, x.y, {z} AS z
            FROM tr x, w{i - 1} w)
    ),
    g{i} AS (
      SELECT pos, SUM(err * xv) AS g, COUNT(*) AS n
      FROM (SELECT err, unnest(range(1, len(xqa)+1)) AS pos,
                   unnest(xqa) AS xv FROM e{i})
      GROUP BY pos
    ),
    d{i} AS (
      SELECT list(d ORDER BY pos) AS darr FROM (
        SELECT pos, (CASE WHEN g < 0 THEN -1 ELSE 1 END)
          * CAST((2 * {lr_num} * abs(g)
                  + ({lr_den} * 1000000 * n))
                 // (2 * ({lr_den} * 1000000 * n)) AS BIGINT) AS d
        FROM g{i})
    ),
    w{i} AS (
      SELECT list_transform(range(1, len(w.warr)+1),
                            j -> w.warr[j] - d.darr[j]) AS warr
      FROM w{i - 1} w, d{i} d
    )""")
    return ",".join(parts)


def _probe_scores_sql(iterations: int = _ITERATIONS) -> str:
    z = _D_Z.format(x="x.xqa", w="w.warr")
    return f"""
    WITH {_probe_ctes(iterations)},
    sc AS (
      SELECT nid, y, ({_D_SIG.format(z="z")}) AS score_micro
      FROM (SELECT x.nid, x.y, {z} AS z
            FROM x, w{iterations} w)
    )
    SELECT nid AS vec_id,
      CAST(CASE WHEN y = 1000000 THEN 1 ELSE 0 END AS INT) AS y_true,
      score_micro,
      CAST(score_micro >= 500000 AS INT) AS pred,
      CAST((score_micro >= 500000) = (y = 1000000) AS INT) AS correct
    FROM sc
"""


def _probe_eval_sql(
    iterations: int = _ITERATIONS,
    train_where: str = "TRUE",
    score_where: str = "TRUE",
) -> str:
    z = _D_Z.format(x="x.xqa", w="w.warr")
    return f"""
    WITH {_probe_ctes(iterations, train_where=train_where)},
    sc AS (
      SELECT nid, y, ({_D_SIG.format(z="z")}) AS score_micro
      FROM (SELECT x.nid, x.y, {z} AS z
            FROM x, w{iterations} w
            WHERE {score_where})
    ),
    cls AS (
      SELECT CAST(CASE WHEN y = 1000000 THEN 1 ELSE 0 END AS INT)
               AS y_true,
             CAST(score_micro >= 500000 AS INT) AS pred
      FROM sc
    ),
    tot AS (SELECT COUNT(*) AS n_total FROM cls)
    SELECT y_true, pred, COUNT(*) AS n,
      ((2 * COUNT(*) * 1000000 + t.n_total)
       // (2 * t.n_total) / 1000000.0) AS share
    FROM cls, tot t
    GROUP BY y_true, pred, t.n_total
"""


_SQL_CURATE_QUALITY_PROBE = _probe_scores_sql()
_SQL_CURATE_PROBE_EVAL = _probe_eval_sql()

# holdout: train on 4/5 of the corpus (vec_id mod 5 < 4), evaluate on
# the held-out fifth the optimizer never saw
_TRAIN_WHERE = "nid % 5 < 4"
_SCORE_WHERE = "nid % 5 = 4"
_SQL_CURATE_PROBE_HOLDOUT = _probe_eval_sql(
    train_where=_TRAIN_WHERE, score_where=_SCORE_WHERE
)

# ----------------------------------------------------------------- queries


def q_curate_quality_probe(spark, sf_dir):
    """Model-based quality scores: train the linear probe on the labeled
    embedding corpus (6 full-batch GD iterations — six linear scans, the
    only exchanges dim+1-group gradient aggregations) and score every
    vector.  The oracle replays training exactly; at this fixture the
    probe reaches ~0.64 accuracy, within half a point of the closed-form
    ridge ceiling for this (deliberately noisy) target."""
    from airflow_crypto_btc_spark.operators.probe import (
        quality_probe_scores,
        quality_probe_train,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    w = quality_probe_train(
        emb,
        iterations=_ITERATIONS,
        lr_num=_LR_NUM,
        lr_den=_LR_DEN,
        positive_min=_POSITIVE_MIN,
    )
    return quality_probe_scores(
        emb, w, positive_min=_POSITIVE_MIN
    ).orderBy("vec_id")


def q_curate_probe_eval(spark, sf_dir):
    """Confusion-matrix rollup of the probe run — the per-cell counts
    and exact micro-unit corpus shares a curation job logs next to its
    gates."""
    from airflow_crypto_btc_spark.operators.probe import (
        quality_probe_eval,
        quality_probe_scores,
        quality_probe_train,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    w = quality_probe_train(
        emb,
        iterations=_ITERATIONS,
        lr_num=_LR_NUM,
        lr_den=_LR_DEN,
        positive_min=_POSITIVE_MIN,
    )
    return quality_probe_eval(
        quality_probe_scores(emb, w, positive_min=_POSITIVE_MIN)
    )


def q_curate_probe_holdout(spark, sf_dir):
    """Held-out evaluation — the honest generalization measurement: the
    probe trains on 4/5 of the corpus (``vec_id % 5 < 4``) and the
    confusion rollup covers ONLY the held-out fifth the optimizer never
    saw.  The in-sample eval (``curate_probe_eval``) bounds what the
    model memorized; this bounds what it learned."""
    from airflow_crypto_btc_spark.operators.probe import (
        quality_probe_eval,
        quality_probe_scores,
        quality_probe_train,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    w = quality_probe_train(
        emb.filter("vec_id % 5 < 4"),
        iterations=_ITERATIONS,
        lr_num=_LR_NUM,
        lr_den=_LR_DEN,
        positive_min=_POSITIVE_MIN,
    )
    return quality_probe_eval(
        quality_probe_scores(
            emb.filter("vec_id % 5 = 4"), w, positive_min=_POSITIVE_MIN
        )
    )


def _probe_model_zone(spark, sf_dir):
    """Landing-zone build of the persisted probe model — one training
    run per fixture version, shared by the from-model entry.  Returns
    (zone_path, source_version)."""
    import os

    from airflow_crypto_btc_spark.operators.probe import build_probe_model
    from airflow_crypto_btc_spark.plans.registry_more import _landing_zone

    emb = load_table(spark, sf_dir, "embeddings")
    stat = os.stat(os.path.join(sf_dir, "embeddings.parquet"))
    source_version = f"embeddings@{stat.st_size}_{stat.st_mtime_ns}"

    def _land(staging: str) -> None:
        build_probe_model(
            spark,
            emb,
            os.path.join(staging, "weights"),
            source_version=source_version,
            iterations=_ITERATIONS,
            lr_num=_LR_NUM,
            lr_den=_LR_DEN,
            positive_min=_POSITIVE_MIN,
        )

    return (
        _landing_zone(sf_dir, "embeddings", "probe_model", _land),
        source_version,
    )


def q_curate_probe_from_model(spark, sf_dir):
    """Quality scores served from the PERSISTED probe: weights are
    trained once per fixture version into a snapshot table and scoring
    is one broadcast cross join + a row-local integer expression — the
    exchange-free ingest-gate scan.  Oracle = the inline train+score
    SQL: on the model's own corpus the persisted round-trip must be
    bit-identical (the whole pipeline is integer arithmetic)."""
    import os

    from airflow_crypto_btc_spark.operators.probe import (
        quality_probe_scores_from_model,
    )

    zone, source_version = _probe_model_zone(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    return quality_probe_scores_from_model(
        spark,
        emb,
        os.path.join(zone, "weights"),
        expect_source=source_version,
    ).orderBy("vec_id")


PROBE_REGISTRY: dict[str, QuerySpec] = {
    "curate_quality_probe": QuerySpec(
        q_curate_quality_probe, _SQL_CURATE_QUALITY_PROBE
    ),
    "curate_probe_eval": QuerySpec(
        q_curate_probe_eval, _SQL_CURATE_PROBE_EVAL
    ),
    "curate_probe_holdout": QuerySpec(
        q_curate_probe_holdout, _SQL_CURATE_PROBE_HOLDOUT
    ),
    # oracle = the inline entry's SQL: frozen-model serving on the
    # model's own corpus must reproduce the training-run scores exactly
    "curate_probe_from_model": QuerySpec(
        q_curate_probe_from_model, _SQL_CURATE_QUALITY_PROBE
    ),
}


def q_curate_probe_calibration(spark, sf_dir):
    """Calibration table for the trained probe: fixed-width score
    buckets vs empirical positive rate — whether "score 0.7" MEANS
    70 % positive.  Fixed buckets, not ntile (a rank-based decile is a
    global sort through one partition); one map-side-combined
    aggregation, exact integer rates."""
    from airflow_crypto_btc_spark.operators.probe import (
        quality_probe_calibration,
        quality_probe_scores,
        quality_probe_train,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    w = quality_probe_train(
        emb,
        iterations=_ITERATIONS,
        lr_num=_LR_NUM,
        lr_den=_LR_DEN,
        positive_min=_POSITIVE_MIN,
    )
    return quality_probe_calibration(
        quality_probe_scores(emb, w, positive_min=_POSITIVE_MIN)
    )


def _probe_calibration_sql(iterations: int = _ITERATIONS) -> str:
    z = _D_Z.format(x="x.xqa", w="w.warr")
    return f"""
    WITH {_probe_ctes(iterations)},
    sc AS (
      SELECT nid, y, ({_D_SIG.format(z="z")}) AS score_micro
      FROM (SELECT x.nid, x.y, {z} AS z
            FROM x, w{iterations} w)
    ),
    cls AS (
      SELECT CASE WHEN y = 1000000 THEN 1 ELSE 0 END AS y_true,
             score_micro
      FROM sc
    )
    SELECT CAST(least(score_micro // 100000, 9) AS BIGINT) AS bucket,
           COUNT(*) AS n,
           CAST(SUM(y_true) AS BIGINT) AS n_pos,
           ((2 * CAST(SUM(y_true) AS BIGINT) * 1000000 + COUNT(*))
            // (2 * COUNT(*)) / 1000000.0) AS pos_rate
    FROM cls
    GROUP BY 1
"""


PROBE_REGISTRY["curate_probe_calibration"] = QuerySpec(
    q_curate_probe_calibration, _probe_calibration_sql()
)
