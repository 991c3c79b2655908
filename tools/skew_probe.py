"""Semantic-index skew stress probe — the round-12 verdict's stretch
item: turn the build-time skew WARNING (>20% of the corpus in one
cluster) into a measured guarantee that ``max_cluster_size`` keeps the
probe path sub-quadratic on exactly the corpus shape that triggers it.

Fixture: a deterministic skewed embedding table — 95% of the vectors
pile into ONE semantic cluster (boilerplate), the rest spread over 9
clusters — at N and 10N.  An uncapped purge pairs the hot cluster with
itself: 10x rows → ~100x candidate pairs (quadratic).  The capped
purge skips the oversized cluster whole (members keep=true, the skip
accountable via ``semantic_purge_skipped_clusters``), so its cost is
the assignment scan plus the small clusters' bounded pairs — ~linear.

Output: JSON lines (shape, n, wall_s) — the 10N/N wall ratio for the
capped path is the SCALING.md row; quadratic would read ~100x.

Usage: python tools/skew_probe.py [N] (default 5000; also runs 10N)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from airflow_crypto_btc_spark.operators.similarity import (  # noqa: E402
    semantic_purge,
)
from airflow_crypto_btc_spark.session import get_spark  # noqa: E402

DIM = 32
CAP = 200


def skewed_frame(spark, n: int):
    """95% of rows jittered around one anchor (the hot cluster), 5%
    spread over 9 other anchors; ids 0..9 are the anchors themselves so
    ``centroid_filter='vec_id < 10'`` seeds the quantizer."""
    rng = np.random.default_rng(13)
    anchors = rng.normal(size=(10, DIM))
    anchors /= np.linalg.norm(anchors, axis=1, keepdims=True)
    owner = np.where(rng.random(n) < 0.95, 0, rng.integers(1, 10, n))
    owner[:10] = np.arange(10)  # anchors present as their own ids
    v = anchors[owner] + rng.normal(scale=0.05, size=(n, DIM))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return spark.createDataFrame(
        [(i, v[i].tolist()) for i in range(n)],
        "vec_id long, embedding array<double>",
    )


def run(spark, n: int, capped: bool) -> float:
    from pyspark.sql import functions as F

    df = skewed_frame(spark, n).localCheckpoint()  # gen cost untimed
    t0 = time.time()
    out = semantic_purge(
        df,
        centroid_filter="vec_id < 10",
        cosine_threshold=0.95,
        max_cluster_size=CAP if capped else None,
    )
    # aggregate over dup_of, NOT count(*): a bare count lets Catalyst
    # eliminate the cardinality-preserving left join entirely and the
    # quadratic pair work would never run (measured: uncapped "cost"
    # DECREASING in n before this fix)
    row = out.agg(
        F.count("*").alias("n"), F.count("dup_of").alias("dups")
    ).collect()[0]
    wall = time.time() - t0
    assert row["n"] == n
    return wall


if __name__ == "__main__":
    base = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    spark = get_spark()
    for n, shapes in ((base, ("uncapped", "capped")),
                      (base * 10, ("capped",))):
        for shape in shapes:
            w = run(spark, n, capped=(shape == "capped"))
            print(json.dumps(
                {"shape": shape, "n": n, "cap": CAP, "wall_s": round(w, 2)}
            ))
