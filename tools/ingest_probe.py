"""Maintainer-INGEST probe: per-batch fold wall-time under a CONSTANT
batch size while the pre-existing corpus/state size varies 10x.

The round-11 verdict: SCALING.md measures maintainer SERVE costs but
the blast-radius claim for the INGEST side (a fold's work is bounded by
the batch, not the accumulated state) was asserted from the plan shape,
never measured.  This probe measures it directly for the two newest
maintainers:

- ``bm25_index_sink``: seed the index with the corpus minus a held-out
  probe set (one bulk fold), then feed 3 batches of EXACTLY 10 docs
  each and time each fold.  Claim: per-batch time flat as the seeded
  index grows 10x (the fold tokenizes only the batch; the freshness
  anti-join reads the registry but broadcast-joins the 10-row batch).
- ``leakage_split_sink``: same protocol; each batch also appends its
  arriving near-dup pairs first (a pair lands in the batch of its
  later endpoint, the sink's contract).  Claim: per-batch time bounded
  by the batch's cluster blast radius, not the corpus — the affected-
  closure joins are keyed by the batch's ids.

Usage: python tools/ingest_probe.py [sink ...]
SF dirs default to sf0.01 and sf0.1 (a 10x state step); override with
SPARK_GRAFT_PROBE_DIRS=<dir>,<dir> for the sf0.1 -> sf1 decade probe.
Emits one JSON line: per-SF fold times, medians, and the decade ratio
median(large)/median(small) — ~1.0 is flat, ~10 would mean the fold is
corpus-sized.  The ABSOLUTE numbers carry the fixed Spark job overhead
(~0.5-1 s/fold of scheduling at these tiny sizes); the RATIO is the
evidence.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402

from airflow_crypto_btc_spark.session import get_spark  # noqa: E402
from airflow_crypto_btc_spark.sources.tables import load_table  # noqa: E402

SF_DIRS = ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
if os.environ.get("SPARK_GRAFT_PROBE_DIRS"):
    SF_DIRS = os.environ["SPARK_GRAFT_PROBE_DIRS"].split(",")

BATCHES = 3
BATCH_SIZE = 10


def _probe_split(spark, sf_dir: str, workdir: str) -> list[float]:
    from airflow_crypto_btc_spark.operators.dedup import minhash_lsh_pairs
    from airflow_crypto_btc_spark.sources.snapshot_table import append
    from airflow_crypto_btc_spark.streaming.split_stream import (
        leakage_split_sink,
    )

    docs = load_table(spark, sf_dir, "documents")
    probe_ids = [
        r["doc_id"]
        for r in docs.filter("doc_id % 16 = 0")
        .orderBy("doc_id")
        .limit(BATCHES * BATCH_SIZE)
        .collect()
    ]
    batch_of = {
        d: 1 + i // BATCH_SIZE for i, d in enumerate(probe_ids)
    }
    all_pairs = minhash_lsh_pairs(
        docs, num_hashes=12, bands=4, jaccard_threshold=0.5
    ).collect()

    pairs_tbl = os.path.join(workdir, "pairs")
    sink = leakage_split_sink(
        pairs_tbl,
        os.path.join(workdir, "splits"),
        os.path.join(workdir, "moves"),
        query_name="ingest-probe",
    )

    def arriving(k: int):
        rows = [
            (r["id_a"], r["id_b"])
            for r in all_pairs
            if max(batch_of.get(r["id_a"], 0),
                   batch_of.get(r["id_b"], 0)) == k
        ]
        return spark.createDataFrame(
            rows or [], "id_a bigint, id_b bigint"
        )

    # bulk seed: the whole corpus minus the probe docs (state size is
    # the variable), batch 0
    bulk = docs.filter(
        ~F.col("doc_id").isin(probe_ids)
    ).select("doc_id")
    append(spark, arriving(0), pairs_tbl)
    sink(bulk, 0)

    times = []
    for k in range(1, BATCHES + 1):
        ids = [d for d, b in batch_of.items() if b == k]
        arr = arriving(k)
        if arr.limit(1).count():
            append(spark, arr, pairs_tbl)
        batch = spark.createDataFrame(
            [(d,) for d in ids], "doc_id bigint"
        )
        t0 = time.perf_counter()
        sink(batch, k)
        times.append(round(time.perf_counter() - t0, 4))
    return times


def _probe_bm25(spark, sf_dir: str, workdir: str) -> list[float]:
    from airflow_crypto_btc_spark.streaming.search_stream import (
        bm25_index_sink,
    )

    docs = load_table(spark, sf_dir, "documents")
    probe_ids = [
        r["doc_id"]
        for r in docs.filter("doc_id % 16 = 0")
        .orderBy("doc_id")
        .limit(BATCHES * BATCH_SIZE)
        .collect()
    ]
    sink = bm25_index_sink(
        os.path.join(workdir, "postings"),
        os.path.join(workdir, "doclen"),
        query_name="ingest-probe",
    )
    bulk = docs.filter(~F.col("doc_id").isin(probe_ids))
    sink(bulk, 0)

    times = []
    for k in range(BATCHES):
        ids = probe_ids[k * BATCH_SIZE:(k + 1) * BATCH_SIZE]
        batch = docs.filter(F.col("doc_id").isin(ids))
        t0 = time.perf_counter()
        sink(batch, k + 1)
        times.append(round(time.perf_counter() - t0, 4))
    return times


def _probe_kmv(spark, sf_dir: str, workdir: str) -> list[float]:
    from airflow_crypto_btc_spark.operators.dedup import NORMALIZED_TEXT
    from airflow_crypto_btc_spark.streaming.sketch_stream import kmv_sink

    docs = load_table(spark, sf_dir, "documents")
    probe_ids = [
        r["doc_id"]
        for r in docs.filter("doc_id % 16 = 0")
        .orderBy("doc_id")
        .limit(BATCHES * BATCH_SIZE)
        .collect()
    ]
    sink = kmv_sink(
        os.path.join(workdir, "minima"),
        query_name="ingest-probe",
        key_expr=f"md5({NORMALIZED_TEXT.format(col='text')})",
        group_cols=["lang"],
        k=16,
    )
    bulk = docs.filter(~F.col("doc_id").isin(probe_ids))
    sink(bulk, 0)

    times = []
    for k in range(BATCHES):
        ids = probe_ids[k * BATCH_SIZE:(k + 1) * BATCH_SIZE]
        batch = docs.filter(F.col("doc_id").isin(ids))
        t0 = time.perf_counter()
        sink(batch, k + 1)
        times.append(round(time.perf_counter() - t0, 4))
    return times


PROBES = {
    "bm25_index_sink": _probe_bm25,
    "leakage_split_sink": _probe_split,
    "kmv_sink": _probe_kmv,
}


def main() -> None:
    import tempfile

    names = sys.argv[1:] or list(PROBES)
    spark = get_spark(app_name="ingest-probe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    results: dict[str, dict] = {}
    for name in names:
        per_sf: dict[str, list[float]] = {}
        for sf_dir in SF_DIRS:
            sf = sf_dir.rsplit("sf", 1)[-1]
            with tempfile.TemporaryDirectory(
                prefix=f"ingest_probe_{name}_"
            ) as workdir:
                per_sf[sf] = PROBES[name](spark, sf_dir, workdir)
        sfs = list(per_sf)
        med = {sf: round(statistics.median(ts), 4)
               for sf, ts in per_sf.items()}
        results[name] = {
            "fold_times": per_sf,
            "median": med,
            "ratio": round(med[sfs[-1]] / med[sfs[0]], 3),
        }
    print(json.dumps({"ingest_probe": results,
                      "batch_size": BATCH_SIZE, "batches": BATCHES}))


if __name__ == "__main__":
    main()
