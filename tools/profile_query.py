"""Per-query profiling harness (round-15): for each named catalog
entry, measure (a) plan-construction time (fn call), (b) noop-sink
execution time, and (c) the number of Spark JOBS the whole invocation
ran — the job count is the barrier/straggler proxy the optimization
guide's §1/§5 job-chain work needs (a localCheckpoint or collect is
~1-2 extra jobs each; serve entries suspected of paying 2-4 small jobs
per invocation show up here directly).

Usage: python tools/profile_query.py [SF_DIR] name [name ...]
       python tools/profile_query.py --top N   (profile the N most
           expensive lines from BENCH_MEDIANS.json)

Each query runs twice: the first pass builds any per-fixture landing
zone (cold), the second is the steady-state serve measurement.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from airflow_crypto_btc_spark.plans.catalog import ALL_QUERIES  # noqa: E402
from airflow_crypto_btc_spark.session import get_spark  # noqa: E402


def _job_ids(spark) -> set[int]:
    t = spark.sparkContext.statusTracker()
    return set(t.getJobIdsForGroup(None) or [])


def profile(spark, sf_dir: str, name: str) -> dict:
    spec = ALL_QUERIES[name]
    out = {"name": name}
    for label in ("cold", "warm"):
        spark.sparkContext.setJobGroup(f"{name}-{label}", name)
        before = _job_ids(spark)
        t0 = time.perf_counter()
        df = spec.fn(spark, sf_dir)
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        tracker = spark.sparkContext.statusTracker()
        jobs = set(
            tracker.getJobIdsForGroup(f"{name}-{label}") or []
        ) | (_job_ids(spark) - before)
        out[label] = {
            "build_s": round(t1 - t0, 3),
            "exec_s": round(t2 - t1, 3),
            "total_s": round(t2 - t0, 3),
            "n_jobs": len(jobs),
        }
        spark.sparkContext.setJobGroup("", "")
    return out


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir, args = args[0], args[1:]
    if args[:1] == ["--top"]:
        n = int(args[1])
        with open(
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "BENCH_MEDIANS.json")
        ) as fh:
            med = json.load(fh)["medians"]
        names = [k for k, _ in sorted(
            med.items(), key=lambda kv: -kv[1])[:n]]
    else:
        names = args
    spark = get_spark(app_name="profile_query")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm JVM
    for name in names:
        try:
            r = profile(spark, sf_dir, name)
        except Exception as exc:  # keep going; record the failure
            r = {"name": name, "error": str(exc)[:200]}
        print(json.dumps(r))


if __name__ == "__main__":
    main()
