"""Scaling probe: run representative queries at every available scale
factor and report runtime ratios vs data-size ratios.

A plan that holds at 100 TB shows work growing ~linearly (or better, for
selective scans) with input size; quadratic operators reveal themselves
immediately.  Usage: python tools/scale_probe.py [q1 q2 ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from airflow_crypto_btc_spark.plans.catalog import ALL_QUERIES  # noqa: E402
from airflow_crypto_btc_spark.session import get_spark  # noqa: E402

SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]

# decade-up probe (round 10): SPARK_GRAFT_PROBE_DIRS=<dir>,<dir>
# overrides the ladder — e.g. sf0.1 vs the generated .scale/sf1 slice
# (tools/gen_sf1.py), a 10x step the fixture ladder can't reach
if os.environ.get("SPARK_GRAFT_PROBE_DIRS"):
    SF_DIRS = os.environ["SPARK_GRAFT_PROBE_DIRS"].split(",")

DEFAULT = [
    "q1_pricing_summary",
    "q5_nation_revenue",
    "q6_forecast_revenue",
    "flagship_daily_indicators",
    "dedup_minhash_lsh_pairs",
    "sim_cosine_topk",
    "session_stats",
    "text_token_stats",
    # round-7 serving surfaces: flat-across-growth is their contract
    "sim_ivf_topk_from_index",
    "sim_lsh_topk_from_index",
    "dedup_semantic_purge",
    "text_logprob_from_model",
    # round-8: the production SemDeDup shape — FIXED-k trained quantizer,
    # assignment O(n·k) with constant k
    "dedup_semantic_purge_trained",
    # round-8: trainable probe — training is full-batch GD (linear scans
    # per iteration, dim-group gradient exchanges); serving is frozen
    "curate_quality_probe",
    "curate_probe_from_model",
    # round-8: frozen-map output sharding (broadcast join, no census)
    "curate_shards_from_map",
    # round-8 fifth wave: release reports — one-scan card, rollup over
    # maintained facts (no body re-read), change-feed release diff
    "curate_data_card",
    "curate_data_card_from_facts",
    "curate_corpus_diff",
]


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    spark = get_spark(app_name="scale-probe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    results: dict[str, dict[str, float]] = {}
    for name in names:
        fn = ALL_QUERIES[name].fn
        per_sf: dict[str, float] = {}
        for sf_dir in SF_DIRS:
            sf = sf_dir.rsplit("sf", 1)[-1]
            # warm plan/codegen once, time the second run (steady state)
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            per_sf[sf] = round(time.perf_counter() - t0, 4)
        first = SF_DIRS[0].rsplit("sf", 1)[-1]
        last = SF_DIRS[-1].rsplit("sf", 1)[-1]
        ratio_key = (
            "x100_data_runtime_ratio"
            if (first, last) == ("0.001", "0.1")
            else f"sf{first}_to_sf{last}_runtime_ratio"
        )
        per_sf[ratio_key] = round(per_sf[last] / per_sf[first], 2)
        results[name] = per_sf
        print(json.dumps({name: per_sf}))

    print(json.dumps({"scale_probe": results}))


if __name__ == "__main__":
    main()
