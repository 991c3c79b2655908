"""Interleaved worktree A/B bench: the ONLY way a round-over-round
per-query delta on this box is attributable to code.

Absolute bench numbers here drift 1.0-1.45× across hours with zero
guest load (host-side contention — see SCALING.md's round-8 bench
environment note), so "query X got 1.2× slower than last round's
artifact" is unfalsifiable from two non-interleaved runs.  This tool
checks out the two refs into throwaway git worktrees and alternates
ONE full pass per tree per rep (A B A B ...), so both trees sample the
same minutes of machine weather; per-query medians then divide into a
ratio that cancels the environment.

Usage:
  python tools/ab_bench.py REF_A REF_B [query ...] [--reps N] [--sf DIR]

Defaults: the five TPC-H drifters round 7 was accused of, 4 reps,
sf0.1.  Prints one JSON line: per-query medians for each tree and the
A/B ratio.  Each pass runs in a FRESH subprocess importing that tree's
own catalog (no cross-tree module bleed, JVM startup excluded from
timings by an in-process warmup query).
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import tempfile

DEFAULT_QUERIES = [
    "q7_nation_pair_volume",
    "q8_market_share",
    "q10_returned_items",
    "q21_waiting_suppliers",
    "rank_top_customers_per_nation",
]

_PASS_SCRIPT = r"""
import json, sys, time
sys.path.insert(0, sys.argv[1])
from airflow_crypto_btc_spark.plans.catalog import ALL_QUERIES
from airflow_crypto_btc_spark.session import get_spark
spark = get_spark(app_name="ab-bench")
spark.range(1_000_000).selectExpr("sum(id)").collect()  # warmup
sf = sys.argv[2]
out = {}
for name in sys.argv[3:]:
    fn = ALL_QUERIES[name].fn
    t0 = time.monotonic()
    fn(spark, sf).write.format("noop").mode("overwrite").save()
    out[name] = round(time.monotonic() - t0, 4)
print("ABPASS " + json.dumps(out))
"""


def _run_pass(tree: str, sf: str, queries: list[str]) -> dict:
    proc = subprocess.run(
        [sys.executable, "-c", _PASS_SCRIPT, tree, sf, *queries],
        capture_output=True,
        text=True,
        timeout=1200,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("ABPASS "):
            return json.loads(line[len("ABPASS "):])
    raise RuntimeError(
        f"pass in {tree} produced no result:\n{proc.stdout[-2000:]}"
        f"\n{proc.stderr[-2000:]}"
    )


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 4
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for a in sys.argv[1:]:
        if a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])
        if a.startswith("--sf="):
            sf = a.split("=", 1)[1]
    if len(args) < 2:
        sys.exit(__doc__)
    ref_a, ref_b = args[0], args[1]
    queries = args[2:] or DEFAULT_QUERIES

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    trees = {}
    for label, ref in (("A", ref_a), ("B", ref_b)):
        wt = tempfile.mkdtemp(prefix=f"ab_bench_{label}_")
        subprocess.run(
            ["git", "-C", repo, "worktree", "add", "--detach",
             "--force", wt, ref],
            check=True,
            capture_output=True,
        )
        trees[label] = wt
    try:
        samples: dict[str, dict[str, list[float]]] = {
            "A": {q: [] for q in queries},
            "B": {q: [] for q in queries},
        }
        for rep in range(reps):
            for label in ("A", "B"):  # strict interleave: A B A B ...
                got = _run_pass(trees[label], sf, queries)
                for q, t in got.items():
                    samples[label][q].append(t)
                print(
                    f"# rep {rep + 1}/{reps} tree {label}: "
                    + " ".join(f"{q}={t}" for q, t in got.items()),
                    file=sys.stderr,
                )
        med = {
            label: {
                q: round(statistics.median(v), 4)
                for q, v in per.items()
            }
            for label, per in samples.items()
        }
        ratio = {
            q: round(med["A"][q] / med["B"][q], 3) if med["B"][q] else None
            for q in queries
        }
        print(json.dumps({
            "ab_bench": {
                "ref_a": ref_a, "ref_b": ref_b, "sf": sf, "reps": reps,
                "median_a": med["A"], "median_b": med["B"],
                "ratio_a_over_b": ratio,
            }
        }))
    finally:
        for wt in trees.values():
            subprocess.run(
                ["git", "-C", repo, "worktree", "remove", "--force", wt],
                capture_output=True,
            )


if __name__ == "__main__":
    main()
