#!/usr/bin/env python
"""Interleaved same-box A/B: merge-family bench rows, r11-final code vs
r12-final code (round-12 judge order #1 — the ab_joinview protocol
generalized to the merge family).

BENCH_r12's driver run was uniformly 1.4-1.7x elevated (untouched
read-only rows included — the box-hour signature), but TWO merge-family
rows landed OUTSIDE their documented same-code spreads
(cdc_merge_batch driver min 1.763 vs spread <=1.650; cdc_bloom_lookup
1.406 vs <=1.270) and round 12 DID rewrite the resolution path every
versioned/bloom read rides (tuple refs + per-root grouping,
merge.py:1000-1063).  Second consecutive elevated driver run -> the
armed §7t drift rule owes an interleaved adjudication: code or
environment.

Protocol (the §7o shape): INTERLEAVED fresh-JVM trials (r11-tree,
r12-tree, r11, r12, ...), each a subprocess that imports bench from its
own source tree and runs bench_cdc_pipeline (small + heavy legs) and
bench_bloom_lookup verbatim at sf0.1.  Interleaving cancels box-hour
drift; a code regression shows as a consistent r12/r11 ratio >> 1 on
the touched legs.

Usage: python tools/ab_merge.py [--sf-dir .../sf0.1] [--trials 3]
       --r11-tree /tmp/ab_r11 --r12-tree /tmp/ab_r12
       (worktrees: r11-final = 4a1f569, r12-final = e5af17d)
Prints one JSON line: per-arm per-leg mins/medians + ratios.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

LEGS = ("merge_small", "merge_heavy", "bloom")

_CHILD = r"""
import json, os, sys
sys.path.insert(0, os.environ["AB_TREE"])
os.chdir(os.environ["AB_TREE"])
import bench
spark = bench.get_spark(app_name="ab-merge")
spark.sparkContext.setLogLevel("ERROR")
sf = os.environ["AB_SF_DIR"]
small_s, heavy_s = bench.bench_cdc_pipeline(spark, sf)
bloom_s = bench.bench_bloom_lookup(spark, sf)
print("AB_RESULT " + json.dumps(
    {"merge_small": small_s, "merge_heavy": heavy_s, "bloom": bloom_s}))
"""


def run_trial(tree: str, sf_dir: str) -> dict:
    env = dict(os.environ, AB_TREE=tree, AB_SF_DIR=sf_dir)
    out = subprocess.run([sys.executable, "-c", _CHILD], env=env,
                         capture_output=True, text=True, timeout=1800)
    for line in out.stdout.splitlines():
        if line.startswith("AB_RESULT "):
            return json.loads(line[len("AB_RESULT "):])
    raise RuntimeError(f"trial in {tree} produced no result:\n"
                       f"{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--r11-tree", default="/tmp/ab_r11")
    ap.add_argument("--r12-tree", default="/tmp/ab_r12")
    args = ap.parse_args()

    arms = {"r11": args.r11_tree, "r12": args.r12_tree}
    samples = {arm: {leg: [] for leg in LEGS} for arm in arms}
    for trial in range(args.trials):
        for arm, tree in arms.items():          # interleave r11, r12, ...
            res = run_trial(tree, args.sf_dir)
            for leg in LEGS:
                samples[arm][leg].extend(res[leg])
            print(f"trial {trial} {arm}: " + " ".join(
                f"{leg} min {min(res[leg]):.3f}" for leg in LEGS),
                file=sys.stderr)

    summary = {}
    for arm in arms:
        for leg in LEGS:
            s = samples[arm][leg]
            summary[f"{arm}_{leg}"] = {
                "min": round(min(s), 3),
                "median": round(statistics.median(s), 3), "n": len(s)}
    for leg in LEGS:
        summary[f"ratio_{leg}_min"] = round(
            summary[f"r12_{leg}"]["min"] / summary[f"r11_{leg}"]["min"], 3)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
