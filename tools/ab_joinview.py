#!/usr/bin/env python
"""Interleaved same-box A/B: joinview bench legs, r10 code vs r11 code
(round-11 judge order #1).

BENCH_r11 put joinview_fact_leg at min 2.593 s vs r10's 0.965 s — the
one >2x round-over-round move outside the same-code scatter band.  The
dim leg was ~2.6-2.8 in BOTH rounds.  joinview.py itself was untouched
in round 11, but the fact leg exercises KeyedTable merge machinery
that DID change (the replacement-walk manifest rewrite), so the move
needs a code-vs-environment verdict.

Protocol (the §7o shape, adapted): INTERLEAVED fresh-JVM trials
(r10-tree, r11-tree, r10, r11, ...), each a subprocess that imports
bench_joinview from its own source tree and runs it verbatim (1 warm +
5 timed reps per leg, sf0.1).  Interleaving cancels box-hour drift; a
code regression shows as a consistent r11/r10 ratio >> 1 on the fact
leg while the dim leg stays ~1.

Usage: python tools/ab_joinview.py [--sf-dir .../sf0.1] [--trials 3]
       (expects the r10 worktree at --r10-tree, default /tmp/ab_r10)
Prints one JSON line: per-arm per-leg mins/medians + ratios.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

_CHILD = r"""
import json, os, sys
sys.path.insert(0, os.environ["AB_TREE"])
os.chdir(os.environ["AB_TREE"])
import bench
spark = bench.get_spark(app_name="ab-joinview")
spark.sparkContext.setLogLevel("ERROR")
fact_s, dim_s = bench.bench_joinview(spark, os.environ["AB_SF_DIR"])
print("AB_RESULT " + json.dumps({"fact": fact_s, "dim": dim_s}))
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
    ap.add_argument("--r10-tree", default="/tmp/ab_r10")
    ap.add_argument("--r11-tree", default="/root/repo")
    args = ap.parse_args()

    arms = {"r10": args.r10_tree, "r11": args.r11_tree}
    samples = {arm: {"fact": [], "dim": []} for arm in arms}
    for trial in range(args.trials):
        for arm, tree in arms.items():          # interleave r10, r11, ...
            res = run_trial(tree, args.sf_dir)
            samples[arm]["fact"].extend(res["fact"])
            samples[arm]["dim"].extend(res["dim"])
            print(f"trial {trial} {arm}: fact min "
                  f"{min(res['fact']):.3f} dim min {min(res['dim']):.3f}",
                  file=sys.stderr)

    summary = {}
    for arm in arms:
        for leg in ("fact", "dim"):
            s = samples[arm][leg]
            summary[f"{arm}_{leg}"] = {
                "min": round(min(s), 3),
                "median": round(statistics.median(s), 3), "n": len(s)}
    for leg in ("fact", "dim"):
        summary[f"ratio_{leg}_min"] = round(
            summary[f"r11_{leg}"]["min"] / summary[f"r10_{leg}"]["min"], 3)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
