#!/usr/bin/env python
"""Interleaved fresh-JVM A/B: fleet_files_per_sec, r12-final tree vs HEAD.

Round-13 shipped with fleet_files_per_sec down ~24% on every measurement
(driver 4.217 -> 3.202 files/s, local close 4.549 -> 3.55), and the
round-13 ENVIRONMENT adjudication ran on a degraded box epoch (both arms
<< every bench number), so it only proved HEAD beats pre-round *on a bad
box*.  Round-14 judge order #1: re-adjudicate on a healthy epoch with
interleaved fresh-JVM arms, >= 3 trials/arm, fleet_files_per_sec only.

Protocol (the ab_merge shape): INTERLEAVED fresh-JVM trials (r12-tree,
HEAD-tree, r12, HEAD, ...), each a subprocess that imports bench from its
own source tree and runs bench_fleet_throughput verbatim at sf0.1.  Each
trial also reports the drain's Spark JOB/TASK counts from the status
store — contention-independent, so a code-level job-count delta is
visible even if the box drifts mid-protocol.

Usage: python tools/ab_fleet.py [--sf-dir .../sf0.1] [--trials 3]
       --r12-tree /tmp/ab_r12 --head-tree /root/repo
Prints one JSON line: per-arm files/s samples + job counts + ratios.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, os.environ["AB_TREE"])
os.chdir(os.environ["AB_TREE"])
import bench
spark = bench.get_spark(app_name="ab-fleet")
spark.sparkContext.setLogLevel("ERROR")
sf = os.environ["AB_SF_DIR"]

def _jobs(spark):
    store = spark._jsparkSession.sparkContext().statusStore()
    jobs = store.jobsList(None)
    out = []
    for i in range(jobs.size()):
        j = jobs.apply(i)
        out.append((j.jobId(), j.numTasks()))
    return out

before = {j[0] for j in _jobs(spark)}
fps = bench.bench_fleet_throughput(spark, sf)
after = [j for j in _jobs(spark) if j[0] not in before]
print("AB_RESULT " + json.dumps(
    {"fps": fps, "jobs": len(after), "tasks": sum(j[1] for j in after)}))
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
    ap.add_argument("--r12-tree", default="/tmp/ab_r12")
    ap.add_argument("--head-tree",
                    default=os.path.dirname(os.path.dirname(
                        os.path.abspath(__file__))))
    args = ap.parse_args()

    arms = {"r12": args.r12_tree, "head": args.head_tree}
    samples = {arm: {"fps": [], "jobs": [], "tasks": []} for arm in arms}
    for trial in range(args.trials):
        for arm, tree in arms.items():          # interleave r12, head, ...
            res = run_trial(tree, args.sf_dir)
            for k in ("fps", "jobs", "tasks"):
                samples[arm][k].append(res[k])
            print(f"trial {trial} {arm}: {res}", file=sys.stderr)
    summary = {}
    for arm in arms:
        s = samples[arm]
        summary[arm] = {
            "fps": s["fps"], "fps_max": max(s["fps"]),
            "fps_median": statistics.median(s["fps"]),
            "jobs": s["jobs"], "tasks": s["tasks"],
        }
    summary["head_over_r12_median"] = round(
        summary["head"]["fps_median"] / summary["r12"]["fps_median"], 3)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
