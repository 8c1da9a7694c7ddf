#!/usr/bin/env python
"""Controlled A/B: SPARK_GRAFT_DRIVER_MEM 1g vs 16g (round-6 judge
order #5) on the five most-drifted BENCH_r06 rows.

The round-6 bench showed a uniform ~+11% corpus-median drift vs r5
while every throughput metric improved; the one code suspect is the
16g driver-heap default (it changes JVM GC ergonomics for every local
run).  This script adjudicates it: INTERLEAVED fresh-JVM trials
(1g, 16g, 1g, 16g, ...), n trials per config, 1 warm-up + 3 timed reps
per query per trial, medians compared.  Driver memory is a JVM-launch
option, so each trial is a subprocess with its own SparkSession.

Usage: python tools/ab_driver_mem.py [--sf-dir .../sf0.1] [--trials 3]
Prints one JSON line: per-config per-query medians + the ratio.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

QUERIES = ["cdc_dedup_cascade", "ann_cosine_topk", "q3_shipping_priority",
           "q5_nation_revenue", "events_sessionization"]

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, os.environ["AB_REPO"])
from firebolt_cdc_lambda_spark.session import get_spark
from firebolt_cdc_lambda_spark.corpus import ALL_QUERIES
spark = get_spark(app_name="ab-driver-mem")
spark.sparkContext.setLogLevel("ERROR")
sf = os.environ["AB_SF_DIR"]
names = json.loads(os.environ["AB_QUERIES"])
out = {}
for name in names:
    fn = ALL_QUERIES[name].fn
    fn(spark, sf).write.format("noop").mode("overwrite").save()  # warm-up
    reps = []
    for _ in range(3):
        t0 = time.time()
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        reps.append(time.time() - t0)
    out[name] = sorted(reps)[1]          # median of 3
print("AB_RESULT " + json.dumps(out))
"""


def median(xs):
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    results = {"1g": {q: [] for q in QUERIES}, "16g": {q: [] for q in QUERIES}}
    order = ["1g", "16g"] * args.trials      # interleaved
    for i, mem in enumerate(order):
        env = dict(os.environ, SPARK_GRAFT_DRIVER_MEM=mem, AB_REPO=repo,
                   AB_SF_DIR=args.sf_dir, AB_QUERIES=json.dumps(QUERIES))
        proc = subprocess.run([sys.executable, "-c", _CHILD], env=env,
                              capture_output=True, text=True, timeout=1800)
        line = next((ln for ln in proc.stdout.splitlines()
                     if ln.startswith("AB_RESULT ")), None)
        if line is None:
            print(f"trial {i} ({mem}) FAILED:\n{proc.stderr[-2000:]}",
                  file=sys.stderr)
            return 1
        for q, v in json.loads(line[len("AB_RESULT "):]).items():
            results[mem][q].append(v)
        print(f"  trial {i + 1}/{len(order)} ({mem}) done", file=sys.stderr)
    summary = {}
    for q in QUERIES:
        m1, m16 = median(results["1g"][q]), median(results["16g"][q])
        summary[q] = {"1g": round(m1, 3), "16g": round(m16, 3),
                      "ratio_16g_over_1g": round(m16 / m1, 3)}
    print(json.dumps({"metric": "ab_driver_mem", "sf_dir": args.sf_dir,
                      "trials": args.trials, "queries": summary}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
