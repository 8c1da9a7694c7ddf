#!/usr/bin/env python
"""Controlled streaming-throughput measurement (PLANS §7i).

Question from round 4: stream_files_per_sec fell r3 -> r4 (0.688 ->
0.48/0.55 in both the driver's and the judge's runs) while every other
delta proved to be environment noise.  Candidate causes: the version-
gate comparison per merge, the r4 rider-fix ordering columns, tombstone
mode (round 5 default), or ambient drift.

Method: SAME commit, SAME workload (bench.bench_stream_throughput's
10-file drain at the given SF), four pipeline configs toggling version
gating x tombstones, n reps each, schedule INTERLEAVED (A B C D A B C
D ...) so slow environment drift hits every config equally.  Reports
per-config {min, median, n} and the median ratio vs the baseline
config.

Run:  python tools/measure_stream.py [n_reps]   (default 3)
"""

from __future__ import annotations

import json
import os
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from firebolt_cdc_lambda_spark.session import get_spark  # noqa: E402
from bench import bench_stream_throughput  # noqa: E402

CONFIGS = {
    # name -> CdcPipeline overrides (r3's shipped shape = no gate, no
    # tombstones; r5's default = tombstones on)
    "plain": {"version_col": None, "tombstones": False},
    "vgate": {"version_col": "load_timestamp", "tombstones": False},
    "tombs": {"version_col": None, "tombstones": True},
    "vgate+tombs": {"version_col": "load_timestamp", "tombstones": True},
}


def main() -> None:
    n_reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="fcls-measure-stream", extra_conf={
        "spark.sql.files.maxPartitionBytes": "16m",
    })
    spark.sparkContext.setLogLevel("ERROR")

    # untimed warm-up drain so JVM/codegen spin-up doesn't land on the
    # first measured config
    bench_stream_throughput(spark, sf_dir,
                            pipeline_kwargs=CONFIGS["plain"])

    samples: dict[str, list[float]] = {k: [] for k in CONFIGS}
    for _rep in range(n_reps):
        for name, kw in CONFIGS.items():       # interleaved schedule
            fps = bench_stream_throughput(spark, sf_dir, pipeline_kwargs=kw)
            samples[name].append(fps)
            print(f"rep {_rep} {name}: {fps} files/s", file=sys.stderr)

    out = {}
    base_med = statistics.median(samples["plain"])
    for name, ss in samples.items():
        med = statistics.median(ss)
        out[name] = {"min": min(ss), "median": round(med, 3), "n": len(ss),
                     "vs_plain": round(med / base_med, 3)}
    print(json.dumps({"metric": "stream_files_per_sec_by_config",
                      "sf_dir": sf_dir, "configs": out}))


if __name__ == "__main__":
    main()
