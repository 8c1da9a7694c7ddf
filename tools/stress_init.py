#!/usr/bin/env python
"""High-bucket-count bootstrap cost: WHERE does the 16k-bucket init time
go, and does the parallel-commit path (FileOutputCommitter algorithm
v2) recover it?

§7c measured per-batch merge cost flat from 1k -> 16k buckets but init
growing 7 s -> 38 s, with an unverified "object stores parallelize the
commit better" claim.  This tool replaces that assumption with a
measurement: the same 2M-row / N-bucket init under

  * v1 (default): task outputs commit to a job-temp dir; job commit then
    renames every partition dir SEQUENTIALLY on the driver — O(dirs)
    driver-side renames;
  * v2: task outputs rename directly to the final location at task
    commit — renames run in parallel across tasks, job commit is O(1).
    (v2 trades atomicity-on-job-failure for parallel commit; an init
    writes to a fresh directory, where a partial result is harmless —
    the table is only advertised by the sidecar written after success.)

MEASURED OUTCOME (recorded in PLANS.md §7c): on local ext4 neither
committer reliably wins — init cost is filesystem-metadata-bound at
~3-8 ms per bucket file regardless of knobs, so the real lever is
sizing the bucket count to the table (and `rebucket` later), not
committer tuning.

Usage: python tools/stress_init.py [n_rows] [bucket_counts,...]
Prints one JSON line.  Not part of bench.py (minutes-long).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from firebolt_cdc_lambda_spark.session import get_spark  # noqa: E402
from firebolt_cdc_lambda_spark.operators.merge import KeyedTable  # noqa: E402


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    counts = ([int(c) for c in sys.argv[2].split(",")]
              if len(sys.argv) > 2 else [1024, 4096, 16384])
    spark = get_spark(app_name="stress-init")
    spark.sparkContext.setLogLevel("ERROR")
    df = (spark.range(n_rows)
          .selectExpr("id AS k", "CAST(id % 97 AS DOUBLE) AS v",
                      "md5(CAST(id AS STRING)) AS payload")
          .localCheckpoint())   # source cost off the clock

    hconf = spark._jsc.hadoopConfiguration()
    key = "mapreduce.fileoutputcommitter.algorithm.version"
    results: dict[str, dict[str, float]] = {}
    for algo in ("1", "2"):
        hconf.set(key, algo)
        per: dict[str, float] = {}
        for nb in counts:
            tmp = tempfile.mkdtemp(prefix="stress_init_")
            try:
                kt = KeyedTable(spark, f"{tmp}/t", ["k"], num_buckets=nb)
                t0 = time.time()
                kt.init(df)
                per[str(nb)] = round(time.time() - t0, 2)
            finally:
                shutil.rmtree(tmp, ignore_errors=True)
        results[f"committer_v{algo}"] = per
    hconf.set(key, "1")   # restore default
    print(json.dumps({"metric": "init_seconds_by_bucket_count",
                      "n_rows": n_rows, **results}))


if __name__ == "__main__":
    main()
