#!/usr/bin/env python
"""Sustained-stream stress: does per-trigger cost stay flat over a long
file backlog as the snapshot, ledger, and checkpoint state grow?

Writes N small CDC files (sf0.1 orders split by key mod N), drains them
through the full CdcStream path, and reports per-trigger execution
times by quartile of the run — a downward-sloping or flat profile means
no accumulation pathology (ledger scans, checkpoint compaction, bucket
fragmentation); an upward slope would be the 100 TB red flag.

Usage: python tools/stress_stream.py [n_files] [files_per_trigger]
Prints one JSON line.  Not part of bench.py (minutes-long); results are
recorded in PLANS.md §6c.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from firebolt_cdc_lambda_spark.session import get_spark  # noqa: E402
from firebolt_cdc_lambda_spark.corpus.base import load_table  # noqa: E402
from firebolt_cdc_lambda_spark.config import TableKeys  # noqa: E402
from firebolt_cdc_lambda_spark.pipeline import CdcPipeline  # noqa: E402
from firebolt_cdc_lambda_spark.streaming import CdcStream  # noqa: E402


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    per_trigger = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="stress-stream", extra_conf={
        # keep every trigger's progress record for the slope analysis
        "spark.sql.streaming.numRecentProgressUpdates": str(n_files + 16),
    })
    spark.sparkContext.setLogLevel("ERROR")

    orders = load_table(spark, sf_dir, "orders")
    tmp = tempfile.mkdtemp(prefix="stress_stream_")
    try:
        for i in range(n_files):
            day = i % 28 + 1
            (orders.where(F.col("o_orderkey") % n_files == i)
             .withColumn("Op", F.lit("I" if i == 0 else "U"))
             .withColumn("load_timestamp",
                         F.to_timestamp(F.lit(f"2024-01-{day:02d} 00:00:00")))
             .coalesce(1).write.parquet(f"{tmp}/src/2024/01/{day:02d}/b{i}.parquet"))
        pipe = CdcPipeline(spark, f"{tmp}/wh",
                           TableKeys.from_json('{"orders": "o_orderkey"}'),
                           num_buckets=64)
        stream = CdcStream(pipe, "orders", ["o_orderkey"], f"{tmp}/src",
                           f"{tmp}/ckpt", max_files_per_trigger=per_trigger)
        t0 = time.time()
        q = stream.start(spark, available_now=True)
        q.awaitTermination(3600)
        wall = time.time() - t0
        trig = [p["durationMs"]["triggerExecution"] / 1000.0
                for p in q.recentProgress
                if p["numInputRows"] > 0 and "triggerExecution" in p["durationMs"]]
        n = len(trig)
        quartiles = [round(sum(c) / len(c), 3) for c in
                     (trig[i * n // 4:(i + 1) * n // 4] for i in range(4))
                     if c]
        snap_rows = pipe.target_for("orders", ["o_orderkey"]).read().count()
        print(json.dumps({
            "n_files": n_files, "files_per_trigger": per_trigger,
            "wall_sec": round(wall, 1),
            "files_per_sec": round(n_files / wall, 3),
            "triggers": n,
            "trigger_quartile_means_sec": quartiles,
            "first_trigger_sec": round(trig[0], 3) if trig else None,
            "last_trigger_sec": round(trig[-1], 3) if trig else None,
            "snapshot_rows": snap_rows,
        }))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
