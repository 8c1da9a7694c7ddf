#!/usr/bin/env python
"""Long-history stress for versioned x delta_upserts (PLANS §7v
addendum): does LATEST-read cost stay flat as table history grows?

Method: one orders table (versioned delta, 16 buckets), N_BATCHES
small version-gated batches with a fold every FOLD_EVERY (the fleet
gate's default), timing the full-table read at checkpoints plus one
deep historic read, then purge_versions and a final read + a count of
the _delta_ver partitions left on disk.

The structural claim being measured: read cost tracks the LIVE WINDOW
(unfolded debt), never history length — 0.7-0.9 s at a 4-version
window vs ~0.2 s right after a fold, identical at history length 13
and 54 in the recorded run.

Run:  python tools/stress_vdelta_history.py [sf_dir]
"""

from __future__ import annotations

import datetime as dt
import glob
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from firebolt_cdc_lambda_spark.session import get_spark  # noqa: E402
from firebolt_cdc_lambda_spark.operators.merge import KeyedTable  # noqa: E402

N_BATCHES = 48
FOLD_EVERY = 8
KEYS_PER_BATCH = 40


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark(app_name="stress-vdelta-history")
    spark.sparkContext.setLogLevel("ERROR")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    keys = [r[0] for r in orders.select("o_orderkey")
            .limit(N_BATCHES * KEYS_PER_BATCH).collect()]
    tmp = tempfile.mkdtemp(prefix="stress_vdelta_")
    kt = KeyedTable(spark, f"{tmp}/o", ["o_orderkey"], num_buckets=16,
                    versioned=True, delta_upserts=True)
    kt.init(orders)

    def read_time():
        t0 = time.time()
        kt.read().agg(F.sum("o_totalprice")).collect()
        return round(time.time() - t0, 3)

    points = []
    for i in range(N_BATCHES):
        ks = keys[i * KEYS_PER_BATCH:(i + 1) * KEYS_PER_BATCH]
        b = (orders.where(F.col("o_orderkey").isin(ks))
             .withColumn("o_totalprice", F.col("o_totalprice") + 1.0)
             .withColumn("o_orderdate",
                         F.lit(dt.datetime(2005, 6, 1)
                               + dt.timedelta(days=i)))
             .withColumn("Op", F.lit("U")))
        kt.merge_batch(b, version_col="o_orderdate")
        if (i + 1) % FOLD_EVERY == 0:
            kt.fold_deltas()
        if (i + 1) % 12 == 0:
            points.append({"history_len": kt.latest_epoch(),
                           "latest_read_s": read_time(),
                           "live_window_vers":
                               len(kt._delta_vers(None))})
    t0 = time.time()
    kt.read(as_of=5).agg(F.sum("o_totalprice")).collect()
    deep = round(time.time() - t0, 3)
    kt.purge_versions(keep_last=10)
    post_purge = read_time()
    vdirs = len({p.split("_delta_ver=")[1] for p in glob.glob(
        f"{tmp}/o__delta/_bucket=*/_delta_ver=*")})
    print(json.dumps({"sf_dir": sf_dir, "points": points,
                      "deep_historic_read_s": deep,
                      "post_purge_read_s": post_purge,
                      "log_ver_dirs_after_purge": vdirs}, indent=2))


if __name__ == "__main__":
    main()
