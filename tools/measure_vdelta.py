#!/usr/bin/env python
"""Versioned x delta_upserts cost profile (PLANS §7v).

Question: what does TIME TRAVEL cost on top of merge-on-read upserts?
Method: three orders-table twins at the given SF (eager VERSIONED,
delta UNVERSIONED, delta VERSIONED; 64 buckets), fed the same K
small version-gated CDC batches, timing per-batch merge latency, the
full-table read with a K-batch live window, a bucket-pruned point
lookup (latest and as_of), the fold, and the post-fold historic read.

What to expect (the structural claims, checkable in the numbers):
  * versioned delta append ≈ unversioned delta append + one manifest
    round trip — the version itself writes ZERO base files;
  * reads pay the overlay ∝ live-window debt in BOTH delta modes (the
    versioned window is structurally selected, so folded history adds
    nothing to latest reads);
  * historic reads (as_of) resolve old epochs + their own window —
    the fold does not disturb them.

Honest negatives to expect locally (record them): at MB-scale buckets
the eager merge's full-bucket rewrite is CHEAP, so delta appends only
tie or modestly beat it on wall time (the 100 TB claim is bytes
rewritten, pinned by the zero-rewrite asserts, not local seconds);
the versioned fold (epoch append + manifest) can cost slightly more
than the unversioned dynamic overwrite at this scale.

Run:  python tools/measure_vdelta.py [sf_dir]
"""

from __future__ import annotations

import datetime as dt
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from firebolt_cdc_lambda_spark.session import get_spark  # noqa: E402
from firebolt_cdc_lambda_spark.operators.merge import KeyedTable  # noqa: E402

K = 8          # batches (the fleet fold gate's default backlog)
BATCH_KEYS = 30


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="measure-vdelta")
    spark.sparkContext.setLogLevel("ERROR")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    n = orders.count()
    keys = [r[0] for r in orders.select("o_orderkey").limit(
        K * BATCH_KEYS).collect()]
    tmp = tempfile.mkdtemp(prefix="measure_vdelta_")
    tables = {
        "eager_versioned": KeyedTable(
            spark, f"{tmp}/ev", ["o_orderkey"], num_buckets=64,
            versioned=True),
        "delta_plain": KeyedTable(
            spark, f"{tmp}/dp", ["o_orderkey"], num_buckets=64,
            delta_upserts=True),
        "delta_versioned": KeyedTable(
            spark, f"{tmp}/dv", ["o_orderkey"], num_buckets=64,
            versioned=True, delta_upserts=True),
    }
    for t in tables.values():
        t.init(orders)

    def batch(i):
        ks = keys[i * BATCH_KEYS:(i + 1) * BATCH_KEYS]
        return (orders.where(F.col("o_orderkey").isin(ks))
                .withColumn("o_totalprice", F.col("o_totalprice") + 1.0)
                .withColumn("o_orderdate",
                            F.lit(dt.datetime(2005, 6, 1 + i)))
                .withColumn("Op", F.lit("U")))

    out: dict = {"sf_dir": sf_dir, "rows": n, "batches": K,
                 "keys_per_batch": BATCH_KEYS}
    for name, t in tables.items():
        merges = []
        for i in range(K):
            b = batch(i)
            b.count()                       # materialize source side
            t0 = time.time()
            t.merge_batch(b, version_col="o_orderdate")
            merges.append(round(time.time() - t0, 3))
        t0 = time.time()
        t.read().agg(F.sum("o_totalprice")).collect()
        read_live = round(time.time() - t0, 3)
        t0 = time.time()
        t.lookup([keys[0]]).collect()
        lookup = round(time.time() - t0, 3)
        row = {"merge_per_batch": merges,
               "merge_median": sorted(merges)[len(merges) // 2],
               "read_with_window": read_live, "point_lookup": lookup}
        if t.versioned:
            t0 = time.time()
            t.read(as_of=K // 2).agg(F.sum("o_totalprice")).collect()
            row["read_as_of_mid"] = round(time.time() - t0, 3)
            t0 = time.time()
            t.lookup([keys[0]], as_of=K // 2).collect()
            row["lookup_as_of_mid"] = round(time.time() - t0, 3)
        if t.delta_upserts:
            t0 = time.time()
            row["fold_buckets"] = t.fold_deltas()
            row["fold"] = round(time.time() - t0, 3)
            t0 = time.time()
            t.read().agg(F.sum("o_totalprice")).collect()
            row["read_post_fold"] = round(time.time() - t0, 3)
        if t.versioned:
            t0 = time.time()
            t.read(as_of=K // 2).agg(F.sum("o_totalprice")).collect()
            row["read_as_of_mid_post_fold"] = round(time.time() - t0, 3)
        out[name] = row
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
