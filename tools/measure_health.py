"""Measure the health-report / maintenance-gate cost claims (PLANS §7m)
and the JoinView delta-leg costs (PLANS §7n).

Usage: python tools/measure_health.py [sf_dir]

Everything here is throwaway /tmp state derived from the testdata
parquet; n=3 medians per timing.
"""

import datetime as dt
import json
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from firebolt_cdc_lambda_spark.session import get_spark  # noqa: E402
from firebolt_cdc_lambda_spark.operators.merge import KeyedTable  # noqa: E402
from firebolt_cdc_lambda_spark.operators.joinview import JoinView  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def t3(fn):
    xs = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn()
        xs.append(time.perf_counter() - t0)
    return round(statistics.median(xs), 3)


def main():
    spark = get_spark()
    out = {}
    tmp = tempfile.mkdtemp(prefix="measure_health_")
    try:
        orders = spark.read.parquet(f"{SF}/orders.parquet")
        n_orders = orders.count()
        kt = KeyedTable(spark, f"{tmp}/orders", ["o_orderkey"],
                        num_buckets=64, versioned=True)
        kt.init(orders)
        # churn: 20 merges of 50-key batches -> 20 epochs of history
        keys = [r[0] for r in orders.limit(1000).select("o_orderkey").collect()]
        for i in range(20):
            batch = (orders.where(F.col("o_orderkey")
                                  .isin(keys[i * 50:(i + 1) * 50]))
                     .withColumn("Op", F.lit("U"))
                     .withColumn("load_timestamp",
                                 F.lit(dt.datetime(2024, 1, 2, i))))
            kt.merge_batch(batch)
        rep = kt.health_report()
        out["table_rows"] = n_orders
        out["manifest_entries"] = rep["manifest_entries"]
        out["live_files"] = rep["live_files"]
        out["dead_files"] = rep["dead_files"]
        out["dead_ratio"] = round(rep["dead_ratio"], 3)
        out["health_report_s"] = t3(kt.health_report)
        out["spark_full_count_s"] = t3(lambda: kt.read().count())
        # no-op tombstone purge probe vs a forced full rewrite
        kt2 = KeyedTable(spark, f"{tmp}/orders_ts", ["o_orderkey"],
                         num_buckets=64, tombstones=True)
        kt2.init(orders)
        out["purge_noop_probe_s"] = t3(lambda: kt2.purge_tombstones())
        t0 = time.perf_counter()
        kt2.rewrite(kt2.snapshot_for_rewrite())
        out["full_rewrite_s"] = round(time.perf_counter() - t0, 3)

        # -- JoinView legs -------------------------------------------------
        cust = spark.read.parquet(f"{SF}/customer.parquet")
        fact = KeyedTable(spark, f"{tmp}/fact", ["o_orderkey"],
                          num_buckets=64)
        dim = KeyedTable(spark, f"{tmp}/dim", ["c_custkey"], num_buckets=64)
        fact.init(orders)
        dim.init(cust)
        view = JoinView(spark, f"{tmp}/view", fact, dim, fk="o_custkey")
        t0 = time.perf_counter()
        view.rebuild()
        out["jv_rebuild_s"] = round(time.perf_counter() - t0, 3)
        out["jv_view_rows"] = view.read().count()
        fbatch = (orders.where(F.col("o_orderkey").isin(keys[:40]))
                  .withColumn("Op", F.lit("U"))
                  .withColumn("load_timestamp",
                              F.lit(dt.datetime(2024, 1, 3))))
        out["jv_fact_delta_40keys_s"] = t3(
            lambda: view.apply_fact_delta(fbatch))
        dkeys = [r[0] for r in cust.limit(5).select("c_custkey").collect()]
        dbatch = (cust.where(F.col("c_custkey").isin(dkeys))
                  .withColumn("c_name", F.concat(F.lit("X"), F.col("c_name")))
                  .withColumn("Op", F.lit("U"))
                  .withColumn("load_timestamp",
                              F.lit(dt.datetime(2024, 1, 4))))
        view.refresh_index()   # pay down fact-delta dirt so pruning binds
        out["jv_dim_delta_5keys_pruned_s"] = t3(
            lambda: view.apply_dim_delta(dbatch))
        from firebolt_cdc_lambda_spark.operators.bloom import BloomIndex
        out["jv_dim_candidates_of_64"] = len(
            BloomIndex(view.table, "o_custkey").candidate_buckets(dkeys))
        # voided-index fallback: full-scan dim leg for contrast
        view.table._bump_table_version()
        out["jv_dim_delta_5keys_fullscan_s"] = t3(
            lambda: view.apply_dim_delta(dbatch))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
