#!/usr/bin/env python
"""Small-file compaction cost curve (PLANS §7s).

Question: is KeyedTable.compact's cost actually ∝ small files, and
where does the local wall time go?  Method: one orders table at the
given SF, re-cut to three file counts (4, ~16, ~64 files per bucket at
64 buckets) via cluster_by(max_records_per_file=), timing ONLY
compact() per point (the re-cut is the untimed fixture).  Also reports
the O(table) alternative (a full cluster_by rewrite), the no-op probe
on a healthy table, and the idle recovery-probe cost every _read_raw
pays.

Honest negative to expect locally (PLANS §7s): at MB-scale data the
full rewrite BEATS compact on wall time — the structural claim is
about bytes touched and index preservation, not local seconds.

Run:  python tools/measure_compact.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from firebolt_cdc_lambda_spark.session import get_spark  # noqa: E402
from firebolt_cdc_lambda_spark.operators.merge import KeyedTable  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="measure-compact")
    spark.sparkContext.setLogLevel("ERROR")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    n = orders.count()
    tmp = tempfile.mkdtemp(prefix="measure_compact_")
    kt = KeyedTable(spark, f"{tmp}/orders", ["o_orderkey"], num_buckets=64)
    kt.init(orders)
    out: dict = {"sf_dir": sf_dir, "rows": n, "points": []}
    for cut in (256, 1024, 4096):
        kt.cluster_by(["o_orderdate"], max_records_per_file=max(1, n // cut))
        before = kt.health_report()
        t0 = time.time()
        res = kt.compact()
        wall = time.time() - t0
        after = kt.health_report()
        out["points"].append({
            "files_before": before["live_files"],
            "files_after": after["live_files"],
            "groups": res["groups"],
            "compact_sec": round(wall, 3)})
    # the O(table) alternative (voids every index; compact doesn't)
    kt.cluster_by(["o_orderdate"], max_records_per_file=max(1, n // 256))
    t0 = time.time()
    kt.cluster_by(["o_orderdate"])
    out["full_rewrite_sec"] = round(time.time() - t0, 3)
    # no-op probe on a healthy table (the fleet-gate cost class)
    t0 = time.time()
    noop = kt.compact()
    out["noop_compact_sec"] = round(time.time() - t0, 3)
    assert noop["groups"] == 0
    # idle recovery probe: what every _read_raw pays when no intent
    t0 = time.time()
    reps = 20
    for _ in range(reps):
        kt._recover_compact()
    out["idle_recovery_probe_ms"] = round(
        (time.time() - t0) / reps * 1000, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
