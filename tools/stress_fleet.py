#!/usr/bin/env python
"""Fleet-width scaling: aggregate files/sec as the number of CONCURRENT
table streams grows — how far does cross-table concurrency amortize the
per-file fixed cost, and where does the shared driver/scheduler start to
bind?

The reference fleet is 809 tables at ~10k files/day (~0.12 files/s
aggregate).  bench.py's `fleet_files_per_sec` pins one point (8 tables);
this tool sweeps the width axis at a fixed total file count so the work
is constant and only the concurrency changes.

Usage: python tools/stress_fleet.py [total_files] [widths,...]
Prints one JSON line.  Not part of bench.py (minutes-long); results are
recorded in PLANS.md §7h.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from firebolt_cdc_lambda_spark.session import get_spark  # noqa: E402
import bench  # noqa: E402


def main() -> None:
    total_files = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    widths = ([int(w) for w in sys.argv[2].split(",")]
              if len(sys.argv) > 2 else [4, 8, 16, 32])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="stress-fleet")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, float] = {}
    for w in widths:
        fpt = max(1, total_files // w)
        out[str(w)] = bench.bench_fleet_throughput(
            spark, sf_dir, n_tables=w, files_per_table=fpt)
    # pooled mode: MORE tables than slots — the run_pooled production
    # shape (a bounded pool round-robining a wide fleet); same total
    # file count so throughput is comparable to the all-at-once sweep
    pooled: dict[str, float] = {}
    n_tables = max(widths)
    fpt = max(1, total_files // n_tables)
    for w in widths:
        if w >= n_tables:
            continue
        pooled[f"{n_tables}t/pool{w}"] = bench.bench_fleet_throughput(
            spark, sf_dir, n_tables=n_tables, files_per_table=fpt,
            pool_width=w)
    print(json.dumps({"metric": "fleet_files_per_sec_by_width",
                      "total_files": total_files, "sf_dir": sf_dir,
                      "by_width": out, "pooled": pooled}))


if __name__ == "__main__":
    main()
