#!/usr/bin/env python
"""Point-lookup latency vs table size (PLANS §7j).

The serving-side claim: `KeyedTable.lookup` reads ONLY the keys'
buckets, so latency tracks BUCKET SIZE, not table size.  Test both
directions at once:

* constant-bucket-size pair — sf0.01/16 buckets vs sf0.1/160 buckets
  (~same rows per bucket): latency should be ~flat;
* fixed-bucket-count pair — sf0.1/16 vs sf0.01/16 (10x the rows per
  bucket): latency should grow, which is exactly why `rebucket` is the
  scale knob (PLANS §5c/7c: size bucket count to the table).

Usage: python tools/stress_lookup.py   (prints one JSON line)
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
from firebolt_cdc_lambda_spark.corpus.base import load_table  # noqa: E402
from firebolt_cdc_lambda_spark.operators.merge import KeyedTable  # noqa: E402

CONFIGS = [
    # (sf_dir, num_buckets, label)
    ("/root/testdata/sf0.01", 16, "sf0.01/16b"),
    ("/root/testdata/sf0.1", 160, "sf0.1/160b (same bucket size)"),
    ("/root/testdata/sf0.1", 16, "sf0.1/16b (10x bucket size)"),
]
N_REPS = 5


def main() -> None:
    spark = get_spark(app_name="fcls-stress-lookup")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for sf_dir, nb, label in CONFIGS:
        orders = load_table(spark, sf_dir, "orders")
        tmp = tempfile.mkdtemp(prefix="stress_lookup_")
        try:
            kt = KeyedTable(spark, f"{tmp}/orders", ["o_orderkey"],
                            num_buckets=nb)
            kt.init(orders)
            keys = [r[0] for r in orders.select("o_orderkey")
                    .orderBy("o_orderkey").limit(10).collect()]
            kt.lookup(keys).write.format("noop").mode("overwrite").save()
            samples = []
            for _ in range(N_REPS):
                t0 = time.time()
                kt.lookup(keys).write.format("noop").mode("overwrite").save()
                samples.append(time.time() - t0)
            rows = orders.count()
            out[label] = {
                "rows": rows,
                "rows_per_bucket": rows // nb,
                "min_sec": round(min(samples), 3),
                "median_sec": round(sorted(samples)[len(samples) // 2], 3),
            }
            print(f"{label}: {out[label]}", file=sys.stderr)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps({"metric": "point_lookup_latency_by_scale",
                      "configs": out}))


if __name__ == "__main__":
    main()
