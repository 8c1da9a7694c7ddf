#!/usr/bin/env python
"""Connected-components stress: convergence rounds + wall time on graph
shapes a near-dup pair graph actually exhibits at scale.

Questions the unit tests don't answer:

1. CHAIN (the adversarial shape): a path of N nodes needs O(N) rounds
   under naive label propagation.  Does large/small-star close a
   100k-node chain in the promised O(log N) alternating rounds?
2. HUB (the skew shape): one boilerplate doc near-dup to 100k others.
   Does per-round cost stay flat (no single-task neighborhood
   materialization)?
3. MIXED (the realistic shape): many small clusters + a few big ones.
   Round count, total time, and the shrinking edge-count trajectory.

Usage: python tools/stress_graph.py [scale]   # default 100_000
Prints one JSON line.  Results recorded in PLANS.md §7f.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from firebolt_cdc_lambda_spark.session import get_spark  # noqa: E402
from firebolt_cdc_lambda_spark.operators.graph import connected_components  # noqa: E402


def run(name, edges, expect_components):
    stats = {}
    t0 = time.time()
    comp = connected_components(edges, stats=stats)
    n_comp = comp.select("component").distinct().count()
    wall = round(time.time() - t0, 2)
    assert n_comp == expect_components, (name, n_comp, expect_components)
    return {"wall_sec": wall, "rounds": stats["rounds"],
            "edges_per_round": stats["edges_per_round"],
            "components": n_comp}


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    spark = get_spark(app_name="stress-graph", master="local[8]",
                      shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    out = {"scale": n}

    # 1. one chain of n nodes: 0-1-2-...-n
    chain = spark.range(n).selectExpr("id AS src", "id + 1 AS dst")
    out["chain"] = run("chain", chain, 1)

    # 2. one hub: node 0 connected to 1..n
    hub = spark.range(1, n + 1).selectExpr("0 AS src", "id AS dst")
    out["hub"] = run("hub", hub, 1)

    # 3. mixed: n/10 clusters of 10 (ring-connected) + overlaid random
    #    intra-cluster chords — the near-dup cluster size distribution
    mixed = (spark.range(n)
             .selectExpr("id AS src",
                         "CASE WHEN id % 10 = 9 THEN id - 9 "
                         "ELSE id + 1 END AS dst"))
    out["mixed"] = run("mixed", mixed, n // 10)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
