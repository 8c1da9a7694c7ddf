#!/usr/bin/env python
"""Metadata-only RESTORE cost profile (PLANS §7w).

Question: what does rolling a versioned table back cost, and what does
the rollback cost DOWNSTREAM?  Method: one versioned orders table (and
one versioned+delta twin) at the given SF, 64 buckets; build V history
versions with small touched-bucket merges, then time:

  * restore(v) metadata-only at several targets — the headline claim
    is that the cost is FLAT in both table size and history length
    (one manifest walk + two sidecar writes, zero data files);
  * restore(v, materialize=True) — the O(live rows) baseline it
    replaces, for the honest ratio;
  * the post-restore latest read vs the pre-restore latest read — a
    re-point is NOT free downstream on the delta twin: it re-opens the
    target's log window, so reads pay the overlay again until the next
    fold (recorded, with the fold that closes it);
  * purge_versions after a restore — the union prune rule walks every
    retained version's resolution (O(retained × manifest walk),
    driver-side), recorded so a future manifest-size pathology would
    show here first.

Honest negatives to expect locally (record them): at MB-scale tables
the materialized restore is only ~1-3 s, so the metadata win reads as
a small constant locally — the 100 TB claim is the ZERO-data-files
assert (pinned in tests and in the gated corpus row), wall-clock
flatness across history length and the materialize ratio are the
measurable local proxies.  The delta twin's post-restore read tax is
a real cost the operator accepts until the next fold cadence.

Run:  python tools/measure_restore.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from firebolt_cdc_lambda_spark.session import get_spark  # noqa: E402
from firebolt_cdc_lambda_spark.operators.merge import KeyedTable  # noqa: E402

V = 12          # history versions built before restoring
BATCH_KEYS = 30


def _t(fn):
    t0 = time.time()
    out = fn()
    return time.time() - t0, out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="measure-restore")
    spark.sparkContext.setLogLevel("ERROR")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    n = orders.count()
    keys = [r[0] for r in orders.select("o_orderkey")
            .limit(V * BATCH_KEYS).collect()]
    tmp = tempfile.mkdtemp(prefix="measure_restore_")
    out: dict = {"sf_dir": sf_dir, "rows": n, "versions": V}

    for label, extra in (("plain", {}), ("delta", {"delta_upserts": True})):
        kt = KeyedTable(spark, f"{tmp}/{label}", ["o_orderkey"],
                        num_buckets=64, versioned=True, **extra)
        kt.init(orders)
        for i in range(V):
            batch = (orders.where(F.col("o_orderkey").isin(
                keys[i * BATCH_KEYS:(i + 1) * BATCH_KEYS]))
                .withColumn("o_totalprice",
                            F.col("o_totalprice") + float(i + 1))
                .withColumn("Op", F.lit("U")))
            kt.merge_batch(batch)
        r: dict = {}
        r["read_latest_pre"], _ = _t(lambda: kt.read().count())
        # metadata restores at three depths: cost must be FLAT in the
        # distance rolled back (and in table size)
        for tgt in (V - 1, V // 2, 1):
            dt_, _ = _t(lambda t=tgt: kt.restore(t))
            r[f"restore_meta_to_{tgt}"] = round(dt_, 3)
        r["read_latest_post"], _ = _t(lambda: kt.read().count())
        if label == "delta":
            # the re-opened window's read tax, then the fold closes it
            r["fold_after_restore"], _ = _t(kt.fold_deltas)
            r["read_after_fold"], _ = _t(lambda: kt.read().count())
        dt_, _ = _t(lambda: kt.restore(1, materialize=True))
        r["restore_materialized"] = round(dt_, 3)
        dt_, deleted = _t(lambda: kt.purge_versions(keep_last=3))
        r["purge_after_restores"] = round(dt_, 3)
        r["purged_versions"] = len(deleted)
        r["read_after_purge"], _ = _t(lambda: kt.read().count())
        out[label] = {k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in r.items()}
        print(label, json.dumps(out[label]))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
