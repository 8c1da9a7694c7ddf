#!/usr/bin/env python
"""Dump .explain('formatted') for bench-tracked corpus queries into
plans/<tag>/<query>_<suffix>.txt (round-13 optimization evidence).

Usage: python tools/capture_plans.py <tag> <suffix> [query ...]
e.g.   python tools/capture_plans.py r13 before
       python tools/capture_plans.py r13 after q1_pricing_summary
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from firebolt_cdc_lambda_spark.session import get_spark  # noqa: E402
from firebolt_cdc_lambda_spark.corpus import ALL_QUERIES  # noqa: E402

DEFAULT_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_nation_revenue",
    "join_enriched_orders",
    "window_topn_per_segment",
    "events_sessionization",
    "val_agg_summary",
    "cdc_dedup_cascade",
    "cdc_merge_upsert_delete",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_cosine_topk",
    "ann_ivf_topk",
    "text_quality_stats",
    "asof_event_last_order",
    "range_join_event_pairs",
    "q10_returned_items",
    "cdc_scd2_history",
    "events_funnel_steps",
    "cdc_scd2_pit_join",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r13"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:] or DEFAULT_QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(here, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="fcls-plans", extra_conf={
        "spark.sql.files.maxPartitionBytes": "16m",
    })
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = ALL_QUERIES[name].fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"))
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")


if __name__ == "__main__":
    main()
