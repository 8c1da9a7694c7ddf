"""The query corpus: every operator from SURVEY §2 exposed as a named
(spark_fn, oracle_sql) pair for differential testing against DuckDB.

Each module defines ``QUERIES: dict[str, Query]``; keys are stable names
used by __spark_entry__ and the driver's CORRECTNESS gate.
"""

from .base import Query, load_table
from . import validation, cdc, joins, analytics, textops, simops

_MERGED: dict[str, Query] = {}
for _m in (validation, cdc, joins, analytics, textops, simops):
    _MERGED.update(_m.QUERIES)

# The driver's CORRECTNESS gate runs the FIRST 50 entries in iteration
# order.  Round 1 covered the first 50 in module order (all validation/
# cdc/joins + early analytics); the LLM-pipeline surface (textops/simops)
# and the window/asof/TPC-H-flagship analytics never got a hard-signal
# row.  Order those first here, then the queries whose round-1 row we
# most want re-confirmed (the q12 fix, the CDC merge family, the join
# family); everything after slot ~50 stays green via round-1 evidence.
_DRIVER_PRIORITY = [
    # LLM-pipeline: dedup / similarity / ANN ------------------------------
    "dedup_exact", "dedup_ngram_jaccard", "dedup_minhash_lsh",
    "dedup_simhash", "dedup_embedding_cosine",
    "ann_cosine_topk", "ann_lsh_bucket_topk", "ann_ivf_topk",
    # LLM-pipeline: text analysis ----------------------------------------
    "text_lang_id", "text_quality_stats", "text_token_count",
    "text_token_topk", "text_fuzzy_event_types", "doc_fingerprint",
    "dataset_split_assignment",
    # analytics flagships + window/asof/range/session families -----------
    "q1_pricing_summary", "q3_shipping_priority", "q5_nation_revenue",
    "q10_returned_items",
    "window_topn_per_segment", "window_rank_family",
    "window_moving_frame", "window_distribution_family",
    "argmax_order_per_customer", "gapfill_monthly_orders",
    "asof_event_last_order", "range_join_event_pairs",
    "events_sessionization", "events_hourly_tumbling",
    "scalar_datetime_showcase",
    # round-1-green rows worth re-confirming ------------------------------
    "q12_shipping_delay_classes",      # oracle type fix this round
    "val_approx_distinct",             # oracle contract added this round
    "cdc_pipeline_snapshot", "cdc_dedup_last_writer", "cdc_dedup_cascade",
    "cdc_dedup_bypass_stats", "cdc_merge_upsert_delete",
    "join_enriched_orders", "join_anti_customers_no_orders",
    "join_semi_active_customers", "join_full_outer_compare",
    "join_correlated_nation_counts", "set_ops_summary",
    "sql_surface_in_subquery",
    "val_row_counts", "val_agg_summary", "val_checksum",
    "val_ingestion_seq", "grouping_sets_status_priority",
    "cube_status_priority",
]

ALL_QUERIES: dict[str, Query] = {}
for _n in _DRIVER_PRIORITY:
    ALL_QUERIES[_n] = _MERGED[_n]
for _n, _q in _MERGED.items():
    if _n not in ALL_QUERIES:
        ALL_QUERIES[_n] = _q
assert len(ALL_QUERIES) == len(_MERGED)

__all__ = ["Query", "load_table", "ALL_QUERIES"]
