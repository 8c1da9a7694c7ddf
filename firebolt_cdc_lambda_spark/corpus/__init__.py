"""The query corpus: every operator from SURVEY §2 exposed as a named
(spark_fn, oracle_sql) pair for differential testing against DuckDB.

Each module defines ``QUERIES: dict[str, Query]``; keys are stable names
used by __spark_entry__ and the driver's CORRECTNESS gate.
"""

from .base import Query, load_table
from . import validation, cdc, joins, analytics, textops, simops, dataprep, mediaops

_MERGED: dict[str, Query] = {}
for _m in (validation, cdc, joins, analytics, textops, simops, dataprep,
           mediaops):
    _MERGED.update(_m.QUERIES)

# The driver's CORRECTNESS gate runs the FIRST 50 entries in iteration
# order; _DRIVER_PRIORITY pins those 50 explicitly (module-dict order is
# irrelevant to the gate — new queries should still be appended at the
# END of their module dicts so the beyond-slot-50 tail stays stable).
# Rotation policy (every query gets a driver row, the freshest possible):
# round 1 gated the module-order first 50; round 2 the LLM surface +
# window/asof/TPC-H flagships; round 3 re-gated the 30 r1-only rows, the
# twelve new round-3 queries, and 8 r2 canaries.  ROUND 4 (this gate):
#   * slots 1-15 — the fifteen oracled queries that had NEVER had a
#     driver row (added after round 3's gate froze);
#   * slots 16-17 — the multimodal pair, upgraded from rows-only to full
#     literal-VALUES oracles (deterministic fixtures => fixed tables);
#   * slots 18-43 — all 26 queries whose newest driver row is round 2
#     (staleness-first re-gate);
#   * slots 44-50 — seven round-3-green canaries, ≥1 per family: CDC
#     merge + pipeline, TPC-H agg, LSH-pairs->connected-components,
#     incremental LSH gate, IVF ANN, validation summary.
# After round 4: union r1∪r2∪r3∪r4 = all 109 queries that existed when
# this gate froze, every one's newest driver row ≤ 2 rounds old (r3/r4).
# ROUND-5 ROTATION NOTE: seven queries were added AFTER this gate froze
# (appended at their module-dict ends, beyond slot 50): ann_pq_topk,
# cdc_out_of_order_replay, multimodal_png_neardup, text_bpe_pair_merge,
# text_ngram_novelty, embedding_int8_quant, multimodal_video_scenes.
# They are green in the local differential suite at sf0.001/sf0.01 but
# have never had a driver row — put them in round 5's slots 1-7, re-gate
# the queries whose newest row will then be round 3, and fill with
# family canaries.
_DRIVER_PRIORITY = [
    # never-driver-gated oracled queries ----------------------------------
    "text_bm25_search", "text_tfidf_keywords", "text_passage_dedup",
    "text_char_diversity", "text_chunk_overlap", "text_vocab_growth",
    "corpus_domain_cap", "corpus_drift_tv", "corpus_weighted_sample",
    "embedding_outlier_trim", "events_lead_lag_gaps", "skew_salted_agg",
    "sql_surface_listagg", "sql_surface_unpivot", "window_range_frame",
    # multimodal pair: first HASH-matchable driver rows -------------------
    "multimodal_image_neardup", "multimodal_audio_features",
    # newest driver row is round 2: staleness-first re-gate ---------------
    "argmax_order_per_customer", "gapfill_monthly_orders",
    "range_join_event_pairs", "window_moving_frame",
    "events_hourly_tumbling", "scalar_datetime_showcase",
    "window_distribution_family", "q3_shipping_priority",
    "q5_nation_revenue", "q10_returned_items", "window_topn_per_segment",
    "events_sessionization", "text_fuzzy_event_types",
    "dataset_split_assignment", "text_token_count", "text_quality_stats",
    "text_lang_id", "text_token_topk", "dedup_exact", "doc_fingerprint",
    "dedup_embedding_cosine", "dedup_ngram_jaccard", "dedup_minhash_lsh",
    "dedup_simhash", "ann_cosine_topk", "ann_lsh_bucket_topk",
    # round-3-green canaries, ≥1 per family -------------------------------
    "cdc_merge_upsert_delete", "cdc_pipeline_snapshot",
    "q1_pricing_summary", "dedup_cluster_assign",
    "dedup_incremental_filter", "ann_ivf_topk", "val_global_summary",
]
assert len(_DRIVER_PRIORITY) == 50, len(_DRIVER_PRIORITY)

ALL_QUERIES: dict[str, Query] = {}
for _n in _DRIVER_PRIORITY:
    ALL_QUERIES[_n] = _MERGED[_n]
for _n, _q in _MERGED.items():
    if _n not in ALL_QUERIES:
        ALL_QUERIES[_n] = _q
assert len(ALL_QUERIES) == len(_MERGED)

__all__ = ["Query", "load_table", "ALL_QUERIES"]
