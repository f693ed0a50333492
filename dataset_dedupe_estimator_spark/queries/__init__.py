"""Query registry: every operator from SURVEY.md §2 exposed as a
(spark_fn, oracle_sql) pair for the driver's correctness gate.

Each module contributes ``QUERIES: dict[str, Q]``; ``Q.spark`` is
``(SparkSession, sf_dir) -> DataFrame`` and ``Q.oracle`` is equivalent ANSI
SQL for DuckDB (None → rows-only check for non-SQL-expressible operators).
"""

from __future__ import annotations

from dataset_dedupe_estimator_spark.queries.base import Q

from dataset_dedupe_estimator_spark.queries import (  # noqa: E402
    advanced,
    core_cdc,
    corpus_dedup,
    corpus_quality,
    dedupe_text,
    events,
    maintenance,
    relational,
    similarity,
    splits,
    streaming_gate,
    synthetic_e2e,
    synthetic_sql,
    text_analysis,
    tpch_deep,
)

REGISTRY: dict[str, Q] = {}
for _mod in (relational, events, dedupe_text, text_analysis, similarity, synthetic_sql, synthetic_e2e, splits, streaming_gate, advanced, core_cdc, corpus_dedup, corpus_quality, tpch_deep, maintenance):
    overlap = REGISTRY.keys() & _mod.QUERIES.keys()
    if overlap:
        raise ValueError(f"duplicate query names: {overlap}")
    REGISTRY.update(_mod.QUERIES)

# The external driver's correctness gate records the FIRST 50 registry
# entries per round. Rotation scheme (also documented in COVERAGE.md):
# every round, _FRONT = (queries never driver-checked) + (queries whose
# last driver-side green is oldest), sized to exactly 50; _NEXT holds the
# overflow (first in line next round); _TAIL holds the most-recently
# driver-checked.  EVERY oracle-bearing query — front, next, and tail —
# is additionally re-verified locally every round by
# tools/check_oracles.py (dtype-faithful replica of the driver's gate),
# so rotation only affects which subset gets *driver-side* attestation,
# never whether a regression is caught.
#
# Round-12 window (executes the rotation staged at r11 close, COVERAGE.md
# ledger): the 43 round-8-green queries held in the r11 _NEXT
# (events_user_lifecycle ... table_bloom_read) plus the 7 stalest
# round-9-green queries (registry-order tiebreak — all 50 r9-attested
# entries are equally stale: q1_pricing_summary ...
# window_top_orders_per_customer).  Queries added DURING r12 displace the
# tail of the r9-green fill into _NEXT so they carry driver attestation
# the same round they land (the r9/r10/r11 pattern).
_FRONT = [
    "events_user_lifecycle",
    "events_markov_transitions",
    "session_top_paths",
    "events_funnel_ttc",
    "events_funnel",
    "events_retention_cohorts",
    "events_sessionize",
    "dup_cluster_sizes",
    "simhash_candidates",
    "kmv_sketches",
    "cms_token_counts",
    "bm25_delete_search",
    "bpe_pair_frequencies",
    "vocab_coverage_score",
    "effective_token_budget",
    "source_token_stats",
    "pq_codes",
    "token_bpe_ish",
    "rolling_hash_fingerprint",
    "cdc_estimate",
    "format_compare_demo",
    "cdc_per_file_chunks",
    "cdc_provenance",
    "cdc_estimate_xet",
    "cdc_approx_estimate",
    "cdc_index_incremental",
    "doc_chunk_windows",
    "pii_scan",
    "charlm_familiarity",
    "ngram_novelty",
    "q2_min_cost_supplier",
    "q9_product_type_profit",
    "q11_important_parts",
    "q12_late_shipment_priority",
    "q16_supplier_diversity",
    "q20_dominant_suppliers",
    "q21_waiting_suppliers",
    "table_delete_where",
    "table_upsert_merge",
    "table_stream_read",
    "table_compact_read",
    "table_cdf_read",
    "table_bloom_read",
    "q1_pricing_summary",
    "q4_order_priority",
    "table_purge_read",
    "table_cdc_apply_read",
    "table_replicate_read",
    "cdc_upload_delta",
    "table_stream_sink_read",
]
# overflow: the remaining round-9-green queries — first in line for
# round 13's window (locally re-verified every round)
_NEXT = [
    "q6_revenue_forecast",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "top_spenders",
    "window_top_orders_per_customer",
    "window_running_spend",
    "rollup_order_status",
    "semi_anti_customers",
    "set_ops_parts",
    "events_hourly",
    "events_json_extract",
    "events_daily_users",
    "dedup_exact_groups",
    "ivfpq_search",
    "synthetic_delete_rows",
    "synthetic_insert_rows",
    "synthetic_update_rows",
    "synthetic_update_column",
    "synthetic_append_rows",
    "streaming_windowed_counts",
    "streaming_sessionize_events",
    "salted_agg_lineitem",
    "merge_upsert_orders",
    "dedup_keep_first_pruned",
    "dedup_spans",
    "mixture_sample",
    "sequence_pack",
    "quality_classifier",
    "source_drift_tvd",
    "unigram_surprisal",
    "tfidf_top_terms",
    "bloom_incremental_dedup",
    "q7_nation_volume",
    "q10_returned_items",
    "q13_order_distribution",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q18_large_orders",
    "q22_idle_customers",
    "table_checkpoint_read",
    "table_restore_read",
    "table_dv_delete_read",
    "table_concurrent_append_read",
    "table_rename_read",
    "table_drop_read",
    "table_clone_read",
    "table_partition_evolution_read",
]
# most recent driver green: CORRECTNESS_r11 (43 oracle-green + 7
# rows-only by design)
_TAIL = [
    "lsh_index_incremental",
    "dedup_near_groups",
    "dedup_near_survivors",
    "bm25_index_search",
    "phrase_search_index",
    "bpe_train_merges",
    "bpe_token_stats",
    "doc_length_quantiles",
    "repetition_stats",
    "contamination_check",
    "corpus_survival_pipeline",
    "ann_ivf_trained",
    "ann_recall_at_k",
    "semantic_vs_lexical_pairs",
    "hybrid_rrf",
    "synthetic_generator_e2e",
    "split_assign",
    "stratified_sample_docs",
    "cross_split_leakage",
    "split_purge_eval",
    "streaming_dedup_events",
    "streaming_view_click_join",
    "cdc_streaming_estimate",
    "streaming_index_pipeline",
    "image_near_dup_demo",
    "multimodal_pipeline_demo",
    "fuzzy_match_customers",
    "data_quality_report",
    "profile_documents",
    "source_feature_corr",
    "date_part_revenue",
    "quantity_percentiles",
    "dataset_card_stats",
    "mv_incremental_orders",
    "table_zonemap_read",
    "mv_from_version_diff",
    "streaming_mv_refresh",
    "snapshot_diff_docs",
    "temporal_dim_join",
    "orders_rfm_segments",
    "basket_part_pairs",
    "cohort_ltv",
    "conditional_pivot_brands",
    "rolling_active_users",
    "events_late_arrivals",
    "table_deep_nested_read",
    "cdc_stats_oracle",
    "cdc_trend_oracle",
    "table_update_read",
    "table_dv_update_read",
]
_missing = (set(_FRONT) | set(_NEXT) | set(_TAIL)) - REGISTRY.keys()
if _missing:
    raise ValueError(f"registry ordering references unknown queries: {_missing}")
if len(_FRONT) != 50:
    raise ValueError(f"driver window must be exactly 50 queries, got {len(_FRONT)}")
_middle = [n for n in REGISTRY if n not in _FRONT and n not in _NEXT and n not in _TAIL]
REGISTRY = {n: REGISTRY[n] for n in (*_FRONT, *_NEXT, *_middle, *_TAIL)}

__all__ = ["REGISTRY", "Q"]
