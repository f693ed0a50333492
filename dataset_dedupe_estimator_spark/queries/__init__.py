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
# Round-7 window (executes the rotation staged at r6 close, COVERAGE.md
# ledger): the 20 never-driver-checked queries (16 round-5-added held in
# the r6 _NEXT + the 4 round-6-added index/search entries) plus the 30
# stalest round-4-green queries (registry-order tiebreak — all 50
# r4-attested entries are equally stale).
_FRONT = [
    "customer_hierarchy_rollup",
    "supplier_pagerank",
    "user_value_twap",
    "near_dup_source_matrix",
    "bpe_train_merges",
    "bpe_token_stats",
    "doc_length_quantiles",
    "stratified_sample_docs",
    "streaming_index_pipeline",
    "image_near_dup_demo",
    "source_feature_corr",
    "dataset_card_stats",
    "mv_incremental_orders",
    "mv_from_version_diff",
    "streaming_mv_refresh",
    "snapshot_diff_docs",
    "bm25_index_search",
    "phrase_search_index",
    "hybrid_rrf",
    "table_zonemap_read",
    "spend_quartiles",
    "filter_project_scan",
    "distinct_ship_modes",
    "events_gapfill",
    "events_attribution",
    "events_dedup_burst",
    "events_daily_anomaly",
    "ngram_containment_pairs",
    "lsh_index_incremental",
    "dedup_near_groups",
    "dedup_near_survivors",
    "repetition_stats",
    "contamination_check",
    "corpus_survival_pipeline",
    "ann_ivf_trained",
    "ann_recall_at_k",
    "semantic_vs_lexical_pairs",
    "synthetic_generator_e2e",
    "split_assign",
    "cross_split_leakage",
    "split_purge_eval",
    "streaming_dedup_events",
    "streaming_view_click_join",
    "cdc_streaming_estimate",
    "multimodal_pipeline_demo",
    "fuzzy_match_customers",
    "data_quality_report",
    "profile_documents",
    "date_part_revenue",
    "quantity_percentiles",
]
# overflow: the 20 remaining round-4-green queries — first in line for
# round 8's window (locally re-verified every round)
_NEXT = [
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
]
# most recent driver green: CORRECTNESS_r06 (50/50 green — 49 oracle,
# 1 rows-only by design)
_TAIL = [
    "bm25_search",
    "table_time_travel",
    "zorder_layout",
    "dedup_substring_spans",
    "semdedup_clusters",
    "streaming_cms_counts",
    "grouping_sets_revenue",
    "trailing_window_revenue",
    "cdc_dedup_trend",
    "source_overlap_minhash",
    "q8_market_share",
    "q14_promo_revenue",
    "q19_disjunctive_revenue",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "semi_anti_customers",
    "dedup_keep_first",
    "ngram_jaccard_pairs",
    "minhash_signatures",
    "minhash_lsh_candidates",
    "simhash_signatures",
    "knn_brute_force",
    "ann_lsh_bucketed",
    "ann_ivf_probe",
    "embedding_dedup_pairs",
    "embedding_dedup_lsh",
    "label_centroid_spread",
    "set_ops_parts",
    "window_running_spend",
    "rollup_order_status",
    "cube_order_stats",
    "events_hourly",
    "events_daily_users",
    "q4_order_priority",
    "top_spenders",
    "asof_prev_order",
    "unpivot_part_metrics",
    "range_join_price_bands",
    "synthetic_generate_table",
    "q6_revenue_forecast",
    "events_json_extract",
    "window_top_orders_per_customer",
    "lang_score",
    "token_frequencies",
    "binary_digest_features",
    "text_quality",
    "dedup_exact_groups",
    "dedup_fingerprint_groups",
    "dedup_exact_events",
]
_missing = (set(_FRONT) | set(_NEXT) | set(_TAIL)) - REGISTRY.keys()
if _missing:
    raise ValueError(f"registry ordering references unknown queries: {_missing}")
if len(_FRONT) != 50:
    raise ValueError(f"driver window must be exactly 50 queries, got {len(_FRONT)}")
_middle = [n for n in REGISTRY if n not in _FRONT and n not in _NEXT and n not in _TAIL]
REGISTRY = {n: REGISTRY[n] for n in (*_FRONT, *_NEXT, *_middle, *_TAIL)}

__all__ = ["REGISTRY", "Q"]
