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
# Round-11 window (executes the rotation staged at r10 close, COVERAGE.md
# ledger): the 38 round-7-green queries held in the r10 _NEXT
# (lsh_index_incremental ... snapshot_diff_docs) plus the 12 stalest
# round-8-green queries (registry-order tiebreak — all 50 r8-attested
# entries are equally stale: temporal_dim_join ... events_funnel).
# Queries added DURING r11 displace the tail of the r8-green fill into
# _NEXT so they carry driver attestation the same round they land (the
# r9/r10 pattern).
_FRONT = [
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
# overflow: the remaining round-8-green queries (head: the r8-green
# fill displaced by the query added during r11) — first in line for
# round 12's window (locally re-verified every round)
_NEXT = [
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
]
# most recent driver green: CORRECTNESS_r10 (49 oracle-green + 1
# rows-only by design)
_TAIL = [
    "dedup_exact_events",
    "dedup_fingerprint_groups",
    "dedup_keep_first",
    "ngram_jaccard_pairs",
    "minhash_signatures",
    "minhash_lsh_candidates",
    "simhash_signatures",
    "bm25_search",
    "text_quality",
    "binary_digest_features",
    "lang_score",
    "token_frequencies",
    "knn_brute_force",
    "semdedup_clusters",
    "ann_lsh_bucketed",
    "ann_ivf_probe",
    "embedding_dedup_pairs",
    "embedding_dedup_lsh",
    "label_centroid_spread",
    "synthetic_generate_table",
    "streaming_cms_counts",
    "grouping_sets_revenue",
    "trailing_window_revenue",
    "asof_prev_order",
    "unpivot_part_metrics",
    "range_join_price_bands",
    "cube_order_stats",
    "cdc_dedup_trend",
    "dedup_substring_spans",
    "source_overlap_minhash",
    "q8_market_share",
    "q14_promo_revenue",
    "q19_disjunctive_revenue",
    "table_time_travel",
    "zorder_layout",
    "customer_hierarchy_rollup",
    "supplier_pagerank",
    "spend_quartiles",
    "filter_project_scan",
    "distinct_ship_modes",
    "user_value_twap",
    "events_gapfill",
    "events_attribution",
    "events_dedup_burst",
    "events_daily_anomaly",
    "near_dup_source_matrix",
    "ngram_containment_pairs",
    "table_archive_read",
    "table_nested_read",
    "table_type_widening_read",
]
_missing = (set(_FRONT) | set(_NEXT) | set(_TAIL)) - REGISTRY.keys()
if _missing:
    raise ValueError(f"registry ordering references unknown queries: {_missing}")
if len(_FRONT) != 50:
    raise ValueError(f"driver window must be exactly 50 queries, got {len(_FRONT)}")
_middle = [n for n in REGISTRY if n not in _FRONT and n not in _NEXT and n not in _TAIL]
REGISTRY = {n: REGISTRY[n] for n in (*_FRONT, *_NEXT, *_middle, *_TAIL)}

__all__ = ["REGISTRY", "Q"]
