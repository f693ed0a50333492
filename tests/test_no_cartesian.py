"""Engine-wide plan-regression guard: no registry query may plan an
unpartitioned CartesianProduct — the silent scale-killer — and
BroadcastNestedLoopJoin is allowed only where a tiny/scalar side is
deliberately broadcast (query vectors, count rows, centroid tables,
source dims). New queries that trip this either need a broadcast hint or
an equi-join key."""

import pytest

from dataset_dedupe_estimator_spark.queries import REGISTRY

# execute work eagerly at construction (streams, demo pipelines, trained
# models) — their plans can't be inspected without running them; each is
# covered by its own tests/oracle instead
EAGER = {
    "streaming_dedup_events",
    "streaming_windowed_counts",
    "streaming_sessionize_events",
    "streaming_cms_counts",
    "cdc_streaming_estimate",
    "format_compare_demo",
    "multimodal_pipeline_demo",
    "ann_ivf_trained",
    "synthetic_generator_e2e",
    "cdc_index_incremental",
    "lsh_index_incremental",
    "streaming_index_pipeline",
    "bpe_train_merges",  # iterative training loop runs at construction
    "bpe_token_stats",  # trains then encodes at construction
    "image_near_dup_demo",  # generates + decodes media at construction
    "table_time_travel",  # commits a real versioned table at construction
    "table_zonemap_read",  # commits + zone-map-prunes a versioned table at construction
    "bm25_index_search",  # builds + admits a persistent inverted index at construction
    "table_delete_where",  # commits + pruned-deletes a versioned table at construction
    "bm25_delete_search",  # builds + tombstone-deletes a persistent index at construction
    "phrase_search_index",  # builds a persistent inverted index at construction
    "mv_from_version_diff",  # commits + diffs a versioned table at construction
    "streaming_mv_refresh",  # runs a real file stream at construction
}

# deliberate tiny-side broadcasts (scalar aggregates, query vectors,
# centroids, source dims, band constants) — reviewed one by one
BNLJ_ALLOWED = {
    "unigram_surprisal",  # corpus-total count row
    "mixture_sample",  # corpus-total + weight-mass scalar row (replaced the full-frame window)
    "supplier_pagerank",  # node-count scalar row broadcast into each unrolled iteration
    "q22_idle_customers",  # global-average scalar row
    "bm25_search",  # N/avgdl corpus-stats scalar row broadcast into scoring
    "q11_important_parts",  # global-total scalar row (HAVING fraction gate)
    "knn_brute_force",  # single query vector
    "hybrid_rrf",  # single query vector broadcast into the cosine leg (bm25 leg inherits bm25_search's stats row)
    "semdedup_clusters",  # corpus-count row driving adaptive K
    "ann_lsh_bucketed",  # single query bucket row
    "ann_recall_at_k",  # count row + ~1%-sample probe table (ground-truth side is brute force BY DESIGN)
    "ann_ivf_probe",  # query-cell row
    "ivfpq_search",  # centroid dim + query row + probed-cell ids (all broadcast scalars/dims)
    "rolling_active_users",  # max-day scalar row bounds the explode spine
    "orders_rfm_segments",  # quartile-boundary scalar rows (two 3-double aggregates)
    "basket_part_pairs",  # total-orders scalar row feeds the lift denominator
    "source_drift_tvd",  # min/max + corpus-count scalar rows; bin dim is DRIFT_BINS rows
    "embedding_dedup_pairs",  # brute-force baseline BY DESIGN (docstring)
    "embedding_dedup_lsh",  # corpus-count row driving adaptive planes
    "semantic_vs_lexical_pairs",  # inherits embedding_dedup_lsh's count row
    "range_join_price_bands",  # band dim (a handful of rows)
    "source_overlap_minhash",  # source-dim pair universe (tiny cardinality)
    "events_gapfill",  # hour-spine x type-dim cross join (O(hours x types), both aggregate-derived)
}


def _plan(df) -> str:
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


@pytest.mark.parametrize("name", [n for n in REGISTRY if n not in EAGER])
def test_no_unbroadcast_cartesian(spark, sf_dir, name):
    plan = _plan(REGISTRY[name].spark(spark, sf_dir))
    assert "CartesianProduct" not in plan, (
        f"{name} plans a CartesianProduct — broadcast the small side or "
        "add an equi-join key"
    )
    if name not in BNLJ_ALLOWED:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name} plans a BroadcastNestedLoopJoin; if the broadcast side "
            "is deliberately tiny, add it to BNLJ_ALLOWED with a reason"
        )
