"""Write PLANS.md: the formatted physical plan of every headline query.

The scale design rules (broadcast dims, pruned scans, single-shuffle aggs,
TakeOrderedAndProject top-k, no cartesian LSH joins) are asserted in
tests/test_plans.py; this artifact makes the actual plans reviewable
without running Spark.

Usage: python tools/dump_plans.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    from dataset_dedupe_estimator_spark import get_spark
    from dataset_dedupe_estimator_spark.queries import REGISTRY

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="dump-plans", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    # plan-interesting non-headline queries worth reviewing alongside
    EXTRA = [
        "q2_min_cost_supplier",
        "q7_nation_volume",
        "q9_product_type_profit",
        "q15_top_supplier",
        "q17_small_quantity_revenue",
        "q18_large_orders",
        "q21_waiting_suppliers",
        "q22_idle_customers",
        "semdedup_clusters",
        "source_overlap_minhash",
        "dedup_keep_first_pruned",
        "charlm_familiarity",
        "events_funnel",
        "events_retention_cohorts",
        "split_assign",
        "split_purge_eval",
        "ann_recall_at_k",
        "semantic_vs_lexical_pairs",
        "spend_quartiles",
        "fuzzy_match_customers",
        "events_gapfill",
        # r4 additions
        "ivfpq_search",
        "rolling_active_users",
        "temporal_dim_join",
        "quality_classifier",
        "bpe_pair_frequencies",
        "events_late_arrivals",
        "orders_rfm_segments",
        "basket_part_pairs",
        "events_user_lifecycle",
        "events_markov_transitions",
        "session_top_paths",
        "dup_cluster_sizes",
        "cohort_ltv",
        "events_funnel_ttc",
        "source_drift_tvd",
        # r5 session-2 additions (table lifecycle + search + sampling)
        "bm25_search",
        "zorder_layout",
        "mv_incremental_orders",
        "snapshot_diff_docs",
        "stratified_sample_docs",
        "source_feature_corr",
        # r6 additions (hybrid retrieval, substring spans in the pipeline)
        "hybrid_rrf",
        "dedup_substring_spans",
        "corpus_survival_pipeline",
    ]
    lines = [
        "# Physical plans — headline + selected queries",
        "",
        f"`df.explain('formatted')` at `{sf_dir}`, `local[*]`, AQE on.",
        "Regenerate: `python tools/dump_plans.py`.",
        "",
    ]
    for name, q in REGISTRY.items():
        if not (q.headline or name in EXTRA):
            continue
        df = q.spark(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(mode)
        lines += [f"## {name}", "", "```", plan.rstrip(), "```", ""]
    out = os.path.join(REPO, "PLANS.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
