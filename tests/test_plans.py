"""Physical-plan assertions: the optimizations the engine is designed
around must actually appear in the plans — predicate pushdown + column
pruning at the scan, broadcast (never sort-merge) dim joins, sort-limit
top-k, no cartesian products in LSH paths."""

import pytest

from dataset_dedupe_estimator_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    df = REGISTRY[name].spark(spark, SF)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def test_filter_pushdown_and_pruning(spark):
    p = plan_of(spark, "filter_project_scan")
    assert "PushedFilters: [" in p
    assert "GreaterThanOrEqual(l_quantity,45.0)" in p
    # pruned read schema: only the referenced columns, not all 11
    read_schema = next(l for l in p.splitlines() if "ReadSchema" in l)
    assert "l_comment" not in read_schema
    assert read_schema.count(":") <= 7


def test_q5_broadcasts_dims(spark):
    p = plan_of(spark, "q5_local_supplier_volume")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_topk_is_sort_limit(spark):
    p = plan_of(spark, "top_spenders")
    assert "TakeOrderedAndProject" in p  # no global sort for top-k


def test_lsh_paths_avoid_cartesian(spark):
    import re

    # minhash: the band self-join must be hash/merge-based, never
    # nested-loop
    p = plan_of(spark, "minhash_lsh_candidates")
    assert "CartesianProduct" not in p
    assert any(
        j in p for j in ("ShuffledHashJoin", "SortMergeJoin", "BroadcastHashJoin")
    )
    assert not re.findall(r"\(\d+\) BroadcastNestedLoopJoin", p)

    # embedding_dedup_lsh (r14 shape): NO pair join at all — postings
    # are grouped by (table_id, bucket) and pairs + cosines come out of
    # one Arrow kernel, so the only nested-loop allowed is the single
    # 1-row scalar-count attach feeding the adaptive plane ladder
    p = plan_of(spark, "embedding_dedup_lsh")
    assert "CartesianProduct" not in p
    bnlj_ops = set(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", p))
    assert len(bnlj_ops) <= 1
    # positive pins on the r14 shape: ONE posting exchange keyed by the
    # bucket, the posting-list aggregate, and the pair kernel
    assert "hashpartitioning(table_id" in p
    assert "collect_list" in p
    assert "MapInArrow" in p


def test_brute_force_pair_scan_is_explicit_cross(spark):
    # the documented-quadratic baseline IS a cross join — and stays out of
    # the headline bench set
    assert not REGISTRY["embedding_dedup_pairs"].headline


def test_q1_aggregation_is_hash_agg(spark):
    p = plan_of(spark, "q1_pricing_summary")
    assert "HashAggregate" in p
    assert "SortAggregate" not in p


def test_repetition_stats_is_shuffle_free_projection(spark):
    # Gopher-style repetition metrics must stay a pure projection over the
    # scan: the only exchange allowed is the presentation-edge sort
    p = plan_of(spark, "repetition_stats")
    assert "Exchange hashpartitioning" not in p
    assert "Join" not in p
    read_schema = next(l for l in p.splitlines() if "ReadSchema" in l)
    assert "lang" not in read_schema and "source" not in read_schema


def test_contamination_broadcasts_eval_set(spark):
    # the eval shingle set is tiny by construction: it must broadcast, the
    # training corpus must never shuffle for the join
    p = plan_of(spark, "contamination_check")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_chunk_stats_single_shuffle(spark):
    from dataset_dedupe_estimator_spark.operators.chunker import chunk_files
    from dataset_dedupe_estimator_spark.plans.estimate import chunk_stats
    import glob

    chunks = chunk_files(spark, sorted(glob.glob(f"{SF}/*.parquet")))
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    p = chunk_stats(chunks)._jdf.queryExecution().explainString(mode)
    # one shuffle for groupBy(hash); the final single-row agg coalesces
    assert p.count("Exchange hashpartitioning") <= 1


# Queries rewritten in round 3 to eliminate double fact scans (the
# broadcast-the-derived-aggregate-back pattern recomputes the whole
# subtree when AQE exchange reuse fails across different column
# prunings). Assert the POST-EXECUTION adaptive plan reads the fact
# table once.
SINGLE_SCAN = [
    ("q15_top_supplier", "lineitem"),
    ("q17_small_quantity_revenue", "lineitem"),
    ("q2_min_cost_supplier", "lineitem"),
    ("q21_waiting_suppliers", "lineitem"),
    ("charlm_familiarity", "documents"),
    ("tfidf_top_terms", "documents"),
    ("vocab_coverage_score", "documents"),
    ("events_funnel", "events"),
    ("events_retention_cohorts", "events"),
    ("cms_token_counts", "documents"),
    ("effective_token_budget", "documents"),
    ("events_gapfill", "events"),
    ("events_attribution", "events"),
    ("events_dedup_burst", "events"),
]


@pytest.mark.parametrize("name,table", SINGLE_SCAN)
def test_single_fact_scan(spark, sf_dir, name, table):
    from dataset_dedupe_estimator_spark.queries import REGISTRY

    df = REGISTRY[name].spark(spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    if "+- == Initial Plan ==" in plan:
        plan = plan.split("+- == Initial Plan ==")[0]
    n = plan.count(f"{table}.parquet")
    assert n == 1, f"{name}: {table} scanned {n}x in the final plan"


def test_gapfill_spine_is_dense(spark):
    rows = REGISTRY["events_gapfill"].spark(spark, SF).collect()
    hours = {r.hour for r in rows}
    types = {r.event_type for r in rows}
    # dense grid: every (hour, type) cell exactly once, gaps flagged
    assert len(rows) == len(hours) * len(types)
    assert all((r.n_events == 0) == r.is_gap for r in rows)
    assert any(r.is_gap for r in rows) or len(hours) * len(types) == sum(
        1 for r in rows if not r.is_gap
    )
    # plan never falls back to a shuffled cartesian: spine sides broadcast
    plan = plan_of(spark, "events_gapfill")
    assert "CartesianProduct" not in plan


def test_fuzzy_match_blocked_hash_join(spark):
    rows = REGISTRY["fuzzy_match_customers"].spark(spark, SF).collect()
    assert rows, "dirty feed must produce matches"
    # every dirty record resolves at edit distance 1 (single-char corruption)
    assert all(r.edit_distance == 1 for r in rows)
    assert all(r.crm_id % 10 == 3 for r in rows)
    # candidate generation is a hash equi-join on the blocking key,
    # never an all-pairs nested loop
    plan = plan_of(spark, "fuzzy_match_customers")
    assert "BroadcastNestedLoop" not in plan and "CartesianProduct" not in plan


def test_burst_dedup_matches_python_reference(spark):
    """events_dedup_burst vs a brute-force per-key reference on a dense
    synthetic timeline (including chains where every inter-event gap is
    below the horizon but the chain itself spans more than one horizon —
    the case a lag-only filter gets wrong)."""
    import itertools

    from dataset_dedupe_estimator_spark.queries.events import (
        BURST_GAP_S,
        events_dedup_burst,
    )

    # deterministic scattered events: 3 users x 2 types, bursty times
    rows = []
    eid = 0
    for u, t in itertools.product([1, 2, 3], ["click", "view"]):
        base = 1_700_000_000 + u * 7919 + len(t)
        for k in range(40):
            # clusters of 4 events 100 s apart, clusters 1000 s apart:
            # within a cluster every gap (100 s) < 300 s, but the cluster
            # spans 300 s — keep-first must still collapse it to ONE
            ts = base + (k // 4) * 1000 + (k % 4) * 100
            rows.append((eid, ts, u, t, 0.0, "{}"))
            eid += 1
    import pandas as pd

    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts_s", "user_id", "event_type", "value", "props"]
    )
    pdf["ts"] = pd.to_datetime(pdf.ts_s, unit="s")
    sdf = spark.createDataFrame(
        pdf[["event_id", "ts", "user_id", "event_type", "value", "props"]]
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        sdf.write.parquet(f"{d}/events.parquet")
        got = {
            (r.user_id, r.event_type, r.burst_id): (r.keeper_event_id, r.n_collapsed)
            for r in events_dedup_burst(spark, d).collect()
        }

    # python reference
    want = {}
    for (u, t), grp in pdf.groupby(["user_id", "event_type"]):
        grp = grp.sort_values(["ts_s", "event_id"])
        burst, prev, keeper, n = 0, None, None, 0
        for _, r in grp.iterrows():
            if prev is None or r.ts_s - prev >= BURST_GAP_S:
                if keeper is not None:
                    want[(u, t, burst)] = (keeper, n)
                burst += 1
                keeper, n = r.event_id, 0
            n += 1
            prev = r.ts_s
        want[(u, t, burst)] = (keeper, n)
    assert got == want
    # clusters of 4 collapse to one keeper each
    assert all(n == 4 for _k, n in got.values())


def test_temporal_dim_join_is_broadcast_equi(spark):
    """SCD2 join must stay an equi hash join on custkey with the validity
    range as residual — never a range-driven BNLJ over the fact table."""
    p = plan_of(spark, "temporal_dim_join")
    assert "BroadcastHashJoin" in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "SortMergeJoin" not in p


def test_quality_classifier_rides_the_scan(spark):
    """Classifier inference is expression-only: exactly one exchange (the
    final per-source rollup), no joins, no window."""
    p = plan_of(spark, "quality_classifier")
    # the rollup exchange + the orderBy's range exchange, nothing else
    assert p.count(") Exchange") <= 2
    assert "Join" not in p and "Window" not in p


def test_rfm_has_no_global_window(spark):
    """Quartile boundaries come from broadcast percentile aggregates, not
    a single-partition NTILE window."""
    p = plan_of(spark, "orders_rfm_segments")
    assert "Window" not in p
    assert "BroadcastExchange" in p


# ---- engine-wide: no single-partition window anywhere -------------------

from test_no_cartesian import EAGER as _EAGER  # noqa: E402


# Deliberate unpartitioned windows whose input is bounded by a CONSTANT
# or the value DOMAIN (never corpus cardinality) — reviewed one by one,
# the same posture as test_no_cartesian.BNLJ_ALLOWED.
GLOBAL_WINDOW_ALLOWED = {
    # row_number over a TakeOrderedAndProject head of SEM_MAX_K=4096
    # rows — a constant; the corpus never reaches the window
    "semdedup_clusters",
    # scalar moment window over the per-DAY aggregate: cardinality is
    # bounded by the calendar domain (thousands of rows per decade)
    "events_daily_anomaly",
    # final scalar max over the <=Q15_BUCKETS per-bucket champions —
    # constant-bounded by construction (see q15_top_supplier docstring)
    "q15_top_supplier",
    # per-leg rank windows run over TakeOrdered heads of RRF_POOL=50
    # rows each — constants; the corpus never reaches a window
    # (hybrid_rrf_frame docstring)
    "hybrid_rrf",
}


def _unpartitioned_window_lines(plan: str) -> list[str]:
    """Window nodes print `Window [exprs], [partSpec], [orderSpec]`;
    either trailing spec may be absent when empty. An absent PARTITION
    spec means every input row funnels through ONE task:
      `Window [exprs], [x ASC ...]`  -> unpartitioned ORDERED (global sort)
      `Window [exprs]`               -> unpartitioned full-frame scalar
      `Window [exprs], [part]`       -> partitioned (fine)
    The order spec is recognisable by ASC/DESC markers. WindowGroupLimit
    prints its empty partition spec as `[]`."""
    bad = []
    for line in plan.splitlines():
        s = line.strip().lstrip("+-: *")
        if s.startswith("WindowGroupLimit []"):
            bad.append(line.strip())
            continue
        if not s.startswith("Window "):
            continue
        groups = s.count("], [") + 1
        last = s.rsplit("], [", 1)[-1]
        ordered_last = " ASC" in last or " DESC" in last
        if groups >= 3:
            continue  # [exprs], [part], [order]
        if groups == 2 and not ordered_last:
            continue  # [exprs], [part] — partitioned, unordered frame
        bad.append(line.strip())
    return bad


@pytest.mark.parametrize(
    "name", [n for n in REGISTRY if n not in _EAGER | GLOBAL_WINDOW_ALLOWED]
)
def test_no_unpartitioned_window(spark, sf_dir, name):
    """The one plan shape that cannot survive a 100x scale-up: a window
    with an empty partition spec moves its whole input through ONE task.
    Global ranks/prefix-sums/quantiles must go through
    operators/ranking.py (range-partition + offset broadcast) instead;
    constant/domain-bounded exceptions live in GLOBAL_WINDOW_ALLOWED
    with a per-entry reason."""
    df = REGISTRY[name].spark(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    bad = _unpartitioned_window_lines(plan)
    assert not bad, (
        f"{name} plans an unpartitioned window (single-partition shape):\n"
        + "\n".join(bad[:3])
    )


def test_keys_delete_is_anti_join_without_key_collect(spark, tmp_path, monkeypatch):
    """The APPLY CHANGES delete phase's 100 TB pin: delete_where_keys
    rewrites candidate files through a LEFT ANTI join against the key
    frame — no IN-list literal in any written plan, and no driver-side
    collect bigger than O(touched files). (The r12 shape collected the
    keys into a 1M-literal predicate; this pins the regression.)"""
    from pyspark.sql import functions as F
    from pyspark.sql.classic.dataframe import DataFrame
    from pyspark.sql.readwriter import DataFrameWriter

    from dataset_dedupe_estimator_spark.sources import versioned as vt

    root = tmp_path / "t"
    vt.append(
        root,
        spark.range(100).select("id", (F.col("id") * 2).alias("v")),
        stats_columns=["id"],
    )
    plans = []
    orig_parquet = DataFrameWriter.parquet

    def spy_parquet(self, *a, **k):
        plans.append(self._df._jdf.queryExecution().optimizedPlan().toString())
        return orig_parquet(self, *a, **k)

    sizes = []
    orig_collect = DataFrame.collect

    def spy_collect(self):
        out = orig_collect(self)
        sizes.append(len(out))
        return out

    monkeypatch.setattr(DataFrameWriter, "parquet", spy_parquet)
    monkeypatch.setattr(DataFrame, "collect", spy_collect)
    st = vt.delete_where_keys(
        spark, root, "id", spark.range(40_000).toDF("id")
    )
    assert st["committed"] and st["deleted_rows"] == 100
    assert any("Join LeftAnti" in p for p in plans), plans
    assert not any(" IN (" in p or "In(id" in p for p in plans), plans
    # driver saw only file names / scalar stats, never the key set
    assert sizes and max(sizes) < 1_000
