"""operators/ranking.py — the distributed global-rank/prefix-sum
primitive every former single-partition window now rides on. Equivalence
oracle: the same computation via an unpartitioned window on a coalesced
copy (fine in a test, forbidden in the engine)."""

import pytest
from pyspark.sql import Window, functions as F

from dataset_dedupe_estimator_spark.operators.ranking import (
    type1_rank,
    with_global_cumsum,
    with_global_cumsums,
)


@pytest.fixture(scope="module")
def spark():
    from dataset_dedupe_estimator_spark import get_spark

    return get_spark(app_name="test-ranking", shuffle_partitions=8)


def _table(spark, n=5000, seed=7):
    # adversarial shape: heavy duplicate keys + a skewed hot value
    return spark.range(n).select(
        (F.col("id") % 97).alias("k"),
        F.when(F.col("id") % 10 == 0, 42).otherwise(F.col("id") % 701).alias("v"),
        (F.col("id") % 13 + 1).alias("w"),
    )


def test_row_number_matches_window_semantics(spark):
    df = _table(spark)
    ranked, n = with_global_cumsum(
        df, [F.col("v"), F.col("k")], out_col="rn", npart=16
    )
    assert n == df.count()
    got = ranked.orderBy("rn").collect()
    # ranks are exactly 1..n
    assert [r.rn for r in got] == list(range(1, n + 1))
    # and sorted by the requested total order
    keys = [(r.v, r.k) for r in got]
    assert keys == sorted(keys)


def test_weighted_cumsum_matches_single_partition_window(spark):
    df = _table(spark, n=2000)
    ranked, total = with_global_cumsum(
        df, [F.col("v"), F.col("k")], weight_col="w", out_col="cum", npart=16
    )
    w = Window.orderBy("v", "k").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        (r.v, r.k, r.cum)
        for r in df.coalesce(1).withColumn("cum", F.sum("w").over(w)).collect()
    }
    got = {(r.v, r.k, r.cum) for r in ranked.collect()}
    # ties within (v, k) may swap rows but the multiset of cumsums at
    # each key must match exactly when keys are unique per row-group;
    # compare per-key max (end-of-group cumsum), which is order-free
    def per_key_max(rows):
        out = {}
        for v, k, c in rows:
            out[(v, k)] = max(out.get((v, k), 0), c)
        return out

    assert per_key_max(got) == per_key_max(want)
    assert total == df.agg(F.sum("w")).collect()[0][0]


def test_multi_weight_single_pass(spark):
    df = _table(spark, n=1000)
    ranked, totals = with_global_cumsums(
        df,
        [F.col("v"), F.col("k")],
        {"rn": None, "cum_w": "w"},
        npart=8,
    )
    assert totals["rn"] == 1000
    assert totals["cum_w"] == df.agg(F.sum("w")).collect()[0][0]
    last = ranked.orderBy(F.col("rn").desc()).limit(1).collect()[0]
    assert last.rn == 1000 and last.cum_w == totals["cum_w"]


def test_descending_order(spark):
    df = _table(spark, n=500)
    ranked, _ = with_global_cumsum(
        df, [F.col("v").desc(), F.col("k").desc()], out_col="rn", npart=8
    )
    got = ranked.orderBy("rn").collect()
    keys = [(r.v, r.k) for r in got]
    assert keys == sorted(keys, reverse=True)


def test_empty_input(spark):
    df = _table(spark).filter(F.col("v") < -1)
    ranked, n = with_global_cumsum(df, [F.col("v")], out_col="rn")
    assert n == 0 and ranked.count() == 0


def test_plan_has_no_unpartitioned_window(spark):
    df = _table(spark)
    ranked, _ = with_global_cumsum(df, [F.col("v"), F.col("k")], out_col="rn")
    plan = ranked._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        s = line.strip().lstrip("+-: *")
        if s.startswith("Window "):
            groups = s.count("], [") + 1
            last = s.rsplit("], [", 1)[-1]
            assert not (
                groups < 3 and (" ASC" in last or " DESC" in last)
            ), f"unpartitioned ordered window: {s[:160]}"


def test_type1_rank_matches_python_quantile():
    # k = floor(p*(n-1)) + 1 — spot-check against the definition
    assert type1_rank(1, 1, 2) == 1
    assert type1_rank(10, 1, 2) == 5
    assert type1_rank(10, 9, 10) == 9
    assert type1_rank(101, 3, 4) == 76
