"""Connected components: correctness on hand graphs, logarithmic
convergence on chains (pointer jumping), dedup-group composition."""

from pyspark.sql import functions as F

from dataset_dedupe_estimator_spark.operators.components import (
    component_summary,
    connected_components,
)


def _cc(spark, pairs, **kw):
    edges = spark.createDataFrame(pairs, "src long, dst long")
    return {
        r.v: r.comp for r in connected_components(edges, **kw).collect()
    }


def test_two_components(spark):
    got = _cc(spark, [(1, 2), (2, 3), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_chain_converges(spark):
    # a 24-node path is the worst case for plain min-propagation
    # (diameter rounds); pointer jumping must close it within max_iter=8
    n = 24
    got = _cc(spark, [(i, i + 1) for i in range(n)], max_iter=8)
    assert set(got.values()) == {0}
    assert len(got) == n + 1


def test_cross_linked_cliques(spark):
    pairs = [(1, 2), (2, 3), (1, 3), (7, 8), (8, 9), (3, 7)]
    got = _cc(spark, pairs)
    assert set(got.values()) == {1}


def test_component_summary(spark):
    edges = spark.createDataFrame([(5, 2), (2, 9), (30, 31)], "src long, dst long")
    rows = component_summary(connected_components(edges)).collect()
    assert [(r.component, r.n_members, r.keeper) for r in rows] == [
        (2, 3, 2),
        (30, 2, 30),
    ]


def test_self_and_duplicate_edges(spark):
    got = _cc(spark, [(4, 4), (4, 5), (5, 4), (4, 5)])
    assert got == {4: 4, 5: 4}


def _union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonicalize every component label to its minimum member
    comp_min = {}
    for v in list(parent):
        r = find(v)
        comp_min[r] = min(comp_min.get(r, v), v)
    return {v: comp_min[find(v)] for v in parent}


def test_random_graphs_match_union_find(spark):
    import random

    rng = random.Random(20260813)
    for trial in range(3):
        n = 40
        pairs = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(rng.randrange(10, 50))
        ]
        assert _cc(spark, pairs) == _union_find(pairs), pairs
