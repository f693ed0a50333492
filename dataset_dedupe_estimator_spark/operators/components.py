"""Distributed connected components over an edge DataFrame.

Near-duplicate detection yields candidate *pairs* (MinHash/SimHash/embedding
LSH); production dedup needs *groups* — "keep one document per duplicate
cluster" is a connected-components problem over the pair graph. The
reference engine has no analogue (it stops at chunk-level provenance);
this operator is part of the LLM-pipeline extension surface.

Algorithm: iterative minimum-label propagation with pointer jumping.
Each round every vertex takes the minimum component label among itself and
its neighbours (one join + one groupBy-min), then flattens one level of
indirection (``comp ← comp[comp]``, a self-join) — the pointer jump halves
label-chain lengths, so convergence is O(log diameter) rounds instead of
O(diameter). Dedup graphs are near-cliques (diameter 2-3), so 2-3 rounds
is typical regardless of corpus size.

Scale notes (100 TB):
- per round: two shuffles (neighbour min, pointer-jump join) over
  (vertex, label) longs — narrow rows, AQE-coalesced;
- ``localCheckpoint`` truncates lineage each round (iterative plans
  otherwise grow exponentially and stall the optimizer);
- the convergence check is a ``limit(1).count()`` on changed labels —
  an early-exit job, not a full materialization;
- hot component roots (a label shared by millions of vertices) only
  appear as *values*, never as grouping keys, so no skew on the root.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """(src, dst) edge list → (v, component) with component = min vertex id
    reachable from v. Vertices are every id appearing in any edge."""
    und = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .union(edges.select(F.col(dst).alias("src"), F.col(src).alias("dst")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        und.select(F.col("src").alias("v"))
        .distinct()
        .withColumn("comp", F.col("v"))
        .localCheckpoint()
    )
    for it in range(max_iter):
        nbr_min = (
            und.join(labels.withColumnRenamed("v", "src"), "src")
            .groupBy("dst")
            .agg(F.min("comp").alias("nc"))
            .withColumnRenamed("dst", "v")
        )
        stepped = labels.join(nbr_min, "v", "left").select(
            "v", F.least(F.col("comp"), F.coalesce(F.col("nc"), F.col("comp"))).alias("comp")
        )
        # pointer jump: follow one level of labels (comp <- comp[comp])
        lookup = stepped.select(
            F.col("v").alias("comp"), F.col("comp").alias("comp2")
        )
        jumped = (
            stepped.join(lookup, "comp", "left")
            .select(
                "v",
                F.least(F.col("comp"), F.coalesce(F.col("comp2"), F.col("comp"))).alias(
                    "comp"
                ),
            )
            .localCheckpoint()
        )
        # the convergence probe is its own Spark job — skip it on round 0,
        # where any graph with at least one non-trivial edge still changes
        if it > 0:
            changed = (
                jumped.alias("n")
                .join(labels.alias("o"), "v")
                .filter(F.col("n.comp") != F.col("o.comp"))
                .limit(1)
                .count()
            )
        else:
            changed = 1
        labels = jumped
        if changed == 0:
            break
    return labels


def component_summary(labels: DataFrame) -> DataFrame:
    """(component, n_members, keeper) — keeper = min vertex = the component
    id itself under min-label convention (kept explicit for clarity)."""
    return (
        labels.groupBy(F.col("comp").alias("component"))
        .agg(F.count(F.lit(1)).alias("n_members"), F.min("v").alias("keeper"))
        .orderBy("component")
    )
