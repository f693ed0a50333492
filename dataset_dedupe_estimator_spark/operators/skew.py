"""Skew-mitigation utilities for hot-key aggregation and joins.

At 100 TB, degenerate data produces hot keys: constant columns chunk into
a handful of hashes (src/store.rs zero-page note, SURVEY §4.3), a few
shingles appear in every document, one user dominates an event stream.
AQE's skew-join splitting handles *joins*; hot-key *aggregations* with
algebraic functions are handled here by salting: aggregate on
(key, salt) first — spreading each hot key over N partial rows — then
re-aggregate on the key.

For algebraic aggregates (sum/count/min/max) the two-phase result is
exactly the single-phase result; this utility refuses non-algebraic ones.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MERGE = {
    "sum": F.sum,
    "count": F.sum,  # partial counts re-aggregate by summing
    "min": F.min,
    "max": F.max,
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 32,
) -> DataFrame:
    """Two-phase salted aggregation.

    aggs maps output column → (fn, input column) with fn in
    {sum, count, min, max}. Example::

        salted_agg(chunks, ["hash"], {"occ": ("count", "*"),
                                      "bytes": ("sum", "size")})
    """
    unknown = {fn for fn, _ in aggs.values()} - _MERGE.keys()
    if unknown:
        raise ValueError(
            f"non-algebraic aggregate(s) {sorted(unknown)}: salting would "
            "change their result; use a plain groupBy"
        )
    salted = df.withColumn("__salt", (F.rand(seed=42) * n_salts).cast("int"))
    partial_exprs = []
    for out, (fn, col) in aggs.items():
        expr = F.count(F.lit(1)) if fn == "count" else getattr(F, fn)(F.col(col))
        partial_exprs.append(expr.alias(f"__p_{out}"))
    partial = salted.groupBy(*keys, "__salt").agg(*partial_exprs)
    final_exprs = [
        _MERGE[fn](F.col(f"__p_{out}")).alias(out) for out, (fn, _) in aggs.items()
    ]
    return partial.groupBy(*keys).agg(*final_exprs)


def top_hot_keys(df: DataFrame, key: str, k: int = 20) -> DataFrame:
    """Diagnostic: the k heaviest keys and their share of all rows —
    decide whether salting / skew hints are worth it before paying them."""
    total = df.count()
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .withColumn("share", F.col("n_rows") / F.lit(float(total)))
        .orderBy(F.col("n_rows").desc(), F.col(key))
        .limit(k)
    )
