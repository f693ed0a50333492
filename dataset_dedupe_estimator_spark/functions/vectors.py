"""Vector expressions over array<float>/array<double> columns.

Left-fold accumulation from 0.0: Spark ``F.aggregate`` and DuckDB
``list_reduce`` are both sequential left folds, so these expressions are
bit-identical across engines — similarity thresholds and top-k orderings
never flip between Spark and the oracle."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column, norm_a: Column | None = None, norm_b: Column | None = None) -> Column:
    """Cosine similarity; pass precomputed norms in pair joins (compute
    them once per vector, not once per pair)."""
    na = norm_a if norm_a is not None else norm(a)
    nb = norm_b if norm_b is not None else norm(b)
    return dot(a, b) / (na * nb)
