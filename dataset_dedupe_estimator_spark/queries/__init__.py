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
    dedupe_text,
    events,
    relational,
    similarity,
    synthetic_sql,
    text_analysis,
)

REGISTRY: dict[str, Q] = {}
for _mod in (relational, events, dedupe_text, text_analysis, similarity, synthetic_sql, advanced, core_cdc):
    overlap = REGISTRY.keys() & _mod.QUERIES.keys()
    if overlap:
        raise ValueError(f"duplicate query names: {overlap}")
    REGISTRY.update(_mod.QUERIES)

__all__ = ["REGISTRY", "Q"]
