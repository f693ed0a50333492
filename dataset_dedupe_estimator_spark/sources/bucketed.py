"""Bucketed-table layout for shuffle-free repeated joins.

At 100 TB the dominant cost of fact-to-fact joins (orders ⋈ lineitem,
chunk-occurrence ⋈ chunk-occurrence across runs) is the shuffle. Writing
both sides bucketed (and sorted) by the join key co-locates matching rows:
Spark's scan reports the bucketing as an output partitioning and the join
planner skips the Exchange entirely — pay the shuffle once at write time,
never again per query.

Uses ``saveAsTable`` (bucket metadata lives in the session catalog;
parquet files on disk under spark.sql.warehouse.dir).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist df bucketed (and optionally sorted) by the join key."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str]
) -> DataFrame:
    """Join two same-bucketed tables — planner elides both Exchanges."""
    return spark.table(left_table).join(spark.table(right_table), on)
