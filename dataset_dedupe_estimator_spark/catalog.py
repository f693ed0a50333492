"""Table catalog: register a scale-factor directory's parquet tables as
temp views so the whole engine surface is reachable from ``spark.sql``.

This is the SQL front door the reference never had (it is imperative
Python end-to-end); here every table and operator result is a relation.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def register_testdata(spark: SparkSession, sf_dir: str) -> list[str]:
    """CREATE OR REPLACE TEMP VIEW per parquet table found in sf_dir."""
    from dataset_dedupe_estimator_spark.queries.base import load

    registered = []
    for name in TABLES:
        if os.path.exists(f"{sf_dir}/{name}.parquet"):
            load(spark, sf_dir, name).createOrReplaceTempView(name)
            registered.append(name)
    # any extra parquet files register under their stem
    for path in sorted(glob.glob(f"{sf_dir}/*.parquet")):
        stem = os.path.splitext(os.path.basename(path))[0]
        if stem not in registered:
            spark.read.parquet(path).createOrReplaceTempView(stem)
            registered.append(stem)
    return registered


def register_chunks(spark: SparkSession, paths: list[str]) -> list[str]:
    """Register the chunk store as relations: ``chunks`` (one row per
    occurrence: file_idx, path, seq, offset, hash, size, compressed) and
    ``dedup_map`` (one row per distinct hash with provenance). The
    reference's in-memory Rust store, exposed to ad-hoc SQL — e.g.

        SELECT path, SUM(size) FILTER (WHERE n_files_seen > 1) AS shared
        FROM chunks JOIN dedup_map USING (hash) GROUP BY path
    """
    from dataset_dedupe_estimator_spark.operators.chunker import chunk_files_auto
    from dataset_dedupe_estimator_spark.plans.estimate import ESTIMATE_PARAMS, dedup_map

    chunks = chunk_files_auto(spark, paths, params=ESTIMATE_PARAMS)
    chunks.createOrReplaceTempView("chunks")
    dedup_map(chunks).createOrReplaceTempView("dedup_map")
    return ["chunks", "dedup_map"]


def sql(
    spark: SparkSession,
    query: str,
    sf_dir: str,
    chunk_paths: list[str] | None = None,
) -> DataFrame:
    register_testdata(spark, sf_dir)
    if chunk_paths:
        register_chunks(spark, chunk_paths)
    return spark.sql(query)
