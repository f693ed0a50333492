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


def sql(spark: SparkSession, query: str, sf_dir: str) -> DataFrame:
    register_testdata(spark, sf_dir)
    return spark.sql(query)
