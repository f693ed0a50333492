"""Shared helpers for oracle-checked queries.

Floating-point discipline: Spark and DuckDB must produce *hash-identical*
values. All money/measure columns in the test data are exact 2-decimal
doubles, so aggregates run in integer cents (``CAST(ROUND(x*100) AS
BIGINT)``) — exact in both engines — and convert to double only at the end
via IEEE-identical single operations (cast + divide).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Q:
    """One registry entry: Spark implementation + DuckDB oracle SQL."""

    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    headline: bool = False  # include in bench.py


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.parquet carries TIMESTAMP(NANOS) which Spark's vectorized
        # reader rejects; read nanos as long and convert (values are
        # microsecond-exact). Session TZ pinned to UTC so TimestampType
        # round-trips naive-UTC like DuckDB.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# canonical implementations live in functions.money; re-exported here for
# the query modules
from dataset_dedupe_estimator_spark.functions.money import cents, sql_cents  # noqa: E402,F401


def ts(lit: str) -> Column:
    """timestamp_ntz literal (test tables use TIMESTAMP_NTZ)."""
    return F.lit(lit).cast("timestamp_ntz")
