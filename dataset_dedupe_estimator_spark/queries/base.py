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


SPREAD_MIN_BYTES = 64 * 1024 * 1024  # below this, one scan task is cheaper
#                                      than the exchange a spread inserts


def maybe_spread(
    df: DataFrame,
    sf_dir: str,
    table: str,
    *cols: str,
    min_bytes: int = SPREAD_MIN_BYTES,
) -> DataFrame:
    """Input-skew remedy (optimization guide §2.5): a single-row-group
    parquet file is an unsplittable scan — Spark runs the WHOLE map side
    (filters, projections, partial aggregates, broadcast-join probes) as
    one task no matter the cluster size. When the scan (a) arrives as
    fewer splits than cores and (b) carries enough bytes that serializing
    the map side dominates (>= SPREAD_MIN_BYTES on disk), hash-repartition
    on a high-cardinality key (no keyless round-robin: that pays a local
    sort per SPARK-23207) so downstream work parallelizes.

    Both guards are metadata-only (file size + planned split count, no
    data pass) and make the spread a no-op exactly where it should be:
    small fixtures (the exchange would cost more than it saves) and real
    multi-split tables at scale (a 100 TB table must never be coalesced
    to core count)."""
    import glob
    import os

    spark = df.sparkSession
    par = spark.sparkContext.defaultParallelism
    try:
        # a hit may be a plain file OR a directory-backed table
        # (Spark's native output layout) — for a directory, getsize
        # returns the inode size (~4KB) and the gate would silently
        # never fire, so sum the part files inside instead (ADVICE r13)
        nbytes = 0
        for p in glob.glob(os.path.join(sf_dir, f"{table}.parquet")):
            if os.path.isdir(p):
                nbytes += sum(
                    os.path.getsize(os.path.join(root, f))
                    for root, _dirs, files in os.walk(p)
                    for f in files
                )
            else:
                nbytes += os.path.getsize(p)
    except OSError:
        nbytes = 0
    if nbytes < min_bytes:
        return df
    if df.rdd.getNumPartitions() >= par:
        return df
    return df.repartition(par, *cols) if cols else df.repartition(par)


def ts(lit: str) -> Column:
    """timestamp_ntz literal (test tables use TIMESTAMP_NTZ)."""
    return F.lit(lit).cast("timestamp_ntz")
