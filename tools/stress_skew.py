"""Hot-key stress: quantify the skew behavior the registry's claims rest
on — a Zipf-distributed key space where one key owns a large share of
all rows, aggregated three ways:

  1. plain groupBy           — Spark's map-side partial aggregation
  2. salted two-phase        — operators/skew.salted_agg
  3. correctness cross-check — both produce identical results

Also times the skewed JOIN path (hot fact key joined to a dim) with AQE
skew-split on, the optimizer path the repo relies on for joins.

Usage: python tools/stress_skew.py [n_rows_millions]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    from pyspark.sql import functions as F

    from dataset_dedupe_estimator_spark import get_spark
    from dataset_dedupe_estimator_spark.operators.skew import salted_agg

    n_m = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    n = n_m * 1_000_000
    spark = get_spark(app_name="dde-stress-skew", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    # power-law keys, hottest owning ~40% of all rows — deterministic
    # from the row id (key = floor(1/u^1.2) over u ~ U(0,1], capped)
    base = spark.range(n, numPartitions=64).select(
        "id",
        F.least(
            F.floor(
                F.pow(
                    1.0 / ((F.col("id") % 99991 + 1).cast("double") / 99991.0), 1.2
                )
            ).cast("long"),
            F.lit(100_000),
        ).alias("key"),
        (F.col("id") % 1000).alias("v"),
    ).persist()
    total = base.count()  # materialize once so timings exclude generation
    hot = base.groupBy("key").count().orderBy(F.col("count").desc()).first()
    print(f"rows={total} hottest key={hot['key']} share={hot['count'] / total:.1%}")

    t0 = time.perf_counter()
    plain = base.groupBy("key").agg(
        F.count(F.lit(1)).alias("occ"), F.sum("v").alias("sv")
    )
    n_plain = plain.count()
    t_plain = time.perf_counter() - t0

    t0 = time.perf_counter()
    salted = salted_agg(base, ["key"], {"occ": ("count", "*"), "sv": ("sum", "v")})
    n_salted = salted.count()
    t_salted = time.perf_counter() - t0

    match = (
        plain.join(salted.withColumnRenamed("occ", "occ2").withColumnRenamed("sv", "sv2"), "key")
        .filter((F.col("occ") != F.col("occ2")) | (F.col("sv") != F.col("sv2")))
        .count()
        == 0
        and n_plain == n_salted
    )
    print(
        f"agg: plain {t_plain:.1f}s vs salted {t_salted:.1f}s "
        f"({n_plain} keys) identical={match}"
    )

    # skewed join: every fact row joins the dim on the zipf key; AQE
    # splits the hot partition (spark.sql.adaptive.skewJoin enabled in
    # the session factory)
    dim = spark.range(100_001).select(F.col("id").alias("key"), (F.col("id") * 7).alias("w"))
    t0 = time.perf_counter()
    joined = base.join(dim, "key").agg(F.sum(F.col("v") + F.col("w")).alias("s"))
    s = joined.collect()[0].s
    t_join = time.perf_counter() - t0
    print(f"skew join: {t_join:.1f}s checksum={s}")
    ok = match and s is not None
    print("OK" if ok else "MISMATCH")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
