"""At-size stress for operators/ranking.py — the distributed global
rank / prefix-sum primitive every former single-partition window now
rides on.

20M rows with an adversarial key profile (heavy duplicate values + one
hot key holding ~10% of the table) are ranked end to end; correctness
is asserted from order statistics that are cheap at any size:

* ranks are a permutation of 1..N (min/max/sum/distinct checks — no
  driver-side sort of 20M rows),
* the rank boundaries of the hot value match its exact count,
* a type-1 median extracted via the rank equals the value computed by
  an independent aggregate census.

Prints one JSON line; exit 1 on any violation.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N = 20_000_000
HOT = 777  # ~10% of rows collapse onto this value


def main() -> int:
    from pyspark.sql import functions as F

    from dataset_dedupe_estimator_spark import get_spark
    from dataset_dedupe_estimator_spark.operators.ranking import (
        type1_rank,
        with_global_cumsum,
    )

    spark = get_spark(app_name="dde-stress-ranking")
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.range(N).select(
        F.when(F.col("id") % 10 == 3, HOT)
        .otherwise(F.col("id") % 100_003)
        .alias("v"),
        F.col("id").alias("k"),
    )
    t0 = time.time()
    ranked, n = with_global_cumsum(df, [F.col("v"), F.col("k")], out_col="rn", npart=64)
    stats = ranked.agg(
        F.min("rn"), F.max("rn"), F.sum("rn"), F.countDistinct("rn")
    ).collect()[0]
    t_rank = time.time() - t0
    perm_ok = (
        n == N
        and stats[0] == 1
        and stats[1] == N
        and stats[2] == N * (N + 1) // 2
        and stats[3] == N
    )
    hot = ranked.filter(F.col("v") == HOT).agg(
        F.min("rn"), F.max("rn"), F.count(F.lit(1))
    ).collect()[0]
    hot_ok = hot[1] - hot[0] + 1 == hot[2]  # contiguous rank band
    k_med = type1_rank(n, 1, 2)
    med_row = ranked.filter(F.col("rn") == k_med).collect()
    from pyspark.sql.window import Window

    # independent oracle: unpartitioned census cumsum is fine in a
    # one-shot stress check (the very shape the primitive replaces)
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    census_med = (
        df.groupBy("v").count()
        .withColumn("cum", F.sum("count").over(w))
        .filter(F.col("cum") >= k_med)
        .orderBy("v")
        .limit(1)
        .collect()[0]["v"]
    )
    med_ok = len(med_row) == 1 and med_row[0]["v"] == census_med
    out = {
        "rows": N,
        "rank_wall_s": round(t_rank, 1),
        "permutation_ok": perm_ok,
        "hot_key_band_ok": hot_ok,
        "hot_count": int(hot[2]),
        "median_ok": med_ok,
    }
    print(json.dumps(out))
    return 0 if perm_ok and hot_ok and med_ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
