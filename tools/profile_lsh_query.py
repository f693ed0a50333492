"""Component breakdown of embedding_dedup_lsh at the sf1 tier.

The round-4 sf1 bench put embedding_dedup_lsh at ~10 s — 38% of the
headline tier — without saying WHERE the time goes. This tool splits the
query's wall into its four plan phases, each measured on its own (the
feature table is persisted first, exactly as the query does, so phases
2-4 never re-run the Arrow pass):

  1. features   — scan + Arrow-batched unit-vector/bit-string pass
                  (persist + count materializes it)
  2. candidates — posexplode into N_TABLES buckets, banded self-join,
                  DISTINCT pair set
  3. rerank     — join candidate ids back to unit vectors, exact cosine,
                  threshold
  4. total      — the registry query end-to-end (fresh, unpersisted
                  run for an honest headline number)

Usage: python tools/profile_lsh_query.py [sf_dir]   (default: sf1 cache)
Prints one JSON line; paste the numbers into SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))


def main() -> None:
    from pyspark.sql import functions as F
    from pyspark.storagelevel import StorageLevel

    from dataset_dedupe_estimator_spark import get_spark
    from dataset_dedupe_estimator_spark.queries import similarity as S

    spark = get_spark(app_name="dde-profile-lsh")
    spark.sparkContext.setLogLevel("ERROR")
    if len(sys.argv) > 1:
        sf = sys.argv[1]
    else:
        from gen_sf1 import ensure_sf1

        sf = ensure_sf1(spark)

    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    n_vecs = emb.count()
    out: dict[str, float | int] = {"sf_dir": sf, "n_vecs": n_vecs}

    # phase 1: feature pass (the query's persist point)
    t0 = time.time()
    feats = S.lsh_features(emb).persist(StorageLevel.MEMORY_AND_DISK)
    feats.count()
    out["features_s"] = round(time.time() - t0, 2)

    n_df = emb.agg(F.count(F.lit(1)).alias("n_vecs"))
    buckets = (
        feats.select("vec_id", *[f"bits{t}" for t in range(S.N_TABLES)])
        .crossJoin(F.broadcast(n_df))
        .withColumn("p", S._n_planes_col(S._m_col(F.col("n_vecs"))))
        .select(
            "vec_id",
            F.posexplode(
                F.array(
                    *[
                        F.col(f"bits{t}").substr(F.lit(1), F.col("p"))
                        for t in range(S.N_TABLES)
                    ]
                )
            ).alias("table_id", "bucket"),
        )
    )
    a = buckets.select("table_id", "bucket", F.col("vec_id").alias("vec_a"))
    b = buckets.select("table_id", "bucket", F.col("vec_id").alias("vec_b"))
    cands = (
        a.join(b, ["table_id", "bucket"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    # phase 2: banded self-join + distinct candidate set
    t0 = time.time()
    out["n_candidates"] = cands.count()
    out["candidates_s"] = round(time.time() - t0, 2)

    # phase 3: exact rerank on the (materialized) candidates — the r13
    # Arrow-batched kernel the query itself uses (cosine + threshold in
    # one numpy pass; the old JVM aggregate(zip_with) fold was 61% of
    # the contended sf1 wall)
    units = feats.select("vec_id", "unit")
    ua = units.select(F.col("vec_id").alias("vec_a"), F.col("unit").alias("ua"))
    ub = units.select(F.col("vec_id").alias("vec_b"), F.col("unit").alias("ub"))
    t0 = time.time()
    out["n_pairs"] = (
        cands.join(ua, "vec_a")
        .join(ub, "vec_b")
        .select("vec_a", "vec_b", "ua", "ub")
        .mapInArrow(
            S._pair_cosine_fn, "vec_a long, vec_b long, cosine double"
        )
        .count()
    )
    out["rerank_s"] = round(time.time() - t0, 2)
    feats.unpersist()
    cands.unpersist()

    # phase 4: honest end-to-end run of the registry query
    t0 = time.time()
    S.embedding_dedup_lsh(spark, sf).collect()
    out["total_s"] = round(time.time() - t0, 2)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
