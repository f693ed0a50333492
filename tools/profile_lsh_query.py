"""Component breakdown of embedding_dedup_lsh at the sf1 tier.

The round-4 sf1 bench put embedding_dedup_lsh at ~10 s — 38% of the
headline tier — without saying WHERE the time goes. This tool splits the
query's wall into its four plan phases, each measured on its own (the
feature table is persisted first, exactly as the query does, so phases
2-4 never re-run the Arrow pass):

  1. features — scan + Arrow-batched unit-vector/bit-string pass
  2. postings — posexplode into (table_id, bucket, vec_id, unit) rows,
                ONE hash exchange, collect_list posting lists
  3. kernel   — within-bucket pair generation + exact cosine + threshold
                (_bucket_pair_cosine_fn, r14)
  4. dedup    — dropDuplicates over the discovered pairs
  5. total    — the registry query end-to-end

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

    def noop(df):
        df.write.mode("overwrite").format("noop").save()

    # r14 plan phases: features -> postings explode -> ONE exchange +
    # collect_list posting lists -> bucket pair kernel -> pair dedup ->
    # global sort. Each phase timed cumulatively with the noop sink.
    src = emb.select("vec_id", "embedding")
    par = spark.sparkContext.defaultParallelism
    if src.rdd.getNumPartitions() < par:
        src = src.repartition(par, "vec_id")
    feats = S.lsh_features(src)
    t0 = time.time()
    noop(feats)
    out["features_s"] = round(time.time() - t0, 2)

    n_df = emb.agg(F.count(F.lit(1)).alias("n_vecs"))
    buckets = (
        feats.crossJoin(F.broadcast(n_df))
        .withColumn("p", S._n_planes_col(S._m_col(F.col("n_vecs"))))
        .select(
            "vec_id",
            "unit",
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
    grouped = (
        buckets.groupBy("table_id", "bucket")
        .agg(F.collect_list(F.struct("vec_id", "unit")).alias("members"))
        .select("members")
    )
    t0 = time.time()
    noop(grouped)
    out["postings_s"] = round(time.time() - t0, 2)

    pairs = grouped.mapInArrow(
        S._bucket_pair_cosine_fn, "vec_a long, vec_b long, cosine double"
    )
    t0 = time.time()
    noop(pairs)
    out["kernel_s"] = round(time.time() - t0, 2)

    t0 = time.time()
    out["n_pairs"] = pairs.dropDuplicates(["vec_a", "vec_b"]).count()
    out["dedup_s"] = round(time.time() - t0, 2)

    # honest end-to-end run of the registry query
    t0 = time.time()
    S.embedding_dedup_lsh(spark, sf).collect()
    out["total_s"] = round(time.time() - t0, 2)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
