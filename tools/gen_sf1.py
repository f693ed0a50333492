"""Derive an sf1-equivalent bench tier from the driver's sf0.1 fixtures.

The driver ships sf{0.001,0.01,0.1} only; scale regressions (spills,
skew, shuffle-partition sizing) often first appear at 10x the bench
data. This tool upsamples sf0.1 by REPLICAS with per-replica key
offsets so join cardinalities and key distributions scale like a real
sf1 (every fact/dim key is shifted by the same per-table offset, so
joins stay consistent within a replica and never collide across
replicas). Dims `region`/`nation` are copied as-is (fixed-size in
TPC-H). Text and embeddings are deterministically decorrelated per
replica (a salt token spliced every 7 words / per-dimension sinusoidal
jitter) so the near-dup workloads scan 10x the corpus instead of
trivially finding 10-way duplicate clusters.

Cache layout: {OUT_DIR}/{table}.parquet + a recipe-version marker; the
cache is rebuilt only when VERSION changes. Not checked in (gitignored);
bench.py calls ensure_sf1() lazily.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(REPO, ".sf1_cache")
REPLICAS = 10
VERSION = "sf1-v5"  # bump to invalidate the cache
# v5 (r14, declared fixture-version bump — VERDICT r13 ask #2): tables
# are written with 4 MiB parquet row groups instead of one row group
# per file. A row group is Spark's atomic split, so the v4 layout ran
# EVERY sf1 scan as one task regardless of core count — masking scan
# parallelism and flattening the driver's core-count scaling probe.
# v5 keeps the single-FILE-per-table contract (CDC queries chunk file
# bytes) but gives each table enough row groups for real splits
# (lineitem ~109 MB -> ~27 splits at 32 cores). NOTE: sf1 numbers
# before/after this bump are NOT comparable (scans parallelize AND the
# byte-level CDC tables see different file bytes); BENCH_r14 notes the
# cut-over, and the same regeneration is proposed for the driver-owned
# sf0.1 fixtures in OPTIMIZATION_r14.md.
ROW_GROUP_BYTES = 4 * 1024 * 1024

TABLES = [
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
]

# key column → offset-group: every column in a group shifts by the same
# per-replica offset so foreign keys keep resolving within a replica
_KEY_GROUPS = {
    "c_custkey": "cust",
    "o_custkey": "cust",
    "o_orderkey": "ord",
    "l_orderkey": "ord",
    "p_partkey": "part",
    "l_partkey": "part",
    "s_suppkey": "supp",
    "l_suppkey": "supp",
    "event_id": "evt",
    "user_id": "user",
    "doc_id": "doc",
    "vec_id": "vec",
}


def _offsets(spark) -> dict[str, int]:
    """Per-group offset = next power of 10 above the group's max key, so
    replica keys never collide and stay human-readable."""
    probes = {
        "cust": ("customer", "c_custkey"),
        "ord": ("orders", "o_orderkey"),
        "part": ("part", "p_partkey"),
        "supp": ("supplier", "s_suppkey"),
        "evt": ("events", "event_id"),
        "user": ("events", "user_id"),
        "doc": ("documents", "doc_id"),
        "vec": ("embeddings", "vec_id"),
    }
    out = {}
    for grp, (table, col) in probes.items():
        mx = (
            spark.read.parquet(f"{SRC}/{table}.parquet")
            .selectExpr(f"max({col})")
            .collect()[0][0]
        )
        off = 10
        while off <= mx:
            off *= 10
        out[grp] = off
    return out


def _replica(df, table: str, r: int, offsets: dict[str, int]):
    from pyspark.sql import functions as F

    for col in df.columns:
        grp = _KEY_GROUPS.get(col)
        if grp:
            df = df.withColumn(col, F.col(col) + F.lit(r * offsets[grp]))
    if table == "documents" and r > 0:
        # splice a replica-unique token every 7 words: shingle overlap
        # with the source replica drops below LSH admission, so near-dup
        # scans see a 10x corpus, not 10-way duplicate clusters
        df = df.withColumn(
            "text",
            F.array_join(
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda w, i: F.when(
                        i % 7 == F.lit(6), F.concat(w, F.lit(f" zr{r}q"))
                    ).otherwise(w),
                ),
                " ",
            ),
        )
        # the splice grows the text; derived length columns must stay
        # consistent or length-based measurements run over corrupt data
        if "n_chars" in df.columns:
            df = df.withColumn("n_chars", F.length("text"))
    if table == "embeddings" and r > 0:
        df = df.withColumn(
            "embedding",
            F.transform(
                F.col("embedding"),
                lambda x, i: (
                    x + F.lit(float(r)) * F.sin(F.col("vec_id") * 0.7 + i) * 0.05
                ).cast("float"),
            ),
        )
    return df


def ensure_sf1(spark) -> str:
    """Build (once) and return the sf1 cache dir. The marker records the
    recipe version AND the source dir — a bench pointed at a different
    $SPARK_GRAFT_SF_DIR rebuilds instead of reusing a mismatched cache."""
    marker = os.path.join(OUT_DIR, "_recipe.txt")
    stamp = f"{VERSION} src={SRC}"
    if os.path.exists(marker) and open(marker).read().strip() == stamp:
        return OUT_DIR
    import glob
    import shutil

    shutil.rmtree(OUT_DIR, ignore_errors=True)
    os.makedirs(OUT_DIR)
    offsets = _offsets(spark)
    for table in TABLES:
        src = spark.read.parquet(f"{SRC}/{table}.parquet")
        if table in ("region", "nation"):
            out = src
        else:
            out = _replica(src, table, 0, offsets)
            for r in range(1, REPLICAS):
                out = out.unionByName(_replica(src, table, r, offsets))
        # one plain FILE per table, exactly like the driver's fixtures:
        # the CDC queries chunk `{dir}/*.parquet` byte-wise and would
        # otherwise trip over Spark's directory-output layout
        tmp = f"{OUT_DIR}/_tmp_{table}"
        out.coalesce(1).write.mode("overwrite").option(
            "parquet.block.size", ROW_GROUP_BYTES
        ).parquet(tmp)
        part = glob.glob(f"{tmp}/part-*.parquet")[0]
        os.replace(part, f"{OUT_DIR}/{table}.parquet")
        shutil.rmtree(tmp)
    # post-build sanity: every replicated table is exactly REPLICASx the
    # source, and key-shifting produced zero cross-replica collisions
    for table, key in (("orders", "o_orderkey"), ("documents", "doc_id")):
        src_n = spark.read.parquet(f"{SRC}/{table}.parquet").count()
        out_df = spark.read.parquet(f"{OUT_DIR}/{table}.parquet")
        n, nk = out_df.selectExpr("count(*)", f"count(distinct {key})").collect()[0]
        if n != REPLICAS * src_n or nk != n:
            raise RuntimeError(
                f"sf1 build invariant broken for {table}: rows={n} "
                f"(want {REPLICAS * src_n}), distinct {key}={nk}"
            )
    with open(marker, "w") as f:
        f.write(stamp)
    return OUT_DIR


if __name__ == "__main__":
    from dataset_dedupe_estimator_spark import get_spark

    spark = get_spark(app_name="dde-gen-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    d = ensure_sf1(spark)
    import glob

    total = sum(
        os.path.getsize(f) for f in glob.glob(f"{d}/*.parquet")
    )
    print(f"sf1 cache at {d}: {total / 1e6:.1f} MB")
