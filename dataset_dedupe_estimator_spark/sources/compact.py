"""Small-file compaction — the lake-maintenance operator a 100 TB corpus
needs continuously: ingest and streaming sinks leave thousands of tiny
parquet files whose per-file open/footer/task overhead dominates scans
long before data volume does.

Approach (Spark-first): measure the source's real on-disk bytes from the
file listing (no data pass), derive the output file count from a target
file size, and rewrite through ``repartition(n)`` — a round-robin
exchange that yields uniformly-sized output files without any sort.
``sort_by`` optionally range-partitions + sorts instead, clustering the
rewrite so min/max row-group stats prune future scans (poor-man's
Z-order on one key set).

The reference rewrites files one-for-one (de/formats.py:110-115 copies
record batches per file); compaction is the many-to-few generalization
its single-machine design never needed.
"""

from __future__ import annotations

import os
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def plan_compaction(
    spark: SparkSession, src: str, target_mb: float = 128
) -> tuple[DataFrame, int, int, int]:
    """Return (df, n_files_in, bytes_in, n_files_out) without rewriting.

    ``n_files_out`` is ceil(bytes_in / target); byte size comes from the
    driver-side file listing (cheap metadata, no Spark job)."""
    df = spark.read.parquet(src)
    listing = [
        os.path.join(root, fn)
        for root, _dirs, files in os.walk(src)
        for fn in files
        if fn.endswith(".parquet")
    ] or ([src] if os.path.isfile(src) else [])
    bytes_in = sum(os.path.getsize(p) for p in listing)
    target = max(1, int(target_mb * (1 << 20)))
    n_out = max(1, -(-bytes_in // target))
    return df, len(listing), bytes_in, n_out


def compact_parquet(
    spark: SparkSession,
    src: str,
    dest: str,
    target_mb: float = 128,
    sort_by: Sequence[str] | None = None,
    compression: str = "zstd",
) -> dict:
    """Rewrite ``src`` (a directory of parquet files) into ``dest`` as
    ~target_mb files. Returns a summary dict (files/bytes in and out,
    row-count sanity).

    Scale note: round-robin ``repartition(n)`` is one full exchange of the
    data — unavoidable for re-bucketing by size — but requires no sort and
    no skew handling (rows distribute uniformly by construction). With
    ``sort_by``, ``repartitionByRange(n, *keys)`` + ``sortWithinPartitions``
    clusters values so future range predicates prune whole files via
    row-group stats."""
    df, n_in, bytes_in, n_out = plan_compaction(spark, src, target_mb)
    if sort_by:
        out = df.repartitionByRange(n_out, *[F.col(c) for c in sort_by]).sortWithinPartitions(
            *sort_by
        )
    else:
        out = df.repartition(n_out)
    out.write.mode("overwrite").option("compression", compression).parquet(dest)
    n_src = df.count()
    n_dst = spark.read.parquet(dest).count()
    if n_src != n_dst:
        raise ValueError(f"compaction sanity failed: {n_src} rows in, {n_dst} out")
    out_files = [
        os.path.join(root, fn)
        for root, _dirs, files in os.walk(dest)
        for fn in files
        if fn.endswith(".parquet")
    ]
    return {
        "files_in": n_in,
        "files_out": len(out_files),
        "bytes_in": bytes_in,
        "bytes_out": sum(os.path.getsize(p) for p in out_files),
        "rows": n_dst,
    }
