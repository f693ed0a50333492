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

The listing goes through the Hadoop FileSystem API (not ``os.walk``), so
sizing is correct for any URI Spark can read — ``file:``, ``s3a://``,
``hdfs://`` — not just the local disk.

The reference rewrites files one-for-one (de/formats.py:110-115 copies
record batches per file); compaction is the many-to-few generalization
its single-machine design never needed.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _hadoop_path(spark: SparkSession, path: str):
    """Return (qualified org.apache.hadoop.fs.Path, FileSystem) for any URI."""
    jvm = spark._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    return fs.makeQualified(p), fs


def list_parquet_files(spark: SparkSession, path: str) -> list[tuple[str, int]]:
    """Recursive (path, bytes) listing of ``*.parquet`` under ``path`` via
    the Hadoop FileSystem API — works for local and remote stores alike."""
    p, fs = _hadoop_path(spark, path)
    if not fs.exists(p):
        raise FileNotFoundError(path)
    if fs.getFileStatus(p).isFile():
        return [(p.toString(), fs.getFileStatus(p).getLen())]
    out: list[tuple[str, int]] = []
    it = fs.listFiles(p, True)
    while it.hasNext():
        st = it.next()
        fp = st.getPath().toString()
        if fp.endswith(".parquet"):
            out.append((fp, st.getLen()))
    return out


def plan_compaction(
    spark: SparkSession, src: str, target_mb: float = 128
) -> tuple[DataFrame, int, int, int]:
    """Return (df, n_files_in, bytes_in, n_files_out) without rewriting.

    ``n_files_out`` is ceil(bytes_in / target); byte size comes from the
    filesystem listing (cheap metadata, no Spark job). Raises if the
    listing finds no parquet bytes — silently coalescing an unsized
    dataset to one file is exactly the failure mode this guards."""
    df = spark.read.parquet(src)
    listing = list_parquet_files(spark, src)
    bytes_in = sum(sz for _p, sz in listing)
    if not listing or bytes_in <= 0:
        raise ValueError(
            f"compaction: no parquet bytes found under {src!r}; "
            "refusing to size the rewrite from an empty listing"
        )
    target = max(1, int(target_mb * (1 << 20)))
    n_out = max(1, -(-bytes_in // target))
    return df, len(listing), bytes_in, n_out


def _assert_disjoint(spark: SparkSession, src: str, dest: str) -> None:
    """Refuse self-compaction: dest == src, dest under src, or src under
    dest (overwrite would delete the source while it is still lazily
    read)."""
    ps, _ = _hadoop_path(spark, src)
    pd_, _ = _hadoop_path(spark, dest)
    s, d = ps.toUri().toString().rstrip("/"), pd_.toUri().toString().rstrip("/")
    if s == d or d.startswith(s + "/") or s.startswith(d + "/"):
        raise ValueError(
            f"compaction: dest {dest!r} overlaps src {src!r}; "
            "write to a disjoint path, then swap"
        )


def _spread16(c):
    """Interleave-ready bit spread: 16-bit value → even bit positions of
    a 32-bit value (classic magic-mask doubling)."""
    from pyspark.sql import functions as F  # local: keep module header light

    for shift, mask in ((8, 0x00FF00FF), (4, 0x0F0F0F0F), (2, 0x33333333), (1, 0x55555555)):
        c = c.bitwiseOR(F.shiftleft(c, shift)).bitwiseAND(F.lit(mask))
    return c


def zorder_value(df: DataFrame, cols: Sequence[str]) -> "tuple[DataFrame, str]":
    """Append a Z-order (Morton) key over exactly two numeric columns.

    Each key is min/max-normalized to 16 bits (one column-pruned agg
    scan, collected as a single driver row — this is a maintenance
    operator, same budget as the file listing), then bit-interleaved
    with JVM integer expressions (whole-stage codegen; no UDF). Returns
    (df_with_column, column_name).

    Why Z-order: sorting clusters ONE key's min/max file stats;
    interleaving clusters BOTH, so range predicates on either column
    prune files. More than two keys → interleave hierarchically
    (zorder the zorder), at decreasing per-key resolution.

    The n-dimensional, oracle-expressible form (with measured row-group
    pruning fractions) lives in ``operators/layout.py``; this variant
    stays shift-intrinsic and two-column for the compaction hot path."""
    from pyspark.sql import functions as F

    if len(cols) != 2:
        raise ValueError("zorder_value interleaves exactly two columns")
    stats = df.agg(
        *[f(F.col(c).cast("double")).alias(f"{n}_{i}")
          for i, c in enumerate(cols)
          for n, f in (("mn", F.min), ("mx", F.max))]
    ).collect()[0]
    spread = []
    for i, c in enumerate(cols):
        mn, mx = stats[f"mn_{i}"], stats[f"mx_{i}"]
        if mn is None or mx is None:
            raise ValueError(
                f"z-order column {c!r} has no numeric values "
                "(non-numeric or all-NULL) — pick a numeric, populated column"
            )
        span = (mx - mn) or 1.0
        scaled = F.least(
            F.lit(65535),
            F.floor((F.col(c).cast("double") - F.lit(mn)) / F.lit(span) * 65535).cast("long"),
        )
        spread.append(_spread16(scaled))
    z = spread[0].bitwiseOR(F.shiftleft(spread[1], 1))
    return df.withColumn("_zorder", z), "_zorder"


def compact_parquet(
    spark: SparkSession,
    src: str,
    dest: str,
    target_mb: float = 128,
    sort_by: Sequence[str] | None = None,
    zorder_by: Sequence[str] | None = None,
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
    row-group stats. With ``zorder_by`` (two columns), rows cluster on
    the interleaved Morton key instead, so range predicates on EITHER
    column prune files — the multi-dimensional layout a single-key sort
    cannot give."""
    _assert_disjoint(spark, src, dest)
    if sort_by and zorder_by:
        raise ValueError("choose sort_by or zorder_by, not both")
    df, n_in, bytes_in, n_out = plan_compaction(spark, src, target_mb)
    drop_col = None
    if zorder_by:
        df, zcol = zorder_value(df, zorder_by)
        out = df.repartitionByRange(n_out, F.col(zcol)).sortWithinPartitions(zcol)
        drop_col = zcol
    elif sort_by:
        out = df.repartitionByRange(n_out, *[F.col(c) for c in sort_by]).sortWithinPartitions(
            *sort_by
        )
    else:
        out = df.repartition(n_out)
    if drop_col:
        out = out.drop(drop_col)
    out.write.mode("overwrite").option("compression", compression).parquet(dest)
    n_src = df.count()
    n_dst = spark.read.parquet(dest).count()
    if n_src != n_dst:
        raise ValueError(f"compaction sanity failed: {n_src} rows in, {n_dst} out")
    out_files = list_parquet_files(spark, dest)
    return {
        "files_in": n_in,
        "files_out": len(out_files),
        "bytes_in": bytes_in,
        "bytes_out": sum(sz for _p, sz in out_files),
        "rows": n_dst,
    }
