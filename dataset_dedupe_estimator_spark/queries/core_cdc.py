"""Chunk-level dedup estimation queries — the reference's core surface
(de dedup / de stats), exposed through the driver contract.

CDC chunking of raw file bytes is not SQL-expressible, so these entries
have no DuckDB oracle (rows-only checks); their invariants are covered by
tests/test_chunker.py and tests/test_estimate.py instead.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from dataset_dedupe_estimator_spark.operators.chunker import XET_PARAMS, chunk_files
from dataset_dedupe_estimator_spark.plans.estimate import (
    approx_stats,
    chunk_stats,
    dedup_map,
    estimate_df,
)
from dataset_dedupe_estimator_spark.queries.base import Q


def _paths(sf_dir: str) -> list[str]:
    return sorted(glob.glob(f"{sf_dir}/*.parquet"))


def cdc_estimate(spark, sf):
    """`de dedup` over every parquet file in the dataset: one row of dedup
    metrics (C9+C11)."""
    return estimate_df(spark, _paths(sf))


def cdc_per_file_chunks(spark, sf):
    """Per-file chunk accounting (ChunkStore per file, src/store.rs:97-101)."""
    chunks = chunk_files(spark, _paths(sf))
    return (
        chunks.groupBy("path")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.countDistinct("hash").alias("n_unique_chunks"),
            F.sum("size").alias("total_bytes"),
            F.max("size").alias("max_chunk"),
            F.min("size").alias("min_chunk"),
        )
        .select(
            F.element_at(F.split(F.col("path"), "/"), -1).alias("file"),
            "n_chunks",
            "n_unique_chunks",
            "total_bytes",
            "max_chunk",
            "min_chunk",
        )
        .orderBy("file")
    )


def cdc_provenance(spark, sf):
    """Merged-store provenance distribution: how many files share each
    chunk (seen_in cardinality histogram; C5)."""
    chunks = chunk_files(spark, _paths(sf))
    return (
        dedup_map(chunks)
        .select(F.col("n_files_seen").alias("n_files_sharing"))
        .groupBy("n_files_sharing")
        .agg(F.count(F.lit(1)).alias("n_chunks"))
        .orderBy("n_files_sharing")
    )


def cdc_estimate_xet(spark, sf):
    """Alternate chunker parameterization (src/xet.rs:10-39 role)."""
    chunks = chunk_files(spark, _paths(sf), params=XET_PARAMS)
    return chunk_stats(chunks)


def cdc_approx_estimate(spark, sf):
    """100 TB-scale approximate variant: HLL distinct chunks instead of the
    exact per-hash aggregate."""
    chunks = chunk_files(spark, _paths(sf))
    return approx_stats(chunks)


def cdc_upload_delta(spark, sf):
    """Upload-delta estimate (the reference's notebook headline,
    notebooks/parquet-cdc.md:814-838): treating ``lineitem.parquet`` as
    the already-stored snapshot, per-file bytes every dataset file would
    need to transfer. Rows-only (file chunking isn't SQL-expressible);
    invariants in tests/test_multi_chunker.py."""
    from dataset_dedupe_estimator_spark.plans.estimate import upload_delta

    paths = _paths(sf)
    old = [p for p in paths if p.endswith("lineitem.parquet")]
    rows = upload_delta(spark, old, paths)
    return rows.select(
        F.element_at(F.split(F.col("path"), "/"), -1).alias("file"),
        "file_bytes",
        "novel_bytes",
        "delta_ratio",
    ).orderBy("file")


def format_compare_demo(spark, sf):
    """O1 end-to-end through the driver contract: generate a synthetic
    table + deleted variant, write both in two parquet configurations and
    JSONL, estimate cross-file dedup per format (de/estimate.py:41-84
    capability; rows-only — file bytes are environment-dependent)."""
    import tempfile

    from dataset_dedupe_estimator_spark.operators.synthetic import (
        DataGenerator,
        finalize,
    )
    from dataset_dedupe_estimator_spark.plans.compare import (
        compare_formats_tables,
        results_df,
    )
    from dataset_dedupe_estimator_spark.sources.formats import (
        JsonLinesFormat,
        ParquetFormat,
    )

    from dataset_dedupe_estimator_spark.operators.chunker import ChunkerParams

    gen = DataGenerator({"a": "int", "b": "str"}, seed=42)
    tables = gen.generate_synthetic_tables(spark, 2000, [0.5], edit_size=10)
    # persist: every format write (and its sanity count) re-executes the
    # lazy generator pipeline otherwise — 3 formats x 2 tables x (write +
    # read-back) re-derivations collapse to one materialization each
    original = finalize(tables["original"]).persist()
    deleted = finalize(tables["deleted"]).persist()
    groups = {"edit-deleted": {"original": original, "deleted": deleted}}
    formats = [
        ParquetFormat(compression="snappy"),
        ParquetFormat(compression="zstd"),
        JsonLinesFormat(),
    ]
    # demo-scale probe cap: the compressibility probe is ~30% of chunker
    # CPU and the rows-only check doesn't read compressed bytes — same
    # sampling knob a 100 TB estimate run would set (survey §7.4)
    try:
        results = compare_formats_tables(
            spark,
            formats,
            groups,
            tempfile.mkdtemp(prefix="dde-fmt-"),
            params=ChunkerParams(compress_probe_bytes=16 * 1024),
        )
    finally:
        original.unpersist()
        deleted.unpersist()
    return (
        results_df(spark, results)
        .select("group", "format", "numfiles", "dedup_ratio")
        .orderBy("format")
    )


def cdc_dedup_trend(spark, sf):
    """Cumulative dedup ratio per file prefix over the sf parquet corpus —
    plans/estimate.py:dedup_trend (one chunk pass for all N prefixes;
    rows-only: the chunker is not SQL-expressible)."""
    from dataset_dedupe_estimator_spark.plans.estimate import dedup_trend

    return dedup_trend(spark, _paths(sf))



def _export_chunks(spark, sf: str, out_dir: str):
    """Chunk the sf corpus once, EXPORT the chunk table to parquet, and
    read it back: both engines (Spark and the DuckDB oracle) aggregate
    the identical exported rows, so the oracle checks the whole CDC
    aggregation layer (C4-C6/C11) — only chunk EMISSION stays
    rows-only. The export path is deterministic so the static oracle
    SQL can address it (the gate runs the Spark side first)."""
    import shutil

    chunks = chunk_files(spark, _paths(sf)).select(
        F.element_at(F.split(F.col("path"), "/"), -1).alias("file"),
        "file_idx", "seq", "hash", "size", "compressed",
    )
    shutil.rmtree(out_dir, ignore_errors=True)
    chunks.coalesce(1).write.mode("overwrite").parquet(out_dir)
    return spark.read.parquet(out_dir)


# Deterministic (static oracle SQL must address them) but per-user:
# concurrent gates from different users can't race each other's export,
# and the rmtree never touches another user's path. Same-user overlap
# is out of scope — the gate runs queries sequentially.
import tempfile as _tempfile

_EXPORT_BASE = os.path.join(
    _tempfile.gettempdir(), f"dde_oracle_u{os.getuid()}"
)
_STATS_EXPORT = f"{_EXPORT_BASE}_chunks_stats"
_TREND_EXPORT = f"{_EXPORT_BASE}_chunks_trend"


def cdc_stats_oracle(spark, sf):
    """Oracle-bearing CDC accounting (r11): per-file AND global
    occurrence-vs-distinct stats (C4/C6) with the dedup ratio (C11)
    over an exported chunk table — DuckDB re-aggregates the same rows
    to the same tuple, so a wrong two-level aggregate, a lost
    occurrence, or a mis-scoped distinct all hash-mismatch."""
    exported = _export_chunks(spark, sf, _STATS_EXPORT)
    per_file = chunk_stats(exported, by=("file",))
    total = chunk_stats(exported).select(
        F.lit("*total*").alias("file"),
        "total_len", "total_chunks", "unique_chunks",
        "chunk_bytes", "compressed_chunk_bytes",
    )
    return (
        per_file.unionByName(total)
        .withColumn(
            "dedup_ratio",
            F.round(
                F.col("chunk_bytes").cast("double")
                / F.col("total_len").cast("double"),
                6,
            ),
        )
        .orderBy("file")
    )


CDC_STATS_ORACLE_SQL = f"""
WITH c AS (SELECT * FROM read_parquet('{_STATS_EXPORT}/*.parquet')),
ph AS (SELECT file, hash, MIN(size) AS size, MIN(compressed) AS compressed,
              SUM(size) AS occ_bytes, COUNT(*) AS occ_count
       FROM c GROUP BY file, hash),
pf AS (SELECT file,
              CAST(SUM(occ_bytes) AS BIGINT) AS total_len,
              CAST(SUM(occ_count) AS BIGINT) AS total_chunks,
              CAST(COUNT(*) AS BIGINT) AS unique_chunks,
              CAST(SUM(size) AS BIGINT) AS chunk_bytes,
              CAST(SUM(compressed) AS BIGINT) AS compressed_chunk_bytes
       FROM ph GROUP BY file),
gh AS (SELECT hash, MIN(size) AS size, MIN(compressed) AS compressed,
              SUM(size) AS occ_bytes, COUNT(*) AS occ_count
       FROM c GROUP BY hash),
g AS (SELECT '*total*' AS file,
             CAST(SUM(occ_bytes) AS BIGINT) AS total_len,
             CAST(SUM(occ_count) AS BIGINT) AS total_chunks,
             CAST(COUNT(*) AS BIGINT) AS unique_chunks,
             CAST(SUM(size) AS BIGINT) AS chunk_bytes,
             CAST(SUM(compressed) AS BIGINT) AS compressed_chunk_bytes
      FROM gh)
SELECT file, total_len, total_chunks, unique_chunks, chunk_bytes,
       compressed_chunk_bytes,
       ROUND(CAST(chunk_bytes AS DOUBLE) / CAST(total_len AS DOUBLE), 6)
           AS dedup_ratio
FROM (SELECT * FROM pf UNION ALL SELECT * FROM g)
ORDER BY file
"""


def cdc_trend_oracle(spark, sf):
    """Oracle-bearing dedup TREND (r11): the cumulative-ratio rollup
    (``cdc_dedup_trend``'s aggregation — first-seen novelty + two
    distributed prefix sums) over an exported chunk table; DuckDB
    reproduces every running total and ratio with window functions."""
    from dataset_dedupe_estimator_spark.plans.estimate import (
        trend_from_chunks,
    )

    exported = _export_chunks(spark, sf, _TREND_EXPORT)
    return trend_from_chunks(exported)


CDC_TREND_ORACLE_SQL = f"""
WITH c AS (SELECT * FROM read_parquet('{_TREND_EXPORT}/*.parquet')),
pf AS (SELECT file_idx, SUM(size) AS file_bytes FROM c GROUP BY 1),
ph AS (SELECT hash, MIN(size) AS size, MIN(file_idx) AS first_seen
       FROM c GROUP BY 1),
nv AS (SELECT first_seen AS file_idx, SUM(size) AS novel_bytes
       FROM ph GROUP BY 1)
SELECT p.file_idx,
       CAST(p.file_bytes AS BIGINT) AS file_bytes,
       CAST(COALESCE(n.novel_bytes, 0) AS BIGINT) AS novel_bytes,
       CAST(SUM(p.file_bytes) OVER (ORDER BY p.file_idx)
            AS BIGINT) AS cum_total_bytes,
       CAST(SUM(COALESCE(n.novel_bytes, 0)) OVER (ORDER BY p.file_idx)
            AS BIGINT) AS cum_unique_bytes,
       ROUND(
           CAST(SUM(COALESCE(n.novel_bytes, 0))
                OVER (ORDER BY p.file_idx) AS DOUBLE)
           / CAST(SUM(p.file_bytes) OVER (ORDER BY p.file_idx) AS DOUBLE),
           6) AS cum_dedup_ratio
FROM pf p LEFT JOIN nv n USING (file_idx)
ORDER BY p.file_idx
"""


def cdc_index_incremental(spark, sf):
    """Persistent chunk-index lifecycle end-to-end (plans/chunk_index.py):
    build generation 0 from the first half of the corpus, admit the full
    corpus as generation 1, re-admit it as generation 2 (must be a
    no-op), and return the per-generation admission ledger. Rows-only:
    the chunker and the filesystem index are not SQL-expressible."""
    import json
    import tempfile

    from dataset_dedupe_estimator_spark.plans.chunk_index import (
        build_index,
        update_index,
    )

    paths = _paths(sf)
    half = paths[: max(1, len(paths) // 2)]
    with tempfile.TemporaryDirectory() as d:
        idx = f"{d}/index"
        build_index(spark, half, idx)
        update_index(spark, paths, idx)
        update_index(spark, paths, idx)  # re-admit: must add nothing
        with open(f"{idx}/_index_meta.json") as f:
            ledger = json.load(f)["snapshots"]
    rows = [
        (g["gen"], g["files"], g["novel_chunks"], g["novel_bytes"])
        for g in ledger
    ]
    return spark.createDataFrame(
        rows, "gen int, files int, novel_chunks long, novel_bytes long"
    ).orderBy("gen")


QUERIES = {
    "cdc_estimate": Q(cdc_estimate, None, headline=True),
    "cdc_stats_oracle": Q(cdc_stats_oracle, CDC_STATS_ORACLE_SQL),
    "cdc_trend_oracle": Q(cdc_trend_oracle, CDC_TREND_ORACLE_SQL),
    "cdc_dedup_trend": Q(cdc_dedup_trend, None),
    "format_compare_demo": Q(format_compare_demo, None),
    "cdc_per_file_chunks": Q(cdc_per_file_chunks, None),
    "cdc_provenance": Q(cdc_provenance, None),
    "cdc_estimate_xet": Q(cdc_estimate_xet, None),
    "cdc_approx_estimate": Q(cdc_approx_estimate, None),
    "cdc_upload_delta": Q(cdc_upload_delta, None),
    "cdc_index_incremental": Q(cdc_index_incremental, None),
}
