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
    "cdc_dedup_trend": Q(cdc_dedup_trend, None),
    "format_compare_demo": Q(format_compare_demo, None),
    "cdc_per_file_chunks": Q(cdc_per_file_chunks, None),
    "cdc_provenance": Q(cdc_provenance, None),
    "cdc_estimate_xet": Q(cdc_estimate_xet, None),
    "cdc_approx_estimate": Q(cdc_approx_estimate, None),
    "cdc_upload_delta": Q(cdc_upload_delta, None),
    "cdc_index_incremental": Q(cdc_index_incremental, None),
}
