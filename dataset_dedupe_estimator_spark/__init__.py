"""dataset_dedupe_estimator_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of huggingface/dataset-dedupe-estimator.

The reference (/root/reference) is a single-machine Rust+Python Parquet
deduplication estimator. This package re-expresses its dataflows — CDC
chunking, chunk-hash dedup aggregation, provenance, synthetic edit
generation, format comparison — as idiomatic Spark DataFrame programs, and
extends them with large-scale training-data pipeline operators (exact/near
dedup, similarity search, text analysis) designed for horizontal scale.

Layout:
    session        SparkSession factory (tuned for local[32] tests; cluster-safe)
    operators/     chunker (CDC), dedupe, similarity, text, synthetic edits
    sources/       binary/parquet/json/sqlite readers & writers, format registry
    functions/     scalar/aggregate helper expressions (pure pyspark.sql.functions)
    plans/         end-to-end pipelines (estimate, compare_formats)
    streaming/     incremental structured-streaming variants
"""

from dataset_dedupe_estimator_spark.session import get_spark


def estimate(spark, paths, **kwargs):
    """Top-level API parity with the reference package (de/__init__.py):
    dedup-estimate a set of files → metrics dict."""
    from dataset_dedupe_estimator_spark.plans.estimate import estimate as _estimate

    return _estimate(spark, paths, **kwargs)


def chunks(spark, paths, store_data=False, **kwargs):
    """Ordered chunk export with provenance (reference `chunks()` API,
    src/lib.rs:35-47)."""
    from dataset_dedupe_estimator_spark.plans.estimate import chunks_export

    return chunks_export(spark, paths, store_data=store_data, **kwargs)


def visualize_multidoc_diff(spark, paths):
    """HTML diff strips across file versions (de/__init__.py:83-145)."""
    from dataset_dedupe_estimator_spark.operators.chunker import chunk_files
    from dataset_dedupe_estimator_spark.viz import multidoc_diff_html

    return multidoc_diff_html(chunk_files(spark, paths))


__all__ = ["get_spark", "estimate", "chunks", "visualize_multidoc_diff"]
__version__ = "0.1.0"
