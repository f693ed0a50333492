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

__all__ = ["get_spark"]
__version__ = "0.1.0"
