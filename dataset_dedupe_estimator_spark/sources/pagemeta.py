"""Parquet physical-layout metadata scan (S11, de/fileutils.py:67-76,
CLI histogram de/cli.py:273-307).

The reference shells out to `parquet-layout` for per-data-page sizes; here
the equivalent runs distributed: one task per file reads footer metadata
via pyarrow (no data pages decoded) and emits one row per column chunk.
Per-page granularity is not exposed by pyarrow's footer API, so the unit
is the column chunk (page-set) — same downstream use (size histograms for
chunking behavior analysis).
"""

from __future__ import annotations

from collections.abc import Iterator

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SCHEMA = (
    "path string, row_group int, column_name string, num_values long, "
    "total_uncompressed long, total_compressed long, encodings string, codec string"
)

_PA_SCHEMA = pa.schema(
    [
        ("path", pa.string()),
        ("row_group", pa.int32()),
        ("column_name", pa.string()),
        ("num_values", pa.int64()),
        ("total_uncompressed", pa.int64()),
        ("total_compressed", pa.int64()),
        ("encodings", pa.string()),
        ("codec", pa.string()),
    ]
)


def page_chunk_meta(spark: SparkSession, paths: list[str]) -> DataFrame:
    """(path, row_group, column, sizes...) — one row per column chunk."""
    files = spark.createDataFrame([(p,) for p in paths], "path string").repartition(
        max(len(paths), 1)
    )

    def scan(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            rows = {name: [] for name in _PA_SCHEMA.names}
            for path in batch.column("path").to_pylist():
                meta = pq.ParquetFile(path).metadata
                for rg in range(meta.num_row_groups):
                    g = meta.row_group(rg)
                    for c in range(g.num_columns):
                        col = g.column(c)
                        rows["path"].append(path)
                        rows["row_group"].append(rg)
                        rows["column_name"].append(col.path_in_schema)
                        rows["num_values"].append(col.num_values)
                        rows["total_uncompressed"].append(col.total_uncompressed_size)
                        rows["total_compressed"].append(col.total_compressed_size)
                        rows["encodings"].append(",".join(col.encodings))
                        rows["codec"].append(col.compression)
            yield pa.RecordBatch.from_pydict(rows, schema=_PA_SCHEMA)

    return files.mapInArrow(scan, _SCHEMA)


def chunk_size_histogram(meta: DataFrame, bucket_bytes: int = 64 * 1024) -> DataFrame:
    """Histogram of column-chunk uncompressed sizes (de/cli.py:286-307)."""
    bucket = (F.col("total_uncompressed") / bucket_bytes).cast("long")
    return (
        meta.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("total_uncompressed").alias("bytes"),
        )
        .withColumn("bucket_start", F.col("bucket") * bucket_bytes)
        .orderBy("bucket")
    )
