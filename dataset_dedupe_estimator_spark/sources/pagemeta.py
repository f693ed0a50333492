"""Parquet physical-layout metadata scan (S11, de/fileutils.py:67-76,
CLI histogram de/cli.py:273-307).

The reference shells out to `parquet-layout` for per-data-page sizes; here
the equivalent runs distributed, at two granularities:

* ``page_chunk_meta`` — one task per file reads footer metadata via
  pyarrow (no data pages decoded), one row per *column chunk*.
* ``page_meta`` — true per-*data-page* rows (parquet-layout parity): each
  task walks the page headers inside every column chunk with a minimal
  Thrift compact-protocol reader (headers only — page payloads are seeked
  over, never decompressed), so the cost per file is footer + one header
  read per page.
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


# --- per-data-page scan: minimal Thrift compact-protocol PageHeader reader ---
#
# PageHeader (parquet-format Thrift IDL): 1=type(i32) 2=uncompressed_page_size
# 3=compressed_page_size 4=crc 5=data_page_header 6=index_page_header
# 7=dictionary_page_header 8=data_page_header_v2; the nested page-header
# structs carry num_values at field 1 and encoding at field 2.

_CT_STOP, _CT_TRUE, _CT_FALSE = 0, 1, 2
_CT_BYTE, _CT_I16, _CT_I32, _CT_I64, _CT_DOUBLE = 3, 4, 5, 6, 7
_CT_BINARY, _CT_LIST, _CT_SET, _CT_MAP, _CT_STRUCT = 8, 9, 10, 11, 12


def _uvarint(buf: bytes, pos: int) -> tuple[int, int]:
    out = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7


def _zigzag(buf: bytes, pos: int) -> tuple[int, int]:
    u, pos = _uvarint(buf, pos)
    return (u >> 1) ^ -(u & 1), pos


def _skip_value(buf: bytes, pos: int, ctype: int):
    """Parse-and-discard a compact-protocol value; structs recurse."""
    if ctype in (_CT_TRUE, _CT_FALSE):
        return pos
    if ctype in (_CT_BYTE, _CT_I16, _CT_I32, _CT_I64):
        _, pos = _zigzag(buf, pos)
        return pos
    if ctype == _CT_DOUBLE:
        return pos + 8
    if ctype == _CT_BINARY:
        n, pos = _uvarint(buf, pos)
        return pos + n
    if ctype in (_CT_LIST, _CT_SET):
        head = buf[pos]
        pos += 1
        size, elem = head >> 4, head & 0x0F
        if size == 15:
            size, pos = _uvarint(buf, pos)
        for _ in range(size):
            pos = _skip_value(buf, pos, elem)
        return pos
    if ctype == _CT_MAP:
        size, pos = _uvarint(buf, pos)
        if size:
            kv = buf[pos]
            pos += 1
            for _ in range(size):
                pos = _skip_value(buf, pos, kv >> 4)
                pos = _skip_value(buf, pos, kv & 0x0F)
        return pos
    if ctype == _CT_STRUCT:
        _, pos = _read_struct(buf, pos)
        return pos
    raise ValueError(f"unknown compact type {ctype}")


def _read_struct(buf: bytes, pos: int) -> tuple[dict[int, object], int]:
    """Struct → {field_id: value}; ints decoded, nested structs as dicts,
    everything else skipped (value None)."""
    fields: dict[int, object] = {}
    fid = 0
    while True:
        head = buf[pos]
        pos += 1
        if head == _CT_STOP:
            return fields, pos
        delta, ctype = head >> 4, head & 0x0F
        if delta:
            fid += delta
        else:
            fid, pos = _zigzag(buf, pos)
        if ctype in (_CT_TRUE, _CT_FALSE):
            fields[fid] = ctype == _CT_TRUE
        elif ctype in (_CT_BYTE, _CT_I16, _CT_I32, _CT_I64):
            fields[fid], pos = _zigzag(buf, pos)
        elif ctype == _CT_STRUCT:
            fields[fid], pos = _read_struct(buf, pos)
        else:
            fields[fid] = None
            pos = _skip_value(buf, pos, ctype)


_PAGE_TYPES = {0: "data", 1: "index", 2: "dictionary", 3: "data_v2"}
_ENCODINGS = {
    0: "PLAIN", 2: "PLAIN_DICTIONARY", 3: "RLE", 4: "BIT_PACKED",
    5: "DELTA_BINARY_PACKED", 6: "DELTA_LENGTH_BYTE_ARRAY",
    7: "DELTA_BYTE_ARRAY", 8: "RLE_DICTIONARY", 9: "BYTE_STREAM_SPLIT",
}

_PAGE_DDL = (
    "path string, row_group int, column_name string, page_idx int, "
    "page_type string, num_values long, uncompressed long, compressed long, "
    "header_bytes long, encoding string"
)

_PAGE_PA_SCHEMA = pa.schema(
    [
        ("path", pa.string()),
        ("row_group", pa.int32()),
        ("column_name", pa.string()),
        ("page_idx", pa.int32()),
        ("page_type", pa.string()),
        ("num_values", pa.int64()),
        ("uncompressed", pa.int64()),
        ("compressed", pa.int64()),
        ("header_bytes", pa.int64()),
        ("encoding", pa.string()),
    ]
)


def _iter_chunk_pages(chunk: bytes):
    """Yield (page_type, num_values, uncompressed, compressed, header_len,
    encoding) per page header in a column chunk's byte range."""
    pos, end = 0, len(chunk)
    while pos < end:
        header, after = _read_struct(chunk, pos)
        ptype = _PAGE_TYPES.get(header.get(1), f"type{header.get(1)}")
        nested = header.get(8) or header.get(5) or header.get(7) or {}
        yield (
            ptype,
            nested.get(1),
            header.get(2, 0),
            header.get(3, 0),
            after - pos,
            _ENCODINGS.get(nested.get(2), str(nested.get(2))),
        )
        pos = after + header.get(3, 0)


def page_meta(spark: SparkSession, paths: list[str]) -> DataFrame:
    """One row per parquet *data page* (parquet-layout parity,
    de/fileutils.py:67-76): task-per-file footer scan + header walk."""
    files = spark.createDataFrame([(p,) for p in paths], "path string").repartition(
        max(len(paths), 1)
    )

    def scan(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            rows = {name: [] for name in _PAGE_PA_SCHEMA.names}
            for path in batch.column("path").to_pylist():
                meta = pq.ParquetFile(path).metadata
                with open(path, "rb") as f:
                    for rg in range(meta.num_row_groups):
                        g = meta.row_group(rg)
                        for c in range(g.num_columns):
                            col = g.column(c)
                            offsets = [col.data_page_offset]
                            if col.dictionary_page_offset is not None:
                                offsets.append(col.dictionary_page_offset)
                            start = min(o for o in offsets if o is not None)
                            f.seek(start)
                            chunk = f.read(col.total_compressed_size)
                            for idx, page in enumerate(_iter_chunk_pages(chunk)):
                                ptype, nvals, unc, comp, hlen, enc = page
                                rows["path"].append(path)
                                rows["row_group"].append(rg)
                                rows["column_name"].append(col.path_in_schema)
                                rows["page_idx"].append(idx)
                                rows["page_type"].append(ptype)
                                rows["num_values"].append(nvals)
                                rows["uncompressed"].append(unc)
                                rows["compressed"].append(comp)
                                rows["header_bytes"].append(hlen)
                                rows["encoding"].append(enc)
            yield pa.RecordBatch.from_pydict(rows, schema=_PAGE_PA_SCHEMA)

    return files.mapInArrow(scan, _PAGE_DDL)


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
