"""Reusable column-expression building blocks (pure pyspark.sql.functions
compositions — JVM-side, codegen-friendly; no UDFs).

- money: exact integer-cents arithmetic for float-safe aggregation
- hashing: content hashes (md5 cross-engine, xxhash64 fast path), minhash
- text: tokenization, shingles, quality-metric expressions
- vectors: fold-deterministic dot/norm/cosine over array columns
"""

from dataset_dedupe_estimator_spark.functions.money import cents, sql_cents
from dataset_dedupe_estimator_spark.functions.hashing import (
    content_hash,
    minhash_expr,
)
from dataset_dedupe_estimator_spark.functions.text import (
    quality_flags,
    shingle_expr,
    tokens,
)
from dataset_dedupe_estimator_spark.functions.vectors import cosine, dot, norm

__all__ = [
    "cents",
    "sql_cents",
    "content_hash",
    "minhash_expr",
    "tokens",
    "shingle_expr",
    "quality_flags",
    "dot",
    "norm",
    "cosine",
]
