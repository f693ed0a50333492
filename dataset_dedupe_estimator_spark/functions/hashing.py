"""Content-hash expressions.

The engine keeps the hash role pluggable (SURVEY §2.2 C2: "any stable
64-bit content hash"): md5 when results must be reproducible across
engines (the oracle gate), xxhash64 for production throughput (JVM
intrinsic, no hex strings)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def content_hash(col: str | Column, fast: bool = False) -> Column:
    """64-bit-equivalent content id for a string/binary column.

    fast=False → md5 hex (cross-engine reproducible, 128-bit).
    fast=True  → xxhash64 (bigint; ~10x cheaper; Spark-specific seed 42).
    """
    c = F.col(col) if isinstance(col, str) else col
    if fast:
        return F.xxhash64(c)
    return F.md5(c.cast("binary"))


def minhash_expr(col: str | Column, seed: int, fast: bool = False) -> Column:
    """One seeded-permutation hash for MinHash signatures.

    Aggregate with ``F.min`` per document. md5-prefix permutations are the
    oracle-checkable form; xxhash64(seed) the fast form.
    """
    c = F.col(col) if isinstance(col, str) else col
    if fast:
        return F.xxhash64(F.lit(seed), c)
    return F.md5(F.concat(F.lit(f"{seed}:"), c).cast("binary"))
