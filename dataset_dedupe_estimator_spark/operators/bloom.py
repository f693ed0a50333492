"""Distributed Bloom filter for incremental-ingest dedup.

The reference answers "have we seen this content before?" with an
in-process exact hash set (``/root/reference/src/xet.rs:24-33``). At
cluster scale the history side of that question is petabytes: shuffling
it against every incoming batch is the bottleneck. The standard fix is a
Bloom-filter prefilter:

1. Fold the history's content digests ONCE into an m-bit Bloom filter,
   represented as a DataFrame of ``m/64`` longs ``(word, bits)``. The
   fold is an algebraic ``bit_or`` aggregate, so map-side partial
   aggregation collapses each scan partition to at most ``m/64`` rows
   before the (tiny) shuffle.
2. Broadcast the filter (``m = 2^20`` bits is 128 KiB — bounded by
   construction, independent of history size) and probe the incoming
   batch against it JVM-side.
3. Run the exact verification join ONLY for bloom-positive candidates.
   Bloom filters have no false negatives, so the final result is exact;
   false positives only cost extra rows in the small verify join.

Sizing: for target false-positive rate p with k hashes,
``m_bits ≈ -n * ln(p) / ln(2)^2`` (≈ 10 bits/element at p=1%). The
caller picks ``m_bits`` from the history cardinality; the representation
cost is always ``m_bits/8`` bytes broadcast once per batch.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_M_BITS = 1 << 20
DEFAULT_K = 3


def _positions(col: Column, m_bits: int, k: int) -> list[Column]:
    """k bit positions in [0, m_bits) for a value: xxhash64 with k seeds.

    ``xxhash64(value, i)`` hashes the (value, seed-index) tuple, giving k
    independent-enough 64-bit hashes without leaving the JVM.
    """
    return [F.pmod(F.xxhash64(col, F.lit(i)), F.lit(m_bits)) for i in range(k)]


def bloom_build(
    df: DataFrame, col: str, m_bits: int = DEFAULT_M_BITS, k: int = DEFAULT_K
) -> DataFrame:
    """Aggregate ``df[col]`` into a Bloom bitset DataFrame ``(word, bits)``.

    At most ``m_bits/64`` rows; only words with at least one set bit are
    present (probes treat a missing word as all-zero).
    """
    pos = df.select(F.explode(F.array(*_positions(F.col(col), m_bits, k))).alias("pos"))
    return (
        pos.select(
            F.expr("pos DIV 64").alias("word"),
            F.expr("shiftleft(1L, cast(pos % 64 AS int))").alias("bit"),
        )
        .groupBy("word")
        .agg(F.bit_or("bit").alias("bits"))
    )


def bloom_probe(
    df: DataFrame,
    col: str,
    bloom: DataFrame,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Add a ``bloom_hit`` boolean: True iff all k bits for ``df[col]`` are
    set in ``bloom`` (definitely-new rows get False and can skip the exact
    join entirely).

    The filter is explicitly broadcast — its size is bounded by
    ``m_bits/64`` rows regardless of history cardinality, so the hint is
    always safe (unlike data-dependent broadcast hints).
    """
    probes = df
    for i, pos in enumerate(_positions(F.col(col), m_bits, k)):
        probes = probes.withColumn(f"_pos{i}", pos)
    hit_flags = []
    for i in range(k):
        b = F.broadcast(
            bloom.select(
                F.col("word").alias(f"_bw{i}"), F.col("bits").alias(f"_bits{i}")
            )
        )
        probes = probes.join(
            b, F.expr(f"_pos{i} DIV 64") == F.col(f"_bw{i}"), "left"
        )
        hit_flags.append(
            (
                F.expr(f"_bits{i} & shiftleft(1L, cast(_pos{i} % 64 AS int))") != 0
            ).alias(f"_hit{i}")
        )
    hit = hit_flags[0]
    for h in hit_flags[1:]:
        hit = hit & h
    drop = [c for c in probes.columns if c.startswith(("_pos", "_bw", "_bits"))]
    return probes.withColumn("bloom_hit", F.coalesce(hit, F.lit(False))).drop(*drop)
