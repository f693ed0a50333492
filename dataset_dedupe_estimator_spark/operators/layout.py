"""Z-order (Morton-curve) data layout for multi-dimensional data skipping.

At 100 TB the cheapest query is the one that never reads the bytes:
parquet row-group/file min-max stats prune scans, but a table sorted on
one column only skips on that column.  Interleaving the bits of several
columns into one Morton key and range-partition-sorting on it gives
every participating column *locality* inside each file/row group, so
conjunctive filters over any subset of the dimensions prune — the same
layout strategy Delta Lake's OPTIMIZE ZORDER BY and ClickHouse's
space-filling-curve indexes use.

Everything here is integer arithmetic inside whole-stage codegen (the
z-value is a sum of ``(col div 2^i) % 2 * 2^k`` terms — no UDFs), and
the write path is ``repartitionByRange(z) + sortWithinPartitions(z)``:
one range exchange, then each output file covers a tight Morton tile.

Pruning evidence is measured, not assumed: :func:`rowgroup_ranges`
reads the parquet footers (pyarrow) and :func:`pruning_fraction`
computes exactly which row groups a min-max-aware reader (Spark's
parquet source with pushed filters, or any zone-map scan) must touch.

Relation to ``sources/compact.py::zorder_value``: that is the
compaction-time variant (exactly two columns, 16-bit shift intrinsics,
driver-collected bounds — a maintenance-budget operator). This module
is the general form: n dimensions, broadcast bounds, and div/mod
arithmetic expressible in ANSI SQL so the gate's DuckDB oracle can
recompute the identical key (:func:`zvalue_sql`).
"""

from __future__ import annotations

import operator
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(cols: list[Column], bits: int = 10) -> Column:
    """Morton-interleave non-negative integer columns into one long.

    Bit ``i`` of column ``d`` lands at position ``i * ndims + d``.  Bit
    extraction is ``shiftright(c, i) % 2`` — exact integer ops for the
    full 62-bit range (a ``c / 2^i`` double division would lose bits
    past 2^53).  The DuckDB oracle form (:func:`zvalue_sql`) uses the
    equivalent exact integer division ``//``; both stay in codegen.
    """
    ndims = len(cols)
    if ndims * bits > 62:
        raise ValueError(f"{ndims} dims x {bits} bits overflows a long")
    terms = []
    for d, col in enumerate(cols):
        c = col.cast("long")
        for i in range(bits):
            terms.append((F.shiftright(c, i) % 2) * F.lit(1 << (i * ndims + d)))
    return reduce(operator.add, terms).alias("zvalue")


def zvalue_sql(exprs: list[str], bits: int = 10) -> str:
    """ANSI-SQL (DuckDB) equivalent of :func:`zvalue` for oracle checks."""
    ndims = len(exprs)
    terms = []
    for d, e in enumerate(exprs):
        for i in range(bits):
            terms.append(f"((({e}) // {1 << i}) % 2) * {1 << (i * ndims + d)}")
    return "(" + " + ".join(terms) + ")"


def scale_to_bits(col: Column, lo: Column, hi: Column, bits: int = 10) -> Column:
    """Map ``col`` in [lo, hi] onto [0, 2^bits) — overflow-safe.

    Divides BEFORE multiplying (``(col-lo) * 2^bits`` overflows a long
    for wide domains like epoch-nanos), and clamps: bucketing needs
    monotonicity, not exactness, so double precision is fine here.
    """
    span = (hi - lo + F.lit(1)).cast("double")
    frac = (col.cast("long") - lo.cast("long")).cast("double") / span
    return F.least(
        F.lit((1 << bits) - 1),
        F.greatest(F.lit(0), F.floor(frac * F.lit(1 << bits)).cast("long")),
    )


def zorder_frame(
    df: DataFrame,
    cols: list[str],
    bits: int = 10,
    num_files: int = 16,
) -> DataFrame:
    """``df`` re-clustered along the Morton curve of ``cols``, unwritten.

    One aggregate computes per-column min/max (the normalizers), one
    range exchange orders the data along the curve; each output
    partition is a contiguous Morton tile whose footer min-max stats
    are tight on *every* participating column once written.  The
    normalizer aggregate is a scalar broadcast — at 100 TB it rides a
    footer-stats read or a sampled pass; the data itself moves through
    exactly one exchange.  Returned unwritten so callers can route the
    clustered frame into any sink (plain parquet here; a versioned
    `optimize` commit in ``sources/versioned.py``).
    """
    # index-keyed normalizer aliases: a dotted NESTED path ("a.b.c")
    # in the alias name would read back as struct access — positional
    # names keep the clustering columns free to be any depth
    bounds = df.agg(
        *[F.min(c).alias(f"_lo_{i}") for i, c in enumerate(cols)],
        *[F.max(c).alias(f"_hi_{i}") for i, c in enumerate(cols)],
    )
    scaled = [
        scale_to_bits(F.col(c), F.col(f"_lo_{i}"), F.col(f"_hi_{i}"), bits)
        for i, c in enumerate(cols)
    ]
    keyed = df.crossJoin(F.broadcast(bounds)).withColumn("_z", zvalue(scaled, bits))
    return (
        keyed.repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
        .drop(
            *[f"_lo_{i}" for i in range(len(cols))],
            *[f"_hi_{i}" for i in range(len(cols))],
            "_z",
        )
    )


def write_zordered(
    df: DataFrame,
    cols: list[str],
    path: str,
    bits: int = 10,
    num_files: int = 16,
) -> None:
    """Write ``df`` as parquet clustered on the Morton key of ``cols``."""
    zorder_frame(df, cols, bits, num_files).write.mode("overwrite").parquet(path)


def rowgroup_ranges(path: str, column: str) -> list[tuple]:
    """(min, max) footer stats of ``column`` for every row group under
    ``path`` (recursing into partitioned/nested layouts).  A row group
    without usable stats yields ``(None, None)`` — a pruning reader must
    always scan it, and :func:`pruning_fraction` counts it touched."""
    import pyarrow.parquet as pq
    from pathlib import Path

    p = Path(path)
    files = [p] if p.is_file() else sorted(p.rglob("*.parquet"))
    if not files:
        raise ValueError(f"no parquet files under {path}")
    ranges = []
    for f in files:
        meta = pq.ParquetFile(str(f)).metadata
        idx = {meta.schema.column(i).name: i for i in range(meta.num_columns)}[column]
        for rg in range(meta.num_row_groups):
            st = meta.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                ranges.append((None, None))
            else:
                ranges.append((st.min, st.max))
    return ranges


def pruning_fraction(path: str, predicates: dict[str, tuple[int, int]]) -> float:
    """Fraction of row groups a min-max-pruning reader must scan.

    ``predicates`` maps column -> inclusive (lo, hi) band; a row group
    survives only if its footer range overlaps *every* band (conjunctive
    filter) — the exact zone-map arithmetic Spark's parquet reader and
    any lakehouse scan planner applies.
    """
    per_col = {c: rowgroup_ranges(path, c) for c in predicates}
    n = len(next(iter(per_col.values())))
    touched = 0
    for rg in range(n):
        if all(
            per_col[c][rg][0] is None  # no stats -> must scan
            or (per_col[c][rg][0] <= hi and per_col[c][rg][1] >= lo)
            for c, (lo, hi) in predicates.items()
        ):
            touched += 1
    return touched / n if n else 1.0
