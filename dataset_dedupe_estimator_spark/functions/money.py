"""Exact money/measure arithmetic.

Test-corpus doubles are exact 2-decimal values; aggregating them as
integer cents makes every sum exact and engine-identical (the float
discipline behind the oracle gate — see queries/base.py)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cents(col: str | Column) -> Column:
    """Exact integer cents from a 2-decimal double column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * F.lit(100.0), 0).cast("long")


def sql_cents(expr: str) -> str:
    """ANSI-SQL (DuckDB) equivalent of :func:`cents`."""
    return f"CAST(ROUND(({expr}) * 100.0) AS BIGINT)"
