"""Text-analysis expressions (tokenize / shingle / quality), shared by the
dedup and text-quality operators."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(col: str | Column = "text", sep: str = " ") -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, sep)


def shingle_expr(tokens_col: Column, width: int = 3) -> Column:
    """Word-w-gram shingle array from a *materialized* token-array column.

    The token array must come from its own projection — building split()
    inline re-evaluates it per element access inside the lambda (no CSE
    across lambda scopes; ~10x slowdown measured)."""
    n = F.size(tokens_col)
    joined = F.transform(
        F.sequence(F.lit(0), n - width),
        lambda i: F.concat_ws(
            " ", *[tokens_col[i + off] for off in range(width)]
        ),
    )
    return F.when(n >= width, joined).otherwise(F.array().cast("array<string>"))


def quality_flags(tokens_col: Column, min_tokens: int = 20, min_ttr: float = 0.05) -> Column:
    """Boolean LLM-data quality gate: enough tokens + lexical diversity."""
    n = F.size(tokens_col)
    ttr = F.size(F.array_distinct(tokens_col)).cast("double") / n.cast("double")
    return (n >= min_tokens) & (ttr > min_ttr)
