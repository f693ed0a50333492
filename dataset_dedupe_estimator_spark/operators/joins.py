"""Join operators Spark lacks natively (SURVEY §2.5 "Join (other)" row —
absent in the reference, first-class here).

as-of join: for every left row, the latest right row at-or-before (or
strictly-before) the left row's time, per key. Implemented with the
union + ordered-window trick — one shuffle on the key, no range explosion,
no per-key quadratic work:

    union(tagged left, tagged right)
      → window last(right cols, ignorenulls) over (key ORDER BY time, tag)
      → keep left rows

This scales as a single sort-based window over |L|+|R| rows — the plan you
want at 100 TB (contrast: a naive theta join L.t >= R.t explodes to
O(|L|·|R|) pairs before aggregation).

Right-side rows must be unique per (key, time); pre-dedupe with a window
if needed (duplicate right timestamps make as-of semantics ambiguous in
any engine).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_time: str,
    right_time: str,
    strict: bool = False,
    suffix: str = "_right",
) -> DataFrame:
    """Left as-of join: latest right row with right_time <= left_time
    (strict=True: < left_time) per key.

    Output: all left columns + right's non-key columns (suffixed where
    colliding) — null when no earlier right row exists.
    """
    keys = [on] if isinstance(on, str) else list(on)
    rcols = [c for c in right.columns if c not in keys and c != right_time]

    def rname(c: str) -> str:
        return c + suffix if c in left.columns else c

    # tag: right rows must sort BEFORE left at equal time for inclusive
    # semantics (left sees them), AFTER for strict semantics.
    right_tag, left_tag = (1, 0) if strict else (0, 1)
    l_tagged = left.select(
        *[F.col(k) for k in keys],
        F.col(left_time).alias("__t"),
        F.lit(left_tag).alias("__tag"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        F.lit(None).cast(
            "struct<" + ", ".join(
                f"`{c}`: {dict(right.dtypes)[c]}" for c in [right_time, *rcols]
            ) + ">"
        ).alias("__r"),
    )
    r_tagged = right.select(
        *[F.col(k) for k in keys],
        F.col(right_time).alias("__t"),
        F.lit(right_tag).alias("__tag"),
        F.lit(None).cast(
            "struct<" + ", ".join(
                f"`{c}`: {dict(left.dtypes)[c]}" for c in left.columns
            ) + ">"
        ).alias("__l"),
        F.struct(
            F.col(right_time), *[F.col(c) for c in rcols]
        ).alias("__r"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(*keys)
        .orderBy("__t", "__tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn("__match", F.last("__r", ignorenulls=True).over(w))
    out = matched.filter(F.col("__l").isNotNull()).select(
        *[F.col(f"__l.`{c}`").alias(c) for c in left.columns],
        F.col(f"__match.`{right_time}`").alias(rname(right_time)),
        *[F.col(f"__match.`{c}`").alias(rname(c)) for c in rcols],
    )
    return out


def range_join_bucket(
    fact: DataFrame,
    buckets: DataFrame,
    value: Column,
    lo: str = "lo",
    hi: str = "hi",
) -> DataFrame:
    """Band/range join: attach the bucket whose [lo, hi) interval contains
    ``value``. Buckets broadcast (they are small by construction); the plan
    is a BroadcastNestedLoopJoin over the band predicate — no shuffle of
    the fact table."""
    return fact.join(
        F.broadcast(buckets),
        (value >= buckets[lo]) & (value < buckets[hi]),
        "left",
    )
