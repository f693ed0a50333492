"""Distributed total-order ranking without a single-partition window.

An unpartitioned ``Window.orderBy`` funnels every row through ONE task —
the one plan shape that cannot survive a 100x scale-up no matter how
small its input "usually" is. This module is the scale-safe replacement
for every global-rank / exact-discrete-quantile need in the registry
(reference behavior: the quantile/NTILE reports the estimator's display
layer produces, de/display.py-adjacent — re-expressed as a distributed
plan):

1. ``repartitionByRange`` on the sort key — the same exchange a global
   sort would use, and the LAST corpus-sized data movement;
2. ``localCheckpoint`` freezes the sampled range bounds, so every later
   job sees the SAME partition assignment (without it, the offset job
   and the rank job could re-sample different bounds);
3. one tiny job sums row counts (or a weight column) per partition —
   at most ``npart`` numbers reach the driver, never rows;
4. the cumulative offsets broadcast back; a PARTITIONED window (one
   group per range partition) computes the local rank/cumsum, and
   local + offset is the exact global value.

Every partition sorts only its own slice — wall-clock scales with the
largest range slice, not the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_PID = "_rank_pid"
_OFF = "_rank_off"
_LOCAL = "_rank_local"


def with_global_cumsums(
    df: DataFrame,
    order_by: list,
    weights: dict[str, str | None],
    npart: int = 32,
) -> tuple[DataFrame, dict[str, int]]:
    """Add one exact global running total per ``weights`` entry over the
    total order given by ``order_by``: ``out_col -> None`` is the
    inclusive cumsum of 1s — i.e. a global ``row_number`` — and
    ``out_col -> weight_col`` the inclusive cumsum of that column. All
    cumsums share ONE range exchange, one offset job, and one
    partitioned window. Returns ``(df + out_cols, grand_totals)``; the
    totals come for free from the offset job (an action — the input is
    checkpointed first, so upstream computes once)."""
    integral = {"tinyint", "smallint", "int", "bigint", "long"}
    dtypes = dict(df.dtypes)
    for out, wcol in weights.items():
        if wcol is not None and dtypes.get(wcol) not in integral:
            raise ValueError(
                f"weight column {wcol!r} for {out!r} has dtype "
                f"{dtypes.get(wcol)!r}; cumsums are exact-integer only "
                "(per-partition offsets and the output cast truncate "
                "fractions) — pre-scale to integer units (e.g. cents)"
            )
    parts = df.repartitionByRange(npart, *order_by).withColumn(
        _PID, F.spark_partition_id()
    )
    # freeze rows AND partition ids before the two downstream jobs
    parts = parts.localCheckpoint(eager=True)
    aggs = [
        (F.count(F.lit(1)) if wcol is None else F.sum(wcol)).alias(out)
        for out, wcol in weights.items()
    ]
    pid_rows = sorted(
        parts.groupBy(_PID).agg(*aggs).collect(), key=lambda r: r[_PID]
    )
    totals = dict.fromkeys(weights, 0)
    offsets = []  # (pid, off_for_out_col_1, off_for_out_col_2, ...)
    for r in pid_rows:  # partition index order == range order
        offsets.append((r[_PID], *(totals[out] for out in weights)))
        for out in weights:
            totals[out] += int(r[out] or 0)
    spark = df.sparkSession
    off_cols = [f"{_OFF}_{i}" for i in range(len(weights))]
    off_schema = ", ".join([f"{_PID} int"] + [f"{c} long" for c in off_cols])
    off_df = spark.createDataFrame(
        offsets or [(0,) + (0,) * len(weights)], off_schema
    )
    w = Window.partitionBy(_PID).orderBy(*order_by)
    ranked = parts
    local_cols = []
    for i, (out, wcol) in enumerate(weights.items()):
        local = (
            F.row_number().over(w).cast("long")
            if wcol is None
            else F.sum(wcol).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
        )
        local_cols.append(f"{_LOCAL}_{i}")
        ranked = ranked.withColumn(f"{_LOCAL}_{i}", local)
    ranked = ranked.join(F.broadcast(off_df), _PID)
    for i, out in enumerate(weights):
        ranked = ranked.withColumn(
            out, (F.col(f"{_LOCAL}_{i}") + F.col(off_cols[i])).cast("long")
        )
    return ranked.drop(_PID, *off_cols, *local_cols), totals


def with_global_cumsum(
    df: DataFrame,
    order_by: list,
    weight_col: str | None = None,
    out_col: str = "cum",
    npart: int = 32,
) -> tuple[DataFrame, int]:
    """Single-cumsum convenience over :func:`with_global_cumsums`;
    ``weight_col=None`` yields a global ``row_number``."""
    ranked, totals = with_global_cumsums(
        df, order_by, {out_col: weight_col}, npart=npart
    )
    return ranked, totals[out_col]


def type1_rank(n: int, num: int, den: int) -> int:
    """The 1-based rank of the type-1 (discrete, lower) quantile num/den
    in an n-element multiset: floor(p*(n-1)) + 1, in pure integer math —
    the same expression the DuckDB oracles use, so a binary-vs-decimal
    fraction can never move the boundary."""
    return (n - 1) * num // den + 1
