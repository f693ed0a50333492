"""Synthetic edit operators (reference "DML", de/synthetic.py) re-expressed
as oracle-checkable relational transforms over ``lineitem``.

The reference edits in-memory Arrow tables by slice+concat at relative edit
points (delete_rows de/synthetic.py:15-24, insert_rows :26-34, append_rows
:36-38, update_rows :40-50). Row order in a DataFrame is carried explicitly:
row_number over (l_orderkey, l_linenumber) plays the role of the table's
physical position. Each query returns a compact integer/cents summary so
the oracle hash is insensitive to float noise.

Generator determinism (SURVEY §7.4 risk 2): generated values are pure
functions of (seed, position) — counter-based, identical in any engine —
rather than sequential RNG draws.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dataset_dedupe_estimator_spark.operators.ranking import with_global_cumsum
from dataset_dedupe_estimator_spark.queries.base import Q, cents, load, sql_cents

EDIT_POINTS = (0.25, 0.5, 0.75)
EDIT_SIZE = 10
APPEND_RATIO = 0.05

_ORDER = ("l_orderkey", "l_linenumber")


def _with_pos(li):
    """0-based physical position, reference table-slice semantics.

    The global row_number comes from the distributed ranking primitive
    (``operators/ranking.with_global_cumsum``: range exchange +
    partitioned window + broadcast offsets) — a 100 TB table gets exact
    positions without a single-partition sort; the total row count ``n``
    falls out of the same offset pass and is attached as a literal.
    """
    ranked, n = with_global_cumsum(
        li, [F.col(c) for c in _ORDER], out_col="_rn1"
    )
    return (
        ranked.withColumn("pos", F.col("_rn1") - 1)
        .drop("_rn1")
        .withColumn("n", F.lit(n).cast("long"))
    )


def _points(n_col):
    """Edit positions: int(n * p) per reference (de/cli.py:94 linspace feeds
    de/synthetic.py int() truncation)."""
    return [F.floor(F.lit(p) * n_col).cast("long") for p in EDIT_POINTS]


_POS_SQL = "ROW_NUMBER() OVER (ORDER BY l_orderkey, l_linenumber) - 1"
_N_SQL = "(SELECT COUNT(*) FROM lineitem)"


def synthetic_delete_rows(spark, sf):
    """G2: drop EDIT_SIZE rows immediately before each edit point; summary
    by returnflag proves exactly which rows went."""
    li = _with_pos(load(spark, sf, "lineitem"))
    deleted = None
    for pt in _points(F.col("n")):
        cond = (F.col("pos") >= pt - EDIT_SIZE) & (F.col("pos") < pt)
        deleted = cond if deleted is None else (deleted | cond)
    return (
        li.filter(~deleted)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(cents("l_quantity")).alias("qty_cents"),
            F.sum("l_orderkey").alias("key_sum"),
        )
        .orderBy("l_returnflag")
    )


_DEL_CONDS = " OR ".join(
    f"(pos >= CAST(FLOOR({p} * n) AS BIGINT) - {EDIT_SIZE} AND pos < CAST(FLOOR({p} * n) AS BIGINT))"
    for p in EDIT_POINTS
)

DELETE_SQL = f"""
WITH base AS (
  SELECT *, {_POS_SQL} AS pos, {_N_SQL} AS n FROM lineitem
)
SELECT l_returnflag, COUNT(*) AS n_rows,
       CAST(SUM({sql_cents("l_quantity")}) AS BIGINT) AS qty_cents,
       CAST(SUM(l_orderkey) AS BIGINT) AS key_sum
FROM base WHERE NOT ({_DEL_CONDS})
GROUP BY l_returnflag ORDER BY l_returnflag
"""


def synthetic_insert_rows(spark, sf):
    """G3: splice EDIT_SIZE generated rows at each edit point. Generated
    rows are counter-based (point index i, slot j) and tagged 'GEN'."""
    li = _with_pos(load(spark, sf, "lineitem"))
    gen_rows = [
        (i, j, (i * 7919 + j * 104729) % 1000000)
        for i in range(len(EDIT_POINTS))
        for j in range(EDIT_SIZE)
    ]
    gen = spark.createDataFrame(gen_rows, "point_idx long, slot long, gen_val long").select(
        F.lit("GEN").alias("l_returnflag"),
        F.col("gen_val").alias("qty_cents_val"),
        (F.col("point_idx") * 100 + F.col("slot")).alias("key_val"),
    )
    orig = li.select(
        "l_returnflag",
        cents("l_quantity").alias("qty_cents_val"),
        F.col("l_orderkey").alias("key_val"),
    )
    return (
        orig.unionByName(gen)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("qty_cents_val").alias("qty_cents"),
            F.sum("key_val").alias("key_sum"),
        )
        .orderBy("l_returnflag")
    )


_GEN_ROWS_SQL = f"""
  SELECT 'GEN' AS l_returnflag,
         (i * 7919 + j * 104729) % 1000000 AS qty_cents_val,
         i * 100 + j AS key_val
  FROM generate_series(0, {len(EDIT_POINTS) - 1}) AS gi(i),
       generate_series(0, {EDIT_SIZE - 1}) AS gj(j)
"""

INSERT_SQL = f"""
WITH unioned AS (
  SELECT l_returnflag, {sql_cents("l_quantity")} AS qty_cents_val, l_orderkey AS key_val
  FROM lineitem
  UNION ALL
  {_GEN_ROWS_SQL}
)
SELECT l_returnflag, COUNT(*) AS n_rows,
       CAST(SUM(qty_cents_val) AS BIGINT) AS qty_cents,
       CAST(SUM(key_val) AS BIGINT) AS key_sum
FROM unioned GROUP BY l_returnflag ORDER BY l_returnflag
"""


def synthetic_update_rows(spark, sf):
    """G5: replace the single row at each edit point (reference uses one
    fresh row per point, de/synthetic.py:47) — quantity becomes 99.99."""
    li = _with_pos(load(spark, sf, "lineitem"))
    at_point = None
    for pt in _points(F.col("n")):
        cond = F.col("pos") == pt
        at_point = cond if at_point is None else (at_point | cond)
    qty = F.when(at_point, F.lit(9999)).otherwise(cents("l_quantity"))
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(qty).alias("qty_cents"),
            F.sum(F.when(at_point, 1).otherwise(0)).alias("n_updated"),
        )
        .orderBy("l_returnflag")
    )


_UPD_CONDS = " OR ".join(
    f"pos = CAST(FLOOR({p} * n) AS BIGINT)" for p in EDIT_POINTS
)

UPDATE_SQL = f"""
WITH base AS (
  SELECT *, {_POS_SQL} AS pos, {_N_SQL} AS n FROM lineitem
)
SELECT l_returnflag, COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN {_UPD_CONDS} THEN 9999 ELSE {sql_cents("l_quantity")} END) AS BIGINT) AS qty_cents,
       CAST(SUM(CASE WHEN {_UPD_CONDS} THEN 1 ELSE 0 END) AS BIGINT) AS n_updated
FROM base GROUP BY l_returnflag ORDER BY l_returnflag
"""


def synthetic_append_rows(spark, sf):
    """G4: append floor(ratio·n) generated rows; verify via total counts.

    The appended rows are derived from the numbered base table itself
    (``i < floor(ratio * n)``) so no driver-side ``count()`` job is needed —
    the whole edit stays one declarative plan, mirroring APPEND_SQL.
    """
    li = _with_pos(load(spark, sf, "lineitem"))
    gen = li.filter(
        F.col("pos") < F.floor(F.lit(APPEND_RATIO) * F.col("n")).cast("long")
    ).select(
        F.lit("GEN").alias("l_returnflag"),
        ((F.col("pos") * 2654435761) % 1000000).alias("qty_cents_val"),
    )
    orig = li.select("l_returnflag", cents("l_quantity").alias("qty_cents_val"))
    return (
        orig.unionByName(gen)
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n_rows"), F.sum("qty_cents_val").alias("qty_cents"))
        .orderBy("l_returnflag")
    )


APPEND_SQL = f"""
WITH numbered AS (
  SELECT ROW_NUMBER() OVER (ORDER BY l_orderkey, l_linenumber) - 1 AS i,
         COUNT(*) OVER () AS n
  FROM lineitem
),
unioned AS (
  SELECT l_returnflag, {sql_cents("l_quantity")} AS qty_cents_val FROM lineitem
  UNION ALL
  SELECT 'GEN' AS l_returnflag, (i * 2654435761) % 1000000 AS qty_cents_val
  FROM numbered WHERE i < CAST(FLOOR({APPEND_RATIO} * n) AS BIGINT)
)
SELECT l_returnflag, COUNT(*) AS n_rows,
       CAST(SUM(qty_cents_val) AS BIGINT) AS qty_cents
FROM unioned GROUP BY l_returnflag ORDER BY l_returnflag
"""


def synthetic_update_column(spark, sf):
    """G6: swap a single column from an 'updated' variant by physical
    position (de/synthetic.py:76-83 set_column) — quantity is replaced at
    the edit points, all other columns provably untouched."""
    li = _with_pos(load(spark, sf, "lineitem"))
    at_point = None
    for pt in _points(F.col("n")):
        cond = F.col("pos") == pt
        at_point = cond if at_point is None else (at_point | cond)
    # the 'updated' variant's quantity column, joined back by position
    updated = li.select(
        "pos", F.when(at_point, F.lit(9999)).otherwise(cents("l_quantity")).alias("new_qty"),
    )
    swapped = li.select("pos", "l_returnflag", cents("l_extendedprice").alias("ep_cents")).join(
        updated, "pos"
    )
    return (
        swapped.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("new_qty").alias("qty_cents"),
            F.sum("ep_cents").alias("ep_cents_sum"),  # untouched column proof
        )
        .orderBy("l_returnflag")
    )


UPDATE_COLUMN_SQL = f"""
WITH base AS (
  SELECT *, {_POS_SQL} AS pos, {_N_SQL} AS n FROM lineitem
)
SELECT l_returnflag, COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN {_UPD_CONDS} THEN 9999 ELSE {sql_cents("l_quantity")} END) AS BIGINT) AS qty_cents,
       CAST(SUM({sql_cents("l_extendedprice")}) AS BIGINT) AS ep_cents_sum
FROM base GROUP BY l_returnflag ORDER BY l_returnflag
"""


def synthetic_generate_table(spark, sf):
    """G1: seeded deterministic table generation as a pure function of the
    row id (counter-based; no sequential RNG), verifiable in any engine."""
    n = 10000
    df = spark.range(n)
    return df.select(
        F.col("id").alias("k"),
        ((F.col("id") * 2654435761) % 1000000).alias("a_int"),
        (((F.col("id") * 7919) % 100000).cast("double") / F.lit(100.0)).alias("f_val"),
        F.substring(F.md5(F.col("id").cast("string").cast("binary")), 1, 16).alias("s_val"),
        ((F.col("id") % 7) < 3).alias("b_val"),
    ).orderBy("k")


GENERATE_SQL = """
SELECT i AS k,
       (i * 2654435761) % 1000000 AS a_int,
       CAST((i * 7919) % 100000 AS DOUBLE) / 100.0 AS f_val,
       substr(md5(CAST(i AS VARCHAR)), 1, 16) AS s_val,
       (i % 7) < 3 AS b_val
FROM generate_series(0, 9999) AS g(i)
ORDER BY k
"""


QUERIES = {
    "synthetic_delete_rows": Q(synthetic_delete_rows, DELETE_SQL),
    "synthetic_insert_rows": Q(synthetic_insert_rows, INSERT_SQL),
    "synthetic_update_rows": Q(synthetic_update_rows, UPDATE_SQL),
    "synthetic_update_column": Q(synthetic_update_column, UPDATE_COLUMN_SQL),
    "synthetic_append_rows": Q(synthetic_append_rows, APPEND_SQL),
    "synthetic_generate_table": Q(synthetic_generate_table, GENERATE_SQL),
}
