"""Relational operator coverage (SURVEY §2.5): scans, projection, filter,
equi/semi/anti joins, hash aggregation, windows, sort/limit, set ops,
rollup, conditional aggregation.

The reference realizes these implicitly (hash-map joins src/store.rs:138-143,
map/merge aggregation src/store.rs:114-136, slicing de/synthetic.py:15-50);
here they are first-class DataFrame operators over the TPC-H-ish tables.

Scale notes: dimension joins (region/nation/supplier/customer) broadcast —
no shuffle of the fact table; aggregations are partial+final hash aggs;
top-k uses window-free sort-limit (TakeOrderedAndProject) or per-group
row_number with partial pushdown via AQE.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dataset_dedupe_estimator_spark.operators.ranking import with_global_cumsum
from dataset_dedupe_estimator_spark.queries.base import Q, cents, load, sql_cents, ts

C_QTY = sql_cents("l_quantity")
C_EP = sql_cents("l_extendedprice")
C_DISC = sql_cents("l_discount")
C_TAX = sql_cents("l_tax")
C_TP = sql_cents("o_totalprice")


def q1_pricing_summary(spark, sf):
    """TPC-H Q1 shape: wide hash aggregation over the fact table."""
    li = load(spark, sf, "lineitem")
    qty, ep, disc, tax = (cents(c) for c in ("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
    disc_price = ep * (F.lit(100) - disc)            # 1e-4 dollar units, exact
    charge = disc_price * (F.lit(100) + tax)         # 1e-6 dollar units, exact
    n = F.count(F.lit(1))
    # NOTE (r13, measured): spreading the scan before this aggregate
    # (maybe_spread) made sf1 5x WORSE (2.4 s -> ~14 s): the partial
    # aggregate collapses 6M rows to 6 groups map-side at near scan
    # speed, so an exchange of raw rows replaces a trivial agg with a
    # 600 MB serial shuffle write — §2.3 aggregate-before-shuffle wins
    # over §2.5 spread here. The single-row-group serial scan stays.
    return (
        li.filter(F.col("l_shipdate") <= ts("1998-09-02 00:00:00"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.sum(qty) / F.lit(100.0)).alias("sum_qty"),
            (F.sum(ep) / F.lit(100.0)).alias("sum_base_price"),
            (F.sum(disc_price) / F.lit(1000000.0) * F.lit(100.0)).alias("sum_disc_price"),
            (F.sum(charge) / F.lit(1000000.0)).alias("sum_charge"),
            (F.sum(qty).cast("double") / n.cast("double") / F.lit(100.0)).alias("avg_qty"),
            (F.sum(ep).cast("double") / n.cast("double") / F.lit(100.0)).alias("avg_price"),
            (F.sum(disc).cast("double") / n.cast("double") / F.lit(100.0)).alias("avg_disc"),
            n.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
       SUM({C_QTY}) / 100.0 AS sum_qty,
       SUM({C_EP}) / 100.0 AS sum_base_price,
       SUM({C_EP} * (100 - {C_DISC})) / 1000000.0 * 100.0 AS sum_disc_price,
       SUM({C_EP} * (100 - {C_DISC}) * (100 + {C_TAX})) / 1000000.0 AS sum_charge,
       CAST(SUM({C_QTY}) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 100.0 AS avg_qty,
       CAST(SUM({C_EP}) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 100.0 AS avg_price,
       CAST(SUM({C_DISC}) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 100.0 AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark, sf):
    """TPC-H Q3 shape: selective join + agg + deterministic top-k.

    Revenue kept in exact integer 1e-4 units for a total-order sort.
    """
    cust = load(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf, "orders").filter(F.col("o_orderdate") < ts("1998-03-15 00:00:00"))
    # unspread by design (r13): see q1 — the revenue aggregate does its
    # reduction map-side; shuffling the filtered rows first costs more
    # than the serial probe it parallelizes
    li = load(spark, sf, "lineitem").filter(F.col("l_shipdate") > ts("1998-03-15 00:00:00"))
    rev = cents("l_extendedprice") * (F.lit(100) - cents("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev).alias("revenue_e4"))
        .select(
            "l_orderkey",
            (F.col("revenue_e4") / F.lit(10000.0)).alias("revenue"),
            "o_orderdate",
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


Q3_SQL = f"""
SELECT l_orderkey,
       SUM({C_EP} * (100 - {C_DISC})) / 10000.0 AS revenue,
       o_orderdate, o_orderpriority
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def q5_local_supplier_volume(spark, sf):
    """TPC-H Q5 shape: 6-way join, dims broadcast, group by nation."""
    # unspread by design (r13): the probe chain is cheap per row and the
    # nation aggregate collapses map-side — an exchange of raw lineitem
    # rows costs more than the serial probe it parallelizes (same §2.3
    # verdict as q1; measured there)
    li = load(spark, sf, "lineitem")
    orders = load(spark, sf, "orders")
    cust = load(spark, sf, "customer")
    supp = load(spark, sf, "supplier")
    nation = load(spark, sf, "nation")
    region = load(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    rev = cents("l_extendedprice") * (F.lit(100) - cents("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(cust, (orders.o_custkey == cust.c_custkey) & (cust.c_nationkey == supp.s_nationkey))
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .filter(
            (F.col("o_orderdate") >= ts("1996-01-01 00:00:00"))
            & (F.col("o_orderdate") < ts("1997-01-01 00:00:00"))
        )
        .groupBy("n_name")
        .agg((F.sum(rev) / F.lit(10000.0)).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


Q5_SQL = f"""
SELECT n_name, SUM({C_EP} * (100 - {C_DISC})) / 10000.0 AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


def top_spenders(spark, sf):
    """Broadcast dim join + group + deterministic top-k (sort-limit)."""
    orders = load(spark, sf, "orders")
    cust = load(spark, sf, "customer")
    return (
        orders.groupBy("o_custkey")
        .agg(F.sum(cents("o_totalprice")).alias("spent_cents"), F.count(F.lit(1)).alias("n_orders"))
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            (F.col("spent_cents") / F.lit(100.0)).alias("total_spent"),
            "n_orders",
        )
        .orderBy(F.col("total_spent").desc(), F.col("c_custkey"))
        .limit(20)
    )


TOP_SPENDERS_SQL = f"""
SELECT c_custkey, c_name, SUM({C_TP}) / 100.0 AS total_spent, COUNT(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey, c_name
ORDER BY total_spent DESC, c_custkey
LIMIT 20
"""


def filter_project_scan(spark, sf):
    """Predicate-pushdown + column-pruning scan (PushedFilters visible in plan)."""
    li = load(spark, sf, "lineitem")
    return (
        li.filter(
            (F.col("l_quantity") >= 45.0)
            & (F.col("l_shipdate") >= ts("2000-01-01 00:00:00"))
            & (F.col("l_returnflag") == "R")
        )
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")
    )


FILTER_PROJECT_SQL = """
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
FROM lineitem
WHERE l_quantity >= 45.0 AND l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
  AND l_returnflag = 'R'
ORDER BY l_orderkey, l_linenumber
"""


def window_top_orders_per_customer(spark, sf):
    """Window row_number: top-3 orders per customer by exact cents."""
    orders = load(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("price_cents").desc(), F.col("o_orderkey")
    )
    return (
        orders.select(
            "o_custkey", "o_orderkey", cents("o_totalprice").alias("price_cents")
        )
        .withColumn("rank_in_cust", F.row_number().over(w))
        .filter(F.col("rank_in_cust") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            (F.col("price_cents") / F.lit(100.0)).alias("o_totalprice"),
            "rank_in_cust",
        )
        .orderBy("o_custkey", "rank_in_cust")
    )


WINDOW_TOP_SQL = f"""
WITH ranked AS (
  SELECT o_custkey, o_orderkey, {C_TP} AS price_cents,
         ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY {C_TP} DESC, o_orderkey) AS rank_in_cust
  FROM orders
)
SELECT o_custkey, o_orderkey, price_cents / 100.0 AS o_totalprice, rank_in_cust
FROM ranked WHERE rank_in_cust <= 3
ORDER BY o_custkey, rank_in_cust
"""


def window_running_spend(spark, sf):
    """Cumulative window sum per customer in exact integer cents."""
    orders = load(spark, sf, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        orders.select(
            "o_custkey", "o_orderkey", "o_orderdate", cents("o_totalprice").alias("pc")
        )
        .withColumn("running_cents", F.sum("pc").over(w))
        .select(
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            (F.col("running_cents") / F.lit(100.0)).alias("running_spend"),
        )
        .filter(F.col("o_custkey") % 100 == 0)
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    )


WINDOW_RUNNING_SQL = f"""
SELECT o_custkey, o_orderkey, o_orderdate,
       SUM({C_TP}) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0 AS running_spend
FROM orders
QUALIFY o_custkey % 100 = 0
ORDER BY o_custkey, o_orderdate, o_orderkey
"""


def rollup_order_status(spark, sf):
    """ROLLUP aggregation with grouping-set ids."""
    orders = load(spark, sf, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (F.sum(cents("o_totalprice")) / F.lit(100.0)).alias("total_price"),
            F.grouping_id().alias("gid"),
        )
        .orderBy(
            F.col("gid"),
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


ROLLUP_SQL = f"""
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
       SUM({C_TP}) / 100.0 AS total_price,
       GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS gid
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
ORDER BY gid, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
"""


def semi_anti_customers(spark, sf):
    """left_semi + left_anti in one result: per-customer order activity class."""
    cust = load(spark, sf, "customer")
    orders = load(spark, sf, "orders")
    big = orders.filter(F.col("o_totalprice") > 400000.0).select("o_custkey")
    with_big = cust.join(big, cust.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", F.lit("big_spender").alias("segment_class")
    )
    inactive = cust.join(
        orders.select("o_custkey"), cust.c_custkey == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", F.lit("no_orders").alias("segment_class"))
    return with_big.unionByName(inactive).orderBy("segment_class", "c_custkey")


SEMI_ANTI_SQL = """
SELECT c_custkey, 'big_spender' AS segment_class FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
UNION ALL
SELECT c_custkey, 'no_orders' AS segment_class FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
ORDER BY segment_class, c_custkey
"""


def set_ops_parts(spark, sf):
    """intersect + exceptAll coverage (reference: seen_in membership,
    equality sanity checks de/formats.py:116-129)."""
    li = load(spark, sf, "lineitem")
    cheap = load(spark, sf, "part").filter(F.col("p_retailprice") < 920.0).select("p_partkey")
    shipped_parts = li.select(F.col("l_partkey").alias("p_partkey")).distinct()
    both = cheap.intersect(shipped_parts).withColumn("part_class", F.lit("cheap_shipped"))
    never = cheap.exceptAll(shipped_parts).withColumn("part_class", F.lit("cheap_never_shipped"))
    return both.unionByName(never).orderBy("part_class", "p_partkey")


SET_OPS_SQL = """
WITH cheap AS (SELECT p_partkey FROM part WHERE p_retailprice < 920.0),
     shipped AS (SELECT DISTINCT l_partkey AS p_partkey FROM lineitem)
SELECT p_partkey, 'cheap_shipped' AS part_class FROM (SELECT * FROM cheap INTERSECT SELECT * FROM shipped)
UNION ALL
SELECT p_partkey, 'cheap_never_shipped' AS part_class FROM (SELECT * FROM cheap EXCEPT SELECT * FROM shipped)
ORDER BY part_class, p_partkey
"""


def conditional_pivot_brands(spark, sf):
    """Pivot-style conditional aggregation (O7, de/display.py:91-137)."""
    part = load(spark, sf, "part")

    def bucket(name):
        return F.sum(F.when(F.col("p_brand") == name, 1).otherwise(0))

    return (
        part.groupBy("p_type")
        .agg(
            bucket("Brand#1").alias("brand1"),
            bucket("Brand#2").alias("brand2"),
            bucket("Brand#3").alias("brand3"),
            F.count(F.lit(1)).alias("total"),
            (F.sum(cents("p_retailprice")) / F.lit(100.0)).alias("sum_price"),
        )
        .orderBy("p_type")
    )


PIVOT_SQL = f"""
SELECT p_type,
       CAST(SUM(CASE WHEN p_brand = 'Brand#1' THEN 1 ELSE 0 END) AS BIGINT) AS brand1,
       CAST(SUM(CASE WHEN p_brand = 'Brand#2' THEN 1 ELSE 0 END) AS BIGINT) AS brand2,
       CAST(SUM(CASE WHEN p_brand = 'Brand#3' THEN 1 ELSE 0 END) AS BIGINT) AS brand3,
       COUNT(*) AS total,
       SUM({sql_cents("p_retailprice")}) / 100.0 AS sum_price
FROM part GROUP BY p_type ORDER BY p_type
"""


def distinct_ship_modes(spark, sf):
    """Exact distinct + per-group count distinct."""
    li = load(spark, sf, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.countDistinct("l_partkey").alias("n_parts"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


DISTINCT_SQL = """
SELECT l_returnflag,
       COUNT(DISTINCT l_suppkey) AS n_suppliers,
       COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(*) AS n_rows
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def q4_order_priority(spark, sf):
    """TPC-H Q4 shape: correlated EXISTS via left-semi join."""
    orders = load(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= ts("1997-01-01 00:00:00"))
        & (F.col("o_orderdate") < ts("1997-04-01 00:00:00"))
    )
    late_items = load(spark, sf, "lineitem").filter(
        F.col("l_shipdate") > ts("1997-06-01 00:00:00")
    ).select("l_orderkey")
    return (
        orders.join(late_items, orders.o_orderkey == late_items.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > TIMESTAMP '1997-06-01 00:00:00')
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def q6_revenue_forecast(spark, sf):
    """TPC-H Q6 shape: tight-filter scan + single exact-cents aggregate."""
    li = load(spark, sf, "lineitem")
    rev = cents("l_extendedprice") * cents("l_discount")  # 1e-4 units
    return (
        li.filter(
            (F.col("l_shipdate") >= ts("1997-01-01 00:00:00"))
            & (F.col("l_shipdate") < ts("1998-01-01 00:00:00"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24.0)
        )
        .agg(
            (F.sum(rev) / F.lit(10000.0)).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


Q6_SQL = f"""
SELECT SUM({C_EP} * {C_DISC}) / 10000.0 AS revenue, COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24.0
"""



def spend_quartiles(spark, sf):
    """NTILE + PERCENT_RANK coverage: quartile customers by exact-cents
    lifetime spend, report the per-quartile census. Ranking ties broken
    by custkey so both engines order identically; spend stays integer
    cents until the final projection.

    Scale shape (no single-partition window): the global row_number over
    the per-customer aggregate comes from
    `operators/ranking.with_global_cumsum` (range exchange + partitioned
    window + broadcast offsets); NTILE and PERCENT_RANK are then pure
    expressions of (rank, n) — NTILE's uneven-bucket rule (first n%4
    buckets get the extra row) and PERCENT_RANK's (rank−1)/(n−1) are
    reproduced exactly, which the oracle verifies against the real
    window functions."""
    orders = load(spark, sf, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(cents("o_totalprice")).alias("spent_cents")
    )
    ranked, n = with_global_cumsum(
        spend,
        [F.col("spent_cents").desc(), F.col("o_custkey")],
        out_col="rn",
    )
    base, rem = divmod(n, 4)
    cut = rem * (base + 1)  # ranks <= cut fall in the wider buckets
    if base:
        quartile = (
            F.when(
                F.col("rn") <= cut,
                F.expr(f"(rn - 1) div {base + 1}"),
            )
            .otherwise(F.lit(rem) + F.expr(f"(rn - 1 - {cut}) div {base}"))
            .cast("int")
            + F.lit(1)
        )
    else:  # n < 4: one row per bucket, quartile == rank
        quartile = F.col("rn").cast("int")
    # keys are unique (tie-break by custkey) so rank == row_number and
    # PERCENT_RANK is (rn-1)/(n-1) in the same double math both engines
    # use; n==1 would divide by zero -> PERCENT_RANK defines it as 0
    pr = (
        F.round((F.col("rn") - 1) / F.lit(n - 1), 4)
        if n > 1
        else F.lit(0.0)
    )
    return (
        ranked.select(
            "o_custkey",
            "spent_cents",
            quartile.alias("quartile"),
            pr.alias("pr"),
        )
        .groupBy("quartile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            (F.min("spent_cents") / F.lit(100.0)).alias("min_spent"),
            (F.max("spent_cents") / F.lit(100.0)).alias("max_spent"),
            F.max("pr").alias("max_pct_rank"),
        )
        .orderBy("quartile")
    )


SPEND_QUARTILES_SQL = f"""
WITH spend AS (
  SELECT o_custkey, SUM({C_TP}) AS spent_cents FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT o_custkey, spent_cents,
         NTILE(4) OVER (ORDER BY spent_cents DESC, o_custkey) AS quartile,
         ROUND(PERCENT_RANK() OVER (ORDER BY spent_cents DESC, o_custkey), 4) AS pr
  FROM spend
)
SELECT quartile, COUNT(*) AS n_customers,
       MIN(spent_cents) / 100.0 AS min_spent,
       MAX(spent_cents) / 100.0 AS max_spent,
       MAX(pr) AS max_pct_rank
FROM ranked GROUP BY quartile ORDER BY quartile
"""


# SCD2 temporal dim join: a deterministic two-version customer history
# (version 2 takes effect on a per-customer md5-bucketed date inside the
# order-date range), orders joined to the version valid AT order time.
SCD2_EPOCH = "1995-06-01"  # version-2 effective dates spread from here
SCD2_SPREAD_DAYS = 2000  # ... across most of the 1995-2001 order range


def temporal_dim_join(spark, sf):
    """Point-in-validity (SCD2) join — the dimension-history lookup every
    warehouse needs and plain equi joins can't express: each order must
    see the customer attribute AS OF its order date, not the current one.

    The two-version history is derived deterministically (md5-bucket of
    the custkey picks the version-2 effective date; segment gains a
    ``_R2`` suffix), then orders join on custkey with the validity
    range as a residual predicate. 100 TB shape: the join stays an
    EQUI hash join on custkey (the range is a cheap post-join filter
    against exactly 2 candidate rows per key — never a range-only BNLJ);
    the dim side broadcasts at real-world dim sizes."""
    cust = load(spark, sf, "customer").select("c_custkey", "c_mktsegment")
    bucket = (
        F.conv(F.substring(F.md5(F.col("c_custkey").cast("string").cast("binary")), 1, 8), 16, 10)
        .cast("long")
        % SCD2_SPREAD_DAYS
    )
    change = F.date_add(F.lit(SCD2_EPOCH).cast("date"), bucket.cast("int")).cast(
        "timestamp_ntz"
    )
    lo = F.lit("1900-01-01").cast("timestamp_ntz")
    hi = F.lit("9999-01-01").cast("timestamp_ntz")
    dim = cust.select(
        "c_custkey",
        F.explode(
            F.array(
                F.struct(
                    lo.alias("valid_from"),
                    change.alias("valid_to"),
                    F.col("c_mktsegment").alias("segment"),
                ),
                F.struct(
                    change.alias("valid_from"),
                    hi.alias("valid_to"),
                    F.concat(F.col("c_mktsegment"), F.lit("_R2")).alias("segment"),
                ),
            )
        ).alias("v"),
    ).select("c_custkey", "v.valid_from", "v.valid_to", "v.segment")
    orders = load(spark, sf, "orders")
    return (
        orders.join(
            F.broadcast(dim),
            (orders.o_custkey == dim.c_custkey)
            & (orders.o_orderdate >= dim.valid_from)
            & (orders.o_orderdate < dim.valid_to),
        )
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (F.sum(cents("o_totalprice")) / F.lit(100.0)).alias("revenue"),
        )
        .orderBy("segment")
    )


TEMPORAL_DIM_SQL = f"""
WITH dim AS (
  SELECT c_custkey, v.* FROM customer,
  LATERAL (
    SELECT TIMESTAMP '1900-01-01' AS valid_from,
           CAST(DATE '{SCD2_EPOCH}' + to_days(CAST(
             CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8) AS BIGINT)
             % {SCD2_SPREAD_DAYS} AS INTEGER)) AS TIMESTAMP) AS valid_to,
           c_mktsegment AS segment
    UNION ALL
    SELECT CAST(DATE '{SCD2_EPOCH}' + to_days(CAST(
             CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8) AS BIGINT)
             % {SCD2_SPREAD_DAYS} AS INTEGER)) AS TIMESTAMP),
           TIMESTAMP '9999-01-01', c_mktsegment || '_R2'
  ) v
)
SELECT d.segment, COUNT(*) AS n_orders,
       SUM({sql_cents("o.o_totalprice")}) / 100.0 AS revenue
FROM orders o
JOIN dim d ON o.o_custkey = d.c_custkey
          AND o.o_orderdate >= d.valid_from AND o.o_orderdate < d.valid_to
GROUP BY d.segment ORDER BY d.segment
"""


def orders_rfm_segments(spark, sf):
    """RFM segmentation — the classic warehouse census: each customer
    bucketed by Recency (days since last order, vs the corpus max date),
    Frequency (order count) and Monetary (exact-cents spend) into value
    quartiles, then counted per 3-digit segment code.

    Unlike NTILE (one global window partition), the quartile BOUNDARIES
    come from ONE exact `percentile` aggregate — a scalar row that
    broadcasts — and each customer buckets by comparison, so the plan is
    two hash aggregates + a broadcast: nothing single-partition, nothing
    that degrades at 100 TB. Recency quartiles use the monotone-reversal
    identity (recency = ref - last_day, so recency > q_p(recency) iff
    last_day < q_{1-p}(last_day)), letting all nine boundaries come from
    the same single pass over the per-customer aggregate. Bucketing is
    value-based (ties land in the same bucket in both engines; no
    row-order dependence)."""
    orders = load(spark, sf, "orders")
    last_day = F.datediff(F.max("o_orderdate"), F.lit("1990-01-01").cast("date")).cast(
        "long"
    )
    per_cust = orders.groupBy("o_custkey").agg(
        last_day.alias("last_day"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(cents("o_totalprice")).alias("monetary_cents"),
    )
    bounds = per_cust.agg(
        F.max("last_day").alias("ref_day"),
        # recency quartile boundaries, expressed on last_day reversed
        F.expr("percentile(last_day, array(0.75, 0.5, 0.25))").alias("lq"),
        F.expr("percentile(frequency, array(0.25, 0.5, 0.75))").alias("fq"),
        F.expr("percentile(monetary_cents, array(0.25, 0.5, 0.75))").alias("mq"),
    )

    def bucket_gt(col, q):
        return (
            F.lit(1)
            + (F.col(col) > q[0]).cast("int")
            + (F.col(col) > q[1]).cast("int")
            + (F.col(col) > q[2]).cast("int")
        )

    def bucket_lt(col, q):
        return (
            F.lit(1)
            + (F.col(col) < q[0]).cast("int")
            + (F.col(col) < q[1]).cast("int")
            + (F.col(col) < q[2]).cast("int")
        )

    seg = per_cust.crossJoin(F.broadcast(bounds)).select(
        "o_custkey",
        "monetary_cents",
        F.concat(
            bucket_lt("last_day", F.col("lq")),
            bucket_gt("frequency", F.col("fq")),
            bucket_gt("monetary_cents", F.col("mq")),
        ).alias("segment"),
    )
    return (
        seg.groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            (F.sum("monetary_cents") / F.lit(100.0)).alias("total_spend"),
        )
        .orderBy("segment")
    )


RFM_SQL = f"""
WITH per_cust AS (
  SELECT o_custkey,
         date_diff('day', DATE '1990-01-01', CAST(MAX(o_orderdate) AS DATE)) AS last_day,
         COUNT(*) AS frequency,
         SUM({sql_cents("o_totalprice")}) AS monetary_cents
  FROM orders GROUP BY o_custkey
),
bounds AS (
  SELECT quantile_cont(last_day, [0.75, 0.5, 0.25]) AS lq,
         quantile_cont(frequency, [0.25, 0.5, 0.75]) AS fq,
         quantile_cont(monetary_cents, [0.25, 0.5, 0.75]) AS mq
  FROM per_cust
),
seg AS (
  SELECT o_custkey, monetary_cents,
         (1 + CAST(last_day < lq[1] AS INT) + CAST(last_day < lq[2] AS INT)
            + CAST(last_day < lq[3] AS INT)) ||
         (1 + CAST(frequency > fq[1] AS INT) + CAST(frequency > fq[2] AS INT)
            + CAST(frequency > fq[3] AS INT)) ||
         (1 + CAST(monetary_cents > mq[1] AS INT) + CAST(monetary_cents > mq[2] AS INT)
            + CAST(monetary_cents > mq[3] AS INT)) AS segment
  FROM per_cust, bounds
)
SELECT segment, COUNT(*) AS n_customers,
       SUM(monetary_cents) / 100.0 AS total_spend
FROM seg GROUP BY segment ORDER BY segment
"""


def basket_part_pairs(spark, sf):
    """Market-basket co-occurrence with lift: part pairs ordered together
    in the same order, scored by lift = P(a,b) / (P(a)·P(b)) — the
    association-rule census behind "frequently bought together".

    Scale shape: the pair fan-out is a self-equi-join on l_orderkey,
    quadratic only WITHIN an order (TPC-H baskets are ~4-7 lines, so the
    blow-up is a bounded constant per key — the same bounded-bucket
    argument as LSH banding); per-part counts and the order total are
    broadcast scalar/dim aggregates. Lift is one double division chain of
    exact integers. Top-50 by co-count is a TakeOrderedAndProject."""
    # li has three consumers (both pair-join sides, per-part counts, the
    # order total); AQE reuses the distinct's exchange across them, and
    # measurement at the sf1 tier showed persist() saves nothing — the
    # cost is the pair aggregate itself, which is the workload
    li = (
        load(spark, sf, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    co = (
        a.join(b, F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("co_orders"))
    )
    per_part = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_orders"))
    total = li.select("l_orderkey").distinct().agg(
        F.count(F.lit(1)).alias("total_orders")
    )
    pa_ = per_part.select(
        F.col("l_partkey").alias("part_a"), F.col("n_orders").alias("na")
    )
    pb = per_part.select(
        F.col("l_partkey").alias("part_b"), F.col("n_orders").alias("nb")
    )
    lift = (
        F.col("co_orders").cast("double")
        * F.col("total_orders").cast("double")
        / (F.col("na").cast("double") * F.col("nb").cast("double"))
    )
    return (
        co.join(pa_, "part_a")
        .join(pb, "part_b")
        .crossJoin(F.broadcast(total))
        .select("part_a", "part_b", "co_orders", F.round(lift, 6).alias("lift"))
        .orderBy(F.col("co_orders").desc(), "part_a", "part_b")
        .limit(50)
    )


BASKET_SQL = """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
co AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS co_orders
  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
),
per_part AS (SELECT l_partkey, COUNT(*) AS n_orders FROM li GROUP BY 1),
total AS (SELECT COUNT(DISTINCT l_orderkey) AS total_orders FROM li)
SELECT c.part_a, c.part_b, c.co_orders,
       ROUND(CAST(c.co_orders AS DOUBLE) * CAST(t.total_orders AS DOUBLE)
             / (CAST(pa.n_orders AS DOUBLE) * CAST(pb.n_orders AS DOUBLE)), 6) AS lift
FROM co c
JOIN per_part pa ON pa.l_partkey = c.part_a
JOIN per_part pb ON pb.l_partkey = c.part_b
CROSS JOIN total t
ORDER BY co_orders DESC, part_a, part_b
LIMIT 50
"""


def cohort_ltv(spark, sf):
    """Cohort lifetime-value curve — the revenue sibling of
    ``events_retention_cohorts``: customers grouped by first-order
    quarter, cumulative revenue tracked by quarters-since-first-order.
    The running sum uses exact integer cents inside the window (the
    order-dependent-double trap from base.py never arises), converting
    to dollars only in the final projection.

    Plan: per-customer first-order window shares the exchange with the
    per-(customer, age) rollup; the cohort x age matrix is tiny, so the
    cumulative window over it is cheap; nothing scans orders twice."""
    orders = load(spark, sf, "orders")
    qtr = (F.year("o_orderdate") * 4 + F.quarter("o_orderdate") - 1).cast("long")
    w_cust = Window.partitionBy("o_custkey")
    aged = orders.select(
        "o_custkey",
        qtr.alias("order_qtr"),
        cents("o_totalprice").alias("price_cents"),
    ).withColumn("cohort_qtr", F.min("order_qtr").over(w_cust))
    cohort_age = (
        aged.groupBy(
            "cohort_qtr", (F.col("order_qtr") - F.col("cohort_qtr")).alias("age_qtrs")
        )
        .agg(
            F.countDistinct("o_custkey").alias("active_customers"),
            F.sum("price_cents").alias("rev_cents"),
        )
    )
    w_cum = (
        Window.partitionBy("cohort_qtr")
        .orderBy("age_qtrs")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        cohort_age.withColumn("cum_cents", F.sum("rev_cents").over(w_cum))
        .select(
            "cohort_qtr",
            "age_qtrs",
            "active_customers",
            (F.col("rev_cents") / F.lit(100.0)).alias("revenue"),
            (F.col("cum_cents") / F.lit(100.0)).alias("cumulative_ltv"),
        )
        .orderBy("cohort_qtr", "age_qtrs")
    )


COHORT_LTV_SQL = f"""
WITH aged AS (
  SELECT o_custkey,
         YEAR(o_orderdate) * 4 + QUARTER(o_orderdate) - 1 AS order_qtr,
         {sql_cents("o_totalprice")} AS price_cents,
         MIN(YEAR(o_orderdate) * 4 + QUARTER(o_orderdate) - 1)
           OVER (PARTITION BY o_custkey) AS cohort_qtr
  FROM orders
),
cohort_age AS (
  SELECT cohort_qtr, order_qtr - cohort_qtr AS age_qtrs,
         COUNT(DISTINCT o_custkey) AS active_customers,
         SUM(price_cents) AS rev_cents
  FROM aged GROUP BY 1, 2
)
SELECT cohort_qtr, age_qtrs, active_customers,
       rev_cents / 100.0 AS revenue,
       SUM(rev_cents) OVER (PARTITION BY cohort_qtr ORDER BY age_qtrs
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0 AS cumulative_ltv
FROM cohort_age
ORDER BY cohort_qtr, age_qtrs
"""


HIER_FANOUT = 8  # deterministic parent(k) = k div HIER_FANOUT; k < FANOUT are roots
HIER_JUMPS = 6  # pointer-jumping rounds: handles depth up to 2^6


def customer_hierarchy_rollup(spark, sf):
    """Hierarchy / transitive-closure rollup — the recursive-CTE query
    class Spark has no native operator for (org charts, BOM explosion,
    account trees), expressed scale-first: POINTER JUMPING resolves
    every node's root and depth in O(log depth) self-joins instead of
    O(depth) sequential steps or a driver-side loop over rows.

    The hierarchy is derived deterministically from the customer table
    (parent(k) = k div {HIER_FANOUT}; keys below {HIER_FANOUT} are
    roots), so both engines see the identical forest without auxiliary
    data. Each jump doubles the resolved distance: state (node → anc,
    dist, done) self-joins on anc; {HIER_JUMPS} rounds cover depth
    2^{HIER_JUMPS}, far beyond the key domain's log_{HIER_FANOUT}
    depth. The rollup then aggregates each root's subtree: members,
    max depth, exact-cents total account balance.

    100 TB shape: every jump is one equi-join shuffle of the node
    table against itself (no fan-out growth — state stays one row per
    node); log-depth rounds total. The same plan runs connected
    components (operators/components.py) — this query is the
    oracle-checkable form with depths and subtree aggregates."""
    cust = load(spark, sf, "customer").select(
        F.col("c_custkey").alias("node"), cents("c_acctbal").alias("bal_cents")
    )
    parent = F.when(
        F.col("node") >= HIER_FANOUT, F.expr(f"node div {HIER_FANOUT}")
    )
    state = cust.select(
        "node",
        F.coalesce(parent, F.col("node")).alias("anc"),
        F.when(parent.isNull(), F.lit(0)).otherwise(F.lit(1)).cast("long").alias("dist"),
        parent.isNull().alias("done"),
    )
    for _ in range(HIER_JUMPS):
        hop = state.select(
            F.col("node").alias("anc"),
            F.col("anc").alias("anc2"),
            F.col("dist").alias("d2"),
            F.col("done").alias("done2"),
        )
        state = (
            state.join(hop, "anc")
            .select(
                "node",
                F.when(F.col("done"), F.col("anc")).otherwise(F.col("anc2")).alias("anc"),
                F.when(F.col("done"), F.col("dist"))
                .otherwise(F.col("dist") + F.col("d2"))
                .alias("dist"),
                (F.col("done") | F.col("done2")).alias("done"),
            )
        )
    resolved = state.join(cust, "node")
    return (
        resolved.groupBy(F.col("anc").alias("root_key"))
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.max("dist").alias("max_depth"),
            F.sum("bal_cents").alias("subtree_bal_cents"),
        )
        .orderBy("root_key")
    )


CUSTOMER_HIERARCHY_SQL = f"""
WITH RECURSIVE up(node, cur, depth) AS (
  SELECT c_custkey, c_custkey, 0 FROM customer
  UNION ALL
  SELECT node, cur // {HIER_FANOUT}, depth + 1 FROM up WHERE cur >= {HIER_FANOUT}
),
resolved AS (
  SELECT node, cur AS root_key, depth FROM up WHERE cur < {HIER_FANOUT}
)
SELECT root_key, COUNT(*) AS n_members,
       CAST(MAX(depth) AS BIGINT) AS max_depth,
       CAST(SUM({sql_cents("c_acctbal")}) AS BIGINT) AS subtree_bal_cents
FROM resolved JOIN customer ON c_custkey = node
GROUP BY root_key ORDER BY root_key
"""


PR_SCALE = 10**12  # fixed-point rank scale
PR_ITERS = 3
PR_TOP = 20
PR_FROM, PR_TO = "1997-01-01 00:00:00", "1997-04-01 00:00:00"


def supplier_pagerank(spark, sf):
    """Iterative PageRank over the customer↔supplier trade graph — the
    iterative-algorithm class (label propagation, embeddings lookups,
    influence) that has no single SQL operator, run as a fixed number of
    join+aggregate rounds with the loop UNROLLED INTO THE PLAN (no
    driver-side data movement).

    Exactness discipline: ranks live in integer fixed point
    (SCALE=10^12); every step is integer division (`div` / `//` — both
    truncate for the all-positive operands here), so after
    {PR_ITERS} iterations both engines hold bit-identical BIGINT ranks
    — an EXACT oracle for an iterative numeric algorithm. Nodes are
    key-disambiguated (customer 2k, supplier 2k+1); edges are the
    distinct trade pairs of one order quarter, walked in both
    directions.

    100 TB shape: per iteration one shuffle of (rank ÷ degree)
    contributions on dst + one broadcast of the scalar node count;
    state stays one row per node. Degrees/edges computed once and
    reused."""
    orders = load(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= ts(PR_FROM)) & (F.col("o_orderdate") < ts(PR_TO))
    )
    li = load(spark, sf, "lineitem")
    pairs = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("c_node"),
            (F.col("l_suppkey") * 2 + 1).alias("s_node"),
        )
        .distinct()
    )
    edges = pairs.select(F.col("c_node").alias("src"), F.col("s_node").alias("dst")).unionByName(
        pairs.select(F.col("s_node").alias("src"), F.col("c_node").alias("dst"))
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    nodes = edges.select(F.col("src").alias("node")).distinct()
    n_df = nodes.agg(F.count(F.lit(1)).alias("n"))
    ranks = nodes.crossJoin(F.broadcast(n_df)).select(
        "node", F.expr(f"{PR_SCALE} div n").alias("rank")
    )
    for _ in range(PR_ITERS):
        contrib = (
            ranks.join(deg, ranks.node == deg.src)
            .join(edges, "src")
            .select("dst", F.expr("rank div d").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inbound"))
        )
        ranks = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .crossJoin(F.broadcast(n_df))
            .select(
                "node",
                (
                    F.expr(f"({PR_SCALE} * 15) div (100 * n)")
                    + F.expr("(85 * coalesce(inbound, 0)) div 100")
                ).alias("rank"),
            )
        )
    supp = load(spark, sf, "supplier")
    return (
        ranks.filter(F.col("node") % 2 == 1)
        .select(F.expr("(node - 1) div 2").alias("s_suppkey"), "rank")
        .join(F.broadcast(supp.select("s_suppkey", "s_name")), "s_suppkey")
        .orderBy(F.col("rank").desc(), F.col("s_suppkey"))
        .limit(PR_TOP)
    )


def _pr_iter_sql(prev: str, out: str) -> str:
    return f"""
{out} AS (
  SELECT n.node,
         ({PR_SCALE} * 15) // (100 * (SELECT n FROM nn))
         + (85 * COALESCE(inb.inbound, 0)) // 100 AS rank
  FROM nodes n LEFT JOIN (
    SELECT e.dst, CAST(SUM(r.rank // dg.d) AS BIGINT) AS inbound
    FROM {prev} r JOIN deg dg ON dg.src = r.node JOIN edges e ON e.src = r.node
    GROUP BY e.dst
  ) inb ON inb.dst = n.node
)"""


SUPPLIER_PAGERANK_SQL = f"""
WITH pairs AS (
  SELECT DISTINCT o_custkey * 2 AS c_node, l_suppkey * 2 + 1 AS s_node
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  WHERE o_orderdate >= TIMESTAMP '{PR_FROM}' AND o_orderdate < TIMESTAMP '{PR_TO}'
),
edges AS (
  SELECT c_node AS src, s_node AS dst FROM pairs
  UNION ALL
  SELECT s_node AS src, c_node AS dst FROM pairs
),
deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
nodes AS (SELECT DISTINCT src AS node FROM edges),
nn AS (SELECT COUNT(*) AS n FROM nodes),
r0 AS (SELECT node, {PR_SCALE} // (SELECT n FROM nn) AS rank FROM nodes),
{_pr_iter_sql("r0", "r1")},
{_pr_iter_sql("r1", "r2")},
{_pr_iter_sql("r2", "r3")}
SELECT (node - 1) // 2 AS s_suppkey, CAST(rank AS BIGINT) AS rank, s_name
FROM r3 JOIN supplier ON s_suppkey = (node - 1) // 2
WHERE node % 2 = 1
ORDER BY rank DESC, s_suppkey LIMIT {PR_TOP}
"""


QUERIES = {
    "customer_hierarchy_rollup": Q(customer_hierarchy_rollup, CUSTOMER_HIERARCHY_SQL),
    "supplier_pagerank": Q(supplier_pagerank, SUPPLIER_PAGERANK_SQL),
    "temporal_dim_join": Q(temporal_dim_join, TEMPORAL_DIM_SQL),
    "orders_rfm_segments": Q(orders_rfm_segments, RFM_SQL),
    "basket_part_pairs": Q(basket_part_pairs, BASKET_SQL),
    "cohort_ltv": Q(cohort_ltv, COHORT_LTV_SQL),
    "q1_pricing_summary": Q(q1_pricing_summary, Q1_SQL, headline=True),
    "q4_order_priority": Q(q4_order_priority, Q4_SQL),
    "q6_revenue_forecast": Q(q6_revenue_forecast, Q6_SQL),
    "q3_shipping_priority": Q(q3_shipping_priority, Q3_SQL, headline=True),
    "q5_local_supplier_volume": Q(q5_local_supplier_volume, Q5_SQL, headline=True),
    "top_spenders": Q(top_spenders, TOP_SPENDERS_SQL),
    "spend_quartiles": Q(spend_quartiles, SPEND_QUARTILES_SQL),
    "filter_project_scan": Q(filter_project_scan, FILTER_PROJECT_SQL),
    "window_top_orders_per_customer": Q(window_top_orders_per_customer, WINDOW_TOP_SQL),
    "window_running_spend": Q(window_running_spend, WINDOW_RUNNING_SQL),
    "rollup_order_status": Q(rollup_order_status, ROLLUP_SQL),
    "semi_anti_customers": Q(semi_anti_customers, SEMI_ANTI_SQL),
    "set_ops_parts": Q(set_ops_parts, SET_OPS_SQL),
    "conditional_pivot_brands": Q(conditional_pivot_brands, PIVOT_SQL),
    "distinct_ship_modes": Q(distinct_ship_modes, DISTINCT_SQL),
}
