"""Advanced relational coverage: as-of join, range/band join, cube,
date-part extraction, percentiles, BPE-ish regex tokenization, rolling-hash
document fingerprints.

These fill the SURVEY §2.5 rows the reference lacks (as-of/range joins,
grouping sets beyond rollup, date/time functions) — exposed as first-class
engine operators with DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dataset_dedupe_estimator_spark.operators.joins import asof_join, range_join_bucket
from dataset_dedupe_estimator_spark.queries.base import Q, cents, load, sql_cents


def asof_prev_order(spark, sf):
    """As-of self-join: each order matched to the customer's latest
    strictly-earlier order (gap analysis). Right side deduped to one order
    per (custkey, date) — max orderkey wins — so as-of is well-defined."""
    orders = load(spark, sf, "orders")
    w = Window.partitionBy("o_custkey", "o_orderdate").orderBy(F.col("o_orderkey").desc())
    right = (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderdate").alias("prev_date"),
            F.col("o_orderkey").alias("prev_orderkey"),
            cents("o_totalprice").alias("prev_price_cents"),
        )
    )
    joined = asof_join(
        orders.select("o_custkey", "o_orderkey", "o_orderdate"),
        right,
        on="o_custkey",
        left_time="o_orderdate",
        right_time="prev_date",
        strict=True,
    )
    return joined.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        "prev_orderkey",
        "prev_date",
        (F.col("prev_price_cents") / F.lit(100.0)).alias("prev_price"),
        F.datediff(F.col("o_orderdate"), F.col("prev_date")).alias("gap_days"),
    ).orderBy("o_custkey", "o_orderkey")


ASOF_SQL = f"""
WITH deduped AS (
  SELECT o_custkey, o_orderdate AS prev_date, o_orderkey AS prev_orderkey,
         {sql_cents("o_totalprice")} AS prev_price_cents
  FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderdate
                                 ORDER BY o_orderkey DESC) AS rn
    FROM orders
  ) WHERE rn = 1
)
SELECT a.o_custkey, a.o_orderkey, a.o_orderdate,
       b.prev_orderkey, b.prev_date,
       b.prev_price_cents / 100.0 AS prev_price,
       datediff('day', b.prev_date, a.o_orderdate) AS gap_days
FROM orders a
ASOF LEFT JOIN deduped b
  ON a.o_custkey = b.o_custkey AND a.o_orderdate > b.prev_date
ORDER BY a.o_custkey, a.o_orderkey
"""


PRICE_BANDS = [
    (0.0, 50000.0, "small"),
    (50000.0, 150000.0, "medium"),
    (150000.0, 300000.0, "large"),
    (300000.0, 1e9, "jumbo"),
]


def range_join_price_bands(spark, sf):
    """Band join: orders classified into price bands via interval
    containment (broadcast nested-loop; no fact shuffle)."""
    orders = load(spark, sf, "orders")
    buckets = spark.createDataFrame(PRICE_BANDS, "lo double, hi double, band string")
    joined = range_join_bucket(orders, buckets, F.col("o_totalprice"))
    return (
        joined.groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (F.sum(cents("o_totalprice")) / F.lit(100.0)).alias("total_price"),
        )
        .orderBy("band")
    )


_BANDS_SQL = " UNION ALL ".join(
    f"SELECT {lo} AS lo, {hi} AS hi, '{name}' AS band" for lo, hi, name in PRICE_BANDS
)

RANGE_JOIN_SQL = f"""
WITH buckets AS ({_BANDS_SQL})
SELECT band, COUNT(*) AS n_orders,
       SUM({sql_cents("o_totalprice")}) / 100.0 AS total_price
FROM orders LEFT JOIN buckets
  ON o_totalprice >= lo AND o_totalprice < hi
GROUP BY band ORDER BY band
"""


def cube_order_stats(spark, sf):
    """CUBE grouping sets (rollup's sibling; SURVEY §2.5)."""
    orders = load(spark, sf, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.grouping_id().alias("gid"),
        )
        .orderBy(
            "gid",
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


CUBE_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
       GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS gid
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY gid, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
"""


def date_part_revenue(spark, sf):
    """Date-part extraction + aggregation (year/month/hour-of-day)."""
    li = load(spark, sf, "lineitem")
    return (
        li.groupBy(
            F.year("l_shipdate").alias("ship_year"),
            F.month("l_shipdate").alias("ship_month"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            (F.sum(cents("l_extendedprice")) / F.lit(100.0)).alias("revenue"),
            F.min(F.dayofmonth("l_shipdate")).alias("first_dom"),
            F.max(F.hour("l_shipdate")).alias("max_hour"),
        )
        .orderBy("ship_year", "ship_month")
    )


DATE_PART_SQL = f"""
SELECT extract(year FROM l_shipdate) AS ship_year,
       extract(month FROM l_shipdate) AS ship_month,
       COUNT(*) AS n_items,
       SUM({sql_cents("l_extendedprice")}) / 100.0 AS revenue,
       MIN(extract(day FROM l_shipdate)) AS first_dom,
       MAX(extract(hour FROM l_shipdate)) AS max_hour
FROM lineitem GROUP BY 1, 2 ORDER BY ship_year, ship_month
"""


def quantity_percentiles(spark, sf):
    """Exact interpolated percentiles over integer cents (deterministic
    linear interpolation in both engines)."""
    li = load(spark, sf, "lineitem")
    qc = cents("l_quantity")
    return (
        li.groupBy("l_returnflag")
        .agg(
            (F.percentile(qc, F.lit(0.25)) / 100.0).alias("p25"),
            (F.percentile(qc, F.lit(0.5)) / 100.0).alias("p50"),
            (F.percentile(qc, F.lit(0.75)) / 100.0).alias("p75"),
            F.max(qc).alias("max_cents"),
        )
        .orderBy("l_returnflag")
    )


PERCENTILE_SQL = f"""
SELECT l_returnflag,
       quantile_cont({sql_cents("l_quantity")}, 0.25) / 100.0 AS p25,
       quantile_cont({sql_cents("l_quantity")}, 0.5) / 100.0 AS p50,
       quantile_cont({sql_cents("l_quantity")}, 0.75) / 100.0 AS p75,
       MAX({sql_cents("l_quantity")}) AS max_cents
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""

# GPT-style coarse token classes: letter runs, digit runs, other-symbol runs
BPE_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 ]+"


def token_bpe_ish(spark, sf):
    """BPE-ish regex tokenization (letters/digits/symbol runs) — per-doc
    token counts for LLM-data budgeting."""
    docs = load(spark, sf, "documents")
    toks = F.regexp_extract_all(F.col("text"), F.lit(BPE_PATTERN), 0)
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_bpe_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique_bpe_tokens"),
    ).orderBy("doc_id")


BPE_SQL = f"""
SELECT doc_id,
       len(regexp_extract_all(text, '{BPE_PATTERN}')) AS n_bpe_tokens,
       len(list_distinct(regexp_extract_all(text, '{BPE_PATTERN}'))) AS n_unique_bpe_tokens
FROM documents ORDER BY doc_id
"""

_MOD = 1_000_000_007


def rolling_hash_fingerprint(spark, sf):
    """Polynomial rolling-hash document fingerprint over code points:
    h = fold(h*31 + ord(c)) mod 1e9+7 — exact integer arithmetic, so the
    fold is engine-identical."""
    docs = load(spark, sf, "documents")
    chars = F.split(F.col("text"), "")
    h = F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 31 + F.ascii(c)) % _MOD,
    )
    return docs.select("doc_id", h.alias("fingerprint")).orderBy("doc_id")


ROLLING_HASH_SQL = f"""
SELECT doc_id,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_transform(string_split(text, ''), c -> CAST(ord(c) AS BIGINT))),
         (a, b) -> (a * 31 + b) % {_MOD}) AS fingerprint
FROM documents ORDER BY doc_id
"""


def unpivot_part_metrics(spark, sf):
    """Unpivot/melt: part's numeric columns to (metric, value) rows."""
    part = load(spark, sf, "part")
    return (
        part.select(
            "p_partkey",
            F.expr(
                "stack(2, 'size', CAST(p_size AS DOUBLE), "
                "'retailprice', p_retailprice) AS (metric, value)"
            ),
        )
        .filter(F.col("p_partkey") <= 200)
        .orderBy("p_partkey", "metric")
    )


UNPIVOT_SQL = """
SELECT p_partkey, metric, value
FROM (SELECT p_partkey, CAST(p_size AS DOUBLE) AS "size",
             p_retailprice AS retailprice
      FROM part WHERE p_partkey <= 200)
UNPIVOT (value FOR metric IN ("size", retailprice))
ORDER BY p_partkey, metric
"""


def merge_upsert_orders(spark, sf):
    """MERGE INTO emulation (SCD-style upsert without Delta): a deterministic
    updates set (every 100th order re-priced +10%, plus 5 new orders) merged
    into orders via anti-join + union; verified by per-status aggregates."""
    orders = load(spark, sf, "orders")
    updates = (
        orders.filter(F.col("o_orderkey") % 100 == 0)
        .withColumn("cents110", cents("o_totalprice") * 110)
        .select(
            "o_orderkey",
            F.col("o_orderstatus"),
            # integer division on both engines (DuckDB `// 100`): no
            # double-division rounding seam in the hash contract
            F.expr("cents110 div 100").alias("price_cents"),
        )
        .unionByName(
            spark.range(5).select(
                (F.col("id") + 90_000_000).alias("o_orderkey"),
                F.lit("NEW").alias("o_orderstatus"),
                F.lit(12345).alias("price_cents"),
            )
        )
    )
    base = orders.select(
        "o_orderkey", "o_orderstatus", cents("o_totalprice").alias("price_cents")
    )
    merged = base.join(
        updates.select("o_orderkey"), "o_orderkey", "left_anti"
    ).unionByName(updates)
    return (
        merged.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("price_cents").alias("total_cents"),
        )
        .orderBy("o_orderstatus")
    )


MERGE_SQL = f"""
WITH updates AS (
  SELECT o_orderkey, o_orderstatus,
         {sql_cents("o_totalprice")} * 110 // 100 AS price_cents
  FROM orders WHERE o_orderkey % 100 = 0
  UNION ALL
  SELECT i + 90000000 AS o_orderkey, 'NEW' AS o_orderstatus, 12345 AS price_cents
  FROM generate_series(0, 4) AS g(i)
),
merged AS (
  SELECT o_orderkey, o_orderstatus, {sql_cents("o_totalprice")} AS price_cents
  FROM orders WHERE o_orderkey NOT IN (SELECT o_orderkey FROM updates)
  UNION ALL
  SELECT * FROM updates
)
SELECT o_orderstatus, COUNT(*) AS n_orders,
       CAST(SUM(price_cents) AS BIGINT) AS total_cents
FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


def salted_agg_lineitem(spark, sf):
    """Hot-key skew mitigation under the gate: the two-phase salted
    aggregation (operators/skew.py — aggregate on (key, salt), then
    re-aggregate on key) must produce EXACTLY the single-phase GROUP BY
    result for algebraic functions; the oracle is that single-phase SQL.
    l_returnflag has only 3 values over 600k rows at sf0.1 — precisely the
    hot-key shape salting exists for."""
    from dataset_dedupe_estimator_spark.operators.skew import salted_agg

    li = load(spark, sf, "lineitem").withColumn("qty_cents", cents("l_quantity"))
    out = salted_agg(
        li,
        ["l_returnflag"],
        {
            "n_rows": ("count", "*"),
            "qty_cents_sum": ("sum", "qty_cents"),
            "min_orderkey": ("min", "l_orderkey"),
            "max_orderkey": ("max", "l_orderkey"),
        },
        n_salts=16,
    )
    return out.orderBy("l_returnflag")


SALTED_AGG_SQL = f"""
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM({sql_cents("l_quantity")}) AS BIGINT) AS qty_cents_sum,
       MIN(l_orderkey) AS min_orderkey,
       MAX(l_orderkey) AS max_orderkey
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def grouping_sets_revenue(spark, sf):
    """Explicit GROUPING SETS (beyond rollup/cube): revenue by
    (returnflag, linestatus), by returnflag alone, and the grand total in
    ONE aggregation pass — Spark expands the sets into a single Expand +
    hash aggregate, so the fact table is scanned once, not three times."""
    li = load(spark, sf, "lineitem")
    li.createOrReplaceTempView("li_gs")
    return spark.sql(
        f"""
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n_items,
               SUM({sql_cents("l_extendedprice")}) / CAST(100.0 AS DOUBLE) AS revenue,
               GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS gid
        FROM li_gs
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
        """
    )


GROUPING_SETS_SQL = f"""
SELECT l_returnflag, l_linestatus, COUNT(*) AS n_items,
       SUM({sql_cents("l_extendedprice")}) / 100.0 AS revenue,
       GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS gid
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
"""


def trailing_window_revenue(spark, sf):
    """Time-RANGE window frame: each order with the customer's trailing
    30-day order count and spend (RANGE BETWEEN, not ROWS — frame bounds
    are event-time offsets, so ties and gaps are handled by value).

    The frame runs on integer day offsets from a fixed epoch date —
    timezone-independent (no instant conversion) and exact in both
    engines; spend in integer cents. One shuffle on custkey; the frame
    scan is sorted within partition — the standard sessionless
    trailing-metric shape."""
    orders = load(spark, sf, "orders")
    day = F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")).cast(
        "long"
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_day")
        .rangeBetween(-30, Window.currentRow)
    )
    return (
        orders.select(
            "o_orderkey",
            "o_custkey",
            day.alias("o_day"),
            cents("o_totalprice").alias("price_c"),
        )
        .select(
            "o_orderkey",
            "o_custkey",
            "o_day",
            F.count(F.lit(1)).over(w).alias("n_trailing_30d"),
            (F.sum("price_c").over(w) / F.lit(100.0)).alias("spend_trailing_30d"),
        )
        .orderBy("o_custkey", "o_day", "o_orderkey")
    )


TRAILING_WINDOW_SQL = f"""
SELECT o_orderkey, o_custkey, o_day,
       COUNT(*) OVER w AS n_trailing_30d,
       SUM(price_c) OVER w / 100.0 AS spend_trailing_30d
FROM (
  SELECT o_orderkey, o_custkey,
         CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT)
           AS o_day,
         {sql_cents("o_totalprice")} AS price_c
  FROM orders
)
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_day
             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
ORDER BY o_custkey, o_day, o_orderkey
"""



def data_quality_report(spark, sf):
    """Deequ-style constraint suite over four tables, one aggregate scan
    per table (operators/quality_checks.py). The n_chars max(300) check
    FAILS by design on this corpus (long documents exist) — the report
    carries violation counts, not a boolean gate.

    Scale: every non-unique check is a conditional map-side partial sum
    folded into one tiny agg row per table; the single ``unique`` check
    (doc_id) shuffles once on that column."""
    from dataset_dedupe_estimator_spark.operators.quality_checks import (
        Check,
        run_checks,
    )

    suites = [
        (
            "lineitem",
            [
                Check("l_quantity", "min", (1,)),
                Check("l_quantity", "max", (50,)),
                Check("l_extendedprice", "min", (0,)),
                Check("l_orderkey", "not_null"),
            ],
        ),
        (
            "orders",
            [Check("o_totalprice", "min", (0,)), Check("o_custkey", "not_null")],
        ),
        (
            "documents",
            [
                Check("lang", "in_set", ("en", "de", "fr", "es", "zh")),
                Check("lang", "matches", ("^[a-z]{2}$",)),
                Check("n_chars", "max", (300,)),
                Check("doc_id", "unique"),
            ],
        ),
        (
            "events",
            [
                Check(
                    "event_type",
                    "in_set",
                    ("view", "click", "signup", "purchase", "error"),
                ),
                Check("value", "min", (0,)),
            ],
        ),
    ]
    out = None
    for table, checks in suites:
        part = run_checks(load(spark, sf, table), table, checks)
        out = part if out is None else out.unionByName(part)
    return out.orderBy("table_name", "check_id")


def _dq_sql() -> str:
    rows = [
        ("lineitem", "l_quantity:min(1)", "SUM(CASE WHEN l_quantity < 1 AND l_quantity IS NOT NULL THEN 1 ELSE 0 END)"),
        ("lineitem", "l_quantity:max(50)", "SUM(CASE WHEN l_quantity > 50 AND l_quantity IS NOT NULL THEN 1 ELSE 0 END)"),
        ("lineitem", "l_extendedprice:min(0)", "SUM(CASE WHEN l_extendedprice < 0 AND l_extendedprice IS NOT NULL THEN 1 ELSE 0 END)"),
        ("lineitem", "l_orderkey:not_null", "SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END)"),
        ("orders", "o_totalprice:min(0)", "SUM(CASE WHEN o_totalprice < 0 AND o_totalprice IS NOT NULL THEN 1 ELSE 0 END)"),
        ("orders", "o_custkey:not_null", "SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)"),
        ("documents", "lang:in_set(en,de,fr,es,zh)", "SUM(CASE WHEN lang NOT IN ('en','de','fr','es','zh') AND lang IS NOT NULL THEN 1 ELSE 0 END)"),
        ("documents", "lang:matches(^[a-z]{2}$)", "SUM(CASE WHEN NOT regexp_matches(lang, '^[a-z]{2}$') AND lang IS NOT NULL THEN 1 ELSE 0 END)"),
        ("documents", "n_chars:max(300)", "SUM(CASE WHEN n_chars > 300 AND n_chars IS NOT NULL THEN 1 ELSE 0 END)"),
        ("documents", "doc_id:unique", "COUNT(doc_id) - COUNT(DISTINCT doc_id)"),
        ("events", "event_type:in_set(view,click,signup,purchase,error)", "SUM(CASE WHEN event_type NOT IN ('view','click','signup','purchase','error') AND event_type IS NOT NULL THEN 1 ELSE 0 END)"),
        ("events", "value:min(0)", "SUM(CASE WHEN value < 0 AND value IS NOT NULL THEN 1 ELSE 0 END)"),
    ]
    selects = [
        f"""SELECT '{t}' AS table_name, '{cid}' AS check_id,
       COUNT(*) AS n_rows, CAST(COALESCE({expr}, 0) AS BIGINT) AS n_violations,
       COALESCE({expr}, 0) = 0 AS passed
FROM {t}"""
        for t, cid, expr in rows
    ]
    return "\nUNION ALL\n".join(selects) + "\nORDER BY table_name, check_id"



def profile_documents(spark, sf):
    """Column profile of ``documents`` (operators/quality_checks.py:
    profile_columns): nulls, exact distinct counts, lexicographic
    min/max, average value length — one agg row + one distinct-agg per
    column."""
    from dataset_dedupe_estimator_spark.operators.quality_checks import (
        profile_columns,
    )

    return profile_columns(load(spark, sf, "documents"), "documents").orderBy(
        "column_name"
    )


def _profile_sql() -> str:
    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    selects = [
        f"""SELECT 'documents' AS table_name, '{c}' AS column_name,
       COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       COUNT(DISTINCT {c}) AS n_distinct,
       MIN(CAST({c} AS VARCHAR)) AS min_value,
       MAX(CAST({c} AS VARCHAR)) AS max_value,
       ROUND(CAST(SUM(COALESCE(length(CAST({c} AS VARCHAR)), 0)) AS DOUBLE)
             / GREATEST(COUNT(*) - SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END), 1), 2) AS avg_len
FROM documents"""
        for c in cols
    ]
    return "\nUNION ALL\n".join(selects) + "\nORDER BY column_name"


def fuzzy_match_customers(spark, sf):
    """Blocked fuzzy entity resolution: match a dirty feed of customer
    names (deterministically corrupted in-query — the stand-in for an
    external CRM extract) back to the master table by edit distance.

    Scale shape: never all-pairs. Candidates come from an equi-join on a
    blocking key (nationkey, name length) — a standard shuffle join whose
    per-block fan-out is bounded — then ``levenshtein`` (JVM expression,
    whole-stage codegen) scores candidates and a per-record window keeps
    the best match (ties broken by custkey, so the result is
    deterministic). Blocking recall is a documented trade-off, as in any
    production ER pipeline: candidates outside the block are unseen by
    construction, and the oracle applies the identical blocking."""
    cust = load(spark, sf, "customer").select(
        "c_custkey", "c_name", "c_nationkey", F.length("c_name").alias("blk_len")
    )
    crm = (
        cust.filter((F.col("c_custkey") % 10) == 3)
        .select(
            F.col("c_custkey").alias("crm_id"),
            F.concat(
                F.expr("substring(c_name, 1, length(c_name)-1)"), F.lit("X")
            ).alias("crm_name"),
            F.col("c_nationkey").alias("blk_nation"),
            F.col("blk_len").alias("crm_blk_len"),
        )
    )
    cand = (
        crm.join(
            cust,
            (F.col("blk_nation") == F.col("c_nationkey"))
            & (F.col("crm_blk_len") == F.col("blk_len")),
        )
        .withColumn("dist", F.levenshtein("crm_name", "c_name"))
        .filter(F.col("dist") <= 2)
    )
    w = Window.partitionBy("crm_id").orderBy("dist", "c_custkey")
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "crm_id",
            "crm_name",
            F.col("c_custkey").alias("matched_custkey"),
            F.col("dist").alias("edit_distance"),
        )
        .orderBy("crm_id")
    )


FUZZY_MATCH_SQL = """
WITH cust AS (
  SELECT c_custkey, c_name, c_nationkey, length(c_name) AS blk_len FROM customer
),
crm AS (
  SELECT c_custkey AS crm_id,
         substr(c_name, 1, length(c_name)-1) || 'X' AS crm_name,
         c_nationkey AS blk_nation, blk_len
  FROM cust WHERE c_custkey % 10 = 3
),
cand AS (
  SELECT crm.crm_id, crm.crm_name, c.c_custkey,
         levenshtein(crm.crm_name, c.c_name) AS dist
  FROM crm JOIN cust c
    ON crm.blk_nation = c.c_nationkey AND crm.blk_len = c.blk_len
),
best AS (
  SELECT *, row_number() OVER (PARTITION BY crm_id ORDER BY dist, c_custkey) AS rn
  FROM cand WHERE dist <= 2
)
SELECT crm_id, crm_name, c_custkey AS matched_custkey, dist AS edit_distance
FROM best WHERE rn = 1 ORDER BY crm_id
"""


def source_feature_corr(spark, sf):
    """Per-source Pearson correlation between document length (chars)
    and token count, computed from EXACT integer sums.

    ``F.corr`` (and any streaming-variance formula) accumulates float
    moments in partition order — not reproducible across engines or
    layouts.  Here the five sufficient statistics (Σx, Σy, Σxy, Σx²,
    Σy²) are exact BIGINT sums (the map-side-combinable shape), and the
    single double-precision expression at the end is evaluated
    identically in Spark and DuckDB, then rounded once.  One scan, one
    per-source aggregate — rides the scan at any corpus size.
    """
    docs = load(spark, sf, "documents").select(
        "source",
        F.col("n_chars").alias("x"),
        F.size(F.split("text", " ")).cast("long").alias("y"),
    )
    agg = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    dx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    dy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    den = F.sqrt(dx.cast("double")) * F.sqrt(dy.cast("double"))
    # zero-variance groups: Spark's x/0.0 is NULL but DuckDB's is
    # NaN/inf — guard to NULL identically on both sides
    corr = F.when((dx != 0) & (dy != 0), F.round(num / den, 6))
    return agg.select(
        "source",
        "n",
        corr.alias("chars_tokens_corr"),
    ).orderBy("source")


SOURCE_FEATURE_CORR_SQL = """
WITH agg AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy
  FROM (
    SELECT source, n_chars AS x,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS y
    FROM documents
  )
  GROUP BY source
)
SELECT source, n,
       CASE WHEN n * sxx - sx * sx <> 0 AND n * syy - sy * sy <> 0
            THEN ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                       / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                          * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6)
            ELSE NULL END AS chars_tokens_corr
FROM agg
ORDER BY source
"""


QUERIES = {
    "salted_agg_lineitem": Q(salted_agg_lineitem, SALTED_AGG_SQL),
    "fuzzy_match_customers": Q(fuzzy_match_customers, FUZZY_MATCH_SQL),
    "data_quality_report": Q(data_quality_report, _dq_sql()),
    "profile_documents": Q(profile_documents, _profile_sql()),
    "grouping_sets_revenue": Q(grouping_sets_revenue, GROUPING_SETS_SQL),
    "trailing_window_revenue": Q(trailing_window_revenue, TRAILING_WINDOW_SQL),
    "asof_prev_order": Q(asof_prev_order, ASOF_SQL),
    "unpivot_part_metrics": Q(unpivot_part_metrics, UNPIVOT_SQL),
    "source_feature_corr": Q(source_feature_corr, SOURCE_FEATURE_CORR_SQL),
    "merge_upsert_orders": Q(merge_upsert_orders, MERGE_SQL),
    "range_join_price_bands": Q(range_join_price_bands, RANGE_JOIN_SQL),
    "cube_order_stats": Q(cube_order_stats, CUBE_SQL),
    "date_part_revenue": Q(date_part_revenue, DATE_PART_SQL),
    "quantity_percentiles": Q(quantity_percentiles, PERCENTILE_SQL),
    "token_bpe_ish": Q(token_bpe_ish, BPE_SQL),
    "rolling_hash_fingerprint": Q(rolling_hash_fingerprint, ROLLING_HASH_SQL),
}
