"""Table-maintenance operators: incremental MV refresh, snapshot diff,
Z-order layout.

The reference engine's job ends at estimating dedup; a production corpus
store also has to *stay correct and cheap to query as it changes*.  These
queries cover that lifecycle layer:

* ``mv_incremental_orders`` — self-maintainable aggregate view refreshed
  from insert + retraction deltas without rescanning the base table
  (``operators/matview.py``).
* ``snapshot_diff_docs`` — added/removed/changed census between two
  corpus snapshots by content digest (what changed between crawl N and
  N+1), the input a downstream incremental dedup/train pipeline keys on.
* ``zorder_layout`` — Morton-curve clustering quality: per-tile bounds
  prove every participating dimension is tight inside a tile, the
  property parquet min-max pruning converts into skipped bytes
  (``operators/layout.py`` has the writer + measured pruning fractions).

Scale shape (100 TB): the MV merge shuffles O(|delta| + |touched keys|),
never the base; the snapshot diff is one sort-merge join keyed on doc_id
(bucketed snapshots make it exchange-free); the z-value is pure integer
expression work that rides the scan.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dataset_dedupe_estimator_spark.operators.layout import zvalue, zvalue_sql
from dataset_dedupe_estimator_spark.operators.matview import (
    additive_state,
    merge_states,
)
from dataset_dedupe_estimator_spark.queries.base import Q, cents, load, sql_cents


# --- incremental materialized view -----------------------------------------

def mv_incremental_orders(spark, sf):
    """Per-customer order count/total maintained from deltas only.

    The stored view is the partial-aggregate state of the base batch
    (orders with ``o_orderkey % 7 != 0``); a later batch inserts the
    ``% 7 == 0`` orders and then retracts the ``% 14 == 0`` ones
    (signed -1 state).  The refresh merges the three states with one
    delta-sized shuffle — the base rows are aggregated exactly once.
    The result must equal a from-scratch aggregate over the surviving
    rows, which is what the oracle recomputes.
    """
    orders = load(spark, sf, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    measures = {"mv_cents": cents("o_totalprice")}
    keys = ["o_custkey"]
    base = additive_state(
        orders.filter(F.col("o_orderkey") % 7 != 0), keys, measures
    )
    inserts = additive_state(
        orders.filter(F.col("o_orderkey") % 7 == 0), keys, measures
    )
    retracts = additive_state(
        orders.filter(F.col("o_orderkey") % 14 == 0), keys, measures, sign=-1
    )
    mv = merge_states([base, inserts, retracts], keys)
    return mv.select(
        F.col("o_custkey").alias("custkey"),
        F.col("mv_count").alias("order_cnt"),
        (F.col("mv_cents").cast("double") / 100).alias("total_price"),
    ).orderBy("custkey")


MV_INCREMENTAL_ORDERS_SQL = f"""
SELECT o_custkey AS custkey,
       COUNT(*) AS order_cnt,
       CAST(SUM({sql_cents('o_totalprice')}) AS DOUBLE) / 100 AS total_price
FROM orders
WHERE o_orderkey % 14 <> 0
GROUP BY o_custkey
ORDER BY custkey
"""


# --- snapshot diff ----------------------------------------------------------

def snapshot_diff_docs(spark, sf):
    """Added/removed/changed/unchanged census between two corpus snapshots.

    Snapshot A drops ``doc_id % 11 == 3``; snapshot B drops
    ``doc_id % 11 == 7`` and revises the text of ``doc_id % 5 == 0``.
    The diff compares content digests after a full-outer join on doc_id
    and reports per-(source, status) counts — the changelog an
    incremental dedup/index pipeline consumes instead of reprocessing
    the whole corpus.
    """
    docs = load(spark, sf, "documents").select("doc_id", "source", "text")
    snap_a = docs.filter(F.col("doc_id") % 11 != 3)
    snap_b = docs.filter(F.col("doc_id") % 11 != 7).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit(" [rev2]"))
        ).otherwise(F.col("text")),
    )
    a = snap_a.select(
        "doc_id",
        F.col("source").alias("src_a"),
        F.md5(F.col("text").cast("binary")).alias("dig_a"),
    )
    b = snap_b.select(
        "doc_id",
        F.col("source").alias("src_b"),
        F.md5(F.col("text").cast("binary")).alias("dig_b"),
    )
    joined = a.join(b, "doc_id", "full_outer")
    status = (
        F.when(F.col("dig_b").isNull(), F.lit("removed"))
        .when(F.col("dig_a").isNull(), F.lit("added"))
        .when(F.col("dig_a") != F.col("dig_b"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        joined.select(
            F.coalesce("src_a", "src_b").alias("source"), status.alias("status")
        )
        .groupBy("source", "status")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("source", "status")
    )


SNAPSHOT_DIFF_DOCS_SQL = """
WITH a AS (
  SELECT doc_id, source, md5(text) AS dig
  FROM documents WHERE doc_id % 11 <> 3
),
b AS (
  SELECT doc_id, source,
         md5(CASE WHEN doc_id % 5 = 0 THEN text || ' [rev2]' ELSE text END) AS dig
  FROM documents WHERE doc_id % 11 <> 7
)
SELECT COALESCE(a.source, b.source) AS source,
       CASE WHEN b.dig IS NULL THEN 'removed'
            WHEN a.dig IS NULL THEN 'added'
            WHEN a.dig <> b.dig THEN 'changed'
            ELSE 'unchanged' END AS status,
       COUNT(*) AS n_docs
FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
GROUP BY 1, 2
ORDER BY source, status
"""


# --- z-order layout ---------------------------------------------------------

_Z_BITS = 10
_TILE_SHIFT = 1 << 14  # keep the top 6 of 20 z-bits -> 64 Morton tiles


def zorder_layout(spark, sf):
    """Morton-tile locality census over lineitem (partkey x suppkey).

    Interleaves the low 10 bits of ``l_partkey % 1024`` and
    ``l_suppkey % 1024`` into a 20-bit z-value and reports, per 64th of
    the curve, the row count and the min/max of *both* dimensions.  The
    tight per-tile bounds on every dimension are exactly the footer
    stats a z-ordered write ships to the scan planner
    (``operators/layout.py::write_zordered``); the measured pruning
    fractions live in tests/test_layout.py and SCALING.md.
    """
    li = load(spark, sf, "lineitem").select(
        (F.col("l_partkey") % 1024).alias("a"),
        (F.col("l_suppkey") % 1024).alias("b"),
    )
    z = zvalue([F.col("a"), F.col("b")], _Z_BITS)
    return (
        li.withColumn("tile", (z / F.lit(_TILE_SHIFT)).cast("long"))
        .groupBy("tile")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("a").alias("min_a"),
            F.max("a").alias("max_a"),
            F.min("b").alias("min_b"),
            F.max("b").alias("max_b"),
        )
        .orderBy("tile")
    )


ZORDER_LAYOUT_SQL = f"""
WITH keyed AS (
  SELECT (l_partkey % 1024) AS a, (l_suppkey % 1024) AS b FROM lineitem
)
SELECT {zvalue_sql(['a', 'b'], _Z_BITS)} // {_TILE_SHIFT} AS tile,
       COUNT(*) AS n_rows,
       MIN(a) AS min_a, MAX(a) AS max_a,
       MIN(b) AS min_b, MAX(b) AS max_b
FROM keyed
GROUP BY 1
ORDER BY tile
"""


# --- versioned table / time travel ------------------------------------------

def table_time_travel(spark, sf):
    """Reproducible-snapshot census over a real versioned table.

    Builds a versioned parquet table (``sources/versioned.py``) in a
    temp dir — v0 appends the ``% 3 == 0`` orders, v1 appends the
    ``% 3 == 1`` slice, v2 OVERWRITES with the ``% 3 == 2`` slice — then
    time-travel-reads every version and reports its exact census. The
    oracle recomputes each snapshot's membership from the commit rules,
    so a wrong live-set fold (e.g. overwrite not replacing, or a later
    commit leaking into an earlier read) hash-mismatches. Eager by
    construction (commits run at build); the returned frame is
    localCheckpointed before the temp table vanishes.
    """
    import shutil
    import tempfile

    from dataset_dedupe_estimator_spark.sources import versioned as vt

    orders = load(spark, sf, "orders").select("o_orderkey", "o_totalprice")
    root = tempfile.mkdtemp(prefix="dde_vt_")
    try:
        vt.append(root, orders.filter(F.col("o_orderkey") % 3 == 0), num_files=2)
        vt.append(root, orders.filter(F.col("o_orderkey") % 3 == 1), num_files=2)
        vt.overwrite(root, orders.filter(F.col("o_orderkey") % 3 == 2), num_files=2)
        parts = []
        for v in (0, 1, 2):
            parts.append(
                vt.read_version(spark, root, v)
                .agg(
                    F.count(F.lit(1)).alias("n_orders"),
                    F.sum(cents("o_totalprice")).alias("total_cents"),
                )
                .select(
                    F.lit(v).cast("int").alias("version"),
                    "n_orders",
                    "total_cents",
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out.orderBy("version").localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


TABLE_TIME_TRAVEL_SQL = f"""
SELECT 0 AS version, CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM({sql_cents('o_totalprice')}) AS BIGINT) AS total_cents
FROM orders WHERE o_orderkey % 3 = 0
UNION ALL
SELECT 1, CAST(COUNT(*) AS BIGINT), CAST(SUM({sql_cents('o_totalprice')}) AS BIGINT)
FROM orders WHERE o_orderkey % 3 IN (0, 1)
UNION ALL
SELECT 2, CAST(COUNT(*) AS BIGINT), CAST(SUM({sql_cents('o_totalprice')}) AS BIGINT)
FROM orders WHERE o_orderkey % 3 = 2
ORDER BY version
"""


# --- versioned-table diff -> MV refresh (the lifecycle loop) -----------------

def mv_from_version_diff(spark, sf):
    """Incremental MV maintained from a versioned table's commit diff.

    The composed lifecycle loop: a versioned documents table commits v0
    (drop ``doc_id % 4 == 3``) then OVERWRITES with v1 (drop
    ``% 4 == 1``); the per-source MV built against v0 is refreshed by
    diffing the two snapshots (two delta-sized anti-joins -> +1/-1
    state) and merging — v1 is never re-aggregated wholesale. The
    oracle computes the per-source rollup directly from v1's membership
    rule, so a wrong diff (missed retraction, double-counted add)
    hash-mismatches. Eager (commits at construction); result is
    localCheckpointed before the temp table vanishes.
    """
    import shutil
    import tempfile

    from dataset_dedupe_estimator_spark.sources import versioned as vt

    docs = load(spark, sf, "documents").select("doc_id", "source", "n_chars")
    root = tempfile.mkdtemp(prefix="dde_mvd_")
    try:
        vt.append(root, docs.filter(F.col("doc_id") % 4 != 3), num_files=2)
        vt.overwrite(root, docs.filter(F.col("doc_id") % 4 != 1), num_files=2)
        v0 = vt.read_version(spark, root, 0)
        v1 = vt.read_version(spark, root, 1)
        added = v1.join(v0.select("doc_id"), "doc_id", "left_anti")
        removed = v0.join(v1.select("doc_id"), "doc_id", "left_anti")
        keys = ["source"]
        measures = {"mv_chars": F.col("n_chars")}
        mv = merge_states(
            [
                additive_state(v0, keys, measures),
                additive_state(added, keys, measures),
                additive_state(removed, keys, measures, sign=-1),
            ],
            keys,
        )
        return (
            mv.select(
                "source",
                F.col("mv_count").alias("n_docs"),
                F.col("mv_chars").alias("total_chars"),
            )
            .orderBy("source")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


MV_FROM_VERSION_DIFF_SQL = """
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
WHERE doc_id % 4 <> 1
GROUP BY source
ORDER BY source
"""


# --- streaming MV refresh under the gate -------------------------------------

def streaming_mv_refresh(spark, sf):
    """Structured-Streaming MV maintenance end-to-end under the gate.

    Two changelog waves land as files: wave 1 inserts the
    ``o_orderkey % 3 == 0`` orders; wave 2 inserts the ``% 3 == 1``
    slice AND retracts (sign -1) the ``% 6 == 0`` rows. A file stream
    (``maxFilesPerTrigger=1``) drives ``refresh_mv_parquet`` through
    foreachBatch — each microbatch merges signed state into the stored
    parquet MV; nothing is ever recomputed from the base table. The
    oracle aggregates the surviving membership directly, so a dropped
    retraction or double-applied batch hash-mismatches. Eager (the
    stream runs at construction); result localCheckpointed before the
    temp dirs vanish.
    """
    import shutil
    import tempfile

    from dataset_dedupe_estimator_spark.operators.matview import (
        refresh_mv_parquet,
    )

    orders = load(spark, sf, "orders").select(
        (F.col("o_custkey") % 10).alias("bucket"),
        cents("o_totalprice").alias("price_cents"),
        "o_orderkey",
    )
    root = tempfile.mkdtemp(prefix="dde_smv_")
    src = f"{root}/changelog"
    mv_path = f"{root}/mv"
    try:
        wave1 = orders.filter(F.col("o_orderkey") % 3 == 0).withColumn(
            "mv_sign", F.lit(1)
        )
        wave2 = orders.filter(F.col("o_orderkey") % 3 == 1).withColumn(
            "mv_sign", F.lit(1)
        ).unionByName(
            orders.filter(F.col("o_orderkey") % 6 == 0).withColumn(
                "mv_sign", F.lit(-1)
            )
        )
        wave1.coalesce(1).write.mode("append").parquet(src)
        wave2.coalesce(1).write.mode("append").parquet(src)
        schema = spark.read.parquet(src).schema
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(
                lambda batch, _id: refresh_mv_parquet(
                    spark,
                    mv_path,
                    batch,
                    ["bucket"],
                    {"mv_cents": F.col("price_cents")},
                )
            )
            .option("checkpointLocation", f"{root}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise RuntimeError(
                "streaming_mv_refresh: availableNow stream did not finish "
                "within 300s — refusing to read a partially-refreshed MV"
            )
        from dataset_dedupe_estimator_spark.operators.matview import read_mv

        return (
            read_mv(spark, mv_path)
            .select(
                "bucket",
                F.col("mv_count").alias("n_orders"),
                F.col("mv_cents").alias("total_cents"),
            )
            .orderBy("bucket")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


STREAMING_MV_REFRESH_SQL = f"""
SELECT o_custkey % 10 AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM({sql_cents('o_totalprice')}) AS BIGINT) AS total_cents
FROM orders
WHERE (o_orderkey % 3 = 0 AND o_orderkey % 6 <> 0) OR o_orderkey % 3 = 1
GROUP BY 1
ORDER BY bucket
"""


# --- zone-map pruned snapshot read ------------------------------------------

_ZM_BAND_LO = 1200  # o_orderkey band probed through the zone-map read
_ZM_BAND_HI = 3000


def table_zonemap_read(spark, sf):
    """Data-skipping snapshot read through a versioned table's zone maps
    (``sources/versioned.py::read_where``).

    Builds a versioned table from orders — two append commits written
    range-partitioned on ``o_orderkey`` with ``stats_columns`` recording
    per-file min/max in the commit log — then reads an orderkey band
    back through ``read_where``: files whose recorded range provably
    misses the band never enter the scan (the Delta data-skipping
    shape; tools/stress_zonemap.py measures a 96.9% file skip at 20M
    rows). The oracle filters orders directly, so a read that pruned a
    file it needed — or leaked rows from one it should have skipped —
    hash-mismatches. Eager by construction (commits run at build);
    result localCheckpointed before the temp table vanishes.
    """
    import shutil
    import tempfile

    from dataset_dedupe_estimator_spark.sources import versioned as vt

    orders = load(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", cents("o_totalprice").alias("price_cents")
    )
    root = tempfile.mkdtemp(prefix="dde_zm_")
    try:
        half = orders.filter(F.col("o_orderkey") % 2 == 0)
        rest = orders.filter(F.col("o_orderkey") % 2 == 1)
        vt.append(
            root,
            half.repartitionByRange(4, "o_orderkey"),
            stats_columns=["o_orderkey"],
        )
        vt.append(root, rest.repartitionByRange(4, "o_orderkey"))
        got = vt.read_where(
            spark, root, [("o_orderkey", "between", (_ZM_BAND_LO, _ZM_BAND_HI))]
        )
        out = (
            got.groupBy((F.col("o_custkey") % 10).alias("bucket"))
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.min("o_orderkey").alias("min_key"),
                F.max("o_orderkey").alias("max_key"),
                F.sum("price_cents").alias("total_cents"),
            )
            .orderBy("bucket")
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


TABLE_ZONEMAP_READ_SQL = f"""
SELECT o_custkey % 10 AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       MIN(o_orderkey) AS min_key,
       MAX(o_orderkey) AS max_key,
       CAST(SUM({sql_cents('o_totalprice')}) AS BIGINT) AS total_cents
FROM orders
WHERE o_orderkey BETWEEN {_ZM_BAND_LO} AND {_ZM_BAND_HI}
GROUP BY 1 ORDER BY bucket
"""


# deleted o_orderkey band for table_delete_where — inside every SF's key
# range so the delete always touches rows
_DW_LO = 200
_DW_HI = 700


def table_delete_where(spark, sf):
    """Zone-map-bounded DELETE on a versioned table
    (``sources/versioned.py::delete_where_pruned`` — the r7 deletion
    surface, Delta-DELETE shape).

    Builds a versioned table from orders in two range-partitioned
    commits with per-file zone maps, DELETES an o_orderkey band — the
    rewrite touches only the files whose recorded [min,max] intersects
    the band, every other file is carried by reference under a
    ``removed`` mask — then aggregates the post-delete snapshot. The
    oracle aggregates orders WHERE the band is excluded, so a delete
    that dropped a row it shouldn't (over-masking) or kept one it
    should have deleted hash-mismatches. Eager by construction (commits
    run at build); result localCheckpointed before the temp table
    vanishes.
    """
    import shutil
    import tempfile

    from dataset_dedupe_estimator_spark.sources import versioned as vt

    orders = load(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", cents("o_totalprice").alias("price_cents")
    )
    root = tempfile.mkdtemp(prefix="dde_dw_")
    try:
        half = orders.filter(F.col("o_orderkey") % 2 == 0)
        rest = orders.filter(F.col("o_orderkey") % 2 == 1)
        vt.append(
            root,
            half.repartitionByRange(4, "o_orderkey"),
            stats_columns=["o_orderkey"],
        )
        vt.append(root, rest.repartitionByRange(4, "o_orderkey"))
        vt.delete_where_pruned(
            spark, root, [("o_orderkey", "between", (_DW_LO, _DW_HI))]
        )
        got = vt.read_version(spark, root)
        out = (
            got.groupBy((F.col("o_custkey") % 10).alias("bucket"))
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.min("o_orderkey").alias("min_key"),
                F.max("o_orderkey").alias("max_key"),
                F.sum("price_cents").alias("total_cents"),
            )
            .orderBy("bucket")
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def table_update_read(spark, sf):
    """Zone-map-bounded UPDATE on a versioned table (r11,
    ``sources/versioned.py::update_where_pruned`` — the Delta
    ``UPDATE ... SET ... WHERE`` shape).

    Orders ingest in two range-partitioned commits with per-file zone
    maps; an o_orderkey band gets its price DOUBLED and its priority
    re-tagged (SET expressions over the pre-update row) — only the
    files whose recorded [min,max] intersects the band are rewritten
    (the query RAISES if nothing was carried by reference, if time
    travel below the update stops showing the pre-update prices, or if
    the change feed's delete+insert pair count is wrong). The final
    aggregate reads the post-update snapshot; the oracle applies the
    same conditional arithmetic to raw orders, so an update that
    touched a row it shouldn't (or missed one, or doubled twice)
    hash-mismatches."""
    import shutil
    import tempfile

    from dataset_dedupe_estimator_spark.sources import versioned as vt

    orders = load(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", cents("o_totalprice").alias("price_cents"),
        "o_orderpriority",
    )
    root = tempfile.mkdtemp(prefix="dde_uw_")
    try:
        half = orders.filter(F.col("o_orderkey") % 2 == 0)
        rest = orders.filter(F.col("o_orderkey") % 2 == 1)
        vt.append(
            root,
            half.repartitionByRange(4, "o_orderkey"),
            stats_columns=["o_orderkey"], change_feed=True,
        )
        vt.append(root, rest.repartitionByRange(4, "o_orderkey"))
        st = vt.update_where_pruned(
            spark, root,
            [("o_orderkey", "between", (_UW_LO, _UW_HI))],
            {
                "price_cents": F.col("price_cents") * 2,
                "o_orderpriority": "9-UPDATED",
            },
        )
        if not st["carried_files"]:
            raise AssertionError(f"update carried nothing: {st}")
        # time travel below the update must read pre-update prices
        pre = vt.read_version(spark, root, 1).filter(
            F.col("o_orderkey").between(_UW_LO, _UW_HI)
        )
        post = vt.read_version(spark, root).filter(
            F.col("o_orderkey").between(_UW_LO, _UW_HI)
        )
        if pre.agg(F.sum("price_cents")).collect()[0][0] * 2 != (
            post.agg(F.sum("price_cents")).collect()[0][0]
        ):
            raise AssertionError("time travel below the update broke")
        # change feed: a delete+insert pair per updated row
        n_changes = vt.read_change_feed(spark, root, 1).count()
        if n_changes != 2 * st["updated_rows"]:
            raise AssertionError(
                f"CDF pairs wrong: {n_changes} != 2x{st['updated_rows']}"
            )
        out = (
            vt.read_version(spark, root)
            .groupBy((F.col("o_custkey") % 10).alias("bucket"))
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum("price_cents").alias("total_cents"),
                F.sum(
                    F.when(
                        F.col("o_orderpriority") == "9-UPDATED", 1
                    ).otherwise(0)
                ).alias("n_updated"),
            )
            .orderBy("bucket")
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


_UW_LO, _UW_HI = 100, 400  # updated band (exists at every sf tier)


def table_replace_where_read(spark, sf):
    """Atomic predicate-scoped overwrite (r13,
    ``sources/versioned.py::replace_where`` — the Delta
    ``replaceWhere`` / dynamic-partition-backfill shape).

    Orders ingest in two range-partitioned commits with zone maps and
    the change feed on; an o_orderkey band is then REPLACED in one
    commit by a recomputed slice — the band's even-keyed rows only,
    prices tripled and re-tagged — so the slice genuinely RESIZES
    (an update/merge could not produce this: rows vanish AND change).
    The query RAISES unless zone maps carried untouched files by
    reference, time travel below the replace still reads the original
    band, the smuggling guard refuses an out-of-scope row, and the
    change feed holds exactly (old band rows) deletes + (new slice)
    inserts. The aggregate reads the post-replace snapshot; the oracle
    recomputes it from raw orders (outside-band rows as-is, in-band
    even keys tripled, odd keys gone), so a row the replace missed,
    kept, or smuggled hash-mismatches."""
    import shutil
    import tempfile

    from dataset_dedupe_estimator_spark.sources import versioned as vt

    orders = load(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", cents("o_totalprice").alias("price_cents"),
        "o_orderpriority",
    )
    root = tempfile.mkdtemp(prefix="dde_rw_")
    try:
        half = orders.filter(F.col("o_orderkey") % 2 == 0)
        rest = orders.filter(F.col("o_orderkey") % 2 == 1)
        vt.append(
            root,
            half.repartitionByRange(4, "o_orderkey"),
            stats_columns=["o_orderkey"], change_feed=True,
        )
        vt.append(root, rest.repartitionByRange(4, "o_orderkey"))
        band = F.col("o_orderkey").between(_RW_LO, _RW_HI)
        n_old = vt.read_version(spark, root).filter(band).count()
        new_slice = (
            orders.filter(band)
            .filter(F.col("o_orderkey") % 2 == 0)
            .withColumn("price_cents", F.col("price_cents") * 3)
            .withColumn("o_orderpriority", F.lit("8-BACKFILL"))
        )
        # the smuggling guard must refuse an out-of-scope row
        try:
            vt.replace_where(
                spark, root,
                new_slice.unionByName(
                    orders.filter(F.col("o_orderkey") == _RW_HI + 50)
                ),
                [("o_orderkey", "between", (_RW_LO, _RW_HI))],
            )
            raise AssertionError("out-of-scope replacement row accepted")
        except ValueError:
            pass
        st = vt.replace_where(
            spark, root, new_slice,
            [("o_orderkey", "between", (_RW_LO, _RW_HI))],
        )
        if not st["carried_files"]:
            raise AssertionError(f"replace carried nothing: {st}")
        if st["replaced_rows"] != n_old:
            raise AssertionError(
                f"replaced {st['replaced_rows']} != band size {n_old}"
            )
        # time travel below the replace still reads the original band
        pre = vt.read_version(spark, root, st["version"] - 1).filter(band)
        if pre.count() != n_old or pre.filter(
            F.col("o_orderpriority") == "8-BACKFILL"
        ).count():
            raise AssertionError("time travel below the replace broke")
        # change feed: old band rows out, new slice in
        cdf = vt.read_change_feed(
            spark, root, st["version"] - 1, st["version"]
        )
        n_del = cdf.filter(F.col("_change") == "delete").count()
        n_ins = cdf.filter(F.col("_change") == "insert").count()
        if n_del != n_old or n_ins != st["inserted_rows"]:
            raise AssertionError(
                f"CDF wrong: {n_del} deletes vs {n_old}, "
                f"{n_ins} inserts vs {st['inserted_rows']}"
            )
        out = (
            vt.read_version(spark, root)
            .groupBy((F.col("o_custkey") % 10).alias("bucket"))
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum("price_cents").alias("total_cents"),
                F.sum(
                    F.when(
                        F.col("o_orderpriority") == "8-BACKFILL", 1
                    ).otherwise(0)
                ).alias("n_backfilled"),
            )
            .orderBy("bucket")
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


_RW_LO, _RW_HI = 150, 650  # replaced band (exists at every sf tier)


def table_analyze_read(spark, sf):
    """ANALYZE TABLE statistics (r13, ``sources/versioned.py::
    analyze_table`` — the catalog-statistics verb: per-column
    null_count / NDV / min / max plus table row count, persisted as an
    advisory sidecar with a staleness flag). The table ingests orders
    and then DELETES a key band BEFORE analyzing, so the statistics
    must describe the live snapshot, not the raw ingest — an analyzer
    that scanned masked files, skipped a column, or mis-counted nulls
    hash-mismatches against DuckDB recomputing the same stats from
    orders-minus-band. The query RAISES if the freshness flag misfires
    (fresh right after ANALYZE, stale after the next commit)."""
    import shutil
    import tempfile

    from dataset_dedupe_estimator_spark.sources import versioned as vt

    orders = load(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    root = tempfile.mkdtemp(prefix="dde_an_")
    try:
        vt.append(
            root, orders.repartitionByRange(4, "o_orderkey"),
            stats_columns=["o_orderkey"],
        )
        vt.delete_where_pruned(
            spark, root, [("o_orderkey", "between", (_AN_LO, _AN_HI))]
        )
        st = vt.analyze_table(
            spark, root,
            columns=["o_orderkey", "o_custkey", "o_orderpriority"],
        )
        back = vt.table_statistics(root)
        if back["stale"] or back["version"] != st["version"]:
            raise AssertionError(f"freshness flag wrong: {back}")
        vt.append(root, orders.limit(0))
        if not vt.table_statistics(root)["stale"]:
            raise AssertionError("stats not flagged stale after a commit")
        rows = [
            (
                c,
                cs["null_count"],
                cs["ndv"],
                str(cs["min"]),
                str(cs["max"]),
                st["rows"],
            )
            for c, cs in st["columns"].items()
        ]
        return (
            spark.createDataFrame(
                rows,
                "col string, null_count bigint, ndv bigint, "
                "min_repr string, max_repr string, n_rows bigint",
            )
            .orderBy("col")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


_AN_LO, _AN_HI = 120, 520  # deleted band before ANALYZE


def _an_col_sql(col: str) -> str:
    return f"""
SELECT '{col}' AS col,
       CAST(COUNT(*) - COUNT({col}) AS BIGINT) AS null_count,
       CAST(COUNT(DISTINCT {col}) AS BIGINT) AS ndv,
       CAST(MIN({col}) AS VARCHAR) AS min_repr,
       CAST(MAX({col}) AS VARCHAR) AS max_repr,
       CAST((SELECT COUNT(*) FROM live) AS BIGINT) AS n_rows
FROM live"""


TABLE_ANALYZE_READ_SQL = f"""
WITH live AS (
  SELECT * FROM orders
  WHERE o_orderkey NOT BETWEEN {_AN_LO} AND {_AN_HI}
)
{_an_col_sql('o_orderkey')}
UNION ALL
{_an_col_sql('o_custkey')}
UNION ALL
{_an_col_sql('o_orderpriority')}
ORDER BY col
"""


TABLE_REPLACE_WHERE_READ_SQL = f"""
SELECT o_custkey % 10 AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CASE WHEN o_orderkey BETWEEN {_RW_LO} AND {_RW_HI}
                THEN {sql_cents('o_totalprice')} * 3
                ELSE {sql_cents('o_totalprice')} END) AS BIGINT)
           AS total_cents,
       CAST(SUM(CASE WHEN o_orderkey BETWEEN {_RW_LO} AND {_RW_HI}
                THEN 1 ELSE 0 END) AS BIGINT) AS n_backfilled
FROM orders
WHERE o_orderkey NOT BETWEEN {_RW_LO} AND {_RW_HI}
   OR o_orderkey % 2 = 0
GROUP BY bucket
ORDER BY bucket
"""


TABLE_UPDATE_READ_SQL = f"""
SELECT o_custkey % 10 AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CASE WHEN o_orderkey BETWEEN {_UW_LO} AND {_UW_HI}
                THEN {sql_cents('o_totalprice')} * 2
                ELSE {sql_cents('o_totalprice')} END) AS BIGINT)
           AS total_cents,
       CAST(SUM(CASE WHEN o_orderkey BETWEEN {_UW_LO} AND {_UW_HI}
                THEN 1 ELSE 0 END) AS BIGINT) AS n_updated
FROM orders
GROUP BY 1 ORDER BY bucket
"""


def table_dv_update_read(spark, sf):
    """MERGE-ON-READ UPDATE via deletion vector (r11,
    ``sources/versioned.py::update_where_dv`` — the Delta DV-update
    shape): the pre-image positions go into a KB-sized sidecar and the
    post-image rows land as a small new directory; ZERO existing files
    are rewritten (the query RAISES otherwise), every reader
    anti-joins the DV. A second DV update over an already-updated row
    must compose (the post-image row itself gets hidden and
    re-emitted), and ``optimize`` must purge the hidden pre-images
    WITHOUT resurrecting them. The final aggregate reads the
    post-maintenance snapshot; the oracle applies the same two-step
    conditional arithmetic to raw orders."""
    import shutil
    import tempfile

    from dataset_dedupe_estimator_spark.sources import versioned as vt

    orders = load(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", cents("o_totalprice").alias("price_cents")
    )
    root = tempfile.mkdtemp(prefix="dde_dvu_")
    try:
        vt.append(
            root,
            orders.repartitionByRange(8, "o_orderkey"),
            stats_columns=["o_orderkey"],
        )
        st = vt.update_where_dv(
            spark, root,
            [("o_orderkey", "between", (_DVU_LO, _DVU_HI))],
            {"price_cents": F.col("price_cents") * 2},
        )
        if st["rewritten_files"] != 0:
            raise AssertionError(f"DV update rewrote files: {st}")
        # second update over a sub-band composes on top (those rows
        # end at x2 + 1, exercising post-image re-hiding)
        vt.update_where_dv(
            spark, root,
            [("o_orderkey", "between", (_DVU_LO, _DVU_MID))],
            {"price_cents": F.col("price_cents") + 1},
        )
        # maintenance purges hidden pre-images without resurrection
        vt.optimize(spark, root, num_files=4)
        out = (
            vt.read_version(spark, root)
            .groupBy((F.col("o_custkey") % 10).alias("bucket"))
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum("price_cents").alias("total_cents"),
            )
            .orderBy("bucket")
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


_DVU_LO, _DVU_MID, _DVU_HI = 500, 700, 900  # DV-updated bands


TABLE_DV_UPDATE_READ_SQL = f"""
SELECT o_custkey % 10 AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CASE
            WHEN o_orderkey BETWEEN {_DVU_LO} AND {_DVU_MID}
                THEN {sql_cents('o_totalprice')} * 2 + 1
            WHEN o_orderkey BETWEEN {_DVU_LO} AND {_DVU_HI}
                THEN {sql_cents('o_totalprice')} * 2
            ELSE {sql_cents('o_totalprice')} END) AS BIGINT)
           AS total_cents
FROM orders
GROUP BY 1 ORDER BY bucket
"""


TABLE_DELETE_WHERE_SQL = f"""
SELECT o_custkey % 10 AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       MIN(o_orderkey) AS min_key,
       MAX(o_orderkey) AS max_key,
       CAST(SUM({sql_cents('o_totalprice')}) AS BIGINT) AS total_cents
FROM orders
WHERE o_orderkey NOT BETWEEN {_DW_LO} AND {_DW_HI}
GROUP BY 1 ORDER BY bucket
"""


# upsert bands for table_upsert_merge — inside every SF's key range
_UP_LO = 200   # keys whose rows the MERGE replaces (price bumped)
_UP_HI = 700
_INS_HI = 260  # keys [200, 260] also spawn an INSERT at key + 10M
_INS_SHIFT = 10_000_000


def table_upsert_merge(spark, sf):
    """Zone-map-bounded MERGE on a versioned table
    (``sources/versioned.py::upsert_pruned`` — the r7 upsert surface,
    Delta-MERGE shape).

    Builds a versioned table from orders in two range-partitioned
    commits with per-file zone maps, then MERGEs an update set: rows in
    an o_orderkey band replace their originals with a bumped price, and
    a second slice inserts under keys shifted beyond every file's
    recorded range. Only files whose [min, max] can contain SOME update
    key are rewritten (per-key bisect, not a span test — the shifted
    insert keys alone would otherwise force a full rewrite); every
    other file is carried by reference. The oracle recomputes the
    post-merge table from orders directly (CASE for the replaced band,
    UNION ALL for the inserts), so a merge that dropped a row, kept a
    replaced original, or missed an insert hash-mismatches. Eager by
    construction; result localCheckpointed before the temp table
    vanishes.
    """
    import shutil
    import tempfile

    from dataset_dedupe_estimator_spark.sources import versioned as vt

    orders = load(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", cents("o_totalprice").alias("price_cents")
    )
    root = tempfile.mkdtemp(prefix="dde_um_")
    try:
        half = orders.filter(F.col("o_orderkey") % 2 == 0)
        rest = orders.filter(F.col("o_orderkey") % 2 == 1)
        vt.append(
            root,
            half.repartitionByRange(4, "o_orderkey"),
            stats_columns=["o_orderkey"],
        )
        vt.append(root, rest.repartitionByRange(4, "o_orderkey"))
        band = orders.filter(
            F.col("o_orderkey").between(_UP_LO, _UP_HI)
        )
        replaced = band.withColumn(
            "price_cents", F.col("price_cents") + F.lit(1000)
        )
        inserts = band.filter(F.col("o_orderkey") <= _INS_HI).select(
            (F.col("o_orderkey") + F.lit(_INS_SHIFT)).alias("o_orderkey"),
            "o_custkey",
            F.col("o_orderkey").cast("long").alias("price_cents"),
        )
        vt.upsert_pruned(
            spark, root, replaced.unionByName(inserts), ["o_orderkey"]
        )
        got = vt.read_version(spark, root)
        out = (
            got.groupBy((F.col("o_custkey") % 10).alias("bucket"))
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.min("o_orderkey").alias("min_key"),
                F.max("o_orderkey").alias("max_key"),
                F.sum("price_cents").alias("total_cents"),
            )
            .orderBy("bucket")
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


TABLE_UPSERT_MERGE_SQL = f"""
SELECT o_custkey % 10 AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       MIN(o_orderkey) AS min_key,
       MAX(o_orderkey) AS max_key,
       CAST(SUM(price_cents) AS BIGINT) AS total_cents
FROM (
    SELECT o_custkey, o_orderkey,
           CASE WHEN o_orderkey BETWEEN {_UP_LO} AND {_UP_HI}
                THEN {sql_cents('o_totalprice')} + 1000
                ELSE {sql_cents('o_totalprice')} END AS price_cents
    FROM orders
    UNION ALL
    SELECT o_custkey, o_orderkey + {_INS_SHIFT} AS o_orderkey,
           o_orderkey AS price_cents
    FROM orders WHERE o_orderkey BETWEEN {_UP_LO} AND {_INS_HI}
)
GROUP BY 1 ORDER BY bucket
"""


# string keys probed through the bloom-pruned read — inside every SF
_BLOOM_KEYS = (42, 777, 1234)


def table_bloom_read(spark, sf):
    """Bloom-filter data skipping on a STRING key
    (``sources/versioned.py`` — per-file Bloom bitmaps in the commit
    log, the Delta/Iceberg bloom shape; zone maps refuse strings
    because parquet may truncate their min/max).

    Builds a versioned table from orders with a synthesized string key
    (two commits, ``bloom_columns=["o_key"]``), then answers a
    three-key IN lookup through ONE ``read_where``: the probe consults
    the per-file bitmaps driver-side (md5 positions derived identically
    JVM-side at build and pure-Python at read — zero data bytes for the
    decision) and scans only files that may hold SOME key. The oracle
    recomputes the same rows from orders, so a bloom that pruned a file
    it needed — a false NEGATIVE, the one failure a Bloom filter must
    never have — hash-mismatches. Eager by construction; result
    localCheckpointed before the temp table vanishes.
    """
    import shutil
    import tempfile

    from dataset_dedupe_estimator_spark.sources import versioned as vt

    orders = load(spark, sf, "orders").select(
        F.format_string("key-%08d", F.col("o_orderkey")).alias("o_key"),
        "o_custkey",
        cents("o_totalprice").alias("price_cents"),
    )
    root = tempfile.mkdtemp(prefix="dde_bl_")
    try:
        vt.append(
            root, orders.filter(F.col("o_custkey") % 2 == 0).repartition(4),
            bloom_columns=["o_key"],
        )
        vt.append(root, orders.filter(F.col("o_custkey") % 2 == 1).repartition(4))
        got = vt.read_where(
            spark, root,
            [("o_key", "in", [f"key-{k:08d}" for k in _BLOOM_KEYS])],
        )
        out = got.orderBy("o_key").select("o_key", "o_custkey", "price_cents")
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


TABLE_BLOOM_READ_SQL = f"""
SELECT printf('key-%08d', o_orderkey) AS o_key,
       o_custkey,
       CAST({sql_cents('o_totalprice')} AS BIGINT) AS price_cents
FROM orders
WHERE o_orderkey IN ({", ".join(str(k) for k in _BLOOM_KEYS)})
ORDER BY o_key
"""


# checkpointed-log read: delete band inside every SF's key range
_CKR_LO, _CKR_HI = 500, 1500


def table_checkpoint_read(spark, sf):
    """Commit-log checkpointing (r8, ``sources/versioned.py`` — the
    Delta checkpoint shape): every ``_CKPT_EVERY`` commits the writer
    folds the log into ``_vlog/ckpt-v*.parquet`` and latest-version
    readers load checkpoint + JSON tail, O(live set + tail) instead of
    O(all history).

    Builds a table through 5 appends, a zone-map-bounded DELETE, a
    dataChange=false compaction, and one post-checkpoint tail append —
    with the cadence tightened to 4 so the read genuinely resolves
    through a FOLDED checkpoint (asserted: the query raises if no
    checkpoint file exists, so a silently-disabled fold can never pass
    as green). The final aggregate reads the checkpointed snapshot; the
    oracle recomputes it from orders minus the deleted band, so a fold
    that lost a live file, resurrected a masked one, or dropped the
    delete hash-mismatches. Eager by construction; result
    localCheckpointed before the temp table vanishes.
    """
    import shutil
    import tempfile
    from pathlib import Path

    from dataset_dedupe_estimator_spark.sources import versioned as vt

    orders = load(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", cents("o_totalprice").alias("price_cents")
    )
    root = tempfile.mkdtemp(prefix="dde_ck_")
    saved = vt._CKPT_EVERY
    try:
        vt._CKPT_EVERY = 4
        for m in range(4):
            vt.append(
                root, orders.filter(F.col("o_custkey") % 4 == m),
                num_files=1, stats_columns=["o_orderkey"],
            )
        vt.delete_where_pruned(
            spark, root, [("o_orderkey", "between", (_CKR_LO, _CKR_HI))]
        )
        vt.compact_small(spark, root)  # folds debris; masks -> dead dirs
        vt.append(  # JSON tail on top of the checkpoint
            root, orders.filter(F.col("o_orderkey") < 0), num_files=1
        )
        if not list((Path(root) / "_vlog").glob("ckpt-v*.parquet")):
            raise RuntimeError("checkpoint never materialized")
        got = vt.read_version(spark, root)
        out = (
            got.groupBy((F.col("o_custkey") % 10).alias("bucket"))
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.min("o_orderkey").alias("min_key"),
                F.max("o_orderkey").alias("max_key"),
                F.sum("price_cents").alias("total_cents"),
            )
            .orderBy("bucket")
        )
        return out.localCheckpoint(eager=True)
    finally:
        vt._CKPT_EVERY = saved
        shutil.rmtree(root, ignore_errors=True)


TABLE_CHECKPOINT_READ_SQL = f"""
SELECT o_custkey % 10 AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       MIN(o_orderkey) AS min_key,
       MAX(o_orderkey) AS max_key,
       CAST(SUM({sql_cents('o_totalprice')}) AS BIGINT) AS total_cents
FROM orders
WHERE o_orderkey NOT BETWEEN {_CKR_LO} AND {_CKR_HI}
GROUP BY 1 ORDER BY bucket
"""


# restore bands — inside every SF's key range
_RS_LO, _RS_HI = 800, 2200
_RS_INS_HI = 120
_RS_SHIFT = 20_000_000


def table_restore_read(spark, sf):
    """RESTORE — rollback-as-a-commit (r8, ``sources/versioned.py::
    restore``, the Delta RESTORE shape): a wrong DELETE is undone by
    re-referencing the target version's live set (zero data bytes
    moved), history stays intact above the target, and the table keeps
    moving forward afterwards.

    Two appends build the table, a zone-map-bounded DELETE wipes a key
    band (the accident), ``restore`` rolls back to the pre-delete
    version, and one more append lands ON TOP of the rollback. The
    final aggregate must equal orders-with-the-band-RESURRECTED plus
    the post-restore rows — the oracle recomputes exactly that, so a
    rollback that lost the deleted band, leaked the delete's masks
    into the restored files, or dropped the post-restore append
    hash-mismatches. Eager by construction; result localCheckpointed
    before the temp table vanishes.
    """
    import shutil
    import tempfile

    from dataset_dedupe_estimator_spark.sources import versioned as vt

    orders = load(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", cents("o_totalprice").alias("price_cents")
    )
    root = tempfile.mkdtemp(prefix="dde_rs_")
    try:
        vt.append(
            root,
            orders.filter(F.col("o_custkey") % 2 == 0)
            .repartitionByRange(4, "o_orderkey"),
            stats_columns=["o_orderkey"],
        )
        vt.append(
            root,
            orders.filter(F.col("o_custkey") % 2 == 1)
            .repartitionByRange(4, "o_orderkey"),
        )
        vt.delete_where_pruned(  # the accident
            spark, root, [("o_orderkey", "between", (_RS_LO, _RS_HI))]
        )
        st = vt.restore(spark, root, 1)
        if not st["committed"]:
            raise RuntimeError("restore did not commit")
        extra = orders.filter(F.col("o_orderkey") <= _RS_INS_HI).select(
            (F.col("o_orderkey") + F.lit(_RS_SHIFT)).alias("o_orderkey"),
            "o_custkey",
            "price_cents",
        )
        vt.append(root, extra, num_files=1)
        got = vt.read_version(spark, root)
        out = (
            got.groupBy((F.col("o_custkey") % 10).alias("bucket"))
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.min("o_orderkey").alias("min_key"),
                F.max("o_orderkey").alias("max_key"),
                F.sum("price_cents").alias("total_cents"),
            )
            .orderBy("bucket")
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


TABLE_RESTORE_READ_SQL = f"""
SELECT o_custkey % 10 AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       MIN(o_orderkey) AS min_key,
       MAX(o_orderkey) AS max_key,
       CAST(SUM(price_cents) AS BIGINT) AS total_cents
FROM (
    SELECT o_custkey, o_orderkey, {sql_cents('o_totalprice')} AS price_cents
    FROM orders
    UNION ALL
    SELECT o_custkey, o_orderkey + {_RS_SHIFT} AS o_orderkey,
           {sql_cents('o_totalprice')} AS price_cents
    FROM orders WHERE o_orderkey <= {_RS_INS_HI}
)
GROUP BY 1 ORDER BY bucket
"""


# deletion-vector bands — inside every SF's key range
_DV_LO, _DV_HI = 600, 1800
_DV_KEYS = (42, 2042, 2999)
_DV_UP = 2100


def table_dv_delete_read(spark, sf):
    """Deletion vectors (r8, ``sources/versioned.py::delete_where_dv``
    — the Delta DV / Iceberg position-delete merge-on-read shape):
    a DELETE commits an O(deleted rows) sidecar of (file, row
    position) pairs and rewrites NOTHING; every reader anti-joins it.

    Two appends build the table; one DV delete hides a key band, a
    second hides an IN set (accumulation; re-matching already-deleted
    rows must count zero); an upsert then rewrites one file
    (maintenance must not resurrect DV'd rows). The final aggregate
    reads the merge-on-read snapshot; the oracle recomputes orders
    minus the deleted keys with the upsert applied, so a resurrected
    row, a double-hidden row, or a position mis-join hash-mismatches.
    Eager by construction; result localCheckpointed before the temp
    table vanishes.
    """
    import shutil
    import tempfile

    from dataset_dedupe_estimator_spark.sources import versioned as vt

    orders = load(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", cents("o_totalprice").alias("price_cents")
    )
    root = tempfile.mkdtemp(prefix="dde_dv_")
    try:
        vt.append(
            root,
            orders.filter(F.col("o_custkey") % 2 == 0)
            .repartitionByRange(4, "o_orderkey"),
            stats_columns=["o_orderkey"],
        )
        vt.append(
            root,
            orders.filter(F.col("o_custkey") % 2 == 1)
            .repartitionByRange(4, "o_orderkey"),
        )
        vt.delete_where_dv(
            spark, root, [("o_orderkey", "between", (_DV_LO, _DV_HI))]
        )
        vt.delete_where_dv(
            spark, root, [("o_orderkey", "in", list(_DV_KEYS))]
        )
        ups = orders.filter(F.col("o_orderkey") == _DV_UP).select(
            "o_orderkey", "o_custkey",
            (F.col("price_cents") + F.lit(777)).alias("price_cents"),
        )
        vt.upsert_pruned(spark, root, ups, ["o_orderkey"])
        got = vt.read_version(spark, root)
        out = (
            got.groupBy((F.col("o_custkey") % 10).alias("bucket"))
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.min("o_orderkey").alias("min_key"),
                F.max("o_orderkey").alias("max_key"),
                F.sum("price_cents").alias("total_cents"),
            )
            .orderBy("bucket")
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


TABLE_DV_DELETE_READ_SQL = f"""
SELECT o_custkey % 10 AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       MIN(o_orderkey) AS min_key,
       MAX(o_orderkey) AS max_key,
       CAST(SUM(price_cents) AS BIGINT) AS total_cents
FROM (
    SELECT o_custkey, o_orderkey,
           CASE WHEN o_orderkey = {_DV_UP}
                THEN {sql_cents('o_totalprice')} + 777
                ELSE {sql_cents('o_totalprice')} END AS price_cents
    FROM orders
    WHERE o_orderkey NOT BETWEEN {_DV_LO} AND {_DV_HI}
      AND o_orderkey NOT IN ({", ".join(str(k) for k in _DV_KEYS)})
)
GROUP BY 1 ORDER BY bucket
"""


# concurrent-writer fixture: initial commit owns keys <= _CC_SPLIT; the
# DV band sits inside it, so concurrent appends (keys > _CC_SPLIT) can
# never race the delete's predicate — the final multiset is
# deterministic whatever the interleaving
_CC_SPLIT = 1000
_CC_DEL_LO, _CC_DEL_HI = 100, 300


def table_concurrent_append_read(spark, sf):
    """Multi-writer optimistic concurrency (r9,
    ``sources/versioned.py::_publish_staged`` / ``_check_rebase`` —
    the Delta rebase-and-retry shape): data writes run lock-free into
    staging directories; the short publish critical section conflict-
    checks the entries landed since each writer's snapshot and rebases
    commuting commits (blind appends, disjoint-file DV deletes) onto
    the moving tip.

    Three appender THREADS (two commits each) and one DV-deleter
    thread hit the same table concurrently from a shared barrier.
    Every writer must land exactly once: the query RAISES unless the
    commit log is gapless with all 8 commits (1 seed + 6 appends + 1
    DV delete). The final aggregate reads the merged snapshot; the
    oracle recomputes orders minus the deleted band, so a lost append,
    a lost delete, or a double-applied rebase hash-mismatches.
    """
    import shutil
    import tempfile
    import threading

    from dataset_dedupe_estimator_spark.sources import versioned as vt

    orders = load(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", cents("o_totalprice").alias("price_cents")
    )
    root = tempfile.mkdtemp(prefix="dde_conc_")
    try:
        vt.append(
            root,
            orders.filter(F.col("o_orderkey") <= _CC_SPLIT)
            .repartitionByRange(2, "o_orderkey"),
            stats_columns=["o_orderkey"],
        )
        barrier = threading.Barrier(4)
        errors = []

        def appender(w):
            try:
                barrier.wait(timeout=120)
                for parity in (0, 1):
                    vt.append(
                        root,
                        orders.filter(
                            (F.col("o_orderkey") > _CC_SPLIT)
                            & (F.col("o_custkey") % 3 == w)
                            & (F.col("o_orderkey") % 2 == parity)
                        ),
                        num_files=1,
                    )
            except Exception as exc:  # noqa: BLE001
                errors.append(exc)

        def deleter():
            try:
                barrier.wait(timeout=120)
                st = vt.delete_where_dv(
                    spark, root,
                    [("o_orderkey", "between", (_CC_DEL_LO, _CC_DEL_HI))],
                )
                if not st["committed"]:
                    raise AssertionError(f"DV delete did not land: {st}")
            except Exception as exc:  # noqa: BLE001
                errors.append(exc)

        threads = [
            threading.Thread(target=appender, args=(w,)) for w in range(3)
        ] + [threading.Thread(target=deleter)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        if errors:
            raise AssertionError(f"concurrent writer failed: {errors[0]!r}")
        versions = [e["version"] for e in vt.history(root)]
        if versions != list(range(8)):
            raise AssertionError(
                f"commit log not gapless with all writers landed: {versions}"
            )
        got = vt.read_version(spark, root)
        out = (
            got.groupBy((F.col("o_custkey") % 10).alias("bucket"))
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.min("o_orderkey").alias("min_key"),
                F.max("o_orderkey").alias("max_key"),
                F.sum("price_cents").alias("total_cents"),
            )
            .orderBy("bucket")
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


TABLE_CONCURRENT_APPEND_READ_SQL = f"""
SELECT o_custkey % 10 AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       MIN(o_orderkey) AS min_key,
       MAX(o_orderkey) AS max_key,
       CAST(SUM({sql_cents('o_totalprice')}) AS BIGINT) AS total_cents
FROM orders
WHERE o_orderkey NOT BETWEEN {_CC_DEL_LO} AND {_CC_DEL_HI}
GROUP BY 1 ORDER BY bucket
"""


def table_rename_read(spark, sf):
    """Column RENAME via column mapping (r9,
    ``sources/versioned.py::rename_column`` — the Delta column-mapping
    shape, minus field IDs): physical names freeze at column creation;
    a rename is a metadata-only commit carrying the accumulated
    logical->physical mapping, and every boundary (reads, predicates,
    incoming frames, CDF) projects through it.

    The table is built under original names, BOTH non-key columns are
    renamed (zero data bytes move — the query RAISES if any data file
    changes), then a pruned delete, an upsert, and the final read all
    speak the NEW names. The oracle recomputes the same state from
    orders with plain aliases, so a mapping slip anywhere on the
    read or write path (wrong column matched, stale name surfacing,
    stats misapplied) hash-mismatches.
    """
    import hashlib
    import shutil
    import tempfile
    from pathlib import Path

    from dataset_dedupe_estimator_spark.sources import versioned as vt

    orders = load(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", cents("o_totalprice").alias("price_cents")
    )
    root = tempfile.mkdtemp(prefix="dde_ren_")
    try:
        vt.append(
            root, orders.repartitionByRange(4, "o_orderkey"),
            stats_columns=["o_orderkey"],
        )

        def _md5s():
            return {
                str(f): hashlib.md5(f.read_bytes()).hexdigest()
                for f in sorted(Path(root, "data").rglob("*.parquet"))
            }

        before = _md5s()
        vt.rename_column(root, "o_custkey", "customer_id")
        vt.rename_column(root, "price_cents", "amount_cents")
        if _md5s() != before:
            raise AssertionError("rename moved data bytes")
        got = vt.read_version(spark, root)
        if got.columns != ["o_orderkey", "customer_id", "amount_cents"]:
            raise AssertionError(f"mapping not projected: {got.columns}")
        # mutate under the NEW names (predicates + incoming frames)
        vt.delete_where_pruned(
            spark, root, [("o_orderkey", "between", (_RN_DEL_LO, _RN_DEL_HI))]
        )
        ups = orders.filter(F.col("o_orderkey") == _RN_UP).select(
            "o_orderkey",
            F.col("o_custkey").alias("customer_id"),
            (F.col("price_cents") + F.lit(555)).alias("amount_cents"),
        )
        vt.upsert_pruned(spark, root, ups, ["o_orderkey"])
        out = (
            vt.read_version(spark, root)
            .groupBy((F.col("customer_id") % 10).alias("bucket"))
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.max("o_orderkey").alias("max_key"),
                F.sum("amount_cents").alias("total_cents"),
            )
            .orderBy("bucket")
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


_RN_DEL_LO, _RN_DEL_HI = 400, 600
_RN_UP = 7


def table_drop_read(spark, sf):
    """Column DROP via column mapping (r9,
    ``sources/versioned.py::drop_column`` — the Delta DROP COLUMN
    shape): a metadata-only commit retires the column from the schema;
    pre-drop data files keep the physical bytes (time travel below the
    drop still reads them), and the retired physical name may never be
    re-used by a later widening (resurrection hazard — the query
    asserts the refusal).

    The table is built with an extra ``clerk_len`` column (priority-string length), the column
    is dropped (the query RAISES if any data file changes — a drop
    must move zero data bytes), a band is deleted under the reduced
    schema, and the final read aggregates the surviving rows. The
    dropped column's pre-drop values are still recovered by TIME
    TRAVEL below the drop and folded into the output as a constant
    column, so both sides of the drop boundary are value-checked
    against the oracle.
    """
    import hashlib
    import shutil
    import tempfile
    from pathlib import Path

    from dataset_dedupe_estimator_spark.sources import versioned as vt

    orders = load(spark, sf, "orders").select(
        "o_orderkey", "o_custkey",
        cents("o_totalprice").alias("price_cents"),
        F.length("o_orderpriority").cast("long").alias("clerk_len"),
    )
    root = tempfile.mkdtemp(prefix="dde_drop_")
    try:
        vt.append(
            root, orders.repartitionByRange(4, "o_orderkey"),
            stats_columns=["o_orderkey"],
        )

        def _md5s():
            return {
                str(f): hashlib.md5(f.read_bytes()).hexdigest()
                for f in sorted(Path(root, "data").rglob("*.parquet"))
            }

        before = _md5s()
        vt.drop_column(root, "clerk_len")
        if _md5s() != before:
            raise AssertionError("drop moved data bytes")
        got = vt.read_version(spark, root)
        if got.columns != ["o_orderkey", "o_custkey", "price_cents"]:
            raise AssertionError(f"drop not projected: {got.columns}")
        # the retired physical name may never return
        try:
            vt.append(
                root,
                orders.limit(1),
                allow_new_columns=True,
            )
            raise AssertionError("retired column name was re-admitted")
        except ValueError:
            pass
        # mutate under the reduced schema
        vt.delete_where_pruned(
            spark, root, [("o_orderkey", "between", (_DC_DEL_LO, _DC_DEL_HI))]
        )
        # time travel BELOW the drop still reads the column
        v0 = vt.read_version(spark, root, 0)
        if "clerk_len" not in v0.columns:
            raise AssertionError("time travel lost the dropped column")
        junk_total = v0.agg(
            F.sum("clerk_len").cast("long").alias("s")
        ).collect()[0]["s"]
        out = (
            vt.read_version(spark, root)
            .groupBy((F.col("o_custkey") % 10).alias("bucket"))
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.max("o_orderkey").alias("max_key"),
                F.sum("price_cents").alias("total_cents"),
            )
            .withColumn("v0_clerk_len_total", F.lit(junk_total).cast("long"))
            .orderBy("bucket")
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


_DC_DEL_LO, _DC_DEL_HI = 700, 900


def table_clone_read(spark, sf):
    """Zero-copy CLONE (r9, ``sources/versioned.py::clone_table`` —
    the Delta SHALLOW CLONE use case via hard links, immune to source
    vacuum): the resolved state (masks folded in, deletion vectors
    re-keyed) materializes into a fresh independent log with zero data
    bytes moved.

    A versioned orders table takes a copy-on-write band delete (file
    masks) and a merge-on-read band delete (a DV sidecar), is CLONED —
    the query RAISES if any file was physically copied — and then the
    SOURCE takes a further delete. The clone must still read the
    at-clone state (both delete mechanisms honored, the post-clone
    delete invisible), and the source's current row count rides along
    as a constant column so divergence in either direction
    hash-mismatches against the oracle.
    """
    import shutil
    import tempfile

    from dataset_dedupe_estimator_spark.sources import versioned as vt

    orders = load(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", cents("o_totalprice").alias("price_cents")
    )
    root = tempfile.mkdtemp(prefix="dde_clsrc_")
    root2 = tempfile.mkdtemp(prefix="dde_cldst_") + "/t"
    try:
        vt.append(
            root, orders.repartitionByRange(4, "o_orderkey"),
            stats_columns=["o_orderkey"],
        )
        vt.delete_where_pruned(
            spark, root, [("o_orderkey", "between", (_CL_MASK_LO, _CL_MASK_HI))]
        )
        vt.delete_where_dv(
            spark, root, [("o_orderkey", "between", (_CL_DV_LO, _CL_DV_HI))]
        )
        st = vt.clone_table(root, root2)
        if st["copied_files"] or not st["linked_files"]:
            raise AssertionError(f"clone moved data bytes: {st}")
        # the source moves on; the clone must not
        vt.delete_where_pruned(
            spark, root, [("o_orderkey", "between", (_CL_POST_LO, _CL_POST_HI))]
        )
        src_n = vt.read_version(spark, root).count()
        out = (
            vt.read_version(spark, root2)
            .groupBy((F.col("o_custkey") % 10).alias("bucket"))
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.max("o_orderkey").alias("max_key"),
                F.sum("price_cents").alias("total_cents"),
            )
            .withColumn("src_n_after", F.lit(src_n).cast("long"))
            .orderBy("bucket")
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)
        shutil.rmtree(root2, ignore_errors=True)


_CL_MASK_LO, _CL_MASK_HI = 300, 500    # copy-on-write delete (masks)
_CL_DV_LO, _CL_DV_HI = 600, 650        # merge-on-read delete (DV)
_CL_POST_LO, _CL_POST_HI = 2000, 2200  # lands AFTER the clone


def table_partition_evolution_read(spark, sf):
    """Partition evolution (r9, ``sources/versioned.py::
    set_partitioning`` — the Iceberg shape, which Delta lacks): a
    metadata-only property commit changes the layout FUTURE commits
    write; readers resolve layout PER DIRECTORY, so the mixed-layout
    live set reads and mutates without any rewrite.

    Odd-key orders land UNPARTITIONED, the table then declares
    hive partitioning by order status (the query RAISES if the
    property commit moves data bytes, if the new commit directory
    lacks hive dirs, or if the old one has them), even-key orders land
    PARTITIONED, a band delete crosses both layouts, and the final
    aggregate groups by the partition column itself — so a partition
    value lost or misread on either side of the evolution boundary
    hash-mismatches against the oracle.
    """
    import hashlib
    import shutil
    import tempfile
    from pathlib import Path

    from dataset_dedupe_estimator_spark.sources import versioned as vt

    orders = load(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus",
        cents("o_totalprice").alias("price_cents"),
    )
    root = tempfile.mkdtemp(prefix="dde_pev_")
    try:
        vt.append(
            root,
            orders.filter(F.col("o_orderkey") % 2 == 1)
            .repartitionByRange(4, "o_orderkey"),
            stats_columns=["o_orderkey"],
        )

        def _md5s():
            return {
                str(f): hashlib.md5(f.read_bytes()).hexdigest()
                for f in sorted(Path(root, "data").rglob("*.parquet"))
            }

        before = _md5s()
        vt.set_partitioning(root, ["o_orderstatus"])
        if _md5s() != before:
            raise AssertionError("partition evolution moved data bytes")
        vt.append(
            root, orders.filter(F.col("o_orderkey") % 2 == 0)
        )
        dirs = sorted(p.name for p in Path(root, "data").iterdir())
        if list(Path(root, "data", dirs[0]).glob("o_orderstatus=*")):
            raise AssertionError("old dir gained hive layout")
        if not list(Path(root, "data", dirs[-1]).glob("o_orderstatus=*")):
            raise AssertionError("new dir is not hive-partitioned")
        # a delete spanning both layouts
        vt.delete_where_pruned(
            spark, root, [("o_orderkey", "between", (_PE_DEL_LO, _PE_DEL_HI))]
        )
        out = (
            vt.read_version(spark, root)
            .groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.max("o_orderkey").alias("max_key"),
                F.sum("price_cents").alias("total_cents"),
            )
            .orderBy("o_orderstatus")
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


_PE_DEL_LO, _PE_DEL_HI = 1500, 1800


TABLE_PARTITION_EVOLUTION_READ_SQL = f"""
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       MAX(o_orderkey) AS max_key,
       CAST(SUM({sql_cents('o_totalprice')}) AS BIGINT) AS total_cents
FROM orders
WHERE o_orderkey NOT BETWEEN {_PE_DEL_LO} AND {_PE_DEL_HI}
GROUP BY 1 ORDER BY o_orderstatus
"""


TABLE_CLONE_READ_SQL = f"""
SELECT o_custkey % 10 AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       MAX(o_orderkey) AS max_key,
       CAST(SUM({sql_cents('o_totalprice')}) AS BIGINT) AS total_cents,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
        WHERE o_orderkey NOT BETWEEN {_CL_MASK_LO} AND {_CL_MASK_HI}
          AND o_orderkey NOT BETWEEN {_CL_DV_LO} AND {_CL_DV_HI}
          AND o_orderkey NOT BETWEEN {_CL_POST_LO} AND {_CL_POST_HI})
           AS src_n_after
FROM orders
WHERE o_orderkey NOT BETWEEN {_CL_MASK_LO} AND {_CL_MASK_HI}
  AND o_orderkey NOT BETWEEN {_CL_DV_LO} AND {_CL_DV_HI}
GROUP BY 1 ORDER BY bucket
"""


TABLE_DROP_READ_SQL = f"""
SELECT o_custkey % 10 AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       MAX(o_orderkey) AS max_key,
       CAST(SUM({sql_cents('o_totalprice')}) AS BIGINT) AS total_cents,
       (SELECT CAST(SUM(LENGTH(o_orderpriority)) AS BIGINT) FROM orders)
           AS v0_clerk_len_total
FROM orders
WHERE o_orderkey NOT BETWEEN {_DC_DEL_LO} AND {_DC_DEL_HI}
GROUP BY 1 ORDER BY bucket
"""


TABLE_RENAME_READ_SQL = f"""
SELECT o_custkey % 10 AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       MAX(o_orderkey) AS max_key,
       CAST(SUM(amount_cents) AS BIGINT) AS total_cents
FROM (
    SELECT o_custkey, o_orderkey,
           CASE WHEN o_orderkey = {_RN_UP}
                THEN {sql_cents('o_totalprice')} + 555
                ELSE {sql_cents('o_totalprice')} END AS amount_cents
    FROM orders
    WHERE o_orderkey NOT BETWEEN {_RN_DEL_LO} AND {_RN_DEL_HI}
)
GROUP BY 1 ORDER BY bucket
"""


# change-feed bands for table_cdf_read — inside every SF's key range
_CF_UP_LO, _CF_UP_HI = 1000, 1200   # upsert-replaced band (price bumped)
_CF_INS_HI = 1050                   # [1000, 1050] also insert at key + 10M


def table_cdf_read(spark, sf):
    """At-rest change data feed (``sources/versioned.py::
    read_change_feed`` — the Delta CDF shape; O(changed rows), never a
    snapshot diff).

    Builds a change-feed-enabled versioned table from orders (two
    appends), DELETEs one band, then MERGEs another (replacements +
    shifted inserts) — the delete and the upsert each write a
    change-data file at commit time. The feed over the whole history is
    then aggregated per (_change, _commit_version). The oracle
    reconstructs every change from orders directly (inserts per append
    parity, the deleted band at original prices, the upsert as its
    delete+insert pairs), so a feed that missed a change, re-stated an
    unchanged row, or stamped the wrong commit hash-mismatches. Eager
    by construction; result localCheckpointed before the temp table
    vanishes.
    """
    import shutil
    import tempfile

    from dataset_dedupe_estimator_spark.sources import versioned as vt

    orders = load(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", cents("o_totalprice").alias("price_cents")
    )
    root = tempfile.mkdtemp(prefix="dde_cf_")
    try:
        vt.append(
            root,
            orders.filter(F.col("o_orderkey") % 2 == 0)
            .repartitionByRange(4, "o_orderkey"),
            stats_columns=["o_orderkey"], change_feed=True,
        )
        vt.append(root, orders.filter(F.col("o_orderkey") % 2 == 1))
        vt.delete_where_pruned(
            spark, root, [("o_orderkey", "between", (_DW_LO, _DW_HI))]
        )
        band = orders.filter(
            F.col("o_orderkey").between(_CF_UP_LO, _CF_UP_HI)
        )
        updates = band.withColumn(
            "price_cents", F.col("price_cents") + F.lit(1000)
        ).unionByName(
            band.filter(F.col("o_orderkey") <= _CF_INS_HI).select(
                (F.col("o_orderkey") + F.lit(_INS_SHIFT)).alias("o_orderkey"),
                "o_custkey",
                F.col("o_orderkey").cast("long").alias("price_cents"),
            )
        )
        vt.upsert_pruned(spark, root, updates, ["o_orderkey"])
        feed = vt.read_change_feed(spark, root, -1)
        out = (
            feed.groupBy(
                F.col("_change").alias("change"),
                F.col("_commit_version").alias("commit_version"),
            )
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.min("o_orderkey").alias("min_key"),
                F.max("o_orderkey").alias("max_key"),
                F.sum("price_cents").alias("total_cents"),
            )
            .orderBy("change", "commit_version")
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


TABLE_CDF_READ_SQL = f"""
WITH changes AS (
    SELECT o_orderkey, {sql_cents('o_totalprice')} AS price_cents,
           'insert' AS change, o_orderkey % 2 AS commit_version
    FROM orders
    UNION ALL
    SELECT o_orderkey, {sql_cents('o_totalprice')}, 'delete', 2
    FROM orders WHERE o_orderkey BETWEEN {_DW_LO} AND {_DW_HI}
    UNION ALL
    SELECT o_orderkey, {sql_cents('o_totalprice')}, 'delete', 3
    FROM orders WHERE o_orderkey BETWEEN {_CF_UP_LO} AND {_CF_UP_HI}
    UNION ALL
    SELECT o_orderkey, {sql_cents('o_totalprice')} + 1000, 'insert', 3
    FROM orders WHERE o_orderkey BETWEEN {_CF_UP_LO} AND {_CF_UP_HI}
    UNION ALL
    SELECT o_orderkey + {_INS_SHIFT}, o_orderkey, 'insert', 3
    FROM orders WHERE o_orderkey BETWEEN {_CF_UP_LO} AND {_CF_INS_HI}
)
SELECT change, CAST(commit_version AS BIGINT) AS commit_version,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       MIN(o_orderkey) AS min_key,
       MAX(o_orderkey) AS max_key,
       CAST(SUM(price_cents) AS BIGINT) AS total_cents
FROM changes GROUP BY 1, 2 ORDER BY 1, 2
"""


def table_compact_read(spark, sf):
    """Small-file compaction with dataChange=false
    (``sources/versioned.py::compact_small`` — the Delta OPTIMIZE
    shape) layered over a pruned DELETE.

    Builds a versioned table from orders in FOUR small range-
    partitioned commits, deletes an o_orderkey band (masking files),
    then folds the small surviving files into right-sized outputs —
    the compaction must carry the delete's effect (masked rows stay
    gone) while changing no live row. The oracle aggregates orders
    with the band excluded, so a compaction that resurrected a masked
    row, dropped a live one, or double-folded a file hash-mismatches.
    Eager by construction; result localCheckpointed before the temp
    table vanishes.
    """
    import shutil
    import tempfile

    from dataset_dedupe_estimator_spark.sources import versioned as vt

    orders = load(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", cents("o_totalprice").alias("price_cents")
    )
    root = tempfile.mkdtemp(prefix="dde_cs_")
    try:
        for m in range(4):
            vt.append(
                root,
                orders.filter(F.col("o_orderkey") % 4 == m)
                .repartitionByRange(2, "o_orderkey"),
                stats_columns=["o_orderkey"] if m == 0 else None,
            )
        vt.delete_where_pruned(
            spark, root, [("o_orderkey", "between", (_DW_LO, _DW_HI))]
        )
        st = vt.compact_small(spark, root)
        assert st["committed"], "fixture guarantees >=2 small files"
        got = vt.read_version(spark, root)
        out = (
            got.groupBy((F.col("o_custkey") % 10).alias("bucket"))
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.min("o_orderkey").alias("min_key"),
                F.max("o_orderkey").alias("max_key"),
                F.sum("price_cents").alias("total_cents"),
            )
            .orderBy("bucket")
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


# same post-state as table_delete_where: compaction must not change rows
TABLE_COMPACT_READ_SQL = TABLE_DELETE_WHERE_SQL


def table_stream_read(spark, sf):
    """Versioned table as a Structured Streaming SOURCE
    (``sources/table_stream.py`` — Spark 4 Python DataSource API;
    offsets are commit versions, one input partition per data file,
    exactly-once from the checkpointed offset alone).

    Builds a versioned table from orders in two append commits, drains
    the stream (availableNow) into a parquet sink, appends a THIRD
    commit, and drains again with the SAME checkpoint — the second
    drain must emit exactly the unseen commit: a source that replayed
    an already-consumed version (dupes) or skipped one (gaps) breaks
    the aggregate. The oracle aggregates orders directly, so the sink
    must hold every order exactly once across the two incremental
    drains. Eager by construction; result localCheckpointed before the
    temp dirs vanish.
    """
    import shutil
    import tempfile

    from dataset_dedupe_estimator_spark.sources import versioned as vt
    from dataset_dedupe_estimator_spark.sources.table_stream import (
        VersionedTableStreamSource,
    )

    spark.dataSource.register(VersionedTableStreamSource)
    orders = load(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", cents("o_totalprice").alias("price_cents")
    )
    work = tempfile.mkdtemp(prefix="dde_ts_")
    root, ckpt, sink = f"{work}/tbl", f"{work}/ck", f"{work}/sink"

    def drain():
        q = (
            spark.readStream.format("versioned_table")
            .load(root)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise RuntimeError(
                "table_stream_read: availableNow drain did not finish"
            )

    try:
        vt.append(root, orders.filter(F.col("o_orderkey") % 3 == 0))
        vt.append(root, orders.filter(F.col("o_orderkey") % 3 == 1))
        drain()
        vt.append(root, orders.filter(F.col("o_orderkey") % 3 == 2))
        drain()  # same checkpoint: emits ONLY the third commit
        got = spark.read.parquet(sink)
        out = (
            got.groupBy((F.col("o_custkey") % 10).alias("bucket"))
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.min("o_orderkey").alias("min_key"),
                F.max("o_orderkey").alias("max_key"),
                F.sum("price_cents").alias("total_cents"),
            )
            .orderBy("bucket")
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


TABLE_STREAM_READ_SQL = f"""
SELECT o_custkey % 10 AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       MIN(o_orderkey) AS min_key,
       MAX(o_orderkey) AS max_key,
       CAST(SUM({sql_cents('o_totalprice')}) AS BIGINT) AS total_cents
FROM orders
GROUP BY 1 ORDER BY bucket
"""


def table_stream_sink_read(spark, sf):
    """Versioned table as a Structured Streaming SINK
    (``sources/table_sink.py`` — r12, the write half of the r9
    streaming source): ``writeStream.format("versioned_table")`` with
    EXACTLY-ONCE commits keyed by (queryId, batchId) in the table's
    commit log (the Delta txnAppId/txnVersion SetTransaction shape).

    Streams orders into a versioned table in two checkpointed
    availableNow drains (one microbatch commit each), then SIMULATES A
    CRASH: the checkpoint is cloned minus its newest commit marker —
    exactly the at-least-once window Spark leaves a sink in — and the
    query restarted, which re-runs the last microbatch with the same
    (queryId, batchId). The table's txn watermark must refuse the
    replay: the oracle aggregates orders directly, so a single
    duplicated row doubles a bucket's counts and hash-mismatches.
    Eager by construction; result localCheckpointed before the temp
    dirs vanish."""
    import glob
    import os
    import shutil
    import tempfile

    from dataset_dedupe_estimator_spark.sources import versioned as vt
    from dataset_dedupe_estimator_spark.sources.table_stream import (
        VersionedTableStreamSource,
    )

    spark.dataSource.register(VersionedTableStreamSource)
    orders = load(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", cents("o_totalprice").alias("price_cents")
    )
    work = tempfile.mkdtemp(prefix="dde_tsk_")
    src, root, ck = f"{work}/src", f"{work}/tbl", f"{work}/ck"

    def drain(ckpt):
        q = (
            spark.readStream.schema(
                "o_orderkey bigint, o_custkey bigint, price_cents bigint"
            )
            .parquet(src)
            .writeStream.format("versioned_table")
            .option("path", root)
            .option("checkpointLocation", ckpt)
            .option("statsColumns", "o_orderkey")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise RuntimeError(
                "table_stream_sink_read: availableNow drain did not finish"
            )

    try:
        orders.filter(F.col("o_orderkey") % 2 == 0).write.parquet(src)
        drain(ck)
        orders.filter(F.col("o_orderkey") % 2 == 1).write.mode(
            "append"
        ).parquet(src)
        drain(ck)  # same checkpoint: commits ONLY the second batch
        # crash-replay: restart from a checkpoint clone whose newest
        # commit marker is gone -> Spark re-runs that microbatch
        ck2 = f"{work}/ck_replay"
        shutil.copytree(ck, ck2)
        last = max(
            int(os.path.basename(p))
            for p in glob.glob(f"{ck2}/commits/[0-9]*")
        )
        os.remove(f"{ck2}/commits/{last}")
        for crc in glob.glob(f"{ck2}/commits/.{last}.crc"):
            os.remove(crc)
        drain(ck2)
        h = vt.history(root)
        if [e.get("txn", {}).get("batch") for e in h] != [0, 1]:
            raise AssertionError(
                "replayed microbatch must not produce a third commit: "
                f"{[(e['version'], e.get('txn')) for e in h]}"
            )
        got = vt.read_version(spark, root)
        out = (
            got.groupBy((F.col("o_custkey") % 10).alias("bucket"))
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.min("o_orderkey").alias("min_key"),
                F.max("o_orderkey").alias("max_key"),
                F.sum("price_cents").alias("total_cents"),
            )
            .orderBy("bucket")
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


# duplicates double a bucket's counts; gaps drop them — same oracle as
# the source-side gate: every order exactly once
TABLE_STREAM_SINK_READ_SQL = TABLE_STREAM_READ_SQL


def table_replicate_read(spark, sf):
    """Table-to-table streaming REPLICATION (r12): the r9 streaming
    SOURCE feeding the r12 streaming SINK —
    ``readStream.format("versioned_table").load(src)`` →
    ``writeStream.format("versioned_table").option("path", dst)`` —
    the full loop a real multi-region pipeline runs, exactly-once at
    BOTH ends (source offsets = checkpointed commit versions; sink
    commits keyed by (queryId, batchId) in the destination log).

    Orders land in the source table in two commits, replicate, a third
    commit lands, replicates incrementally with the same checkpoint —
    then the destination is read back and aggregated. A source that
    replayed a drained version, or a sink that double-committed a
    microbatch, doubles a bucket; a gap drops one. The oracle
    aggregates orders directly. Eager by construction; result
    localCheckpointed before the temp dirs vanish."""
    import shutil
    import tempfile

    from dataset_dedupe_estimator_spark.sources import versioned as vt
    from dataset_dedupe_estimator_spark.sources.table_stream import (
        VersionedTableStreamSource,
    )

    spark.dataSource.register(VersionedTableStreamSource)
    orders = load(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", cents("o_totalprice").alias("price_cents")
    )
    work = tempfile.mkdtemp(prefix="dde_trep_")
    src, dst, ck = f"{work}/src", f"{work}/dst", f"{work}/ck"

    def replicate():
        q = (
            spark.readStream.format("versioned_table")
            .load(src)
            .writeStream.format("versioned_table")
            .option("path", dst)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise RuntimeError(
                "table_replicate_read: availableNow drain did not finish"
            )

    try:
        vt.append(src, orders.filter(F.col("o_orderkey") % 3 == 0))
        vt.append(src, orders.filter(F.col("o_orderkey") % 3 == 1))
        replicate()
        vt.append(src, orders.filter(F.col("o_orderkey") % 3 == 2))
        replicate()  # same checkpoint: ships ONLY the third commit
        got = vt.read_version(spark, dst)
        out = (
            got.groupBy((F.col("o_custkey") % 10).alias("bucket"))
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.min("o_orderkey").alias("min_key"),
                F.max("o_orderkey").alias("max_key"),
                F.sum("price_cents").alias("total_cents"),
            )
            .orderBy("bucket")
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


# a replicated table must hold every source order exactly once
TABLE_REPLICATE_READ_SQL = TABLE_STREAM_READ_SQL


def table_cdc_apply_read(spark, sf):
    """Row-level CDC replication (r12, the Delta Live Tables APPLY
    CHANGES INTO shape): the change-feed STREAM of a mutating source
    table is applied to a destination table —
    ``readStream.option("readChangeFeed", "true")`` →
    ``foreachBatch(table_sink.apply_changes(dst, ["o_orderkey"]))`` —
    so deletes and updates replicate, not just appends, exactly-once
    across the two-phase (merge, delete) apply via one monotonic
    (queryId, 2*batchId / 2*batchId+1) watermark.

    Source recipe: orders land with the change feed on, replicate;
    then a pruned DELETE of one key band and an UPSERT price-bump of
    another land, and replicate INCREMENTALLY (same checkpoint). The
    destination must equal the source's final live rows: the oracle
    aggregates orders with the delete band excluded and the bump
    applied — a missed delete resurrects a bucket's rows, a missed
    update loses cents, a replayed batch doubles inserts. Eager by
    construction; result localCheckpointed before the temp dirs
    vanish."""
    import shutil
    import tempfile

    from dataset_dedupe_estimator_spark.sources import table_sink as tsk
    from dataset_dedupe_estimator_spark.sources import versioned as vt
    from dataset_dedupe_estimator_spark.sources.table_stream import (
        VersionedTableStreamSource,
    )

    spark.dataSource.register(VersionedTableStreamSource)
    orders = load(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", cents("o_totalprice").alias("price_cents")
    )
    work = tempfile.mkdtemp(prefix="dde_tca_")
    src, dst, ck = f"{work}/src", f"{work}/dst", f"{work}/ck"

    def drain():
        q = (
            spark.readStream.format("versioned_table")
            .option("readChangeFeed", "true")
            .load(src)
            .writeStream.foreachBatch(
                tsk.apply_changes(dst, ["o_orderkey"], checkpoint=ck)
            )
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise RuntimeError(
                "table_cdc_apply_read: availableNow drain did not finish"
            )

    try:
        vt.append(src, orders, change_feed=True,
                  stats_columns=["o_orderkey"])
        vt.append(dst, orders.limit(0), stats_columns=["o_orderkey"])
        drain()  # initial snapshot replicates as inserts
        vt.delete_where_pruned(
            spark, src, [("o_orderkey", "between", (_DW_LO, _DW_HI))]
        )
        bump = (
            vt.read_where(
                spark, src,
                [("o_orderkey", "between", (_CF_UP_LO, _CF_UP_HI))],
            )
            .withColumn("price_cents", F.col("price_cents") + 1000)
        )
        vt.upsert_pruned(spark, src, bump, ["o_orderkey"])
        drain()  # incremental: ships ONLY the delete + the bump
        got = vt.read_version(spark, dst)
        out = (
            got.groupBy((F.col("o_custkey") % 10).alias("bucket"))
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.min("o_orderkey").alias("min_key"),
                F.max("o_orderkey").alias("max_key"),
                F.sum("price_cents").alias("total_cents"),
            )
            .orderBy("bucket")
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def table_purge_read(spark, sf):
    """Verified PHYSICAL erasure (r12, ``sources/versioned.py::
    purge_where`` — the GDPR right-to-be-forgotten verb): delete →
    optimize → vacuum(keep 1) → a verification scan of EVERY parquet
    file still on disk (data + change-data) proving zero matching rows
    remain. The query RAISES unless verification passes and time
    travel below the purge is actually gone; the oracle aggregates
    orders minus the purged band, so an incomplete logical delete
    hash-mismatches while an incomplete PHYSICAL purge raises
    in-query. Eager by construction; result localCheckpointed before
    the temp dirs vanish."""
    import shutil
    import tempfile

    from dataset_dedupe_estimator_spark.sources import versioned as vt

    orders = load(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", cents("o_totalprice").alias("price_cents")
    )
    root = tempfile.mkdtemp(prefix="dde_purge_")
    try:
        for m in range(4):
            vt.append(
                root,
                orders.filter(F.col("o_orderkey") % 4 == m)
                .repartitionByRange(2, "o_orderkey"),
                stats_columns=["o_orderkey"] if m == 0 else None,
            )
        st = vt.purge_where(
            spark, root, [("o_orderkey", "between", (_DW_LO, _DW_HI))]
        )
        if not st["verified"] or st["purged_rows"] == 0:
            raise AssertionError(f"purge not verified: {st}")
        try:
            vt.read_version(spark, root, 0)
            raise AssertionError("pre-purge version 0 must be unreadable")
        except vt.VersionVacuumedError:
            pass  # labeled: entry retained, data verifiably gone
        got = vt.read_version(spark, root)
        out = (
            got.groupBy((F.col("o_custkey") % 10).alias("bucket"))
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.min("o_orderkey").alias("min_key"),
                F.max("o_orderkey").alias("max_key"),
                F.sum("price_cents").alias("total_cents"),
            )
            .orderBy("bucket")
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


# same post-state as table_delete_where: the band is gone — but here
# its BYTES are verifiably gone from disk too
TABLE_PURGE_READ_SQL = TABLE_DELETE_WHERE_SQL


TABLE_CDC_APPLY_READ_SQL = f"""
WITH live AS (
    SELECT o_orderkey, o_custkey,
           {sql_cents('o_totalprice')}
           + CASE WHEN o_orderkey BETWEEN {_CF_UP_LO} AND {_CF_UP_HI}
                  THEN 1000 ELSE 0 END AS price_cents
    FROM orders
    WHERE o_orderkey NOT BETWEEN {_DW_LO} AND {_DW_HI}
)
SELECT o_custkey % 10 AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       MIN(o_orderkey) AS min_key,
       MAX(o_orderkey) AS max_key,
       CAST(SUM(price_cents) AS BIGINT) AS total_cents
FROM live GROUP BY 1 ORDER BY bucket
"""


def table_type_widening_read(spark, sf):
    """Type widening on append (r10, ``sources/versioned.py::append``
    with ``allow_type_widening=True`` — the Delta type-widening
    feature's int->bigint / float->double promotions): the declared
    type widens, existing files stay in place, and every multi-file
    scan upcasts the old footers in the parquet reader.

    Even-key orders land at v0 with NARROW types (int key/cust/cents),
    odd-key orders land at v1 with BIGINT types under the widening
    flag. The query RAISES if a narrow append is still accepted
    afterwards (the declaration must have widened), if the full scan's
    dtypes are not the widened ones, or if time travel below the
    widening stops reading the narrow v0 dtype. A zone-map-pruned
    ``read_where`` across the mixed-width footers rides along as a
    constant column, so a wrong-count prune hash-mismatches the
    oracle."""
    import shutil
    import tempfile

    from dataset_dedupe_estimator_spark.sources import versioned as vt

    orders = load(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", cents("o_totalprice").alias("price_cents")
    )
    narrow = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        F.col("o_orderkey").cast("int").alias("o_orderkey"),
        F.col("o_custkey").cast("int").alias("o_custkey"),
        F.col("price_cents").cast("int").alias("price_cents"),
    )
    wide = orders.filter(F.col("o_orderkey") % 2 == 1).select(
        F.col("o_orderkey").cast("bigint").alias("o_orderkey"),
        F.col("o_custkey").cast("bigint").alias("o_custkey"),
        F.col("price_cents").cast("bigint").alias("price_cents"),
    )
    root = tempfile.mkdtemp(prefix="dde_twide_")
    try:
        vt.append(
            root, narrow.repartitionByRange(2, "o_orderkey"),
            stats_columns=["o_orderkey"],
        )
        vt.append(
            root, wide.repartitionByRange(2, "o_orderkey"),
            allow_type_widening=True,
        )
        # the declaration widened: a narrow append must now refuse
        try:
            vt.append(root, narrow.limit(1))
        except ValueError:
            pass
        else:
            raise AssertionError("narrow append accepted after widening")
        snap = vt.read_version(spark, root)
        if dict(snap.dtypes)["o_orderkey"] != "bigint":
            raise AssertionError(f"scan did not widen: {snap.dtypes}")
        v0 = vt.read_version(spark, root, 0)
        if dict(v0.dtypes)["o_orderkey"] != "int":
            raise AssertionError(
                f"time travel below the widening re-typed: {v0.dtypes}"
            )
        n_low = vt.read_where(
            spark, root, [("o_orderkey", "<=", _TW_LOW_KEY)]
        ).count()
        out = (
            snap.groupBy((F.col("o_custkey") % 10).alias("bucket"))
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.max("o_orderkey").alias("max_key"),
                F.sum("price_cents").alias("total_cents"),
            )
            .withColumn("n_low", F.lit(n_low).cast("long"))
            .orderBy("bucket")
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


_TW_LOW_KEY = 5_000  # read_where probe across mixed-width footers


def table_nested_read(spark, sf):
    """Nested fields in the versioned table layer (r10,
    ``sources/versioned.py`` path-based column mapping — the realistic
    subset of Delta's field-ID scheme; the reference's synthetic
    generator emits struct and list columns, de/synthetic.py:118-128):
    struct/array columns ingest and read as-is, ONE level of struct
    paths gets per-file zone maps and read_where pruning, and leaves
    rename as metadata-only commits.

    Documents ingest with a ``meta`` struct (length + source) and a
    ``tags`` list, range-laid-out on the NESTED length so a
    ``read_where`` on ``meta.length`` can prune files (the query
    RAISES if it prunes nothing, if the leaf rename moves data bytes,
    or if time travel below the rename stops showing the old leaf
    name). The final aggregate groups by the RENAMED leaf path; the
    nested-pruned count and the summed list sizes ride along, so a
    wrong prune, a broken rename projection, or a mangled list column
    all hash-mismatch the oracle."""
    import shutil
    import tempfile

    from dataset_dedupe_estimator_spark.sources import versioned as vt

    docs = load(spark, sf, "documents").select(
        "doc_id",
        F.struct(
            F.length("text").alias("length"),
            F.col("source").alias("src"),
        ).alias("meta"),
        F.array_repeat(
            F.col("source"), (F.col("doc_id") % 3).cast("int")
        ).alias("tags"),
    )
    root = tempfile.mkdtemp(prefix="dde_nest_")
    try:
        vt.append(
            root,
            docs.repartitionByRange(4, F.col("meta.length")),
            stats_columns=["meta.length"],
        )
        st = vt.rename_column(root, "meta.src", "meta.origin")
        if st.get("dir") is not None:
            raise AssertionError("leaf rename moved data bytes")
        v0 = vt.read_version(spark, root, 0)
        if "src" not in dict(v0.dtypes)["meta"]:
            raise AssertionError(
                f"time travel below the rename re-typed: {v0.dtypes}"
            )
        rep = vt.zone_map_prune(
            root, [("meta.length", "<=", _NEST_LEN_CUT)]
        )
        if not rep["skipped_files"]:
            raise AssertionError(
                f"nested zone maps pruned nothing: {rep}"
            )
        n_short = vt.read_where(
            spark, root, [("meta.length", "<=", _NEST_LEN_CUT)]
        ).count()
        snap = vt.read_version(spark, root)
        out = (
            snap.groupBy(F.col("meta.origin").alias("origin"))
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum(F.col("meta.length")).alias("sum_length"),
                F.sum(F.size("tags")).alias("sum_tags"),
            )
            .withColumn("n_short", F.lit(n_short).cast("long"))
            .orderBy("origin")
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


_NEST_LEN_CUT = 120  # nested zone-map probe on meta.length


def table_deep_nested_read(spark, sf):
    """ARBITRARY-DEPTH nested schema evolution (r11,
    ``sources/versioned.py`` recursive path mapping — the reference's
    synthetic schema recursion is unbounded, de/synthetic.py:118-128):
    a depth-2 struct-of-struct with a list-of-struct payload ingests
    as-is; the depth-2 path ``meta.inner.length`` gets per-file zone
    maps and pruned ``read_where``; a DEEP leaf rename
    (``meta.inner.src`` -> ``origin``) and an INTERMEDIATE struct
    rename (``meta.inner`` -> ``meta.core``) are both metadata-only
    and compose — pruning follows the twice-renamed logical path.

    The query RAISES if the depth-2 zone maps prune nothing, if either
    rename moves data bytes, or if time travel below the renames stops
    showing the original deep names. The final aggregate groups by the
    renamed deep leaf path; the deep-pruned count and the summed
    list-of-struct sizes ride along, so a wrong prune, a broken deep
    projection, or a mangled nested list all hash-mismatch the
    oracle."""
    import shutil
    import tempfile

    from dataset_dedupe_estimator_spark.sources import versioned as vt

    docs = load(spark, sf, "documents").select(
        "doc_id",
        F.struct(
            F.struct(
                F.length("text").alias("length"),
                F.col("source").alias("src"),
            ).alias("inner"),
            F.transform(
                F.sequence(
                    F.lit(0), (F.col("doc_id") % 2).cast("int")
                ),
                lambda i: F.struct((F.col("doc_id") + i).alias("v")),
            ).alias("items"),
        ).alias("meta"),
    )
    root = tempfile.mkdtemp(prefix="dde_deep_")
    try:
        vt.append(
            root,
            docs.repartitionByRange(4, F.col("meta.inner.length")),
            stats_columns=["meta.inner.length"],
        )
        st = vt.rename_column(root, "meta.inner.src", "meta.inner.origin")
        if st.get("dir") is not None:
            raise AssertionError("deep leaf rename moved data bytes")
        st2 = vt.rename_column(root, "meta.inner", "meta.core")
        if st2.get("dir") is not None:
            raise AssertionError("intermediate rename moved data bytes")
        v0 = vt.read_version(spark, root, 0)
        if "inner:struct<length:" not in dict(v0.dtypes)["meta"]:
            raise AssertionError(
                f"time travel below the renames re-typed: {v0.dtypes}"
            )
        rep = vt.zone_map_prune(
            root, [("meta.core.length", "<=", _NEST_LEN_CUT)]
        )
        if not rep["skipped_files"]:
            raise AssertionError(
                f"depth-2 zone maps pruned nothing: {rep}"
            )
        n_short = vt.read_where(
            spark, root, [("meta.core.length", "<=", _NEST_LEN_CUT)]
        ).count()
        snap = vt.read_version(spark, root)
        out = (
            snap.groupBy(F.col("meta.core.origin").alias("origin"))
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum(F.col("meta.core.length")).alias("sum_length"),
                F.sum(F.size(F.col("meta.items"))).alias("sum_items"),
            )
            .withColumn("n_short", F.lit(n_short).cast("long"))
            .orderBy("origin")
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


TABLE_DEEP_NESTED_READ_SQL = f"""
SELECT source AS origin,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(LENGTH(text)) AS BIGINT) AS sum_length,
       CAST(SUM(doc_id % 2 + 1) AS BIGINT) AS sum_items,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM documents
        WHERE LENGTH(text) <= {_NEST_LEN_CUT}) AS n_short
FROM documents
GROUP BY 1 ORDER BY origin
"""


def table_archive_read(spark, sf):
    """Bounded commit log (r10, ``sources/versioned.py::archive_log``):
    raw ``v*.json`` entries at or below the newest checkpoint bundle
    into ``archive-v*.parquet`` — the RAW entries, so full history
    stays exact — and the JSON file count stays at the tail length.

    Orders ingest as many small appends to build commit history, the
    log checkpoints and archives (the query RAISES if the raw-JSON
    count is not bounded by the post-checkpoint tail, if any history
    entry goes missing through the bundle, or if a snapshot read BELOW
    the archive floor stops returning its exact rows), then a band
    delete lands ON TOP of the archived log. The final aggregate reads
    the post-delete table; the below-floor row count and the bounded
    file count ride along as columns, so a lost archived entry or an
    unbounded log hash-mismatches the oracle."""
    import shutil
    import tempfile

    from dataset_dedupe_estimator_spark.sources import versioned as vt

    orders = load(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", cents("o_totalprice").alias("price_cents")
    )
    root = tempfile.mkdtemp(prefix="dde_arch_")
    try:
        # 25 appends of one key-band each: v0..v24 (checkpoint at v20)
        for i in range(25):
            vt.append(
                root,
                orders.filter(
                    (F.col("o_orderkey") % 25) == i
                ).repartition(1),
                stats_columns=["o_orderkey"],
            )
        st = vt.archive_log(root)
        if st["floor"] is None or not st["archived"]:
            raise AssertionError(f"archive did not run: {st}")
        njson = len(list((vt.Path(root) / vt._VLOG).glob("v*.json")))
        if njson > vt._CKPT_EVERY:
            raise AssertionError(f"log not bounded: {njson} raw JSONs")
        hist = vt.history(root)
        if [e["version"] for e in hist] != list(range(25)):
            raise AssertionError("history lost entries through the bundle")
        below = vt.read_version(spark, root, 0).count()
        # the table keeps moving on top of the archived log
        vt.delete_where_pruned(
            spark, root, [("o_orderkey", "between", (_AR_DEL_LO, _AR_DEL_HI))]
        )
        out = (
            vt.read_version(spark, root)
            .groupBy((F.col("o_custkey") % 10).alias("bucket"))
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.max("o_orderkey").alias("max_key"),
                F.sum("price_cents").alias("total_cents"),
            )
            .withColumn("below_floor_n", F.lit(below).cast("long"))
            .withColumn("raw_json_bounded", F.lit(njson).cast("long") <= 20)
            .orderBy("bucket")
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


_AR_DEL_LO, _AR_DEL_HI = 400, 900  # delete lands above the archive


TABLE_ARCHIVE_READ_SQL = f"""
SELECT o_custkey % 10 AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       MAX(o_orderkey) AS max_key,
       CAST(SUM({sql_cents('o_totalprice')}) AS BIGINT) AS total_cents,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
        WHERE o_orderkey % 25 = 0) AS below_floor_n,
       TRUE AS raw_json_bounded
FROM orders
WHERE o_orderkey NOT BETWEEN {_AR_DEL_LO} AND {_AR_DEL_HI}
GROUP BY 1 ORDER BY bucket
"""


TABLE_NESTED_READ_SQL = f"""
SELECT source AS origin,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(LENGTH(text)) AS BIGINT) AS sum_length,
       CAST(SUM(doc_id % 3) AS BIGINT) AS sum_tags,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM documents
        WHERE LENGTH(text) <= {_NEST_LEN_CUT}) AS n_short
FROM documents
GROUP BY 1 ORDER BY origin
"""


TABLE_TYPE_WIDENING_READ_SQL = f"""
SELECT o_custkey % 10 AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(MAX(o_orderkey) AS BIGINT) AS max_key,
       CAST(SUM({sql_cents('o_totalprice')}) AS BIGINT) AS total_cents,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
        WHERE o_orderkey <= {_TW_LOW_KEY}) AS n_low
FROM orders
GROUP BY 1 ORDER BY bucket
"""


QUERIES = {
    "mv_incremental_orders": Q(mv_incremental_orders, MV_INCREMENTAL_ORDERS_SQL),
    "table_type_widening_read": Q(
        table_type_widening_read, TABLE_TYPE_WIDENING_READ_SQL
    ),
    "table_nested_read": Q(table_nested_read, TABLE_NESTED_READ_SQL),
    "table_deep_nested_read": Q(
        table_deep_nested_read, TABLE_DEEP_NESTED_READ_SQL
    ),
    "table_archive_read": Q(table_archive_read, TABLE_ARCHIVE_READ_SQL),
    "table_delete_where": Q(table_delete_where, TABLE_DELETE_WHERE_SQL),
    "table_update_read": Q(table_update_read, TABLE_UPDATE_READ_SQL),
    "table_replace_where_read": Q(
        table_replace_where_read, TABLE_REPLACE_WHERE_READ_SQL
    ),
    "table_analyze_read": Q(table_analyze_read, TABLE_ANALYZE_READ_SQL),
    "table_dv_update_read": Q(table_dv_update_read, TABLE_DV_UPDATE_READ_SQL),
    "table_upsert_merge": Q(table_upsert_merge, TABLE_UPSERT_MERGE_SQL),
    "table_stream_read": Q(table_stream_read, TABLE_STREAM_READ_SQL),
    "table_stream_sink_read": Q(
        table_stream_sink_read, TABLE_STREAM_SINK_READ_SQL
    ),
    "table_replicate_read": Q(table_replicate_read, TABLE_REPLICATE_READ_SQL),
    "table_cdc_apply_read": Q(table_cdc_apply_read, TABLE_CDC_APPLY_READ_SQL),
    "table_purge_read": Q(table_purge_read, TABLE_PURGE_READ_SQL),
    "table_compact_read": Q(table_compact_read, TABLE_COMPACT_READ_SQL),
    "table_cdf_read": Q(table_cdf_read, TABLE_CDF_READ_SQL),
    "table_bloom_read": Q(table_bloom_read, TABLE_BLOOM_READ_SQL),
    "table_checkpoint_read": Q(
        table_checkpoint_read, TABLE_CHECKPOINT_READ_SQL
    ),
    "table_restore_read": Q(table_restore_read, TABLE_RESTORE_READ_SQL),
    "table_dv_delete_read": Q(table_dv_delete_read, TABLE_DV_DELETE_READ_SQL),
    "table_concurrent_append_read": Q(
        table_concurrent_append_read, TABLE_CONCURRENT_APPEND_READ_SQL
    ),
    "table_rename_read": Q(table_rename_read, TABLE_RENAME_READ_SQL),
    "table_drop_read": Q(table_drop_read, TABLE_DROP_READ_SQL),
    "table_clone_read": Q(table_clone_read, TABLE_CLONE_READ_SQL),
    "table_partition_evolution_read": Q(
        table_partition_evolution_read, TABLE_PARTITION_EVOLUTION_READ_SQL
    ),
    "table_zonemap_read": Q(table_zonemap_read, TABLE_ZONEMAP_READ_SQL),
    "mv_from_version_diff": Q(mv_from_version_diff, MV_FROM_VERSION_DIFF_SQL),
    "streaming_mv_refresh": Q(streaming_mv_refresh, STREAMING_MV_REFRESH_SQL),
    "table_time_travel": Q(table_time_travel, TABLE_TIME_TRAVEL_SQL),
    "snapshot_diff_docs": Q(snapshot_diff_docs, SNAPSHOT_DIFF_DOCS_SQL),
    "zorder_layout": Q(zorder_layout, ZORDER_LAYOUT_SQL),
}
