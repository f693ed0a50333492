"""At-size stress for the events operator family: synthesize N million
events (deterministic from the row id — no driver-side data generation)
and run the four window-family operators the registry ships, checking
their structural invariants at a scale the sf0.1 gate never reaches:

* sessionize  — cumulative-gap sessions per user
* burst dedup — keep-first collapse of sub-5-min chains per (user, type)
* attribution — last-touch click->purchase within 1 h (LOCF window)
* gap-fill    — dense (hour x type) spine from ONE fact scan

All four are one-shuffle window/aggregate shapes; wall time should
track the event count, never the user count or the time span.

Usage: python tools/stress_events.py [n_rows_millions]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TYPES = ["view", "click", "purchase", "signup", "error"]


def main() -> int:
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from dataset_dedupe_estimator_spark import get_spark

    n_m = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    n = n_m * 1_000_000
    n_users = 100_000
    spark = get_spark(app_name="dde-stress-events", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    # deterministic synthetic stream: ~30 days, md5-scattered users/types
    h = F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 8), 16, 10).cast(
        "long"
    )
    ev = (
        spark.range(n, numPartitions=64)
        .select(
            F.col("id").alias("event_id"),
            (h % n_users).alias("user_id"),
            F.element_at(
                F.array(*[F.lit(t) for t in TYPES]), ((h / F.lit(n_users)).cast("long") % 5 + 1).cast("int")
            ).alias("event_type"),
            F.timestamp_micros(
                F.lit(1704067200000000)  # 2024-01-01 UTC
                + (h % F.lit(30 * 86400)) * F.lit(1_000_000)  # md5-uniform seconds
            ).alias("ts"),
        )
        .persist()
    )
    n_actual = ev.count()  # materialize once; operators below re-use the cache
    ok = True

    # 1. sessionize (30-min gap)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_us = F.unix_micros(F.col("ts"))
    gap = ts_us - F.lag(ts_us).over(w)
    t0 = time.perf_counter()
    sessions = (
        ev.withColumn(
            "is_new", F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0)
        )
        .withColumn(
            "sess",
            F.sum("is_new").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy("user_id", "sess")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    n_sessions, n_ev_in_sessions = sessions.agg(
        F.count(F.lit(1)), F.sum("n")
    ).collect()[0]
    t_sess = time.perf_counter() - t0
    print(f"sessionize: {n_sessions} sessions over {n_actual} events wall={t_sess:.1f}s")
    if n_ev_in_sessions != n_actual:
        ok = False
        print("FAIL: sessionize lost/duplicated events")

    # 2. burst dedup (5-min horizon per user+type)
    wb = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    prev = F.lag(ts_us).over(wb)
    t0 = time.perf_counter()
    bursts = (
        ev.withColumn(
            "nb",
            (prev.isNull() | ((ts_us - prev) >= 300 * 1_000_000)).cast("long"),
        )
        .withColumn(
            "burst",
            F.sum("nb").over(
                wb.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy("user_id", "event_type", "burst")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    n_bursts, n_in_bursts = bursts.agg(F.count(F.lit(1)), F.sum("n")).collect()[0]
    t_burst = time.perf_counter() - t0
    print(
        f"burst dedup: {n_actual} events -> {n_bursts} keepers "
        f"({n_actual - n_bursts} collapsed) wall={t_burst:.1f}s"
    )
    if n_in_bursts != n_actual or n_bursts > n_actual:
        ok = False
        print("FAIL: burst accounting broken")

    # 3. last-touch attribution (1-h horizon)
    sub = ev.filter(F.col("event_type").isin("click", "purchase"))
    wa = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    click_ts = F.when(F.col("event_type") == "click", ts_us)
    t0 = time.perf_counter()
    attributed = (
        sub.withColumn("c_us", F.last(click_ts, ignorenulls=True).over(wa))
        .filter(
            (F.col("event_type") == "purchase")
            & F.col("c_us").isNotNull()
            & (ts_us - F.col("c_us") <= 3600 * 1_000_000)
        )
        .count()
    )
    n_purch = sub.filter(F.col("event_type") == "purchase").count()
    t_attr = time.perf_counter() - t0
    print(
        f"attribution: {attributed}/{n_purch} purchases credited "
        f"wall={t_attr:.1f}s"
    )
    if not 0 < attributed <= n_purch:
        ok = False
        print("FAIL: attribution count out of range")

    # 4. gap-fill spine (dense hour x type grid, one fact scan)
    t0 = time.perf_counter()
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n")).persist()
    b = hourly.agg(F.min("hour").alias("h0"), F.max("hour").alias("h1"))
    spine = b.select(
        F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("hour")
    ).crossJoin(F.broadcast(hourly.select("event_type").distinct()))
    filled = spine.join(hourly, ["hour", "event_type"], "left")
    n_cells = filled.count()
    n_hours = spine.select("hour").distinct().count()
    t_gap = time.perf_counter() - t0
    print(f"gapfill: {n_cells} cells ({n_hours} hours x {len(TYPES)} types) wall={t_gap:.1f}s")
    if n_cells != n_hours * len(TYPES):
        ok = False
        print("FAIL: spine not dense")
    hourly.unpersist()
    ev.unpersist()

    print(
        f"stress_events: {'OK' if ok else 'FAIL'} n={n_actual} "
        f"sessionize={t_sess:.1f}s burst={t_burst:.1f}s "
        f"attribution={t_attr:.1f}s gapfill={t_gap:.1f}s"
    )
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
