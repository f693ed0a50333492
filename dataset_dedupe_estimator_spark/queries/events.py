"""Event-stream analytics over the ``events`` table: time bucketing,
JSON extraction, gap-based sessionization, distinct-user rollups.

The reference has no streaming/date operators (SURVEY §2.5 "Date/time fns:
absent"); these are the batch forms of the engine's stream extensions — the
same transforms run under Structured Streaming in
``dataset_dedupe_estimator_spark.streaming``.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dataset_dedupe_estimator_spark.operators.ranking import (
    type1_rank,
    with_global_cumsum,
)
from dataset_dedupe_estimator_spark.queries.base import Q, cents, load, sql_cents


def events_hourly(spark, sf):
    """Tumbling 1-hour windows per event type (batch form of a windowed
    streaming aggregation)."""
    ev = load(spark, sf, "events")
    n = F.count(F.lit(1))
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"), F.col("event_type")
        )
        .agg(
            n.alias("n_events"),
            (F.sum(cents("value")) / F.lit(100.0)).alias("sum_value"),
            (F.sum(cents("value")).cast("double") / n.cast("double") / F.lit(100.0)).alias(
                "avg_value"
            ),
        )
        .orderBy("hour", "event_type")
    )


EVENTS_HOURLY_SQL = f"""
WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events)
SELECT date_trunc('hour', ts) AS hour, event_type,
       COUNT(*) AS n_events,
       SUM({sql_cents("value")}) / 100.0 AS sum_value,
       CAST(SUM({sql_cents("value")}) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 100.0 AS avg_value
FROM ev GROUP BY 1, 2 ORDER BY hour, event_type
"""


def events_json_extract(spark, sf):
    """JSON scalar extraction from the ``props`` column (Map/JSON fns
    of SURVEY §2.5; reference only encodes JSON, de/formats.py:181-183)."""
    ev = load(spark, sf, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        ev.select(F.col("event_id"), F.col("event_type"), k.alias("k"))
        .filter(F.col("k") > 90)
        .orderBy("event_id")
    )


EVENTS_JSON_SQL = """
SELECT event_id, event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
FROM events
WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 90
ORDER BY event_id
"""


def events_sessionize(spark, sf):
    """Gap-based sessionization (30-min inactivity): lag + cumulative-sum
    session ids, then per-session rollup. Batch equivalent of
    session_window / applyInPandasWithState."""
    ev = load(spark, sf, "events")
    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ts reads as TIMESTAMP_NTZ; unix_micros requires an instant. Session
    # tz is pinned UTC by load(), so the cast is the naive-UTC epoch.
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = ts_us - F.lag(ts_us).over(by_user)
    is_new = F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0)
    sess = (
        ev.withColumn("is_new", is_new)
        .withColumn(
            "session_seq",
            F.sum("is_new").over(
                by_user.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    return (
        sess.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            (F.sum(cents("value")) / F.lit(100.0)).alias("session_value"),
        )
        .filter(F.col("n_events") >= 3)
        .orderBy("user_id", "session_seq")
    )


EVENTS_SESSIONIZE_SQL = f"""
WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
seq AS (
  SELECT *,
         CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800 * 1000000
              THEN 1 ELSE 0 END AS is_new
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT *, CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
  FROM seq
)
SELECT user_id, session_seq, COUNT(*) AS n_events,
       MIN(ts) AS session_start, MAX(ts) AS session_end,
       SUM({sql_cents("value")}) / 100.0 AS session_value
FROM sess
GROUP BY user_id, session_seq
HAVING COUNT(*) >= 3
ORDER BY user_id, session_seq
"""


def events_daily_users(spark, sf):
    """Per-day distinct users + event volume."""
    ev = load(spark, sf, "events")
    return (
        ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(
            F.countDistinct("user_id").alias("distinct_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("day")
    )


EVENTS_DAILY_SQL = f"""
WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events)
SELECT date_trunc('day', ts) AS day,
       COUNT(DISTINCT user_id) AS distinct_users,
       COUNT(*) AS n_events
FROM ev GROUP BY 1 ORDER BY day
"""


def events_funnel(spark, sf):
    """Ordered conversion funnel (view → click → purchase): users whose
    first click follows their first view, and first purchase follows that
    click. The sequential stage dependency is expressed as three STACKED
    conditional window minima over ONE user_id partition — each stage's
    threshold (a per-user constant from the previous window) gates the
    next MIN, so the whole funnel is one scan and one shuffle.
    (The join-chained alternative — stage tables v→c→p re-joined and
    re-counted — scanned events five times; AQE could not reuse the
    exchanges across the differently-pruned consumers.)

    100 TB shape: per-user state is three timestamps; the window
    operators share one hash partitioning; the final rollup is a scalar
    aggregate of user-cardinality rows; timestamps compare as naive
    values (no tz math)."""
    ev = load(spark, sf, "events").select("user_id", "event_type", "ts")
    w = Window.partitionBy("user_id")
    staged = (
        ev.withColumn(
            "t_view", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
        )
        .withColumn(
            "t_click",
            F.min(
                F.when(
                    (F.col("event_type") == "click") & (F.col("ts") > F.col("t_view")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "t_purchase",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") > F.col("t_click")),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    users = staged.groupBy("user_id").agg(
        F.max("t_view").alias("t_view"),
        F.max("t_click").alias("t_click"),
        F.max("t_purchase").alias("t_purchase"),
    )
    counts = users.agg(
        F.count("t_view").alias("n_view"),
        F.count("t_click").alias("n_click"),
        F.count("t_purchase").alias("n_purchase"),
    )
    return counts.select(
        "n_view",
        "n_click",
        "n_purchase",
        (F.col("n_click").cast("double") / F.col("n_view").cast("double")).alias(
            "view_to_click"
        ),
        (F.col("n_purchase").cast("double") / F.col("n_click").cast("double")).alias(
            "click_to_purchase"
        ),
    )


EVENTS_FUNNEL_SQL = """
WITH v AS (
  SELECT user_id, MIN(ts) AS t_view FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, MIN(e.ts) AS t_click
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.t_view
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, MIN(e.ts) AS t_purchase
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t_click
  GROUP BY e.user_id
)
SELECT (SELECT COUNT(*) FROM v) AS n_view,
       (SELECT COUNT(*) FROM c) AS n_click,
       (SELECT COUNT(*) FROM p) AS n_purchase,
       CAST((SELECT COUNT(*) FROM c) AS DOUBLE)
         / CAST((SELECT COUNT(*) FROM v) AS DOUBLE) AS view_to_click,
       CAST((SELECT COUNT(*) FROM p) AS DOUBLE)
         / CAST((SELECT COUNT(*) FROM c) AS DOUBLE) AS click_to_purchase
"""


def events_retention_cohorts(spark, sf):
    """Weekly retention cohorts: users grouped by first-seen day, counted
    as retained in week offsets 0–3 (distinct-user count per cohort ×
    offset). Day arithmetic on integer datediffs — timezone-independent
    and identical in both engines.

    100 TB shape: first-seen is a per-user window MIN on the one
    user_id shuffle (a separate first-seen aggregate joined back would
    scan events twice — the AQE exchange-reuse failure mode). The
    cohort size rides for free: every user is active in their own first
    week, so cohort_size == week-0 n_active, recovered by a window over
    the final cohort×offset aggregate instead of a third traversal."""
    ev = load(spark, sf, "events").select(
        "user_id", F.col("ts").cast("date").alias("day")
    )
    w_user = Window.partitionBy("user_id")
    act = ev.withColumn("cohort_day", F.min("day").over(w_user)).withColumn(
        "week_offset",
        (F.datediff(F.col("day"), F.col("cohort_day")) / 7).cast("long"),
    )
    base = (
        act.filter(F.col("week_offset").between(0, 3))
        .groupBy("cohort_day", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
    )
    w_cohort = Window.partitionBy("cohort_day")
    return (
        base.withColumn(
            "cohort_size",
            F.max(F.when(F.col("week_offset") == 0, F.col("n_active"))).over(w_cohort),
        )
        .select("cohort_day", "cohort_size", "week_offset", "n_active")
        .orderBy("cohort_day", "week_offset")
    )


EVENTS_RETENTION_SQL = """
WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
first AS (SELECT user_id, MIN(day) AS cohort_day FROM ev GROUP BY user_id),
act AS (
  SELECT e.user_id, f.cohort_day,
         CAST(date_diff('day', f.cohort_day, e.day) // 7 AS BIGINT) AS week_offset
  FROM ev e JOIN first f ON e.user_id = f.user_id
),
sizes AS (SELECT cohort_day, COUNT(*) AS cohort_size FROM first GROUP BY cohort_day)
SELECT a.cohort_day, s.cohort_size, a.week_offset,
       COUNT(DISTINCT a.user_id) AS n_active
FROM act a JOIN sizes s ON a.cohort_day = s.cohort_day
WHERE a.week_offset BETWEEN 0 AND 3
GROUP BY a.cohort_day, s.cohort_size, a.week_offset
ORDER BY a.cohort_day, a.week_offset
"""



def events_daily_anomaly(spark, sf):
    """Volume-anomaly flags per day: z-score of the daily event count
    against the whole series, computed from EXACT integer moments.

    groupBy sums of doubles are partition-order-dependent, so the mean
    and variance come from integer Σn and Σn² over the (tiny) per-day
    aggregate — bit-identical in any engine — and only the final
    mean/σ/z projection runs in floating point (one identical op
    sequence per engine). Days with z > 2 are flagged.

    Scale note: the unpartitioned moment window runs over one row per
    day — thousands of rows for years of data — never raw events."""
    ev = load(spark, sf, "events")
    daily = ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    w_all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    n_days = F.count(F.lit(1)).over(w_all)
    sum_n = F.sum("n_events").over(w_all)
    sum_n2 = F.sum(F.col("n_events") * F.col("n_events")).over(w_all)
    mean = sum_n.cast("double") / n_days.cast("double")
    var = sum_n2.cast("double") / n_days.cast("double") - mean * mean
    std = F.sqrt(F.greatest(var, F.lit(0.0)))
    z = F.when(std == 0.0, F.lit(0.0)).otherwise(
        (F.col("n_events").cast("double") - mean) / std
    )
    return (
        daily.select(
            "day",
            "n_events",
            F.round(z, 4).alias("z_score"),
            (z > 2.0).alias("is_anomaly"),
        )
        .orderBy("day")
    )


EVENTS_ANOMALY_SQL = """
WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
daily AS (
  SELECT date_trunc('day', ts) AS day, COUNT(*) AS n_events
  FROM ev GROUP BY 1
),
m AS (
  SELECT day, n_events,
         COUNT(*) OVER () AS n_days,
         SUM(n_events) OVER () AS sum_n,
         SUM(n_events * n_events) OVER () AS sum_n2
  FROM daily
),
zed AS (
  SELECT day, n_events,
         CASE WHEN sqrt(GREATEST(
                CAST(sum_n2 AS DOUBLE) / CAST(n_days AS DOUBLE)
                - (CAST(sum_n AS DOUBLE) / CAST(n_days AS DOUBLE))
                  * (CAST(sum_n AS DOUBLE) / CAST(n_days AS DOUBLE)), 0.0)) = 0.0
              THEN 0.0
              ELSE (CAST(n_events AS DOUBLE) - CAST(sum_n AS DOUBLE) / CAST(n_days AS DOUBLE))
                   / sqrt(GREATEST(
                       CAST(sum_n2 AS DOUBLE) / CAST(n_days AS DOUBLE)
                       - (CAST(sum_n AS DOUBLE) / CAST(n_days AS DOUBLE))
                         * (CAST(sum_n AS DOUBLE) / CAST(n_days AS DOUBLE)), 0.0))
         END AS z
  FROM m
)
SELECT day, n_events, ROUND(z, 4) AS z_score, z > 2.0 AS is_anomaly
FROM zed ORDER BY day
"""


def events_gapfill(spark, sf):
    """Gap-filled hourly resample: every (hour, event_type) cell of the
    observed time range, including empty hours, with ``is_gap`` flagging
    zero-event cells.

    Time-series pipelines (rate monitoring, anomaly windows, forecast
    features) need a dense spine — a plain ``GROUP BY hour`` silently
    drops empty buckets. The spine is built engine-side from one
    min/max aggregate via ``sequence()`` + ``explode`` (no driver loop,
    no Python range); its cross join with the distinct-type dim is
    O(hours x types) — trivially small next to the event scan, which
    stays a single shuffle for the hourly aggregate. Reference has no
    date/time operators at all (SURVEY §2.5)."""
    ev = load(spark, sf, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"), F.col("event_type")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.sum(cents("value")) / F.lit(100.0)).alias("sum_value"),
    )
    # bounds and the type dim derive from the persisted HOURLY AGGREGATE,
    # not the fact table: column pruning makes the consumers' subplans
    # differ, so exchange reuse alone can't deduplicate them — the
    # persist pins one fact scan for all three (at 100 TB the naive
    # form's three full fact scans are the whole query cost; the cached
    # aggregate is hours x types rows)
    hourly = hourly.persist()
    bounds = hourly.agg(F.min("hour").alias("h0"), F.max("hour").alias("h1"))
    spine_hours = bounds.select(
        F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("hour")
    )
    types = hourly.select("event_type").distinct()
    spine = spine_hours.crossJoin(F.broadcast(types))
    return (
        spine.join(F.broadcast(hourly), ["hour", "event_type"], "left")
        .select(
            "hour",
            "event_type",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.coalesce("sum_value", F.lit(0.0)).alias("sum_value"),
            (F.coalesce("n_events", F.lit(0)) == 0).alias("is_gap"),
        )
        .orderBy("hour", "event_type")
    )


EVENTS_GAPFILL_SQL = f"""
WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
hourly AS (
  SELECT date_trunc('hour', ts) AS hour, event_type,
         COUNT(*) AS n_events,
         SUM({sql_cents("value")}) / 100.0 AS sum_value
  FROM ev GROUP BY 1, 2
),
bounds AS (
  SELECT date_trunc('hour', MIN(ts)) AS h0, date_trunc('hour', MAX(ts)) AS h1
  FROM ev
),
spine_hours AS (
  SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour FROM bounds
),
spine AS (SELECT hour, event_type FROM spine_hours CROSS JOIN (SELECT DISTINCT event_type FROM ev))
SELECT s.hour, s.event_type,
       COALESCE(h.n_events, 0) AS n_events,
       COALESCE(h.sum_value, 0.0) AS sum_value,
       COALESCE(h.n_events, 0) = 0 AS is_gap
FROM spine s LEFT JOIN hourly h USING (hour, event_type)
ORDER BY hour, event_type
"""


ATTRIB_WINDOW_S = 3600  # last-touch attribution horizon


def events_attribution(spark, sf):
    """Last-touch attribution: each purchase credited to the same
    user's most recent strictly-earlier click within one hour.

    The carry-forward (LOCF) shape: one window per user ordered by
    event time, ``last(click, ignorenulls)`` over an
    unbounded-preceding/-1 frame — no self-join, no per-purchase scan
    of the click history, one shuffle on user_id. Gap is computed on
    floored microsecond deltas (cross-engine exact; DuckDB's
    date_diff counts boundary crossings instead)."""
    ev = load(spark, sf, "events")
    sub = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "event_id", "user_id", "ts", "event_type"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    click_ts = F.when(F.col("event_type") == "click", F.col("ts"))
    click_id = F.when(F.col("event_type") == "click", F.col("event_id"))
    attributed = (
        sub.withColumn("click_ts", F.last(click_ts, ignorenulls=True).over(w))
        .withColumn("click_id", F.last(click_id, ignorenulls=True).over(w))
        .filter((F.col("event_type") == "purchase") & F.col("click_id").isNotNull())
        .withColumn(
            # ts reads as TIMESTAMP_NTZ; unix_micros needs an instant —
            # session tz is pinned UTC by load(), so the cast is a
            # relabel, not a wall-clock shift
            "gap_s",
            (
                F.unix_micros(F.col("ts").cast("timestamp"))
                - F.unix_micros(F.col("click_ts").cast("timestamp"))
            )
            / F.lit(1_000_000),
        )
        .withColumn("gap_s", F.floor("gap_s").cast("long"))
        .filter(F.col("gap_s") <= ATTRIB_WINDOW_S)
    )
    return attributed.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("click_id").alias("attributed_click_id"),
        "gap_s",
    ).orderBy("purchase_id")


EVENTS_ATTRIBUTION_SQL = f"""
WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
sub AS (
  SELECT event_id, user_id, ts, event_type
  FROM ev WHERE event_type IN ('click', 'purchase')
),
carried AS (
  SELECT event_id, user_id, ts, event_type,
         last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
           OVER w AS click_ts,
         last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
           OVER w AS click_id
  FROM sub
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
SELECT event_id AS purchase_id, user_id, click_id AS attributed_click_id,
       (epoch_us(ts) - epoch_us(click_ts)) // 1000000 AS gap_s
FROM carried
WHERE event_type = 'purchase' AND click_id IS NOT NULL
  AND (epoch_us(ts) - epoch_us(click_ts)) // 1000000 <= {ATTRIB_WINDOW_S}
ORDER BY purchase_id
"""


BURST_GAP_S = 300  # retransmission horizon: bursts closer than this collapse


def events_dedup_burst(spark, sf):
    """Burst deduplication: within each (user, event_type), events less
    than BURST_GAP_S apart collapse to their first occurrence — the
    retransmission / double-click / at-least-once-delivery cleanup every
    event pipeline runs before analytics.

    Cumulative-gap sessions (not a lag-only filter): a lag filter would
    re-admit the third event of a tight burst whenever it sits > gap
    after the *dropped* second one but < gap after the kept first; the
    running SUM of new-burst flags assigns every event of a chain to its
    burst, and min-per-burst keeps exactly one. Same one-shuffle window
    shape as events_sessionize, keyed by (user_id, event_type)."""
    ev = load(spark, sf, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    prev_us = F.lag(ts_us).over(w)
    new_burst = (
        prev_us.isNull() | ((ts_us - prev_us) >= F.lit(BURST_GAP_S * 1_000_000))
    ).cast("long")
    bursts = ev.select(
        "event_id",
        "user_id",
        "event_type",
        "ts",
        F.sum(new_burst).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("burst_id"),
    )
    return (
        bursts.groupBy("user_id", "event_type", "burst_id")
        .agg(
            F.min_by("event_id", F.struct("ts", "event_id")).alias("keeper_event_id"),
            F.count(F.lit(1)).alias("n_collapsed"),
        )
        .select("user_id", "event_type", "burst_id", "keeper_event_id", "n_collapsed")
        .orderBy("user_id", "event_type", "burst_id")
    )


EVENTS_BURST_SQL = f"""
WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
flagged AS (
  SELECT event_id, user_id, event_type, ts,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= {BURST_GAP_S * 1_000_000}
              THEN 1 ELSE 0 END AS new_burst
  FROM ev
  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
),
bursts AS (
  SELECT *, CAST(SUM(new_burst) OVER (PARTITION BY user_id, event_type
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS burst_id
  FROM flagged
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY user_id, event_type, burst_id
                               ORDER BY ts, event_id) AS rn
  FROM bursts
)
SELECT user_id, event_type, burst_id,
       MAX(CASE WHEN rn = 1 THEN event_id END) AS keeper_event_id,
       COUNT(*) AS n_collapsed
FROM ranked
GROUP BY user_id, event_type, burst_id
ORDER BY user_id, event_type, burst_id
"""


RAU_WINDOW_DAYS = 7  # trailing window (inclusive of the current day)


def rolling_active_users(spark, sf):
    """Trailing {RAU_WINDOW_DAYS}-day distinct active users per day (rolling
    WAU) — the sliding-window COUNT(DISTINCT) no window frame can express
    (frames fold rows; distinctness needs set semantics across the frame).

    Plan: dedup to (user_id, day) pairs first (one exchange, tiny rows),
    then EXPLODE each pair into the {RAU_WINDOW_DAYS} trailing days it
    contributes to and count distinct users per contributed day — turning
    an O(days x corpus) self-join into an O({RAU_WINDOW_DAYS} x |pairs|)
    map-side fan-out plus one aggregation. Days with zero activity in the
    window never appear (right-censored spine matches the oracle). The
    fan-out factor is the window length, independent of corpus size —
    at 100 TB the pair dedup is the only full-data shuffle.
    """
    ev = load(spark, sf, "events")
    pairs = (
        ev.select("user_id", F.date_trunc("day", F.col("ts")).alias("day"))
        .distinct()
    )
    bounds = pairs.agg(F.max("day").alias("max_day"))
    # clamp the contribution spine INSIDE the sequence (least(day+6,
    # max_day)) rather than exploding 7x rows and filtering: the scalar
    # bound joins once per pair, out-of-range days are never generated
    contributed = pairs.crossJoin(F.broadcast(bounds)).select(
        "user_id",
        F.explode(
            F.sequence(
                F.col("day"),
                F.least(
                    F.col("day") + F.expr(f"INTERVAL {RAU_WINDOW_DAYS - 1} DAYS"),
                    F.col("max_day"),
                ),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day"),
    )
    return (
        contributed.groupBy("day")
        .agg(F.countDistinct("user_id").alias("active_users"))
        .orderBy("day")
    )


ROLLING_ACTIVE_USERS_SQL = f"""
WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
pairs AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM ev),
bounds AS (SELECT MAX(day) AS max_day FROM pairs),
contributed AS (
  SELECT p.user_id, p.day + to_days(CAST(o.off AS INTEGER)) AS day
  FROM pairs p
  CROSS JOIN (SELECT unnest(generate_series(0, {RAU_WINDOW_DAYS - 1})) AS off) o
)
SELECT c.day, COUNT(DISTINCT c.user_id) AS active_users
FROM contributed c, bounds b
WHERE c.day <= b.max_day
GROUP BY c.day ORDER BY c.day
"""


LATE_S = 300  # an event this far behind its stream's high-water mark is late


def events_late_arrivals(spark, sf):
    """Out-of-order-data audit — the batch twin of streaming watermark
    tuning: for each user's stream (event_id = arrival order), an event is
    LATE when it lands more than {LATE_S}s behind the high-water mark of
    the rows that arrived before it. The per-type late rate is exactly
    the disorder a `withWatermark` bound must absorb; run this before
    picking the bound instead of guessing.

    Plan: one window (running max of event time over arrival order per
    user) — same single-shuffle shape as sessionize; integer microsecond
    math end to end."""
    ev = load(spark, sf, "events")
    by_arrival = Window.partitionBy("user_id").orderBy("event_id")
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    hwm = F.max(ts_us).over(
        by_arrival.rowsBetween(Window.unboundedPreceding, -1)
    )
    late = (hwm - ts_us) > F.lit(LATE_S * 1_000_000)
    n = F.count(F.lit(1))
    n_late = F.sum(F.when(F.col("late"), 1).otherwise(0))
    return (
        ev.select("event_type", late.alias("late"))
        .groupBy("event_type")
        .agg(
            n.alias("n_events"),
            n_late.alias("n_late"),
            F.round(n_late.cast("double") / n.cast("double"), 6).alias("late_rate"),
        )
        .orderBy("event_type")
    )


EVENTS_LATE_SQL = f"""
WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
flagged AS (
  SELECT event_type,
         (MAX(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
          - epoch_us(ts)) > {LATE_S} * 1000000 AS late
  FROM ev
)
SELECT event_type, COUNT(*) AS n_events,
       CAST(SUM(CASE WHEN late THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
       ROUND(CAST(SUM(CASE WHEN late THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS late_rate
FROM flagged GROUP BY event_type ORDER BY event_type
"""


CHURN_WINDOW_DAYS = 7  # absent this long = the return counts as resurrected


def events_user_lifecycle(spark, sf):
    """Growth accounting: every active (user, day) classified as NEW
    (first day ever), RETAINED (also active within the prior
    {CHURN_WINDOW_DAYS} days) or RESURRECTED (seen before, but not in the
    window) — the daily new/retained/resurrected census every growth
    dashboard opens with.

    Plan: dedup to (user, day) pairs, one lag window per user, one
    rollup — the same two-exchange shape as sessionize, state per user
    is a single previous-day value. Integer day arithmetic only."""
    ev = load(spark, sf, "events")
    pairs = (
        ev.select(
            "user_id",
            F.datediff(
                F.date_trunc("day", F.col("ts")).cast("date"),
                F.lit("1990-01-01").cast("date"),
            ).cast("long").alias("day_no"),
        )
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day_no")
    prev = F.lag("day_no").over(w)
    status = (
        F.when(prev.isNull(), F.lit("new"))
        .when(F.col("day_no") - prev <= CHURN_WINDOW_DAYS, F.lit("retained"))
        .otherwise(F.lit("resurrected"))
    )
    return (
        pairs.withColumn("status", status)
        .groupBy("day_no", "status")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("day_no", "status")
    )


EVENTS_LIFECYCLE_SQL = f"""
WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
pairs AS (
  SELECT DISTINCT user_id,
         date_diff('day', DATE '1990-01-01', CAST(date_trunc('day', ts) AS DATE)) AS day_no
  FROM ev
),
flagged AS (
  SELECT day_no,
         CASE WHEN LAG(day_no) OVER w IS NULL THEN 'new'
              WHEN day_no - LAG(day_no) OVER w <= {CHURN_WINDOW_DAYS} THEN 'retained'
              ELSE 'resurrected' END AS status
  FROM pairs
  WINDOW w AS (PARTITION BY user_id ORDER BY day_no)
)
SELECT day_no, status, COUNT(*) AS n_users
FROM flagged GROUP BY day_no, status ORDER BY day_no, status
"""


def events_markov_transitions(spark, sf):
    """First-order behavioral flow: the event-type transition matrix over
    each user's time-ordered stream — P(next_type | type) with exact
    counts, the sequence-mining census behind "what do users do after a
    view?". One lag window per user (the sessionize shuffle shape), one
    rollup; the probability is a single integer-ratio division."""
    ev = load(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.lag("event_type").over(w).alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .filter(F.col("from_type").isNotNull())
    )
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    w_from = Window.partitionBy("from_type")
    return (
        counts.withColumn("n_from", F.sum("n_transitions").over(w_from))
        .select(
            "from_type",
            "to_type",
            "n_transitions",
            F.round(
                F.col("n_transitions").cast("double") / F.col("n_from").cast("double"),
                6,
            ).alias("p_transition"),
        )
        .orderBy("from_type", "to_type")
    )


EVENTS_MARKOV_SQL = """
WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
pairs AS (
  SELECT LAG(event_type) OVER w AS from_type, event_type AS to_type
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
counts AS (
  SELECT from_type, to_type, COUNT(*) AS n_transitions
  FROM pairs WHERE from_type IS NOT NULL
  GROUP BY 1, 2
)
SELECT from_type, to_type, n_transitions,
       ROUND(CAST(n_transitions AS DOUBLE)
             / CAST(SUM(n_transitions) OVER (PARTITION BY from_type) AS DOUBLE), 6) AS p_transition
FROM counts
ORDER BY from_type, to_type
"""


def events_funnel_ttc(spark, sf):
    """Time-to-convert distribution — the duration census behind the
    funnel: for users whose first purchase follows their first view, the
    quartiles and p90 of (first purchase − first view), in exact integer
    seconds. One conditional-min aggregate per user (single shuffle),
    then DISCRETE (type-1) quantiles — Spark's `percentile()` and
    DuckDB's `quantile_cont` interpolate differently, so the rank
    k = floor(p·(n−1))+1 element is selected explicitly; everything
    stays integer-exact.

    Scale shape (no single-partition window anywhere): the durations
    collapse to a (value, count) census first — its cardinality is
    bounded by the DOMAIN (distinct whole seconds), not the user count —
    then `operators/ranking.with_global_cumsum` turns the census into
    exact global rank-ranges with a range exchange + partitioned window;
    the value whose range [cum−cnt+1, cum] contains k IS the quantile."""
    ev = load(spark, sf, "events")
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", ts_us)).alias("t_view"),
        F.min(F.when(F.col("event_type") == "purchase", ts_us)).alias("t_purchase"),
    )
    converted = per_user.filter(
        F.col("t_view").isNotNull() & (F.col("t_purchase") > F.col("t_view"))
    ).select(
        # integer division end to end: double division + cast would
        # truncate in Spark but ROUND in DuckDB's CAST(double AS BIGINT)
        F.expr("(t_purchase - t_view) div 1000000").alias("ttc_s")
    )
    census = converted.groupBy("ttc_s").agg(F.count(F.lit(1)).alias("cnt"))
    ranked, n = with_global_cumsum(
        census, [F.col("ttc_s")], weight_col="cnt", out_col="cum"
    )

    def q(num, den):
        k = type1_rank(n, num, den)
        in_range = (F.col("cum") - F.col("cnt") < F.lit(k)) & (
            F.lit(k) <= F.col("cum")
        )
        return F.min(F.when(in_range, F.col("ttc_s")))

    n_lit = F.lit(n if n else None).cast("long")
    return ranked.agg(
        n_lit.alias("n_converted"),
        q(1, 4).alias("p25_s"),
        q(1, 2).alias("median_s"),
        q(3, 4).alias("p75_s"),
        q(9, 10).alias("p90_s"),
        F.max("ttc_s").alias("max_s"),
    )


EVENTS_TTC_SQL = """
WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
per_user AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS t_view,
         MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS t_purchase
  FROM ev GROUP BY user_id
),
converted AS (
  SELECT (t_purchase - t_view) // 1000000 AS ttc_s
  FROM per_user WHERE t_view IS NOT NULL AND t_purchase > t_view
),
ranked AS (
  SELECT ttc_s, ROW_NUMBER() OVER (ORDER BY ttc_s) AS rn,
         (SELECT COUNT(*) FROM converted) AS n
  FROM converted
)
SELECT MAX(n) AS n_converted,
       MIN(CASE WHEN rn = (n - 1) * 1 // 4 + 1 THEN ttc_s END) AS p25_s,
       MIN(CASE WHEN rn = (n - 1) * 1 // 2 + 1 THEN ttc_s END) AS median_s,
       MIN(CASE WHEN rn = (n - 1) * 3 // 4 + 1 THEN ttc_s END) AS p75_s,
       MIN(CASE WHEN rn = (n - 1) * 9 // 10 + 1 THEN ttc_s END) AS p90_s,
       MAX(ttc_s) AS max_s
FROM ranked
"""


PATH_LEN = 3  # journey prefix length
PATH_TOP = 20


def session_top_paths(spark, sf):
    """Top user journeys: the {PATH_TOP} most common first-{PATH_LEN}
    event-type paths across sessions (30-min gap sessionization, same
    rule as ``events_sessionize``). Path analysis is the composition the
    funnel can't give — it discovers the sequences instead of testing
    one.

    Ordering discipline: the path string is built from a sort_array of
    (position, type) structs, so it is deterministic under any partition
    or aggregation order; the heavy lifting is the same single user-
    partition window shuffle as sessionize plus a path rollup."""
    ev = load(spark, sf, "events")
    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = ts_us - F.lag(ts_us).over(by_user)
    is_new = F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0)
    sess = ev.withColumn("is_new", is_new).withColumn(
        "session_seq",
        F.sum("is_new").over(
            by_user.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    by_sess = Window.partitionBy("user_id", "session_seq").orderBy("ts", "event_id")
    first_k = (
        sess.withColumn("rn", F.row_number().over(by_sess))
        .filter(F.col("rn") <= PATH_LEN)
    )
    paths = first_k.groupBy("user_id", "session_seq").agg(
        F.concat_ws(
            ">",
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct(F.col("rn"), F.col("event_type")))
                ),
                lambda s: s.event_type,
            ),
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(PATH_TOP)
    )


SESSION_PATHS_SQL = f"""
WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
seq AS (
  SELECT *,
         CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800 * 1000000
              THEN 1 ELSE 0 END AS is_new
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
  FROM seq
),
first_k AS (
  SELECT * FROM (
    SELECT user_id, session_seq, event_type,
           ROW_NUMBER() OVER (PARTITION BY user_id, session_seq ORDER BY ts, event_id) AS rn
    FROM sess)
  WHERE rn <= {PATH_LEN}
),
paths AS (
  SELECT user_id, session_seq,
         string_agg(event_type, '>' ORDER BY rn) AS path
  FROM first_k GROUP BY 1, 2
)
SELECT path, COUNT(*) AS n_sessions
FROM paths GROUP BY path
ORDER BY n_sessions DESC, path
LIMIT {PATH_TOP}
"""


TWAP_MIN_EVENTS = 3  # users with fewer events have no meaningful span


def user_value_twap(spark, sf):
    """Time-WEIGHTED average value per user — the metric sensor/price/
    balance streams need where the plain AVG is wrong (a value that held
    for an hour must weigh 3600x one that held a second). Each event's
    value is a step function until the user's next event; the TWA is
    Σ value_i·Δt_i / Σ Δt_i over the user's span.

    Exactness discipline: value in integer cents, duration in integer
    microseconds via one `lead` window; the weighted sum is exact
    BIGINT and only the final ratio is one rounded double division —
    identical IEEE op in both engines. One user-partition window + one
    aggregate: single shuffle, scales with users like sessionize."""
    ev = load(spark, sf, "events")
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cents_v = F.round(F.col("value") * 100, 0).cast("long")
    stepped = ev.select(
        "user_id",
        cents_v.alias("value_cents"),
        ts_us.alias("t"),
        F.lead(ts_us).over(w).alias("t_next"),
    ).filter(F.col("t_next").isNotNull())
    agg = stepped.groupBy("user_id").agg(
        (F.count(F.lit(1)) + 1).alias("n_events"),  # steps + the final event
        F.sum(F.col("value_cents") * (F.col("t_next") - F.col("t"))).alias("wsum"),
        F.sum(F.col("t_next") - F.col("t")).alias("span_us"),
    )
    return (
        agg.filter(F.col("n_events") >= TWAP_MIN_EVENTS)
        .filter(F.col("span_us") > 0)
        .select(
            "user_id",
            "n_events",
            "span_us",
            F.round(
                F.col("wsum").cast("double") / F.col("span_us").cast("double") / 100.0,
                4,
            ).alias("twap_value"),
        )
        .orderBy("user_id")
    )


USER_TWAP_SQL = f"""
WITH ev AS (
  SELECT user_id, CAST(ROUND(value * 100.0) AS BIGINT) AS value_cents,
         epoch_us(CAST(ts AS TIMESTAMP)) AS t,
         LEAD(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS t_next
  FROM events
),
stepped AS (SELECT * FROM ev WHERE t_next IS NOT NULL),
agg AS (
  SELECT user_id, COUNT(*) + 1 AS n_events,
         CAST(SUM(value_cents * (t_next - t)) AS BIGINT) AS wsum,
         CAST(SUM(t_next - t) AS BIGINT) AS span_us
  FROM stepped GROUP BY user_id
)
SELECT user_id, n_events, span_us,
       ROUND(CAST(wsum AS DOUBLE) / CAST(span_us AS DOUBLE) / 100.0, 4) AS twap_value
FROM agg WHERE n_events >= {TWAP_MIN_EVENTS} AND span_us > 0
ORDER BY user_id
"""


QUERIES = {
    "user_value_twap": Q(user_value_twap, USER_TWAP_SQL),
    "events_hourly": Q(events_hourly, EVENTS_HOURLY_SQL),
    "rolling_active_users": Q(rolling_active_users, ROLLING_ACTIVE_USERS_SQL),
    "events_late_arrivals": Q(events_late_arrivals, EVENTS_LATE_SQL),
    "events_user_lifecycle": Q(events_user_lifecycle, EVENTS_LIFECYCLE_SQL),
    "events_markov_transitions": Q(events_markov_transitions, EVENTS_MARKOV_SQL),
    "session_top_paths": Q(session_top_paths, SESSION_PATHS_SQL),
    "events_funnel_ttc": Q(events_funnel_ttc, EVENTS_TTC_SQL),
    "events_gapfill": Q(events_gapfill, EVENTS_GAPFILL_SQL),
    "events_attribution": Q(events_attribution, EVENTS_ATTRIBUTION_SQL),
    "events_dedup_burst": Q(events_dedup_burst, EVENTS_BURST_SQL),
    "events_funnel": Q(events_funnel, EVENTS_FUNNEL_SQL),
    "events_retention_cohorts": Q(events_retention_cohorts, EVENTS_RETENTION_SQL),
    "events_json_extract": Q(events_json_extract, EVENTS_JSON_SQL),
    "events_sessionize": Q(events_sessionize, EVENTS_SESSIONIZE_SQL, headline=True),
    "events_daily_users": Q(events_daily_users, EVENTS_DAILY_SQL),
    "events_daily_anomaly": Q(events_daily_anomaly, EVENTS_ANOMALY_SQL),
}
