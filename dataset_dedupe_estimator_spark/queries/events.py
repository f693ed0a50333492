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


QUERIES = {
    "events_hourly": Q(events_hourly, EVENTS_HOURLY_SQL),
    "events_json_extract": Q(events_json_extract, EVENTS_JSON_SQL),
    "events_sessionize": Q(events_sessionize, EVENTS_SESSIONIZE_SQL, headline=True),
    "events_daily_users": Q(events_daily_users, EVENTS_DAILY_SQL),
}
