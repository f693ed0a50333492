"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState`` (the engine's example of semantics Spark's
built-in operators can't express — per-key mutable state across
micro-batches).

Semantics: events for a user belong to one session while consecutive
timestamps are within ``gap``; a later event closes the previous session
and emits it. Open sessions live in state across micro-batches (and
across restarts, via the checkpoint). ``session_window`` could express the
windowing, but not custom carry-over metrics — hence the stateful form.

State per user: (session_start_us, last_ts_us, n_events, value_cents).
Output: one row per *closed* session.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("session_start_us", LongType()),
        StructField("last_ts_us", LongType()),
        StructField("n_events", LongType()),
        StructField("value_cents", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start_us", LongType()),
        StructField("session_end_us", LongType()),
        StructField("n_events", LongType()),
        StructField("value_cents", LongType()),
    ]
)


_OUT_COLS = [
    "user_id",
    "session_start_us",
    "session_end_us",
    "n_events",
    "value_cents",
]


def _sessionize_group(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    gap_us: int,
    idle_timeout_ms: int | None,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key

    if state.hasTimedOut:
        # no events for this user within the idle timeout: flush the open
        # session so quiescent users don't hold state forever
        if state.exists:
            start_us, last_us, n_events, value_cents = state.get
            state.remove()
            if start_us is not None:
                yield pd.DataFrame(
                    [(user_id, start_us, last_us, n_events, value_cents)],
                    columns=_OUT_COLS,
                )
        return

    if state.exists:
        start_us, last_us, n_events, value_cents = state.get
    else:
        start_us = last_us = None
        n_events = value_cents = 0

    closed: list[tuple[int, int, int, int, int]] = []
    # Arrow delivers a group as MULTIPLE chunks (split at
    # maxRecordsPerBatch) in no guaranteed timestamp order, and the plan
    # sorts only by the grouping key — so the batch must be concatenated
    # and sorted globally before the gap scan, or chunk boundaries would
    # fabricate/miss session gaps. (Memory: one user's events per
    # micro-batch; bound the trigger interval, not the group.)
    chunks = list(pdfs)
    if chunks:
        pdf = pd.concat(chunks).sort_values(["ts_us", "event_id"])
        for ts_us, cents_ in zip(pdf["ts_us"], pdf["value_cents"]):
            ts_us, cents_ = int(ts_us), int(cents_)
            if last_us is not None and ts_us - last_us > gap_us:
                closed.append((user_id, start_us, last_us, n_events, value_cents))
                start_us, n_events, value_cents = ts_us, 0, 0
            if start_us is None:
                start_us = ts_us
            last_us = ts_us
            n_events += 1
            value_cents += cents_

    state.update((start_us, last_us, n_events, value_cents))
    if idle_timeout_ms is not None:
        state.setTimeoutDuration(idle_timeout_ms)
    if closed:
        yield pd.DataFrame(closed, columns=_OUT_COLS)


def stateful_sessionize(
    events: DataFrame, gap_minutes: int = 30, idle_timeout_minutes: float | None = None
) -> DataFrame:
    """events (streaming: user_id long, ts timestamp, value double,
    event_id long) → closed sessions, state carried across micro-batches.

    ``idle_timeout_minutes`` bounds state for continuous deployments: a
    user idle for that much *processing time* has their open session
    flushed via the ProcessingTimeTimeout branch, so quiescent users don't
    hold state forever. Default ``None`` keeps NoTimeout semantics — a
    finite run (``trigger(availableNow=True)``) must use that, because
    Spark will not terminate an availableNow query while registered
    processing-time timeouts are still pending."""
    from pyspark.sql import functions as F

    gap_us = gap_minutes * 60 * 1_000_000
    idle_timeout_ms = (
        int(idle_timeout_minutes * 60 * 1000)
        if idle_timeout_minutes is not None
        else None
    )
    prepared = events.select(
        "user_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        F.round(F.col("value") * 100, 0).cast("long").alias("value_cents"),
        "event_id",
    )

    def fn(key, pdfs, state):
        return _sessionize_group(key, pdfs, state, gap_us, idle_timeout_ms)

    return prepared.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if idle_timeout_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )
