"""Sessionization — gap-based session assignment over an event stream.

Two faces of one semantics (gap > ``gap_minutes`` starts a new session):

- ``sessionize_batch``: lag + cumulative-sum windows — pure DataFrame ops,
  oracle-checkable in ANSI SQL (driver catalog entry ``user_sessions``).
- ``sessionize_stream``: ``applyInPandasWithState`` — the custom stateful
  streaming operator (SURVEY §2.11; the engine capability the reference's
  per-request status mutation hints at but cannot express). State per user
  = the open session (start, last_ts, n_events); a session is emitted when
  a later event closes it (gap crossed) or the group times out.

Scale: both shapes shuffle once on ``user_id``; state size is O(users),
bounded by the timeout; no skew concern beyond AQE defaults because state
rows are constant-size.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEFAULT_GAP_MIN = 30


def sessionize_batch(events: DataFrame, gap_minutes: int = DEFAULT_GAP_MIN) -> DataFrame:
    """(user_id, session_no, n_events, session_start, session_end) — the
    lag/cumsum formulation; one shuffle on user_id shared by both windows
    and the final aggregate."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    new_session = F.when(
        prev_ts.isNull()
        | ((F.unix_timestamp("ts") - F.unix_timestamp(prev_ts)) > gap_minutes * 60),
        1,
    ).otherwise(0)
    cum = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tagged = events.withColumn("session_no", F.sum(new_session).over(cum))
    return (
        tagged.groupBy("user_id", "session_no")
        .agg(
            F.count("*").alias("n_events"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        )
        .orderBy("user_id", "session_no")
    )


_SESSION_OUT_DDL = (
    "user_id long, n_events long, session_start timestamp, session_end timestamp"
)
_SESSION_STATE_DDL = "start long, last long, n long"


def _session_func(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-user state transition: fold sorted event times into the open
    session; emit every session closed by a gap (or by group timeout)."""
    gap_s = DEFAULT_GAP_MIN * 60
    (user_id,) = key
    if state.hasTimedOut:
        if state.exists:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "n_events": [n],
                    "session_start": [pd.Timestamp(start, unit="s")],
                    "session_end": [pd.Timestamp(last, unit="s")],
                }
            )
        return

    ts_all: list[int] = []
    for pdf in pdfs:
        ts_all.extend(int(t.timestamp()) for t in pdf["ts"])
    ts_all.sort()

    start, last, n = state.get if state.exists else (None, None, 0)
    closed = []
    for t in ts_all:
        if start is None:
            start, last, n = t, t, 1
        elif t - last > gap_s:
            closed.append((start, last, n))
            start, last, n = t, t, 1
        else:
            last, n = t, n + 1
    state.update((start, last, n))
    state.setTimeoutDuration(60 * 60 * 1000)
    if closed:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(closed),
                "n_events": [c[2] for c in closed],
                "session_start": [pd.Timestamp(c[0], unit="s") for c in closed],
                "session_end": [pd.Timestamp(c[1], unit="s") for c in closed],
            }
        )


def sessionize_stream(events_stream: DataFrame) -> DataFrame:
    """Streaming sessionization over a (ts, user_id, ...) stream."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _session_func,
        outputStructType=_SESSION_OUT_DDL,
        stateStructType=_SESSION_STATE_DDL,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def sessionize_session_window(
    events: DataFrame, gap_minutes: int = DEFAULT_GAP_MIN
) -> DataFrame:
    """The Spark-NATIVE formulation: built-in ``session_window`` (merging
    gap windows inside the aggregation operator — no lag/cumsum window
    pair, one shuffle, streaming-capable with a watermark as-is).

    Boundary semantics MATCH :func:`sessionize_batch`: session_window
    merges an event arriving exactly ``gap`` after the previous one (its
    window end ``last + gap`` is inclusive for merging — pinned in
    tests/test_sessions.py::test_session_window_boundary_semantics), the
    same ``diff > gap`` new-session rule as the lag formulation.

    ``session_no`` is derived per user by session start order so the output
    shape matches :func:`sessionize_batch`."""
    gap = f"{gap_minutes} minutes"
    agg = (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.min("ts").alias("_first"), F.max("ts").alias("_last"))
    )
    w = Window.partitionBy("user_id").orderBy("_first")
    return (
        agg.withColumn("session_no", F.row_number().over(w).cast("long"))
        .select(
            "user_id",
            "session_no",
            "n_events",
            F.date_format("_first", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format("_last", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        )
        .orderBy("user_id", "session_no")
    )


def sessionize_stream_event_time(
    events_stream: DataFrame,
    gap_minutes: int = DEFAULT_GAP_MIN,
    watermark: str = "2 hours",
) -> DataFrame:
    """Event-time variant of the stateful sessionizer: sessions close when
    the WATERMARK passes ``last_event + gap`` — deterministic under replay
    (a backfill over yesterday's events closes the same sessions at the
    same points regardless of wall-clock speed), unlike the processing-time
    timeout which depends on when micro-batches happen to run. State per
    user stays O(1); the watermark bounds how long an idle session can hold
    state (ROADMAP item 6)."""
    gap_s = gap_minutes * 60

    def func(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            if state.exists:
                start, last, n = state.get
                state.remove()
                yield pd.DataFrame(
                    {
                        "user_id": [user_id],
                        "n_events": [n],
                        "session_start": [pd.Timestamp(start, unit="s")],
                        "session_end": [pd.Timestamp(last, unit="s")],
                    }
                )
            return
        ts_all: list[int] = []
        for pdf in pdfs:
            ts_all.extend(int(t.timestamp()) for t in pdf["ts"])
        ts_all.sort()
        start, last, n = state.get if state.exists else (None, None, 0)
        closed = []
        for t in ts_all:
            if start is None:
                start, last, n = t, t, 1
            elif t - last > gap_s:
                closed.append((start, last, n))
                start, last, n = t, t, 1
            else:
                last, n = t, n + 1
        state.update((start, last, n))
        # close exactly when the event-time watermark crosses last + gap
        state.setTimeoutTimestamp((last + gap_s) * 1000)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "n_events": [c[2] for c in closed],
                    "session_start": [pd.Timestamp(c[0], unit="s") for c in closed],
                    "session_end": [pd.Timestamp(c[1], unit="s") for c in closed],
                }
            )

    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            func,
            outputStructType=_SESSION_OUT_DDL,
            stateStructType=_SESSION_STATE_DDL,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
