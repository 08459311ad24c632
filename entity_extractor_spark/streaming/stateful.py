"""Custom stateful streaming operators (applyInPandasWithState).

The reference is batch-only (its closest notion of streaming is the
resume-flag re-run loop, `run_extraction.py:253-260`); at transcript
scale the natural arrival mode is a stream of turn/event files, so this
module adds the two standard streaming shapes Spark does not give you
for free at the semantics we need:

* ``sessionize_stream`` — inactivity-gap sessionization as a CUSTOM
  STATEFUL operator: per-key open-session state carried across
  micro-batches with ``applyInPandasWithState`` + event-time timeout.
  This is the streaming twin of ``operators/temporal.sessionize`` (same
  gap rule); closed sessions are emitted exactly once, the open tail
  session lives in the state store until the watermark passes its
  timeout. State is O(one row per active key) — at 10^12 turns the
  state store holds only keys active inside the watermark horizon.
* ``windowed_event_counts`` — watermarked tumbling-window aggregation
  (the built-in late-data-tolerant shape): counts per (window, group)
  with append-mode finalization once the watermark passes window end.

Both run identically under ``Trigger.AvailableNow`` (drain-and-stop,
used in tests and backfills) and continuous micro-batch triggers on a
cluster.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_OUTPUT = StructType(
    [
        StructField("key", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
    ]
)
# open-session state: (start_us, last_us, n) — microsecond epoch ints so
# the state row is fixed-width and engine-version stable
SESSION_STATE = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", LongType()),
    ]
)

_US = 1_000_000


def _session_fn(gap_seconds: int):
    gap_us = gap_seconds * _US

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # watermark passed last+gap with no new events: close the
            # open session and clear state
            start_us, last_us, n = state.get
            state.remove()
            yield _emit(key[0], [(start_us, last_us, n)])
            return
        # intervals (start, last, n): each new event is a unit interval,
        # the open-session state is one atomic interval — sorting then
        # gap-merging intervals is correct even when a micro-batch
        # delivers (within-watermark) events older than the open session
        intervals: list[list[int]] = []
        for pdf in pdfs:
            # normalize to microsecond epoch regardless of the pandas
            # datetime resolution Arrow hands us (ns on pandas<2, us on 2.x)
            intervals.extend(
                [int(v), int(v), 1]
                for v in pdf["ts"].astype("datetime64[us]").astype("int64").tolist()
            )
        if state.exists:
            start_us, last_us, n = state.get
            intervals.append([start_us, last_us, n])
        intervals.sort()
        cur = intervals[0]
        sessions: list[tuple[int, int, int]] = []
        for iv in intervals[1:]:
            if iv[0] - cur[1] > gap_us:
                sessions.append((cur[0], cur[1], cur[2]))
                cur = iv
            else:
                cur[1] = max(cur[1], iv[1])
                cur[2] += iv[2]
        # every session but the open tail is closed -> emit now;
        # the tail goes to state with an event-time timeout at last+gap
        state.update((cur[0], cur[1], cur[2]))
        state.setTimeoutTimestamp(cur[1] // 1000 + gap_seconds * 1000)
        if sessions:
            yield _emit(key[0], sessions)

    return fn


def _emit(key: Any, sessions: list[tuple[int, int, int]]) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "key": pd.Series([key] * len(sessions), dtype="int64"),
            "session_start": pd.to_datetime([s[0] for s in sessions], unit="us"),
            "session_end": pd.to_datetime([s[1] for s in sessions], unit="us"),
            "n_events": pd.Series([s[2] for s in sessions], dtype="int64"),
        }
    )


def sessionize_stream(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap_seconds: int = 1800,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming inactivity-gap sessionization (same rule as the batch
    ``operators/temporal.sessionize``): one output row per CLOSED
    session. ``events`` must be a streaming DataFrame.
    """
    ev = events.withWatermark(ts, watermark).select(
        F.col(key).cast("long").alias("key"), F.col(ts).alias("ts")
    )
    return ev.groupBy("key").applyInPandasWithState(
        _session_fn(gap_seconds),
        outputStructType=SESSION_OUTPUT,
        stateStructType=SESSION_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def windowed_event_counts(
    events: DataFrame,
    group_col: str = "event_type",
    ts: str = "ts",
    window: str = "1 hour",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Watermarked tumbling-window counts per group — the built-in
    late-data shape: a window finalizes (append mode) once the watermark
    passes its end; later-than-watermark rows are dropped, bounding
    state."""
    return (
        events.withWatermark(ts, watermark)
        .groupBy(F.window(ts, window).alias("w"), F.col(group_col))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            group_col,
            "n",
        )
    )
