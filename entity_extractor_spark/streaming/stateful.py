"""Custom stateful streaming operators (applyInPandasWithState).

The reference is batch-only (its closest notion of streaming is the
resume-flag re-run loop, `run_extraction.py:253-260`); at transcript
scale the natural arrival mode is a stream of turn/event files, so this
module adds the two standard streaming shapes Spark does not give you
for free at the semantics we need:

* ``sessionize_stream`` — inactivity-gap sessionization as a CUSTOM
  STATEFUL operator: per-key pending-session state carried across
  micro-batches with ``applyInPandasWithState`` + event-time timeout.
  This is the streaming twin of ``operators/temporal.sessionize`` (same
  gap rule). A session is emitted exactly once, and only when the
  WATERMARK passes its ``end + gap`` — until then it stays mutable in
  the state store, because a within-watermark late event may still
  extend it or merge two gap-split sessions (emitting on gap-split
  alone would double-emit in that case). State is O(pending sessions
  per active key), bounded by the watermark horizon — at 10^12 turns
  the store holds only keys active inside it.
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
    ArrayType,
    LongType,
    StringType,
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
# pending (not yet watermark-finalized) sessions: parallel arrays of
# microsecond-epoch (start, last, n) — a LIST, not one interval, because
# a session split by the gap rule is still mutable until the watermark
# passes its end+gap (a within-watermark late event may merge into it)
SESSION_STATE = StructType(
    [
        StructField("starts", ArrayType(LongType())),
        StructField("lasts", ArrayType(LongType())),
        StructField("ns", ArrayType(LongType())),
    ]
)

_US = 1_000_000


def _session_fn(gap_seconds: int):
    gap_us = gap_seconds * _US

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        # intervals (start, last, n): each new event is a unit interval,
        # every pending state session is an atomic interval — sorting
        # then gap-merging is correct even when a micro-batch delivers
        # (within-watermark) events older than a pending session
        intervals: list[list[int]] = []
        for pdf in pdfs:
            # normalize to microsecond epoch regardless of the pandas
            # datetime resolution Arrow hands us (ns on pandas<2, us on
            # 2.x); null event times (NaT -> int64 min) are dropped
            for v in pdf["ts"].astype("datetime64[us]").astype("int64").tolist():
                if int(v) != -(2**63):
                    intervals.append([int(v), int(v), 1])
        if state.exists:
            starts, lasts, ns = state.get
            intervals.extend([s, e, n] for s, e, n in zip(starts, lasts, ns))
        if not intervals:
            if state.exists:
                state.remove()
            return
        intervals.sort()
        merged: list[list[int]] = [intervals[0]]
        for iv in intervals[1:]:
            cur = merged[-1]
            if iv[0] - cur[1] > gap_us:
                merged.append(iv)
            else:
                cur[1] = max(cur[1], iv[1])
                cur[2] += iv[2]
        # a session is FINAL only once the watermark is STRICTLY past its
        # end+gap — Spark still admits events with ts == watermark, and
        # an event at exactly end+gap merges under the (<= gap) rule, so
        # an inclusive check could emit a session that a boundary event
        # then legally extends. Emitting on gap-split alone would
        # likewise double-emit when a late (but in-watermark) event
        # bridges two already-split sessions.
        wm_us = state.getCurrentWatermarkMs() * 1000
        final = [tuple(iv) for iv in merged if iv[1] + gap_us < wm_us]
        pending = [iv for iv in merged if iv[1] + gap_us >= wm_us]
        if pending:
            state.update(
                (
                    [iv[0] for iv in pending],
                    [iv[1] for iv in pending],
                    [iv[2] for iv in pending],
                )
            )
            # fire when the earliest pending session becomes final
            # (clamped strictly past the watermark — us->ms floor could
            # otherwise land exactly ON it, which Spark rejects)
            timeout_ms = min(iv[1] for iv in pending) // 1000 + gap_seconds * 1000
            state.setTimeoutTimestamp(max(timeout_ms, wm_us // 1000 + 1))
        else:
            state.remove()
        if final:
            yield _emit(key[0], final)

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
    ``operators/temporal.sessionize``): one output row per session,
    emitted once its finalization point (``end + gap``) is behind the
    watermark. ``events`` must be a streaming DataFrame.
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


HH_STREAM_OUTPUT = StructType([StructField("token", StringType())])
# per-shard Misra-Gries summary: parallel (token, counter) arrays,
# bounded at k entries by construction
HH_STREAM_STATE = StructType(
    [
        StructField("tokens", ArrayType(StringType())),
        StructField("counts", ArrayType(LongType())),
    ]
)


def _hh_fn(k: int, text_col: str):
    import re as _re

    from entity_extractor_spark.functions.text import TOKEN_RE
    from entity_extractor_spark.operators.sketches import mg_update

    # re.ASCII for the same reason as the batch pass (sketches.py):
    # the exact recount explodes tokens with Java \w (ASCII), so the
    # streaming summary must track the same token units
    tok_re = _re.compile(TOKEN_RE, _re.ASCII)

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # watermark passed our marker: the drain is (as far as this
            # shard knows) over — emit the surviving summary tokens and
            # clear state. If more data DOES arrive later, a fresh
            # summary starts; the union of per-epoch summaries is still
            # a candidate superset (see heavy_hitters_stream docstring).
            tokens: list = []
            if state.exists:
                tokens = list(state.get[0])
                state.remove()
            if tokens:
                yield pd.DataFrame({"token": pd.Series(tokens, dtype="object")})
            return
        counts: dict = {}
        if state.exists:
            toks, cnts = state.get
            counts = {t: int(c) for t, c in zip(toks, cnts)}
        for pdf in pdfs:
            for text in pdf[text_col]:
                if text is None:
                    continue
                mg_update(counts, tok_re.findall(text.lower()), k)
        if counts:
            state.update((list(counts.keys()), [int(v) for v in counts.values()]))
            # fire as soon as the watermark moves past "now": under
            # AvailableNow the post-drain no-data micro-batch advances
            # the watermark to max(ts) and flushes every summary
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1)
        elif state.exists:
            state.remove()

    return fn


def heavy_hitters_stream(
    docs: DataFrame,
    text_col: str = "text",
    support: float = 0.02,
    shards: int = 8,
    id_col: str = "doc_id",
    ts: str = "ts",
    watermark: str = "0 seconds",
) -> DataFrame:
    """Streaming Misra-Gries candidate pass — the incremental form of
    the batch ``operators/sketches.heavy_hitters`` pass 1: each shard
    (content-hash of the doc id, so assignment is deterministic and
    engine-independent) carries a bounded MG summary of capacity
    k = ceil(1/support) across micro-batches in
    ``applyInPandasWithState`` state, and emits its surviving tokens
    once the event-time watermark passes the shard's last update (under
    ``Trigger.AvailableNow``, the post-drain no-data micro-batch).

    State is O(shards * k) tokens TOTAL regardless of stream length —
    the whole point of MG — and the emission is a candidate SUPERSET of
    the true heavy hitters even if a mid-stream timeout splits a shard's
    summary into epochs: an MG run over n_i tokens misses only tokens
    with count <= n_i/(k+1), so summing over (shard, epoch) runs bounds
    the total missed count by N/(k+1) < support*N. Feeding the emitted
    candidates to ``operators/sketches.hh_recount`` therefore yields the
    EXACT heavy-hitter set — which is what the ``hh_stream_parity``
    contract key verifies against the batch oracle."""
    import math

    from entity_extractor_spark.functions.hashing import token_hash

    k = math.ceil(1.0 / support)
    ev = docs.withWatermark(ts, watermark).select(
        F.pmod(token_hash(F.col(id_col).cast("string")), F.lit(shards)).alias("shard"),
        F.col(text_col).alias("text"),
        F.col(ts),
    )
    return ev.groupBy("shard").applyInPandasWithState(
        _hh_fn(k, "text"),
        outputStructType=HH_STREAM_OUTPUT,
        stateStructType=HH_STREAM_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def dedup_stream(
    events: DataFrame,
    keys: list[str],
    ts: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup — the incremental form of the batch
    ``dedup_exact`` / A8 UNIQUE-constraint semantics: the first row per
    key subset is emitted, duplicates arriving within the watermark
    window are dropped, and state is BOUNDED — a key's fingerprint is
    retained only until the watermark passes its event time
    (``dropDuplicatesWithinWatermark``), so at 10^12 events/day the
    dedup state tracks the watermark window, not the corpus. The
    deliberate trade (vs an unbounded ``dropDuplicates`` whose state
    grows forever): a duplicate arriving after its key's state expired
    is re-emitted — exactly-once WITHIN the lateness bound, which is the
    contract a production ingest dedup runs under. Duplicates are
    dropped across micro-batches AND across checkpoint restarts (state
    lives in the checkpoint — regression-tested)."""
    return events.withWatermark(ts, watermark).dropDuplicatesWithinWatermark(keys)


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
