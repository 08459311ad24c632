"""Temporal operators Spark lacks as built-ins: as-of join and batch
sessionization.

Not present in the reference (its only time handling is delta-file
timestamps, `app.py:307`); these are the standard event-stream operators
a transcript/telemetry pipeline needs at scale, expressed as single-pass
window plans:

* ``asof_join`` — for each left row, the latest right row with
  ``right.ts <= left.ts`` within the same key. Implemented as the
  union-tag-window pattern: tag both sides, sort within key by
  ``(ts, tag, order)`` (right rows before left at ties so equal
  timestamps match), and carry the last-seen right row forward with
  ``last(..., ignorenulls=True)``. ONE shuffle on the key — no
  range-condition join explosion; equivalent to DuckDB's native
  ``ASOF JOIN`` (the contract oracle).
* ``sessionize`` — session ids from inactivity gaps: gap > threshold
  starts a new session; session index = running sum of start flags. One
  window, composable with any downstream per-session aggregation; the
  batch equivalent of Structured Streaming's session windows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str = "ts",
    right_cols: list[str] | None = None,
    order_col: str | None = None,
) -> DataFrame:
    """Left rows + latest right row at-or-before each left timestamp.

    ``right_cols`` are the right-side payload columns to carry (renamed
    ``r_<col>``); ``order_col`` names a RIGHT-side column that breaks
    exact-timestamp ties within the right side deterministically (highest
    value wins). It is carried through the union under a reserved name
    (null on left rows), so it resolves regardless of the ``r_<col>``
    renames.

    The right row is carried as ONE STRUCT (``_r_row``) with a single
    ``last(ignorenulls=True)`` — the struct is non-null for every right
    row, so the LATEST right row is taken atomically even when some of
    its payload values are NULL. Carrying payload columns individually
    would instead backfill a NULL payload from an OLDER right row,
    fabricating a row that never existed.
    """
    rc = right_cols or [c for c in right.columns if c not in (key, ts)]
    row_struct = F.struct(
        F.col(ts).alias("_rts"), *[F.col(c).alias(f"r_{c}") for c in rc]
    )
    rt = right.select(
        key,
        ts,
        row_struct.alias("_r_row"),
        *([F.col(order_col).alias("_r_ord")] if order_col is not None else []),
    ).withColumn("_tag", F.lit(0))
    lt = left.withColumn("_tag", F.lit(1)).withColumn(
        "_r_row", F.lit(None).cast(rt.schema["_r_row"].dataType)
    )
    if order_col is not None:
        lt = lt.withColumn("_r_ord", F.lit(None).cast(right.schema[order_col].dataType))
    for c in left.columns:
        if c not in (key, ts):
            rt = rt.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    u = lt.unionByName(rt)
    order = [F.col(ts), F.col("_tag")]
    if order_col is not None:
        order.append(F.col("_r_ord"))
    w = Window.partitionBy(key).orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    carried = u.select("*", F.last("_r_row", ignorenulls=True).over(w).alias("_carry"))
    out = carried.filter(F.col("_tag") == 1).select(
        *[c for c in left.columns],
        *[F.col(f"_carry.r_{c}").alias(f"r_{c}") for c in rc],
        F.col("_carry._rts").alias("r_ts"),
    )
    return out


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    key: str | None = None,
    ts: str = "ts",
    start: str = "start_ts",
    end: str = "end_ts",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Range join: each point row matched to every interval containing
    its timestamp (``start <= ts <= end``), optionally also equi-keyed.

    Spark plans a raw BETWEEN join as BroadcastNestedLoopJoin/cartesian —
    the classic non-equi-join scale trap. This is the standard fix: time
    is cut into fixed buckets, each interval EXPLODES into the buckets it
    covers, each point lands in exactly ONE bucket, and the join becomes
    an equi join on (key, bucket) followed by the exact containment
    filter. A point's bucket intersects a covering interval's bucket list
    exactly once, so no dedup is needed. Shuffle volume is
    |points| + |intervals| * avg_buckets_per_interval; pick
    ``bucket_seconds`` near the typical interval length so the expansion
    factor stays ~2. Plan-asserted: no BNLJ, no cartesian.
    """
    b_pt = F.floor(F.unix_timestamp(F.col(ts)) / bucket_seconds)
    b_lo = F.floor(F.unix_timestamp(F.col(start)) / bucket_seconds)
    b_hi = F.floor(F.unix_timestamp(F.col(end)) / bucket_seconds)
    iv = intervals.withColumn("_bucket", F.explode(F.sequence(b_lo, b_hi)))
    pt = points.withColumn("_bucket", b_pt)
    on = ["_bucket"] + ([key] if key else [])
    return (
        pt.join(iv, on)
        .filter((F.col(ts) >= F.col(start)) & (F.col(ts) <= F.col(end)))
        .drop("_bucket")
    )


def sessionize(
    df: DataFrame, key: str, ts: str = "ts", gap_seconds: int = 1800
) -> DataFrame:
    """Adds ``session_idx`` (0-based per key) from the inactivity-gap rule."""
    w = Window.partitionBy(key).orderBy(ts)
    gap = F.unix_timestamp(ts) - F.unix_timestamp(F.lag(ts).over(w))
    new_session = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    return df.withColumn(
        "session_idx",
        (F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1).cast("long"),
    )


def session_stats(
    df: DataFrame, key: str, ts: str = "ts", gap_seconds: int = 1800
) -> DataFrame:
    """Per-key session summary: session count, events, mean session len."""
    s = sessionize(df, key, ts, gap_seconds)
    per_session = s.groupBy(key, "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.unix_timestamp(F.max(ts)) - F.unix_timestamp(F.min(ts))).alias("dur_s"),
    )
    return (
        per_session.groupBy(key)
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
            F.round(F.avg("dur_s"), 2).alias("mean_session_s"),
        )
        .orderBy(key)
    )
