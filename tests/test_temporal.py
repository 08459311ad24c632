"""As-of join and sessionization semantics."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from entity_extractor_spark.operators.temporal import asof_join, session_stats, sessionize


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_asof_join_semantics(spark):
    left = _df(
        spark,
        [(1, "2026-01-01 10:00:05", 100), (1, "2026-01-01 10:00:00", 101), (2, "2026-01-01 09:00:00", 102)],
        "user_id long, ts string, event_id long",
    ).withColumn("ts", F.to_timestamp("ts"))
    right = _df(
        spark,
        [
            (1, "2026-01-01 09:59:59", 7),   # before both clicks
            (1, "2026-01-01 10:00:05", 8),   # exactly at the later click -> matches it
            (1, "2026-01-01 11:00:00", 9),   # after everything
            (3, "2026-01-01 08:00:00", 10),  # other key
        ],
        "user_id long, ts string, vid long",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {
        r["event_id"]: (r["r_vid"], str(r["r_ts"]) if r["r_ts"] else None)
        for r in asof_join(left, right, "user_id", right_cols=["vid"]).collect()
    }
    assert out[101] == (7, "2026-01-01 09:59:59")  # latest <= 10:00:00
    assert out[100] == (8, "2026-01-01 10:00:05")  # equal ts matches
    assert out[102] == (None, None)  # no right row for user 2


def test_asof_join_right_side_tie_break(spark):
    """order_col names a RIGHT-side payload column; among right rows with
    the SAME timestamp, the highest order value must win (round-1 ADVICE:
    the old coalesce no-op / r_-rename resolution bug)."""
    left = _df(
        spark, [(1, "2026-01-01 10:00:00", 100)], "user_id long, ts string, event_id long"
    ).withColumn("ts", F.to_timestamp("ts"))
    right = _df(
        spark,
        [
            (1, "2026-01-01 09:00:00", 7, 1),
            (1, "2026-01-01 09:00:00", 8, 3),  # same ts, highest seq -> wins
            (1, "2026-01-01 09:00:00", 9, 2),
        ],
        "user_id long, ts string, vid long, seq long",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = asof_join(left, right, "user_id", right_cols=["vid"], order_col="seq").collect()
    assert len(out) == 1
    assert out[0]["r_vid"] == 8
    assert "_r_ord" not in out[0].asDict()


def test_asof_join_null_payload_not_backfilled(spark):
    """The latest at-or-before right row must be taken ATOMICALLY: a
    NULL payload on the latest right row stays NULL, never backfilled
    from an older right row (round-2 code-review finding)."""
    left = _df(
        spark, [(1, "2026-01-01 10:00:00", 100)], "user_id long, ts string, event_id long"
    ).withColumn("ts", F.to_timestamp("ts"))
    right = _df(
        spark,
        [(1, "2026-01-01 09:00:00", 5), (1, "2026-01-01 09:30:00", None)],
        "user_id long, ts string, vid long",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = asof_join(left, right, "user_id", right_cols=["vid"]).collect()
    assert len(out) == 1
    assert str(out[0]["r_ts"]) == "2026-01-01 09:30:00"  # latest right row
    assert out[0]["r_vid"] is None  # its NULL payload, not the older 5


def test_interval_join_semantics(spark):
    """Bucketized range join: inclusive boundaries, multi-bucket
    intervals, key isolation, and no duplicate matches."""
    from entity_extractor_spark.operators.temporal import interval_join

    pts = _df(
        spark,
        [
            (1, "2026-01-01 10:00:00", 100),  # exactly at i1 start (inclusive)
            (1, "2026-01-01 11:30:00", 101),  # inside i1 (bucket 2 of 3)
            (1, "2026-01-01 13:00:00", 102),  # exactly at i1 end (inclusive)
            (1, "2026-01-01 13:00:01", 103),  # just outside
            (2, "2026-01-01 11:00:00", 104),  # other key, same time range
        ],
        "user_id long, ts string, event_id long",
    ).withColumn("ts", F.to_timestamp("ts"))
    iv = _df(
        spark,
        [(1, 7, "2026-01-01 10:00:00", "2026-01-01 13:00:00")],
        "user_id long, interval_id long, start_ts string, end_ts string",
    ).withColumn("start_ts", F.to_timestamp("start_ts")).withColumn(
        "end_ts", F.to_timestamp("end_ts")
    )
    out = interval_join(pts, iv, key="user_id", bucket_seconds=3600).collect()
    assert sorted(r["event_id"] for r in out) == [100, 101, 102]
    assert all(r["interval_id"] == 7 for r in out)
    # plan: the non-equi condition must NOT become a nested-loop join
    from entity_extractor_spark import plans as P

    plan = P.formatted_plan(interval_join(pts, iv, key="user_id"))
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan, plan


def test_sessionize_gap_rule(spark):
    rows = [
        (1, "2026-01-01 10:00:00"),
        (1, "2026-01-01 10:10:00"),  # same session (10 min)
        (1, "2026-01-01 11:10:00"),  # 60-min gap -> new session
        (2, "2026-01-01 10:00:00"),
    ]
    df = _df(spark, rows, "user_id long, ts string").withColumn("ts", F.to_timestamp("ts"))
    s = sessionize(df, "user_id", gap_seconds=1800).collect()
    by = {(r["user_id"], str(r["ts"])): r["session_idx"] for r in s}
    assert by[(1, "2026-01-01 10:00:00")] == 0
    assert by[(1, "2026-01-01 10:10:00")] == 0
    assert by[(1, "2026-01-01 11:10:00")] == 1
    assert by[(2, "2026-01-01 10:00:00")] == 0
    stats = {r["user_id"]: r for r in session_stats(df, "user_id", gap_seconds=1800).collect()}
    assert stats[1]["n_sessions"] == 2 and stats[1]["n_events"] == 3
    assert stats[2]["n_sessions"] == 1


# --------------------------------------------------------------------------- event analytics


def _ev(spark, rows):
    import pandas as pd

    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    return spark.createDataFrame(pdf)


def test_funnel_strict_order_and_dropoff(spark):
    """u1 completes in order; u2 clicked only BEFORE their first view
    (must not count at step 2); u3 never purchases."""
    from entity_extractor_spark.operators.event_analytics import funnel_steps

    e = _ev(
        spark,
        [
            (1, "2024-01-01 10:00", 1, "view"),
            (2, "2024-01-01 10:01", 1, "click"),
            (3, "2024-01-01 10:02", 1, "purchase"),
            (4, "2024-01-01 09:00", 2, "click"),
            (5, "2024-01-01 09:30", 2, "view"),
            (6, "2024-01-01 09:45", 2, "purchase"),
            (7, "2024-01-01 11:00", 3, "view"),
            (8, "2024-01-01 11:30", 3, "click"),
        ],
    )
    rows = {
        r["step"]: r["n_users"]
        for r in funnel_steps(e, ["view", "click", "purchase"]).collect()
    }
    assert rows == {1: 3, 2: 2, 3: 1}


def test_oracle_sql_escapes_embedded_quotes():
    """funnel_steps_sql and bm25_topk_sql take caller-supplied strings;
    an embedded single quote must yield valid SQL, not a syntax error
    or a truncated literal."""
    import duckdb

    from entity_extractor_spark.operators.event_analytics import funnel_steps_sql
    from entity_extractor_spark.operators.search import bm25_topk_sql

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events AS SELECT * FROM (VALUES "
        "(1, TIMESTAMP '2024-01-01 10:00:00', 1, 'user''s view'), "
        "(2, TIMESTAMP '2024-01-01 10:01:00', 1, 'click')"
        ") AS v(event_id, ts, user_id, event_type)"
    )
    got = {
        r[1]: r[2]
        for r in con.execute(funnel_steps_sql(["user's view", "click"])).fetchall()
    }
    assert got == {"user's view": 1, "click": 1}

    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        "('d1', 'alpha beta'), ('d2', 'beta gamma')) AS v(doc_id, text)"
    )
    rows = con.execute(bm25_topk_sql([("q'1", "beta")], k=5)).fetchall()
    assert {r[0] for r in rows} == {"q'1"} and len(rows) == 2


def test_retention_cohort_triangle(spark):
    """Two users in the same Monday cohort; one returns the next week."""
    from entity_extractor_spark.operators.event_analytics import retention_cohorts

    e = _ev(
        spark,
        [
            (1, "2024-01-01 10:00", 1, "view"),   # Mon, week 0
            (2, "2024-01-10 10:00", 1, "view"),   # next week -> offset 1
            (3, "2024-01-03 10:00", 2, "view"),   # same cohort week
        ],
    )
    rows = {
        (str(r["cohort_week"]), r["week_offset"]): r["n_users"]
        for r in retention_cohorts(e).collect()
    }
    assert rows == {("2024-01-01", 0): 2, ("2024-01-01", 1): 1}


def test_event_transitions_tiebreak_deterministic(spark):
    """Two events at the SAME timestamp order by event_id — the pair
    stream is fixed, and a repartition cannot change it."""
    from entity_extractor_spark.operators.event_analytics import event_transitions

    e = _ev(
        spark,
        [
            (1, "2024-01-01 10:00", 1, "view"),
            (3, "2024-01-01 10:05", 1, "purchase"),  # same ts, higher id
            (2, "2024-01-01 10:05", 1, "click"),     # same ts, lower id
            (4, "2024-01-01 10:00", 2, "view"),
            (5, "2024-01-01 10:01", 2, "view"),
        ],
    )
    exp = {("view", "click"): 1, ("click", "purchase"): 1, ("view", "view"): 1}
    for parts in (1, 5):
        got = {
            (r["prev_type"], r["next_type"]): r["n"]
            for r in event_transitions(e.repartition(parts)).collect()
        }
        assert got == exp


def test_json_field_stats_null_degradation(spark):
    """Missing keys, malformed JSON, and non-numeric values must all
    degrade to NULL (counted in n_events, excluded from the field
    aggregates) — identically to the TRY_CAST oracle semantics."""
    from entity_extractor_spark.operators.event_analytics import json_field_stats

    rows = [
        (1, "a", '{"k": 10}'),
        (2, "a", '{"k": 32}'),
        (3, "a", '{"other": 5}'),      # missing key
        (4, "a", "not json at all"),   # malformed
        (5, "a", '{"k": "abc"}'),      # non-numeric
        (6, "b", '{"k": -7}'),
        (7, "a", '{"k": 10.5}'),       # fractional: NULL on BOTH engines
        (8, "a", '{"k": 1e3}'),        # scientific: NULL on BOTH engines
    ]
    df = spark.createDataFrame(rows, "event_id long, event_type string, props string")
    got = {r["event_type"]: r for r in json_field_stats(df).collect()}
    a = got["a"]
    assert (a["n_events"], a["n_with_field"], a["min_v"], a["max_v"], a["sum_v"]) == (7, 2, 10, 32, 42)
    b = got["b"]
    assert (b["n_events"], b["n_with_field"], b["sum_v"]) == (1, 1, -7)

    # the oracle must agree on the fractional/scientific rows (DuckDB's
    # bare TRY_CAST would give 11 and 1000 — the regexp guard nulls both)
    import duckdb

    from entity_extractor_spark.operators.event_analytics import json_field_stats_sql

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({i}, '{t}', '{p.replace(chr(39), chr(39) * 2)}')" for i, t, p in rows
        )
        + ") AS v(event_id, event_type, props)"
    )
    ora = {
        r[0]: r
        for r in con.execute(json_field_stats_sql()).fetchall()
    }
    assert ora["a"] == ("a", 7, 2, 10, 32, 42)
    assert ora["b"] == ("b", 1, 1, -7, -7, -7)
