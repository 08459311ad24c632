"""Custom stateful streaming operators: applyInPandasWithState
sessionization (state carried across micro-batches) and watermarked
windowed aggregation."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from entity_extractor_spark.streaming.incremental import TRANSCRIPT_SCHEMA  # noqa: F401
from entity_extractor_spark.streaming.stateful import (
    dedup_stream,
    heavy_hitters_stream,
    sessionize_stream,
    windowed_event_counts,
)

EVENT_SCHEMA = "user_id long, ts timestamp"


def _write_wave(spark, path, rows):
    # one file per wave — each wave is exactly one micro-batch
    pdf = pd.DataFrame(rows, columns=["user_id", "ts"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(path)


def _drain(df_fn, inp, ckpt, outp):
    # file sink (not memory): the only sink that supports checkpoint
    # RECOVERY, which is the state-across-restart property under test
    q = (
        df_fn(inp)
        .writeStream.format("parquet")
        .option("path", outp)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_sessionize_stream_across_batches(spark, tmp_path):
    inp = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    # wave 1: user 1 has two sessions (10:00/10:10 then 12:00), user 2 one
    _write_wave(
        spark,
        inp,
        [
            (1, "2026-01-01 10:00:00"),
            (1, "2026-01-01 10:10:00"),
            (1, "2026-01-01 12:00:00"),
            (2, "2026-01-01 10:00:00"),
        ],
    )
    def build(path):
        stream = spark.readStream.schema(EVENT_SCHEMA).parquet(path)
        return sessionize_stream(stream, key="user_id", ts="ts", gap_seconds=1800)

    expected = {
        (1, "2026-01-01 10:00:00", "2026-01-01 10:10:00", 2),
        (1, "2026-01-01 12:00:00", "2026-01-01 12:00:00", 1),
        (2, "2026-01-01 10:00:00", "2026-01-01 10:00:00", 1),
    }
    outp = str(tmp_path / "out")
    # drain 1: the gap rule closes user 1's first session immediately;
    # user 2's single-event session MAY also close here via event-time
    # timeout (drain-1's final watermark is 11:50 > its 10:30 timeout);
    # user 1's 12:00 session must stay open
    _drain(build, inp, ckpt, outp)
    first = {
        (r["key"], str(r["session_start"]), str(r["session_end"]), r["n_events"])
        for r in spark.read.parquet(outp).collect()
    }
    assert (1, "2026-01-01 10:00:00", "2026-01-01 10:10:00", 2) in first
    assert first <= expected
    assert (1, "2026-01-01 12:00:00", "2026-01-01 12:00:00", 1) not in first

    # wave 2: far-future sentinel per user; drain 2 RESUMES from the
    # checkpoint (state survives restart) and closes the open sessions
    _write_wave(spark, inp, [(1, "2026-01-02 00:00:00"), (2, "2026-01-02 00:00:00")])
    _drain(build, inp, ckpt, outp)
    rows = {
        (r["key"], str(r["session_start"]), str(r["session_end"]), r["n_events"])
        for r in spark.read.parquet(outp).collect()
    }
    assert first <= rows  # append-only sink: drain-1 output preserved
    assert rows == expected
    # matches the batch operator's session boundaries (streaming twin)
    from entity_extractor_spark.operators.temporal import sessionize

    batch = (
        sessionize(spark.read.parquet(inp), "user_id", gap_seconds=1800)
        .groupBy("user_id", "session_idx")
        .agg(F.min("ts").alias("s"), F.max("ts").alias("e"), F.count(F.lit(1)).alias("n"))
    )
    closed_batch = {
        (r["user_id"], str(r["s"]), str(r["e"]), r["n"])
        for r in batch.collect()
        # drop each user's final (still-open in streaming terms) session
        if str(r["s"]) < "2026-01-02"
    }
    assert rows == closed_batch


def test_sessionize_stream_late_event_merges_split_sessions(spark, tmp_path):
    """The watermark-finalization rule: two gap-split sessions must NOT
    be emitted while a within-watermark late event could still bridge
    them (the round-2 code-review counterexample). Events 0s and 2000s
    (gap 1800s) arrive first; a late 1500s event then bridges them —
    the output must be ONE merged session of 3 events."""
    import pandas as pd

    inp = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    outp = str(tmp_path / "out")

    BASE = 86_400  # keep clear of epoch 0 == the initial watermark value

    def _write(secs):
        pdf = pd.DataFrame(
            {"user_id": [1] * len(secs), "ts": pd.to_datetime([BASE + s for s in secs], unit="s")}
        )
        spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(inp)

    def build(path):
        stream = spark.readStream.schema(EVENT_SCHEMA).parquet(path)
        return sessionize_stream(
            stream, key="user_id", ts="ts", gap_seconds=1800, watermark="10 minutes"
        )

    _write([0, 2000])
    _drain(build, inp, ckpt, outp)
    # late-but-in-watermark bridge event, plus a far sentinel to finalize
    _write([1500, 100000])
    _drain(build, inp, ckpt, outp)
    rows = {
        (
            int(r["session_start"].timestamp()) - BASE,
            int(r["session_end"].timestamp()) - BASE,
            r["n_events"],
        )
        for r in spark.read.parquet(outp).collect()
    }
    assert rows == {(0, 2000, 3)}, rows


def test_dedup_stream_across_batches_and_restart(spark, tmp_path):
    """Streaming dedup: duplicates within the watermark are dropped
    across micro-batches AND across a checkpoint restart (the dedup
    state lives in the checkpoint, mirroring the batch UNIQUE
    semantics)."""
    inp = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    outp = str(tmp_path / "out")

    def build(path):
        stream = spark.readStream.schema(EVENT_SCHEMA).parquet(path)
        return dedup_stream(stream, ["user_id"], ts="ts", watermark="10 minutes")

    # wave 1: user 1 twice (intra-batch dup), user 2 once
    _write_wave(
        spark,
        inp,
        [
            (1, "2026-01-01 10:00:00"),
            (1, "2026-01-01 10:00:30"),
            (2, "2026-01-01 10:01:00"),
        ],
    )
    _drain(build, inp, ckpt, outp)
    # wave 2 — a NEW query from the same checkpoint (restart): user 1
    # again within the watermark (must be dropped from persisted state),
    # user 3 new (must pass)
    _write_wave(
        spark,
        inp,
        [
            (1, "2026-01-01 10:02:00"),
            (3, "2026-01-01 10:02:00"),
        ],
    )
    _drain(build, inp, ckpt, outp)
    got = spark.read.parquet(outp).groupBy("user_id").count().collect()
    counts = {r["user_id"]: r["count"] for r in got}
    assert counts == {1: 1, 2: 1, 3: 1}


def test_windowed_event_counts_watermark(spark, tmp_path):
    inp = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    _write_wave(
        spark,
        inp,
        [
            (1, "2026-01-01 10:05:00"),
            (2, "2026-01-01 10:55:00"),
            (1, "2026-01-01 11:05:00"),
        ],
    )
    def build(path):
        stream = spark.readStream.schema(EVENT_SCHEMA).parquet(path)
        return windowed_event_counts(
            stream, group_col="user_id", ts="ts", window="1 hour", watermark="30 minutes"
        )

    outp = str(tmp_path / "out")
    _drain(build, inp, ckpt, outp)
    # sentinel far past the watermark horizon finalizes the earlier windows
    _write_wave(spark, inp, [(1, "2026-01-01 15:00:00")])
    _drain(build, inp, ckpt, outp)
    rows = {
        (str(r["window_start"]), r["user_id"], r["n"])
        for r in spark.read.parquet(outp).collect()
    }
    # finalized windows only (the 15:00 sentinel window is still open)
    assert rows == {
        ("2026-01-01 10:00:00", 1, 1),
        ("2026-01-01 10:00:00", 2, 1),
        ("2026-01-01 11:00:00", 1, 1),
    }


def test_parity_keys_match_oracle_under_non_utc_timezone(spark):
    """The streaming parity contract keys must hash-match their DuckDB
    oracles under a NON-UTC caller session: the window/sessionize keys
    pin the drain to UTC via contract.curation._utc_drain (F.window
    aligns to UTC-epoch boundaries and the sessionizer's watermark is
    UTC-epoch ms, while the oracles compute on naive timestamps), and
    the dedup key's key-set output is shift-invariant by construction.
    Also asserts the caller's timezone survives the drain (the context
    restores it)."""
    import os

    import duckdb

    import __spark_entry__ as entry_mod
    from entity_extractor_spark.contract.compare import compare_frames
    from entity_extractor_spark.io.sources import TPCH_TABLES

    sf = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")
    con = duckdb.connect()
    for t in TPCH_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")  # +05:30
    try:
        for key in (
            "dedup_stream_parity",
            "windowed_counts_parity",
            "sessionize_parity",
            "hh_stream_parity",  # epoch-ms arithmetic only — TZ-free by construction
            "rollup_stream_parity",  # pinned-UTC drain + TZ-free string hours
        ):
            got = qs[key](spark, sf).toPandas()
            exp = con.execute(oracles[key]).df()
            err = compare_frames(got, exp, key)
            assert err is None, err
        assert spark.conf.get("spark.sql.session.timeZone") == "Asia/Kolkata"
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
        con.close()


DOC_SCHEMA = "doc_id long, text string, ts timestamp"


def _write_doc_wave(spark, path, rows, ts):
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    pdf["ts"] = pd.to_datetime(ts, unit="s")
    spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(path)


def test_heavy_hitters_stream_candidates_across_drains(spark, tmp_path):
    """Streaming MG summaries carried across two separate AvailableNow
    drains (state lives in the checkpoint) must still yield an exact
    heavy-hitter set after the shared recount: summaries flushed per
    (shard, epoch) stay a candidate superset even though the first
    drain's flush resets the state mid-corpus."""
    from entity_extractor_spark.operators.sketches import heavy_hitters, hh_recount

    inp, ckpt, outp = (str(tmp_path / d) for d in ("in", "ckpt", "out"))
    wave1 = [(i, "alpha common " + " ".join(f"w1u{i}x{j}" for j in range(5))) for i in range(20)]
    # wave 2 must carry LATER event time: the flush timeout is set at
    # watermark+1, so each drain's final no-data batch only fires it if
    # the wave advanced the watermark
    wave2 = [(100 + i, "beta common " + " ".join(f"w2u{i}x{j}" for j in range(5))) for i in range(20)]

    def build(path):
        stream = spark.readStream.schema(DOC_SCHEMA).parquet(path)
        return heavy_hitters_stream(stream, support=0.05, shards=4)

    _write_doc_wave(spark, inp, wave1, ts=1000)
    _drain(build, inp, ckpt, outp)
    _write_doc_wave(spark, inp, wave2, ts=2000)
    _drain(build, inp, ckpt, outp)

    docs = spark.createDataFrame(wave1 + wave2, "doc_id long, text string")
    cands = spark.read.parquet(outp)
    got = {tuple(r) for r in hh_recount(docs, cands, support=0.05).collect()}
    exp = {tuple(r) for r in heavy_hitters(docs, support=0.05).collect()}
    assert got == exp
    assert {t for t, _, _ in got} >= {"alpha", "beta", "common"}


def test_heavy_hitters_stream_state_is_bounded(spark, tmp_path):
    """The flushed candidate emission is <= shards * k tokens — the
    bounded-state property (MG capacity k per shard) observed from the
    outside."""
    import math

    inp, ckpt, outp = (str(tmp_path / d) for d in ("in", "ckpt", "out"))
    support, shards = 0.1, 2
    rows = [(i, " ".join(f"v{i}w{j}" for j in range(20))) for i in range(50)]

    def build(path):
        stream = spark.readStream.schema(DOC_SCHEMA).parquet(path)
        return heavy_hitters_stream(stream, support=support, shards=shards)

    _write_doc_wave(spark, inp, rows, ts=1000)
    _drain(build, inp, ckpt, outp)
    n_cands = spark.read.parquet(outp).count()
    assert n_cands <= shards * math.ceil(1.0 / support)


def test_postings_stream_append_across_drains(spark, tmp_path):
    """Incremental gram-index maintenance: two corpus waves drained
    through the batch posting builder under Structured Streaming must
    append exactly each wave's postings once (exactly-once via the
    checkpoint) — the union equals the batch build over the combined
    corpus, with no duplicates from the restart."""
    from entity_extractor_spark.operators.search import build_gram_postings

    inp, ckpt, outp = (str(tmp_path / d) for d in ("in", "ckpt", "out"))
    wave1 = [(1, "hello spark"), (2, "ab")]  # doc 2: sub-3-char, no postings
    wave2 = [(3, "hello again")]

    def build(path):
        stream = spark.readStream.schema("doc_id long, text string").parquet(path)
        return build_gram_postings(stream)

    pd_schema = ["doc_id", "text"]
    for wave in (wave1, wave2):
        pdf = pd.DataFrame(wave, columns=pd_schema)
        spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(inp)
        _drain(build, inp, ckpt, outp)

    got = {tuple(r) for r in spark.read.parquet(outp).collect()}
    batch = {
        tuple(r)
        for r in build_gram_postings(
            spark.createDataFrame(wave1 + wave2, "doc_id long, text string")
        ).collect()
    }
    assert got == batch
    assert not any(d == 2 for d, _ in got)
    assert spark.read.parquet(outp).count() == len(got)  # no dup rows


def test_rollup_delta_maintenance_across_drains(spark, tmp_path):
    """Delta-based rollup maintenance: each drain writes ONLY its own
    batch partials (idempotent batch_id dirs), and the summed view
    always equals the batch GROUP BY over everything ingested so far —
    the first wave's files are never rewritten by the second drain."""
    import os

    import __spark_entry__  # noqa: F401  (same helpers used by the contract key)
    from entity_extractor_spark.contract.curation import _utc_drain

    inp, ckpt, out = (str(tmp_path / d) for d in ("in", "ckpt", "out"))

    def drain():
        with _utc_drain(spark):
            stream = (
                spark.readStream.schema(EVENT_SCHEMA)
                .parquet(inp)
                .select(F.col("user_id").cast("string").alias("event_type"),
                        F.col("ts").cast("timestamp").alias("ts"))
            )

            def up(bdf, bid):
                (
                    bdf.groupBy(
                        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00").alias("hour"),
                        "event_type",
                    )
                    .agg(F.count(F.lit(1)).alias("partial_n"))
                    .write.mode("overwrite")
                    .parquet(f"{out}/batch_id={bid}")
                )

            q = (
                stream.writeStream.foreachBatch(up)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

    _write_wave(spark, inp, [(1, "2026-01-01 10:05:00"), (2, "2026-01-01 10:40:00")])
    drain()
    batches_after_1 = set(os.listdir(out))
    mtimes_1 = {d: os.path.getmtime(f"{out}/{d}") for d in batches_after_1 if d.startswith("batch_id")}
    _write_wave(spark, inp, [(1, "2026-01-01 11:05:00"), (1, "2026-01-01 10:50:00")])
    drain()
    rollup = {
        (r["hour"], r["event_type"]): r["n"]
        for r in spark.read.parquet(out)
        .groupBy("hour", "event_type")
        .agg(F.sum("partial_n").alias("n"))
        .collect()
    }
    assert rollup == {
        ("2026-01-01 10:00", "1"): 2,
        ("2026-01-01 10:00", "2"): 1,
        ("2026-01-01 11:00", "1"): 1,
    }
    # incremental: wave-1 partials untouched by drain 2
    for d, m in mtimes_1.items():
        assert os.path.getmtime(f"{out}/{d}") == m
