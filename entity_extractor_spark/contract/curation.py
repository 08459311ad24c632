"""Training-data curation queries: dedup, similarity search, text
analysis, multimodal metadata — each with an exactly-mirrored DuckDB
oracle over the driver's documents/embeddings parquet."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from entity_extractor_spark.functions import hashing as H
from entity_extractor_spark.functions import text as T
from entity_extractor_spark.operators import dedup as D
from entity_extractor_spark.operators import simsearch as S
from entity_extractor_spark.operators import textstats as X
from entity_extractor_spark.operators.sketches import heavy_hitters_sql as _hh_sql

EMB_DIM = 64
ANN_QUERY_MAX_ID = 10
ANN_K = 5
EMB_DUP_T = 0.4
LSH_JACCARD_T = 0.5
LSH_MAX_BUCKET = 10_000
NGRAM_JACCARD_T = 0.2
SIMHASH_MAX_HAMMING = 3

_TOKS = f"list_distinct({T.tokenize_sql('text')})"
_HM = f"({H.token_hash_sql('t')} % {H.MINHASH_PRIME})"


def _load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from entity_extractor_spark.io.sources import load_table

    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------- dedup


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.exact_dedup(_load(spark, sf_dir, "documents")).orderBy("doc_id")


def q_minhash_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.minhash_signatures(_load(spark, sf_dir, "documents")).orderBy("doc_id")


def q_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.minhash_lsh_pairs(
        _load(spark, sf_dir, "documents"),
        threshold=LSH_JACCARD_T,
        max_bucket=LSH_MAX_BUCKET,
    ).orderBy("i", "j")


def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.ngram_jaccard_pairs(
        _load(spark, sf_dir, "documents"), n=3, threshold=NGRAM_JACCARD_T
    ).orderBy("i", "j")


def q_prefix_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-filtered EXACT Jaccard join (AllPairs/PPJoin family) at
    t = 4/5; the oracle is the naive quadratic join, so the hash match
    proves the rarest-first prefix filter loses no pair."""
    return D.prefix_jaccard_pairs(_load(spark, sf_dir, "documents")).orderBy("i", "j")


def q_simhash_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.simhash(_load(spark, sf_dir, "documents")).orderBy("doc_id")


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.simhash_pairs(
        _load(spark, sf_dir, "documents"), max_hamming=SIMHASH_MAX_HAMMING
    ).orderBy("i", "j")


def q_embedding_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs baseline — deliberately quadratic, run only on the
    bounded embeddings table as the verification oracle for the LSH
    scale path (`embedding_dups_lsh`)."""
    e = _load(spark, sf_dir, "embeddings")
    nrm = S.norm_expr(F.col("embedding"))
    a = e.select(F.col("vec_id").alias("i"), F.col("embedding").alias("va"), nrm.alias("na"))
    b = e.select(F.col("vec_id").alias("j"), F.col("embedding").alias("vb"), nrm.alias("nb"))
    cos = S.paired_cosine(F.col("va"), F.col("vb"), F.col("na"), F.col("nb"))
    return (
        a.join(b, F.col("i") < F.col("j"))
        .select("i", "j", F.round(cos, 6).alias("cos"))
        .filter(F.col("cos") >= EMB_DUP_T)
        .orderBy("i", "j")
    )


EMB_LSH_MAX_BUCKET = 10_000


def q_embedding_dups_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH-bucketed near-dup pairs — the scale path (equi self-join
    on bucket with a hot-bucket guard, never all-pairs); exact-mirrored
    oracle including the guard."""
    return S.embedding_near_dups(
        _load(spark, sf_dir, "embeddings"),
        dim=EMB_DIM,
        threshold=EMB_DUP_T,
        max_bucket=EMB_LSH_MAX_BUCKET,
    ).orderBy("i", "j")


# --------------------------------------------------------------------------- similarity search


def q_ann_brute_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < ANN_QUERY_MAX_ID)
    return S.brute_force_topk(e, q, k=ANN_K).orderBy("query_id", "rank")


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < ANN_QUERY_MAX_ID)
    return S.lsh_topk(e, q, dim=EMB_DIM, k=ANN_K).orderBy("query_id", "rank")


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < ANN_QUERY_MAX_ID)
    return S.ivf_topk(e, q, dim=EMB_DIM, k=ANN_K).orderBy("query_id", "rank")


# --------------------------------------------------------------------------- text analysis


TFIDF_QUERY_IDS = [0, 1, 2, 3, 4]


def q_ann_recall_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query recall@k of the multi-probe sign-LSH index vs the exact
    brute-force baseline — retrieval QUALITY as a hash-verified contract
    value, not just a test assertion. Both sides and the recall join are
    mirrored exactly in SQL (`operators/ann_eval.py:topk_recall`)."""
    from entity_extractor_spark.operators.ann_eval import topk_recall

    e = _load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < ANN_QUERY_MAX_ID)
    approx = S.lsh_topk(e, q, dim=EMB_DIM, k=ANN_K)
    exact = S.brute_force_topk(e, q, k=ANN_K)
    return topk_recall(approx, exact, ANN_K).orderBy("query_id")


def q_ann_recall_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query recall@k of the IVF index vs exact brute force — same
    hash-verified quality contract as `ann_recall_lsh`."""
    from entity_extractor_spark.operators.ann_eval import topk_recall

    e = _load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < ANN_QUERY_MAX_ID)
    approx = S.ivf_topk(e, q, dim=EMB_DIM, k=ANN_K)
    exact = S.brute_force_topk(e, q, k=ANN_K)
    return topk_recall(approx, exact, ANN_K).orderBy("query_id")


IVF_TRAIN_SAMPLE = 2048
IVF_TRAIN_ITERS = 8


def q_ann_ivf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query recall@k of the TRAINED-bank IVF index (deterministic
    k-means centroids fitted on a content-hash-ordered sample,
    `operators/simsearch.py:train_centroids`) vs exact brute force —
    the production IVF recipe as a hash-verified contract value. The
    oracle trains the bit-identical bank via the sessionless twin
    (`train_centroids_local`) and embeds it as SQL literals, exactly as
    the engine embeds it as plan literals."""
    from entity_extractor_spark.operators.ann_eval import topk_recall

    e = _load(spark, sf_dir, "embeddings")
    cents = S.train_centroids(
        e, dim=EMB_DIM, sample_size=IVF_TRAIN_SAMPLE, n_iters=IVF_TRAIN_ITERS
    )
    q = e.filter(F.col("vec_id") < ANN_QUERY_MAX_ID)
    approx = S.ivf_topk(e, q, dim=EMB_DIM, k=ANN_K, centroids=cents)
    exact = S.brute_force_topk(e, q, k=ANN_K)
    return topk_recall(approx, exact, ANN_K).orderBy("query_id")


def q_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from entity_extractor_spark.operators.tfidf import tfidf_topk

    return tfidf_topk(
        _load(spark, sf_dir, "documents"), TFIDF_QUERY_IDS, k=ANN_K
    ).orderBy("query_id", "rank")


def q_lang_id_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _load(spark, sf_dir, "documents")
    return (
        d.select("lang", X.language_id(F.col("text")).alias("pred_lang"))
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang", "pred_lang")
    )


def q_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _load(spark, sf_dir, "documents")
    q = X.quality_score(F.col("text"))
    return d.select(
        "doc_id", q.alias("quality"), X.quality_bucket(q).alias("bucket")
    ).orderBy("doc_id")


def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _load(spark, sf_dir, "documents")
    tc = X.token_counts(F.col("text"))
    return d.select(
        "doc_id", tc["n_ws_tokens"].alias("n_ws_tokens"),
        tc["n_bpe_tokens"].alias("n_bpe_tokens"), tc["chars_per_bpe"].alias("chars_per_bpe"),
    ).orderBy("doc_id")


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _load(spark, sf_dir, "documents")
    return d.select("doc_id", *X.doc_fingerprint(F.col("text"))).orderBy("doc_id")


# --------------------------------------------------------------------------- sampling / packing

SAMPLE_FRACTION = 0.1
PACK_BUDGET = 512
from entity_extractor_spark.operators.sampling import N_PACK_SHARDS as PACK_SHARDS  # noqa: E402
from entity_extractor_spark.operators.sampling import bucket_threshold  # noqa: E402


def q_det_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from entity_extractor_spark.operators.sampling import deterministic_sample

    d = _load(spark, sf_dir, "documents")
    return (
        deterministic_sample(d, "doc_id", SAMPLE_FRACTION)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("lang")
    )


def q_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from entity_extractor_spark.operators.sampling import split_report

    return split_report(_load(spark, sf_dir, "documents"), "doc_id", by="lang")


def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from entity_extractor_spark.operators.sampling import packing_report

    return packing_report(_load(spark, sf_dir, "documents"), PACK_BUDGET)


STRATA_FRACTIONS = {"en": 1.0, "de": 0.5, "es": 0.1}


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum mixing weights (keep all en, half de, 10% es; drop the
    rest) — the LLM data-mixing primitive, content-hash deterministic."""
    from entity_extractor_spark.operators.sampling import stratified_sample

    d = _load(spark, sf_dir, "documents")
    return (
        stratified_sample(d, "doc_id", "lang", STRATA_FRACTIONS)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("lang")
    )


def q_sequence_packing_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-descending first-fit packing variant: per-(shard,bin) fill
    stats with long docs packed first."""
    from entity_extractor_spark.operators.sampling import pack_sequences

    packed = pack_sequences(
        _load(spark, sf_dir, "documents"), PACK_BUDGET, order="tokens_desc"
    )
    return (
        packed.groupBy("shard", "bin")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_tokens").alias("n_tokens"))
        .orderBy("shard", "bin")
    )


# --------------------------------------------------------------------------- multimodal


# cluster resolution runs the LSH pair graph at a high-precision
# threshold: near-dup clusters should merge only true rewrites, and 0.8
# keeps the DuckDB transitive-closure oracle's reach set small enough to
# stay exact at sf0.01
DUP_CLUSTER_T = 0.8


def q_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.dup_clusters(
        _load(spark, sf_dir, "documents"),
        threshold=DUP_CLUSTER_T,
        max_bucket=LSH_MAX_BUCKET,
    ).orderBy("doc_id")


def q_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    return X.repetition_signals(_load(spark, sf_dir, "documents")).orderBy("doc_id")


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    from entity_extractor_spark.operators.pii import attach_pii, scrub_pii

    d = attach_pii(_load(spark, sf_dir, "documents"))
    return scrub_pii(d).select(
        "doc_id", "n_email", "n_ip", "n_phone", "clean_text"
    ).orderBy("doc_id")


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from entity_extractor_spark.operators.multimodal import attach_payloads

    assets = attach_payloads(_load(spark, sf_dir, "documents"))
    return assets.select("asset_id", "kind", "n_bytes", "magic_hex").orderBy("asset_id")


def q_multimodal_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from entity_extractor_spark.operators.multimodal import asset_metadata_report, attach_payloads

    return asset_metadata_report(attach_payloads(_load(spark, sf_dir, "documents")))


def q_wav_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL codec round trip: text -> genuine RIFF/WAVE PCM16 container
    (stdlib wave writer) -> stdlib wave decode -> typed audio features.
    The oracle predicts every column independently from the text, so any
    corruption in the encode/container/decode path hash-mismatches."""
    from entity_extractor_spark.operators.multimodal import decode_wav, wav_payloads

    return decode_wav(wav_payloads(_load(spark, sf_dir, "documents"))).orderBy("asset_id")


def q_bmp_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image codec round trip (the image twin of `wav_decode`):
    text -> genuine 24-bit BMP container (pure struct/numpy writer,
    bottom-up scanlines, 4-byte row padding) -> struct/numpy decode ->
    exact integer pixel statistics. The oracle predicts every column
    independently from the text, so any corruption in the
    encode/container/decode path hash-mismatches."""
    from entity_extractor_spark.operators.multimodal import bmp_payloads, decode_bmp

    return decode_bmp(bmp_payloads(_load(spark, sf_dir, "documents"))).orderBy("asset_id")


def q_avi_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video codec round trip (closes the last stubbed modality):
    text -> genuine uncompressed AVI container (pure struct/numpy RIFF
    writer: hdrl avih/strh/strf + movi '00db' DIB frames) -> RIFF-walk
    decode -> exact integer per-video features including inter-frame
    motion computed from DECODED pixels. The oracle predicts every
    column independently from the text, so any corruption in the
    encode/container/decode path hash-mismatches."""
    from entity_extractor_spark.operators.multimodal import avi_payloads, decode_avi

    return decode_avi(avi_payloads(_load(spark, sf_dir, "documents"))).orderBy("asset_id")


def q_avi_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL frame sampling over the AVI container (X5 flatMap fan-out:
    one row per sampled frame) with exact grayscale stats per decoded
    frame — the production form of the former pyav stub."""
    from entity_extractor_spark.operators.multimodal import avi_payloads, sample_avi_frames

    return (
        sample_avi_frames(avi_payloads(_load(spark, sf_dir, "documents")), every_k=2)
        .orderBy("asset_id", "frame_idx")
    )


def _parity_stream_table(spark: SparkSession, sf_dir: str, key: str, table: str):
    """(stream, out_path, ckpt_path) for a streaming parity drain: the
    table's parquet is readStream'd in place when it is a directory, or
    via a SYMLINK into the scratch dir when it is a single file
    (FileStreamSource requires a directory source) — never a batch
    rewrite of the input. Sink + checkpoint live in a DETERMINISTIC
    scratch dir wiped at the start of every invocation. The dir must
    outlive the query function (the returned result DataFrame reads the
    sink lazily, the driver collects later), so cleanup is
    wipe-on-next-use — accumulation is bounded at one sink+checkpoint
    per (key, corpus) instead of one per run."""
    import hashlib
    import os
    import shutil
    import tempfile

    path = f"{sf_dir}/{table}.parquet"
    schema = spark.read.parquet(path).schema
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    tmp = os.path.join(tempfile.gettempdir(), f"ee_spark_parity_{key}_{tag}")
    shutil.rmtree(tmp, ignore_errors=True)
    src = path
    if not os.path.isdir(path):
        os.makedirs(f"{tmp}/in")
        os.symlink(os.path.abspath(path), f"{tmp}/in/{table}.parquet")
        src = f"{tmp}/in"
    return spark.readStream.schema(schema).parquet(src), f"{tmp}/out", f"{tmp}/ckpt"


def _parity_stream_events(spark: SparkSession, sf_dir: str, key: str):
    return _parity_stream_table(spark, sf_dir, key, "events")


def _utc_drain(spark: SparkSession):
    """Context manager forcing the session timezone to UTC for the
    duration of a streaming drain, restoring the caller's setting after.

    The tumbling-window and sessionize parity keys are TZ-sensitive:
    the NTZ->timestamp cast interprets naive values in the SESSION
    timezone, while F.window aligns to UTC-epoch boundaries and
    applyInPandasWithState's watermark is UTC-epoch ms — under a
    non-UTC session (+05:30 say) hour windows land on :30 local marks
    and the sessionizer's finalization cutoff shifts by the offset,
    so every row would hash-mismatch the oracle's naive-timestamp SQL.
    Pinning UTC for the drain makes naive == UTC and the emitted NTZ
    results timezone-free. Every TZ-sensitive transformation must be
    CONSTRUCTED inside the context, not merely started: PySpark
    analyzes each DataFrame operation eagerly and Cast captures the
    session timezone at analysis time (verified — a cast built outside
    the context keeps the caller's zone even when the stream starts
    inside it)."""
    from contextlib import contextmanager

    @contextmanager
    def _cm():
        old = spark.conf.get("spark.sql.session.timeZone")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        try:
            yield
        finally:
            spark.conf.set("spark.sql.session.timeZone", old)

    return _cm()


def q_dedup_stream_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch parity for the streaming dedup (`streaming/stateful.py:
    dedup_stream`): drain the events table through the REAL streaming
    operator — file source -> dropDuplicatesWithinWatermark -> parquet
    sink under Trigger.AvailableNow — with a watermark delay wider than
    the corpus's event-time span (so no key's state expires mid-drain),
    then return the surviving key set. Within the lateness bound the
    streaming contract IS exactly-once per key, so the result must equal
    batch DISTINCT — the oracle. Only the key columns are returned:
    WHICH duplicate row survives depends on arrival order, the key set
    does not."""
    from entity_extractor_spark.streaming.stateful import dedup_stream

    stream, out, ckpt = _parity_stream_events(spark, sf_dir, "dedup")
    # watermarks require TIMESTAMP (with tz); the parquet column is NTZ.
    # The uniform tz shift cannot change which keys survive, so (unlike
    # the window/sessionize keys) no _utc_drain is needed here.
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    q = (
        dedup_stream(stream, ["user_id", "event_type"], ts="ts", watermark="3650 days")
        .select("user_id", "event_type")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out).orderBy("user_id", "event_type")


def q_windowed_counts_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch parity for the watermarked tumbling-window aggregation
    (`streaming/stateful.py: windowed_event_counts`): drain the events
    table through the REAL streaming operator — file source ->
    withWatermark -> window groupBy -> parquet sink under
    Trigger.AvailableNow. With delay "0 seconds" the final watermark is
    max(ts), and append mode emits exactly the windows whose end <= the
    watermark (the final in-flight window stays open in state). The
    oracle is the batch hourly count restricted by the same
    finalization predicate — so the hash match verifies Spark's
    watermark/append emission contract itself, not just the arithmetic.
    The flush relies on the no-data micro-batch Spark runs before an
    AvailableNow drain terminates (verified in
    tests/test_streaming_stateful.py::test_windowed_event_counts_watermark).
    The drain runs under a pinned-UTC session (:func:`_utc_drain`) so
    window alignment matches the oracle's naive-hour truncation under
    any caller timezone."""
    from entity_extractor_spark.streaming.stateful import windowed_event_counts

    stream, out, ckpt = _parity_stream_events(spark, sf_dir, "windowed")
    with _utc_drain(spark):
        # the casts must be CONSTRUCTED inside the pinned-UTC context:
        # PySpark analyzes each transformation eagerly, and Cast captures
        # the session timezone at analysis time, not at execution
        stream = stream.select("event_type", F.col("ts").cast("timestamp").alias("ts"))
        q = (
            windowed_event_counts(
                stream, group_col="event_type", ts="ts", window="1 hour", watermark="0 seconds"
            )
            .select(
                F.col("window_start").cast("timestamp_ntz").alias("window_start"),
                "event_type",
                "n",
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.read.parquet(out).orderBy("window_start", "event_type")


def q_sessionize_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch parity for the CUSTOM stateful sessionizer
    (`streaming/stateful.py: sessionize_stream`,
    applyInPandasWithState + event-time timeout): drain the events table
    through the real streaming operator under Trigger.AvailableNow and
    compare against a microsecond-precise batch islands oracle. With
    delay "0 seconds" the final watermark is max(ts) FLOORED TO THE
    MILLISECOND (Spark tracks event time in ms), and the operator emits
    exactly the sessions with end + gap strictly before it — the oracle
    mirrors both the flooring and the strictness, so the hash match
    verifies the operator's emission contract (timeout scheduling,
    no-data-batch flush, once-only emission), not just the gap merge.
    NOTE: the batch `sessionize` key's oracle compares gaps at SECOND
    granularity (unix_timestamp); this one compares full-precision
    timestamps because the stateful operator merges on microsecond
    arithmetic — the two rules disagree on fractional-second boundary
    gaps, so they deliberately do not share SQL. The drain runs under a
    pinned-UTC session (:func:`_utc_drain`): the kernel sees
    session-local naive microseconds while the watermark is UTC-epoch
    ms, so the finalization cutoff is only oracle-comparable when the
    two clocks coincide."""
    from entity_extractor_spark.streaming.stateful import sessionize_stream

    stream, out, ckpt = _parity_stream_events(spark, sf_dir, "sessionize")
    with _utc_drain(spark):
        # casts constructed inside the pinned-UTC context (see
        # q_windowed_counts_parity: Cast captures the TZ at analysis)
        stream = stream.select("user_id", F.col("ts").cast("timestamp").alias("ts"))
        q = (
            sessionize_stream(
                stream, key="user_id", ts="ts", gap_seconds=1800, watermark="0 seconds"
            )
            .select(
                "key",
                F.col("session_start").cast("timestamp_ntz").alias("session_start"),
                F.col("session_end").cast("timestamp_ntz").alias("session_end"),
                "n_events",
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.read.parquet(out).orderBy("key", "session_start")


def q_hh_stream_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch parity for the streaming Misra-Gries heavy-hitter pass
    (`streaming/stateful.py: heavy_hitters_stream`): drain the documents
    table through the REAL stateful operator — file source -> per-shard
    MG summaries in applyInPandasWithState state -> event-time-timeout
    flush -> parquet sink under Trigger.AvailableNow — then feed the
    emitted candidate set to the shared exact recount
    (`operators/sketches.hh_recount`). The MG superset guarantee holds
    per (shard, epoch), so the recounted result must equal the batch
    `heavy_hitters` key exactly — the oracle IS the same exact SQL.
    Event time is a constant epoch stamp (the corpus has no timestamps;
    with delay 0 the post-drain no-data micro-batch advances the
    watermark past it and flushes every summary). No _utc_drain: the
    watermark arithmetic is epoch-ms and nothing temporal is emitted."""
    from entity_extractor_spark.operators.sketches import hh_recount
    from entity_extractor_spark.streaming.stateful import heavy_hitters_stream

    stream, out, ckpt = _parity_stream_table(spark, sf_dir, "hhstream", "documents")
    stream = stream.select(
        "doc_id", "text", F.timestamp_seconds(F.lit(1000)).alias("ts")
    )
    q = (
        heavy_hitters_stream(stream, ts="ts", watermark="0 seconds")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    cands = spark.read.parquet(out)
    docs = _load(spark, sf_dir, "documents")
    return hh_recount(docs, cands).orderBy("token")


def q_postings_stream_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental gram-index maintenance: drain the documents table
    through the BATCH posting builder applied to a file STREAM
    (`operators/search.build_gram_postings` is a pure stateless
    select+explode, so the identical plan runs under Structured
    Streaming) into an append-only parquet sink — the production form of
    index upkeep, where each arriving corpus file appends exactly its
    own postings (exactly-once via the checkpoint) and the index is
    never rebuilt. The drained sink must equal the batch-built posting
    table row-for-row; the oracle derives the same distinct (doc, gram)
    set in SQL. Closes the S2/P5 loop: the layout the search path
    assumes (`write_range_clustered(gram)`) stays maintainable under
    continuous ingest."""
    from entity_extractor_spark.operators.search import build_gram_postings

    stream, out, ckpt = _parity_stream_table(spark, sf_dir, "postings", "documents")
    q = (
        build_gram_postings(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out).orderBy("doc_id", "gram")


def q_rollup_stream_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-aggregate maintenance: an hourly
    (hour, event_type) rollup kept up to date by a stream of event
    files, each micro-batch writing only its own partial counts as an
    idempotent ``batch_id=<id>`` overwrite (the exactly-once delta-sink
    pattern of `streaming/incremental.py` — a retried batch replaces
    itself instead of double-counting). The serving view is the SUM over
    the appended partials — delta-based view maintenance: the rollup is
    never recomputed from the corpus, yet equals the batch GROUP BY
    exactly, which is what the oracle checks (every hour, no watermark
    finalization cut — unlike `windowed_counts_parity`, which verifies
    the append-mode emission contract instead). The drain runs under a
    pinned-UTC session and the hour is formatted to a TZ-free string
    INSIDE the foreachBatch (Cast/format capture the session timezone
    at analysis time)."""
    stream, out, ckpt = _parity_stream_table(spark, sf_dir, "rollup", "events")
    with _utc_drain(spark):
        stream = stream.select(
            "event_type", F.col("ts").cast("timestamp").alias("ts")
        )

        def _upsert(batch_df: DataFrame, batch_id: int) -> None:
            (
                batch_df.groupBy(
                    F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00").alias(
                        "hour"
                    ),
                    "event_type",
                )
                .agg(F.count(F.lit(1)).alias("partial_n"))
                .write.mode("overwrite")
                .parquet(f"{out}/batch_id={batch_id}")
            )

        q = (
            stream.writeStream.foreachBatch(_upsert)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return (
        spark.read.parquet(out)
        .groupBy("hour", "event_type")
        .agg(F.sum("partial_n").alias("n"))
        .orderBy("hour", "event_type")
    )


QUERIES = {
    "dedup_exact": q_dedup_exact,
    "minhash_signature": q_minhash_signature,
    "minhash_lsh_pairs": q_minhash_lsh_pairs,
    "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
    "prefix_jaccard_pairs": q_prefix_jaccard_pairs,
    "simhash_fingerprint": q_simhash_fingerprint,
    "simhash_pairs": q_simhash_pairs,
    "embedding_dups": q_embedding_dups,
    "embedding_dups_lsh": q_embedding_dups_lsh,
    "ann_brute_topk": q_ann_brute_topk,
    "ann_lsh_topk": q_ann_lsh_topk,
    "ann_ivf_topk": q_ann_ivf_topk,
    "ann_recall_lsh": q_ann_recall_lsh,
    "ann_recall_ivf": q_ann_recall_ivf,
    "ann_ivf_trained": q_ann_ivf_trained,
    "tfidf_topk": q_tfidf_topk,
    "lang_id_counts": q_lang_id_counts,
    "quality_scores": q_quality_scores,
    "token_stats": q_token_stats,
    "doc_fingerprint": q_doc_fingerprint,
    "multimodal_meta": q_multimodal_meta,
    "multimodal_report": q_multimodal_report,
    "wav_decode": q_wav_decode,
    "bmp_decode": q_bmp_decode,
    "avi_decode": q_avi_decode,
    "avi_frames": q_avi_frames,
    "det_sample": q_det_sample,
    "dataset_split": q_dataset_split,
    "sequence_packing": q_sequence_packing,
    "stratified_sample": q_stratified_sample,
    "sequence_packing_sorted": q_sequence_packing_sorted,
    "dup_clusters": q_dup_clusters,
    "repetition_signals": q_repetition_signals,
    "pii_scrub": q_pii_scrub,
    "dedup_stream_parity": q_dedup_stream_parity,
    "windowed_counts_parity": q_windowed_counts_parity,
    "sessionize_parity": q_sessionize_parity,
    "hh_stream_parity": q_hh_stream_parity,
    "postings_stream_parity": q_postings_stream_parity,
    "rollup_stream_parity": q_rollup_stream_parity,
}


# --------------------------------------------------------------------------- oracle SQL


def _minhash_sig_cte() -> str:
    mins = ", ".join(
        f"min({H.minhash_perm_sql(i, 'hm')}) AS s{i}" for i in range(H.MINHASH_K)
    )
    # LEFT JOIN back onto documents with the sentinel defaults: the Spark
    # aggregate fold emits a row for EVERY doc (zero-token docs keep the
    # initial MINHASH_PRIME accumulator), while a bare unnest->GROUP BY
    # would drop them — a row-count parity bug on punctuation-only docs.
    sent = ", ".join(
        f"coalesce(s.s{i}, {H.MINHASH_PRIME}) AS s{i}" for i in range(H.MINHASH_K)
    )
    return f"""
        tok AS (
          SELECT doc_id, unnest({_TOKS}) AS t FROM documents
        ), h AS (
          SELECT doc_id, {_HM} AS hm FROM tok
        ), sig0 AS (
          SELECT doc_id, {mins} FROM h GROUP BY doc_id
        ), sig AS (
          SELECT d.doc_id, {sent} FROM documents d LEFT JOIN sig0 s USING (doc_id)
        )"""


def _simhash_cte() -> str:
    sums = ", ".join(
        f"sum({H.simhash_bit_weight_sql('hm', b)}) AS b{b}" for b in range(H.SIMHASH_BITS)
    )
    fp = " + ".join(
        f"(CASE WHEN b{b} > 0 THEN CAST({1 << b} AS BIGINT) ELSE 0 END)"
        for b in range(H.SIMHASH_BITS)
    )
    # zero-token docs: all bit sums absent -> fingerprint 0 (the Spark
    # fold's initial accumulator), via the same LEFT JOIN sentinel shape
    return f"""
        tok AS (
          SELECT doc_id, unnest({_TOKS}) AS t FROM documents
        ), h AS (
          SELECT doc_id, {_HM} AS hm FROM tok
        ), sums AS (
          SELECT doc_id, {sums} FROM h GROUP BY doc_id
        ), sh0 AS (
          SELECT doc_id, {fp} AS simhash FROM sums
        ), sh AS (
          SELECT d.doc_id, coalesce(s.simhash, 0) AS simhash
          FROM documents d LEFT JOIN sh0 s USING (doc_id)
        )"""


_JACCARD_TAIL = """
        sz AS (SELECT doc_id, count(*) AS sz FROM tok GROUP BY doc_id),
        inter AS (
          SELECT c.i, c.j, count(*) AS inter
          FROM cand c
          JOIN tok ta ON ta.doc_id = c.i
          JOIN tok tb ON tb.doc_id = c.j AND tb.t = ta.t
          GROUP BY c.i, c.j
        ),
        jac AS (
          SELECT i, j, round(inter * 1.0 / (si.sz + sj.sz - inter), 6) AS jaccard
          FROM inter
          JOIN sz si ON si.doc_id = i
          JOIN sz sj ON sj.doc_id = j
        )"""


def _band_sql() -> str:
    parts = []
    for b in range(H.LSH_BANDS):
        cols = " || ':' || ".join(
            f"s{b * H.LSH_ROWS + r}::VARCHAR" for r in range(H.LSH_ROWS)
        )
        parts.append(f"SELECT doc_id, {b} AS band, md5({cols}) AS h FROM sig")
    return " UNION ALL ".join(parts)


def _ann_scored_cte(bucketed: bool) -> str:
    cos = S.cosine_sql("q.qv", "e.embedding")
    if bucketed:
        bexpr = S.lsh_bucket_sql("embedding", EMB_DIM)
        # Multi-probe mirror: the Spark side explodes the query over XOR
        # masks and equi-joins on bucket; the set of joined pairs equals
        # "Hamming(buckets) <= PROBE_HAMMING", which is the direct SQL form.
        return f"""
        b AS (SELECT vec_id, embedding, {bexpr} AS bucket FROM embeddings),
        q AS (SELECT vec_id AS query_id, embedding AS qv, bucket FROM b WHERE vec_id < {ANN_QUERY_MAX_ID}),
        s AS (
          SELECT q.query_id, e.vec_id AS neighbor_id, round({S.cosine_sql('q.qv', 'e.embedding')}, 6) AS cos
          FROM b e JOIN q
            ON bit_count(xor(e.bucket::BIGINT, q.bucket::BIGINT)) <= {S.PROBE_HAMMING}
           AND e.vec_id <> q.query_id
        )"""
    return f"""
        q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < {ANN_QUERY_MAX_ID}),
        s AS (
          SELECT q.query_id, e.vec_id AS neighbor_id, round({cos}, 6) AS cos
          FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id
        )"""


def _ann_ivf_cte() -> str:
    """IVF oracle: corpus cell = argmax centroid dot (first-index
    tie-break, 1-indexed lists); queries probe their best N_PROBE cells
    via a row_number over (score DESC, cid)."""
    cs_emb = S.centroid_scores_sql("embedding", EMB_DIM)
    return f"""
        b AS (
          SELECT vec_id, embedding,
                 CAST(list_position(cs, list_aggregate(cs, 'max')) - 1 AS INT) AS cell
          FROM (SELECT vec_id, embedding, {cs_emb} AS cs FROM embeddings)
        ),
        qs AS (
          SELECT vec_id AS query_id, embedding AS qv, {cs_emb} AS qsc
          FROM embeddings WHERE vec_id < {ANN_QUERY_MAX_ID}
        ),
        qp AS (
          SELECT query_id, qv, cell FROM (
            SELECT query_id, qv, CAST(cid AS INT) AS cell,
                   row_number() OVER (PARTITION BY query_id ORDER BY qsc[cid + 1] DESC, cid) AS rn
            FROM qs, unnest(range(0, {S.N_CENTROIDS})) u(cid)
          ) WHERE rn <= {S.N_PROBE}
        ),
        s AS (
          SELECT qp.query_id, b.vec_id AS neighbor_id,
                 round({S.cosine_sql('qp.qv', 'b.embedding')}, 6) AS cos
          FROM b JOIN qp ON b.cell = qp.cell AND b.vec_id <> qp.query_id
        )"""


_ANN_TAIL = f"""
        SELECT query_id, rank, neighbor_id, cos FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
          FROM s
        ) WHERE rank <= {ANN_K} ORDER BY query_id, rank"""


def _ann_ivf_trained_cte() -> str:
    """Trained-bank IVF oracle CTE chain (b/qs/qp/s): same shape as
    :func:`_ann_ivf_cte`, but the per-centroid score is the learned
    nearest-Euclidean form over the bank trained by
    `train_centroids_local` on the SAME embeddings parquet the views
    point at (TEST_SF_DIR; default = the driver's sf0.01)."""
    import os

    sf_dir = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.01")
    cents = S.train_centroids_local(
        f"{sf_dir}/embeddings.parquet",
        sample_size=IVF_TRAIN_SAMPLE,
        n_iters=IVF_TRAIN_ITERS,
    )
    cs_emb = S.centroid_scores_learned_sql("embedding", cents)
    return f"""
        b AS (
          SELECT vec_id, embedding,
                 CAST(list_position(cs, list_aggregate(cs, 'max')) - 1 AS INT) AS cell
          FROM (SELECT vec_id, embedding, {cs_emb} AS cs FROM embeddings)
        ),
        qs AS (
          SELECT vec_id AS query_id, embedding AS qv, {cs_emb} AS qsc
          FROM embeddings WHERE vec_id < {ANN_QUERY_MAX_ID}
        ),
        qp AS (
          SELECT query_id, qv, cell FROM (
            SELECT query_id, qv, CAST(cid AS INT) AS cell,
                   row_number() OVER (PARTITION BY query_id ORDER BY qsc[cid + 1] DESC, cid) AS rn
            FROM qs, unnest(range(0, {S.N_CENTROIDS})) u(cid)
          ) WHERE rn <= {S.N_PROBE}
        ),
        s AS (
          SELECT qp.query_id, b.vec_id AS neighbor_id,
                 round({S.cosine_sql('qp.qv', 'b.embedding')}, 6) AS cos
          FROM b JOIN qp ON b.cell = qp.cell AND b.vec_id <> qp.query_id
        )"""


def _ann_recall_ivf_trained_sql() -> str:
    """Oracle for `ann_ivf_trained`: trained-bank IVF candidate chain +
    exact brute-force chain, joined into per-query recall@k — the same
    tail as :func:`_ann_recall_ivf_sql`."""
    ex_cos = S.cosine_sql("q2.qv", "e.embedding")
    return f"""
        WITH {_ann_ivf_trained_cte()},
        ivf_k AS (
          SELECT query_id, neighbor_id FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
            FROM s
          ) WHERE rank <= {ANN_K}
        ),
        ex_s AS (
          SELECT q2.query_id, e.vec_id AS neighbor_id, round({ex_cos}, 6) AS cos
          FROM embeddings e CROSS JOIN
               (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
                WHERE vec_id < {ANN_QUERY_MAX_ID}) q2
          WHERE e.vec_id <> q2.query_id
        ),
        ex_k AS (
          SELECT query_id, neighbor_id FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
            FROM ex_s
          ) WHERE rank <= {ANN_K}
        )
        SELECT ex_k.query_id AS query_id,
               CAST(sum(CASE WHEN l.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / {ANN_K} AS recall
        FROM ex_k LEFT JOIN ivf_k l
          ON l.query_id = ex_k.query_id AND l.neighbor_id = ex_k.neighbor_id
        GROUP BY ex_k.query_id ORDER BY query_id"""


def _ann_recall_ivf_sql() -> str:
    """Oracle for `ann_recall_ivf`: the IVF candidate CTE chain
    (`_ann_ivf_cte`: b/qs/qp/s) + an exact brute-force chain with
    disjoint names, joined into per-query recall@k."""
    ex_cos = S.cosine_sql("q2.qv", "e.embedding")
    return f"""
        WITH {_ann_ivf_cte()},
        ivf_k AS (
          SELECT query_id, neighbor_id FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
            FROM s
          ) WHERE rank <= {ANN_K}
        ),
        ex_s AS (
          SELECT q2.query_id, e.vec_id AS neighbor_id, round({ex_cos}, 6) AS cos
          FROM embeddings e CROSS JOIN
               (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
                WHERE vec_id < {ANN_QUERY_MAX_ID}) q2
          WHERE e.vec_id <> q2.query_id
        ),
        ex_k AS (
          SELECT query_id, neighbor_id FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
            FROM ex_s
          ) WHERE rank <= {ANN_K}
        )
        SELECT ex_k.query_id AS query_id,
               CAST(sum(CASE WHEN l.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / {ANN_K} AS recall
        FROM ex_k LEFT JOIN ivf_k l
          ON l.query_id = ex_k.query_id AND l.neighbor_id = ex_k.neighbor_id
        GROUP BY ex_k.query_id ORDER BY query_id"""


def _ann_recall_lsh_sql() -> str:
    """Oracle for `ann_recall_lsh`: rebuild both top-k sets (multi-probe
    LSH and exact brute force) with the same rounding and tie-break as
    `_ann_scored_cte`/`_ANN_TAIL`, LEFT JOIN exact->approx, recall =
    hits / k per query. Division is DOUBLE/int in both engines over
    identical integers, so the value hash is exact."""
    bexpr = S.lsh_bucket_sql("embedding", EMB_DIM)
    lsh_cos = S.cosine_sql("qq.qv", "e.embedding")
    ex_cos = S.cosine_sql("q2.qv", "e.embedding")
    return f"""
        WITH eb AS (SELECT vec_id, embedding, {bexpr} AS bucket FROM embeddings),
        qq AS (SELECT vec_id AS query_id, embedding AS qv, bucket FROM eb WHERE vec_id < {ANN_QUERY_MAX_ID}),
        lsh_s AS (
          SELECT qq.query_id, e.vec_id AS neighbor_id, round({lsh_cos}, 6) AS cos
          FROM eb e JOIN qq
            ON bit_count(xor(e.bucket::BIGINT, qq.bucket::BIGINT)) <= {S.PROBE_HAMMING}
           AND e.vec_id <> qq.query_id
        ),
        lsh_k AS (
          SELECT query_id, neighbor_id FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
            FROM lsh_s
          ) WHERE rank <= {ANN_K}
        ),
        ex_s AS (
          SELECT q2.query_id, e.vec_id AS neighbor_id, round({ex_cos}, 6) AS cos
          FROM embeddings e CROSS JOIN
               (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
                WHERE vec_id < {ANN_QUERY_MAX_ID}) q2
          WHERE e.vec_id <> q2.query_id
        ),
        ex_k AS (
          SELECT query_id, neighbor_id FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
            FROM ex_s
          ) WHERE rank <= {ANN_K}
        )
        SELECT ex_k.query_id AS query_id,
               CAST(sum(CASE WHEN l.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / {ANN_K} AS recall
        FROM ex_k LEFT JOIN lsh_k l
          ON l.query_id = ex_k.query_id AND l.neighbor_id = ex_k.neighbor_id
        GROUP BY ex_k.query_id ORDER BY query_id"""


def _wav_decode_oracle() -> str:
    from entity_extractor_spark.operators.multimodal import decode_wav_expected_sql

    return (
        "SELECT * FROM "
        + decode_wav_expected_sql("SELECT doc_id, text FROM documents")
        + "\nORDER BY asset_id"
    )


def _bmp_decode_oracle() -> str:
    from entity_extractor_spark.operators.multimodal import decode_bmp_expected_sql

    return (
        "SELECT * FROM "
        + decode_bmp_expected_sql("SELECT doc_id, text FROM documents")
        + "\nORDER BY asset_id"
    )


def _avi_decode_oracle() -> str:
    from entity_extractor_spark.operators.multimodal import decode_avi_expected_sql

    return (
        "SELECT * FROM "
        + decode_avi_expected_sql("SELECT doc_id, text FROM documents")
        + "\nORDER BY asset_id"
    )


def _avi_frames_oracle() -> str:
    from entity_extractor_spark.operators.multimodal import sample_avi_frames_expected_sql

    return (
        "SELECT * FROM "
        + sample_avi_frames_expected_sql("SELECT doc_id, text FROM documents", every_k=2)
        + "\nORDER BY asset_id, frame_idx"
    )


def _oracles() -> dict[str, str]:
    norm = T.normalize_text_sql("text")
    shingles3 = f"list_distinct({T.word_shingles_sql(T.tokenize_sql('text'), 3)})"
    tc = X.token_counts_sql("text")
    fp = X.doc_fingerprint_sql("text")
    kind = (
        "CASE lang WHEN 'en' THEN 'image' WHEN 'de' THEN 'audio' WHEN 'es' THEN 'video' "
        "WHEN 'fr' THEN 'image' WHEN 'zh' THEN 'audio' ELSE 'binary' END"
    )
    return {
        "dedup_exact": f"""
            SELECT doc_id,
                   min(doc_id) OVER (PARTITION BY md5({norm})) AS canonical_id,
                   doc_id <> min(doc_id) OVER (PARTITION BY md5({norm})) AS is_dup
            FROM documents ORDER BY doc_id
        """,
        "minhash_signature": f"""
            WITH {_minhash_sig_cte()}
            SELECT * FROM sig ORDER BY doc_id
        """,
        "minhash_lsh_pairs": f"""
            WITH {_minhash_sig_cte()},
            band0 AS ({_band_sql()}),
            band AS (
              -- mirror of the Spark-side max_bucket hot-bucket guard:
              -- drop degenerate (band, h) buckets BEFORE the self-join
              SELECT doc_id, band, h FROM (
                SELECT doc_id, band, h,
                       count(*) OVER (PARTITION BY band, h) AS _n
                FROM band0
              ) WHERE _n <= {LSH_MAX_BUCKET}
            ),
            cand AS (
              SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
              FROM band a JOIN band b ON a.band = b.band AND a.h = b.h AND a.doc_id < b.doc_id
            ),
            {_JACCARD_TAIL}
            SELECT i, j, jaccard FROM jac WHERE jaccard >= {LSH_JACCARD_T} ORDER BY i, j
        """,
        "ngram_jaccard_pairs": f"""
            WITH tok AS (
              SELECT doc_id, unnest({shingles3}) AS t FROM documents
            ),
            cand AS (
              SELECT DISTINCT ta.doc_id AS i, tb.doc_id AS j
              FROM tok ta JOIN tok tb ON ta.t = tb.t AND ta.doc_id < tb.doc_id
            ),
            {_JACCARD_TAIL}
            SELECT i, j, jaccard FROM jac WHERE jaccard >= {NGRAM_JACCARD_T} ORDER BY i, j
        """,
        "prefix_jaccard_pairs": D.prefix_jaccard_pairs_sql("documents")
        + "\nORDER BY i, j",
        "simhash_fingerprint": f"""
            WITH {_simhash_cte()}
            SELECT doc_id, simhash FROM sh ORDER BY doc_id
        """,
        "simhash_pairs": f"""
            WITH {_simhash_cte()},
            band AS (
              SELECT doc_id, simhash, b AS band, (simhash >> (b * 8)) & 255 AS v
              FROM sh, (SELECT unnest([0,1,2,3]) AS b)
            ),
            cand AS (
              SELECT DISTINCT a.doc_id AS i, b.doc_id AS j,
                     bit_count(xor(a.simhash, b.simhash)) AS hamming
              FROM band a JOIN band b ON a.band = b.band AND a.v = b.v AND a.doc_id < b.doc_id
            )
            SELECT i, j, hamming FROM cand WHERE hamming <= {SIMHASH_MAX_HAMMING} ORDER BY i, j
        """,
        "embedding_dups": f"""
            WITH p AS (
              SELECT a.vec_id AS i, b.vec_id AS j,
                     round({S.cosine_sql('a.embedding', 'b.embedding')}, 6) AS cos
              FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            )
            SELECT i, j, cos FROM p WHERE cos >= {EMB_DUP_T} ORDER BY i, j
        """,
        "embedding_dups_lsh": f"""
            WITH b0 AS (
              SELECT vec_id, embedding,
                     {S.lsh_bucket_sql('embedding', EMB_DIM)} AS bucket
              FROM embeddings
            ),
            b AS (
              -- mirror of the Spark-side max_bucket hot-bucket guard
              SELECT vec_id, embedding, bucket FROM (
                SELECT *, count(*) OVER (PARTITION BY bucket) AS _n FROM b0
              ) WHERE _n <= {EMB_LSH_MAX_BUCKET}
            ),
            p AS (
              SELECT a.vec_id AS i, c.vec_id AS j,
                     round({S.cosine_sql('a.embedding', 'c.embedding')}, 6) AS cos
              FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
            )
            SELECT i, j, cos FROM p WHERE cos >= {EMB_DUP_T} ORDER BY i, j
        """,
        "ann_brute_topk": f"WITH {_ann_scored_cte(False)} {_ANN_TAIL}",
        "ann_lsh_topk": f"WITH {_ann_scored_cte(True)} {_ANN_TAIL}",
        "ann_ivf_topk": f"WITH {_ann_ivf_cte()} {_ANN_TAIL}",
        "ann_recall_lsh": _ann_recall_lsh_sql(),
        "ann_recall_ivf": _ann_recall_ivf_sql(),
        "ann_ivf_trained": _ann_recall_ivf_trained_sql(),
        "tfidf_topk": __import__(
            "entity_extractor_spark.operators.tfidf", fromlist=["tfidf_topk_sql"]
        ).tfidf_topk_sql(TFIDF_QUERY_IDS, ANN_K),
        "lang_id_counts": f"""
            SELECT lang, {X.language_id_sql('text')} AS pred_lang, count(*) AS n_docs
            FROM documents GROUP BY 1, 2 ORDER BY lang, pred_lang
        """,
        "quality_scores": f"""
            WITH s AS (SELECT doc_id, {X.quality_score_sql('text')} AS quality FROM documents)
            SELECT doc_id, quality,
                   CASE WHEN quality >= 0.75 THEN 'high'
                        WHEN quality >= 0.5 THEN 'medium' ELSE 'low' END AS bucket
            FROM s ORDER BY doc_id
        """,
        "token_stats": f"""
            SELECT doc_id, {tc['n_ws_tokens']} AS n_ws_tokens,
                   {tc['n_bpe_tokens']} AS n_bpe_tokens,
                   {tc['chars_per_bpe']} AS chars_per_bpe
            FROM documents ORDER BY doc_id
        """,
        "doc_fingerprint": f"""
            SELECT doc_id, {', '.join(fp)} FROM documents ORDER BY doc_id
        """,
        "det_sample": f"""
            SELECT lang, COUNT(*) AS n FROM documents
            WHERE ({H.token_hash_sql('CAST(doc_id AS VARCHAR)')} % {10_000}) < {bucket_threshold(SAMPLE_FRACTION)}
            GROUP BY lang ORDER BY lang
        """,
        "dataset_split": f"""
            WITH s AS (
              SELECT lang,
                     ({H.token_hash_sql('CAST(doc_id AS VARCHAR)')} % {10_000}) AS b
              FROM documents
            )
            SELECT lang,
                   CASE WHEN b < {bucket_threshold(0.8)} THEN 'train' WHEN b < {bucket_threshold(0.8) + bucket_threshold(0.1)} THEN 'val' ELSE 'test' END AS split,
                   COUNT(*) AS n
            FROM s GROUP BY 1, 2 ORDER BY lang, split
        """,
        "sequence_packing": f"""
            WITH t AS (
              SELECT doc_id,
                     ({H.token_hash_sql('CAST(doc_id AS VARCHAR)')} % {PACK_SHARDS}) AS shard,
                     {X.token_counts_sql('text')['n_bpe_tokens']} AS n_tokens
              FROM documents
            ),
            p AS (
              SELECT shard, n_tokens,
                     CAST(floor((sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id) - n_tokens)
                                / {PACK_BUDGET}.0) AS BIGINT) AS bin
              FROM t
            )
            SELECT shard, bin, COUNT(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens
            FROM p GROUP BY shard, bin ORDER BY shard, bin
        """,
        "stratified_sample": f"""
            SELECT lang, COUNT(*) AS n FROM documents
            WHERE ({H.token_hash_sql('CAST(doc_id AS VARCHAR)')} % {10_000}) <
              CASE lang {' '.join(f"WHEN '{s}' THEN {bucket_threshold(f)}" for s, f in sorted(STRATA_FRACTIONS.items()))} ELSE 0 END
            GROUP BY lang ORDER BY lang
        """,
        "sequence_packing_sorted": f"""
            WITH t AS (
              SELECT doc_id,
                     ({H.token_hash_sql('CAST(doc_id AS VARCHAR)')} % {PACK_SHARDS}) AS shard,
                     {X.token_counts_sql('text')['n_bpe_tokens']} AS n_tokens
              FROM documents
            ),
            p AS (
              SELECT shard, n_tokens,
                     CAST(floor((sum(n_tokens) OVER (PARTITION BY shard ORDER BY n_tokens DESC, doc_id)
                                 - n_tokens) / {PACK_BUDGET}.0) AS BIGINT) AS bin
              FROM t
            )
            SELECT shard, bin, COUNT(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens
            FROM p GROUP BY shard, bin ORDER BY shard, bin
        """,
        "multimodal_meta": f"""
            SELECT doc_id AS asset_id, {kind} AS kind,
                   CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
                   substring(hex(encode(text)), 1, 8) AS magic_hex
            FROM documents ORDER BY asset_id
        """,
        "multimodal_report": f"""
            WITH a AS (
              SELECT {kind} AS kind, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
              FROM documents
            )
            SELECT kind, count(*) AS n_assets, CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
                   round(avg(n_bytes), 2) AS mean_bytes
            FROM a GROUP BY kind ORDER BY kind
        """,
        "wav_decode": _wav_decode_oracle(),
        "bmp_decode": _bmp_decode_oracle(),
        "avi_decode": _avi_decode_oracle(),
        "avi_frames": _avi_frames_oracle(),
        "dedup_stream_parity": """
            SELECT DISTINCT user_id, event_type FROM events
            ORDER BY user_id, event_type
        """,
        # windows finalized under a 0-second watermark = every hourly
        # window whose end <= max(ts); the in-flight window stays open
        "windowed_counts_parity": """
            WITH mx AS (SELECT max(ts) AS mts FROM events)
            SELECT date_trunc('hour', ts) AS window_start,
                   event_type,
                   count(*) AS n
            FROM events, mx
            WHERE date_trunc('hour', ts) + INTERVAL 1 HOUR <= mts
            GROUP BY 1, 2
            ORDER BY 1, 2
        """,
        # microsecond-precise islands (the stateful operator's exact gap
        # rule), finalized under the ms-floored 0-second watermark: a
        # session emits iff end + gap < floor_ms(max(ts)), strictly
        "sessionize_parity": """
            WITH mx AS (
              SELECT date_trunc('milliseconds', max(ts)) AS wm FROM events
            ),
            g AS (
              SELECT user_id, ts,
                     CASE WHEN lag(ts) OVER w IS NULL
                            OR ts - lag(ts) OVER w > INTERVAL 1800 SECOND
                          THEN 1 ELSE 0 END AS brk
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ),
            s AS (
              SELECT user_id, ts,
                     sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sid
              FROM g
            ),
            per AS (
              SELECT user_id AS key, min(ts) AS session_start,
                     max(ts) AS session_end,
                     CAST(count(*) AS BIGINT) AS n_events
              FROM s GROUP BY user_id, sid
            )
            SELECT key, session_start, session_end, n_events
            FROM per, mx
            WHERE session_end + INTERVAL 1800 SECOND < wm
            ORDER BY key, session_start
        """,
        # the streaming MG pass is only a candidate generator — the final
        # recounted output must equal the batch heavy-hitter set exactly,
        # so the oracle IS the same exact SQL as the `heavy_hitters` key
        "hh_stream_parity": _hh_sql("documents"),
        # the drained append-only sink must equal the batch posting build:
        # distinct lowercased char-3-grams per doc (sub-3-char texts emit
        # no postings). range(1, L-1) is [1, L-2] inclusive = the last
        # 3-gram start position.
        # the delta-maintained rollup must equal the batch GROUP BY over
        # every hour (TZ-free string hours; naive == UTC under the
        # pinned drain)
        "rollup_stream_parity": """
            SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
                   event_type, count(*) AS n
            FROM events GROUP BY hour, event_type
            ORDER BY hour, event_type
        """,
        "postings_stream_parity": """
            SELECT doc_id, gram FROM (
              SELECT DISTINCT doc_id,
                     substr(lower(text), CAST(i AS INTEGER), 3) AS gram
              FROM documents, LATERAL unnest(range(1, length(text) - 1)) AS t(i)
              WHERE length(text) >= 3
            ) ORDER BY doc_id, gram
        """,
        # pair graph = the minhash-LSH pipeline at DUP_CLUSTER_T (guard
        # mirrored), clusters = transitive closure (the recursive-CTE twin
        # of the pointer-jumping CC), representative = min doc_id
        "dup_clusters": f"""
            WITH RECURSIVE {_minhash_sig_cte()},
            band0 AS ({_band_sql()}),
            band AS (
              SELECT doc_id, band, h FROM (
                SELECT doc_id, band, h,
                       count(*) OVER (PARTITION BY band, h) AS _n
                FROM band0
              ) WHERE _n <= {LSH_MAX_BUCKET}
            ),
            cand AS (
              SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
              FROM band a JOIN band b ON a.band = b.band AND a.h = b.h AND a.doc_id < b.doc_id
            ),
            {_JACCARD_TAIL},
            pairs AS (SELECT i, j FROM jac WHERE jaccard >= {DUP_CLUSTER_T}),
            sym AS (
              SELECT i AS a, j AS b FROM pairs UNION SELECT j, i FROM pairs
            ),
            reach(a, b) AS (
              SELECT a, b FROM sym
              UNION
              SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
            ),
            comp AS (
              SELECT a AS node, least(a, min(b)) AS component FROM reach GROUP BY a
            )
            SELECT d.doc_id,
                   coalesce(c.component, d.doc_id) AS cluster_id,
                   d.doc_id = coalesce(c.component, d.doc_id) AS keep
            FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
            ORDER BY d.doc_id
        """,
        "repetition_signals": X.repetition_signals_sql("documents"),
        "pii_scrub": _pii_scrub_oracle(),
    }


def _pii_scrub_oracle() -> str:
    from entity_extractor_spark.operators import pii as PII

    counts = PII.pii_counts_sql("text")
    return f"""
        WITH d AS (
          SELECT doc_id, {PII.attach_pii_sql('text')} AS text FROM documents
        )
        SELECT doc_id,
               {counts['email']} AS n_email,
               {counts['ip']} AS n_ip,
               {counts['phone']} AS n_phone,
               {PII.scrub_text_sql('text')} AS clean_text
        FROM d ORDER BY doc_id
    """


ORACLES = _oracles()
