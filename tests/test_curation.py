"""Unit tests for the training-data curation operators: dedup suite,
similarity search, text analysis, multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from entity_extractor_spark.operators import dedup as D
from entity_extractor_spark.operators import simsearch as S
from entity_extractor_spark.operators import textstats as X
from entity_extractor_spark.operators.multimodal import (
    attach_payloads,
    decode_assets,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "The quick brown fox jumps over the lazy dog", "en"),
        (2, "THE QUICK  brown fox jumps over the lazy dog", "en"),  # exact dup after norm
        (3, "The quick brown fox jumps over the lazy cat today", "en"),  # near dup
        (4, "der Hund und die Katze sind mit dem Ball", "de"),
        (5, "completely unrelated text about spark query engines", "en"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_exact_dedup_finds_normalized_dup(docs):
    out = {r["doc_id"]: r for r in D.exact_dedup(docs).collect()}
    assert out[2]["canonical_id"] == 1 and out[2]["is_dup"]
    assert not out[1]["is_dup"] and not out[3]["is_dup"]


def test_minhash_identical_docs_equal_signatures(docs):
    sigs = {r["doc_id"]: tuple(r[f"s{i}"] for i in range(8)) for r in D.minhash_signatures(docs).collect()}
    assert sigs[1] == sigs[2]  # same token set
    assert sigs[1] != sigs[5]


def test_minhash_lsh_finds_near_dups(docs):
    pairs = {(r["i"], r["j"]): r["jaccard"] for r in D.minhash_lsh_pairs(docs, threshold=0.5).collect()}
    assert pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs  # 8/10 shared distinct tokens
    assert (1, 5) not in pairs


def test_ngram_jaccard_pairs(docs):
    pairs = {(r["i"], r["j"]): r["jaccard"] for r in D.ngram_jaccard_pairs(docs, threshold=0.3).collect()}
    assert pairs[(1, 2)] == 1.0
    assert all(5 not in p for p in pairs)


def test_simhash_and_pairs(docs):
    fps = {r["doc_id"]: r["simhash"] for r in D.simhash(docs).collect()}
    assert fps[1] == fps[2]
    assert 0 <= fps[1] < (1 << 32)
    pairs = {(r["i"], r["j"]): r["hamming"] for r in D.simhash_pairs(docs, max_hamming=3).collect()}
    assert pairs[(1, 2)] == 0


def test_brute_vs_pandas_topk(spark):
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 3)
    expr_rows = S.brute_force_topk(e, q, k=4).collect()
    qvecs = [(r["vec_id"], list(r["embedding"])) for r in q.collect()]
    np_rows = S.cosine_topk_pandas(e, qvecs, k=4).collect()
    key = lambda rows: {(r["query_id"], r["rank"]): r["neighbor_id"] for r in rows}
    assert key(expr_rows) == key(np_rows)


def test_lsh_topk_subset_of_bucket(spark):
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 3)
    rows = S.lsh_topk(e, q, dim=64, k=4).collect()
    # approximate: every returned neighbor must share the query's bucket
    buckets = {
        r["vec_id"]: r["b"]
        for r in e.select("vec_id", S.lsh_bucket(F.col("embedding"), 64).alias("b")).collect()
    }
    for r in rows:
        assert buckets[r["query_id"]] == buckets[r["neighbor_id"]]


def test_language_id(spark):
    rows = [
        (1, "the cat is on the mat and it is happy"),
        (2, "der Hund ist mit der Katze und dem Ball"),
        (3, "el perro y el gato en la casa es un amigo"),
        (4, "xyzzy plugh qwerty"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {r["id"]: r["lang"] for r in df.select("id", X.language_id(F.col("text")).alias("lang")).collect()}
    assert out[1] == "en" and out[2] == "de" and out[3] == "es" and out[4] == "und"


def test_quality_score_ordering(spark):
    rows = [
        (1, "the cat sat on the mat with a dog and the bird went to the park in a sunny day for fun"),
        (2, "@#$% ^^ !!"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {r["id"]: r["q"] for r in df.select("id", X.quality_score(F.col("text")).alias("q")).collect()}
    assert out[1] > out[2]
    assert 0.0 <= out[2] <= out[1] <= 1.0


def test_token_counts(spark):
    df = spark.createDataFrame([(1, "hello world, 42 times!")], "id long, text string")
    tc = X.token_counts(F.col("text"))
    r = df.select(tc["n_ws_tokens"].alias("ws"), tc["n_bpe_tokens"].alias("bpe")).first()
    assert r["ws"] == 4
    # hello / world / , / 42 / times / !
    assert r["bpe"] == 6


def test_fingerprint_deterministic(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"), (3, "omega psi chi phi")],
        "id long, text string",
    )
    rows = {r["id"]: (r["fp0"], r["fp1"]) for r in df.select("id", *X.doc_fingerprint(F.col("text"))).collect()}
    assert rows[1] == rows[2]
    assert rows[1] != rows[3]


def test_multimodal_roundtrip(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(50)
    assets = attach_payloads(docs)
    dec = decode_assets(assets)
    rows = dec.collect()
    assert len(rows) == 50
    assert set(dec.columns) == {"asset_id", "kind", "width", "height", "n_frames", "checksum"}
    for r in rows:
        assert 16 <= r["width"] <= 256 and 16 <= r["height"] <= 256
        assert (r["n_frames"] == 1) == (r["kind"] == "image")


def test_multimodal_real_decode_is_stubbed(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(2)
    with pytest.raises(Exception, match="NotImplementedError|real media decode"):
        decode_assets(attach_payloads(docs), fake=False).collect()


def test_deterministic_sampling_stability(spark):
    from entity_extractor_spark.operators.sampling import (
        assign_split,
        deterministic_sample,
        pack_sequences,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    s1 = {r["doc_id"] for r in deterministic_sample(docs, "doc_id", 0.2).collect()}
    # repartitioning must not change membership (df.sample would)
    s2 = {
        r["doc_id"]
        for r in deterministic_sample(docs.repartition(13), "doc_id", 0.2).collect()
    }
    assert s1 == s2 and 0.1 < len(s1) / docs.count() < 0.3
    # split partitions the corpus, fractions roughly honored
    splits = (
        docs.select("doc_id", assign_split(F.col("doc_id")).alias("s"))
        .groupBy("s").count().collect()
    )
    by = {r["s"]: r["count"] for r in splits}
    n = sum(by.values())
    assert set(by) == {"train", "val", "test"} and by["train"] / n > 0.7
    # packing: per-shard bins respect the running-count definition
    packed = pack_sequences(docs.limit(50), 512).collect()
    by_shard: dict[int, list] = {}
    for r in packed:
        by_shard.setdefault(r["shard"], []).append(r)
    assert len(by_shard) > 1  # default really shards (not one global stream)
    for shard, rows in by_shard.items():
        cum = 0
        for r in sorted(rows, key=lambda r: r["doc_id"]):
            assert r["bin"] == cum // 512, (shard, r)
            cum += r["n_tokens"]


def test_pack_sequences_plan_is_sharded(spark):
    """The default packing window must NOT be a single-partition sort —
    the round-1 scale-killer (VERDICT item 3)."""
    from entity_extractor_spark.operators.sampling import pack_sequences

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = pack_sequences(docs, 512)._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan
    # opt-in global stream still collapses to one partition
    plan1 = pack_sequences(docs, 512, n_shards=1)._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" in plan1 or "hashpartitioning" in plan1


def test_multimodal_resize_and_frame_sample(spark):
    """Resize/frame-sample plumbing: schemas, determinism, fan-out shape,
    and the stubbed real-codec path."""
    from entity_extractor_spark.operators.multimodal import (
        attach_payloads,
        resize_assets,
        sample_frames,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(20)
    assets = attach_payloads(docs)

    resized = resize_assets(assets, target_w=32, target_h=32).collect()
    assert len(resized) == 20
    assert all(r["width"] == 32 and r["height"] == 32 for r in resized)
    out_len = 32 * 32 // 64
    assert all(len(r["payload"]) <= out_len for r in resized)
    # deterministic: same input -> same bytes
    again = {r["asset_id"]: bytes(r["payload"]) for r in resize_assets(assets, 32, 32).collect()}
    assert all(bytes(r["payload"]) == again[r["asset_id"]] for r in resized)

    frames = sample_frames(assets, max_frames=4).collect()
    by_asset: dict[int, list] = {}
    for r in frames:
        by_asset.setdefault(r["asset_id"], []).append(r)
    kinds = {r["asset_id"]: r["kind"] for r in assets.select("asset_id", "kind").collect()}
    for aid, rows in by_asset.items():
        assert [r["frame_idx"] for r in sorted(rows, key=lambda r: r["frame_idx"])] == list(range(len(rows)))
        if kinds[aid] == "image":
            assert len(rows) == 1  # non-temporal kinds emit one frame
        assert all(r["ts_ms"] == r["frame_idx"] * 1000 for r in rows)

    with pytest.raises(Exception, match="NotImplementedError|real resize"):
        resize_assets(assets, fake=False).collect()
    with pytest.raises(Exception, match="NotImplementedError|real frame"):
        sample_frames(assets, fake=False).collect()


def test_embedding_lsh_hot_bucket_guard_boundary(spark):
    """The max_bucket guard must (a) keep a bucket of exactly max_bucket
    (<= boundary), (b) drop a larger one, and (c) agree with the DuckDB
    oracle mirror at both boundaries (round-2 review: at contract scale
    the guard never trips, so this forces it)."""
    import duckdb
    import pandas as pd

    dim = 8
    # 10 identical vectors -> one bucket of size 10; 3 vectors of another
    # direction -> a second bucket (orthogonal-ish so cosine < threshold
    # across groups doesn't matter — they're in different buckets anyway)
    rows = [(i, [1.0] * dim) for i in range(10)] + [
        (100 + i, [1.0] + [-1.0] * (dim - 1)) for i in range(3)
    ]
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding"])
    e = spark.createDataFrame(pdf)

    def spark_pairs(max_bucket):
        return {
            (r["i"], r["j"])
            for r in S.embedding_near_dups(
                e, dim=dim, threshold=0.9, max_bucket=max_bucket
            ).collect()
        }

    def duck_pairs(max_bucket):
        con = duckdb.connect()
        con.register("embeddings", pdf)
        sql = f"""
            WITH b0 AS (
              SELECT vec_id, embedding,
                     {S.lsh_bucket_sql('embedding', dim)} AS bucket
              FROM embeddings
            ),
            b AS (
              SELECT vec_id, embedding, bucket FROM (
                SELECT *, count(*) OVER (PARTITION BY bucket) AS _n FROM b0
              ) WHERE _n <= {max_bucket}
            )
            SELECT a.vec_id AS i, c.vec_id AS j
            FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
            WHERE {S.cosine_sql('a.embedding', 'c.embedding')} >= 0.9
        """
        return {(r[0], r[1]) for r in con.execute(sql).fetchall()}

    kept = spark_pairs(10)  # bucket size == max_bucket: KEPT
    assert len(kept) == 45 + 3  # C(10,2) identical pairs + C(3,2)
    assert kept == duck_pairs(10)

    dropped = spark_pairs(9)  # the 10-bucket exceeds the guard: DROPPED
    assert len(dropped) == 3  # only the size-3 bucket survives
    assert dropped == duck_pairs(9)
