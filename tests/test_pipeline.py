"""End-to-end pipeline, sinks, lineage/resume, and streaming tests."""

from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from entity_extractor_spark.io import sinks
from entity_extractor_spark.pipeline import run_pipeline
from entity_extractor_spark.synth import SynthConfig, make_gazetteer, make_transcripts, to_spark

CFG = SynthConfig(seed=7, n_terms=24, n_convs=40, hot_conv_factor=10)


@pytest.fixture(scope="module")
def corpus(spark):
    gaz = make_gazetteer(CFG)
    pdf = make_transcripts(CFG, gaz)
    return to_spark(spark, pdf), gaz


def test_pipeline_end_to_end_and_resume(spark, corpus, tmp_path_factory):
    transcripts, gaz = corpus
    root = str(tmp_path_factory.mktemp("pipe"))
    out = run_pipeline(spark, transcripts, gaz, root)
    n_mentions = out["mentions"].count()
    n_triples = out["triples"].count()
    assert n_mentions > 0 and n_triples > n_mentions * 0.5
    assert out["edges"].filter(F.col("weight") < 1).count() == 0
    # node kinds are classified
    kinds = {r["kind"] for r in out["nodes"].select("kind").distinct().collect()}
    assert "entity" in kinds and "turn" in kinds
    # lineage has rows for every stage
    stages = {r["stage"] for r in out["lineage"].select("stage").distinct().collect()}
    assert {"mentions", "triples", "edges", "nodes"} <= stages
    # manifest exists
    with open(os.path.join(root, "_RUN_MANIFEST.json")) as f:
        manifest = json.load(f)
    assert any(m["stage"] == "mentions" and not m["skipped"] for m in manifest["metrics"])

    # resume: second run skips every stage, results identical
    out2 = run_pipeline(spark, transcripts, gaz, root)
    with open(os.path.join(root, "_RUN_MANIFEST.json")) as f:
        manifest2 = json.load(f)
    assert all(m["skipped"] for m in manifest2["metrics"])
    assert out2["mentions"].count() == n_mentions
    assert out2["triples"].count() == n_triples

    # param change invalidates the fingerprint -> stages re-run
    gaz_small = gaz.iloc[: len(gaz) - 1]
    out3 = run_pipeline(spark, transcripts, gaz_small, root)
    with open(os.path.join(root, "_RUN_MANIFEST.json")) as f:
        manifest3 = json.load(f)
    assert all(not m["skipped"] for m in manifest3["metrics"])
    assert out3["mentions"].count() <= n_mentions


def test_pipeline_resume_after_mid_run_crash(spark, corpus, tmp_path_factory):
    """Crash simulation: a stage directory left WITHOUT its _SUCCESS
    marker (killed mid-write) must be recomputed on resume, while every
    completed upstream stage is skipped — the reference's resume-flag
    semantics (`run_extraction.py:253-260`) at stage granularity."""
    transcripts, gaz = corpus
    root = str(tmp_path_factory.mktemp("crash"))
    out = run_pipeline(spark, transcripts, gaz, root)
    n_triples = out["triples"].count()
    # simulate dying between the triples write and its commit
    os.remove(os.path.join(root, "triples", "_SUCCESS"))

    out2 = run_pipeline(spark, transcripts, gaz, root)
    with open(os.path.join(root, "_RUN_MANIFEST.json")) as f:
        manifest = json.load(f)
    by = {m["stage"]: m["skipped"] for m in manifest["metrics"]}
    assert by["mentions"] is True  # completed upstream work not redone
    assert by["triples"] is False  # incomplete stage recomputed
    assert out2["triples"].count() == n_triples  # identical result


def test_sinks(spark, corpus, tmp_path):
    transcripts, gaz = corpus
    from entity_extractor_spark.operators.mentions import extract_mentions

    mentions = extract_mentions(transcripts, gaz).cache()
    p = str(tmp_path)

    sinks.write_mentions_parquet(mentions, f"{p}/m.parquet")
    assert spark.read.parquet(f"{p}/m.parquet").count() == mentions.count()

    sinks.write_csv_gzip(mentions.select("conv_id", "term_id", "match_location"), f"{p}/m.csv")
    assert glob.glob(f"{p}/m.csv/*.csv.gz")

    sinks.write_partitioned_by_key(
        mentions.select("conv_id", "surface", "term_id"), f"{p}/per_term", "term_id"
    )
    dirs = [d for d in os.listdir(f"{p}/per_term") if d.startswith("term_id=")]
    assert len(dirs) == mentions.select("term_id").distinct().count()

    sinks.write_summary_json(mentions, f"{p}/summary")
    row = json.loads(open(glob.glob(f"{p}/summary/*.json")[0]).read().splitlines()[0])
    assert row["total_mentions"] == mentions.count()
    assert row["n_terms"] == mentions.select("term_id").distinct().count()
    mentions.unpersist()


def test_streaming_incremental(spark, corpus, tmp_path):
    transcripts, gaz = corpus
    from entity_extractor_spark.operators.mentions import extract_mentions
    from entity_extractor_spark.streaming.incremental import incremental_extract

    inp = str(tmp_path / "in")
    outp = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    wave1 = transcripts.filter(F.col("conv_id") < "conv-000020")
    wave2 = transcripts.filter(F.col("conv_id") >= "conv-000020")
    wave1.write.mode("append").parquet(inp)
    incremental_extract(spark, inp, gaz, outp, ckpt)
    n1 = spark.read.parquet(outp).count()
    assert n1 == extract_mentions(wave1, gaz).count()

    # second wave lands; re-run processes ONLY the new files (no dups)
    wave2.write.mode("append").parquet(inp)
    incremental_extract(spark, inp, gaz, outp, ckpt)
    n2 = spark.read.parquet(outp).count()
    assert n2 == n1 + extract_mentions(wave2, gaz).count()
    # re-run with nothing new is a no-op
    incremental_extract(spark, inp, gaz, outp, ckpt)
    assert spark.read.parquet(outp).count() == n2


def test_curate_documents_end_to_end(spark, tmp_path):
    """Curation pipeline: stage monotonicity, packing validity, resume
    (second run skips every stage and returns identical tables)."""
    import json as _json

    from entity_extractor_spark.pipeline import curate_documents

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    root = str(tmp_path / "curate")
    out = curate_documents(spark, docs, root, quality_min=0.3)
    n_docs = docs.count()
    n_surv = out["survivors"].count()
    n_near = out["near_deduped"].count()
    n_filt = out["filtered"].count()
    assert n_docs >= n_surv >= n_near >= n_filt > 0
    # split covers the filtered set exactly, with all three labels possible
    split_counts = {r["split"]: r["n"] for r in
                    out["split"].groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sum(split_counts.values()) == n_filt
    assert split_counts.get("train", 0) > 0
    # packed: only train docs, valid per-shard bins
    assert out["packed"].count() == split_counts["train"]
    assert out["packed"].filter(F.col("bin") < 0).count() == 0
    # lineage covers every stage
    stages = {r["stage"] for r in out["lineage"].select("stage").distinct().collect()}
    assert {"exact_dedup", "near_dedup", "quality_filter", "split", "packed"} <= stages
    # resume: identical params -> every stage skipped, same outputs
    out2 = curate_documents(spark, docs, root, quality_min=0.3)
    assert out2["filtered"].count() == n_filt
    manifest = _json.loads(open(f"{root}/_RUN_MANIFEST.json").read())
    assert all(m["skipped"] for m in manifest["metrics"])
    # changed params -> stages re-run
    out3 = curate_documents(spark, docs, root, quality_min=0.5)
    assert out3["filtered"].count() <= n_filt
