"""Robustness: empty inputs, degenerate gazetteers, giant turns, and
exact parity on the distributed generator's corpus."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from entity_extractor_spark.operators.mentions import extract_mentions
from entity_extractor_spark.oracle import oracle_extract, precision_recall
from entity_extractor_spark.synth import (
    SynthConfig,
    make_gazetteer,
    make_transcripts_distributed,
    to_spark,
)

KEYS = ["conv_id", "turn_idx", "term_id", "surface", "start", "end", "context",
        "match_location", "in_user", "in_assistant"]

EMPTY_T = pd.DataFrame(
    {
        "conv_id": pd.Series([], dtype="object"),
        "turn_idx": pd.Series([], dtype="int32"),
        "role": pd.Series([], dtype="object"),
        "text": pd.Series([], dtype="object"),
        "tool": pd.Series([], dtype="object"),
        "ts": pd.Series([], dtype="datetime64[ns]"),
    }
)


def test_empty_transcripts(spark):
    gaz = pd.DataFrame({"term_id": ["t1"], "title": ["Spark: x"]})
    out = extract_mentions(to_spark(spark, EMPTY_T), gaz)
    assert out.count() == 0
    assert "in_user" in out.columns  # schema intact


def test_empty_gazetteer(spark):
    t = pd.DataFrame(
        {
            "conv_id": ["c1"], "turn_idx": pd.array([0], dtype="int32"),
            "role": ["user"], "text": ["some spark text"], "tool": [None],
            "ts": pd.to_datetime(["2026-01-01"]),
        }
    )
    gaz = pd.DataFrame({"term_id": pd.Series([], dtype="object"), "title": pd.Series([], dtype="object")})
    assert extract_mentions(to_spark(spark, t), gaz).count() == 0


def test_null_and_whitespace_texts(spark):
    t = pd.DataFrame(
        {
            "conv_id": ["c1", "c1", "c1"],
            "turn_idx": pd.array([0, 1, 2], dtype="int32"),
            "role": ["user", "assistant", "user"],
            "text": [None, "   ", "Zorp here"],
            "tool": [None] * 3,
            "ts": pd.to_datetime(["2026-01-01"] * 3),
        }
    )
    gaz = pd.DataFrame({"term_id": ["t1"], "title": ["Zorp"]})
    rows = extract_mentions(to_spark(spark, t), gaz).collect()
    assert len(rows) == 1 and rows[0]["turn_idx"] == 2


def test_giant_turn_correctness(spark):
    # one 100k-word turn with known planted counts — matcher is O(len)
    words = ["filler"] * 100_000
    for i in range(0, 100_000, 9973):
        words[i] = "Zorp"
    n_planted = len(range(0, 100_000, 9973))
    t = pd.DataFrame(
        {
            "conv_id": ["c1"], "turn_idx": pd.array([0], dtype="int32"),
            "role": ["user"], "text": [" ".join(words)], "tool": [None],
            "ts": pd.to_datetime(["2026-01-01"]),
        }
    )
    gaz = pd.DataFrame({"term_id": ["t1"], "title": ["Zorp"]})
    assert extract_mentions(to_spark(spark, t), gaz).count() == n_planted


def test_distributed_corpus_exact_parity(spark):
    """The distributed generator's corpus passes the same exact P/R gate
    as the driver-side one."""
    cfg = SynthConfig(seed=99, n_terms=24, n_convs=40, hot_conv_factor=10)
    gaz = make_gazetteer(cfg)
    tdf = make_transcripts_distributed(spark, cfg, parallelism=8)
    pdf = tdf.toPandas()
    engine = extract_mentions(tdf, gaz).toPandas()
    oracle = oracle_extract(pdf, gaz)
    assert len(oracle) > 100
    p, r = precision_recall(engine, oracle, KEYS)
    assert p == 1.0 and r == 1.0, (p, r)
