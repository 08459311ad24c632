"""Scoring semantics vs a literal reimplementation of the reference math."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from entity_extractor_spark.operators.mentions import extract_mentions
from entity_extractor_spark.operators.scoring import (
    HEURISTIC_KEYWORDS,
    _ngram_matrix,
    assign_likelihood,
    composite_score,
    determine_likelihood,
    keyword_hits,
    score_candidates,
)
from entity_extractor_spark.synth import SynthConfig, make_gazetteer, make_transcripts, to_spark


def ref_keyword_hits(text: str) -> list[str]:
    # score_filtered_contexts.py:79-80 semantics, dashboard keyword list
    return sorted([kw for kw in HEURISTIC_KEYWORDS if kw in text.lower()])


def ref_composite(ner: bool, sim: float | None, kw_count: int) -> float:
    score = 0.5 * (1.0 if ner else 0.0)
    score += 0.3 * (sim if sim is not None else 0.0)
    score += 0.2 * min(kw_count / 3.0, 1.0)
    return round(score, 3)


def ref_likelihood(score: float) -> str:
    for label, t in [("very likely", 0.75), ("somewhat likely", 0.45), ("unlikely", 0.0)]:
        if score >= t:
            return label
    return "unlikely"


def test_keyword_hits_matches_reference(spark):
    texts = [
        "We used the SOFTWARE package and a model",
        "nothing here",
        "Engine and toolkit and tool and library",
        "",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [r[0] for r in df.select(keyword_hits(F.col("text"))).collect()]
    assert got == [ref_keyword_hits(t) for t in texts]


def test_composite_and_likelihood_columns(spark):
    rows = [
        (True, 0.9, 5),
        (True, None, 0),
        (False, 0.5, 1),
        (False, 0.0, 0),
        (True, 0.51, 2),
    ]
    df = spark.createDataFrame(rows, "ner boolean, sim double, kw int")
    out = df.select(
        composite_score(F.col("ner"), F.col("sim"), F.col("kw")).alias("s")
    ).collect()
    for (ner, sim, kw), r in zip(rows, out):
        assert abs(r["s"] - ref_composite(ner, sim, kw)) < 1e-9
    lik = df.select(
        assign_likelihood(composite_score(F.col("ner"), F.col("sim"), F.col("kw"))).alias("l")
    ).collect()
    for (ner, sim, kw), r in zip(rows, lik):
        assert r["l"] == ref_likelihood(ref_composite(ner, sim, kw))


def test_conjunctive_likelihood(spark):
    rows = [(None, True, 0), (0.7, True, 0), (0.7, False, 2), (0.7, False, 0), (0.4, False, 0), (0.1, True, 5)]
    df = spark.createDataFrame(rows, "sim double, ner boolean, kw int")
    got = [
        r["l"]
        for r in df.select(
            determine_likelihood(F.col("sim"), F.col("ner"), F.col("kw")).alias("l")
        ).collect()
    ]
    # assign_likelihood_labels.py:18-27
    assert got == ["unlikely", "very likely", "very likely", "somewhat likely", "somewhat likely", "unlikely"]


def test_charngram_cosine_properties(spark):
    df = spark.createDataFrame(
        [("the zorplex tool", "the zorplex tool"), ("aaaa", "zzzz"), ("", "x")],
        "a string, b string",
    )
    from entity_extractor_spark.operators.scoring import charngram_cosine

    got = [r[0] for r in df.select(charngram_cosine("a", "b")).collect()]
    assert abs(got[0] - 1.0) < 1e-9  # identical text -> cosine 1
    assert got[1] == 0.0  # disjoint ngram sets
    assert got[2] == 0.0  # degenerate -> 0 per reference zero-norm rule


def test_ngram_matrix_numpy_equivalence():
    texts = np.array(["abcabc", "ab", ""], dtype=object)
    m = _ngram_matrix(texts, dim=64)
    assert m[0].sum() == 4  # 4 trigrams in 'abcabc'
    assert m[1].sum() == 0 and m[2].sum() == 0


def test_score_candidates_end_to_end(spark):
    cfg = SynthConfig(seed=9, n_terms=12, n_convs=20, hot_conv_factor=5)
    gaz = make_gazetteer(cfg)
    mentions = extract_mentions(to_spark(spark, make_transcripts(cfg, gaz)), gaz)
    scored = score_candidates(mentions, to_spark(spark, gaz, gaz=True)).toPandas()
    assert len(scored) == mentions.count()
    assert set(scored["likelihood"]) <= {"very likely", "somewhat likely", "unlikely"}
    assert ((scored["similarity"] >= -1e-9) & (scored["similarity"] <= 1 + 1e-9)).all()
    # recompute composite in pandas with reference math
    for row in scored.head(50).itertuples(index=False):
        exp = ref_composite(bool(row.ner_signal), float(row.similarity), len(row.heuristic_keywords))
        assert abs(row.composite_score - exp) < 1e-9
