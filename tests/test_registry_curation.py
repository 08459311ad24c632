"""Registry ingestion, work-list scan restriction, curation-delta
overlay, and TF-IDF similarity."""

from __future__ import annotations

import json

import pandas as pd
import pytest
from pyspark.sql import functions as F

from entity_extractor_spark.io.registry import (
    load_ascl_registry,
    load_ontosoft_registry,
    registry_label_set,
    restrict_to_worklist,
    union_registries,
)
from entity_extractor_spark.operators.curation import (
    append_delta,
    apply_curation,
    latest_delta,
    with_row_id,
)
from entity_extractor_spark.operators.tfidf import tfidf_topk


def test_ascl_registry_load(spark, tmp_path):
    ascl = {
        "1234": {
            "title": "Zorplex: a zorp simulator",
            "abstract": "Simulates zorps.",
            "positive_bibcodes": [
                "https://ui.x.y/abs/2020A&A...1Z/abstract",
                "2019ApJ...2B",
            ],
            "negative_bibcodes": ["https://ui.x.y/abs/2018X...3C?q=1"],
        },
        "5678": {"title": "Quantix", "aliases": ["QTX"]},
    }
    p = tmp_path / "ascl.json"
    p.write_text(json.dumps(ascl))
    df = load_ascl_registry(spark, str(p))
    rows = {r["term_id"]: r for r in df.collect()}
    assert rows["1234"]["positive_convs"] == ["2020A&A...1Z", "2019ApJ...2B"]
    assert rows["1234"]["negative_convs"] == ["2018X...3C"]
    assert rows["5678"]["aliases"] == ["QTX"]
    assert rows["1234"]["description"] == "Simulates zorps."


def test_registry_union_and_labels(spark, tmp_path):
    ascl = {"1": {"title": "Zorplex: a tool"}, "2": {"title": "Quantix"}}
    onto = [
        {"label": "Zorplex", "description": "dup of ascl entry"},
        {"label": "Vextron", "description": "only here"},
    ]
    pa, po = tmp_path / "a.json", tmp_path / "o.json"
    pa.write_text(json.dumps(ascl))
    po.write_text(json.dumps(onto))
    merged = union_registries(
        load_ascl_registry(spark, str(pa)), load_ontosoft_registry(spark, str(po))
    )
    labels = [r["label"] for r in registry_label_set(merged).collect()]
    # 'zorplex' deduped across registries (ASCL wins), 3 canonical labels
    assert labels == ["quantix", "vextron", "zorplex"]
    src = {r["title"]: r["source"] for r in merged.collect()}
    assert src["Zorplex: a tool"] == "ASCL"


def test_worklist_restriction(spark):
    t = spark.createDataFrame(
        [(f"conv-{i}", 0, "user", "x") for i in range(100)],
        "conv_id string, turn_idx int, role string, text string",
    )
    wl = spark.createDataFrame([("conv-3",), ("conv-7",), ("conv-3",)], "conv_id string")
    out = restrict_to_worklist(t, wl)
    assert sorted(r["conv_id"] for r in out.collect()) == ["conv-3", "conv-7"]
    from entity_extractor_spark import plans as P

    assert "Broadcast" in P.formatted_plan(out)


@pytest.fixture()
def mentions_df(spark):
    return spark.createDataFrame(
        [
            ("c1", "t1", "ctx-a", "somewhat likely"),
            ("c1", "t2", "ctx-b", "unlikely"),
            ("c2", "t1", "ctx-c", "very likely"),
        ],
        "conv_id string, term_id string, context string, likelihood string",
    )


def test_curation_overlay_latest_wins(spark, mentions_df):
    base = with_row_id(mentions_df)
    rid = {
        (r["conv_id"], r["term_id"]): r["row_id"] for r in base.collect()
    }
    delta = spark.createDataFrame(
        [
            (rid[("c1", "t1")], "positive", "alice", "2026-01-01 10:00:00"),
            (rid[("c1", "t1")], "negative", "bob", "2026-01-02 10:00:00"),  # later wins
            (rid[("c2", "t1")], "positive", "alice", "2026-01-01 10:00:00"),
        ],
        "row_id string, label string, curator string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {
        (r["conv_id"], r["term_id"]): (r["label"], r["curated_label"])
        for r in apply_curation(mentions_df, delta).collect()
    }
    assert out[("c1", "t1")] == ("negative", "negative")
    assert out[("c2", "t1")] == ("positive", "positive")
    assert out[("c1", "t2")] == ("unlikely", None)  # falls back to pipeline label
    assert latest_delta(delta).count() == 2


def test_curation_delta_roundtrip(spark, mentions_df, tmp_path):
    base = with_row_id(mentions_df)
    rid = base.first()["row_id"]
    delta = spark.createDataFrame(
        [(rid, "positive", "alice", "2026-01-01 10:00:00")],
        "row_id string, label string, curator string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    p = str(tmp_path / "delta")
    append_delta(delta, p)
    append_delta(delta.withColumn("label", F.lit("negative")).withColumn(
        "ts", F.to_timestamp(F.lit("2026-01-03 10:00:00"))
    ), p)
    merged = apply_curation(mentions_df, spark.read.parquet(p))
    got = {r["row_id"]: r["label"] for r in merged.collect()}
    assert got[rid] == "negative"


def test_tfidf_topk_sanity(spark):
    docs = spark.createDataFrame(
        [
            (0, "zorp quant flux alpha beta"),
            (1, "zorp quant flux alpha gamma"),   # near doc 0
            (2, "totally different words here now"),
            (3, "zorp quant beta alpha flux"),    # permutation of doc 0
        ],
        "doc_id long, text string",
    )
    rows = tfidf_topk(docs, [0], k=3).collect()
    order = [r["doc_id"] for r in rows]
    # permutation (identical token multiset) ranks first with cos 1.0
    assert order[0] == 3 and rows[0]["cos"] == 1.0
    assert order[1] == 1
    assert rows[-1]["cos"] < rows[0]["cos"]
