"""Physical-plan regression guards: pruning, pushdown, broadcast,
shuffle counts. A change that silently de-optimizes a hot plan fails
here, not in a 100 TB run."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from entity_extractor_spark import plans as P

SF_DIR = "/root/testdata/sf0.001"


def test_mention_scan_prunes_and_shuffles_once(spark):
    """The raw scan reads ONLY (conv_id, turn_idx, role, text) and the
    full extract has exactly one shuffle (the flag window)."""
    from entity_extractor_spark.operators.mentions import (
        build_matcher_from_gazetteer,
        extract_mentions,
        scan_mentions,
    )

    gaz = pd.DataFrame({"term_id": ["t1"], "title": ["Spark: engine"]})
    t = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("conv_id"),
        F.lit(0).alias("turn_idx"),
        F.lit("user").alias("role"),
        "text",
        F.lit(None).cast("string").alias("tool"),
        F.lit(None).cast("timestamp").alias("ts"),
        "lang",  # extra column that must be pruned away
    )
    matcher, names = build_matcher_from_gazetteer(gaz)
    raw_plan = P.formatted_plan(scan_mentions(t, matcher, names))
    assert P.scan_columns_subset(scan_mentions(t, matcher, names), {"doc_id", "text"}), raw_plan
    assert P.count_exchanges(raw_plan) == 0, raw_plan

    full_plan = P.formatted_plan(extract_mentions(t, gaz))
    assert P.count_exchanges(full_plan) == 1, full_plan


def test_filter_pushdown_reaches_parquet(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    q = li.filter(F.col("l_quantity") > 30).select("l_orderkey", "l_quantity")
    plan = P.formatted_plan(q)
    pushed = P.pushed_filters(plan)
    assert any("GreaterThan(l_quantity" in f for f in pushed), plan
    assert P.scan_columns_subset(q, {"l_orderkey", "l_quantity"}), plan


def test_dim_join_is_broadcast(spark):
    import __spark_entry__ as e

    plan = P.formatted_plan(e.queries()["broadcast_join"](spark, SF_DIR))
    assert P.has_broadcast_hash_join(plan), plan


def test_semi_join_pruned_to_keys(spark):
    import __spark_entry__ as e

    q = e.queries()["semi_join"](spark, SF_DIR)
    plan = P.formatted_plan(q)
    # orders side must be pruned to the join key only
    assert ["o_custkey"] in P.read_schemas(plan), plan


def test_scoring_is_single_pass(spark):
    """score_candidates: one broadcast join, zero shuffles before agg."""
    from entity_extractor_spark.operators.mentions import extract_mentions
    from entity_extractor_spark.operators.scoring import score_candidates
    from entity_extractor_spark.synth import SynthConfig, make_gazetteer, make_transcripts, to_spark

    cfg = SynthConfig(seed=5, n_terms=8, n_convs=10)
    gaz = make_gazetteer(cfg)
    t = to_spark(spark, make_transcripts(cfg, gaz))
    m = extract_mentions(t, gaz)
    scored = score_candidates(m, to_spark(spark, gaz, gaz=True))
    plan = P.formatted_plan(scored)
    # only the flag-window exchange from extract_mentions; the gazetteer
    # join must NOT add a shuffle
    assert P.count_exchanges(plan) == 1, plan


def test_topk_uses_take_ordered(spark):
    import __spark_entry__ as e

    plan = P.formatted_plan(e.queries()["topk_groups"](spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan, plan


def test_lsh_topk_no_cartesian(spark):
    """LSH ANN must join on bucket, never cross-join the corpus."""
    from entity_extractor_spark.operators.simsearch import lsh_topk

    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 3)
    plan = P.formatted_plan(lsh_topk(e, q, dim=64))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, plan
