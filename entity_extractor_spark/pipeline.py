"""End-to-end KG-construction pipeline: transcripts -> mentions ->
scored candidates -> canonical entities -> triples -> node/edge tables.

The Spark restatement of the reference's three-phase flagship job
(`run_extraction.py:235-293`) plus the scoring/classification stages of
`software_mentions_pipeline/` — but as ONE lazy DataFrame program with
optional materialization barriers (StageRunner checkpoints) instead of
JSON files between phases. Stage boundaries exist only for
resumability/lineage; remove the runner and the same plan fuses.

Scale shape (the plan you'd want at 10^12 turns):
  * transcripts arrive bucketed by conv_id (Iceberg bucket / repartition)
  * the mention scan is embarrassingly parallel (mapInPandas, no shuffle)
  * the flag window + triple dedup shuffle on conv_id — the SAME key, so
    AQE reuses the partitioning; entity-keyed aggregations are salted
    (operators/graph.salted_count) against hot entities
  * the gazetteer/alias side is always broadcast; the CC loop runs on the
    (tiny) alias edge set, never on the corpus.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from entity_extractor_spark.lineage import StageRunner


def run_pipeline(
    spark: SparkSession,
    transcripts: DataFrame,
    gazetteer: pd.DataFrame,
    out_root: str,
    with_scoring: bool = True,
) -> dict[str, DataFrame]:
    """Run (or resume) the full pipeline under ``out_root``; returns the
    materialized stage tables."""
    from entity_extractor_spark.operators.canonicalize import canonical_entities
    from entity_extractor_spark.operators.graph import build_edges, build_nodes
    from entity_extractor_spark.operators.mentions import dedup_mentions, extract_mentions
    from entity_extractor_spark.operators.predicates import all_triples
    from entity_extractor_spark.operators.scoring import score_candidates

    runner = StageRunner(spark, out_root)
    params = {"n_terms": int(len(gazetteer))}

    mentions = runner.run(
        "mentions",
        lambda: dedup_mentions(extract_mentions(transcripts, gazetteer)),
        params=params,
        key_col="conv_id",
        partition_by="conv_id",
    )

    out: dict[str, DataFrame] = {"mentions": mentions}

    if with_scoring and "description" in gazetteer.columns:
        gaz_df = spark.createDataFrame(gazetteer[["term_id", "description"]])
        scored = runner.run(
            "scored",
            lambda: score_candidates(mentions, gaz_df),
            params=params,
            key_col="conv_id",
        )
        out["scored"] = scored

    if "aliases" in gazetteer.columns:
        gaz_alias = spark.createDataFrame(gazetteer[["term_id", "title", "aliases"]])
        entity_map = runner.run(
            "entity_map", lambda: canonical_entities(gaz_alias), params=params
        )
    else:
        entity_map = None
    out["entity_map"] = entity_map

    triples = runner.run(
        "triples",
        lambda: all_triples(transcripts, mentions, entity_map),
        params=params,
        key_col="conv_id",
        partition_by="conv_id",
    )
    out["triples"] = triples

    out["edges"] = runner.run("edges", lambda: build_edges(triples), params=params)
    out["nodes"] = runner.run("nodes", lambda: build_nodes(triples), params=params)

    runner.write_manifest()
    out["lineage"] = runner.lineage()
    return out
