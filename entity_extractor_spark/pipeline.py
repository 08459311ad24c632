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

    # one conv_id exchange for the whole stage: the explicit repartition
    # satisfies the flag window, the dedup window, AND the storage
    # clustering (subset rule), replacing the former three shuffles
    # (flag window + dropDuplicates + StageRunner repartition) of the
    # biggest intermediate table with one
    n_buckets = spark.sparkContext.defaultParallelism * 4
    mentions = runner.run(
        "mentions",
        lambda: dedup_mentions(
            extract_mentions(transcripts, gazetteer, repartition_conv=n_buckets),
            deterministic=True,
        ),
        params=params,
        key_col="conv_id",
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

    edges = runner.run("edges", lambda: build_edges(triples), params=params)
    out["edges"] = edges
    # nodes derive from the materialized weight-compressed edge table —
    # one scan of ~|edges| rows instead of two scans of |triples|
    out["nodes"] = runner.run(
        "nodes", lambda: build_nodes(triples, edges=edges), params=params
    )

    runner.write_manifest()
    out["lineage"] = runner.lineage()
    return out


def curate_documents(
    spark: SparkSession,
    docs: DataFrame,
    out_root: str,
    quality_min: float = 0.3,
    near_dup_threshold: float = 0.7,
    budget_tokens: int = 2048,
) -> dict[str, DataFrame]:
    """Training-data curation pipeline over a documents table: exact
    dedup -> near-dup prune (MinHash LSH) -> quality filter ->
    deterministic train/val/test split -> sequence packing of the train
    split. Each stage is a resumable StageRunner materialization with
    per-partition lineage — the corpus-prep twin of :func:`run_pipeline`.

    Near-dup pruning keeps the lowest doc_id of every verified pair
    (pairs are emitted i < j, so dropping all j-sides is deterministic
    and chain-safe: in a chain a-b-c both b and c drop, a survives).

    Scale shape at 100 TB: fingerprint/quality/split are pure map stages
    (predicate-pushdown friendly, zero shuffle); exact dedup shuffles
    once on the uniform md5 key; the near-dup join is banded with the
    hot-bucket guard; packing windows per content-hash shard. No stage
    collects to the driver.
    """
    from entity_extractor_spark.operators.dedup import exact_dedup, minhash_lsh_pairs
    from entity_extractor_spark.operators.sampling import assign_split, pack_sequences
    from entity_extractor_spark.operators.textstats import quality_score

    runner = StageRunner(spark, out_root)
    params = {
        "quality_min": quality_min,
        "near_dup_threshold": near_dup_threshold,
        "budget_tokens": budget_tokens,
    }

    survivors = runner.run(
        "exact_dedup",
        lambda: docs.join(
            exact_dedup(docs).filter(~F.col("is_dup")).select("doc_id"), "doc_id"
        ),
        params=params,
        key_col="doc_id",
    )

    def _near_dedup() -> DataFrame:
        pairs = minhash_lsh_pairs(survivors, threshold=near_dup_threshold)
        drop = pairs.select(F.col("j").alias("doc_id")).distinct()
        return survivors.join(drop, "doc_id", "left_anti")

    near_deduped = runner.run("near_dedup", _near_dedup, params=params, key_col="doc_id")

    filtered = runner.run(
        "quality_filter",
        lambda: near_deduped.withColumn("quality", quality_score(F.col("text"))).filter(
            F.col("quality") >= quality_min
        ),
        params=params,
        key_col="doc_id",
    )

    split = runner.run(
        "split",
        lambda: filtered.withColumn("split", assign_split(F.col("doc_id"))),
        params=params,
        key_col="doc_id",
    )

    packed = runner.run(
        "packed",
        lambda: pack_sequences(split.filter(F.col("split") == "train"), budget_tokens),
        params=params,
        key_col="doc_id",
    )

    runner.write_manifest()
    return {
        "survivors": survivors,
        "near_deduped": near_deduped,
        "filtered": filtered,
        "split": split,
        "packed": packed,
        "lineage": runner.lineage(),
    }
