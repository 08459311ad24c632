"""Relation-triple extraction over role/tool-tagged adjacent turns (W4).

The reference has no cross-section relations; the north rule adds
dependency-pattern predicates over consecutive turns — the transcript
generalization of the reference's ±100-word context window
(`extraction_engine.py:69-92`) across turn boundaries.

All predicates are pure window/join plans:

* ``mentions``   — (turn, entity) from the mention table (dedup A8);
* ``uses_tool``  — assistant turn immediately followed by a tool turn
                   (lead over (conv_id) ordered by turn_idx);
* ``replies_to`` — assistant turn immediately after a user turn (lag);
* ``co_mentions``— unordered entity pair mentioned in the same turn
                   (self-join on (conv_id, turn_idx), src < dst).

The window partitioning key is conv_id — the same key the transcript
table is bucketed by, so at scale these windows sort within partitions
without a full shuffle (`sortWithinPartitions` locality, SURVEY O1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TRIPLE_COLS = ["subj", "pred", "obj", "conv_id", "turn_idx"]


def _conv_window() -> Window:
    return Window.partitionBy("conv_id").orderBy("turn_idx")


def mention_triples(mentions: DataFrame, entity_map: DataFrame | None = None) -> DataFrame:
    """(conv:turn) -mentions-> entity; entity id canonicalized if a
    (term_id, entity_id) map is supplied (broadcast — it is tiny)."""
    m = mentions.select("conv_id", "turn_idx", "term_id").dropDuplicates(
        ["conv_id", "turn_idx", "term_id"]
    )
    if entity_map is not None:
        m = m.join(F.broadcast(entity_map), "term_id", "left").withColumn(
            "obj", F.coalesce("entity_id", "term_id")
        )
    else:
        m = m.withColumn("obj", F.col("term_id"))
    return m.select(
        F.concat_ws(":", "conv_id", "turn_idx").alias("subj"),
        F.lit("mentions").alias("pred"),
        "obj",
        "conv_id",
        "turn_idx",
    )


def adjacent_turns(transcripts: DataFrame) -> DataFrame:
    """ONE window pass computing every adjacent-turn column (lead role/
    tool, lag role/turn). All predicate extractors filter from this frame,
    so the conv_id sort+exchange happens once no matter how many
    predicates are derived (Catalyst reuses the shared subplan)."""
    w = _conv_window()
    return transcripts.select(
        "conv_id",
        "turn_idx",
        "role",
        F.lead("role").over(w).alias("next_role"),
        F.lead("tool").over(w).alias("next_tool"),
        F.lag("role").over(w).alias("prev_role"),
        F.lag("turn_idx").over(w).alias("prev_idx"),
    )


def uses_tool_triples(transcripts: DataFrame, adjacent: DataFrame | None = None) -> DataFrame:
    t = adjacent if adjacent is not None else adjacent_turns(transcripts)
    return t.filter(
        (F.col("role") == "assistant") & (F.col("next_role") == "tool") & F.col("next_tool").isNotNull()
    ).select(
        F.concat_ws(":", "conv_id", "turn_idx").alias("subj"),
        F.lit("uses_tool").alias("pred"),
        F.concat(F.lit("tool:"), F.col("next_tool")).alias("obj"),
        "conv_id",
        "turn_idx",
    )


def replies_to_triples(transcripts: DataFrame, adjacent: DataFrame | None = None) -> DataFrame:
    t = adjacent if adjacent is not None else adjacent_turns(transcripts)
    return t.filter((F.col("role") == "assistant") & (F.col("prev_role") == "user")).select(
        F.concat_ws(":", "conv_id", "turn_idx").alias("subj"),
        F.lit("replies_to").alias("pred"),
        F.concat_ws(":", "conv_id", "prev_idx").alias("obj"),
        "conv_id",
        "turn_idx",
    )


def co_mention_triples(mentions: DataFrame, entity_map: DataFrame | None = None) -> DataFrame:
    """Unordered same-turn entity pairs. The self-join key (conv_id,
    turn_idx) is high-cardinality and evenly distributed, so this is a
    well-behaved shuffle join even when one ENTITY is hot."""
    m = mentions.select("conv_id", "turn_idx", "term_id").dropDuplicates(
        ["conv_id", "turn_idx", "term_id"]
    )
    if entity_map is not None:
        m = (
            m.join(F.broadcast(entity_map), "term_id", "left")
            .withColumn("eid", F.coalesce("entity_id", "term_id"))
            .select("conv_id", "turn_idx", "eid")
            .dropDuplicates(["conv_id", "turn_idx", "eid"])
        )
    else:
        m = m.withColumnRenamed("term_id", "eid")
    a = m.withColumnRenamed("eid", "e1")
    b = m.withColumnRenamed("eid", "e2")
    return (
        a.join(b, ["conv_id", "turn_idx"])
        .filter(F.col("e1") < F.col("e2"))
        .select(
            F.col("e1").alias("subj"),
            F.lit("co_mentions").alias("pred"),
            F.col("e2").alias("obj"),
            "conv_id",
            "turn_idx",
        )
    )


def alias_triples(entity_map: DataFrame) -> DataFrame:
    """term -alias_of-> canonical entity (from canonicalization)."""
    return entity_map.filter(F.col("term_id") != F.col("entity_id")).select(
        F.col("term_id").alias("subj"),
        F.lit("alias_of").alias("pred"),
        F.col("entity_id").alias("obj"),
        F.lit(None).cast("string").alias("conv_id"),
        F.lit(None).cast("int").alias("turn_idx"),
    )


def all_triples(
    transcripts: DataFrame, mentions: DataFrame, entity_map: DataFrame | None = None
) -> DataFrame:
    adjacent = adjacent_turns(transcripts)
    parts = [
        mention_triples(mentions, entity_map),
        uses_tool_triples(transcripts, adjacent),
        replies_to_triples(transcripts, adjacent),
        co_mention_triples(mentions, entity_map),
    ]
    if entity_map is not None:
        parts.append(alias_triples(entity_map))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
