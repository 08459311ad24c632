"""Graph materialization: triples -> node/edge tables, skew-safe.

FIXTURES.md §5 shapes. The aggregation paths use *explicit hot-key
salting* (SURVEY R6 / north rule): a groupBy on ``obj`` is exposed to
entity skew (one hot entity in ~30% of turns), so counts are computed in
two stages — partial counts over ``(key, salt)`` then a final merge over
``key``. Spark's partial aggregation already map-side-combines, but the
salted form also protects the FINAL aggregate when a single key's partial
rows exceed one reducer's share (the 10^12-turn case), and it is the
pattern a reviewer should copy for non-associative aggs (collect_list
etc.) where map-side combine does not save you.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT_BUCKETS = 16


def _salt(salt_buckets: int):
    """Retry-deterministic salt: the physical partition index mod buckets.

    ``spark_partition_id()`` is stable under task retries (a re-executed
    task recomputes the same partition), unlike
    ``hash(monotonically_increasing_id())`` whose values depend on the
    task attempt — which would be row-routing-unsafe for non-associative
    aggregates. A hot key's rows spread across however many input
    partitions hold them, which is exactly the skew being defused.
    """
    return F.pmod(F.spark_partition_id(), F.lit(salt_buckets))


def salted_count(df: DataFrame, keys: list[str], salt_buckets: int = DEFAULT_SALT_BUCKETS) -> DataFrame:
    """Two-stage skew-safe count: groupBy(keys + salt) -> groupBy(keys)."""
    salted = df.withColumn("_salt", _salt(salt_buckets))
    partial = salted.groupBy(*keys, "_salt").agg(F.count(F.lit(1)).alias("_partial"))
    return partial.groupBy(*keys).agg(F.sum("_partial").alias("weight"))


def salted_collect_list(
    df: DataFrame, keys: list[str], value_col: str, salt_buckets: int = DEFAULT_SALT_BUCKETS
) -> DataFrame:
    """Two-stage skew-safe collect for a NON-associative aggregate — the
    template the salted_count docstring promises.

    Map-side combine does not protect ``collect_list`` (partial lists
    still concentrate on the key's one reducer), so the partial stage
    collects per ``(keys, salt)`` and the final stage flattens the
    per-salt lists. The final array is ``array_sort``-ed, making the
    merge order-insensitive — the result is deterministic regardless of
    which salt routed which row, including across task retries.
    Output column: ``<value_col>s`` (sorted array).
    """
    salted = df.withColumn("_salt", _salt(salt_buckets))
    partial = salted.groupBy(*keys, "_salt").agg(
        F.collect_list(value_col).alias("_part")
    )
    return partial.groupBy(*keys).agg(
        F.array_sort(F.flatten(F.collect_list("_part"))).alias(f"{value_col}s")
    )


def build_edges(triples: DataFrame, salt_buckets: int = DEFAULT_SALT_BUCKETS) -> DataFrame:
    """edges(src, dst, pred, weight) — salted weight aggregation."""
    return salted_count(
        triples.select(F.col("subj").alias("src"), F.col("obj").alias("dst"), "pred"),
        ["src", "dst", "pred"],
        salt_buckets,
    ).select("src", "dst", "pred", F.col("weight").cast("long").alias("weight"))


def build_nodes(
    triples: DataFrame,
    entity_names: DataFrame | None = None,
    edges: DataFrame | None = None,
) -> DataFrame:
    """nodes(node_id, kind, canonical_name, mention_count).

    kind is derived from the id shape: ``tool:*`` -> tool, ``conv-*:n``
    -> turn, ``conv-*`` -> conversation, else entity.

    When the (src, dst, pred, weight) ``edges`` table from
    :func:`build_edges` is already materialized, pass it: every
    triple's (subj, obj, pred) appears in edges with its occurrence
    count, so the node-id universe and the per-node mention counts can
    be re-derived from the ~weight-compressed edge table instead of
    re-scanning the raw triples — the node stage's input drops from
    2 passes over every triple to 1 pass over the (much smaller)
    aggregated edges, identical output.
    """
    if edges is not None:
        ids = (
            edges.select(F.col("src").alias("node_id"))
            .unionByName(edges.select(F.col("dst").alias("node_id")))
        )
        counts = (
            edges.filter(F.col("pred") == "mentions")
            .groupBy(F.col("dst").alias("node_id"))
            .agg(F.sum("weight").alias("mention_count"))
        )
    else:
        ids = (
            triples.select(F.col("subj").alias("node_id"))
            .unionByName(triples.select(F.col("obj").alias("node_id")))
        )
        counts = salted_count(
            triples.filter(F.col("pred") == "mentions").select(F.col("obj").alias("node_id")),
            ["node_id"],
        ).withColumnRenamed("weight", "mention_count")
    kind = (
        F.when(F.col("node_id").startswith("tool:"), "tool")
        .when(F.col("node_id").rlike("^conv-[0-9]+:[0-9]+$"), "turn")
        .when(F.col("node_id").rlike("^conv-[0-9]+$"), "conversation")
        .otherwise("entity")
    )
    nodes = (
        ids.distinct()
        .join(counts, "node_id", "left")
        .select(
            "node_id",
            kind.alias("kind"),
            F.col("node_id").alias("canonical_name"),
            F.coalesce("mention_count", F.lit(0)).cast("long").alias("mention_count"),
        )
    )
    if entity_names is not None:
        nm = F.broadcast(
            entity_names.select(F.col("entity_id").alias("node_id"), F.col("name").alias("_nm"))
        )
        nodes = nodes.join(nm, "node_id", "left").select(
            "node_id", "kind", F.coalesce("_nm", "canonical_name").alias("canonical_name"), "mention_count"
        )
    return nodes


def bucket_by_conv(df: DataFrame, n_buckets: int) -> DataFrame:
    """Repartition by conv_id for co-located downstream joins/writes —
    the parquet-level stand-in for Iceberg bucket partitioning."""
    return df.repartition(n_buckets, "conv_id")
