"""Sinks (SURVEY.md §2.1 S5-S10): columnar mention table, per-key export,
compressed CSV, JSONL stage dumps, summary-stats report.

Differences from the reference are deliberate Spark-first restatements:
the reference loops Python over ``df[df.term_id == t]`` to emit one CSV
per term (`output_formatter.py:42-73`); here that is ONE ``partitionBy``
write — a single shuffle-free fan-out where each task writes its own
partition directory. The summary report (`output_formatter.py:75-100`)
becomes one aggregation plan instead of nine pandas passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_mentions_parquet(df: DataFrame, path: str, buckets_col: str = "conv_id") -> None:
    """S5: snappy parquet, repartitioned by the conversation key so
    downstream conv-keyed joins/windows read co-located data
    (`extraction_engine.py:331-333`; bucketing stands in for Iceberg
    bucket partitioning on the cluster)."""
    df.repartition(F.col(buckets_col)).write.mode("overwrite").option(
        "compression", "snappy"
    ).parquet(path)


def write_range_clustered(
    df: DataFrame, path: str, cols: list[str], n_files: int | None = None
) -> None:
    """Range-clustered layout: ``repartitionByRange`` on the cluster keys
    then ``sortWithinPartitions`` before the write, so every output file
    covers a DISJOINT key range and its parquet footer min/max statistics
    let a range or point predicate skip whole files — the local stand-in
    for Iceberg sort-ordered data files + metadata pruning, which is what
    makes a 100 TB point-read cheap (SURVEY S2: the reference's byte-offset
    ``bibcode_lookup`` index maps to exactly this). Range partitioning
    SAMPLES the key distribution, so file sizes stay balanced under skew
    where static hash bucketing would not preserve ranges. Disjointness is
    asserted from the real file footers in tests/test_sources.py."""
    part = (
        df.repartitionByRange(n_files, *[F.col(c) for c in cols])
        if n_files
        else df.repartitionByRange(*[F.col(c) for c in cols])
    )
    part.sortWithinPartitions(*cols).write.mode("overwrite").option(
        "compression", "snappy"
    ).parquet(path)


def zorder_key(c1, c2, bits: int = 16):
    """Morton (Z-order) interleave of two non-negative int columns,
    clamped to ``bits`` bits each — pure codegen arithmetic (one
    shift-and-mask term per bit, same discipline as the SimHash fold),
    no UDF. Bit i of c1 lands at position 2i+1, of c2 at 2i, so nearby
    (c1, c2) points get nearby z-values in BOTH dimensions."""
    cap = F.lit((1 << bits) - 1)
    a = F.least(F.greatest(c1.cast("long"), F.lit(0)), cap)
    b = F.least(F.greatest(c2.cast("long"), F.lit(0)), cap)
    z = None
    for i in range(bits):
        term = F.shiftright(a, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i + 1)) + (
            F.shiftright(b, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i))
        )
        z = term if z is None else z + term
    return z.cast("long")


def write_zorder_clustered(
    df: DataFrame, path: str, col1: str, col2: str, n_files: int = 8, bits: int = 16
) -> None:
    """Z-order-clustered layout: range-partition + sort on the Morton
    interleave of TWO cluster keys, so every output file covers a
    compact rectangle-ish region of the (col1, col2) plane and its
    parquet footer min/max statistics prune files for predicates on
    EITHER dimension — the two-column generalization of
    :func:`write_range_clustered` (which gives perfect pruning on its
    sort key and none on any other column). This is the local stand-in
    for Delta/Iceberg Z-ORDER table layout. The z column is dropped
    before the write; the curve only dictates placement.
    Two-dimensional pruning is asserted from real file footers in
    tests/test_sources.py (a band query on col2 skips files under this
    layout and none under the 1-D layout)."""
    z = zorder_key(F.col(col1), F.col(col2), bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .option("compression", "snappy")
        .parquet(path)
    )


def write_csv_gzip(df: DataFrame, path: str) -> None:
    """S6: whole-table gzip CSV export (`output_formatter.py:26-40`)."""
    df.write.mode("overwrite").option("header", True).option(
        "compression", "gzip"
    ).csv(path)


def write_partitioned_by_key(df: DataFrame, path: str, key: str = "term_id") -> None:
    """S7: one directory per key — replaces the reference's Python loop
    over ``unique()`` (`output_formatter.py:42-73`) with a single
    partitioned write."""
    df.write.mode("overwrite").partitionBy(key).option("header", True).csv(path)


def write_jsonl(df: DataFrame, path: str) -> None:
    """S8: JSONL stage sink (`batch_filter.py:58-64`). Inside the engine,
    stages stay DataFrames; this exists for interop exports only."""
    df.write.mode("overwrite").json(path)


def summary_stats(mentions: DataFrame) -> DataFrame:
    """S10/A1-A5: dataset aggregate report (`output_formatter.py:75-100`)
    as one plan: totals, distincts, location distribution, per-conv mean."""
    per_conv = mentions.groupBy("conv_id").agg(F.sum("match_count").alias("s"))
    totals = mentions.agg(
        F.count(F.lit(1)).alias("total_mentions"),
        F.countDistinct("term_id").alias("n_terms"),
        F.countDistinct("conv_id").alias("n_convs"),
        F.sum(F.col("in_user").cast("long")).alias("n_in_user"),
        F.sum(F.col("in_assistant").cast("long")).alias("n_in_assistant"),
    )
    mean_per_conv = per_conv.agg(F.round(F.avg("s"), 4).alias("mean_mentions_per_conv"))
    return totals.crossJoin(mean_per_conv)


def write_summary_json(mentions: DataFrame, path: str) -> None:
    """S10: one-row JSON summary file."""
    summary_stats(mentions).coalesce(1).write.mode("overwrite").json(path)
