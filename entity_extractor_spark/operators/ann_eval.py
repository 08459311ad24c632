"""Retrieval-quality evaluation for the ANN paths.

Correctness rows (CORRECTNESS_r*.json) prove each ANN *plan* computes
exactly what it claims; they say nothing about whether the approximation
is any good. Recall@k against the exact brute-force baseline is the
quality dimension a real user tunes first (``n_planes`` for sign-LSH,
``n_probe`` for IVF), so it gets the same treatment as throughput: a
measured curve in BENCH.md and a floor asserted in the test suite.

Everything here is Spark-side (joins + one tiny aggregate) — no
collect-and-compare loops — so the same evaluation runs unchanged on a
cluster-sized corpus where the exact baseline is computed once and the
approximate candidates are evaluated against it.

The reference has no ANN at all (its cosine scoring is a driver-RAM dict
scan, `score_filtered_contexts.py:59-60`), so there is no reference
number to match — the brute-force path IS the ground truth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def topk_recall(approx: DataFrame, exact: DataFrame, k: int) -> DataFrame:
    """Per-query recall@k: |approx ∩ exact| / k.

    Both inputs are (query_id, rank, neighbor_id, ...) frames as produced
    by :mod:`operators.simsearch`'s ``*_topk`` functions. Queries missing
    from ``approx`` entirely (empty LSH bucket) score 0 — the LEFT join
    from the exact side guarantees they are counted, not dropped.
    """
    e = exact.select("query_id", "neighbor_id")
    a = approx.select(
        F.col("query_id").alias("aq"), F.col("neighbor_id").alias("an")
    )
    hit = (
        e.join(
            a,
            (F.col("query_id") == F.col("aq")) & (F.col("neighbor_id") == F.col("an")),
            "left",
        )
        .select("query_id", F.col("an").isNotNull().cast("int").alias("hit"))
    )
    return hit.groupBy("query_id").agg(
        (F.sum("hit") / F.lit(k)).alias("recall")
    )


def mean_recall(approx: DataFrame, exact: DataFrame, k: int) -> float:
    """Mean recall@k over all queries — the single tuning number."""
    row = (
        topk_recall(approx, exact, k)
        .agg(F.avg("recall").alias("r"))
        .collect()[0]
    )
    return float(row["r"])


def pair_recall(approx_pairs: DataFrame, exact_pairs: DataFrame) -> float:
    """Recall of a near-dup pair set vs the exact all-pairs baseline:
    |approx ∩ exact| / |exact|. Both frames are (i, j, ...) with i < j.
    Approximate-only pairs (false positives are impossible here — every
    candidate is exactly re-scored post-bucketing) are ignored by
    construction of the semi join."""
    e = exact_pairs.select("i", "j")
    n_exact = e.count()
    if n_exact == 0:
        return 1.0
    n_hit = e.join(approx_pairs.select("i", "j"), ["i", "j"], "semi").count()
    return n_hit / n_exact
