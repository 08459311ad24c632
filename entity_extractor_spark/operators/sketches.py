"""Deterministic cardinality sketches.

KMV (k-minimum-values) distinct-count estimation — the mergeable sketch
behind approx_count_distinct-style metrics, built here from first
principles so the estimate itself is a HASH-VERIFIED contract value:
both engines hash with md5, keep the k smallest hash values per group,
and apply the same estimator, so the result is bit-identical (Spark's
builtin approx_count_distinct uses HyperLogLog++ with
implementation-defined registers and cannot be cross-checked
value-exactly against another engine).

Why it scales: the per-group state is k 60-bit values regardless of
input size — the groupBy carries a bounded payload, and two KMV sketches
of the same column merge by keeping the k smallest of their union
(standard Beyer et al. PODS'07 semantics), which is what makes the
estimate computable per Iceberg partition and combined at the
coordinator without a second scan at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

KMV_K = 32
_HASH_SPACE = float(1 << 60)  # 15 hex chars of md5 → value in [0, 2^60)


def _hval(col):
    """First 60 bits of md5 as a bigint — same bytes both engines."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("long")


def _hval_sql(expr: str) -> str:
    return f"CAST(('0x' || substring(md5(CAST({expr} AS VARCHAR)), 1, 15)) AS BIGINT)"


def kmv_distinct(
    df: DataFrame, group_col: str, value_col, k: int = KMV_K
) -> DataFrame:
    """Per-group exact distinct count + KMV estimate.

    ``value_col`` may be a column name or a Column expression (e.g. an
    exploded shingle). Estimator: with d ≤ k distinct values the sketch
    is lossless (estimate = d); otherwise estimate = (k-1) * 2^60 /
    h_(k) where h_(k) is the k-th smallest distinct hash value. The
    plan is one distinct on (group, value) — the only shuffle — then a
    window rank over the k smallest hashes per group; at scale the
    distinct is a partial-aggregated hash shuffle on exactly the key the
    table is bucketed by.

    The exact count is emitted next to the estimate so the contract row
    itself documents estimator error; both columns hash-match the
    DuckDB mirror.
    """
    vc = F.col(value_col) if isinstance(value_col, str) else value_col
    dv = df.select(F.col(group_col).alias("grp"), vc.alias("val")).dropDuplicates(
        ["grp", "val"]
    )
    hashed = dv.select("grp", _hval(F.col("val")).alias("h")).dropDuplicates(["grp", "h"])
    w = Window.partitionBy("grp").orderBy("h")
    ranked = hashed.withColumn("r", F.row_number().over(w))
    agg = ranked.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_exact"),
        F.max(F.when(F.col("r") == k, F.col("h"))).alias("hk"),
    )
    est = F.when(
        F.col("n_exact") <= k, F.col("n_exact").cast("double")
    ).otherwise(F.lit(float(k - 1)) * F.lit(_HASH_SPACE) / F.col("hk").cast("double"))
    return agg.select(
        F.col("grp").alias(group_col),
        F.col("n_exact"),
        F.round(est, 4).alias("kmv_estimate"),
    )


def kmv_distinct_sql(rel: str, group_col: str, k: int = KMV_K) -> str:
    """DuckDB twin of :func:`kmv_distinct`; ``rel`` must yield columns
    ``grp`` and ``val`` (pre-exploded)."""
    return f"""WITH _kmv_dv AS (SELECT DISTINCT grp, val FROM ({rel})),
        _kmv_h AS (SELECT DISTINCT grp, {_hval_sql('val')} AS h FROM _kmv_dv),
        _kmv_r AS (SELECT grp, h, row_number() OVER (PARTITION BY grp ORDER BY h) AS r FROM _kmv_h),
        _kmv_a AS (
          SELECT grp, count(*) AS n_exact,
                 max(CASE WHEN r = {k} THEN h END) AS hk
          FROM _kmv_r GROUP BY grp
        )
        SELECT grp AS {group_col}, n_exact,
               round(CASE WHEN n_exact <= {k} THEN n_exact::DOUBLE
                          ELSE {float(k - 1)!r} * {_HASH_SPACE!r} / hk::DOUBLE END, 4) AS kmv_estimate
        FROM _kmv_a"""
