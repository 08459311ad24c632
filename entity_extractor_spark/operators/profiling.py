"""Single-pass table profiling for data-quality gates.

Before a 100 TB corpus feeds training, you profile it: null rates,
distinct cardinalities, row counts per column. This is ONE aggregation
pass (2 expressions per column, partial+final via Catalyst) followed by
a constant-size unpivot — never per-column scans.

``exact=True`` uses count(distinct) (driver-contract / small-scale);
the default uses HyperLogLog ``approx_count_distinct`` (the only sane
choice at 10^12 rows — rsd 5%).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, cols: list[str] | None = None, exact: bool = False) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct) — one aggregation pass."""
    cols = cols or df.columns
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"_nulls_{c}"))
        if exact:
            aggs.append(F.countDistinct(c).alias(f"_dist_{c}"))
        else:
            aggs.append(F.approx_count_distinct(c).alias(f"_dist_{c}"))
    one = df.agg(*aggs)
    stack_args = []
    for c in cols:
        stack_args += [f"'{c}'", f"_nulls_{c}", f"_dist_{c}"]
    return one.select(
        F.col("_n").alias("n_rows"),
        F.expr(f"stack({len(cols)}, {', '.join(stack_args)}) AS (column, n_nulls, n_distinct)"),
    ).select("column", "n_rows", "n_nulls", "n_distinct").orderBy("column")
