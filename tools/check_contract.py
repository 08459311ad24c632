#!/usr/bin/env python
"""Standalone driver-contract checker: run queries() vs oracle_sql() on a
chosen sf dir; pass query names as argv (default: all)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import math

SF_DIR = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")


def canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(a, b, name):
    if sorted(a.columns) != sorted(b.columns):
        return f"{name}: columns {sorted(a.columns)} vs {sorted(b.columns)}"
    if len(a) != len(b):
        return f"{name}: rows {len(a)} vs {len(b)}"
    a, b = canon(a), canon(b)
    for c in a.columns:
        # dtype KIND must agree (int vs float): the driver's value hash is
        # dtype-sensitive (HUGEINT sums materialize as float64 in pandas)
        ka, kb = a[c].dtype.kind, b[c].dtype.kind
        if (ka in "iuf" or kb in "iuf") and (ka in "iu") != (kb in "iu"):
            return f"{name}.{c}: dtype kind mismatch {a[c].dtype} vs {b[c].dtype}"
    for c in a.columns:
        for i, (x, y) in enumerate(zip(a[c].tolist(), b[c].tolist())):
            if isinstance(x, float) or isinstance(y, float):
                fx = float("nan") if x is None else float(x)
                fy = float("nan") if y is None else float(y)
                if math.isnan(fx) and math.isnan(fy):
                    continue
                if fx != fy:
                    return f"{name}.{c}[{i}]: {x!r} != {y!r}"
            elif str(x) != str(y):
                return f"{name}.{c}[{i}]: {x!r} != {y!r}"
    return None


def main():
    import __spark_entry__ as m
    from entity_extractor_spark.io.sources import TPCH_TABLES
    from entity_extractor_spark.session import get_spark

    qs, oracles = m.queries(), m.oracle_sql()
    names = sys.argv[1:] or list(qs)
    spark = get_spark("contract-check", cores=8)
    con = duckdb.connect()
    for t in TPCH_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    bad = 0
    for name in names:
        t0 = time.perf_counter()
        try:
            got = qs[name](spark, SF_DIR).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error {type(e).__name__}: {str(e)[:300]}")
            bad += 1
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle ({len(got)} rows, {time.perf_counter()-t0:.1f}s)")
            continue
        try:
            exp = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error {type(e).__name__}: {str(e)[:300]}")
            bad += 1
            continue
        err = compare(got, exp, name)
        if err:
            print(f"FAIL {err}")
            bad += 1
        else:
            print(f"OK   {name}: {len(got)} rows ({time.perf_counter()-t0:.1f}s)")
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
