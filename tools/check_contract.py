#!/usr/bin/env python
"""Standalone driver-contract checker: run queries() vs oracle_sql() on a
chosen sf dir; pass query names as argv (default: all)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from entity_extractor_spark.contract.compare import compare_frames as compare

SF_DIR = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")
# export the resolved dir so sf-aware oracle generation (ann_ivf_trained
# trains its centroid bank from the same parquet the views read) agrees
# with the views even when the caller relied on the default
os.environ["TEST_SF_DIR"] = SF_DIR


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
