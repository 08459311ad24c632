"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same parquet,
compare row count + column names + (order-insensitive) values."""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod
from entity_extractor_spark.io.sources import TPCH_TABLES

SF_DIR = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")
# export the resolved dir so sf-aware oracle generation (ann_ivf_trained)
# trains from the same parquet the DuckDB views read
os.environ["TEST_SF_DIR"] = SF_DIR


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TPCH_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def _compare(a: pd.DataFrame, b: pd.DataFrame, name: str):
    # single definition shared with tools/check_contract.py
    from entity_extractor_spark.contract.compare import compare_frames

    err = compare_frames(a, b, name)
    assert err is None, err


def test_all_queries_match_oracle(spark, duck):
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    missing = set(qs) - set(oracles)
    failures = []
    for name, fn in qs.items():
        if name not in oracles:
            continue
        try:
            got = fn(spark, SF_DIR).toPandas()
            exp = duck.execute(oracles[name]).df()
            _compare(got, exp, name)
        except AssertionError as e:
            failures.append(str(e))
    assert not failures, "\n".join(failures)
    # every declared query must carry an exact oracle (75/75 since round 2)
    assert not missing, f"queries without oracle entries: {missing}"


def test_priority_window_covers_gating_keys():
    """The driver checks only the FIRST 50 queries() entries; every
    SURVEY §2-gating key must sit inside that window (round-1 verdict
    item 1)."""
    keys = list(entry_mod.queries())
    window = set(keys[:50])
    assert set(entry_mod.PRIORITY_KEYS) <= window
    assert len(entry_mod.PRIORITY_KEYS) == 50
    # every queries() key has an oracle (exactness contract, 0 rows-only)
    assert set(entry_mod.queries()) <= set(entry_mod.oracle_sql())


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert {"term_id", "term_name", "n_mentions", "n_convs"} <= set(df.columns)
