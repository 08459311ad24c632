"""Snapshot catalog: atomic commits, time travel, MERGE INTO semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from entity_extractor_spark.io.catalog import (
    merge_into,
    read_table,
    table_versions,
    write_table,
)


def test_snapshot_write_read_time_travel(spark, tmp_path):
    t = str(tmp_path / "tbl")
    df0 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    assert write_table(df0, t) == 0
    df1 = spark.createDataFrame([(1, "a2"), (3, "c")], "id long, v string")
    assert write_table(df1, t) == 1
    assert table_versions(t) == [0, 1]
    latest = {r["id"]: r["v"] for r in read_table(spark, t).collect()}
    assert latest == {1: "a2", 3: "c"}
    old = {r["id"]: r["v"] for r in read_table(spark, t, version=0).collect()}
    assert old == {1: "a", 2: "b"}


def test_read_empty_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        read_table(spark, str(tmp_path / "missing"))


def test_merge_into_upsert_latest_wins(spark, tmp_path):
    t = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(1, "keep", 0), (2, "old", 0), (3, "old", 0)], "id long, v string, ts long"
    )
    write_table(base, t)
    updates = spark.createDataFrame(
        [(2, "newA", 5), (2, "newB", 9), (4, "ins", 1)], "id long, v string, ts long"
    )
    v = merge_into(spark, t, updates, ["id"], order_col="ts")
    assert v == 1
    got = {r["id"]: r["v"] for r in read_table(spark, t).collect()}
    # conflicting updates: highest ts wins; unmatched base rows survive;
    # new keys inserted
    assert got == {1: "keep", 2: "newB", 3: "old", 4: "ins"}


def test_partitioned_snapshot(spark, tmp_path):
    t = str(tmp_path / "tbl")
    df = spark.createDataFrame([(f"c{i % 3}", i) for i in range(30)], "conv_id string, x long")
    write_table(df, t, partition_by="conv_id")
    assert read_table(spark, t).count() == 30
