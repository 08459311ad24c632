"""Per-partition lineage rows, run metrics, and idempotent stage writes
(north rule: "resumable from checkpoint with per-partition lineage +
metrics"; replaces the reference's resume flags at
`run_extraction.py:253-260` and its driver-RAM result collection at
`extraction_engine.py:276-278`).

Design:
* lineage is computed RELATIONALLY — ``spark_partition_id()`` + a
  groupBy — never by collecting rows to the driver; at 10^12 rows the
  lineage table is ~one row per task;
* stage idempotence is marker-file based: a stage directory whose
  ``_STAGE_META.json`` matches the requested (stage, params) fingerprint
  is trusted and skipped, so a re-run after failure resumes at the first
  incomplete stage (the parquet `_SUCCESS` marker guards partial
  writes). On a cluster the same protocol rides on Iceberg snapshots;
* metrics come from the same lineage aggregation (row counts per stage)
  plus simple wall-clock stamps in the manifest.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

STAGE_META = "_STAGE_META.json"


def lineage_rows(df: DataFrame, stage: str, key_col: str | None = None) -> DataFrame:
    """One row per physical partition: row count (+ key range if given)."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    if key_col is not None:
        aggs += [F.min(key_col).alias("min_key"), F.max(key_col).alias("max_key")]
    return (
        df.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .agg(*aggs)
        .select(F.lit(stage).alias("stage"), F.col("_pid").alias("partition_id"), *[
            F.col(c) for c in (["n_rows", "min_key", "max_key"] if key_col else ["n_rows"])
        ])
    )


def _fingerprint(stage: str, params: dict) -> str:
    import hashlib

    blob = json.dumps({"stage": stage, "params": params}, sort_keys=True)
    return hashlib.sha1(blob.encode()).hexdigest()


@dataclass
class StageRunner:
    """Idempotent, lineage-tracked stage execution under one output root."""

    spark: SparkSession
    root: str
    run_metrics: list[dict] = field(default_factory=list)

    def _dir(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def is_done(self, stage: str, params: dict | None = None) -> bool:
        meta_path = os.path.join(self._dir(stage), STAGE_META)
        success = os.path.join(self._dir(stage), "_SUCCESS")
        if not (os.path.exists(meta_path) and os.path.exists(success)):
            return False
        with open(meta_path) as f:
            meta = json.load(f)
        return meta.get("fingerprint") == _fingerprint(stage, params or {})

    def run(
        self,
        stage: str,
        build: "callable",
        params: dict | None = None,
        key_col: str | None = None,
        partition_by: str | None = None,
    ) -> DataFrame:
        """Materialize ``build()`` to parquet under root/stage unless an
        identical completed run exists; returns the (re)loaded DataFrame
        so downstream stages read the materialized, lineage-truncated
        table (the checkpoint that makes the whole job resumable)."""
        out = self._dir(stage)
        if self.is_done(stage, params):
            self.run_metrics.append({"stage": stage, "skipped": True})
            return self.spark.read.parquet(out)
        t0 = time.perf_counter()
        df = build()
        writer = df.write.mode("overwrite")
        if partition_by:
            df = df.repartition(F.col(partition_by))
            writer = df.write.mode("overwrite")
        writer.parquet(out)
        loaded = self.spark.read.parquet(out)
        lin = lineage_rows(loaded, stage, key_col)
        lin_dir = os.path.join(self.root, "_lineage", stage)
        lin.write.mode("overwrite").parquet(lin_dir)
        # row count from the (tiny) lineage table, not a second full scan
        # of the stage output — at 10^12 rows the saved scan is the
        # difference between one and two passes over every stage's bytes
        n = int(
            self.spark.read.parquet(lin_dir)
            .agg(F.coalesce(F.sum("n_rows"), F.lit(0)))
            .first()[0]
        )
        self.run_metrics.append(
            {
                "stage": stage,
                "skipped": False,
                "rows": n,
                "wall_s": round(time.perf_counter() - t0, 3),
            }
        )
        with open(os.path.join(out, STAGE_META), "w") as f:
            json.dump({"fingerprint": _fingerprint(stage, params or {}), "rows": n}, f)
        return loaded

    def write_manifest(self) -> str:
        path = os.path.join(self.root, "_RUN_MANIFEST.json")
        payload = {"metrics": self.run_metrics, "completed_utc": time.time()}
        with open(path, "w") as f:
            json.dump(payload, f, indent=2)
        return path

    def lineage(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.root, "_lineage", "*"))
