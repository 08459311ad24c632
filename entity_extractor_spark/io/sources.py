"""Source adapters for the driver test tables and corpus formats.

The reference streams JSONL documents (`batch_filter.py:17-24`) and
coerces the polymorphic ``title`` field (`extraction_engine.py:108-117`);
the engine ingests through Spark readers with explicit schemas, PERMISSIVE
mode for malformed lines, and normalizes polymorphism at ingest (F17) so
nothing downstream sees a union type.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TPCH_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def documents_as_transcripts(documents: DataFrame, convs: int = 50) -> DataFrame:
    """Adapt the driver's `documents` table to the transcript schema so
    transcript operators run on driver-provided data: docs are grouped
    into pseudo-conversations of ``convs`` interleaved docs, role derives
    from lang (en->user, de->assistant, others keep lang)."""
    return documents.select(
        F.concat(F.lit("conv-"), F.lpad((F.col("doc_id") % convs).cast("string"), 6, "0")).alias(
            "conv_id"
        ),
        (F.col("doc_id") / convs).cast("int").alias("turn_idx"),
        F.when(F.col("lang") == "en", "user")
        .when(F.col("lang") == "de", "assistant")
        .otherwise(F.col("lang"))
        .alias("role"),
        F.col("text"),
        F.lit(None).cast("string").alias("tool"),
        F.lit(None).cast("timestamp").alias("ts"),
    )


def register_views(spark: SparkSession, tables: dict[str, DataFrame]) -> None:
    """Interactive-SQL surface (SURVEY §3.3): register materialized stage
    tables as temp views so `spark.sql` queries them directly — the
    engine's replacement for the reference's dashboard query path."""
    for name, df in tables.items():
        df.createOrReplaceTempView(name)


def read_jsonl_corpus(spark: SparkSession, path: str) -> DataFrame:
    """S1: JSONL corpus scan with malformed-line tolerance and title
    coercion (str | array<string> | null -> string)."""
    raw = spark.read.option("mode", "PERMISSIVE").json(path)
    cols = {f.name: f.dataType.simpleString() for f in raw.schema.fields}
    title = F.col("title")
    if cols.get("title", "").startswith("array"):
        # homogeneous file: Spark inferred array<string>
        title = F.concat_ws(" ", F.col("title"))
    elif cols.get("title") == "string":
        # mixed str|list file: Spark widens to string and keeps list rows
        # as raw JSON text — detect and parse those per row (F17)
        looks_json_array = F.col("title").rlike(r"^\s*\[")
        title = F.when(
            looks_json_array,
            F.concat_ws(" ", F.from_json("title", "array<string>")),
        ).otherwise(F.col("title"))
    return raw.select(
        F.col("bibcode"),
        F.coalesce(title.cast("string"), F.lit("")).alias("title"),
        F.coalesce(F.col("abstract").cast("string"), F.lit("")).alias("abstract")
        if "abstract" in cols
        else F.lit("").alias("abstract"),
        F.coalesce(F.col("body").cast("string"), F.lit("")).alias("body")
        if "body" in cols
        else F.lit("").alias("body"),
    ).filter(F.col("bibcode").isNotNull() & (F.col("bibcode") != ""))
