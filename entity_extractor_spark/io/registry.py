"""Gazetteer / ontology registry ingestion (SURVEY.md §1.1-2, S3, F7, U1).

The reference loads two registry shapes into driver dicts:

* ASCL: ``{term_id: {title, abstract, ascl_id, positive_bibcodes,
  negative_bibcodes, uncurated_bibcodes, used_in, described_in,
  cited_in}}`` — `optimized_extractor/preprocessing.py:32-74` (bibcode
  URL fields enumerated at :58, cleaned via the `abs/<key>` regex at
  :23-30);
* OntoSoft: ``[{label, description}]`` —
  `software_mentions_pipeline/load_inputs.py:55-65`.

Here both normalize into ONE gazetteer DataFrame shape
``(term_id, title, description, aliases, source, positive_convs,
negative_convs)`` — the registry stays a DataFrame until the matcher
build collects it (it is ~10^3-10^5 rows at any realistic scale, so
collect-to-broadcast is the right plan; SURVEY S3/J2). The label-set
union across registries (U1) is ``unionByName + dropDuplicates``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from entity_extractor_spark.functions.text import canonical_name, extract_url_key

GAZETTEER_COLS = [
    "term_id", "title", "description", "aliases", "source",
    "positive_convs", "negative_convs",
]


def load_ascl_registry(spark: SparkSession, path: str) -> DataFrame:
    """ASCL-shaped JSON: one top-level object keyed by term_id.

    The keyed-object layout is driver-unfriendly for spark.read.json
    (every term becomes a column), so the file is parsed once on the
    driver — mirroring the reference, and correct at registry scale —
    then parallelized as a DataFrame.
    """
    import json

    with open(path) as f:
        raw = json.load(f)
    rows = []
    for term_id, info in raw.items():
        rows.append(
            {
                "term_id": str(term_id),
                "title": info.get("title") or "",
                "description": info.get("abstract") or "",
                "aliases": list(info.get("aliases") or []),
                "source": "ASCL",
                # bibcode URL lists -> cleaned keys (F7), transposed to convs
                "positive_convs": [
                    k for k in (_url_key(u) for u in info.get("positive_bibcodes") or []) if k
                ],
                "negative_convs": [
                    k for k in (_url_key(u) for u in info.get("negative_bibcodes") or []) if k
                ],
            }
        )
    df = spark.createDataFrame(
        rows,
        "term_id string, title string, description string, aliases array<string>, "
        "source string, positive_convs array<string>, negative_convs array<string>",
    )
    return df.select(*GAZETTEER_COLS)


def _url_key(url: str) -> str:
    """`abs/([^/?#]+)` extraction (`preprocessing.py:23-30`), driver-side
    twin of functions.text.extract_url_key."""
    import re

    if not url:
        return ""
    m = re.search(r"abs/([^/?#]+)", url)
    return m.group(1) if m else url.strip()


def load_ontosoft_registry(spark: SparkSession, path: str) -> DataFrame:
    """OntoSoft-shaped JSONL/JSON array: [{label, description}] — a
    relational read (spark.read.json handles both line- and array-form)."""
    df = spark.read.option("multiLine", "true").json(path)
    if "label" not in df.columns:  # JSONL fallback
        df = spark.read.json(path)
    return df.select(
        F.concat(F.lit("onto:"), F.md5("label")).alias("term_id"),
        F.col("label").alias("title"),
        F.coalesce(F.col("description"), F.lit("")).alias("description"),
        F.array().cast("array<string>").alias("aliases"),
        F.lit("OntoSoft").alias("source"),
        F.array().cast("array<string>").alias("positive_convs"),
        F.array().cast("array<string>").alias("negative_convs"),
    )


def union_registries(*registries: DataFrame) -> DataFrame:
    """U1: union + dedup on the canonical (pre-colon) surface, first
    registry wins (`load_inputs.py:55-65` union semantics).

    The winner is chosen EXPLICITLY via a priority column (argument
    order) + row_number — ``dropDuplicates(['_canon'])`` keeps an
    arbitrary row per key after the union shuffle, so a term present in
    two registries could nondeterministically flip term_id across runs,
    breaking the determinism contract. term_id is the within-registry
    tie-break (a registry should not carry one canonical twice, but if
    it does the choice is still stable).
    """
    from pyspark.sql import Window

    out = registries[0].withColumn("_prio", F.lit(0))
    for i, r in enumerate(registries[1:], start=1):
        out = out.unionByName(r.withColumn("_prio", F.lit(i)))
    w = Window.partitionBy("_canon").orderBy("_prio", "term_id")
    return (
        out.withColumn("_canon", F.lower(canonical_name(F.col("title"))))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_canon", "_prio", "_rn")
    )


def registry_label_set(gazetteer: DataFrame) -> DataFrame:
    """Sorted distinct canonical labels (A9 over the registry)."""
    return (
        gazetteer.select(F.lower(canonical_name(F.col("title"))).alias("label"))
        .distinct()
        .orderBy("label")
    )


def restrict_to_worklist(transcripts: DataFrame, worklist: DataFrame, key: str = "conv_id") -> DataFrame:
    """S2/R1: scan elision via a broadcast semi join on the work-list —
    the set-oriented replacement for the reference's byte-offset point
    reads (`extraction_engine.py:217-229`). On Iceberg the same join
    triggers dynamic file pruning, so unmatched files are never read."""
    return transcripts.join(F.broadcast(worklist.select(key).distinct()), key, "left_semi")
