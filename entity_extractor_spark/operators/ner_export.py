"""NER training-data export: mention spans -> spaCy-style records.

Spark restatement of the reference's `export_ner_training_data.py:26-43`:
each turn with at least one mention becomes one training record
``(conv_id, turn_idx, text, spans)`` where ``spans`` is the SORTED
``array<struct<start int, end int, label string>>`` of its mention
offsets — the shape NER fine-tuning consumes. (The reference's
likelihood threshold filter, P3/`export_ner_training_data.py:22-23`,
composes in front of this: pass it pre-filtered mentions.)

Plan shape: one groupBy on (conv_id, turn_idx) — the transcript bucket
key, so at scale the aggregation sorts within partitions — plus one join
back to the transcript table for the text (mentions deliberately do not
carry full turn text through the pipeline; see DEPLOYMENT shuffle
notes). ``array_sort`` on the struct orders by (start, end, label), so
the record is deterministic regardless of mention-row arrival order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ner_training_records(
    mentions: DataFrame,
    transcripts: DataFrame,
    label_col: str = "term_id",
) -> DataFrame:
    """(conv_id, turn_idx, text, spans) — one row per turn with >=1 span."""
    spans = (
        mentions.select(
            "conv_id",
            "turn_idx",
            F.struct(
                F.col("start").cast("int").alias("start"),
                F.col("end").cast("int").alias("end"),
                F.col(label_col).alias("label"),
            ).alias("s"),
        )
        .groupBy("conv_id", "turn_idx")
        .agg(F.array_sort(F.collect_list("s")).alias("spans"))
    )
    return spans.join(
        transcripts.select("conv_id", "turn_idx", "text"), ["conv_id", "turn_idx"]
    )


def spans_csv(spans_col: str = "spans"):
    """Canonical string form 'start:end:label,...' — used by the contract
    compare (cross-engine struct-array hashing is representation-
    sensitive; a canonical string is not)."""
    return F.array_join(
        F.transform(
            F.col(spans_col),
            lambda s: F.concat_ws(":", s["start"], s["end"], s["label"]),
        ),
        ",",
    )
