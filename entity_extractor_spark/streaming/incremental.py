"""Checkpointed incremental mention extraction.

``readStream`` over the transcript directory + ``foreachBatch`` running
the full batch extraction (scan + per-(conv,term) flag window) per
micro-batch, appending to the mention table. ``Trigger.AvailableNow``
drains whatever is new and stops; the checkpoint dir records which input
files are done, so re-running after new transcript files land processes
ONLY the new files — the streaming restatement of the reference's
resume flags (`run_extraction.py:253-260`,
`optimized_extractor/README.md:183-189`).

Why foreachBatch rather than a pure streaming plan: the flag window
(`max(...) over (conv_id, term_id)`, SURVEY W2/A12) is a non-time window,
which Structured Streaming cannot express incrementally; within a
micro-batch it is exact for the new conversations the batch contains.
At cluster scale the same code runs unchanged — the checkpoint moves to
durable storage and the sink to an Iceberg append.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)


def incremental_extract(
    spark: SparkSession,
    input_dir: str,
    gazetteer: pd.DataFrame,
    output_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
) -> None:
    """Drain all currently-available new transcript files into the
    mention table, then stop.

    Exactly-once at the table level: each micro-batch OVERWRITES its own
    ``batch_id=<id>`` subdirectory. foreachBatch is at-least-once (a
    failure between the write and the checkpoint commit replays the
    batch), but a replay re-overwrites the same directory with the same
    rows, so the table never holds duplicate mention rows. Readers see
    ``batch_id`` as a partition column — free per-batch lineage. At
    cluster scale the same code targets an Iceberg table with
    ``overwritePartitions``; the checkpoint moves to durable storage.
    """
    from entity_extractor_spark.operators.mentions import extract_mentions

    reader = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger or 1000)
        .parquet(input_dir)
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        mentions = extract_mentions(batch_df, gazetteer)
        mentions.write.mode("overwrite").parquet(f"{output_dir}/batch_id={batch_id}")

    q = (
        reader.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
