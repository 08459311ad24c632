"""Mention scan stage: transcripts -> candidate-mention table.

Spark-first restatement of the reference's extraction phase
(`optimized_extractor/extraction_engine.py:102-203` + the mp.Pool fan-out
at :249-284): one Arrow-batched ``mapInPandas`` pass over the transcript
table with a broadcast gazetteer matcher. No driver collect, no per-row
Python UDF calls, no seek-based point reads — Catalyst prunes the scan to
the four needed columns and the stage parallelizes per input partition.

Per-occurrence fan-out semantics (one output row per individual match,
`test_individual_matches.py:12-58`), ±window-word context within the turn
text (`extraction_engine.py:69-92`), and per-(conv, term) role flags
(`extraction_engine.py:150-184`, transposed title/abstract -> user/
assistant) are preserved. Flags are computed relationally with a window
max over (conv_id, term_id) rather than inside the kernel, so the scan
stays embarrassingly parallel and the only shuffle is the flag window —
partitioned by conv_id, which is also the table's bucket key at scale.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from entity_extractor_spark.matching.context import DEFAULT_WINDOW_WORDS, WordIndex
from entity_extractor_spark.matching.matcher import GazetteerMatcher, canonical_surface

MENTION_SCHEMA = (
    "conv_id string, turn_idx int, term_id string, term_name string, "
    "surface string, start int, end int, context string, match_location string"
)


def build_matcher_from_gazetteer(
    gazetteer: DataFrame | pd.DataFrame, include_aliases: bool = False, mode: str = "word_boundary"
) -> tuple[GazetteerMatcher, dict[str, str]]:
    """Collect the (small) gazetteer and build the broadcastable matcher.

    The gazetteer plays the reference's driver-RAM ontology dict role
    (`preprocessing.py:40-47`); at 100 TB scale it is still ~10^3-10^5
    rows, so collect-to-broadcast is the right plan (SURVEY S3/J2).
    """
    if isinstance(gazetteer, DataFrame):
        cols = ["term_id", "title"] + (["aliases"] if include_aliases else [])
        pdf = gazetteer.select(*cols).toPandas()
    else:
        pdf = gazetteer
    names: dict[str, str] = {}
    terms: list[tuple[str, list[str]]] = []
    for row in pdf.itertuples(index=False):
        title = row.title or ""
        names[row.term_id] = title
        surfaces = [canonical_surface(title)]
        if include_aliases and getattr(row, "aliases", None) is not None:
            surfaces.extend(list(row.aliases))
        terms.append((row.term_id, surfaces))
    return GazetteerMatcher.build(terms, mode=mode), names


def scan_mentions(
    transcripts: DataFrame,
    matcher: GazetteerMatcher,
    names: dict[str, str],
    window_words: int = DEFAULT_WINDOW_WORDS,
) -> DataFrame:
    """The raw per-occurrence scan (no flags): one row per matched span."""
    spark = SparkSession.getActiveSession()
    bc = spark.sparkContext.broadcast((matcher, names))

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        m, nm = bc.value
        for pdf in batches:
            conv_ids, turn_idxs, term_ids, term_names = [], [], [], []
            surfaces, starts, ends, contexts, locations = [], [], [], [], []
            for conv_id, turn_idx, role, text in zip(
                pdf["conv_id"].values, pdf["turn_idx"].values, pdf["role"].values, pdf["text"].values
            ):
                if not isinstance(text, str) or not text:
                    continue
                spans = m.find(text)
                if not spans:
                    continue
                widx = WordIndex(text)
                for s in spans:
                    conv_ids.append(conv_id)
                    turn_idxs.append(turn_idx)
                    term_ids.append(s.term_id)
                    term_names.append(nm.get(s.term_id, ""))
                    surfaces.append(s.text)
                    starts.append(s.start)
                    ends.append(s.end)
                    contexts.append(widx.window(s.start, s.end, window_words))
                    locations.append(role)
            yield pd.DataFrame(
                {
                    "conv_id": pd.Series(conv_ids, dtype="object"),
                    "turn_idx": pd.Series(turn_idxs, dtype="int32"),
                    "term_id": pd.Series(term_ids, dtype="object"),
                    "term_name": pd.Series(term_names, dtype="object"),
                    "surface": pd.Series(surfaces, dtype="object"),
                    "start": pd.Series(starts, dtype="int32"),
                    "end": pd.Series(ends, dtype="int32"),
                    "context": pd.Series(contexts, dtype="object"),
                    "match_location": pd.Series(locations, dtype="object"),
                }
            )

    pruned = transcripts.select("conv_id", "turn_idx", "role", "text")
    return pruned.mapInPandas(scan, MENTION_SCHEMA)


def extract_mentions(
    transcripts: DataFrame,
    gazetteer: DataFrame | pd.DataFrame,
    include_aliases: bool = False,
    window_words: int = DEFAULT_WINDOW_WORDS,
    repartition_conv: int | None = None,
) -> DataFrame:
    """Full mention table per FIXTURES.md §3 (scan + per-(conv,term) flags).

    ``repartition_conv``: hash-partition the raw scan output on conv_id
    into that many partitions BEFORE the flag window. HashPartitioning
    on conv_id satisfies the window's ClusteredDistribution on
    (conv_id, term_id) — partitioning keys are a subset of the
    clustering keys — so the window needs only a local sort and the
    whole stage still has exactly ONE exchange, now keyed the way the
    stage output is stored/bucketed (conv_id). Downstream conv_id
    consumers (dedup window, triple windows, stage write) reuse the
    same clustering instead of re-shuffling; the pipeline's mention
    stage goes from three full shuffles of the mention table to one.

    Skew trade, made explicit: keying the one exchange on conv_id alone
    concentrates ALL of a conversation's mentions on one task, where
    the former (conv_id, term_id) flag-window exchange spread a hot
    conversation across up to n_terms reducers. This is safe for
    transcripts because a conversation is already the atomic unit of
    parallelism downstream — the triple stage's lag/lead windows
    partition by conv_id and would serialize each conversation anyway —
    and conversation size is bounded by chat length (the synth corpus's
    hot_conv_factor=50 outlier is ~10^3 turns), NOT by corpus size;
    contrast entity keys, whose per-key row counts grow with the corpus
    and are therefore salted (``operators/graph.salted_count``). If a
    source ever had unbounded per-conversation rows, pass
    ``repartition_conv=None`` to restore the finer-keyed spread and let
    AQE skew-split the conv_id stages instead.
    """
    matcher, names = build_matcher_from_gazetteer(gazetteer, include_aliases)
    raw = scan_mentions(transcripts, matcher, names, window_words)
    if repartition_conv is not None:
        raw = raw.repartition(repartition_conv, F.col("conv_id"))
    w = Window.partitionBy("conv_id", "term_id")
    # both flags in ONE select so Catalyst fuses them into a single Window
    # node over one exchange (two sequential withColumns produce two sorts
    # and ~2x the wall time at 100k turns)
    return raw.select(
        "*",
        (F.max(F.when(F.col("match_location") == "user", 1).otherwise(0)).over(w) == 1).alias(
            "in_user"
        ),
        (
            F.max(F.when(F.col("match_location") == "assistant", 1).otherwise(0)).over(w) == 1
        ).alias("in_assistant"),
        F.lit(1).cast("long").alias("match_count"),
    )


def dedup_mentions(mentions: DataFrame, deterministic: bool = False) -> DataFrame:
    """UNIQUE(bibcode,label,context) semantics (`load_inputs.py:38`).

    Default form is ``dropDuplicates`` (arbitrary survivor, shuffles on
    the full key). ``deterministic=True`` keeps the FIRST occurrence by
    (turn_idx, start, end, match_location) via a row_number window —
    bit-reproducible under any partitioning, and because the window's
    ClusteredDistribution on (conv_id, term_id, context) is satisfied
    by any upstream conv_id hash partitioning (subset rule), it adds NO
    exchange when the input is already conv_id-clustered (the pipeline
    path via ``extract_mentions(repartition_conv=...)``).
    """
    if not deterministic:
        return mentions.dropDuplicates(["conv_id", "term_id", "context"])
    w = (
        Window.partitionBy("conv_id", "term_id", "context")
        .orderBy("turn_idx", "start", "end", "match_location")
    )
    return (
        mentions.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
