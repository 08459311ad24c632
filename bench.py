#!/usr/bin/env python
"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS], plus flagship transcript-extraction
throughput on a deterministic synthetic corpus.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is materialized with the noop sink (full execution, no driver
collect). Run `python bench_scaling.py` for the N-vs-4N scaling evidence.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SYNTH_CONVS = int(os.environ.get("SPARK_GRAFT_SYNTH_CONVS", "1500"))

HEADLINE = [
    "mention_counts",
    "mention_flags",
    "context_window",
    "exact_token_match",
    "composite_likelihood",
    "join_agg",
    "broadcast_join",
    "window_lag",
    "stats",
    "topk_groups",
]


def _materialize(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def main() -> None:
    import __spark_entry__ as entry_mod
    from entity_extractor_spark.session import get_spark
    from entity_extractor_spark.operators.mentions import extract_mentions
    from entity_extractor_spark.synth import SynthConfig, make_gazetteer, make_transcripts, to_spark

    spark = get_spark("bench", cores=CPUS)
    qs = entry_mod.queries()
    timings: dict[str, float] = {}

    # warm the JVM/Arrow path once so per-query timings measure the plan
    qs["value_counts"](spark, SF_DIR).count()

    for name in HEADLINE:
        t0 = time.perf_counter()
        _materialize(qs[name](spark, SF_DIR))
        timings[name] = round(time.perf_counter() - t0, 3)

    # flagship: full mention extraction over synthetic transcripts
    cfg = SynthConfig(seed=42, n_terms=256, n_convs=SYNTH_CONVS, hot_conv_factor=50)
    gaz = make_gazetteer(cfg)
    pdf = make_transcripts(cfg, gaz)
    n_turns = len(pdf)
    transcripts = to_spark(spark, pdf).repartition(CPUS * 4, "conv_id")
    transcripts = transcripts.localCheckpoint(eager=True)  # exclude gen cost
    t0 = time.perf_counter()
    _materialize(extract_mentions(transcripts, gaz))
    dt = time.perf_counter() - t0
    timings["transcript_extraction"] = round(dt, 3)
    timings["turns_per_sec"] = round(n_turns / dt, 1)

    total = round(sum(v for k, v in timings.items() if k != "turns_per_sec"), 3)
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "n_synth_turns": n_turns,
                "cpus": CPUS,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
