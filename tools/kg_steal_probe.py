#!/usr/bin/env python
"""Benchmark-noise attribution probe: run the kg_pipeline plan N times,
bracketing each sample with /proc/stat steal-tick counters, and print
(wall-clock, steal%) pairs.

This sandbox's hypervisor steals CPU in multi-minute bursts (BENCH.md
documents 2-3x wall-clock inflation); this probe is how round 4/5
attributed outlier kg_pipeline readings to measured steal rather than a
plan regression — wall-clock tracks steal monotonically within a run.
Use it whenever a bench sample looks regressed: if the slow samples are
the high-steal samples and the low-steal floor matches the settle band,
the plan is fine.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

N_SAMPLES = int(os.environ.get("KG_PROBE_SAMPLES", "8"))
N_CONVS = int(os.environ.get("SPARK_GRAFT_SYNTH_CONVS", "48000"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def cpu_stat() -> tuple[int, int]:
    vals = list(map(int, open("/proc/stat").readline().split()[1:]))
    return sum(vals), vals[7]  # total ticks, steal ticks


def main() -> None:
    from entity_extractor_spark.operators.graph import build_edges
    from entity_extractor_spark.operators.mentions import (
        dedup_mentions,
        extract_mentions,
    )
    from entity_extractor_spark.operators.predicates import all_triples
    from entity_extractor_spark.session import get_spark
    from entity_extractor_spark.synth import (
        SynthConfig,
        make_gazetteer,
        make_transcripts_distributed,
    )

    spark = get_spark("kgprobe", cores=CPUS)
    cfg = SynthConfig(seed=42, n_terms=256, n_convs=N_CONVS, hot_conv_factor=50)
    gaz = make_gazetteer(cfg)
    t = make_transcripts_distributed(spark, cfg, parallelism=CPUS * 2)
    t = t.localCheckpoint(eager=True)
    print("turns:", t.count(), flush=True)

    def kg():
        # same checkpointed shape as bench.py's kg_pipeline section
        m = (
            dedup_mentions(extract_mentions(t, gaz))
            .select("conv_id", "turn_idx", "term_id")
            .localCheckpoint(eager=True)
        )
        return build_edges(all_triples(t, m))

    def mat(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    mat(kg())  # warm pass (broadcast, codegen, Python workers)
    for i in range(N_SAMPLES):
        tot0, st0 = cpu_stat()
        t0 = time.perf_counter()
        mat(kg())
        dt = time.perf_counter() - t0
        tot1, st1 = cpu_stat()
        steal = 100.0 * (st1 - st0) / max(1, tot1 - tot0)
        print(f"sample {i}: {dt:.2f}s steal={steal:.1f}%", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
