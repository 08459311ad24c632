#!/usr/bin/env python
"""Measure the ANN recall/cost trade-off curves for BENCH.md (round-3
verdict items 2 and 4).

Runs on $TEST_SF_DIR (default sf0.1) embeddings:
* top-k: recall@5 vs exact brute force for sign-LSH (n_planes x
  probe_hamming) and IVF (n_probe), with the mean fraction of the corpus
  scored per query (the cost axis — deterministic, unlike wall time);
* near-dup pairs: pair recall vs the exact all-pairs baseline for
  n_planes x n_tables, with the candidate-pair count.

Prints a markdown table; paste into BENCH.md.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF_DIR = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.1")
DIM = 64
K = 5
THRESH = 0.4


def main() -> None:
    from entity_extractor_spark.operators import simsearch as S
    from entity_extractor_spark.operators.ann_eval import mean_recall, pair_recall
    from entity_extractor_spark.session import get_spark

    spark = get_spark("ann-recall", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "16")))
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()
    n_corpus = e.count()
    q = e.filter(F.col("vec_id") < 10)
    exact = S.brute_force_topk(e, q, K).cache()
    exact.count()

    print(f"corpus={n_corpus} vectors, dim={DIM}, 10 queries, k={K}  ({SF_DIR})\n")
    print("| index | setting | recall@5 | corpus scored/query |")
    print("|---|---|---|---|")
    for planes in (4, 6, 8):
        for ham in (0, 1, 2):
            r = mean_recall(
                S.lsh_topk(e, q, DIM, K, n_planes=planes, probe_hamming=ham), exact, K
            )
            # candidate volume: corpus rows joined per query, pre-ranking
            b = e.select(S.lsh_bucket(F.col("embedding"), DIM, planes).alias("b")).groupBy("b").count()
            qb = q.select(
                F.explode(
                    F.array(
                        *[
                            S.lsh_bucket(F.col("embedding"), DIM, planes).bitwiseXOR(F.lit(m))
                            for m in S.probe_masks(planes, ham)
                        ]
                    )
                ).alias("b")
            )
            cand = qb.join(b, "b").agg(F.sum("count")).first()[0] or 0
            frac = cand / (10 * n_corpus)
            star = " (default)" if (planes, ham) == (S.N_PLANES, S.PROBE_HAMMING) else ""
            print(f"| sign-LSH | planes={planes} probe_ham={ham}{star} | {r:.2f} | {frac:.2f} |")
    for probe in (1, 2, 4, 8, 16):
        r = mean_recall(S.ivf_topk(e, q, DIM, K, n_probe=probe), exact, K)
        star = " (default)" if probe == S.N_PROBE else ""
        # cost: probed cells / total cells ~ corpus fraction (cells are
        # near-uniform on this corpus)
        print(f"| IVF (16 cells) | n_probe={probe}{star} | {r:.2f} | {probe / 16:.2f} |")

    nrm = S.norm_expr(F.col("embedding"))
    a = e.select(F.col("vec_id").alias("i"), F.col("embedding").alias("va"), nrm.alias("na"))
    b2 = e.select(F.col("vec_id").alias("j"), F.col("embedding").alias("vb"), nrm.alias("nb"))
    cosx = S.paired_cosine(F.col("va"), F.col("vb"), F.col("na"), F.col("nb"))
    exact_pairs = (
        a.join(b2, F.col("i") < F.col("j"))
        .select("i", "j", F.round(cosx, 6).alias("cos"))
        .filter(F.col("cos") >= THRESH)
        .cache()
    )
    n_exact = exact_pairs.count()
    all_pairs = n_corpus * (n_corpus - 1) // 2
    print(f"\nnear-dup pairs (threshold {THRESH}): exact baseline {n_exact} pairs of {all_pairs} possible\n")
    print("| setting | pair recall | candidate pairs (vs all-pairs) |")
    print("|---|---|---|")
    for planes, tables in ((6, 1), (6, 4), (6, 8), (4, 1), (4, 4)):
        approx = S.embedding_near_dups(e, DIM, THRESH, n_planes=planes, n_tables=tables)
        r = pair_recall(approx, exact_pairs)
        # candidate pairs actually scored (pre-threshold)
        cand = S.embedding_near_dups(e, DIM, -1.0, n_planes=planes, n_tables=tables).count()
        star = " (default)" if (planes, tables) == (S.N_PLANES, 1) else ""
        print(f"| planes={planes} tables={tables}{star} | {r:.2f} | {cand} ({cand / all_pairs:.1%}) |")
    spark.stop()


if __name__ == "__main__":
    main()
