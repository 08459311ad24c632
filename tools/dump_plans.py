#!/usr/bin/env python
"""Regenerate docs/PLANS.md: .explain("formatted") of the flagship plans
with commentary — the evidence trail for 'explain and iterate until it's
the plan you'd want'."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from entity_extractor_spark import plans as P  # noqa: E402

SF = "/root/testdata/sf0.001"

NOTES = {
    "mention_extract": """The flagship stage. Wanted shape: parquet scan pruned to
(conv_id, turn_idx, role, text) -> ArrowEvalPython/MapInPandas (the matcher) ->
ONE Exchange hashpartitioning(conv_id, term_id) -> ONE Window computing both
role flags. No driver collect, no second sort (the two flag expressions share
one window spec).""",
    "broadcast_dim_join": """Fact×dim join. Wanted shape: BroadcastHashJoin (dim side
BroadcastExchange, never a shuffle of lineitem), HashAggregate partial ->
Exchange -> HashAggregate final (map-side combine), scans pruned to the five
needed columns with no extra project.""",
    "minhash_sketch": """Per-document sketch. Wanted shape: a single Project over the
scan — zero exchanges before the contract query's orderBy. The whole signature
is one aggregate() fold per row; md5 per token computed once (see the
dedup.py docstring for the two rejected slower formulations).""",
    "semi_join_worklist": """Scan elision (SURVEY S2/R1). Wanted shape: BroadcastHashJoin
LeftSemi with the work-list broadcast; the transcript side reads only the join
key + payload columns. On Iceberg the same plan triggers dynamic file pruning.""",
    "salted_edges": """Skew-safe weight aggregation. Wanted shape: two HashAggregate
pairs (partial/final over (src,dst,salt), then (src,dst)) — the salt bounds any
single reducer's share of a hot entity; AQE may coalesce the small final stage.""",
    "co_mentions": """Same-turn entity pairs (round 2). Wanted shape: ONE Exchange
(the per-turn groupBy/collect_set) then Generate (the in-codegen pair
expansion) — no SortMergeJoin/ShuffledHashJoin: the old self-join shuffled
every mention row twice. Enforced by test_plans.py.""",
    "ivf_topk": """IVF ANN probe (round 2). Wanted shape: corpus side Project-only
(cell assignment is a literal-centroid fold, no shuffle), query side broadcast
with cell explode, BroadcastHashJoin on cell — never a cartesian. The cell id
is the Iceberg partition key at corpus scale, so each probe is a pruned scan.""",
    "pack_sequences": """Sharded sequence packing (round 2 fix of the round-1
scale-killer). Wanted shape: the running-sum Window exchanges on the
content-hash shard expression — NOT SinglePartition; 32 independent packing
streams sort in parallel. Enforced by test_curation.py.""",
    "contamination": """Benchmark decontamination (round 3). Wanted shape: the
benchmark shingle set is the BROADCAST side of the join (an eval suite is
small by construction), so the 100 TB training side is one map pass — its
only exchange is the per-doc hit-count aggregate on the doc key. Enforced by
test_plans.py (BroadcastHashJoin present, no SortMergeJoin on the shingle
join).""",
    "pagerank_iter": """One weighted-PageRank iteration (round 3). Wanted shape:
rank×edge equi join on the node key then HashAggregate partial -> Exchange ->
final on dst — the edge table partitioning is reused every round; integer
fixed-point arithmetic keeps the result independent of this plan's parallelism
entirely.""",
    "heavy_hitters": """Exact heavy hitters via two-pass Misra-Gries (round 3).
Wanted shape: pass 1 is MapInPandas (bounded per-partition MG summaries, no
exchange on the text side); pass 2 BroadcastHashJoins the tiny candidate set
against the exploded token stream — the full vocabulary is NEVER the shuffle
key, only the <= ceil(1/support)-sized survivor set aggregates. Enforced by
test_plans.py (broadcast join present, no SortMergeJoin/cartesian).""",
    "repetition_signals": """Per-doc repetition quality signals (round 3). Wanted
shape: two explode -> HashAggregate partial/final pairs keyed on
(doc_id, gram) — intra-doc repeats combine map-side, skewed documents stay
uniformly keyed — then two left joins back on doc_id. No Window, no per-row
Python. Enforced by test_plans.py.""",
    "pii_scrub": """PII redaction pass (round 3). Wanted shape: a single Project
over the scan — chained regexp_replace + regexp_count stay inside
WholeStageCodegen, ZERO exchanges and no Python eval; the scan partitioning
survives so the scrub fuses into whatever stage follows at 100 TB. Enforced
by test_curation.py (exchange count 0, no BatchEvalPython).""",
    "khop_hop": """One k-hop BFS expansion (round 3). Wanted shape: frontier
equi-joined against the node-keyed symmetric edge list (AQE broadcasts the
frontier side — it is orders of magnitude smaller than the edges), then a
left-anti hash join against the visited set; never a cartesian/BNLJ. At scale
the edge table is bucketed by src so every hop reuses that partitioning.
Enforced by test_plans.py.""",
    "link_prediction": """Common-neighbor link prediction (round 3). Wanted
shape: ONE equi self-join of the symmetric edge list on the shared-neighbor
key (wedge enumeration, hot centers dropped by the broadcast degree-cap
filter), one HashAggregate pair on the (a, b) key, degree marginals
BroadcastHashJoined onto the pair counts. No cartesian; Jaccard is pure
codegen arithmetic. Enforced by test_plans.py.""",
    "co_lift_guarded": """Entity co-occurrence lift with the round-4 hot-doc
guard: pair enumeration equi-self-joins only the docs admitted by the
per-doc entity-count cap (left-semi against the <=cap doc list), marginals
stay computed over every doc and are BroadcastHashJoined onto the pair
counts. The guard closes the last unguarded wedge join — a doc with d
entities emits d(d-1)/2 pairs. Enforced by test_graph_algos.py (boundary
both sides of the cap).""",
    "kmv_sketch": """Bounded-state KMV distinct sketch (round 4). Wanted shape:
MapInPandas (per-partition k+1-smallest-hash summaries, bounded state) ->
exactly ONE Exchange (the merge groupBy) -> HashAggregate; NO Window and no
full-distinct materialization anywhere — the exchange carries <= k+1 rows
per (partition, group). Enforced by test_plans.py.""",
    "bmp_codec": """BMP encode->decode codec chain (round 4). Wanted shape:
two fused MapInPandas stages over the pruned scan — ZERO exchanges, so the
image payload never transits a shuffle (same discipline as the WAV chain).
Enforced by test_plans.py.""",
    "avi_codec": """AVI encode->decode video codec chain (round 4, the last
modality). Wanted shape: identical discipline to the WAV/BMP chains — fused
MapInPandas stages over the pruned scan, ZERO exchanges; the multi-frame
video payload never transits a shuffle, and the per-frame sampling fan-out
(one row per sampled frame) happens INSIDE the map stage so only derived
integer stats flow on. Enforced by test_plans.py.""",
    "quantile_merge": """Bounded-state quantile sketch, merge form (round-4
wave 2). Wanted shape: same as kmv_sketch — MapInPandas (per-partition
bottom-k (hash, value) samples, bounded heap) -> exactly ONE Exchange (the
merge groupBy) -> HashAggregate; NO Window and no full per-group value sort
(those exist only in the quantile_sketch verification twin). Enforced by
test_plans.py.""",
    "weighted_sample": """Deterministic A-Res weighted reservoir (round-4
wave 2). Wanted shape: the md5-derived ln(u)/w priority is a Project inside
WholeStageCodegen feeding MapInPandas (per-partition k-row reservoirs) ->
ONE merge Exchange -> HashAggregate -> Generate (the explode back to rows).
No Window rank (that is the oracle's naive form), no row-wise Python.
Enforced by test_plans.py.""",
    "contamination_bloom": """Bloom-pruned decontamination (round-4 wave 2).
Wanted shape: train shingles flow scan -> Generate (shingle explode) ->
ArrowEvalPython (the vectorized bitmap probe — 16 KiB broadcast, NOT the
shingle-string set) -> exact verify join against the benchmark shingles on
the pruned sliver -> per-doc aggregate. No BatchEvalPython (row-wise), no
cartesian; scans pruned to (doc_id, text). Enforced by test_plans.py.""",
    "bm25_topk": """BM25 ranked retrieval (round-4 wave 3). Wanted shape: the
literal query vocabulary filters the token explode INSIDE codegen before any
exchange (the isin shows up in the Filter above Generate), so the only
aggregates run over the query-term slice; df/idf and corpus stats ride
BroadcastExchanges; the final per-query top-k is a Window over the tiny
scored slice. Fixed-point integer scores keep the ranking
partitioning-independent.""",
    "grouped_heavy_hitters": """Per-group Misra-Gries heavy hitters (round-4
wave 3). Wanted shape: pass 1 MapInPandas (one bounded MG summary per
(partition, group)); pass 2 BroadcastHashJoin of the (group, token)
candidate set against the exploded token stream, then the per-group exact
recount — the full per-group vocabulary is never a shuffle key.""",
    "unigram_logprob": """Per-doc unigram-LM fluency score (round-4 wave 3).
Wanted shape: both heavy joins keyed on token — the unigram count table and
the exploded token stream come out of the SAME exchange family
(co-partitioned at scale); corpus totals ride a broadcast one-row aggregate;
per-token log-probs are fixed-point int64 Projects so the per-doc SUM is a
plain integer HashAggregate pair on doc_id.""",
    "kmv_overlap": """Pairwise slice-overlap from KMV sketches (round 4).
Wanted shape: the data-touching part is exactly kmv_distinct's sketch
derivation (one distinct exchange + window rank per group); the pair stage
then joins G one-row-per-group sketch rows — a nested-loop over G² sketch
pairs is CORRECT here because G is the number of corpus slices, not data
rows, and every estimator is array arithmetic over the two k-element
sketches. At 100 TB the sketch rows come from the bounded kmv_partials
path and the overlap matrix costs O(G²k), independent of corpus size.""",
    "funnel_steps": """Strict-ordered event funnel (round 4). Wanted shape: one
filtered partial/final HashAggregate pair per step, chained by equi joins on
the USER key only — on a user-bucketed events table every join co-locates,
and AQE broadcasts the shrinking survivor side at each step. No window over
the event stream, no per-event state, no cartesian.""",
}


def main() -> None:
    import pandas as pd
    from pyspark.sql import functions as F

    from entity_extractor_spark.session import get_spark
    from entity_extractor_spark.io.registry import restrict_to_worklist
    from entity_extractor_spark.operators.dedup import minhash_signatures
    from entity_extractor_spark.operators.graph import salted_count
    from entity_extractor_spark.operators.mentions import extract_mentions

    spark = get_spark("plans", cores=4)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    part = spark.read.parquet(f"{SF}/part.parquet")

    t = docs.select(
        F.col("doc_id").cast("string").alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        "text",
    )
    gaz = pd.DataFrame({"term_id": ["g1"], "title": ["Spark: engine"]})

    plans = {
        "mention_extract": extract_mentions(t, gaz),
        "broadcast_dim_join": (
            li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
            .groupBy("p_brand")
            .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"))
        ),
        "minhash_sketch": minhash_signatures(docs),
        "semi_join_worklist": restrict_to_worklist(
            t, spark.createDataFrame([("1",), ("2",)], "conv_id string")
        ),
        "salted_edges": salted_count(
            t.select(F.col("conv_id").alias("src"), F.col("role").alias("dst")),
            ["src", "dst"],
        ),
    }

    from entity_extractor_spark.operators.predicates import co_mention_triples
    from entity_extractor_spark.operators.sampling import pack_sequences
    from entity_extractor_spark.operators.simsearch import ivf_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    m = spark.createDataFrame(
        [("c1", 0, "A"), ("c1", 0, "B")], "conv_id string, turn_idx int, term_id string"
    )
    plans["co_mentions"] = co_mention_triples(m)
    plans["ivf_topk"] = ivf_topk(emb, emb.filter(F.col("vec_id") < 3), dim=64)
    plans["pack_sequences"] = pack_sequences(docs, 512)

    from entity_extractor_spark.operators.decontam import contamination_report
    from entity_extractor_spark.operators.graph_algos import _sym_weighted

    plans["contamination"] = contamination_report(
        docs.filter(F.col("doc_id") >= 5), docs.filter(F.col("doc_id") < 5)
    )
    # one iteration body, isolated (the full loop repeats this shape)
    e = _sym_weighted(
        spark.createDataFrame([("a", "b"), ("b", "c"), ("a", "c")], "i string, j string")
    )
    ranks = e.groupBy("src").agg(F.count(F.lit(1)).alias("degree"), F.sum("w").alias("wout")).select(
        F.col("src").alias("node"), "degree", "wout", F.lit(1000000).alias("rank_fp")
    )
    plans["pagerank_iter"] = (
        ranks.join(e, ranks["node"] == e["src"])
        .withColumn("c", F.expr("(rank_fp * w) div wout"))
        .groupBy("dst")
        .agg(F.sum("c").alias("s"))
    )

    from entity_extractor_spark.operators.sketches import heavy_hitters
    from entity_extractor_spark.operators.textstats import repetition_signals

    plans["heavy_hitters"] = heavy_hitters(docs, support=0.05)
    plans["repetition_signals"] = repetition_signals(docs)

    from entity_extractor_spark.operators.pii import scrub_pii

    plans["pii_scrub"] = scrub_pii(docs.select("doc_id", "text"))

    from entity_extractor_spark.operators.graph_algos import khop_neighbors

    from entity_extractor_spark.functions import text as T

    word_e = docs.select(
        F.concat(F.lit("doc:"), F.col("doc_id").cast("string")).alias("i"),
        F.explode(F.array_distinct(T.tokenize(F.col("text")))).alias("j"),
    )
    plans["khop_hop"] = khop_neighbors(word_e, ["spark"], k=1, checkpoint=False)

    from entity_extractor_spark.operators.graph_algos import link_prediction

    plans["link_prediction"] = link_prediction(
        word_e, max_center_degree=12, min_common=2, checkpoint=False
    )

    from entity_extractor_spark.operators.graph_algos import co_occurrence_lift
    from entity_extractor_spark.operators.multimodal import bmp_payloads, decode_bmp
    from entity_extractor_spark.operators.sketches import kmv_sketch_only

    de = docs.select(
        "doc_id", F.explode(F.array_distinct(T.tokenize(F.col("text")))).alias("entity")
    )
    plans["co_lift_guarded"] = co_occurrence_lift(
        de, max_doc_entities=12, checkpoint=False
    )
    plans["kmv_sketch"] = kmv_sketch_only(
        docs.select("lang", F.col("text").alias("val")), "lang", "val"
    )
    plans["bmp_codec"] = decode_bmp(bmp_payloads(docs.select("doc_id", "text")))

    from entity_extractor_spark.operators.multimodal import avi_payloads, sample_avi_frames

    plans["avi_codec"] = sample_avi_frames(avi_payloads(docs.select("doc_id", "text")))

    from entity_extractor_spark.operators.decontam import contamination_report_bloom
    from entity_extractor_spark.operators.sampling import weighted_sample
    from entity_extractor_spark.operators.search import bm25_topk
    from entity_extractor_spark.operators.sketches import (
        grouped_heavy_hitters,
        quantile_sketch_merged,
    )
    from entity_extractor_spark.operators.textstats import unigram_logprob

    plans["quantile_merge"] = quantile_sketch_merged(
        docs, "lang", F.length(F.col("text")), "doc_id"
    )
    plans["weighted_sample"] = weighted_sample(
        docs, "lang", "doc_id", F.length(F.col("text"))
    )
    plans["contamination_bloom"] = contamination_report_bloom(
        docs.filter(F.col("doc_id") >= 5), docs.filter(F.col("doc_id") < 5), n=4
    )
    plans["bm25_topk"] = bm25_topk(docs, [("q1", "spark stream")], k=10)
    plans["grouped_heavy_hitters"] = grouped_heavy_hitters(docs, "lang")
    plans["unigram_logprob"] = unigram_logprob(docs)

    from entity_extractor_spark.operators.sketches import kmv_overlap

    plans["kmv_overlap"] = kmv_overlap(
        docs.select("lang", F.col("text").alias("val")), "lang", "val"
    )

    from entity_extractor_spark.operators.event_analytics import funnel_steps

    ev = spark.read.parquet(f"{SF}/events.parquet")
    plans["funnel_steps"] = funnel_steps(ev, ["view", "click", "purchase"])

    out = [
        "# PLANS — physical plans of the flagship stages",
        "",
        "Regenerate with `python tools/dump_plans.py`. Each plan is followed by",
        "the shape it is REQUIRED to keep (enforced by tests/test_plans.py where",
        "assertable).",
        "",
    ]
    for name, df in plans.items():
        plan = P.formatted_plan(df)
        out += [f"## {name}", "", NOTES[name].strip(), "", "```", plan.strip(), "```", ""]
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "docs")
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "PLANS.md"), "w") as f:
        f.write("\n".join(out) + "\n")
    print("wrote docs/PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
