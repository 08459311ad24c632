"""Graph-analytics + sketch + hygiene contract queries (round 3):
fixed-point PageRank, triangle counting, co-occurrence lift, KMV
distinct sketches, int8-quantized ANN, and benchmark decontamination —
each with an exactly-mirrored DuckDB oracle.

The graph queries run over the word-adjacency graph of the documents
corpus (consecutive-token edges, the textbook word graph): the edge
derivation is pure Catalyst (tokenize → 2-shingles → split), so both
engines build the identical edge set and the algorithms' integer
arithmetic hash-matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from entity_extractor_spark.functions import text as T
from entity_extractor_spark.operators import graph_algos as G
from entity_extractor_spark.operators import simsearch as S
from entity_extractor_spark.operators.decontam import (
    contamination_report,
    contamination_report_bloom,
    contamination_report_sql,
)
from entity_extractor_spark.operators.event_analytics import (
    event_transitions,
    event_transitions_sql,
    funnel_steps,
    funnel_steps_sql,
    json_field_stats,
    json_field_stats_sql,
    retention_cohorts,
    retention_cohorts_sql,
)
from entity_extractor_spark.operators.sampling import (
    weighted_sample,
    weighted_sample_sql,
)
from entity_extractor_spark.operators.search import bm25_topk_sql
from entity_extractor_spark.operators.textstats import (
    token_entropy,
    token_entropy_sql,
    unigram_logprob_sql,
)
from entity_extractor_spark.operators.sketches import (
    heavy_hitters,
    heavy_hitters_sql,
    kmv_distinct,
    kmv_distinct_sql,
    grouped_heavy_hitters_sql,
    kmv_overlap,
    kmv_overlap_sql,
    kmv_sketch_only,
    quantile_sketch,
    quantile_sketch_merged,
    quantile_sketch_sql,
)

KMV_SHINGLE_N = 3
CO_LIFT_ENTITIES = [
    "spark", "stream", "vector", "hash", "merge", "batch",
    "window", "join", "scan", "filter", "sort", "query",
]
BENCH_DOC_MAX_ID = 5
KHOP_SEEDS = ["spark"]
KHOP_K = 3
# doc nodes carry <= len(CO_LIFT_ENTITIES) = 12 edges, entity nodes
# hundreds: capping wedge centers at 12 admits every document and skips
# every entity hub — the guard that keeps the wedge join linear in docs
LINKPRED_CENTER_CAP = 12
# same discipline for co_lift's pair enumeration: a doc can mention at
# most the 12 gazetteer entities, so the cap admits every doc here while
# the guard (skip enumeration through mega-docs) sits in the plan
CO_LIFT_DOC_CAP = 12
LINKPRED_MIN_COMMON = 2
# 4-gram overlap: at the fixture scale 5-grams almost never collide
# (1 hit corpus-wide) while 3-grams flag ~30% of docs — 4 keeps the
# check selective AND exercised (11 contaminated docs at sf0.01)
DECONTAM_N = 4
ANN_QUERY_MAX_ID = 10
ANN_K = 5


def _load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from entity_extractor_spark.io.sources import load_table

    return load_table(spark, sf_dir, name)


def _word_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed consecutive-token pairs (i, j) from documents.text."""
    d = _load(spark, sf_dir, "documents")
    toks = T.tokenize(F.col("text"))
    pair = F.explode(T.word_shingles(toks, 2)).alias("pair")
    return d.select(pair).select(
        F.split(F.col("pair"), " ").getItem(0).alias("i"),
        F.split(F.col("pair"), " ").getItem(1).alias("j"),
    )


def _word_edges_sql() -> str:
    toks = T.tokenize_sql("text")
    sh = T.word_shingles_sql("ts", 2)
    return f"""SELECT str_split(pair, ' ')[1] AS i, str_split(pair, ' ')[2] AS j
        FROM (SELECT unnest({sh}) AS pair
              FROM (SELECT {toks} AS ts FROM documents))"""


def q_pagerank_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        G.pagerank_fixed(_word_edges(spark, sf_dir))
        .orderBy(F.desc("rank_fp"), "node")
    )


def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return G.triangle_counts(_word_edges(spark, sf_dir)).orderBy("node")


def q_lpa_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic synchronous label propagation over the
    word-adjacency graph (integer votes, smallest-label ties; the
    oracle unrolls the same rounds as chained CTEs)."""
    return G.label_propagation(_word_edges(spark, sf_dir)).orderBy("node")


def _entity_mentions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, entity) — one row per entity from CO_LIFT_ENTITIES
    present in a document. THE shared mention derivation: co_lift,
    khop_neighbors, and link_prediction all build on this frame (and on
    its SQL twin), so the entity-mention definition lives exactly once."""
    d = _load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.explode(
            F.array_intersect(
                F.array_distinct(T.tokenize(F.col("text"))),
                F.lit(sorted(CO_LIFT_ENTITIES)),
            )
        ).alias("entity"),
    )


def _entity_mentions_sql() -> str:
    toks = T.tokenize_sql("text")
    ent_lits = ", ".join(f"'{e}'" for e in sorted(CO_LIFT_ENTITIES))
    return f"""SELECT doc_id, unnest(list_intersect(list_distinct({toks}), [{ent_lits}])) AS entity
        FROM documents"""


def q_co_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    return G.co_occurrence_lift(
        _entity_mentions(spark, sf_dir), max_doc_entities=CO_LIFT_DOC_CAP
    ).orderBy("ea", "eb")


def _doc_entity_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bipartite doc <-> entity edges ('doc:<id>', entity token) over the
    shared :func:`_entity_mentions` frame — the mention graph k-hop
    traverses: hop 1 from an entity = the documents containing it, hop 2
    = its co-mentioned entities, hop 3 = their documents."""
    return _entity_mentions(spark, sf_dir).select(
        F.concat(F.lit("doc:"), F.col("doc_id").cast("string")).alias("i"),
        F.col("entity").alias("j"),
    )


def q_khop_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        G.khop_neighbors(_doc_entity_edges(spark, sf_dir), KHOP_SEEDS, KHOP_K)
        .orderBy("hop", "node")
    )


def q_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-pair link prediction over the bipartite mention graph:
    common = documents shared by the two entities, Jaccard over their
    bipartite neighborhoods."""
    return (
        G.link_prediction(
            _doc_entity_edges(spark, sf_dir),
            max_center_degree=LINKPRED_CENTER_CAP,
            min_common=LINKPRED_MIN_COMMON,
        )
        .orderBy("a", "b")
    )


def q_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deletion-neighborhood fuzzy match over customer names; the oracle
    is the NAIVE quadratic levenshtein join (ground truth), so the hash
    match proves the blocking loses no pair."""
    from entity_extractor_spark.operators.canonicalize import fuzzy_alias_pairs

    c = _load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"), F.col("c_name").alias("name")
    )
    return fuzzy_alias_pairs(c).orderBy("id_a", "id_b")


def q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _load(spark, sf_dir, "documents")
    exploded = d.select(
        F.col("lang"),
        F.explode(T.word_shingles(T.tokenize(F.col("text")), KMV_SHINGLE_N)).alias("val"),
    )
    return kmv_distinct(exploded, "lang", "val").orderBy("lang")


def q_kmv_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bounded-state KMV form (round-3 verdict item 5): per-partition
    k+1-smallest-hash partials merged by one groupBy — no exact-distinct
    twin, no full-vocabulary window rank. The oracle is kmv_distinct's
    estimate column: the merged sketch must reproduce it bit-exactly."""
    d = _load(spark, sf_dir, "documents")
    exploded = d.select(
        F.col("lang"),
        F.explode(T.word_shingles(T.tokenize(F.col("text")), KMV_SHINGLE_N)).alias("val"),
    )
    return kmv_sketch_only(exploded, "lang", "val").orderBy("lang")


def q_ann_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < ANN_QUERY_MAX_ID)
    return S.sq8_topk(e, q, k=ANN_K).orderBy("query_id", "rank")


def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    return heavy_hitters(_load(spark, sf_dir, "documents")).orderBy("token")


def q_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise language-slice vocabulary overlap from KMV sketches
    (bottom-k Jaccard + union/intersection estimates) — the
    mergeable-sketch algebra over the same shingle universe as
    kmv_distinct."""
    d = _load(spark, sf_dir, "documents")
    exploded = d.select(
        F.col("lang"),
        F.explode(T.word_shingles(T.tokenize(F.col("text")), KMV_SHINGLE_N)).alias("val"),
    )
    return kmv_overlap(exploded, "lang", "val").orderBy("lang_a", "lang_b")


def q_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bottom-k-sample quantile sketch, verification twin: exact
    nearest-rank doc-length quantiles per language next to the
    hash-sample estimates (operators/sketches.quantile_sketch)."""
    d = _load(spark, sf_dir, "documents")
    return quantile_sketch(
        d, "lang", F.length(F.col("text")), "doc_id"
    ).orderBy("lang")


def q_quantile_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bounded-state merge form: per-partition bottom-k partials +
    one merge groupBy — no exact twin, no full-group sort. The oracle is
    quantile_sketch's estimate columns: the merged sample must reproduce
    them bit-exactly."""
    d = _load(spark, sf_dir, "documents")
    return quantile_sketch_merged(
        d, "lang", F.length(F.col("text")), "doc_id"
    ).orderBy("lang")


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic A-Res weighted reservoir (k per language,
    length-weighted): the engine plan is the bounded partial+merge
    top-k; the oracle is the naive full window rank over the same
    priority — the hash match proves the bounded form loses no row."""
    d = _load(spark, sf_dir, "documents")
    return weighted_sample(
        d, "lang", "doc_id", F.length(F.col("text"))
    ).orderBy("lang", "id")


FUNNEL = ["view", "click", "purchase"]


def q_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-ordered view→click→purchase funnel over the events table
    (operators/event_analytics.funnel_steps)."""
    e = _load(spark, sf_dir, "events")
    return funnel_steps(e, FUNNEL).orderBy("step")


def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention triangle: (first-event cohort week, week offset,
    active users). The cohort week is emitted as an ISO string — Spark
    DATE and DuckDB DATE reach pandas as different dtypes (date object
    vs datetime64), so the hash compare needs the common string form."""
    e = _load(spark, sf_dir, "events")
    return (
        retention_cohorts(e)
        .select(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
            "n_users",
        )
        .orderBy("cohort_week", "week_offset")
    )


def q_json_field_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured payload analytics: per-event-type stats of the
    integer 'k' field inside the JSON props column (codegen extraction,
    NULL-degrading on missing/malformed values, exact integer aggs)."""
    e = _load(spark, sf_dir, "events")
    return json_field_stats(e).orderBy("event_type")


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition counts of the per-user event
    stream (ties broken by event_id on both engines)."""
    e = _load(spark, sf_dir, "events")
    return event_transitions(e).orderBy("prev_type", "next_type")


BM25_QUERIES = [
    ("q1", "spark stream processing"),
    ("q2", "hash join query"),
    ("q3", "merge batch window"),
]
BM25_K = 10


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval (operators/search.bm25_topk): top-10 docs
    per literal query, fixed-point int64 scores — deterministic ranking,
    hash-verified against the naive SQL mirror."""
    from entity_extractor_spark.operators.search import bm25_topk

    d = _load(spark, sf_dir, "documents")
    return bm25_topk(d, BM25_QUERIES, k=BM25_K).orderBy("query_id", "rank")


def q_grouped_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language exact heavy hitters via per-(partition, group)
    Misra-Gries summaries + broadcast recount."""
    from entity_extractor_spark.operators.sketches import grouped_heavy_hitters

    d = _load(spark, sf_dir, "documents")
    return grouped_heavy_hitters(d, "lang").orderBy("lang", "token")


def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc average unigram log-probability under the corpus's own
    add-one-smoothed model (fixed-point exact integer sums)."""
    from entity_extractor_spark.operators.textstats import unigram_logprob

    return unigram_logprob(_load(spark, sf_dir, "documents")).orderBy("doc_id")


def q_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc Shannon token entropy (within-doc diversity signal,
    fixed-point integer sums)."""
    return token_entropy(_load(spark, sf_dir, "documents")).orderBy("doc_id")


def q_contamination_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-pruned decontamination: same train/bench split — and the
    SAME oracle SQL — as `contamination`; the Bloom bitmap + exact
    verify must change nothing but the data volume."""
    d = _load(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") < BENCH_DOC_MAX_ID)
    train = d.filter(F.col("doc_id") >= BENCH_DOC_MAX_ID)
    return contamination_report_bloom(train, bench, n=DECONTAM_N).orderBy("doc_id")


def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _load(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") < BENCH_DOC_MAX_ID)
    train = d.filter(F.col("doc_id") >= BENCH_DOC_MAX_ID)
    return contamination_report(train, bench, n=DECONTAM_N).orderBy("doc_id")


QUERIES = {
    "pagerank_tokens": q_pagerank_tokens,
    "graph_triangles": q_graph_triangles,
    "lpa_communities": q_lpa_communities,
    "co_lift": q_co_lift,
    "khop_neighbors": q_khop_neighbors,
    "link_prediction": q_link_prediction,
    "fuzzy_name_pairs": q_fuzzy_name_pairs,
    "kmv_distinct": q_kmv_distinct,
    "kmv_sketch": q_kmv_sketch,
    "kmv_overlap": q_kmv_overlap,
    "heavy_hitters": q_heavy_hitters,
    "ann_sq8_topk": q_ann_sq8_topk,
    "contamination": q_contamination,
    "quantile_sketch": q_quantile_sketch,
    "quantile_merge": q_quantile_merge,
    "weighted_sample": q_weighted_sample,
    "contamination_bloom": q_contamination_bloom,
    "bm25_topk": q_bm25_topk,
    "grouped_heavy_hitters": q_grouped_heavy_hitters,
    "unigram_logprob": q_unigram_logprob,
    "funnel_steps": q_funnel_steps,
    "retention_cohorts": q_retention_cohorts,
    "event_transitions": q_event_transitions,
    "json_field_stats": q_json_field_stats,
    "token_entropy": q_token_entropy,
}


def _oracles() -> dict[str, str]:
    edges = _word_edges_sql()
    toks = T.tokenize_sql("text")
    co_rel = _entity_mentions_sql()
    khop_rel = f"""SELECT 'doc:' || CAST(doc_id AS VARCHAR) AS i, entity AS j
        FROM ({_entity_mentions_sql()})"""
    kmv_rel = f"""SELECT lang AS grp,
            unnest({T.word_shingles_sql('ts', KMV_SHINGLE_N)}) AS val
        FROM (SELECT lang, {toks} AS ts FROM documents)"""
    sq8_cte = f"""WITH _sq_c AS (
          SELECT vec_id AS neighbor_id, {S.sq8_quantize_sql('embedding')} AS cq FROM embeddings
        ),
        _sq_cn AS (
          SELECT neighbor_id, cq,
                 sqrt(list_reduce(list_transform(list_zip(cq, cq), z -> z[1] * z[2]), (a, x) -> a + x)::DOUBLE) AS cn
          FROM _sq_c
        ),
        _sq_q AS (
          SELECT neighbor_id AS query_id, cq AS qq, cn AS qn FROM _sq_cn
          WHERE neighbor_id < {ANN_QUERY_MAX_ID}
        ),
        _sq_s AS (
          SELECT q.query_id, c.neighbor_id,
                 list_reduce(list_transform(list_zip(q.qq, c.cq), z -> z[1] * z[2]), (a, x) -> a + x) AS score_q,
                 q.qn, c.cn
          FROM _sq_cn c JOIN _sq_q q ON c.neighbor_id <> q.query_id
        ),
        _sq_r AS (
          SELECT query_id, neighbor_id, score_q,
                 round(CASE WHEN qn > 0 AND cn > 0 THEN score_q::DOUBLE / (qn * cn) ELSE 0.0 END, 6) AS cos_sq8,
                 row_number() OVER (PARTITION BY query_id ORDER BY score_q DESC, neighbor_id) AS rank
          FROM _sq_s
        )
        SELECT query_id, rank, neighbor_id, score_q, cos_sq8 FROM _sq_r
        WHERE rank <= {ANN_K} ORDER BY query_id, rank"""
    return {
        "pagerank_tokens": G.pagerank_fixed_sql(edges)
        + "\nORDER BY rank_fp DESC, node",
        "graph_triangles": G.triangle_counts_sql(edges) + "\nORDER BY node",
        "lpa_communities": G.label_propagation_sql(edges) + "\nORDER BY node",
        "co_lift": co_occ_order(
            G.co_occurrence_lift_sql(co_rel, max_doc_entities=CO_LIFT_DOC_CAP)
        ),
        "khop_neighbors": G.khop_neighbors_sql(khop_rel, KHOP_SEEDS, KHOP_K)
        + "\nORDER BY hop, node",
        "link_prediction": G.link_prediction_sql(
            khop_rel,
            max_center_degree=LINKPRED_CENTER_CAP,
            min_common=LINKPRED_MIN_COMMON,
        )
        + "\nORDER BY a, b",
        "fuzzy_name_pairs": """
            SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
                   a.c_name AS name_a, b.c_name AS name_b,
                   CAST(levenshtein(a.c_name, b.c_name) AS INTEGER) AS dist
            FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
            WHERE levenshtein(a.c_name, b.c_name) <= 1
            ORDER BY id_a, id_b""",
        "kmv_distinct": kmv_distinct_sql(kmv_rel, "lang") + "\nORDER BY lang",
        "kmv_overlap": kmv_overlap_sql(kmv_rel, "lang") + "\nORDER BY lang_a, lang_b",
        "kmv_sketch": (
            "SELECT lang, kmv_estimate FROM ("
            + kmv_distinct_sql(kmv_rel, "lang")
            + ")\nORDER BY lang"
        ),
        "heavy_hitters": heavy_hitters_sql("documents"),
        "quantile_sketch": quantile_sketch_sql(
            "SELECT lang AS grp, length(text) AS val, CAST(doc_id AS VARCHAR) AS key"
            " FROM documents",
            "lang",
        )
        + "\nORDER BY lang",
        "quantile_merge": (
            "SELECT lang, q50_est, q90_est FROM ("
            + quantile_sketch_sql(
                "SELECT lang AS grp, length(text) AS val,"
                " CAST(doc_id AS VARCHAR) AS key FROM documents",
                "lang",
            )
            + ")\nORDER BY lang"
        ),
        "weighted_sample": weighted_sample_sql(
            "SELECT lang AS grp, CAST(doc_id AS VARCHAR) AS id, length(text) AS w"
            " FROM documents",
            "lang",
        )
        + "\nORDER BY lang, id",
        "contamination_bloom": contamination_report_sql(
            f"SELECT doc_id, text FROM documents WHERE doc_id >= {BENCH_DOC_MAX_ID}",
            f"SELECT doc_id, text FROM documents WHERE doc_id < {BENCH_DOC_MAX_ID}",
            n=DECONTAM_N,
        )
        + "\nORDER BY doc_id",
        "bm25_topk": bm25_topk_sql(BM25_QUERIES, k=BM25_K)
        + "\nORDER BY query_id, rank",
        "grouped_heavy_hitters": grouped_heavy_hitters_sql(
            "SELECT lang AS grp, text FROM documents", "lang"
        )
        + "\nORDER BY lang, token",
        "unigram_logprob": unigram_logprob_sql("documents") + "\nORDER BY doc_id",
        "funnel_steps": funnel_steps_sql(FUNNEL) + "\nORDER BY step",
        "retention_cohorts": (
            "SELECT CAST(cohort_week AS VARCHAR) AS cohort_week,"
            " week_offset, n_users FROM ("
            + retention_cohorts_sql()
            + ")\nORDER BY cohort_week, week_offset"
        ),
        "event_transitions": event_transitions_sql()
        + "\nORDER BY prev_type, next_type",
        "json_field_stats": json_field_stats_sql() + "\nORDER BY event_type",
        "token_entropy": token_entropy_sql() + "\nORDER BY doc_id",
        "ann_sq8_topk": sq8_cte,
        "contamination": contamination_report_sql(
            f"SELECT doc_id, text FROM documents WHERE doc_id >= {BENCH_DOC_MAX_ID}",
            f"SELECT doc_id, text FROM documents WHERE doc_id < {BENCH_DOC_MAX_ID}",
            n=DECONTAM_N,
        )
        + "\nORDER BY doc_id",
    }


def co_occ_order(sql: str) -> str:
    return sql + "\nORDER BY ea, eb"


ORACLES = _oracles()
