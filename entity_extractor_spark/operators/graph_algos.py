"""Distributed graph algorithms over the KG edge tables: fixed-point
PageRank, triangle counting, and co-occurrence lift.

These extend the engine's graph materialization (SURVEY §2 custom: R6
salting, CC union-find) with the analytics a KG consumer runs next —
node importance, cohesion, and association strength. The reference has
no graph analytics (its "graph" is the flat mention table rendered in
Streamlit); these are beyond-reference capabilities designed for the
100 TB shape:

* every iteration/stage is an equi join + groupBy on the node key — the
  same shuffle the edge table is already bucketed by at scale;
* PageRank arithmetic is FIXED-POINT (integer micro-units), so partial
  aggregation order cannot perturb results — sums of longs are exact and
  associative, which is what makes the DuckDB oracle hash-match and a
  1000-executor run bit-reproducible (float PageRank is neither);
* triangle counting uses the degree-ordered node-iterator form (each
  triangle counted once from its lowest-degree corner) — the standard
  trick that bounds the candidate join on skewed/power-law graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# one micro-unit = 1e-12 of total rank mass; big enough that 8 rounds of
# integer floor-division keep ~9 significant digits, small enough that
# rank * edge-weight stays far under int64 for weights up to ~1e6
PR_SCALE = 1_000_000_000_000
PR_ITERS = 8
PR_DAMP_NUM = 85  # damping 0.85 as an integer ratio
PR_DAMP_DEN = 100


def _sym_weighted(edges: DataFrame) -> DataFrame:
    """Undirected weighted view: multi-edges collapse to a count weight,
    each {i, j} edge emitted in both directions, self-loops dropped."""
    e = edges.select(F.col("i").alias("src"), F.col("j").alias("dst")).filter(
        F.col("src") != F.col("dst")
    )
    both = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    return both.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("w"))


def _cut(df: DataFrame, checkpoint: bool) -> DataFrame:
    """Materialize-once marker for a frame the algorithm references more
    than once (per iteration, per wedge side, per hop): ``localCheckpoint``
    persists the partitions and truncates lineage, so the edge derivation
    (often an explode over the full corpus) runs ONCE instead of once per
    reference — at 100 TB this is the difference between one scan and
    ``iters`` scans. ``checkpoint=False`` keeps the logical plan intact
    for the plan guards in tests/test_plans.py (a checkpointed frame
    explains as an opaque RDD scan); a real cluster deployment would
    materialize these to a table instead of executor memory."""
    return df.localCheckpoint(eager=False) if checkpoint else df


def pagerank_fixed(
    edges: DataFrame, iters: int = PR_ITERS, scale: int = PR_SCALE,
    checkpoint: bool = True,
) -> DataFrame:
    """Weighted PageRank over the undirected multigraph in integer
    fixed-point.

    Multi-edges become integer weights w (e.g. co-occurrence counts); a
    node spreads its rank proportionally: contrib over edge (u→v) =
    floor(rank_u * w_uv / W_u) with W_u = Σ w_u·, and
    rank' = floor(0.15 * scale / n) + floor(0.85 * Σ contrib) — every
    operation is exact int64 math, so the result is independent of
    partitioning, aggregation order, and engine (the DuckDB oracle
    unrolls the same iterations as chained CTEs and hash-matches
    bit-for-bit; float PageRank can satisfy neither property). The
    floor-truncation leaks < degree micro-units per node per round —
    at scale=1e12 a relative error ~1e-9, the documented price of
    bit-reproducibility. rank_u * w_uv needs rank (≤ scale=1e12) times
    weight to fit int64 — safe through w ~ 1e6.

    Each iteration is one join + groupBy("dst") sum over the
    src-partitioned edge list — the plan a 1000-executor run wants:
    edges stay bucketed by src, ranks shuffle on the node key only. The
    loop runs on the driver but every round is a single distributed
    agg; lineage is cut per round via localCheckpoint (same discipline
    as operators/canonicalize.py).
    """
    # the edge list and node marginals are referenced EVERY iteration:
    # without the cut, each round re-runs the upstream edge derivation
    # (an explode over the full corpus for the word graph) — measured 18×
    # at sf0.1 local[32] (103 s uncut -> 5.7 s)
    e = _cut(_sym_weighted(edges), checkpoint)
    deg = e.groupBy("src").agg(
        F.count(F.lit(1)).alias("degree"), F.sum("w").alias("wout")
    )
    nodes = _cut(deg.select(F.col("src").alias("node"), "degree", "wout"), checkpoint)
    n = nodes.count()
    base = int(scale * (PR_DAMP_DEN - PR_DAMP_NUM) // (PR_DAMP_DEN * n))
    ranks = nodes.select("node", F.lit(int(scale // n)).alias("rank_fp"))
    for _ in range(iters):
        # `div` (SQL integral division), NOT `/`: Spark's `/` on longs is
        # DOUBLE division, whose correctly-rounded quotient can land on
        # an integer the true quotient sits just below — cast("long")
        # would then disagree with the oracle's exact `//`
        contrib = (
            ranks.join(nodes, "node")
            .join(e, F.col("node") == e["src"])
            .withColumn("c", F.expr("(rank_fp * w) div wout"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(f"(coalesce(s, 0L) * {PR_DAMP_NUM}) div {PR_DAMP_DEN}")
                ).alias("rank_fp"),
            )
            .localCheckpoint(eager=False)
        )
    return (
        ranks.join(nodes, "node")
        .select("node", "degree", F.col("wout").alias("weight_out"), "rank_fp")
    )


def pagerank_fixed_sql(edges_rel: str, iters: int = PR_ITERS, scale: int = PR_SCALE) -> str:
    """DuckDB twin of :func:`pagerank_fixed`: the iteration unrolled as
    chained CTEs (aggregation inside a recursive CTE is not portable);
    bit-identical because every step is integer arithmetic."""
    base_expr = f"({scale} * {PR_DAMP_DEN - PR_DAMP_NUM} // ({PR_DAMP_DEN} * (SELECT count(*) FROM _ga_nodes)))"
    init = f"({scale} // (SELECT count(*) FROM _ga_nodes))"
    ctes = [
        f"""_ga_raw AS ({edges_rel}),
        _ga_e AS (
          SELECT src, dst, count(*) AS w FROM (
            SELECT i AS src, j AS dst FROM _ga_raw WHERE i <> j
            UNION ALL
            SELECT j AS src, i AS dst FROM _ga_raw WHERE i <> j
          ) GROUP BY src, dst
        ),
        _ga_nodes AS (
          SELECT src AS node, count(*) AS degree, CAST(sum(w) AS BIGINT) AS wout
          FROM _ga_e GROUP BY src
        ),
        _ga_r0 AS (SELECT node, CAST({init} AS BIGINT) AS rank_fp FROM _ga_nodes)"""
    ]
    for it in range(1, iters + 1):
        prev, cur = f"_ga_r{it - 1}", f"_ga_r{it}"
        ctes.append(
            f"""{cur} AS (
          SELECT n.node,
                 CAST({base_expr} + (coalesce(c.s, 0) * {PR_DAMP_NUM} // {PR_DAMP_DEN}) AS BIGINT) AS rank_fp
          FROM _ga_nodes n
          LEFT JOIN (
            SELECT e.dst, sum((r.rank_fp * e.w) // nn.wout) AS s
            FROM {prev} r
            JOIN _ga_nodes nn ON r.node = nn.node
            JOIN _ga_e e ON r.node = e.src
            GROUP BY e.dst
          ) c ON n.node = c.dst
        )"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
        SELECT * FROM (
          SELECT r.node AS node, n.degree, n.wout AS weight_out, r.rank_fp
          FROM _ga_r{iters} r JOIN _ga_nodes n ON r.node = n.node
        )"""
    )


def triangle_counts(edges: DataFrame, checkpoint: bool = True) -> DataFrame:
    """Per-node triangle counts over the undirected {i, j} edge set.

    Node-iterator with total ordering: orient every edge low→high by
    (degree, node) so each wedge is enumerated exactly once at its
    lowest-degree corner, then close it with an inner join back to the
    oriented edge list. On power-law graphs this bounds wedge fan-out
    by the SMALLER endpoint's degree — the standard mitigation for hub
    nodes; all joins are equi joins on node keys. Exact integer counts
    — the DuckDB mirror hash-matches.
    """
    # e feeds both the degree marginal and the orientation; oriented is
    # referenced THREE times (two wedge sides + the closer) — cut both so
    # the corpus-wide edge derivation runs once, not four times
    e = _cut(_sym_weighted(edges).select("src", "dst"), checkpoint)  # distinct directed pairs
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ranked = e.join(deg.withColumnRenamed("src", "node"), e["src"] == F.col("node")).select(
        "src", "dst", F.col("deg").alias("sdeg")
    )
    ranked = ranked.join(
        deg.select(F.col("src").alias("node"), F.col("deg").alias("ddeg")),
        ranked["dst"] == F.col("node"),
    ).select("src", "dst", "sdeg", "ddeg")
    # keep each undirected edge once, oriented from the (deg, id)-smaller end
    oriented = _cut(
        ranked.filter(
            (F.col("sdeg") < F.col("ddeg"))
            | ((F.col("sdeg") == F.col("ddeg")) & (F.col("src") < F.col("dst")))
        ).select("src", "dst"),
        checkpoint,
    )
    w1 = oriented.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    w2 = oriented.select(F.col("src").alias("a2"), F.col("dst").alias("c"))
    wedges = w1.join(w2, (F.col("a") == F.col("a2")) & (F.col("b") < F.col("c"))).select(
        "a", "b", "c"
    )
    closer = oriented.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    tri = wedges.join(closer, ["b", "c"])
    per_corner = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return per_corner


def triangle_counts_sql(edges_rel: str) -> str:
    """DuckDB twin of :func:`triangle_counts` (same orientation rule)."""
    return f"""WITH _tc_raw AS ({edges_rel}),
        _tc_e AS (
          SELECT src, dst FROM (
            SELECT i AS src, j AS dst FROM _tc_raw WHERE i <> j
            UNION
            SELECT j AS src, i AS dst FROM _tc_raw WHERE i <> j
          )
        ),
        _tc_deg AS (SELECT src AS node, count(*) AS deg FROM _tc_e GROUP BY src),
        _tc_or AS (
          SELECT e.src, e.dst
          FROM _tc_e e
          JOIN _tc_deg ds ON e.src = ds.node
          JOIN _tc_deg dd ON e.dst = dd.node
          WHERE ds.deg < dd.deg OR (ds.deg = dd.deg AND e.src < e.dst)
        ),
        _tc_tri AS (
          SELECT w1.src AS a, w1.dst AS b, w2.dst AS c
          FROM _tc_or w1
          JOIN _tc_or w2 ON w1.src = w2.src AND w1.dst < w2.dst
          JOIN _tc_or cl ON cl.src = w1.dst AND cl.dst = w2.dst
        )
        SELECT node, count(*) AS n_triangles
        FROM (SELECT a AS node FROM _tc_tri UNION ALL SELECT b FROM _tc_tri UNION ALL SELECT c FROM _tc_tri)
        GROUP BY node"""


def khop_neighbors(
    edges: DataFrame, seeds: list[str], k: int = 3, checkpoint: bool = True
) -> DataFrame:
    """Minimum-hop BFS neighborhood: every node within ``k`` hops of the
    seed set over the undirected {i, j} edge set, labeled with its hop
    distance (seeds = hop 0).

    The KG consumer's traversal query ("everything within 3 hops of
    entity X") — the reference has no traversal at all; its closest
    behavior is the one-hop work-list restriction
    (`extraction_engine.py:228`). Each hop is one equi join of the
    frontier against the symmetric edge list plus one left-anti join
    against the visited set — both keyed on the node id, i.e. the
    shuffle a node-bucketed edge table already satisfies at 100 TB. The
    frontier is typically orders of magnitude smaller than the edge
    table, so AQE picks a broadcast for the frontier side; no cartesian
    or BNLJ can appear (plan-guarded in tests/test_plans.py). The
    visited set is re-derived per hop via ``localCheckpoint`` to cut
    the iterative lineage (same discipline as pagerank_fixed /
    operators/canonicalize.py); ``checkpoint=False`` keeps the full
    logical plan visible — used by the plan guard in
    tests/test_plans.py, since a checkpointed frame explains as an
    opaque RDD scan.

    Min-hop correctness: a node reachable at hops 1 and 3 is labeled 1,
    because the anti join removes every previously-visited node before
    it can re-enter the frontier.
    """
    spark = edges.sparkSession
    # e is probed every hop — cut it so the edge derivation runs once
    e = _cut(_sym_weighted(edges).select("src", "dst"), checkpoint)
    visited = spark.createDataFrame(
        [(s,) for s in sorted(set(seeds))], "node string"
    ).withColumn("hop", F.lit(0))
    frontier = visited.select("node")
    for h in range(1, k + 1):
        nxt = _cut(
            frontier.join(e, frontier["node"] == e["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited, "node", "left_anti"),
            checkpoint,
        )
        visited = _cut(visited.unionByName(nxt.withColumn("hop", F.lit(h))), checkpoint)
        frontier = nxt
    return visited


def khop_neighbors_sql(edges_rel: str, seeds: list[str], k: int = 3) -> str:
    """DuckDB twin of :func:`khop_neighbors`: the BFS unrolled as chained
    CTEs (one per hop), each hop joining the previous round's frontier
    (visited nodes with hop = h-1) and anti-filtering the visited set."""
    seed_vals = ", ".join(f"('{s}')" for s in sorted(set(seeds)))
    ctes = [
        f"""_kh_raw AS ({edges_rel}),
        _kh_e AS (
          SELECT DISTINCT src, dst FROM (
            SELECT i AS src, j AS dst FROM _kh_raw WHERE i <> j
            UNION ALL
            SELECT j AS src, i AS dst FROM _kh_raw WHERE i <> j
          )
        ),
        _kh_v0 AS (SELECT node, 0 AS hop FROM (VALUES {seed_vals}) s(node))"""
    ]
    for h in range(1, k + 1):
        prev = f"_kh_v{h - 1}"
        ctes.append(
            f"""_kh_v{h} AS (
          SELECT node, hop FROM {prev}
          UNION ALL
          SELECT node, {h} AS hop FROM (
            SELECT DISTINCT e.dst AS node
            FROM {prev} f
            JOIN _kh_e e ON f.node = e.src AND f.hop = {h - 1}
            WHERE e.dst NOT IN (SELECT node FROM {prev})
          )
        )"""
        )
    return "WITH " + ",\n".join(ctes) + f"\nSELECT node, hop FROM _kh_v{k}"


LPA_ITERS = 3


def label_propagation(
    edges: DataFrame, iters: int = LPA_ITERS, checkpoint: bool = True
) -> DataFrame:
    """Deterministic synchronous label propagation (community
    detection): every node starts labeled with itself; each round it
    adopts the label with the highest edge-weight vote among its
    neighbors, ties broken by the SMALLEST label — the
    tie-deterministic variant of Raghavan et al. 2007's LPA, so the
    result is independent of partitioning and engine (classic LPA
    breaks ties randomly and is irreproducible by design; a fixed
    ``iters`` with deterministic ties is the form a production pipeline
    can regression-test).

    Each round is ONE join + groupBy on the node key over the `_cut`
    edge list (same shuffle discipline as :func:`pagerank_fixed` — the
    edge table's bucketing is reused every round, lineage is cut so the
    upstream edge derivation runs once). Votes are integer edge-weight
    sums, so there is no float to diverge; the DuckDB oracle unrolls
    the same rounds as chained CTEs and hash-matches exactly."""
    from pyspark.sql import Window

    e = _cut(_sym_weighted(edges), checkpoint)
    nodes = _cut(e.select(F.col("src").alias("node")).dropDuplicates(["node"]), checkpoint)
    labels = nodes.select("node", F.col("node").alias("label"))
    w = Window.partitionBy("src").orderBy(F.desc("cnt"), "label")
    for _ in range(iters):
        votes = (
            e.join(labels, e["dst"] == labels["node"])
            .groupBy("src", "label")
            .agg(F.sum("w").alias("cnt"))
        )
        new = (
            votes.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(F.col("src").alias("node"), "label")
        )
        # every node has >= 1 neighbor by construction (nodes come from
        # the symmetric edge list), so the vote result covers all nodes
        labels = _cut(new, checkpoint)
    sizes = labels.groupBy("label").agg(F.count(F.lit(1)).alias("community_size"))
    return labels.join(sizes, "label").select("node", "label", "community_size")


def label_propagation_sql(edges_rel: str, iters: int = LPA_ITERS) -> str:
    """DuckDB twin of :func:`label_propagation` — the rounds unrolled as
    chained CTEs, same integer votes, same (cnt DESC, label) tie rule."""
    ctes = [
        f"""_lp_raw AS ({edges_rel}),
        _lp_e AS (
          SELECT src, dst, count(*) AS w FROM (
            SELECT i AS src, j AS dst FROM _lp_raw WHERE i <> j
            UNION ALL
            SELECT j AS src, i AS dst FROM _lp_raw WHERE i <> j
          ) GROUP BY src, dst
        ),
        _lp_l0 AS (SELECT DISTINCT src AS node, src AS label FROM _lp_e)"""
    ]
    for it in range(1, iters + 1):
        prev, cur = f"_lp_l{it - 1}", f"_lp_l{it}"
        ctes.append(
            f"""{cur} AS (
          SELECT src AS node, label FROM (
            SELECT e.src, l.label, sum(e.w) AS cnt,
                   row_number() OVER (PARTITION BY e.src
                                      ORDER BY sum(e.w) DESC, l.label) AS rn
            FROM _lp_e e JOIN {prev} l ON e.dst = l.node
            GROUP BY e.src, l.label
          ) WHERE rn = 1
        )"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
        SELECT l.node, l.label, s.community_size
        FROM _lp_l{iters} l
        JOIN (
          SELECT label, CAST(count(*) AS BIGINT) AS community_size
          FROM _lp_l{iters} GROUP BY label
        ) s ON l.label = s.label"""
    )


def link_prediction(
    edges: DataFrame,
    max_center_degree: int | None = None,
    exclude_existing: bool = True,
    min_common: int = 1,
    checkpoint: bool = True,
) -> DataFrame:
    """Common-neighbor link prediction over the undirected {i, j} edge
    set: for each node pair {a, b} (a < b), the number of shared
    neighbors and the neighborhood Jaccard coefficient
    ``common / (deg_a + deg_b - common)`` — the classic "suggest this
    missing KG edge" score (no libm: integer counts + one IEEE division
    + round, so the value is bit-stable across engines/partitionings,
    same policy as co_occurrence_lift).

    Plan shape: wedge enumeration is ONE equi self-join of the
    symmetric edge list on the shared-neighbor key, then a groupBy on
    the pair — the shuffles a node-bucketed edge table already
    satisfies. A hub center of degree d emits d·(d-1)/2 wedges (the
    quadratic skew risk of any wedge join); ``max_center_degree`` is
    the explicit hot-center guard — wedges through centers above the
    cap are skipped, mirrored exactly in the DuckDB oracle (the same
    guard discipline as the LSH ``max_bucket``). Degrees in the
    Jaccard denominator stay UNcapped (the cap limits enumeration
    cost, not the score definition). ``exclude_existing`` anti-joins
    pairs already connected — prediction proposes NEW edges.
    """
    # e feeds the degree marginal, both wedge sides, and the anti join —
    # cut it so the edge derivation runs once
    e = _cut(_sym_weighted(edges).select("src", "dst"), checkpoint)
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    centers = _cut(deg.withColumnRenamed("src", "node"), checkpoint)
    ok = e
    if max_center_degree is not None:
        ok = _cut(
            e.join(F.broadcast(centers), e["src"] == centers["node"])
            .filter(F.col("deg") <= max_center_degree)
            .select("src", "dst"),
            checkpoint,
        )
    w1 = ok.select(F.col("src").alias("n"), F.col("dst").alias("a"))
    w2 = ok.select(F.col("src").alias("n2"), F.col("dst").alias("b"))
    pairs = (
        w1.join(w2, (F.col("n") == F.col("n2")) & (F.col("a") < F.col("b")))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("common"))
        .filter(F.col("common") >= min_common)
    )
    if exclude_existing:
        pairs = pairs.join(
            e.select(F.col("src").alias("a"), F.col("dst").alias("b")),
            ["a", "b"],
            "left_anti",
        )
    return (
        pairs.join(
            F.broadcast(centers.select(F.col("node").alias("a"), F.col("deg").alias("deg_a"))), "a"
        )
        .join(
            F.broadcast(centers.select(F.col("node").alias("b"), F.col("deg").alias("deg_b"))), "b"
        )
        .select(
            "a",
            "b",
            "common",
            "deg_a",
            "deg_b",
            F.round(
                F.col("common").cast("double")
                / (F.col("deg_a") + F.col("deg_b") - F.col("common")).cast("double"),
                6,
            ).alias("jaccard"),
        )
    )


def link_prediction_sql(
    edges_rel: str,
    max_center_degree: int | None = None,
    exclude_existing: bool = True,
    min_common: int = 1,
) -> str:
    """DuckDB twin of :func:`link_prediction` (same wedge-center cap)."""
    cap = (
        f"JOIN _lp_deg cd ON e.src = cd.node AND cd.deg <= {max_center_degree}"
        if max_center_degree is not None
        else ""
    )
    anti = (
        "WHERE NOT EXISTS (SELECT 1 FROM _lp_e x WHERE x.src = w.a AND x.dst = w.b)"
        if exclude_existing
        else ""
    )
    return f"""WITH _lp_raw AS ({edges_rel}),
        _lp_e AS (
          SELECT DISTINCT src, dst FROM (
            SELECT i AS src, j AS dst FROM _lp_raw WHERE i <> j
            UNION ALL
            SELECT j AS src, i AS dst FROM _lp_raw WHERE i <> j
          )
        ),
        _lp_deg AS (SELECT src AS node, count(*) AS deg FROM _lp_e GROUP BY src),
        _lp_ok AS (SELECT e.src, e.dst FROM _lp_e e {cap}),
        _lp_w AS (
          SELECT w1.dst AS a, w2.dst AS b, count(*) AS common
          FROM _lp_ok w1 JOIN _lp_ok w2 ON w1.src = w2.src AND w1.dst < w2.dst
          GROUP BY 1, 2
          HAVING count(*) >= {min_common}
        )
        SELECT w.a, w.b, w.common, da.deg AS deg_a, db.deg AS deg_b,
               round(w.common::DOUBLE / (da.deg + db.deg - w.common)::DOUBLE, 6) AS jaccard
        FROM _lp_w w
        JOIN _lp_deg da ON w.a = da.node
        JOIN _lp_deg db ON w.b = db.node
        {anti}"""


def co_occurrence_lift(
    doc_entity: DataFrame,
    min_pair_docs: int = 1,
    max_doc_entities: int | None = None,
    checkpoint: bool = True,
) -> DataFrame:
    """Association strength between entity pairs from a distinct
    (doc_id, entity) mention table: lift = n_docs * c_ab / (c_a * c_b).

    lift > 1 ⇔ the pair co-occurs more than independence predicts — the
    KG edge-weighting signal (PMI's argument without the log: IEEE
    division of exact integer counts is correctly rounded, so the value
    is bit-stable across engines and partitionings, where log is
    libm-dependent and is not).

    Plan shape: one self-join of the per-doc entity list on doc_id
    (i < j to emit each pair once), one groupBy on the pair — both
    shuffles keyed the way a bucketed mention table already is. Entity
    marginals are a tiny aggregate broadcast onto the pair counts.

    ``max_doc_entities`` is the hot-doc guard (the wedge-join discipline
    of ``link_prediction``'s ``max_center_degree``): a doc with d
    distinct entities emits d(d-1)/2 pairs, so one mega-doc can dominate
    the whole enumeration; docs above the cap are skipped at ENUMERATION
    time (``min_pair_docs`` only filters output, after the damage).
    Marginals and n_docs still count every doc, so admitted pairs keep
    their exact lift.
    """
    # de is counted once (n_docs action) and then referenced three times
    # in the final job (marginal + both pair sides) — cut it
    de = _cut(
        doc_entity.select("doc_id", "entity").dropDuplicates(["doc_id", "entity"]),
        checkpoint,
    )
    n_docs = de.select("doc_id").distinct().count()
    marg = de.groupBy("entity").agg(F.count(F.lit(1)).alias("c"))
    enum = de
    if max_doc_entities is not None:
        ok = (
            de.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("_d"))
            .filter(F.col("_d") <= max_doc_entities)
            .select("doc_id")
        )
        enum = de.join(ok, "doc_id", "left_semi")
    a = enum.select("doc_id", F.col("entity").alias("ea"))
    b = enum.select("doc_id", F.col("entity").alias("eb"))
    pairs = (
        a.join(b, "doc_id")
        .filter(F.col("ea") < F.col("eb"))
        .groupBy("ea", "eb")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= min_pair_docs)
    )
    out = (
        pairs.join(F.broadcast(marg.select(F.col("entity").alias("ea"), F.col("c").alias("c_a"))), "ea")
        .join(F.broadcast(marg.select(F.col("entity").alias("eb"), F.col("c").alias("c_b"))), "eb")
        .select(
            "ea",
            "eb",
            "c_ab",
            "c_a",
            "c_b",
            F.round(
                (F.lit(n_docs).cast("double") * F.col("c_ab"))
                / (F.col("c_a").cast("double") * F.col("c_b")),
                6,
            ).alias("lift"),
        )
    )
    return out


def co_occurrence_lift_sql(
    doc_entity_rel: str, min_pair_docs: int = 1, max_doc_entities: int | None = None
) -> str:
    ok = (
        f"""_cl_ok AS (
          SELECT e.doc_id, e.entity FROM _cl_de e
          JOIN (SELECT doc_id FROM _cl_de GROUP BY doc_id
                HAVING count(*) <= {max_doc_entities}) d USING (doc_id)
        )"""
        if max_doc_entities is not None
        else "_cl_ok AS (SELECT doc_id, entity FROM _cl_de)"
    )
    return f"""WITH _cl_de AS (SELECT DISTINCT doc_id, entity FROM ({doc_entity_rel})),
        _cl_n AS (SELECT count(DISTINCT doc_id) AS n FROM _cl_de),
        _cl_m AS (SELECT entity, count(*) AS c FROM _cl_de GROUP BY entity),
        {ok},
        _cl_p AS (
          SELECT a.entity AS ea, b.entity AS eb, count(*) AS c_ab
          FROM _cl_ok a JOIN _cl_ok b ON a.doc_id = b.doc_id AND a.entity < b.entity
          GROUP BY 1, 2
          HAVING count(*) >= {min_pair_docs}
        )
        SELECT p.ea, p.eb, p.c_ab, ma.c AS c_a, mb.c AS c_b,
               round((SELECT n FROM _cl_n)::DOUBLE * p.c_ab / (ma.c::DOUBLE * mb.c::DOUBLE), 6) AS lift
        FROM _cl_p p
        JOIN _cl_m ma ON p.ea = ma.entity
        JOIN _cl_m mb ON p.eb = mb.entity"""
