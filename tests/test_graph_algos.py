"""Unit tests for graph algorithms, sketches, quantized ANN, and
decontamination — known-answer fixtures plus invariant checks that the
contract queries (hash-equality vs DuckDB) cannot express."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from entity_extractor_spark.operators import graph_algos as G
from entity_extractor_spark.operators import simsearch as S
from entity_extractor_spark.operators.decontam import contamination_report
from entity_extractor_spark.operators.sketches import KMV_K, kmv_distinct


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "i string, j string")


# --------------------------------------------------------------------------- pagerank


def test_pagerank_star_center_dominates(spark):
    # star graph: hub h connected to 4 leaves — hub must outrank leaves
    e = _edges(spark, [("h", "a"), ("h", "b"), ("h", "c"), ("h", "d")])
    rows = {r["node"]: r for r in G.pagerank_fixed(e, iters=6).collect()}
    assert rows["h"]["degree"] == 4
    for leaf in "abcd":
        assert rows["h"]["rank_fp"] > rows[leaf]["rank_fp"]
        # leaves are symmetric — exact fixed-point equality, no tolerance
        assert rows[leaf]["rank_fp"] == rows["a"]["rank_fp"]


def test_pagerank_mass_conserved_up_to_truncation(spark):
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")])
    total = (
        G.pagerank_fixed(e, iters=8)
        .agg(F.sum("rank_fp").alias("s"))
        .collect()[0]["s"]
    )
    # floor-truncation only ever loses mass, bounded by (degree+2) ulps
    # per node per round — total stays within 1e-6 of full mass
    assert G.PR_SCALE * (1 - 1e-6) < total <= G.PR_SCALE


def test_pagerank_weighted_pull(spark):
    # b receives a double-weight edge from a; c a single — b outranks c
    e = _edges(spark, [("a", "b"), ("a", "b"), ("a", "c"), ("b", "c"), ("c", "b")])
    rows = {r["node"]: r for r in G.pagerank_fixed(e, iters=8).collect()}
    assert rows["b"]["weight_out"] > rows["c"]["weight_out"]
    assert rows["b"]["rank_fp"] > rows["c"]["rank_fp"]


# --------------------------------------------------------------------------- triangles


def test_triangle_counts_known_graph(spark):
    # K4 on {a,b,c,d}: C(4,3) = 4 triangles, every node in exactly 3
    k4 = [(x, y) for x in "abcd" for y in "abcd" if x < y]
    rows = {r["node"]: r["n_triangles"] for r in G.triangle_counts(_edges(spark, k4)).collect()}
    assert rows == {"a": 3, "b": 3, "c": 3, "d": 3}


def test_triangle_counts_no_triangle(spark):
    # path a-b-c-d has no triangles -> empty result
    path = [("a", "b"), ("b", "c"), ("c", "d")]
    assert G.triangle_counts(_edges(spark, path)).count() == 0


def test_triangle_duplicate_and_reversed_edges_collapse(spark):
    tri = [("a", "b"), ("b", "a"), ("b", "c"), ("c", "a"), ("a", "c")]
    rows = {r["node"]: r["n_triangles"] for r in G.triangle_counts(_edges(spark, tri)).collect()}
    assert rows == {"a": 1, "b": 1, "c": 1}


# --------------------------------------------------------------------------- k-hop BFS


def test_khop_path_graph_hop_labels(spark):
    # path a-b-c-d-e, seed a, k=3: hops 0..3; e (4 hops away) excluded
    path = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]
    rows = {r["node"]: r["hop"] for r in G.khop_neighbors(_edges(spark, path), ["a"], k=3).collect()}
    assert rows == {"a": 0, "b": 1, "c": 2, "d": 3}


def test_khop_min_hop_wins_on_cycles(spark):
    # b reachable at hop 1 directly AND at hop 3 around the square
    # a-c-d-b: the label must be the minimum (1), never duplicated
    sq = [("a", "b"), ("a", "c"), ("c", "d"), ("d", "b")]
    out = G.khop_neighbors(_edges(spark, sq), ["a"], k=3).collect()
    rows = {r["node"]: r["hop"] for r in out}
    assert len(out) == len(rows)  # one row per node
    assert rows == {"a": 0, "b": 1, "c": 1, "d": 2}


def test_khop_multi_seed_and_isolated_seed(spark):
    # two seeds expand together; a seed absent from the edge set still
    # appears at hop 0 (both engines agree on that convention)
    e = [("a", "b"), ("c", "d")]
    rows = {
        r["node"]: r["hop"]
        for r in G.khop_neighbors(_edges(spark, e), ["a", "c", "zz"], k=2).collect()
    }
    assert rows == {"a": 0, "c": 0, "zz": 0, "b": 1, "d": 1}


def test_khop_saturation_is_stable(spark):
    # k beyond the diameter: no growth, no duplicate rows
    tri = [("a", "b"), ("b", "c"), ("c", "a")]
    out = G.khop_neighbors(_edges(spark, tri), ["a"], k=5).collect()
    assert sorted((r["node"], r["hop"]) for r in out) == [("a", 0), ("b", 1), ("c", 1)]


# --------------------------------------------------------------------------- link prediction


def test_link_prediction_square(spark):
    # square a-b-c-d-a: non-adjacent diagonals (a,c) and (b,d) share both
    # their neighbors -> common=2, jaccard = 2/(2+2-2) = 1.0
    sq = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")]
    rows = {(r["a"], r["b"]): r for r in G.link_prediction(_edges(spark, sq)).collect()}
    assert set(rows) == {("a", "c"), ("b", "d")}
    for r in rows.values():
        assert r["common"] == 2 and r["jaccard"] == 1.0


def test_link_prediction_excludes_existing_edges(spark):
    # triangle: every candidate pair is already an edge -> empty unless
    # exclude_existing=False, which then scores all three pairs
    tri = [("a", "b"), ("b", "c"), ("a", "c")]
    assert G.link_prediction(_edges(spark, tri)).count() == 0
    out = G.link_prediction(_edges(spark, tri), exclude_existing=False).collect()
    assert len(out) == 3
    # each pair shares exactly the third node: jaccard = 1/(2+2-1)
    assert all(r["common"] == 1 and r["jaccard"] == pytest.approx(1 / 3) for r in out)


def test_link_prediction_center_cap_skips_hub_wedges(spark):
    # hub h connects a,b,c (deg 3); a-b also share low-degree center m;
    # h and m share {a, b}. cap=2 drops wedges CENTERED on h: (a,c) and
    # (b,c) vanish, (a,b) loses its h-wedge (common 2 -> 1), and the
    # jaccard DENOMINATOR still uses uncapped degrees
    e = [("h", "a"), ("h", "b"), ("h", "c"), ("m", "a"), ("m", "b")]
    uncapped = {(r["a"], r["b"]): r["common"] for r in G.link_prediction(_edges(spark, e)).collect()}
    assert uncapped == {("a", "b"): 2, ("a", "c"): 1, ("b", "c"): 1, ("h", "m"): 2}
    capped = {(r["a"], r["b"]): r for r in G.link_prediction(_edges(spark, e), max_center_degree=2).collect()}
    assert set(capped) == {("a", "b"), ("h", "m")}
    r = capped[("a", "b")]
    assert r["common"] == 1 and r["deg_a"] == 2 and r["deg_b"] == 2
    assert r["jaccard"] == pytest.approx(1 / 3)


# --------------------------------------------------------------------------- co-occurrence lift


def test_co_lift_independence_and_association(spark):
    # docs 1..4: x everywhere; y only with z in docs 1,2 — (y,z) lift 2.0
    rows = [
        (1, "x"), (1, "y"), (1, "z"),
        (2, "x"), (2, "y"), (2, "z"),
        (3, "x"), (4, "x"),
    ]
    de = spark.createDataFrame(rows, "doc_id long, entity string")
    out = {(r["ea"], r["eb"]): r for r in G.co_occurrence_lift(de).collect()}
    yz = out[("y", "z")]
    assert yz["c_ab"] == 2 and yz["c_a"] == 2 and yz["c_b"] == 2
    assert yz["lift"] == pytest.approx(4 * 2 / (2 * 2))  # = 2.0
    assert out[("x", "y")]["lift"] == pytest.approx(4 * 2 / (4 * 2))  # = 1.0


def test_co_lift_hot_doc_cap_boundary(spark):
    """max_doc_entities skips pair ENUMERATION through docs above the
    cap (the last unguarded wedge join, round-3 verdict item 3) while
    marginals and n_docs keep counting every doc. Boundary-exact: a doc
    with exactly cap entities is admitted, cap+1 is skipped."""
    rows = (
        [(1, e) for e in ("a", "b", "c")]        # hot doc: 3 entities
        + [(2, e) for e in ("a", "b")]           # at-cap doc: 2 entities
        + [(3, "a"), (4, "c")]
    )
    de = spark.createDataFrame(rows, "doc_id long, entity string")

    # cap 2: doc 1 (3 entities) is excluded from enumeration -> only
    # doc 2's (a,b) pair survives; marginals still count doc 1
    capped = {(r["ea"], r["eb"]): r for r in
              G.co_occurrence_lift(de, max_doc_entities=2).collect()}
    assert set(capped) == {("a", "b")}
    r = capped[("a", "b")]
    assert r["c_ab"] == 1                       # doc 2 only
    assert r["c_a"] == 3 and r["c_b"] == 2      # marginals uncapped
    assert r["lift"] == pytest.approx(4 * 1 / (3 * 2))

    # cap 3 (= hot doc's entity count): boundary is inclusive — output
    # identical to the unguarded run
    full = {(r["ea"], r["eb"]): (r["c_ab"], r["lift"]) for r in
            G.co_occurrence_lift(de).collect()}
    at_cap = {(r["ea"], r["eb"]): (r["c_ab"], r["lift"]) for r in
              G.co_occurrence_lift(de, max_doc_entities=3).collect()}
    assert at_cap == full and ("a", "b") in full and ("b", "c") in full

    # the SQL mirror applies the identical guard
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE de AS SELECT * FROM (VALUES "
                + ", ".join(f"({d}, '{e}')" for d, e in rows)
                + ") t(doc_id, entity)")
    sql = G.co_occurrence_lift_sql("SELECT * FROM de", max_doc_entities=2)
    got = {(a, b): (c, lift) for a, b, c, _, _, lift in con.execute(sql).fetchall()}
    assert got == {("a", "b"): (1, pytest.approx(4 / 6))}


# --------------------------------------------------------------------------- KMV sketch


def test_kmv_exact_below_k(spark):
    df = spark.createDataFrame(
        [("g", f"v{i}") for i in range(10)], "grp string, val string"
    )
    row = kmv_distinct(df, "grp", "val").collect()[0]
    assert row["n_exact"] == 10
    # d <= k -> sketch is lossless
    assert row["kmv_estimate"] == 10.0


def test_kmv_estimate_above_k_within_error(spark):
    n = 2000
    df = spark.createDataFrame(
        [("g", f"value-{i}") for i in range(n)], "grp string, val string"
    )
    row = kmv_distinct(df, "grp", "val").collect()[0]
    assert row["n_exact"] == n
    # KMV stderr ~ 1/sqrt(k-2) ~ 18% at k=32; allow 3 sigma
    assert abs(row["kmv_estimate"] - n) / n < 0.55


def test_kmv_sketch_only_estimate_parity(spark):
    """The bounded-state sketch must reproduce kmv_distinct's estimate
    bit-exactly in every regime: below k (lossless count), exactly k
    (the ambiguous boundary the k+1-th kept hash resolves), just above
    k, and far above k — independent of partitioning."""
    from entity_extractor_spark.operators.sketches import KMV_K, kmv_sketch_only

    rows = []
    for grp, n in [("below", 10), ("at_k", KMV_K), ("above", KMV_K + 1), ("far", 500)]:
        rows += [(grp, f"{grp}-v{i}") for i in range(n)]
        rows += [(grp, f"{grp}-v0")] * 3  # duplicates must not matter
        rows += [(grp, None)] * 2  # NULL values are outside the distinct universe
    df = spark.createDataFrame(rows, "grp string, val string")
    exact = {
        r["grp"]: r["kmv_estimate"] for r in kmv_distinct(df, "grp", "val").collect()
    }
    for parts in (1, 7):
        sk = {
            r["grp"]: r["kmv_estimate"]
            for r in kmv_sketch_only(df.repartition(parts), "grp", "val").collect()
        }
        assert sk == exact, (parts, sk, exact)
    assert exact["below"] == 10.0 and exact["at_k"] == float(KMV_K)
    assert exact["above"] != float(KMV_K + 1)  # estimator regime engaged


def test_kmv_null_values_excluded_both_engines(spark):
    """NULL values are excluded from the distinct universe (SQL
    COUNT(DISTINCT) semantics) by BOTH the Spark plan and the DuckDB
    twin. Counting them would be cross-engine-fragile anyway: a NULL
    hash ranks FIRST in Spark's ascending window but LAST in DuckDB's,
    so above k the two engines would disagree on the k-th smallest
    hash — the filter pins one semantic."""
    import duckdb

    from entity_extractor_spark.operators.sketches import KMV_K, kmv_distinct_sql

    n = KMV_K + 20  # estimator regime, where the NULL rank would shift hk
    rows = [("g", f"value-{i}") for i in range(n)] + [("g", None)] * 3
    df = spark.createDataFrame(rows, "grp string, val string")
    got = kmv_distinct(df, "grp", "val").collect()[0]
    assert got["n_exact"] == n

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE kv AS SELECT * FROM (VALUES "
        + ", ".join(f"('g', 'value-{i}')" for i in range(n))
        + ", ('g', NULL), ('g', NULL), ('g', NULL)) t(grp, val)"
    )
    oracle = con.execute(kmv_distinct_sql("SELECT * FROM kv", "grp")).fetchone()
    assert oracle[1] == n
    assert oracle[2] == got["kmv_estimate"]


def test_kmv_partials_state_is_bounded(spark):
    """The partial pass may emit at most k+1 rows per (partition, group)
    — the exchange payload the sketch exists to bound."""
    from entity_extractor_spark.operators.sketches import kmv_partials

    k = 8
    parts = 5
    rows = [("g", f"v{i}") for i in range(1000)] + [("h", f"w{i}") for i in range(4)]
    df = spark.createDataFrame(rows, "grp string, val string").repartition(parts)
    out = kmv_partials(df, "grp", "val", k=k).groupBy("grp").count().collect()
    by_grp = {r["grp"]: r["count"] for r in out}
    assert by_grp["g"] <= (k + 1) * parts
    assert by_grp["h"] <= 4 * parts  # never more rows than distinct values


def test_kmv_insensitive_to_duplicates_and_partitioning(spark):
    base = [("g", f"value-{i}") for i in range(500)]
    df1 = spark.createDataFrame(base * 3, "grp string, val string")
    df2 = spark.createDataFrame(base, "grp string, val string").repartition(7)
    r1 = kmv_distinct(df1, "grp", "val").collect()[0]
    r2 = kmv_distinct(df2, "grp", "val").collect()[0]
    assert r1["kmv_estimate"] == r2["kmv_estimate"]
    assert r1["n_exact"] == r2["n_exact"] == 500
    assert KMV_K < 500  # the estimator path, not the exact path


# --------------------------------------------------------------------------- sq8 ANN


def test_sq8_quantize_codes(spark):
    df = spark.createDataFrame(
        [(1, [1.0, -0.5, 0.25, 0.0]), (2, [0.0, 0.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    rows = {
        r["vec_id"]: r["q"]
        for r in df.select("vec_id", S.sq8_quantize(F.col("embedding")).alias("q")).collect()
    }
    # max|v| = 1.0 -> codes are floor(v*127 + 0.5)
    assert rows[1] == [127, -63, 32, 0]
    assert rows[2] == [0, 0, 0, 0]  # zero vector stays zero, no div-by-zero


def test_sq8_topk_agrees_with_exact_on_separated_vectors(spark):
    # clusters far apart: quantized ranking must match exact cosine ranking
    vecs = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.0, 0.95, 0.05, 0.0]),
        (4, [0.0, 0.0, 1.0, 0.0]),
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    q = df.filter(F.col("vec_id") == 0)
    got = S.sq8_topk(df, q, k=2).orderBy("rank").collect()
    assert [r["neighbor_id"] for r in got] == [1, 2]
    assert got[0]["score_q"] > got[1]["score_q"]


# --------------------------------------------------------------------------- quantile sketch


def test_quantile_sketch_lossless_below_k(spark):
    """Group smaller than k: the bottom-k sample IS the group, so the
    estimates must equal the exact quantiles."""
    from entity_extractor_spark.operators.sketches import quantile_sketch

    df = spark.createDataFrame(
        [("a", i, i * 10) for i in range(1, 21)], "grp string, id long, v long"
    )
    row = quantile_sketch(df, "grp", "v", "id", k=64).collect()[0]
    assert row["n_rows"] == 20
    assert row["q50_exact"] == 100 and row["q90_exact"] == 180  # ceil(.5*20)=10, ceil(.9*20)=18
    assert row["q50_est"] == row["q50_exact"]
    assert row["q90_est"] == row["q90_exact"]


def test_quantile_sketch_merged_parity_any_partitioning(spark):
    """Above k the sample is proper; the bounded merge form must
    reproduce the twin's estimates bit-exactly at any partitioning."""
    from entity_extractor_spark.operators.sketches import (
        quantile_sketch,
        quantile_sketch_merged,
    )

    df = spark.createDataFrame(
        [(f"g{i % 2}", i, (i * 37) % 500) for i in range(400)],
        "grp string, id long, v long",
    )
    twin = {
        r["grp"]: (r["q50_est"], r["q90_est"])
        for r in quantile_sketch(df, "grp", "v", "id", k=16).collect()
    }
    for parts in (1, 3, 11):
        got = {
            r["grp"]: (r["q50_est"], r["q90_est"])
            for r in quantile_sketch_merged(
                df.repartition(parts), "grp", "v", "id", k=16
            ).collect()
        }
        assert got == twin


def test_quantile_partials_state_is_bounded(spark):
    """The partial stage must emit <= k rows per (partition, group) —
    the bounded-exchange property the 100 TB claim rests on."""
    from entity_extractor_spark.operators.sketches import quantile_partials

    k = 8
    df = spark.createDataFrame(
        [("a", i, i) for i in range(500)], "grp string, id long, v long"
    ).repartition(4)
    out = quantile_partials(df, "grp", "v", "id", k=k).groupBy("grp").count().collect()
    assert out[0]["count"] <= k * 4


# --------------------------------------------------------------------------- weighted reservoir


def test_weighted_sample_naive_parity_and_partitioning(spark):
    """The bounded partial+merge top-k must equal the naive full window
    rank over the same A-Res priority, at any partitioning."""
    from pyspark.sql import Window

    from entity_extractor_spark.operators.sampling import (
        _wrs_base,
        weighted_sample,
    )

    df = spark.createDataFrame(
        [(f"g{i % 3}", i, 1 + (i * 13) % 40) for i in range(300)],
        "grp string, id long, w long",
    )
    base = _wrs_base(df, "grp", "id", "w")
    win = Window.partitionBy("grp").orderBy(F.desc("akey"), "id")
    naive = {
        (r["grp"], r["id"], r["w"])
        for r in base.withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") <= 16)
        .collect()
    }
    for parts in (1, 7):
        got = {
            tuple(r)
            for r in weighted_sample(
                df.repartition(parts), "grp", "id", "w", k=16
            ).collect()
        }
        assert got == naive
        assert len(got) == 3 * 16


def test_weighted_sample_prefers_heavy_rows(spark):
    """A row carrying ~all the group's weight must be sampled; zero/neg
    weights are excluded entirely."""
    from entity_extractor_spark.operators.sampling import weighted_sample

    rows = [("a", i, 1) for i in range(200)] + [
        ("a", 999, 10_000_000),
        ("a", 998, 0),
    ]
    df = spark.createDataFrame(rows, "grp string, id long, w long")
    got = {r["id"] for r in weighted_sample(df, "grp", "id", "w", k=8).collect()}
    assert "999" in got
    assert "998" not in got
    assert len(got) == 8


def test_weighted_sample_heap_tiebreak_matches_merge_order():
    """At an exact akey tie inside one partition's reservoir, eviction
    must keep the SMALLEST id — the row the merge stage's
    (akey DESC, id ASC) rank and the SQL oracle keep. Simulated directly
    against the kernel's heap item ordering (`_RevStr` id wrapper),
    since a real tie needs a 60-bit hash collision."""
    import heapq

    from entity_extractor_spark.operators.sampling import _RevStr

    k = 2
    heap: list = []
    # three rows, identical priority, distinct ids — arrival order mixed
    for akey, rid, w in [(-1.5, "doc_b", 3), (-1.5, "doc_c", 5), (-1.5, "doc_a", 7)]:
        item = (akey, _RevStr(rid), w)
        if len(heap) < k:
            heapq.heappush(heap, item)
        elif item > heap[0]:
            heapq.heappushpop(heap, item)
    survivors = sorted(str(i) for _, i, _w in heap)
    # global rank (akey DESC, id ASC) keeps doc_a, doc_b
    assert survivors == ["doc_a", "doc_b"]
    # a strictly better akey still beats any tie ordering
    item = (-1.0, _RevStr("doc_z"), 1)
    heapq.heappushpop(heap, item) if item > heap[0] else None
    assert any(str(i) == "doc_z" for _, i, _w in heap)


# --------------------------------------------------------------------------- decontamination


def test_contamination_planted_overlap(spark):
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            (1, "we saw the quick brown fox jumps away"),  # shares 4-gram
            (2, "completely unrelated sentence about spark joins"),
            (3, "the quick brown fox jumps over the lazy dog indeed"),  # near copy
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in contamination_report(train, bench, n=4).collect()}
    assert rows[1]["contaminated"] and rows[1]["n_shared_shingles"] == 2
    assert not rows[2]["contaminated"] and rows[2]["n_shared_shingles"] == 0
    assert rows[3]["contaminated"] and rows[3]["n_shared_shingles"] >= 5


def test_contamination_bloom_matches_exact(spark):
    """The Bloom-pruned report must be row-identical to the exact one —
    false positives die in the verify join, true positives can't be
    dropped (the probe sets every bit the build sets). Run it also with
    a pathologically small bitmap (64 bits — near-every-probe-positive)
    to prove saturation degrades only the prune, never the answer."""
    from entity_extractor_spark.operators.decontam import contamination_report_bloom

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            (1, "we saw the quick brown fox jumps away"),
            (2, "completely unrelated sentence about spark joins"),
            (3, "the quick brown fox jumps over the lazy dog indeed"),
        ],
        "doc_id long, text string",
    )
    exact = {
        tuple(r) for r in contamination_report(train, bench, n=4).collect()
    }
    for m_bits in (1 << 17, 64):
        got = {
            tuple(r)
            for r in contamination_report_bloom(
                train, bench, n=4, m_bits=m_bits
            ).collect()
        }
        assert got == exact


# --------------------------------------------------------------------------- heavy hitters


def _naive_heavy(spark, docs, support):
    from pyspark.sql import functions as F

    from entity_extractor_spark.functions import text as T

    toks = docs.select(F.explode(T.tokenize(F.col("text"))).alias("token"))
    n = toks.count()
    return {
        (r["token"], r["cnt"])
        for r in toks.groupBy("token").count().withColumnRenamed("count", "cnt").collect()
        if r["cnt"] >= support * n
    }


def test_heavy_hitters_exact_vs_naive(spark):
    from entity_extractor_spark.operators.sketches import heavy_hitters

    # 40 docs of unique filler + a "hot" token barely above support:
    # with support 0.1 and 9 tokens/doc + hot in 40% of docs, the
    # Misra-Gries summaries must carry "hot" out of at least one partition
    rows = []
    for i in range(40):
        filler = " ".join(f"f{i}x{j}" for j in range(9))
        rows.append((i, filler + (" hot" if i % 5 < 2 else "")))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["token"], r["cnt"]) for r in heavy_hitters(docs, support=0.04).collect()}
    assert got == _naive_heavy(spark, docs, 0.04)
    assert any(t == "hot" for t, _ in got)


def test_heavy_hitters_non_ascii_tokenization(spark):
    """The Python MG candidate pass must tokenize like the JVM recount:
    Java-regex \\w is ASCII, so 'naïve' explodes to ('na', 've'). A
    Unicode-aware Python pass would keep 'naïve' as its candidate and the
    recount join would return NOTHING — silently dropping true heavy
    hitters on any non-ASCII corpus."""
    from entity_extractor_spark.operators.sketches import heavy_hitters

    docs = spark.createDataFrame(
        [(i, "naïve naïve") for i in range(20)], "doc_id long, text string"
    )
    got = {(r["token"], r["cnt"]) for r in heavy_hitters(docs, support=0.4).collect()}
    assert got == {("na", 40), ("ve", 40)}


def test_heavy_hitters_partitioning_invariant(spark):
    from entity_extractor_spark.operators.sketches import heavy_hitters

    rows = [(i, "alpha beta " + " ".join(f"u{i}v{j}" for j in range(6))) for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    r1 = {tuple(r) for r in heavy_hitters(docs.repartition(1), support=0.1).collect()}
    r7 = {tuple(r) for r in heavy_hitters(docs.repartition(7), support=0.1).collect()}
    assert r1 == r7
    assert {t for t, _, _ in r1} == {"alpha", "beta"}


# --------------------------------------------------------------------------- BM25 retrieval


def test_bm25_planted_relevance_and_partitioning(spark):
    """A doc saturated with the query terms must outrank docs with one
    hit; the fixed-point ranking is identical at any partitioning."""
    from entity_extractor_spark.operators.search import bm25_topk

    rows = [
        (1, "spark stream spark stream spark"),      # both terms, high tf
        (2, "spark appears once amid filler words here"),
        (3, "stream appears once amid filler words here"),
        (4, "completely unrelated text about databases"),
    ] + [(10 + i, f"filler doc u{i} v{i} w{i}") for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    res = bm25_topk(docs, [("q", "spark stream")], k=3)
    ranked = [r["doc_id"] for r in res.orderBy("rank").collect()]
    assert ranked[0] == 1
    assert set(ranked) == {1, 2, 3}  # doc 4 and fillers have no query term
    r7 = [
        r["doc_id"]
        for r in bm25_topk(docs.repartition(7), [("q", "spark stream")], k=3)
        .orderBy("rank")
        .collect()
    ]
    assert r7 == ranked


def test_bm25_idf_downweights_common_terms(spark):
    """A term present in every doc contributes ~nothing: a doc matching
    only the rare term must outrank a doc matching only the ubiquitous
    term."""
    from entity_extractor_spark.operators.search import bm25_topk

    rows = [(i, "common filler base words") for i in range(20)]
    rows += [(100, "common rare")] 
    rows += [(101, "rare only doc")]
    rows += [(102, "common only doc")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    res = {
        r["doc_id"]: r["rank"]
        for r in bm25_topk(docs, [("q", "common rare")], k=30).collect()
    }
    assert res[101] < res[102]  # rare-term match beats common-term match


# --------------------------------------------------------------------------- grouped heavy hitters


def test_grouped_heavy_hitters_exact_vs_naive(spark):
    from entity_extractor_spark.functions import text as T
    from entity_extractor_spark.operators.sketches import grouped_heavy_hitters

    rows = []
    for i in range(30):
        rows.append(("en", i, "alpha " + " ".join(f"e{i}x{j}" for j in range(8))))
        rows.append(("de", 100 + i, "beta " + " ".join(f"d{i}x{j}" for j in range(8))))
    docs = spark.createDataFrame(rows, "lang string, doc_id long, text string")
    toks = docs.select("lang", F.explode(T.tokenize(F.col("text"))).alias("token"))
    tot = {r["lang"]: r["n"] for r in toks.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    naive = {
        (r["lang"], r["token"], r["cnt"])
        for r in toks.groupBy("lang", "token").agg(F.count(F.lit(1)).alias("cnt")).collect()
        if r["cnt"] >= 0.1 * tot[r["lang"]]
    }
    for parts in (1, 7):
        got = {
            (r["lang"], r["token"], r["cnt"])
            for r in grouped_heavy_hitters(
                docs.repartition(parts), "lang", support=0.1
            ).collect()
        }
        assert got == naive
    assert ("en", "alpha", 30) in naive and ("de", "beta", 30) in naive


# --------------------------------------------------------------------------- unigram LM


def test_unigram_logprob_known_answer(spark):
    """Hand-computed add-one model: docs ['a a', 'a b'] -> unigrams
    a:3, b:1, N=4, V=2; lp(a)=ln(4/6), lp(b)=ln(2/6)."""
    import math

    from entity_extractor_spark.operators.textstats import ULM_FP, unigram_logprob

    docs = spark.createDataFrame(
        [(1, "a a"), (2, "a b")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in unigram_logprob(docs).collect()}
    lp_a = round(ULM_FP * math.log(4 / 6))
    lp_b = round(ULM_FP * math.log(2 / 6))
    assert rows[1]["n_tokens"] == 2 and rows[1]["sum_lp_fp"] == 2 * lp_a
    assert rows[2]["sum_lp_fp"] == lp_a + lp_b
    assert rows[1]["avg_logprob"] > rows[2]["avg_logprob"]  # typical > rare


# --------------------------------------------------------------------------- KMV overlap


def test_kmv_overlap_identical_disjoint_and_partial(spark):
    """Sketch-algebra estimators: identical slices → jaccard 1.0 and a
    lossless intersection; disjoint slices → 0.0; a planted 50% overlap
    estimates within the bottom-k error bound."""
    from entity_extractor_spark.operators.sketches import kmv_overlap

    rows = []
    rows += [("a", f"v{i}") for i in range(200)]
    rows += [("b", f"v{i}") for i in range(200)]          # identical to a
    rows += [("c", f"w{i}") for i in range(200)]          # disjoint from a
    rows += [("d", f"v{i}") for i in range(100)] + [("d", f"x{i}") for i in range(100)]
    df = spark.createDataFrame(rows, "grp string, val string")
    out = {(r["grp_a"], r["grp_b"]): r for r in kmv_overlap(df, "grp", "val", k=64).collect()}
    ab = out[("a", "b")]
    assert ab["jaccard_est"] == 1.0
    ac = out[("a", "c")]
    assert ac["jaccard_est"] == 0.0 and ac["inter_est"] == 0.0
    ad = out[("a", "d")]
    # true J(a,d) = 100/300 = 0.333; bottom-k at k=64 has stderr ~ 1/sqrt(k)
    assert 0.15 < ad["jaccard_est"] < 0.55
    assert ad["union_est"] > ab["union_est"]  # a∪d is genuinely larger


def test_kmv_overlap_partitioning_invariant(spark):
    from entity_extractor_spark.operators.sketches import kmv_overlap

    rows = [(g, f"{g}{i % 97}") for g in "pq" for i in range(300)]
    df = spark.createDataFrame(rows, "grp string, val string")
    r1 = {tuple(r) for r in kmv_overlap(df.repartition(1), "grp", "val").collect()}
    r7 = {tuple(r) for r in kmv_overlap(df.repartition(7), "grp", "val").collect()}
    assert r1 == r7 and len(r1) == 1


# --------------------------------------------------------------------------- label propagation


def test_lpa_disjoint_cliques_get_distinct_communities(spark):
    """Two disjoint triangles each converge to their smallest member's
    label (deterministic tie rule) — two communities of size 3."""
    from entity_extractor_spark.operators.graph_algos import label_propagation

    tri = lambda a, b, c: [(a, b), (b, c), (a, c)]
    e = _edges(spark, tri("a", "b", "c") + tri("x", "y", "z"))
    rows = {r["node"]: (r["label"], r["community_size"]) for r in label_propagation(e).collect()}
    assert rows == {
        "a": ("a", 3), "b": ("a", 3), "c": ("a", 3),
        "x": ("x", 3), "y": ("x", 3), "z": ("x", 3),
    }


def test_lpa_partitioning_invariant(spark):
    """Integer votes + deterministic ties: the labeling cannot depend on
    how the edge list is partitioned."""
    from entity_extractor_spark.operators.graph_algos import label_propagation

    pairs = [(f"n{i}", f"n{(i * 7 + 3) % 20}") for i in range(40)]
    e1 = _edges(spark, pairs).repartition(1)
    e7 = _edges(spark, pairs).repartition(7)
    r1 = {tuple(r) for r in label_propagation(e1).collect()}
    r7 = {tuple(r) for r in label_propagation(e7).collect()}
    assert r1 == r7 and len(r1) > 0


# --------------------------------------------------------------------------- token entropy


def test_token_entropy_known_values(spark):
    """Hand-computed: 'a a b b' -> ln 2; 'a b c d' -> ln 4; 'a a a' -> 0;
    boilerplate scores strictly below diverse text."""
    import math

    from entity_extractor_spark.operators.textstats import token_entropy

    docs = spark.createDataFrame(
        [(1, "a a b b"), (2, "a b c d"), (3, "a a a")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in token_entropy(docs).collect()}
    # per-term fixed-point rounding carries <= 0.5e-6 error per distinct
    # token — the documented price of the order-independent integer sum
    assert rows[1]["entropy"] == pytest.approx(math.log(2), abs=2e-6)
    assert rows[2]["entropy"] == pytest.approx(math.log(4), abs=3e-6)
    assert rows[3]["entropy"] == 0.0
    assert rows[3]["entropy"] < rows[1]["entropy"] < rows[2]["entropy"]
    assert rows[1]["n_tokens"] == 4
