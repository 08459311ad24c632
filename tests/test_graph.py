"""Canonicalization CC, predicate triples, and skew-safe graph builds."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from entity_extractor_spark.operators.canonicalize import (
    alias_edges,
    canonical_entities,
    connected_components,
)
from entity_extractor_spark.operators.graph import build_edges, build_nodes, salted_count
from entity_extractor_spark.operators.mentions import extract_mentions
from entity_extractor_spark.operators.predicates import (
    all_triples,
    co_mention_triples,
    replies_to_triples,
    uses_tool_triples,
)
from entity_extractor_spark.synth import SynthConfig, make_gazetteer, make_transcripts, to_spark


def test_connected_components_chain_and_star(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y"), ("x", "z"), ("q", "q")],
        "src string, dst string",
    )
    got = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "d": "a", "x": "x", "y": "x", "z": "x", "q": "q"}


def test_canonical_entities_groups_variants(spark):
    gaz = spark.createDataFrame(
        pd.DataFrame(
            {
                "term_id": ["t1", "t2", "t3"],
                "title": ["Zorplex: a tool", "ZORPLEX-2: same family", "Quantix: other"],
                "aliases": [["zorplex", "ZORPLEX"], ["Zorplex"], ["QUANTIX"]],
            }
        )
    )
    m = {r["term_id"]: r["entity_id"] for r in canonical_entities(gaz).collect()}
    # t1 and t2 share the alias surface "zorplex" -> same component; t3 separate
    assert m["t1"] == m["t2"]
    assert m["t3"] != m["t1"]


def test_predicate_triples(spark):
    pdf = pd.DataFrame(
        {
            "conv_id": ["c1"] * 4,
            "turn_idx": pd.array([0, 1, 2, 3], dtype="int32"),
            "role": ["user", "assistant", "tool", "assistant"],
            "text": ["hi", "let me check", "result", "done"],
            "tool": [None, None, "search", None],
            "ts": pd.to_datetime(["2026-01-01"] * 4),
        }
    )
    t = to_spark(spark, pdf)
    uses = uses_tool_triples(t).collect()
    assert len(uses) == 1 and uses[0]["subj"] == "c1:1" and uses[0]["obj"] == "tool:search"
    replies = {(r["subj"], r["obj"]) for r in replies_to_triples(t).collect()}
    assert replies == {("c1:1", "c1:0")}


def test_co_mentions_and_all_triples(spark):
    cfg = SynthConfig(seed=11, n_terms=10, n_convs=15, hot_conv_factor=5)
    gaz = make_gazetteer(cfg)
    tr = to_spark(spark, make_transcripts(cfg, gaz))
    mentions = extract_mentions(tr, gaz)
    gaz_df = to_spark(spark, gaz, gaz=True)
    emap = canonical_entities(gaz_df)
    triples = all_triples(tr, mentions, emap)
    preds = {r["pred"] for r in triples.select("pred").distinct().collect()}
    assert {"mentions", "uses_tool", "replies_to", "co_mentions"} <= preds
    co = co_mention_triples(mentions, emap)
    bad = co.filter(F.col("subj") >= F.col("obj")).count()
    assert bad == 0  # unordered pair canonical form


def test_co_mention_pairs_exact(spark):
    """Grouped pair expansion: exact pair set, i<j ordering, and
    entity-map collapse (two terms -> one entity yields no self-pair)."""
    m = spark.createDataFrame(
        [("c1", 0, "A"), ("c1", 0, "B"), ("c1", 0, "C"), ("c1", 1, "A"), ("c2", 0, "B")],
        "conv_id string, turn_idx int, term_id string",
    )
    got = {
        (r["subj"], r["obj"], r["conv_id"], r["turn_idx"])
        for r in co_mention_triples(m).collect()
    }
    assert got == {("A", "B", "c1", 0), ("A", "C", "c1", 0), ("B", "C", "c1", 0)}
    emap = spark.createDataFrame(
        [("B", "X"), ("C", "X")], "term_id string, entity_id string"
    )
    got2 = {(r["subj"], r["obj"]) for r in co_mention_triples(m, emap).collect()}
    assert got2 == {("A", "X")}


def test_salted_count_equals_plain_groupby(spark):
    # skewed: one hot key with 5000 rows, 50 cold keys
    rows = [("hot",)] * 5000 + [(f"k{i}",) for i in range(50)]
    df = spark.createDataFrame(rows, "k string").repartition(8)
    got = {r["k"]: r["weight"] for r in salted_count(df, ["k"]).collect()}
    exp = {r["k"]: r["cnt"] for r in df.groupBy("k").agg(F.count("*").alias("cnt")).collect()}
    assert got == exp


def test_build_nodes_and_edges(spark):
    cfg = SynthConfig(seed=13, n_terms=8, n_convs=10, hot_conv_factor=3)
    gaz = make_gazetteer(cfg)
    tr = to_spark(spark, make_transcripts(cfg, gaz))
    mentions = extract_mentions(tr, gaz)
    triples = all_triples(tr, mentions)
    edges = build_edges(triples)
    nodes = build_nodes(triples)
    assert edges.filter(F.col("weight") < 1).count() == 0
    kinds = {r["kind"] for r in nodes.select("kind").distinct().collect()}
    assert "turn" in kinds and "entity" in kinds
    # every edge endpoint is a node
    n_ids = nodes.select(F.col("node_id").alias("x"))
    dangling = (
        edges.select(F.col("src").alias("x"))
        .union(edges.select(F.col("dst").alias("x")))
        .distinct()
        .join(n_ids, "x", "left_anti")
        .count()
    )
    assert dangling == 0


def test_build_nodes_from_edges_identical(spark):
    """The edges-derived node build (pipeline fast path) must produce
    exactly the triple-derived node table — same ids, kinds, counts."""
    cfg = SynthConfig(seed=13, n_terms=8, n_convs=10, hot_conv_factor=3)
    gaz = make_gazetteer(cfg)
    tr = to_spark(spark, make_transcripts(cfg, gaz))
    triples = all_triples(tr, extract_mentions(tr, gaz))
    edges = build_edges(triples)
    a = sorted(map(tuple, build_nodes(triples).collect()))
    b = sorted(map(tuple, build_nodes(triples, edges=edges).collect()))
    assert a == b


def test_connected_components_long_chain(spark):
    """Pointer jumping: a 300-node chain must converge well inside
    max_iter=25 (O(log n)), with every node labeled by the chain head —
    asserted STRUCTURALLY via the telemetry round count, so an
    O(diameter) regression fails the bound, not a wall-clock timeout."""
    tel: dict = {}
    edges = spark.createDataFrame(
        [(f"n{i:04d}", f"n{i+1:04d}") for i in range(299)], "src string, dst string"
    )
    got = {
        r["node"]: r["component"]
        for r in connected_components(edges, telemetry=tel).collect()
    }
    assert len(got) == 300
    assert set(got.values()) == {"n0000"}
    assert tel["converged"]
    # one neighbor hop + one pointer jump per round: reach d_r = 2*d_{r-1}+1
    # = 2^r - 1, so a 299-edge chain needs ceil(log2(300+1)) = 9 rounds
    # (measured: 9); +1 slack. An O(diameter) regression would need ~300.
    assert tel["rounds"] <= 10, tel


def test_connected_components_skewed_component(spark):
    """Adversarial-scale CC fixture (round-3 VERDICT item 8): one skewed
    component holding 30% of all nodes (a hub-and-chains 'broom' — hot
    entity with many long alias chains), the rest small components.
    Asserts (a) exact result parity with a DuckDB recursive-CTE
    transitive-closure oracle and (b) the pointer-jumping round bound
    rounds <= ceil(log2(skew component size)) + 2 — guarding the one
    driver-side loop in the engine against an O(diameter) regression."""
    import math

    import duckdb

    edges_py: list[tuple[str, str]] = []
    # skewed component: hub + 50 chains x 30 nodes = 1501 nodes (30% of ~5000)
    for c in range(50):
        prev = "hub"
        for i in range(30):
            node = f"s{c:02d}x{i:02d}"
            edges_py.append((prev, node))
            prev = node
    # 1166 small 3-node components -> 3498 nodes
    for g in range(1166):
        edges_py.append((f"g{g:04d}a", f"g{g:04d}b"))
        edges_py.append((f"g{g:04d}b", f"g{g:04d}c"))
    edges = spark.createDataFrame(edges_py, "src string, dst string")

    tel: dict = {}
    got = {
        r["node"]: r["component"]
        for r in connected_components(edges, telemetry=tel).collect()
    }
    n_skew = 1 + 50 * 30
    assert len(got) == n_skew + 3 * 1166
    assert tel["converged"]
    assert tel["rounds"] <= math.ceil(math.log2(n_skew)) + 2, tel

    con = duckdb.connect()
    con.execute("CREATE TABLE e (a VARCHAR, b VARCHAR)")
    con.executemany("INSERT INTO e VALUES (?, ?)", edges_py)
    oracle = dict(
        con.execute(
            """
            WITH RECURSIVE sym AS (
              SELECT a, b FROM e UNION SELECT b, a FROM e
            ), reach(node, label) AS (
              SELECT a, a FROM sym
              UNION
              SELECT s.b, r.label FROM reach r JOIN sym s ON s.a = r.node
            )
            SELECT node, min(label) FROM reach GROUP BY node
            """
        ).fetchall()
    )
    assert got == oracle


def test_salted_collect_list_matches_plain(spark):
    from entity_extractor_spark.operators.graph import salted_collect_list

    rows = [("hot", i % 7) for i in range(3000)] + [(f"k{i}", i) for i in range(20)]
    df = spark.createDataFrame(rows, "k string, v int").repartition(8)
    got = {r["k"]: list(r["vs"]) for r in salted_collect_list(df, ["k"], "v").collect()}
    exp = {
        r["k"]: sorted(r["vs"])
        for r in df.groupBy("k").agg(F.collect_list("v").alias("vs")).collect()
    }
    assert got == exp
    # arrays come out sorted (the property that makes the merge associative)
    assert all(v == sorted(v) for v in got.values())


def test_fuzzy_alias_pairs_edit_classes(spark):
    """Deletion-neighborhood blocking finds all three ed-1 edit classes
    (deletion, insertion, substitution), rejects ed-2, and the hot-block
    guard drops pairs only when enabled."""
    from entity_extractor_spark.operators.canonicalize import fuzzy_alias_pairs

    names = spark.createDataFrame(
        [
            (1, "spark"),   # vs spark_ (insertion), spark->spak (deletion)
            (2, "spak"),    # deletion of 'r'
            (3, "sparks"),  # insertion of 's'
            (4, "snark"),   # substitution p->n... ed("spark","snark")=1
            (5, "zzzzz"),   # unrelated
            (6, "spark"),   # exact duplicate (ed 0)
        ],
        "id long, name string",
    )
    out = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in fuzzy_alias_pairs(names).collect()
    }
    assert out[(1, 2)] == 1  # deletion
    assert out[(1, 3)] == 1  # insertion
    assert out[(1, 4)] == 1  # substitution
    assert out[(1, 6)] == 0  # exact dup
    assert (2, 3) not in out  # ed("spak","sparks")=2
    assert not any(5 in k for k in out)
    # guard: with max_block=1 every shared variant block is dropped
    from entity_extractor_spark.operators.canonicalize import fuzzy_alias_pairs as fap
    assert fap(names, max_block=1).count() == 0
