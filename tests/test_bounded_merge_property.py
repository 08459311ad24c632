"""Property-based parity for the bounded-merge operators: on arbitrary
inputs and partitionings, the scale-shaped form (per-partition bounded
state + one merge) must equal its naive full-materialization twin —
the losslessness claim each operator's 100 TB story rests on, hammered
with randomized data instead of one fixture.

Spark jobs per example are small but not free, so example counts are
modest (the fixture-based tests plus the DuckDB contract keys carry
the deterministic coverage; these runs explore the input space)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

rows_strategy = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),          # group
        st.integers(min_value=0, max_value=10_000),  # value
    ),
    min_size=1,
    max_size=60,
)


@settings(**_SETTINGS)
@given(rows=rows_strategy, parts=st.integers(min_value=1, max_value=5))
def test_quantile_merge_equals_twin_on_random_data(spark, rows, parts):
    from entity_extractor_spark.operators.sketches import (
        quantile_sketch,
        quantile_sketch_merged,
    )

    df = spark.createDataFrame(
        [(g, i, v) for i, (g, v) in enumerate(rows)], "grp string, id long, v long"
    )
    twin = {
        r["grp"]: (r["q50_est"], r["q90_est"])
        for r in quantile_sketch(df, "grp", "v", "id", k=8).collect()
    }
    merged = {
        r["grp"]: (r["q50_est"], r["q90_est"])
        for r in quantile_sketch_merged(
            df.repartition(parts), "grp", "v", "id", k=8
        ).collect()
    }
    assert merged == twin


@settings(**_SETTINGS)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.integers(min_value=1, max_value=500),  # weight > 0
        ),
        min_size=1,
        max_size=60,
    ),
    parts=st.integers(min_value=1, max_value=5),
)
def test_weighted_sample_equals_window_rank_on_random_weights(spark, rows, parts):
    from entity_extractor_spark.operators.sampling import _wrs_base, weighted_sample

    df = spark.createDataFrame(
        [(g, i, w) for i, (g, w) in enumerate(rows)], "grp string, id long, w long"
    )
    base = _wrs_base(df, "grp", "id", "w")
    win = Window.partitionBy("grp").orderBy(F.desc("akey"), "id")
    naive = {
        (r["grp"], r["id"], r["w"])
        for r in base.withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") <= 5)
        .collect()
    }
    got = {
        tuple(r)
        for r in weighted_sample(df.repartition(parts), "grp", "id", "w", k=5).collect()
    }
    assert got == naive


@settings(**_SETTINGS)
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from("abcdef"), min_size=3, max_size=10
        ).map(lambda ws: " ".join(ws)),
        min_size=2,
        max_size=12,
    )
)
def test_prefix_jaccard_equals_naive_on_random_docs(spark, docs):
    """Tiny 6-word vocabulary forces heavy shingle overlap — the
    adversarial case for prefix-filter losslessness."""
    from entity_extractor_spark.operators.dedup import (
        ngram_jaccard_pairs,
        prefix_jaccard_pairs,
    )

    df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    got = {
        (r["i"], r["j"]): r["jaccard"]
        for r in prefix_jaccard_pairs(df, t_num=1, t_den=2).collect()
    }
    naive = {
        (r["i"], r["j"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, threshold=0.0).collect()
        if r["jaccard"] >= 0.5
    }
    assert got == naive


@settings(**_SETTINGS)
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from("abcdef"), min_size=3, max_size=10
        ).map(lambda ws: " ".join(ws)),
        min_size=2,
        max_size=12,
    ),
    cap=st.integers(min_value=1, max_value=6),
)
def test_prefix_jaccard_cap_matches_mirrored_oracle(spark, docs, cap):
    """With max_prefix_df set, the engine's recall cut must equal the
    capped SQL mirror EXACTLY on arbitrary corpora — same shingle df
    ranking, same prefix boundary, same cap — for every cap value from
    always-binding (1) to never-binding."""
    import duckdb

    from entity_extractor_spark.operators.dedup import (
        prefix_jaccard_pairs,
        prefix_jaccard_pairs_sql,
    )

    df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    got = {
        (r["i"], r["j"], r["jaccard"])
        for r in prefix_jaccard_pairs(df, t_num=1, t_den=2, max_prefix_df=cap).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in enumerate(docs))
        + ") AS v(doc_id, text)"
    )
    ora = {
        (r[0], r[1], r[2])
        for r in con.execute(
            prefix_jaccard_pairs_sql("documents", t_num=1, t_den=2, max_prefix_df=cap)
        ).fetchall()
    }
    assert got == ora


def test_weighted_sample_tie_eviction_matches_global_rank(spark, monkeypatch):
    """The ADVICE-flagged boundary: an exact akey tie between distinct
    ids at the reservoir boundary. Real ties need a 60-bit hash
    collision, so force one by pinning the priority to a constant —
    EVERY row then ties, and partition-local eviction (k=2, 6 rows per
    partition) must keep the same ids the global (akey DESC, id ASC)
    rank keeps: the lexicographically SMALLEST. Before the _RevStr fix
    the partition heap kept the largest ids and this test goes red."""
    from entity_extractor_spark.operators import sampling

    monkeypatch.setattr(sampling, "_ares_key", lambda h, w: F.lit(0.0))
    rows = [("g", f"id{i:02d}", 10) for i in range(12)] + [
        ("h", f"id{i:02d}", 3) for i in range(7)
    ]
    df = spark.createDataFrame(rows, "grp string, id string, w long")
    got = {
        (r["grp"], r["id"])
        for r in sampling.weighted_sample(
            df.repartition(2), "grp", "id", "w", k=2
        ).collect()
    }
    assert got == {
        ("g", "id00"), ("g", "id01"), ("h", "id00"), ("h", "id01"),
    }
