"""S1/F17 ingestion semantics: malformed-JSONL tolerance, polymorphic
title coercion, transcript adapters, and the interactive SQL surface."""

from __future__ import annotations

from pyspark.sql import functions as F

from entity_extractor_spark.io.sources import (
    documents_as_transcripts,
    read_jsonl_corpus,
    register_views,
)


def test_jsonl_corpus_polymorphic_title_and_malformed(spark, tmp_path):
    lines = [
        '{"bibcode": "B1", "title": "Plain String", "abstract": "a", "body": "b"}',
        '{"bibcode": "B2", "title": ["List", "Of", "Words"], "abstract": "a2"}',
        '{"bibcode": "B3", "title": null, "body": "only body"}',
        "this is not json at all {{{",
        '{"title": "no bibcode -> dropped"}',
        '{"bibcode": "", "title": "empty bibcode -> dropped"}',
    ]
    p = tmp_path / "corpus.jsonl"
    p.write_text("\n".join(lines))
    df = read_jsonl_corpus(spark, str(p))
    rows = {r["bibcode"]: r for r in df.collect()}
    # malformed + keyless lines silently dropped (batch_filter.py:20-24 semantics)
    assert set(rows) == {"B1", "B2", "B3"}
    assert rows["B1"]["title"] == "Plain String"
    assert rows["B2"]["title"] == "List Of Words"  # array -> space-joined (F17)
    assert rows["B3"]["title"] == ""  # null -> empty string
    assert rows["B3"]["body"] == "only body"
    assert rows["B2"]["body"] == ""


def test_documents_as_transcripts_deterministic(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    t1 = documents_as_transcripts(docs, convs=50).orderBy("conv_id", "turn_idx").collect()
    t2 = documents_as_transcripts(docs, convs=50).orderBy("conv_id", "turn_idx").collect()
    assert t1 == t2
    assert {r["role"] for r in t1} <= {"user", "assistant", "es", "fr", "zh"}
    schema = {f.name: f.dataType.simpleString() for f in
              documents_as_transcripts(docs).schema.fields}
    assert schema == {
        "conv_id": "string", "turn_idx": "int", "role": "string",
        "text": "string", "tool": "string", "ts": "timestamp",
    }


def test_sql_surface_over_materialized_tables(spark):
    """The dashboard query path (SURVEY §3.3) as plain spark.sql."""
    import pandas as pd

    from entity_extractor_spark.operators.mentions import extract_mentions
    from entity_extractor_spark.synth import SynthConfig, make_gazetteer, make_transcripts, to_spark

    cfg = SynthConfig(seed=3, n_terms=8, n_convs=10, hot_conv_factor=3)
    gaz = make_gazetteer(cfg)
    t = to_spark(spark, make_transcripts(cfg, gaz))
    register_views(spark, {"transcripts_v": t, "mentions_v": extract_mentions(t, gaz)})
    # P5-style search + A3 value-counts, straight SQL
    out = spark.sql(
        """
        SELECT term_id, COUNT(*) AS n FROM mentions_v
        WHERE lower(context) LIKE '%the%'
        GROUP BY term_id ORDER BY n DESC, term_id LIMIT 5
        """
    ).collect()
    assert len(out) >= 1
    joined = spark.sql(
        """
        SELECT m.term_id, COUNT(DISTINCT t.conv_id) AS n_convs
        FROM mentions_v m JOIN transcripts_v t USING (conv_id, turn_idx)
        GROUP BY m.term_id
        """
    )
    assert joined.count() >= 1


def test_range_clustered_layout_is_prunable(spark, tmp_path):
    """write_range_clustered must produce files whose doc_id footer
    ranges are pairwise DISJOINT (verified from the real parquet
    metadata) — the property that lets min/max stats skip whole files
    for a range predicate — and a point filter must reach the scan as a
    pushed filter."""
    import glob

    import pyarrow.parquet as pq

    from entity_extractor_spark.io.sinks import write_range_clustered

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    out = str(tmp_path / "clustered")
    write_range_clustered(d, out, ["doc_id"], n_files=8)

    ranges = []
    for f in glob.glob(f"{out}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        lo = min(
            md.row_group(i).column(0).statistics.min for i in range(md.num_row_groups)
        )
        hi = max(
            md.row_group(i).column(0).statistics.max for i in range(md.num_row_groups)
        )
        ranges.append((lo, hi))
    assert len(ranges) >= 2  # the range partitioner actually split
    ranges.sort()
    for (_, hi_prev), (lo_next, _) in zip(ranges, ranges[1:]):
        assert hi_prev < lo_next, f"overlapping file ranges: {ranges}"

    plan = (
        spark.read.parquet(out)
        .filter("doc_id = 7")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(doc_id), EqualTo(doc_id,7)]" in plan, plan


def test_gram_postings_range_clustered_prunes_files(spark, tmp_path):
    """P5's scale path tied to S2's layout (round-3 verdict item 7): the
    trigram posting table written via write_range_clustered(gram) must
    yield pairwise-disjoint per-file gram ranges (real parquet footers),
    a query's gram probe must touch a strict subset of the files, and
    reading ONLY those files must return exactly the probe's postings —
    making 'bucketed by gram at scale' measured instead of asserted."""
    import glob

    import pyarrow.parquet as pq

    from entity_extractor_spark.io.sinks import write_range_clustered
    from entity_extractor_spark.operators.search import build_gram_postings

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    out = str(tmp_path / "postings")
    write_range_clustered(build_gram_postings(docs), out, ["gram"], n_files=8)

    files = {}
    for f in glob.glob(f"{out}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        gi = next(
            i for i in range(md.num_columns)
            if md.row_group(0).column(i).path_in_schema == "gram"
        )
        st = [md.row_group(r).column(gi).statistics for r in range(md.num_row_groups)]
        files[f] = (min(s.min for s in st), max(s.max for s in st))
    assert len(files) >= 2
    ranges = sorted(files.values())
    for (_, hi_prev), (lo_next, _) in zip(ranges, ranges[1:]):
        assert hi_prev <= lo_next, f"overlapping gram ranges: {ranges}"

    # a 'spark' probe reads only the files whose footer range can hold
    # one of its grams — a strict subset at 8 files
    grams = sorted({"spark"[i : i + 3] for i in range(3)})
    cand = [f for f, (lo, hi) in files.items() if any(lo <= g <= hi for g in grams)]
    assert 0 < len(cand) < len(files), (grams, files)

    full = {
        (r["doc_id"], r["gram"])
        for r in spark.read.parquet(out).filter(F.col("gram").isin(grams)).collect()
    }
    pruned = {
        (r["doc_id"], r["gram"])
        for r in spark.read.parquet(*cand).filter(F.col("gram").isin(grams)).collect()
    }
    assert pruned == full and len(full) > 0

    # and the gram predicate reaches the scan (file+row-group pruning)
    plan = (
        spark.read.parquet(out)
        .filter(F.col("gram").isin(grams))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [In(gram" in plan, plan


def test_char_ngrams_short_texts_emit_no_postings(spark):
    """Texts shorter than n must contribute ZERO posting rows: Spark's
    sequence(1, 0) is descending [1, 0], which (ungated) emits junk grams
    ('' for empty text, the whole text for len < n)."""
    from entity_extractor_spark.operators.search import build_gram_postings

    docs = spark.createDataFrame(
        [(1, ""), (2, "ab"), (3, None), (4, "abc")],
        "doc_id long, text string",
    )
    rows = build_gram_postings(docs).collect()
    assert {(r["doc_id"], r["gram"]) for r in rows} == {(4, "abc")}


def test_indexed_search_equals_naive_scan(spark):
    """The gram index is a pruner only: result set must equal the naive
    contains scan, including case folding, dedup'd query grams, and
    boundary matches."""
    from pyspark.sql import functions as F

    from entity_extractor_spark.operators.search import (
        build_gram_postings,
        indexed_substring_search,
    )

    docs = spark.createDataFrame(
        [
            (1, "HASH JOIN strategies"),       # case-folded hit
            (2, "hash joins and more"),        # hit inside a longer word
            (3, "hash, join"),                 # grams present, phrase absent
            (4, "aaaa"),                       # repeated-gram probe target
            (5, "aaab"),                       # shares gram 'aaa', not 'aaaa'
            (6, None),                         # null text must not crash
        ],
        "doc_id long, text string",
    )
    idx = build_gram_postings(docs)
    for q in ("hash join", "aaaa", "AAAB"):
        via_index = {
            r["doc_id"]
            for r in indexed_substring_search(docs, q, postings=idx).collect()
        }
        naive = {
            r["doc_id"]
            for r in docs.filter(F.lower(F.col("text")).contains(q.lower())).collect()
        }
        assert via_index == naive, (q, via_index, naive)


def test_write_zorder_clustered_prunes_both_dimensions(spark, tmp_path):
    """Z-order layout (S2's two-column generalization): on a 64x64
    (x, y) grid split into 8 files, the per-file footer bounding boxes
    must let a thin y-band query skip at least a quarter of the files —
    while the 1-D x-range layout spans the full y domain in EVERY file
    and can skip none. x-point queries prune under both layouts."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from entity_extractor_spark.io.sinks import write_range_clustered, write_zorder_clustered

    grid = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
    )

    def boxes(path):
        out = []
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            cols = {
                md.row_group(0).column(i).path_in_schema: i
                for i in range(md.num_columns)
            }
            st = lambda ci: [
                md.row_group(r).column(ci).statistics for r in range(md.num_row_groups)
            ]
            sx, sy = st(cols["x"]), st(cols["y"])
            out.append(
                (
                    min(s.min for s in sx), max(s.max for s in sx),
                    min(s.min for s in sy), max(s.max for s in sy),
                )
            )
        return out

    zpath, rpath = str(tmp_path / "z"), str(tmp_path / "r")
    write_zorder_clustered(grid, zpath, "x", "y", n_files=8, bits=6)
    write_range_clustered(grid, rpath, ["x"], n_files=8)
    zb, rb = boxes(zpath), boxes(rpath)
    assert len(zb) >= 4 and len(rb) >= 4

    def admits_yband(box, lo, hi):
        _, _, ylo, yhi = box
        return not (yhi < lo or ylo > hi)

    # thin y band: y in [0, 7]
    z_hit = sum(admits_yband(b, 0, 7) for b in zb)
    r_hit = sum(admits_yband(b, 0, 7) for b in rb)
    assert r_hit == len(rb)  # 1-D layout: every file spans all y
    assert z_hit <= 3 * len(zb) // 4  # z-order: the band skips >= 1/4 of files

    # x-point query prunes under BOTH layouts
    x_hit_z = sum(1 for (xlo, xhi, _, _) in zb if xlo <= 13 <= xhi)
    x_hit_r = sum(1 for (xlo, xhi, _, _) in rb if xlo <= 13 <= xhi)
    assert x_hit_z < len(zb)
    assert x_hit_r <= 2

    # the layout is only placement: content round-trips exactly
    assert spark.read.parquet(zpath).count() == 64 * 64
