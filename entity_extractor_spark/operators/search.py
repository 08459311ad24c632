"""Indexed substring search: the reference's dashboard text search
(`search_term.py:40-53`, SURVEY P5) made 100 TB-shaped.

The reference (and the `substring_search` contract key) scans every
document with ``contains`` — fine per-query on one node, wrong as the
steady-state access path for interactive search over 10^12 rows. The
scalable form is a character-n-gram POSTING table (gram -> doc ids,
materialized once, bucketed by gram — Iceberg at scale): a query then
reads only its own grams' postings, intersects them (a doc must contain
EVERY query gram to contain the query), and verifies the survivors with
``contains``. The gram filter is purely a PRUNER — the verify step makes
the result set identical to the naive scan, which is why the DuckDB
oracle for `indexed_substring_search` is the ground-truth LIKE scan and
the hash match proves the index path lossless.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NGRAM_N = 3


def char_ngrams(col_name: str, n: int = NGRAM_N) -> F.Column:
    """Distinct lowercased character n-grams of a STRING COLUMN NAME.

    Takes a column name (not an expression) on purpose: the slicing
    happens inside a transform lambda, and a lambda-body expression
    re-evaluates per element (see functions/text.py:word_shingles) — an
    attribute reference is the safe cheap case. The lower() wrapper is
    applied per gram, post-slice, where it touches n chars, not the
    document."""
    t = F.col(col_name)
    # Guard texts shorter than n explicitly: Spark's sequence(1, 0) is
    # DESCENDING [1, 0] (auto step -1), which would emit junk sub-n grams
    # ('' for empty text, the whole text for len < n) into the posting
    # table instead of no grams at all.
    return F.when(
        F.length(t) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.length(t) - F.lit(n - 1)),
                lambda i: F.lower(t.substr(i, F.lit(n))),
            )
        ),
    ).otherwise(F.expr("array()").cast("array<string>"))


def build_gram_postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = NGRAM_N
) -> DataFrame:
    """(gram, id) posting table — the materialize-once index side. At
    scale this is written via ``io.sinks.write_range_clustered(gram)``
    so every file covers a disjoint gram range and a query's posting
    reads skip whole files on footer min/max — footer-verified in
    tests/test_sources.py::test_gram_postings_range_clustered_prunes_files."""
    return docs.select(
        F.col(id_col), F.explode(char_ngrams(text_col, n)).alias("gram")
    )


def indexed_substring_search(
    docs: DataFrame,
    query: str,
    postings: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = NGRAM_N,
) -> DataFrame:
    """Case-insensitive substring search through the gram index.

    ``postings`` is the precomputed :func:`build_gram_postings` table
    (pass it to model the materialized-index access path — only the
    query's grams are read); when omitted it is derived inline, which
    still prunes the verify step to gram-candidates. Queries shorter
    than ``n`` fall back to the plain scan (no gram covers them).
    Returns the matching rows of ``docs``, result-identical to
    ``lower(text) CONTAINS lower(query)`` by construction.
    """
    q = query.lower()
    grams = sorted({q[i : i + n] for i in range(len(q) - n + 1)})
    verified = F.lower(F.col(text_col)).contains(q)
    if not grams:
        return docs.filter(verified)
    if postings is None:
        postings = build_gram_postings(docs, id_col, text_col, n)
    cand = (
        postings.filter(F.col("gram").isin(grams))
        .groupBy(id_col)
        .agg(F.countDistinct("gram").alias("_k"))
        .filter(F.col("_k") == len(grams))
        .select(id_col)
    )
    return docs.join(cand, id_col, "left_semi").filter(verified)
