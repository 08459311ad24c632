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


BM25_K1 = "1.2"  # literal strings: the SAME text is parsed by both engines
BM25_B = "0.75"
BM25_FP = 1_000_000  # fixed-point scale for the per-term contribution

# Lucene-form BM25 per-(query term, doc) contribution, fixed-point-rounded
# to an int64 so the per-document SUM is integer — partition-order
# independent and bit-identical cross-engine. The expression TEXT is shared
# verbatim between the Spark plan (F.expr) and the DuckDB oracle, so both
# engines build the same double-arithmetic tree from the same int inputs;
# rounding half-up == half-away here because contributions are >= 0.
_BM25_CONTRIB = (
    f"CAST(round({BM25_FP} * ("
    f"ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))"
    f" * (tf * ({BM25_K1} + 1.0))"
    f" / (tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * dl / avgdl))"
    f")) AS BIGINT)"
)


def bm25_topk(
    docs: DataFrame,
    queries: list[tuple[str, str]],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 ranked retrieval: top-k documents per query (k1=1.2, b=0.75,
    Lucene idf ln(1 + (N-df+0.5)/(df+0.5))) — the ranked form of the P5
    search path, over the same token postings the index suite
    materializes.

    Scale shape: the query vocabulary is a LITERAL list, so the token
    explode is filtered map-side before any shuffle — the only exchanges
    carry (doc, query-term) postings, never the full vocabulary; doc
    length is a codegen `size(tokenize())` (no second explode); corpus
    stats (N, total length -> avgdl) ride a broadcast one-row aggregate;
    df-per-term and the final per-query top-k are aggregations over the
    tiny query-term slice. Scores are fixed-point int64 (contribution
    rounded at 1e-6 then integer-summed), so ranking is deterministic
    under any partitioning and hash-verifiable against the oracle
    (:func:`bm25_topk_sql` shares the contribution expression text
    verbatim).

    Reference basis: the reference's search is an unranked contains scan
    (`search_term.py:40-53`); BM25 is the standard ranked upgrade a
    retrieval surface needs at corpus scale.
    """
    import re as _re

    from entity_extractor_spark.functions.text import TOKEN_RE, tokenize

    tok_re = _re.compile(TOKEN_RE, _re.ASCII)
    qrows = [
        (qid, t) for qid, qtext in queries for t in sorted(set(tok_re.findall(qtext.lower())))
    ]
    qterms = docs.sparkSession.createDataFrame(qrows, "query_id string, token string")
    qtokens = sorted({t for _, t in qrows})

    toks = docs.select(
        F.col(id_col),
        F.size(tokenize(F.col(text_col))).alias("dl"),
        F.explode(tokenize(F.col(text_col))).alias("token"),
    ).filter(F.col("token").isin(qtokens))
    tf = toks.groupBy(id_col, "dl", "token").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    stats = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (
            F.sum(F.size(tokenize(F.col(text_col)))).cast("double")
            / F.count(F.lit(1))
        ).alias("avgdl"),
    )
    scored = (
        tf.join(F.broadcast(df_), "token")
        .join(F.broadcast(qterms), "token")
        .crossJoin(F.broadcast(stats))
        .withColumn("contrib_fp", F.expr(_BM25_CONTRIB))
        .groupBy("query_id", id_col)
        .agg(F.sum("contrib_fp").alias("score_fp"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("score_fp"), id_col)
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("int").alias("rank"), id_col, "score_fp")
    )


def bm25_topk_sql(
    queries: list[tuple[str, str]], k: int = 10, rel: str = "documents"
) -> str:
    """DuckDB twin of :func:`bm25_topk` — same tokenizer, same literal
    query-term rows, same fixed-point contribution expression text."""
    import re as _re

    from entity_extractor_spark.functions.text import TOKEN_RE, tokenize_sql

    tok_re = _re.compile(TOKEN_RE, _re.ASCII)
    # query ids are caller-supplied strings — escape embedded quotes
    # (tokens are tokenizer output and cannot contain quotes).
    qvals = ", ".join(
        f"""('{qid.replace("'", "''")}', '{t}')"""
        for qid, qtext in queries
        for t in sorted(set(tok_re.findall(qtext.lower())))
    )
    toks = tokenize_sql("text")
    return f"""WITH _bm_q(query_id, token) AS (VALUES {qvals}),
        _bm_t AS (
          SELECT doc_id, len({toks}) AS dl, unnest({toks}) AS token FROM {rel}
        ),
        _bm_tf AS (
          SELECT doc_id, dl, token, count(*) AS tf FROM _bm_t
          WHERE token IN (SELECT DISTINCT token FROM _bm_q)
          GROUP BY doc_id, dl, token
        ),
        _bm_df AS (SELECT token, count(*) AS df FROM _bm_tf GROUP BY token),
        _bm_s AS (
          SELECT count(*) AS n_docs,
                 CAST(sum(len({toks})) AS DOUBLE) / count(*) AS avgdl
          FROM {rel}
        ),
        _bm_c AS (
          SELECT q.query_id, f.doc_id,
                 {_BM25_CONTRIB} AS contrib_fp
          FROM _bm_tf f
          JOIN _bm_df USING (token)
          JOIN _bm_q q USING (token), _bm_s
        ),
        _bm_sc AS (
          SELECT query_id, doc_id, CAST(sum(contrib_fp) AS BIGINT) AS score_fp
          FROM _bm_c GROUP BY query_id, doc_id
        ),
        _bm_r AS (
          SELECT query_id, doc_id, score_fp,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY score_fp DESC, doc_id) AS rank
          FROM _bm_sc
        )
        SELECT query_id, CAST(rank AS INTEGER) AS rank, doc_id, score_fp
        FROM _bm_r WHERE rank <= {k}"""


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
