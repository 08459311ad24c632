"""Deduplication suite for training-data pipelines over the documents table.

The reference's only dedup is exact — SQLite ``UNIQUE(bibcode,label,
context)`` (`software_mentions_pipeline/load_inputs.py:27-40`) and pandas
``drop_duplicates`` (`core_pipeline/batch_filter.py:166-170`). A 100 TB
corpus pipeline also needs *near*-dup detection, so this module adds the
standard scale path: MinHash+LSH (Broder), SimHash (Charikar), and exact
n-gram Jaccard as the verification/oracle step. All of it is
shuffle-disciplined DataFrame code:

* exact: one hash-partitioned window over ``md5(normalized_text)`` — a
  single shuffle on a uniformly distributed key;
* minhash / simhash: per-row array folds over the token-hash array — a
  pure map stage with zero shuffle (signatures are per-document
  functions of the token set; nothing about them needs an exchange);
* LSH banding: candidate pairs come from an equi self-join on
  ``(band_idx, band_hash)`` — never an all-pairs cross join. Hot buckets
  (a boilerplate-heavy corpus) are bounded by ``max_bucket`` via a count
  filter before the join (the skew guard the 10^12-row case needs);
* verification: exact Jaccard only on the LSH candidates.

Every numeric here is cross-engine deterministic (see functions/hashing),
so each operator has an exact DuckDB oracle in the driver contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from entity_extractor_spark.functions import hashing as H
from entity_extractor_spark.functions import text as T


def normalized_key(text: Column) -> Column:
    """Exact-dedup key: md5 of whitespace/case-normalized text."""
    return F.md5(T.normalize_text(text))


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, canonical_id, is_dup): canonical = min id per normalized-text
    group. One shuffle on the md5 key; survivors = ``is_dup = false``."""
    from pyspark.sql import Window

    w = Window.partitionBy(normalized_key(F.col(text_col)))
    return docs.select(
        F.col(id_col),
        F.min(id_col).over(w).alias("canonical_id"),
    ).withColumn("is_dup", F.col(id_col) != F.col("canonical_id"))


def _doc_tokens(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, token) — distinct lowered tokens, exploded."""
    return docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(T.tokenize(F.col(text_col)))).alias("token"),
    )


def _token_hashes(text_col: str) -> Column:
    """Per-row array of reduced hashes of the distinct lowered tokens."""
    toks = F.array_distinct(T.tokenize(F.col(text_col)))
    return F.transform(toks, lambda t: H.reduced_hash(t))


def minhash_signatures(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = H.MINHASH_K
) -> DataFrame:
    """(id, s0..s{k-1}) minhash signature over distinct tokens.

    A single per-row ``aggregate`` fold with an array accumulator: one
    pass hashes each token once and takes the running element-wise min of
    its K permutations. Zero shuffle (signatures are per-document
    functions of the token set). Two rejected formulations, measured at
    sf0.1: explode->groupBy shuffles one row per (doc, token) (~2.5x
    slower); K separate ``array_min(transform(hashes, ...))`` columns
    re-evaluate the md5 hash array per column because Catalyst does not
    CSE across higher-order-function lambdas (~20x slower)."""
    # single array Literal nodes, not CreateArray of k children — the
    # plan analyzes/codegens measurably faster with wide constant banks
    a_arr = F.lit(list(H.MINHASH_AS[:k]))
    b_arr = F.lit(list(H.MINHASH_BS[:k]))
    prime = F.lit(H.MINHASH_PRIME)

    def perms(h: Column) -> Column:
        return F.zip_with(a_arr, b_arr, lambda a, b: (a * h + b) % prime)

    sigs = F.aggregate(
        _token_hashes(text_col),
        F.array_repeat(F.lit(H.MINHASH_PRIME).cast("long"), k),
        lambda acc, h: F.zip_with(acc, perms(h), lambda a, b: F.least(a, b)),
    )
    return docs.select(F.col(id_col), *[sigs.getItem(i).alias(f"s{i}") for i in range(k)])


def _band_table(sigs: DataFrame, id_col: str) -> DataFrame:
    """(id, band, h) — band hash = md5 of the concatenated band rows."""
    bands = []
    for b in range(H.LSH_BANDS):
        cols = [F.col(f"s{b * H.LSH_ROWS + r}") for r in range(H.LSH_ROWS)]
        bands.append(
            F.struct(F.lit(b).alias("band"), F.md5(F.concat_ws(":", *cols)).alias("h"))
        )
    return sigs.select(id_col, F.explode(F.array(*bands)).alias("bh")).select(
        id_col, F.col("bh.band").alias("band"), F.col("bh.h").alias("h")
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    max_bucket: int = 10_000,
) -> DataFrame:
    """Near-dup pairs (i < j) from LSH banding, verified with exact
    distinct-token Jaccard >= ``threshold``.

    ``max_bucket`` drops degenerate buckets (boilerplate) *before* the
    self-join — at web scale a single hot bucket would otherwise produce
    O(bucket^2) candidate rows on one reducer.
    """
    sigs = minhash_signatures(docs, id_col, text_col)
    bt = _band_table(sigs, id_col)
    from pyspark.sql import Window

    bucket_n = F.count(F.lit(1)).over(Window.partitionBy("band", "h"))
    bt = bt.withColumn("_n", bucket_n).filter(F.col("_n") <= max_bucket).drop("_n")
    a = bt.select(F.col(id_col).alias("i"), "band", "h")
    b = bt.select(F.col(id_col).alias("j"), "band", "h")
    cand = (
        a.join(b, ["band", "h"])
        .filter(F.col("i") < F.col("j"))
        .select("i", "j")
        .distinct()
    )
    jac = jaccard_on_pairs(docs, cand, id_col, text_col)
    return jac.filter(F.col("jaccard") >= threshold)


def jaccard_on_pairs(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact distinct-token Jaccard for given (i, j) pairs."""
    tok = _doc_tokens(docs, id_col, text_col)
    sizes = tok.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    ti = tok.select(F.col(id_col).alias("i"), "token")
    tj = tok.select(F.col(id_col).alias("j"), "token")
    inter = (
        pairs.join(ti, "i")
        .join(tj, ["j", "token"])
        .groupBy("i", "j")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.select(F.col(id_col).alias("i"), F.col("sz").alias("si")), "i")
        .join(sizes.select(F.col(id_col).alias("j"), F.col("sz").alias("sj")), "j")
        .select(
            "i",
            "j",
            F.round(
                F.col("inter") / (F.col("si") + F.col("sj") - F.col("inter")), 6
            ).alias("jaccard"),
        )
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """Exact word-n-gram-shingle Jaccard pairs (i < j) >= threshold.

    The inverted-index join on shingles replaces the O(N^2) cross join:
    only pairs sharing >= 1 shingle are ever materialized. ``max_df``
    optionally drops shingles occurring in more than that many docs
    (stop-shingle guard for web-scale boilerplate).
    """
    sh = docs.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(T.word_shingles(T.tokenize(F.col(text_col)), n))
        ).alias("sh"),
    )
    if max_df is not None:
        from pyspark.sql import Window

        df_n = F.count(F.lit(1)).over(Window.partitionBy("sh"))
        sh = sh.withColumn("_df", df_n).filter(F.col("_df") <= max_df).drop("_df")
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col(id_col).alias("i"), "sh")
    b = sh.select(F.col(id_col).alias("j"), "sh")
    inter = (
        a.join(b, "sh")
        .filter(F.col("i") < F.col("j"))
        .groupBy("i", "j")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.select(F.col(id_col).alias("i"), F.col("sz").alias("si")), "i")
        .join(sizes.select(F.col(id_col).alias("j"), F.col("sz").alias("sj")), "j")
        .select(
            "i",
            "j",
            F.round(
                F.col("inter") / (F.col("si") + F.col("sj") - F.col("inter")), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def prefix_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    t_num: int = 4,
    t_den: int = 5,
    max_prefix_df: int | None = None,
) -> DataFrame:
    """EXACT shingle-Jaccard pairs >= t (= t_num/t_den) via prefix
    filtering (Bayardo et al. WWW'07 AllPairs / Chaudhuri et al.
    SSJoin) — the exact-threshold scale path of the near-dup suite,
    complementing MinHash-LSH (probabilistic) and
    :func:`ngram_jaccard_pairs` (whose candidate join touches EVERY
    shared shingle).

    Order the shingle universe rarest-first (document frequency asc,
    shingle asc — deterministic on both engines); each doc's PREFIX is
    its first ``sz - ceil(t*sz) + 1`` shingles under that order. Two
    sets with Jaccard >= t have overlap >= t*max(|A|,|B|), and sets
    with overlap >= a must share one of their first ``sz - a + 1``
    elements under ANY common total order — so candidates = pairs
    sharing >= 1 PREFIX shingle, a provably lossless filter. Because
    prefixes are the RAREST ~(1-t) fraction of each doc, the candidate
    join's posting lists are the shortest ones in the corpus — at high
    thresholds orders of magnitude fewer candidate rows than the
    every-shared-shingle join. The verify step recomputes Jaccard
    exactly, with the threshold compared in INTEGER arithmetic
    (``inter * t_den >= t_num * union``) so the cut is float-free.

    The contract oracle is the naive O(N²) quadratic join — the hash
    match proves the prefix filter loses no pair (same discipline as
    `fuzzy_name_pairs`).

    ``max_prefix_df`` is the hot-shingle guard for boilerplate-heavy
    corpora (the same role ``max_bucket`` plays in :func:`lsh_pairs`):
    a shingle shared by more than ``max_prefix_df`` docs — licence
    headers, templated preambles — would otherwise drag a near-quadratic
    posting list into the candidate join even when it ranks into some
    prefixes. With the cap set, candidate generation skips those
    shingles; the verify step is unchanged (still exact Jaccard, no
    false positives), but a pair whose ONLY shared prefix shingle is
    capped is missed, so the operator is recall-bounded rather than
    lossless while the cap binds. :func:`prefix_jaccard_pairs_sql`
    mirrors the cap so the contract hash still proves the exact
    semantics of the documented cut. Default ``None`` = lossless."""
    sh = docs.select(
        F.col(id_col).alias("i"),
        F.explode(
            F.array_distinct(T.word_shingles(T.tokenize(F.col(text_col)), n))
        ).alias("sh"),
    )
    dfreq = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("_df"))
    sizes = sh.groupBy("i").agg(F.count(F.lit(1)).alias("sz"))
    from pyspark.sql import Window

    w = Window.partitionBy("i").orderBy("_df", "sh")
    ranked = (
        sh.join(dfreq, "sh")
        .withColumn("r", F.row_number().over(w))
        .join(sizes, "i")
    )
    # p = sz - ceil(t*sz) + 1, in integer arithmetic
    need = F.floor(
        (F.lit(t_num) * F.col("sz") + F.lit(t_den - 1)) / F.lit(t_den)
    ).cast("long")
    prefix = ranked.filter(F.col("r") <= F.col("sz") - need + 1)
    if max_prefix_df is not None:
        prefix = prefix.filter(F.col("_df") <= max_prefix_df)
    prefix = prefix.select("i", "sh")
    cand = (
        prefix.join(prefix.select(F.col("i").alias("j"), "sh"), "sh")
        .filter(F.col("i") < F.col("j"))
        .select("i", "j")
        .dropDuplicates(["i", "j"])
    )
    arrs = sh.groupBy("i").agg(F.sort_array(F.collect_list("sh")).alias("arr"))
    out = (
        cand.join(arrs.select(F.col("i"), F.col("arr").alias("ai")), "i")
        .join(arrs.select(F.col("i").alias("j"), F.col("arr").alias("aj")), "j")
        .withColumn("inter", F.size(F.array_intersect("ai", "aj")))
        .withColumn("uni", F.size("ai") + F.size("aj") - F.col("inter"))
        .filter(F.col("inter") * t_den >= F.lit(t_num) * F.col("uni"))
    )
    return out.select(
        "i",
        "j",
        F.round(F.col("inter").cast("double") / F.col("uni").cast("double"), 6).alias(
            "jaccard"
        ),
    )


def prefix_jaccard_pairs_sql(
    rel: str = "documents",
    n: int = 3,
    t_num: int = 4,
    t_den: int = 5,
    max_prefix_df: int | None = None,
) -> str:
    """Ground-truth quadratic oracle for :func:`prefix_jaccard_pairs`:
    every doc pair, exact list-intersection Jaccard, same integer
    threshold — no prefix filter, so the hash match proves
    losslessness.

    With ``max_prefix_df`` set, the quadratic pair set is additionally
    intersected with the capped-prefix candidate condition (a shared
    shingle that ranks into BOTH prefixes and has document frequency
    <= cap) — the exact recall cut the engine's guard makes, expressed
    independently over the same quadratic base."""
    toks = T.tokenize_sql("text")
    shl = T.word_shingles_sql("ts", n)
    if max_prefix_df is not None:
        return f"""WITH _pj_t AS (SELECT doc_id, {toks} AS ts FROM {rel}),
        _pj_s AS (
          SELECT doc_id,
                 list_sort(list_distinct(CASE WHEN len(ts) >= {n} THEN {shl} ELSE [] END)) AS arr
          FROM _pj_t
        ),
        _pj_e AS (SELECT doc_id AS i, unnest(arr) AS sh FROM _pj_s),
        _pj_df AS (SELECT sh, count(*) AS df FROM _pj_e GROUP BY sh),
        _pj_r AS (
          SELECT i, sh, df,
                 row_number() OVER (PARTITION BY i ORDER BY df, sh) AS r,
                 count(*) OVER (PARTITION BY i) AS sz
          FROM _pj_e JOIN _pj_df USING (sh)
        ),
        _pj_pre AS (
          SELECT i, sh FROM _pj_r
          WHERE r <= sz - (({t_num} * sz + {t_den - 1}) // {t_den}) + 1
            AND df <= {max_prefix_df}
        ),
        _pj_cand AS (
          SELECT DISTINCT a.i AS i, b.i AS j
          FROM _pj_pre a JOIN _pj_pre b USING (sh) WHERE a.i < b.i
        ),
        _pj_p AS (
          SELECT c.i, c.j,
                 len(list_intersect(a.arr, b.arr)) AS inter,
                 len(a.arr) + len(b.arr) - len(list_intersect(a.arr, b.arr)) AS uni
          FROM _pj_cand c
          JOIN _pj_s a ON a.doc_id = c.i
          JOIN _pj_s b ON b.doc_id = c.j
        )
        SELECT i, j, round(CAST(inter AS DOUBLE) / CAST(uni AS DOUBLE), 6) AS jaccard
        FROM _pj_p WHERE inter * {t_den} >= {t_num} * uni"""
    return f"""WITH _pj_t AS (SELECT doc_id, {toks} AS ts FROM {rel}),
        _pj_s AS (
          SELECT doc_id,
                 list_sort(list_distinct(CASE WHEN len(ts) >= {n} THEN {shl} ELSE [] END)) AS arr
          FROM _pj_t
        ),
        _pj_p AS (
          SELECT a.doc_id AS i, b.doc_id AS j,
                 len(list_intersect(a.arr, b.arr)) AS inter,
                 len(a.arr) + len(b.arr) - len(list_intersect(a.arr, b.arr)) AS uni
          FROM _pj_s a JOIN _pj_s b ON a.doc_id < b.doc_id
          WHERE len(a.arr) > 0 AND len(b.arr) > 0
        )
        SELECT i, j, round(CAST(inter AS DOUBLE) / CAST(uni AS DOUBLE), 6) AS jaccard
        FROM _pj_p WHERE inter * {t_den} >= {t_num} * uni"""


def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, simhash) — 32-bit SimHash over distinct tokens.

    Per-row computation: each bit's ±1 weight sum is an ``aggregate``
    fold over the token-hash array, so the whole fingerprint is a map
    stage with ZERO shuffle (ties bit_sum == 0 resolve to 0
    deterministically). The naive explode->groupBy(32 sums) version
    shuffles one row per (doc, token) — measurably slower at sf0.1 and
    catastrophically so at corpus scale.
    """
    # Bit b of the fingerprint is 1 iff the ±1 weight sum over tokens is
    # positive, i.e. iff 2 * |{tokens with bit b set}| > |tokens| — so one
    # scalar shift-and-mask fold per bit replaces the original array-
    # accumulator fold (which allocated two 32-element arrays PER TOKEN in
    # zip_with/transform and paid double-precision floor-division per bit;
    # the rewrite measured ~2x faster at sf0.1 and is allocation-free).
    # Ties (sum == 0) resolve to bit 0, identical to the ±1 formulation.
    with_h = docs.withColumn("_th", _token_hashes(text_col))
    n_tok = F.size(F.col("_th"))
    fp = None
    for b in range(H.SIMHASH_BITS):
        cnt = F.aggregate(
            F.col("_th"),
            F.lit(0).cast("long"),
            lambda acc, h: acc + F.shiftright(h, b).bitwiseAND(F.lit(1)),
        )
        term = F.when(cnt * 2 > n_tok, F.lit(1 << b)).otherwise(F.lit(0)).cast("long")
        fp = term if fp is None else fp + term
    return with_h.select(F.col(id_col), fp.alias("simhash"))


def dup_clusters(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    max_bucket: int = 10_000,
) -> DataFrame:
    """Near-dup cluster resolution — the corpus-dedup endgame: LSH pairs
    -> connected components -> one canonical representative per cluster.

    Returns (id, cluster_id, keep): ``cluster_id`` = min doc id of the
    connected component of the >=threshold Jaccard near-dup graph
    (singleton docs are their own cluster), ``keep`` marks the
    representative — ``filter(keep)`` IS the deduplicated corpus.

    Pairwise near-dup lists (``minhash_lsh_pairs``) are not directly
    actionable: near-duplication is transitive in practice (A~B, B~C
    usually means drop two of three), so production pipelines cluster the
    pair graph and keep one doc per cluster. Scale: the pair graph is
    bucketed LSH (never all-pairs), and the clustering is the pointer-
    jumping CC already bounded at O(log n) rounds with per-round
    localCheckpoint (`operators/canonicalize.py`); the final assignment
    is one left join on the doc id.
    """
    from entity_extractor_spark.operators.canonicalize import connected_components

    pairs = minhash_lsh_pairs(docs, id_col, text_col, threshold, max_bucket)
    comp = connected_components(pairs, src="i", dst="j")
    return (
        docs.select(F.col(id_col))
        .join(comp.withColumnRenamed("node", id_col), id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("component"), F.col(id_col)).alias("cluster_id"),
        )
        .withColumn("keep", F.col(id_col) == F.col("cluster_id"))
    )


def simhash_pairs(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", max_hamming: int = 3
) -> DataFrame:
    """Candidate near-dup pairs with Hamming distance <= max_hamming.

    Pigeonhole banding: split the 32-bit fingerprint into
    ``max_hamming + 1`` bands; any pair within distance d agrees on >= 1
    band, so candidates come from equi-joins on band values (no cross
    join), then the exact popcount filter.
    """
    n_bands = max_hamming + 1
    width = H.SIMHASH_BITS // n_bands
    s = simhash(docs, id_col, text_col)
    bands = [
        F.struct(
            F.lit(b).alias("band"),
            F.shiftright(F.col("simhash"), b * width)
            .bitwiseAND(F.lit((1 << width) - 1))
            .alias("v"),
        )
        for b in range(n_bands)
    ]
    bt = s.select(id_col, "simhash", F.explode(F.array(*bands)).alias("bh")).select(
        id_col, "simhash", F.col("bh.band").alias("band"), F.col("bh.v").alias("v")
    )
    a = bt.select(F.col(id_col).alias("i"), F.col("simhash").alias("fi"), "band", "v")
    b = bt.select(F.col(id_col).alias("j"), F.col("simhash").alias("fj"), "band", "v")
    return (
        a.join(b, ["band", "v"])
        .filter(F.col("i") < F.col("j"))
        .select("i", "j", F.bit_count(F.col("fi").bitwiseXOR(F.col("fj"))).alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
