"""Deterministic sampling / splitting / packing for training-data prep.

``df.sample()`` is seed-dependent per engine AND per partitioning — a
reproducibility bug at 100 TB (re-running after adding one file changes
every sample). These operators derive membership from a content hash
(functions/hashing.token_hash of the row key), so:

* the same row lands in the same sample/split forever, on any engine,
  any partitioning, any cluster size — and the DuckDB oracle mirrors it
  exactly;
* sampling is a pure map-stage filter (predicate-pushdown friendly,
  zero shuffle);
* split fractions are exact in expectation and fixed per row (the
  standard web-scale train/val/test protocol).

``pack_sequences`` is the context-window packing step of an LLM data
pipeline: documents are assigned to fixed-token-budget bins by a running
token count within each (ordered) partition key — one window, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from entity_extractor_spark.functions.hashing import token_hash, token_hash_sql
from entity_extractor_spark.operators.textstats import token_counts

SAMPLE_MOD = 10_000


def sample_bucket(key: Column) -> Column:
    """Stable bucket in [0, SAMPLE_MOD) from the row key's content hash."""
    return F.pmod(token_hash(key.cast("string")), F.lit(SAMPLE_MOD))


def bucket_threshold(fraction: float) -> int:
    """fraction -> kept-bucket count. ``round`` not ``int``: plain
    truncation under-keeps any fraction whose binary-float image falls a
    hair below (0.043*10000 = 429.99...97 -> 429 buckets = 4.29%). The
    oracle SQL embeds this same Python-computed integer, so both engines
    move together."""
    return int(round(fraction * SAMPLE_MOD))


def deterministic_sample(df: DataFrame, key: str, fraction: float) -> DataFrame:
    """Keep ~fraction of rows, membership fixed by content hash of key."""
    return df.filter(sample_bucket(F.col(key)) < bucket_threshold(fraction))


def stratified_sample(
    df: DataFrame, key: str, stratum: str, fractions: dict[str, float]
) -> DataFrame:
    """Per-stratum deterministic sampling — the data-mixing primitive of
    an LLM pipeline (e.g. keep 100% of books, 10% of web). Same
    content-hash membership as :func:`deterministic_sample`, so the kept
    set is stable under repartitioning and engine changes; strata absent
    from ``fractions`` are dropped (explicit mixing weights only).
    Pure map-stage filter: zero shuffle, predicate-pushdown friendly.
    """
    b = sample_bucket(F.col(key))
    thresh = F.create_map(
        *[
            x
            for s, frac in sorted(fractions.items())
            for x in (F.lit(s), F.lit(bucket_threshold(frac)))
        ]
    )
    return df.filter(b < F.coalesce(thresh[F.col(stratum)], F.lit(0)))


def assign_split(
    key: Column, train: float = 0.8, val: float = 0.1
) -> Column:
    """'train' | 'val' | 'test' from the stable bucket (test = remainder)."""
    b = sample_bucket(key)
    t_hi = bucket_threshold(train)
    v_hi = t_hi + bucket_threshold(val)
    return (
        F.when(b < t_hi, "train").when(b < v_hi, "val").otherwise("test")
    )


def split_report(df: DataFrame, key: str, by: str | None = None) -> DataFrame:
    """Counts per split (optionally per stratum) — the sanity report you
    run before training."""
    cols = ([by] if by else []) + ["split"]
    out = df.withColumn("split", assign_split(F.col(key)))
    return out.groupBy(*cols).agg(F.count(F.lit(1)).alias("n")).orderBy(*cols)


WRS_K = 16
_WRS_SPACE = float(1 << 60)  # token_hash range; (h+1)/2^60 is a uniform in (0,1]


def _ares_key(h, w):
    """A-Res priority (Efraimidis & Spirakis 2006): the weighted
    reservoir keeps the k items with the largest u^(1/w), u ~ U(0,1).
    We rank by the monotone-equivalent ln(u)/w (u in (0,1] so ln(u) <= 0
    — larger is better on both forms) to stay in well-conditioned double
    range, and derive u deterministically from the row key's content
    hash, so the sample is reproducible on any engine, any partitioning,
    any cluster size — same property as :func:`deterministic_sample`,
    extended to weighted (importance) sampling, the data-mixing
    primitive for quality-weighted corpus selection."""
    u = (h + F.lit(1)).cast("double") / F.lit(_WRS_SPACE)
    return F.log(u) / w.cast("double")


class _RevStr(str):
    """str with inverted ordering, used as the id component of reservoir
    heap items: inside a min-heap that keeps the "largest" items, a
    SMALLER id compares greater and therefore survives an akey tie —
    matching the (akey DESC, id ASC) rank the merge stage and the SQL
    oracle use, so partition-local eviction can never drop the row the
    global rank keeps."""

    __slots__ = ()

    def __lt__(self, other):  # noqa: D105
        return str.__gt__(self, other)

    def __le__(self, other):  # noqa: D105
        return str.__ge__(self, other)

    def __gt__(self, other):  # noqa: D105
        return str.__lt__(self, other)

    def __ge__(self, other):  # noqa: D105
        return str.__le__(self, other)


def _wrs_base(df: DataFrame, group_col: str, key_col: str, weight_col) -> DataFrame:
    wc = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    return (
        df.select(
            F.col(group_col).alias("grp"),
            F.col(key_col).cast("string").alias("id"),
            wc.cast("long").alias("w"),
        )
        .filter(F.col("w") > 0)
        .withColumn("akey", _ares_key(token_hash(F.col("id")), F.col("w")))
    )


def weighted_sample_partials(
    df: DataFrame, group_col: str, key_col: str, weight_col, k: int = WRS_K
) -> DataFrame:
    """Per-partition A-Res reservoir: for each group, the k rows with the
    largest priority keys seen in that partition, via a bounded min-heap
    — a pure map stage with at most k rows of state per (partition,
    group). The priority is computed JVM-side (whole-stage codegen md5 +
    ln) before the kernel; Python only maintains the heap. The union of
    per-partition reservoirs contains the global top-k, which is what
    makes the merged sample exact. Ties on the float key (possible only
    via a 60-bit hash collision between distinct ids) are broken by
    SMALLEST id — the same (akey DESC, id ASC) order the merge stage and
    the SQL oracle rank by — via a reversed-comparison id wrapper, so
    partition-local eviction can never drop the row the global rank
    keeps."""
    import heapq

    import pandas as pd

    base = _wrs_base(df, group_col, key_col, weight_col)
    grp_type = base.schema["grp"].dataType.simpleString()

    def summarize(batches):
        kept: dict = {}  # grp -> min-heap of (akey, _RevStr(id), w)
        for pdf in batches:
            for g, i, w, a in zip(
                pdf["grp"].values, pdf["id"].values, pdf["w"].values, pdf["akey"].values
            ):
                heap = kept.get(g)
                if heap is None:
                    heap = kept[g] = []
                item = (float(a), _RevStr(i), int(w))
                if len(heap) < k:
                    heapq.heappush(heap, item)
                elif item > heap[0]:
                    heapq.heappushpop(heap, item)
        yield pd.DataFrame(
            {
                "grp": [g for g, heap in kept.items() for _ in heap],
                "id": [str(i) for _, heap in kept.items() for _, i, _w in heap],
                "w": [w for _, heap in kept.items() for _a, _i, w in heap],
                "akey": [a for _, heap in kept.items() for a, _i, _w in heap],
            }
        )

    return base.select("grp", "id", "w", "akey").mapInPandas(
        summarize, f"grp {grp_type}, id string, w long, akey double"
    )


def weighted_sample(
    df: DataFrame, group_col: str, key_col: str, weight_col, k: int = WRS_K
) -> DataFrame:
    """Deterministic weighted (A-Res) sample of k rows per group —
    P(row in sample) proportional to its weight, membership fixed by
    content hash. The engine plan IS the bounded two-phase form:
    per-partition reservoirs (:func:`weighted_sample_partials`, <= k rows
    of state each) merged by one groupBy that keeps the k
    highest-priority rows of the union — the exchange carries at most
    k rows per (map partition, group) regardless of input size, the
    100 TB shape for per-group top-k. The float priority never leaves
    the plan: output is the (group, id, weight) set, ordered by id
    downstream. The SQL twin (:func:`weighted_sample_sql`) is the naive
    full window rank — the hash match proves the bounded form loses no
    row."""
    merged = (
        weighted_sample_partials(df, group_col, key_col, weight_col, k)
        .groupBy("grp")
        .agg(
            F.slice(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            (-F.col("akey")).alias("nak"), F.col("id"), F.col("w")
                        )
                    )
                ),
                1,
                k,
            ).alias("top")
        )
    )
    return merged.select(
        F.col("grp").alias(group_col), F.explode("top").alias("x")
    ).select(
        group_col, F.col("x.id").alias("id"), F.col("x.w").alias("w")
    )


def weighted_sample_sql(rel: str, group_col: str, k: int = WRS_K) -> str:
    """DuckDB twin of :func:`weighted_sample`; ``rel`` must yield columns
    ``grp``, ``id`` (string), ``w`` (integral). Naive form: full window
    rank over the same deterministic A-Res priority."""
    h = token_hash_sql("id")
    return f"""WITH _ws_b AS (
          SELECT grp, id, CAST(w AS BIGINT) AS w,
                 ln(CAST({h} + 1 AS DOUBLE) / {_WRS_SPACE!r}) / CAST(w AS DOUBLE) AS akey
          FROM ({rel}) WHERE w > 0
        ),
        _ws_r AS (
          SELECT grp, id, w,
                 row_number() OVER (PARTITION BY grp ORDER BY akey DESC, id) AS rn
          FROM _ws_b
        )
        SELECT grp AS {group_col}, id, w FROM _ws_r WHERE rn <= {k}"""


N_PACK_SHARDS = 32


def pack_sequences(
    docs: DataFrame,
    budget_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    partition_col: Column | None = None,
    n_shards: int = N_PACK_SHARDS,
    order: str = "id",
) -> DataFrame:
    """Assign each doc to a packing (shard, bin) by running token count.
    ``order``: "id" (corpus order, default) or "tokens_desc"
    (sorted-descending first-fit — less tail fragmentation).

    bin = floor(tokens_before_this_doc_in_shard / budget); docs longer
    than the budget still get a bin (they'd be chunked downstream by
    F10). Docs are sharded by a content hash of the id into ``n_shards``
    independent packing streams, each with its own running budget — the
    window is per-shard, so the sort parallelizes across the cluster
    instead of funnelling the whole corpus through one task. Each shard's
    stream wastes at most one partial bin, so fill efficiency is
    unchanged at corpus scale. Pass ``partition_col`` to shard by an
    existing column (date, bucket id), or ``n_shards=1`` for exact
    single-stream global ordering (small inputs only).

    The shard hash is :func:`functions.hashing.token_hash` (md5-based),
    not ``F.hash`` — cross-engine deterministic, so the DuckDB oracle
    reproduces the exact same shard assignment.
    """
    if order not in ("id", "tokens_desc"):
        raise ValueError(f"order must be 'id' or 'tokens_desc', got {order!r}")
    if partition_col is None:
        partition_col = F.pmod(token_hash(F.col(id_col).cast("string")), F.lit(n_shards))
    n_tok = token_counts(F.col(text_col))["n_bpe_tokens"]
    if order == "tokens_desc":
        # sorted-descending first-fit: packing long docs first reduces
        # tail fragmentation (the classic BFD approximation), at the cost
        # of losing corpus order within the shard
        w = Window.partitionBy(partition_col).orderBy(n_tok.desc(), id_col)
    else:
        w = Window.partitionBy(partition_col).orderBy(id_col)
    cum = F.sum(n_tok).over(w)
    return docs.select(
        F.col(id_col),
        partition_col.cast("long").alias("shard"),
        n_tok.alias("n_tokens"),
        F.floor((cum - n_tok) / F.lit(budget_tokens)).cast("long").alias("bin"),
    )


def packing_report(docs: DataFrame, budget_tokens: int, n_shards: int = N_PACK_SHARDS) -> DataFrame:
    """Per-(shard, bin) fill stats — how efficiently the corpus packs."""
    packed = pack_sequences(docs, budget_tokens, n_shards=n_shards)
    return (
        packed.groupBy("shard", "bin")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_tokens").alias("n_tokens"))
        .orderBy("shard", "bin")
    )
