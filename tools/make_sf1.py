#!/usr/bin/env python
"""Synthesize a deterministic sf1 dataset (10x sf0.1) for scale-stress
benchmarking (round-3 verdict item 5).

The driver ships sf{0.001,0.01,0.1}; shuffle-heavy queries need one run
at 10x to evidence linear-ish scaling. We replicate sf0.1 ten times with
id offsets (pure DuckDB, no randomness — byte-deterministic output):

* id columns are offset per replica so keys stay unique and group/join
  cardinalities scale linearly (the realistic shape), not quadratically;
* conversation derivation in the contract queries uses doc_id % 50, so
  replicated doc_ids fold into the same conv space — conversations get
  LONGER (10x turns) rather than more numerous, which is the harsher
  case for the window/sessionize operators;
* text/embeddings are reused as-is: timing is the goal here, and the
  pair-emitting near-dup queries are excluded from bench at any sf (the
  replica texts would be pathologically self-similar).

Output goes to .scratch/sf1/ (gitignored). Usage:
    python tools/make_sf1.py
    SPARK_GRAFT_SF_DIR=$PWD/.scratch/sf1 python bench.py
"""

from __future__ import annotations

import os

import duckdb

SRC = os.environ.get("SPARK_GRAFT_SRC_SF", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch", "sf1")
COPIES = int(os.environ.get("SPARK_GRAFT_SF1_COPIES", "10"))

# per-table id columns to offset by replica * (1 + max(id))
OFFSETS = {
    "documents": ["doc_id"],
    "events": ["event_id"],
    "embeddings": ["vec_id"],
    "customer": ["c_custkey"],
    "orders": ["o_orderkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    # lineitem's orderkey follows the orders offset (FK handled below)
    "lineitem": [],
    # nation/region are dimensions — copied once, never replicated
}
DIMS = ["nation", "region"]


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    for d in DIMS:
        con.execute(f"COPY (SELECT * FROM '{SRC}/{d}.parquet') TO '{OUT}/{d}.parquet' (FORMAT PARQUET)")
    fk_strides = {
        "o_custkey": con.execute(f"SELECT max(c_custkey) + 1 FROM '{SRC}/customer.parquet'").fetchone()[0],
        "l_orderkey": con.execute(f"SELECT max(o_orderkey) + 1 FROM '{SRC}/orders.parquet'").fetchone()[0],
        "l_partkey": con.execute(f"SELECT max(p_partkey) + 1 FROM '{SRC}/part.parquet'").fetchone()[0],
        "l_suppkey": con.execute(f"SELECT max(s_suppkey) + 1 FROM '{SRC}/supplier.parquet'").fetchone()[0],
    }
    # embeddings are SYNTHESIZED fresh, not replicated: verbatim (or merely
    # perturbed) replicas of the same vector are mutual near-dups, so every
    # pair-emitting query's OUTPUT grows quadratically with the replica count
    # (measured 84-156 s for embedding_dups_lsh at sf1 — output-bound, not a
    # plan failure). Fresh hash-derived uniform vectors keep the real table's
    # geometry: near-random, near-dups rare, pair output linear-ish.
    dim = con.execute(f"SELECT max(len(embedding)) FROM '{SRC}/embeddings.parquet'").fetchone()[0]
    n_vec = COPIES * con.execute(f"SELECT count(*) FROM '{SRC}/embeddings.parquet'").fetchone()[0]
    con.execute(
        f"""
        COPY (
          SELECT CAST(v AS BIGINT) AS vec_id,
                 CAST(list_transform(range({dim}),
                      i -> (CAST(hash(v * {dim} + i) % 2001 AS BIGINT) - 1000) / 1000.0) AS FLOAT[]) AS embedding,
                 CAST(hash(v) % 10 AS INTEGER) AS label
          FROM range({n_vec}) t(v)
        ) TO '{OUT}/embeddings.parquet' (FORMAT PARQUET)
        """
    )
    print(f"embeddings: {n_vec} rows (synthesized, dim={dim})")
    del OFFSETS["embeddings"]
    for table, id_cols in OFFSETS.items():
        src = f"{SRC}/{table}.parquet"
        cols = [r[0] for r in con.execute(f"DESCRIBE SELECT * FROM '{src}'").fetchall()]
        strides = {
            c: con.execute(f"SELECT max({c}) + 1 FROM '{src}'").fetchone()[0] for c in id_cols
        }
        selects = []
        for rep in range(COPIES):
            exprs = []
            for c in cols:
                if c in strides:
                    # CAST keeps the original integer type (BIGINT ids stay BIGINT)
                    exprs.append(f"CAST({c} + {rep * strides[c]} AS BIGINT) AS {c}")
                elif c in fk_strides:
                    # foreign keys follow their dimension's offset so joins
                    # fan out linearly, preserving sf0.1 selectivity
                    exprs.append(f"CAST({c} + {rep * fk_strides[c]} AS BIGINT) AS {c}")
                else:
                    exprs.append(c)
            selects.append(f"SELECT {', '.join(exprs)} FROM '{src}'")
        union = " UNION ALL ".join(selects)
        con.execute(f"COPY ({union}) TO '{OUT}/{table}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM '{OUT}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n} rows")
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
