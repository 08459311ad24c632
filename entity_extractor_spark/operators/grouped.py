"""Per-group procedural operators via ``applyInPandas`` (SURVEY A10/X5).

The reference iterates ``groupby('term_name')`` groups in Python for
per-group rendering/stats (`search_term.py:65-81`, `app.py:493-511`).
Most of those collapse to relational aggregates (see the `stats`
contract query); this module keeps ONE genuinely procedural example —
ordered per-conversation digests — as the canonical template for
grouped Arrow kernels: the shuffle is the groupBy key exchange, each
group is processed as a pandas frame, and output size is one row per
group (so the stage shrinks data, the shape you want at scale).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

DIGEST_SCHEMA = "conv_id string, n_mentions long, n_terms long, term_seq string"


def conversation_digest(mentions: DataFrame) -> DataFrame:
    """One row per conversation: mention count, distinct terms, and the
    (turn_idx, start)-ordered sequence of term_ids as a csv digest —
    deterministic under the stable ordering invariant (SURVEY O1)."""

    def digest(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["turn_idx", "start", "term_id"])
        return pd.DataFrame(
            {
                "conv_id": [pdf["conv_id"].iloc[0]],
                "n_mentions": [len(pdf)],
                "n_terms": [pdf["term_id"].nunique()],
                "term_seq": [",".join(pdf["term_id"])],
            }
        )

    pruned = mentions.select("conv_id", "turn_idx", "start", "term_id")
    return pruned.groupBy("conv_id").applyInPandas(digest, DIGEST_SCHEMA)
