"""Shared Spark-vs-DuckDB result comparison — the single definition of
"matches the oracle" used by BOTH the pytest gate
(tests/test_entry_oracle.py) and the standalone checker
(tools/check_contract.py), so the two can never drift.

Mirrors the driver's semantics: column-name set, row count, and
order-insensitive value equality; floats compared EXACTLY (the engines
are designed to agree bit-for-bit); numeric dtype KIND must agree
(int vs float) because the driver's value hash is computed after pandas
materialization, where a DuckDB HUGEINT sum silently becomes float64
and breaks the hash even when values are equal.
"""

from __future__ import annotations

import math

import pandas as pd

_NUM_KINDS = {"i", "u", "f"}
_INT_KINDS = {"i", "u"}


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare_frames(a: pd.DataFrame, b: pd.DataFrame, name: str) -> str | None:
    """Returns None on match, else a one-line description of the first
    divergence (columns / rows / dtype kind / value)."""
    if sorted(a.columns) != sorted(b.columns):
        return f"{name}: columns {sorted(a.columns)} vs {sorted(b.columns)}"
    if len(a) != len(b):
        return f"{name}: rows {len(a)} vs {len(b)}"
    for c in a.columns:
        ka, kb = a[c].dtype.kind, b[c].dtype.kind
        if (ka in _NUM_KINDS or kb in _NUM_KINDS) and (ka in _INT_KINDS) != (
            kb in _INT_KINDS
        ):
            return (
                f"{name}.{c}: dtype kind mismatch {a[c].dtype} vs {b[c].dtype} "
                f"(cast the oracle aggregate, e.g. CAST(sum(..) AS BIGINT))"
            )
    a, b = _canon(a), _canon(b)
    for c in a.columns:
        for i, (x, y) in enumerate(zip(a[c].tolist(), b[c].tolist())):
            if isinstance(x, float) or isinstance(y, float):
                try:
                    fx = float("nan") if x is None else float(x)
                    fy = float("nan") if y is None else float(y)
                except (TypeError, ValueError):
                    # One engine materialized a non-numeric object (e.g. a
                    # stringified None) where the other has a float: report the
                    # divergence instead of crashing the whole contract check.
                    return f"{name}.{c}[{i}]: {x!r} != {y!r} (non-numeric vs float)"
                if math.isnan(fx) and math.isnan(fy):
                    continue
                if fx != fy:
                    return f"{name}.{c}[{i}]: {x!r} != {y!r} (float EXACT mismatch)"
            elif str(x) != str(y):
                return f"{name}.{c}[{i}]: {x!r} != {y!r}"
    return None
