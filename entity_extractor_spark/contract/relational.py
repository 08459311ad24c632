"""Relational / pipeline operator queries (SURVEY.md §2 rows not covered
by the core set in __spark_entry__.py). Filled in incrementally."""

from __future__ import annotations

QUERIES: dict = {}
ORACLES: dict = {}
