"""Driver-contract registry: maps operator implementations to
(queries, oracle_sql) pairs consumed by __spark_entry__.py.

Each submodule exports QUERIES: dict[str, Callable[[SparkSession, str],
DataFrame]] and ORACLES: dict[str, str] with identical key sets (keys
missing from ORACLES get the driver's weaker rows-only check). SQL is
generated from the same constants the Spark plans use, so both engines
compute bit-identical values.
"""

from __future__ import annotations


def merged() -> tuple[dict, dict]:
    from entity_extractor_spark.contract import analytics, curation, relational

    queries: dict = {}
    oracles: dict = {}
    for mod in (analytics, curation, relational):
        queries.update(mod.QUERIES)
        oracles.update(mod.ORACLES)
    return queries, oracles
