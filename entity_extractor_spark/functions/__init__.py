"""Scalar-function library (SURVEY.md §2.8) shared by operators and the
DuckDB-oracle contract. Every function here has a pure-Catalyst Spark form
and, where the driver contract needs it, an exactly-mirrored ANSI/DuckDB
SQL twin generated from the same constants."""
