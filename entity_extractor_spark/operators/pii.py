"""PII scrubbing for training-data curation: redact emails, IPv4
addresses, and phone numbers before a corpus is packed for training.

The reference pipeline has no PII stage (its corpus is already-public
abstracts), but any 100 TB web/transcript corpus runs one; this is the
standard hygiene pass alongside dedup/decontamination
(`operators/dedup.py`, `operators/decontam.py`). Everything is chained
`regexp_replace` / `regexp_count` column arithmetic — whole-stage
codegen, zero shuffles, linear in corpus bytes — and every pattern has
an exact DuckDB twin (Java regex and RE2 agree on this ASCII subset:
character classes, `\\b`, `\\d`, bounded repetition only).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Patterns restricted to the Java-regex ∩ RE2 common subset so the Spark
# plan and the DuckDB oracle scrub identically. Order matters: emails
# first (their local parts may contain digit runs), then IPs (dotted
# digit runs would otherwise survive into the phone pass), then phones.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "[PHONE]"),
]


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-category match counts, computed on the ORIGINAL text (before
    any replacement, so categories never steal each other's matches)."""
    return {kind: F.regexp_count(text, F.lit(pat)) for kind, pat, _ in PII_PATTERNS}


def scrub_text(text: Column) -> Column:
    """Text with every PII match replaced by its typed placeholder.
    Spark's regexp_replace is global (all occurrences), matching the
    oracle's 'g' flag."""
    out = text
    for _, pat, token in PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out


def scrub_pii(df: DataFrame, col: str = "text") -> DataFrame:
    """Adds n_<kind> count columns and a `clean_text` column. Pure
    narrow projection: no shuffle, no UDF — the scan partitioning is
    preserved, so at 100 TB this fuses into whatever stage follows."""
    counts = pii_counts(F.col(col))
    return df.select(
        "*",
        *[c.alias(f"n_{kind}") for kind, c in counts.items()],
        scrub_text(F.col(col)).alias("clean_text"),
    )


# ---------------------------------------------------------------- SQL mirrors


def pii_counts_sql(expr: str) -> dict[str, str]:
    return {
        kind: f"len(regexp_extract_all({expr}, '{pat}'))"
        for kind, pat, _ in PII_PATTERNS
    }


def scrub_text_sql(expr: str) -> str:
    out = expr
    for _, pat, token in PII_PATTERNS:
        out = f"regexp_replace({out}, '{pat}', '{token}', 'g')"
    return out


# ------------------------------------------------- deterministic PII fixture

# The synthetic documents corpus contains no organic PII, so the contract
# query plants a deterministic payload derived from doc_id on 2 of every
# 3 docs (the third exercises the zero-match path). Both engines build
# the identical string with the same integer arithmetic.


def attach_pii(df: DataFrame, col: str = "text") -> DataFrame:
    doc = F.col("doc_id").cast("long")
    payload = F.concat(
        F.lit(" contact user"),
        doc.cast("string"),
        F.lit("@example.com from 10."),
        (doc % 256).cast("string"),
        F.lit(".0."),
        ((doc * 7) % 256).cast("string"),
        F.lit(" or 555-"),
        F.lpad((doc % 1000).cast("string"), 3, "0"),
        F.lit("-"),
        F.lpad(((doc * 13) % 10000).cast("string"), 4, "0"),
    )
    planted = F.when(doc % 3 != 0, F.concat(F.col(col), payload)).otherwise(F.col(col))
    return df.withColumn(col, planted)


def attach_pii_sql(expr: str = "text") -> str:
    payload = (
        f"' contact user' || CAST(doc_id AS VARCHAR) || '@example.com from 10.' || "
        f"CAST(doc_id % 256 AS VARCHAR) || '.0.' || CAST((doc_id * 7) % 256 AS VARCHAR) || "
        f"' or 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-' || "
        f"lpad(CAST((doc_id * 13) % 10000 AS VARCHAR), 4, '0')"
    )
    return f"CASE WHEN doc_id % 3 <> 0 THEN {expr} || {payload} ELSE {expr} END"
