"""PII detection and redaction over text columns.

Training corpora are scrubbed for personally identifiable information
before use; this module provides the standard regex families (email,
IPv4, US-SSN, credit-card, US-phone) as JVM-side ``regexp_replace`` /
``regexp_extract_all`` expressions — whole-stage codegen, no Python in
the hot path, embarrassingly parallel (no shuffle at any scale).

Pattern notes: every pattern is restricted to syntax shared by Java
regex (Spark) and RE2 (DuckDB oracle) — character classes, bounded
repetition, ``\\b`` word boundaries; no lookarounds, no backreferences —
so the same pattern string runs identically on both engines.

Reference parity: the reference engine has no PII surface — this is part
of the beyond-reference LLM-pipeline layer (SURVEY.md §2C).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Ordered: longer/more-specific families first so e.g. a credit card is
# not partially consumed as a phone number.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "credit_card": r"\b[0-9]{4}[ -][0-9]{4}[ -][0-9]{4}[ -][0-9]{4}\b",
    "ssn": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    "phone": r"\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b",
}


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-family match counts for one text column (codegen expressions)."""
    return {
        fam: F.size(F.regexp_extract_all(text, F.lit(pat), 0))
        for fam, pat in PII_PATTERNS.items()
    }


def redact(text: Column) -> Column:
    """Replace every PII match with ``[<FAMILY>]``, most-specific first."""
    out = text
    for fam, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, f"[{fam.upper()}]")
    return out


def pii_scan(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, per-family counts, redacted text) for every document.

    One pass over the text per family — five codegen'd regex scans and
    five replaces fused into a single WholeStageCodegen stage; no
    shuffle, no Python.
    """
    text = F.col(text_col)
    counts = pii_counts(text)
    return df.select(
        F.col(id_col),
        *[c.alias(f"n_{fam}") for fam, c in counts.items()],
        redact(text).alias("redacted"),
    )
