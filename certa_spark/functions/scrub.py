"""PII scrubbing for training-data pipelines (green-field; north-star
extension next to textstats). All JVM-side regexp — no UDFs.

Pattern notes for engine portability (Spark = java.util.regex,
DuckDB oracle = RE2): patterns below avoid backreferences and
alternation shapes where leftmost-first (Java) and leftmost-longest
(RE2) semantics diverge; `\\b` word boundaries work in both. Patterns
are applied in list order on both engines (an earlier redaction can
never create a later pattern's match: `[PII]` contains no digits/@).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

PII_PATTERNS: list[tuple[str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
    ("phone", r"\+\d{7,15}"),
]


def count_pii(col: Column) -> Column:
    """Total PII matches in the ORIGINAL text (counted before any
    redaction so patterns can't shadow each other)."""
    out = F.lit(0)
    for _, pat in PII_PATTERNS:
        out = out + F.regexp_count(col, F.lit(pat))
    return out.cast("long")


def scrub_pii(col: Column, replacement: str = "[PII]") -> Column:
    """Redact every PII pattern, applied in PII_PATTERNS order."""
    out = col
    for _, pat in PII_PATTERNS:
        out = F.regexp_replace(out, pat, replacement)
    return out


def duck_count_pii(expr: str) -> str:
    parts = [
        f"len(regexp_extract_all({expr}, '{pat}'))" for _, pat in PII_PATTERNS
    ]
    return "CAST(" + " + ".join(parts) + " AS BIGINT)"


def duck_scrub_pii(expr: str, replacement: str = "[PII]") -> str:
    out = expr
    for _, pat in PII_PATTERNS:
        out = f"regexp_replace({out}, '{pat}', '{replacement}', 'g')"
    return out
