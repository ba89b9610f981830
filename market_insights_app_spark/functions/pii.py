"""PII detection/redaction — the scrub pass a training-data pipeline
runs over raw text before anything is retained (emails, phone numbers,
IPv4 addresses, SSN-shaped ids).

Pure ``regexp_count`` / ``regexp_replace`` column expressions — JVM
regex in the scan, no UDF, fully pushdown-compatible. The patterns are
deliberately restricted to syntax with identical semantics in Java
regex and RE2 (no backreferences, no lookaround), so the DuckDB oracle
runs the very same patterns (differential gate: ★pii_scrub).

Redaction order matters and is fixed: emails first (they contain digit
runs a phone pattern could nibble), then SSN-shaped ids (more specific
than phones), then phones, then IPv4.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
SSN_RE = r"\d{3}-\d{2}-\d{4}"
PHONE_RE = r"\+?\d[\d\-\s()]{7,}\d"
IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

#: (kind, pattern, replacement) in redaction order
PII_RULES: list[tuple[str, str, str]] = [
    ("email", EMAIL_RE, "[EMAIL]"),
    ("ssn", SSN_RE, "[SSN]"),
    ("phone", PHONE_RE, "[PHONE]"),
    ("ip", IP_RE, "[IP]"),
]


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def pii_counts(col: Column | str) -> dict[str, Column]:
    """Per-kind match counts on the ORIGINAL text (counts are taken
    before any replacement so kinds don't cannibalize each other's
    spans — except as the fixed redaction order dictates for spans that
    genuinely overlap)."""
    return {kind: F.regexp_count(_c(col), F.lit(pat)) for kind, pat, _ in PII_RULES}


def redact_pii(col: Column | str) -> Column:
    """Replace every PII span with its ``[KIND]`` token, applying the
    rules in the documented order."""
    out = _c(col)
    for _, pat, token in PII_RULES:
        out = F.regexp_replace(out, pat, token)
    return out
