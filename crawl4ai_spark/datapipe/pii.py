"""PII scrubbing for training-data pipelines: regex-based detection and
redaction of emails, IPv4 addresses, and phone numbers as pure Catalyst
expressions (regexp_replace / regexp_extract_all run JVM-side inside
whole-stage codegen — shuffle-free, linear scans at 100 TB).

Patterns are deliberately conservative and RE2/Java-portable (character
classes only, no backreferences, no lookaround) so the exact same pattern
string runs in Spark (Java regex) and DuckDB (RE2) for the contract
oracle. Replacement ORDER matters and is fixed: emails → IPv4 → phones —
an IPv4 redacted first can no longer be half-eaten by the phone pattern.

A production pipeline adds model-based NER behind the same column seam;
these regex tiers are the standard first pass (and the only deterministic
one, which is what makes the output oracle-checkable).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_PATTERN = (
    r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"
)
# optional +country prefix, then 3 digit groups separated by - . or space;
# the \b sits AFTER the optional '+' (a '+' is a non-word char, so a leading
# \b would reject '+1 ...'), and the country prefix requires digits before
# its separator so an empty prefix can never swallow the preceding space
PHONE_PATTERN = (
    r"\+?\b(?:[0-9]{1,3}[-. ])?\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}\b"
)

_ORDER = [
    ("email", EMAIL_PATTERN, "<EMAIL>"),
    ("ipv4", IPV4_PATTERN, "<IP>"),
    ("phone", PHONE_PATTERN, "<PHONE>"),
]


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def pii_counts_col(text: Column | str) -> Column:
    """struct(n_email, n_ipv4, n_phone) — counted in the same masked order
    the redaction applies, so counts always agree with what redact_pii_col
    actually replaces (an IPv4 inside an email, say, is counted once)."""
    c = _c(text)
    counts = {}
    for name, pattern, token in _ORDER:
        counts[name] = F.size(
            F.regexp_extract_all(c, F.lit(pattern), F.lit(0))
        ).cast("long")
        c = F.regexp_replace(c, pattern, token)
    return F.struct(
        counts["email"].alias("n_email"),
        counts["ipv4"].alias("n_ipv4"),
        counts["phone"].alias("n_phone"),
    )


def redact_pii_col(text: Column | str) -> Column:
    """Text with every email/IPv4/phone match replaced by its type token."""
    c = _c(text)
    for _, pattern, token in _ORDER:
        c = F.regexp_replace(c, pattern, token)
    return c
