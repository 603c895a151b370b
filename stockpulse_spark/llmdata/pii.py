"""PII detection and redaction for training-data curation.

A 100 TB corpus sweep must find and scrub emails / phone numbers /
SSN-like identifiers before anything ships to a training run. Both
operators are pure Column expressions (JVM regex inside whole-stage
codegen — no Python in the hot path), so they compose with the other
document-pipeline stages (quality filter -> pii scrub -> dedup ->
pack) at scan throughput.

Pattern discipline: the regexes use only syntax with identical
semantics in Java regex (Spark) and RE2 (DuckDB oracle) — character
classes, bounded repetition, alternation; no backrefs, no lookaround —
so every count and every redacted byte hashes identically against the
oracle. Both engines use leftmost non-overlapping matching.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Order matters for redaction: SSN before phone would also be safe, but
# pin one order and mirror it in every oracle.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\d{3}-\d{3}-\d{4}"
SSN_RE = r"\d{3}-\d{2}-\d{4}"

_REDACTIONS = (
    (EMAIL_RE, "<EMAIL>"),
    (PHONE_RE, "<PHONE>"),
    (SSN_RE, "<SSN>"),
)


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-row match counts for each PII class.

    Counts are coalesced to 0 for NULL text: under non-ANSI sessions
    size(NULL) is -1, which would silently corrupt SUM() totals
    relative to a SQL oracle (whose SUM skips NULLs)."""

    def _n(pattern: str) -> Column:
        return F.coalesce(
            F.size(F.regexp_extract_all(text, F.lit(pattern), F.lit(0))), F.lit(0)
        )

    return {
        "n_emails": _n(EMAIL_RE),
        "n_phones": _n(PHONE_RE),
        "n_ssns": _n(SSN_RE),
    }


def redact_pii(text: Column) -> Column:
    """Replace every PII match with a typed placeholder.

    Email first, then phone, then SSN — emails can contain digit runs
    that the number patterns would otherwise split."""
    out = text
    for pattern, token in _REDACTIONS:
        out = F.regexp_replace(out, pattern, token)
    return out


def add_pii_columns(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append n_emails / n_phones / n_ssns / has_pii / redacted."""
    counts = pii_counts(F.col(text_col))
    out = df
    for name, col in counts.items():
        out = out.withColumn(name, col)
    has = (
        (F.col("n_emails") > 0)
        | (F.col("n_phones") > 0)
        | (F.col("n_ssns") > 0)
    )
    return out.withColumn("has_pii", has).withColumn(
        "redacted", redact_pii(F.col(text_col))
    )
