"""Cross-engine deterministic hashing helpers.

Spark's hash()/xxhash64() and DuckDB's hash() are different functions,
so oracle-checkable operators derive integers from md5 hex digests —
md5 over utf8 bytes is identical in both engines. `hex_to_int_sql`
emits ONE SQL expression string valid in BOTH dialects (instr/substr/
CAST are common), avoiding Spark's conv() (absent in DuckDB) and
DuckDB's from_hex (absent in Spark).
"""

from __future__ import annotations


def hex_to_int_sql(hex_expr: str, nchars: int = 8) -> str:
    """SQL turning the first `nchars` hex chars of `hex_expr` into a
    BIGINT (base-16 positional sum; ≤ 2^32 for nchars=8)."""
    terms = [
        f"(instr('0123456789abcdef', substr({hex_expr}, {p}, 1)) - 1)"
        f" * CAST({16 ** (nchars - p)} AS BIGINT)"
        for p in range(1, nchars + 1)
    ]
    return "(" + " + ".join(terms) + ")"


def word32_sql(word_expr: str) -> str:
    """32-bit integer hash of a string expression, both dialects."""
    return hex_to_int_sql(f"md5({word_expr})", 8)
