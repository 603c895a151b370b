"""PII curation queries over the documents corpus.

The synthetic corpus contains no organic PII, so each query first
derives an `injected` text column by deterministically appending
email / phone / SSN / URL tokens to a doc_id-keyed subset — the SAME
string algebra on the Spark side and in the DuckDB oracle — and then
runs the real detection/redaction operators on it. The oracle therefore
verifies the regex and replacement SEMANTICS on non-trivial matches,
not a vacuous all-zeros report.

Operators under test live in llmdata/pii.py (pure Column regex —
JVM-side, codegen, no UDF)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from stockpulse_spark.llmdata.pii import EMAIL_RE, add_pii_columns
from stockpulse_spark.plans.registry import _register, _t

# deterministic PII injection — keep in exact sync with _INJECT_SQL
_URL_RE = r"https?://[^\s]+"


def _injected(df: DataFrame) -> DataFrame:
    did = F.col("doc_id")
    email = F.when(
        did % 7 == 0,
        F.concat(
            F.lit(" contact user"),
            did.cast("string"),
            F.lit("@example.com for details"),
        ),
    ).otherwise("")
    phone = F.when(
        did % 11 == 0,
        F.concat(
            F.lit(" or call 555-"),
            F.lpad((did % 1000).cast("string"), 3, "0"),
            F.lit("-0199"),
        ),
    ).otherwise("")
    ssn = F.when(
        did % 13 == 0,
        F.concat(
            F.lit(" id 078-05-"), F.lpad((did % 10000).cast("string"), 4, "0")
        ),
    ).otherwise("")
    url = F.when(
        did % 5 == 0,
        F.concat(
            F.lit(" see https://site"),
            (did % 20).cast("string"),
            F.lit(".example.org/p/"),
            did.cast("string"),
        ),
    ).otherwise("")
    return df.withColumn(
        # coalesce: NULL text injects over '' so the audit counts are
        # integers (not NULLs that float64 the whole oracle column)
        "injected",
        F.concat(F.coalesce(F.col("text"), F.lit("")), email, phone, ssn, url),
    )


_INJECT_SQL = """
  injected AS (
    SELECT doc_id, source, lang,
           coalesce(text, '')
           || CASE WHEN doc_id % 7 = 0
                   THEN ' contact user' || CAST(doc_id AS VARCHAR)
                        || '@example.com for details' ELSE '' END
           || CASE WHEN doc_id % 11 = 0
                   THEN ' or call 555-'
                        || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                        || '-0199' ELSE '' END
           || CASE WHEN doc_id % 13 = 0
                   THEN ' id 078-05-'
                        || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                   ELSE '' END
           || CASE WHEN doc_id % 5 = 0
                   THEN ' see https://site' || CAST(doc_id % 20 AS VARCHAR)
                        || '.example.org/p/' || CAST(doc_id AS VARCHAR)
                   ELSE '' END AS injected
    FROM documents
  )
"""

_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PHONE = "\\d{3}-\\d{3}-\\d{4}"
_SSN = "\\d{3}-\\d{2}-\\d{4}"


@_register(
    "pii_source_report",
    oracle=f"""
    WITH {_INJECT_SQL},
    per_doc AS (
      SELECT source,
             len(regexp_extract_all(injected, '{_EMAIL}')) AS n_emails,
             len(regexp_extract_all(injected, '{_PHONE}')) AS n_phones,
             len(regexp_extract_all(injected, '{_SSN}'))   AS n_ssns
      FROM injected
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN n_emails > 0 OR n_phones > 0 OR n_ssns > 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_pii,
           CAST(SUM(n_emails) AS BIGINT) AS total_emails,
           CAST(SUM(n_phones) AS BIGINT) AS total_phones,
           CAST(SUM(n_ssns) AS BIGINT) AS total_ssns
    FROM per_doc GROUP BY source ORDER BY source
    """,
    tags=("llmdata", "pii"),
    doc="corpus PII audit per source: document counts, documents with "
    "any finding, and per-class match totals. Detection is pure JVM "
    "regex (llmdata/pii.py) — one scan, map-side partial agg, one "
    "shuffle on the low-cardinality source key.",
)
def q_pii_source_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _injected(_t(spark, sf_dir, "documents"))
    flagged = add_pii_columns(docs, "injected")
    return (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("has_pii"), 1).otherwise(0)).alias(
                "docs_with_pii"
            ),
            F.sum("n_emails").alias("total_emails"),
            F.sum("n_phones").alias("total_phones"),
            F.sum("n_ssns").alias("total_ssns"),
        )
        .orderBy("source")
    )


@_register(
    "pii_redaction_audit",
    oracle=f"""
    WITH {_INJECT_SQL}
    SELECT doc_id,
           len(regexp_extract_all(injected, '{_EMAIL}'))
             + len(regexp_extract_all(injected, '{_PHONE}'))
             + len(regexp_extract_all(injected, '{_SSN}')) AS n_pii,
           length(injected) AS len_before,
           length(regexp_replace(
             regexp_replace(
               regexp_replace(injected, '{_EMAIL}', '<EMAIL>', 'g'),
               '{_PHONE}', '<PHONE>', 'g'),
             '{_SSN}', '<SSN>', 'g')) AS len_after,
           md5(regexp_replace(
             regexp_replace(
               regexp_replace(injected, '{_EMAIL}', '<EMAIL>', 'g'),
               '{_PHONE}', '<PHONE>', 'g'),
             '{_SSN}', '<SSN>', 'g')) AS checksum
    FROM injected
    """,
    tags=("llmdata", "pii"),
    doc="per-document redaction audit: finding count, byte length "
    "before/after scrubbing, and an md5 checksum of the redacted text "
    "— the checksum makes the oracle verify every redacted BYTE, not "
    "just the counts. Replacement order (email, phone, SSN) is pinned "
    "on both sides.",
)
def q_pii_redaction_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _injected(_t(spark, sf_dir, "documents"))
    flagged = add_pii_columns(docs, "injected")
    return flagged.select(
        "doc_id",
        (F.col("n_emails") + F.col("n_phones") + F.col("n_ssns")).alias(
            "n_pii"
        ),
        F.length("injected").alias("len_before"),
        F.length("redacted").alias("len_after"),
        F.md5(F.col("redacted").cast("binary")).alias("checksum"),
    )


@_register(
    "url_domain_stats",
    oracle=f"""
    WITH {_INJECT_SQL},
    urls AS (
      SELECT doc_id, unnest(regexp_extract_all(injected, 'https?://[^\\s]+'))
               AS url
      FROM injected
    )
    SELECT regexp_extract(url, '^https?://([^/]+)', 1) AS domain,
           COUNT(*) AS n_urls,
           COUNT(DISTINCT doc_id) AS n_docs
    FROM urls GROUP BY 1 ORDER BY n_urls DESC, domain
    """,
    tags=("llmdata", "pii"),
    doc="URL inventory for a crawl corpus: extract every URL, reduce "
    "to its domain, count mentions and distinct documents per domain. "
    "extract-all + explode + re-agg — the shuffle carries only "
    "(domain, doc_id) pairs. The standard pre-filter for domain-level "
    "quality decisions in a training-data pipeline.",
)
def q_url_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _injected(_t(spark, sf_dir, "documents"))
    urls = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.col("injected"), F.lit(_URL_RE), F.lit(0))
        ).alias("url"),
    )
    return (
        urls.select(
            "doc_id",
            F.regexp_extract("url", r"^https?://([^/]+)", 1).alias("domain"),
        )
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.count_distinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.desc("n_urls"), "domain")
    )


_BLOCKED_DOMAINS = [f"site{i}.example.org" for i in range(5)]


@_register(
    "doc_blocklist_filter",
    oracle=f"""
    WITH {_INJECT_SQL},
    urls AS (
      SELECT doc_id,
             regexp_extract(u.url, '^https?://([^/]+)', 1) AS domain
      FROM injected,
           unnest(regexp_extract_all(injected, 'https?://[^\\s]+')) u(url)
    ), per_doc AS (
      SELECT i.doc_id,
             COUNT(u.domain) AS n_urls,
             CAST(COALESCE(SUM(CASE WHEN u.domain IN
               ({", ".join(f"'{d}'" for d in _BLOCKED_DOMAINS)})
               THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_blocked_urls
      FROM injected i LEFT JOIN urls u USING (doc_id)
      GROUP BY i.doc_id
    )
    SELECT doc_id, n_urls, n_blocked_urls,
           n_blocked_urls > 0 AS blocked
    FROM per_doc
    """,
    tags=("llmdata", "quality", "pii"),
    doc="UT1-style domain blocklist filter: extract every URL, reduce "
    "to domains, flag documents citing any blocklisted domain "
    "(blocklist as a broadcast dim — real lists are ~MBs of domains, "
    "forever broadcastable). LEFT JOIN keeps URL-free documents with "
    "zero counts; the shuffle carries only (doc_id, domain) pairs. "
    "The standard crawl-hygiene step before quality scoring.",
)
def q_doc_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _injected(_t(spark, sf_dir, "documents"))
    urls = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.col("injected"), F.lit(_URL_RE), F.lit(0))
        ).alias("url"),
    ).select(
        "doc_id",
        F.regexp_extract("url", r"^https?://([^/]+)", 1).alias("domain"),
    )
    blocklist = F.array(*[F.lit(d) for d in _BLOCKED_DOMAINS])
    flagged = urls.select(
        "doc_id",
        F.lit(1).alias("one"),
        F.array_contains(blocklist, F.col("domain")).cast("int").alias("blk"),
    )
    per_doc = (
        docs.select("doc_id")
        .join(flagged, "doc_id", "left")
        .groupBy("doc_id")
        .agg(
            F.count("one").alias("n_urls"),
            F.coalesce(F.sum("blk"), F.lit(0)).alias("n_blocked_urls"),
        )
    )
    return per_doc.select(
        "doc_id", "n_urls", "n_blocked_urls",
        (F.col("n_blocked_urls") > 0).alias("blocked"),
    )
