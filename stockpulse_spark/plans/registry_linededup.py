"""Corpus-level segment (line) deduplication — the CCNet/RefinedWeb
transform that removes text repeated ACROSS documents (nav bars,
license footers, templated headers) before training.

The corpus has no newline characters (TESTDATA.md synthetic text), so
the "line" unit is a normalized fixed-width segment: non-overlapping
8-word windows of the whitespace token stream — the same unit a
paragraph/line splitter produces after whitespace normalization.
This is deliberately DISJOINT from the neighbouring operators:
`doc_repetition_score` measures repetition WITHIN a document,
`doc_substring_dup_pairs` finds overlapping-shingle pairs BETWEEN
2-8 documents; this one measures the corpus-wide duplicated-segment
mass and flags majority-boilerplate documents — the signal line-dedup
pipelines act on.

Scale shape (100 TB): ONE corpus scan and one explode; the
(doc, segment-hash) rollup partial-aggregates map-side before its
shuffle; cross-document multiplicity comes from a COUNT window over
the hash on the pair table (doc-count-sized skinny rows, not the
token stream) — a freq-table self-join was rejected because column
pruning specializes the two branches and defeats exchange reuse,
re-scanning the corpus. Hot boilerplate hashes concentrate their
pair rows in one window partition; those rows are 3 ints + a hash
wide, so even a segment shared by 10^7 docs is a few hundred MB —
bounded, unlike a second 100 TB scan. No driver state, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stockpulse_spark.plans.registry import _r6, _register, _t

_SEG_WORDS = 8


@_register(
    "corpus_segment_dedup",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, source, string_split(text, ' ') AS w
      FROM documents WHERE text IS NOT NULL
    ), seg AS (
      SELECT doc_id, source,
             unnest(list_transform(range(0, len(w) // {_SEG_WORDS}),
               i -> md5(array_to_string(
                      w[i * {_SEG_WORDS} + 1 : i * {_SEG_WORDS} + {_SEG_WORDS}],
                      ' ')))) AS h
      FROM w WHERE len(w) >= {_SEG_WORDS}
    ), pair AS (
      SELECT doc_id, source, h, COUNT(*) AS n_occ
      FROM seg GROUP BY doc_id, source, h
    ), marked AS (
      -- one window count instead of a freq-table self-join: the join
      -- formulation re-scans and re-explodes the whole corpus for its
      -- second branch (column pruning defeats exchange reuse); the
      -- window keeps a single lineage — ONE corpus scan at any scale
      SELECT doc_id, source, n_occ,
             COUNT(*) OVER (PARTITION BY h) AS n_docs_h
      FROM pair
    ), docstat AS (
      SELECT doc_id, source,
             SUM(n_occ) AS n_seg,
             SUM(CASE WHEN n_docs_h >= 2 THEN n_occ ELSE 0 END) AS n_dup
      FROM marked
      GROUP BY doc_id, source
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_seg) AS BIGINT) AS n_segments,
           CAST(SUM(n_dup) AS BIGINT) AS n_dup_segments,
           ROUND(SUM(n_dup) * 1.0 / nullif(SUM(n_seg), 0), 6) AS dup_ratio,
           CAST(SUM(CASE WHEN 2 * n_dup > n_seg THEN 1 ELSE 0 END)
                AS BIGINT) AS n_docs_flagged
    FROM docstat GROUP BY source ORDER BY source
    """,
    tags=("llmdata", "dedup", "text"),
    doc="CCNet-style cross-document segment dedup report: hash "
    "non-overlapping 8-word segments, count how much of each "
    "source's segment mass also occurs in at least one OTHER "
    "document, and flag majority-boilerplate docs (>50% duplicated "
    "segments). A segment repeated only inside one document does "
    "NOT count (that is doc_repetition_score's intra-doc signal). "
    "Docs under 8 words have no segments and are out of scope. "
    "Ratio is nullif-guarded; counts are BIGINT on both engines.",
)
def q_corpus_segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "source", F.split("text", " ").alias("w"))
        .filter(F.size("w") >= _SEG_WORDS)
    )
    n_seg_expr = F.floor(F.size("w") / _SEG_WORDS).cast("int")
    segs = d.select(
        "doc_id",
        "source",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), n_seg_expr - 1),
                lambda i: F.md5(
                    F.array_join(
                        F.slice("w", i * _SEG_WORDS + 1, _SEG_WORDS), " "
                    )
                ),
            )
        ).alias("h"),
    )
    pair = segs.groupBy("doc_id", "source", "h").agg(
        F.count(F.lit(1)).alias("n_occ")
    )
    marked = pair.withColumn(
        "n_docs_h",
        F.count(F.lit(1)).over(Window.partitionBy("h")),
    )
    docstat = (
        marked.groupBy("doc_id", "source")
        .agg(
            F.sum("n_occ").alias("n_seg"),
            F.sum(
                F.when(F.col("n_docs_h") >= 2, F.col("n_occ")).otherwise(0)
            ).alias("n_dup"),
        )
    )
    return (
        docstat.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_seg").alias("n_segments"),
            F.sum("n_dup").alias("n_dup_segments"),
            _r6(
                F.try_divide(
                    F.sum("n_dup") * F.lit(1.0),
                    F.nullif(F.sum("n_seg"), F.lit(0)),
                )
            ).alias("dup_ratio"),
            F.sum(
                F.when(
                    2 * F.col("n_dup") > F.col("n_seg"), 1
                ).otherwise(0)
            ).alias("n_docs_flagged"),
        )
        .orderBy("source")
    )
