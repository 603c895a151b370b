"""Cross-source score calibration — the fix for 'source A's quality
scores are not on source B's scale' before any global threshold or
mixture decision:

- quantile_normalize_doclen: EXACT distributed quantile normalization
  (the genomics-standard transform): each doc's within-source
  percentile rank is mapped to the global distribution's value at the
  same rank. Within-source ranks are windows on the source key; the
  global rank runs through with_global_rank's range-partitioned
  prefix-sum; the rank->value mapping is a shuffle equi-join on the
  integer target rank. No approximation, no collect.
- source_length_calibration: the per-source quantile cutoff table
  (p10..p90 + a '__all__' row) — the compact artifact a curator reads
  before trusting a single global length threshold. Exact linear
  interpolation (Spark percentile == DuckDB quantile_cont, the
  value_percentiles contract).

Word count stands in for any per-doc quality score; the plan is
score-agnostic. Determinism: percentile ranks are exact rationals
computed from window row_numbers with doc_id tiebreaks; the target
rank is round(pr * (N-1)) + 1 on bit-identical doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stockpulse_spark.operators.rank import (
    with_global_rank,
    with_grouped_global_rank,
)
from stockpulse_spark.plans.registry import _r6, _register, _t

_TOK_FILTER = "text IS NOT NULL AND text <> ''"
_QS = (0.1, 0.25, 0.5, 0.75, 0.9)


def _doclen(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull() & (F.col("text") != ""))
        .select(
            "doc_id",
            "source",
            F.size(F.split("text", " ")).alias("wc"),
        )
    )


@_register(
    "quantile_normalize_doclen",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, source, len(string_split(text, ' ')) AS wc
      FROM documents WHERE {_TOK_FILTER}
    ), s AS (
      SELECT doc_id, source, wc,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY wc, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY source) AS n
      FROM d
    ), g AS (
      SELECT wc AS gwc,
             ROW_NUMBER() OVER (ORDER BY wc, doc_id) AS gr
      FROM d
    ), tot AS (SELECT COUNT(*) AS nn FROM d),
    pr AS (
      SELECT doc_id, source, wc,
             CASE WHEN n = 1 THEN 0.5
                  ELSE (rn - 1) * 1.0 / (n - 1) END AS pr
      FROM s
    ), tgt AS (
      SELECT p.doc_id, p.source, p.wc, p.pr,
             CAST(round(p.pr * (t.nn - 1)) AS BIGINT) + 1 AS tr
      FROM pr p CROSS JOIN tot t
    )
    SELECT tg.doc_id, tg.source, CAST(tg.wc AS BIGINT) AS n_words,
           ROUND(tg.pr, 6) AS source_pr,
           CAST(g.gwc AS BIGINT) AS calibrated_len
    FROM tgt tg JOIN g ON g.gr = tg.tr
    ORDER BY calibrated_len DESC, doc_id
    LIMIT 20
    """,
    tags=("llmdata", "rank", "window"),
    doc="Exact quantile normalization of per-doc length across "
    "sources: within-source percentile rank (row_number window with "
    "doc_id tiebreak; a 1-doc source pins pr=0.5) mapped to the "
    "global distribution's value at round(pr*(N-1))+1 — a shuffle "
    "equi-join on the integer target rank against the "
    "range-partitioned global rank (with_global_rank), so no "
    "single-task window and no approximation at any corpus size. "
    "Top-20 by calibrated value. The transform that puts source A's "
    "scores on source B's scale before a global cutoff.",
)
def q_quantile_normalize_doclen(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _doclen(spark, sf_dir)
    # within-source rank + count via the grouped prefix machinery —
    # the plain source-partitioned window caps parallelism at
    # |sources| (operators/rank.py::with_grouped_global_rank)
    ranked = with_grouped_global_rank(
        d, ["source"], "wc", "doc_id", rank_col="rn"
    )
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    s = ranked.join(
        F.broadcast(counts).withColumnRenamed("source", "__c_src"),
        F.col("source").eqNullSafe(F.col("__c_src")),
    ).drop("__c_src")
    pr = s.select(
        "doc_id",
        "source",
        "wc",
        F.when(F.col("n") == 1, 0.5)
        .otherwise((F.col("rn") - 1) * 1.0 / (F.col("n") - 1))
        .alias("pr"),
    )
    g = with_global_rank(
        d.select("wc", "doc_id"), "wc", "doc_id", rank_col="gr"
    ).select(F.col("wc").alias("gwc"), "gr")
    tot = d.agg(F.count(F.lit(1)).alias("nn"))
    tgt = pr.crossJoin(F.broadcast(tot)).select(
        "doc_id",
        "source",
        "wc",
        "pr",
        (
            F.round(F.col("pr") * (F.col("nn") - 1)).cast("bigint") + 1
        ).alias("tr"),
    )
    return (
        tgt.join(g, tgt["tr"] == g["gr"])
        .select(
            "doc_id",
            "source",
            F.col("wc").cast("long").alias("n_words"),
            _r6(F.col("pr")).alias("source_pr"),
            F.col("gwc").cast("long").alias("calibrated_len"),
        )
        .orderBy(F.desc("calibrated_len"), "doc_id")
        .limit(20)
    )


@_register(
    "source_length_calibration",
    oracle=f"""
    WITH d AS (
      SELECT source, len(string_split(text, ' ')) AS wc
      FROM documents WHERE {_TOK_FILTER}
    )
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           {", ".join(
               f"ROUND(quantile_cont(wc, {q}), 6)"
               f" AS p{int(q * 100)}" for q in _QS
           )}
    FROM d GROUP BY source
    UNION ALL
    SELECT '__all__', CAST(COUNT(*) AS BIGINT),
           {", ".join(
               f"ROUND(quantile_cont(wc, {q}), 6)" for q in _QS
           )}
    FROM d
    ORDER BY source
    """,
    tags=("llmdata", "agg", "percentile"),
    doc="Per-source length quantile cutoffs (p10..p90) plus the "
    "global '__all__' row — the calibration table read before "
    "trusting one global length threshold across heterogeneous "
    "sources. Exact interpolated percentiles (Spark percentile == "
    "DuckDB quantile_cont); two partial-agg passes over one scan. "
    "At 100 TB swap percentile_approx per the value_percentiles "
    "note.",
)
def q_source_length_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _doclen(spark, sf_dir).select("source", "wc")
    per = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        *[
            _r6(F.expr(f"percentile(wc, {q})")).alias(f"p{int(q * 100)}")
            for q in _QS
        ],
    )
    glob = d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        *[
            _r6(F.expr(f"percentile(wc, {q})")).alias(f"p{int(q * 100)}")
            for q in _QS
        ],
    ).select(F.lit("__all__").alias("source"), "*")
    return per.unionByName(
        glob.select("source", "n_docs", *[f"p{int(q * 100)}" for q in _QS])
    ).orderBy("source")
