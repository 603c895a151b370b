"""Corpus novelty decay and classical seasonal decomposition — one
curation-ordering operator and one time-series structure operator.

`doc_ngram_novelty` measures, for each document in arrival (doc_id)
order, the share of its 5-gram shingles never seen in any earlier
document — the novelty curve dedup/sampling pipelines use to decide
when a source is exhausted. The global first-seen table is one shuffle
on the gram key (the decontamination_overlap shape).

`revenue_seasonal_decompose` is the additive trend/seasonal/residual
split on monthly revenue: centered 13-month moving average as trend,
month-of-year mean of the detrended series as the seasonal component.
Revenue snaps to integer cents before any window (the cohort-LTV
discipline)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stockpulse_spark.plans.registry import _r4, _r6, _register, _t


@_register(
    "doc_ngram_novelty",
    oracle="""
    WITH ws AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), grams AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, len(w) - 3),
                    i -> array_to_string(w[i:i+4], ' '))) AS g
      FROM ws WHERE len(w) >= 5
    ), first_seen AS (
      SELECT g, MIN(doc_id) AS first_doc FROM grams GROUP BY g
    )
    SELECT gr.doc_id,
           COUNT(*) AS n_grams,
           SUM(CASE WHEN fs.first_doc = gr.doc_id THEN 1 ELSE 0 END)
             AS n_novel,
           ROUND(SUM(CASE WHEN fs.first_doc = gr.doc_id
                          THEN 1.0 ELSE 0.0 END) / COUNT(*), 6)
             AS novelty
    FROM grams gr JOIN first_seen fs ON gr.g = fs.g
    GROUP BY gr.doc_id ORDER BY gr.doc_id
    """,
    tags=("llmdata", "text", "dedup"),
    doc="novelty decay: per document (in doc_id arrival order), the "
    "fraction of its distinct 5-gram shingles first introduced by "
    "THIS document. first-seen is min(doc_id) per gram — one shuffle "
    "on the gram key with map-side combine; the re-join broadcasts "
    "nothing bigger than the gram table it already built. The curve "
    "every data-mixing pipeline reads to decide a source is mined "
    "out.",
)
def q_doc_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    words = docs.select(
        "doc_id", F.split("text", " ").alias("w")
    ).filter(F.size("w") >= 5)
    grams = words.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(w) - 4), "
                "i -> concat_ws(' ', slice(w, i, 5)))"
            )
        ).alias("g"),
    ).distinct()
    first_seen = grams.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    novel = F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
    return (
        grams.join(first_seen, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(novel).alias("n_novel"),
            _r6(
                F.sum(novel.cast("double")) / F.count(F.lit(1))
            ).alias("novelty"),
        )
        .orderBy("doc_id")
    )


@_register(
    "revenue_seasonal_decompose",
    oracle="""
    WITH monthly AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
             CAST(ROUND(SUM(o_totalprice * 100)) AS BIGINT) AS cents
      FROM orders GROUP BY 1
    ), trended AS (
      SELECT m, cents,
             CASE WHEN COUNT(*) OVER w = 13
                  THEN AVG(cents) OVER w END AS trend_cents
      FROM monthly
      WINDOW w AS (ORDER BY m ROWS BETWEEN 6 PRECEDING AND 6 FOLLOWING)
    ), detrended AS (
      SELECT m, cents, trend_cents,
             cents - trend_cents AS dt
      FROM trended
    ), seasonal AS (
      SELECT EXTRACT(month FROM m) AS moy, AVG(dt) AS s_cents
      FROM detrended WHERE dt IS NOT NULL GROUP BY 1
    )
    SELECT d.m AS month,
           ROUND(d.cents / 100.0, 4) AS revenue,
           ROUND(d.trend_cents / 100.0, 4) AS trend,
           ROUND(s.s_cents / 100.0, 4) AS seasonal,
           ROUND((d.dt - s.s_cents) / 100.0, 4) AS residual
    FROM detrended d
    JOIN seasonal s ON EXTRACT(month FROM d.m) = s.moy
    ORDER BY d.m
    """,
    tags=("window", "agg", "seasonal"),
    doc="additive seasonal decomposition of monthly revenue: trend = "
    "centered 13-month moving average (strict full window), seasonal "
    "= month-of-year mean of the detrended series, residual = the "
    "rest. Monthly revenue snaps to integer cents first, so the "
    "windows fold exact integers; the series itself is months-sized "
    "metadata after one fact shuffle.",
)
def q_revenue_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.trunc("o_orderdate", "month").alias("m")
    ).agg(
        F.round(F.sum(F.col("o_totalprice") * 100))
        .cast("bigint")
        .alias("cents")
    )
    w = Window.orderBy("m").rowsBetween(-6, 6)
    trended = monthly.select(
        "m",
        "cents",
        F.when(F.count(F.lit(1)).over(w) == 13, F.avg("cents").over(w)).alias(
            "trend_cents"
        ),
    )
    detrended = trended.withColumn(
        "dt", F.col("cents") - F.col("trend_cents")
    )
    seasonal = (
        detrended.filter(F.col("dt").isNotNull())
        .groupBy(F.month("m").alias("moy"))
        .agg(F.avg("dt").alias("s_cents"))
    )
    return (
        detrended.join(
            F.broadcast(seasonal), F.month("m") == F.col("moy")
        )
        .select(
            F.col("m").alias("month"),
            _r4(F.col("cents") / 100.0).alias("revenue"),
            _r4(F.col("trend_cents") / 100.0).alias("trend"),
            _r4(F.col("s_cents") / 100.0).alias("seasonal"),
            _r4((F.col("dt") - F.col("s_cents")) / 100.0).alias("residual"),
        )
        .orderBy("month")
    )
