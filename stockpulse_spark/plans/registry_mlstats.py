"""Statistical-learning extensions: a trained Naive-Bayes language
classifier, robust trimmed/winsorized means, a mergeable two-level
rollup (the incremental-view-maintenance contract), and one-way
ANOVA for hour-of-day effects.

Reference parity: the reference hard-codes its analytics
(app/dashboard.py); these supply the train->apply->evaluate loop a data
platform layers on top — a generative classifier trained in-plan
from corpus counts (vs `lang_id_confusion`'s fixed stopword argmax),
outlier-resistant location estimates, and the partial-aggregate
merge law that makes 100 TB rollups incremental.

Determinism: NB log-likelihoods are rounded to integer micro-nats
(BIGINT), so per-document scores are exact integer sums and the
argmax can never flip on float summation order; the mergeable rollup
carries integer-cents power sums, so merged and direct aggregates
agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stockpulse_spark.functions.nullsafe import nan_nn
from stockpulse_spark.plans.registry import _r6, _register, _t


@_register(
    "nb_lang_classifier",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang, unnest(string_split(text, ' ')) AS term
      FROM documents
    ), vocab AS (
      SELECT DISTINCT term FROM toks
    ), vsize AS (
      SELECT COUNT(*) AS v FROM vocab
    ), langs AS (
      SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang
    ), tot AS (
      SELECT SUM(n_docs) AS n_total FROM langs
    ), lc AS (
      SELECT lang, COUNT(*) AS n_tokens FROM toks GROUP BY lang
    ), wc AS (
      SELECT lang, term, COUNT(*) AS c FROM toks GROUP BY lang, term
    ), model AS (
      SELECT l.lang, vb.term,
             CAST(round(ln((COALESCE(wc.c, 0) + 1.0)
                           / (lc.n_tokens + vs.v)) * 1000000)
                  AS BIGINT) AS ll
      FROM langs l
      CROSS JOIN vocab vb
      CROSS JOIN vsize vs
      JOIN lc ON lc.lang = l.lang
      LEFT JOIN wc ON wc.lang = l.lang AND wc.term = vb.term
    ), prior AS (
      SELECT lang,
             CAST(round(ln(CAST(n_docs AS DOUBLE) / n_total) * 1000000)
                  AS BIGINT) AS lp
      FROM langs, tot
    ), scores AS (
      SELECT t.doc_id, t.lang AS true_lang, m.lang AS cand,
             SUM(m.ll) + MAX(p.lp) AS score
      FROM toks t
      JOIN model m ON m.term = t.term
      JOIN prior p ON p.lang = m.lang
      GROUP BY t.doc_id, t.lang, m.lang
    ), pred AS (
      SELECT doc_id, true_lang, cand AS pred_lang,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, cand) AS rk
      FROM scores
    )
    SELECT true_lang, pred_lang, COUNT(*) AS n_docs
    FROM pred WHERE rk = 1
    GROUP BY true_lang, pred_lang
    ORDER BY true_lang, pred_lang
    """,
    tags=("llmdata", "ml", "text"),
    doc="Multinomial Naive Bayes language classifier trained and "
    "applied in ONE plan: Laplace-smoothed per-(lang, term) "
    "log-likelihoods + doc-count priors from the corpus itself, "
    "argmax over summed token scores, reported as a confusion "
    "matrix against the labeled lang (the trained upgrade of "
    "`lang_id_confusion`'s fixed stopword argmax). Log-probs are "
    "rounded to integer MICRO-NATS, so every document score is an "
    "exact BIGINT sum — no float-summation order can flip the "
    "argmax in either engine. Scale shape: the model is vocab x "
    "langs, and the vocabulary is Heaps'-law UNBOUNDED (1e8+ terms "
    "at 100 TB), so the vocab stays distributed throughout — the "
    "lang replication broadcasts the METADATA-sized langs frame "
    "onto the vocab (never the reverse), and the scoring join on "
    "`term` is unhinted (AQE broadcasts at test scale, shuffle hash "
    "join at corpus scale). Only genuinely 1-row/|langs|-sized "
    "frames (vsize, tot, prior) carry broadcast hints. Scoring is "
    "one explode + equi-join + partial-agg shuffle on doc_id — "
    "scan-shaped at 100 TB.",
)
def q_nb_lang_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("term")
    )
    vocab = toks.select("term").distinct()
    vsize = vocab.agg(F.count(F.lit(1)).alias("v"))
    langs = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    tot = langs.agg(F.sum("n_docs").alias("n_total"))
    lc = toks.groupBy("lang").agg(F.count(F.lit(1)).alias("n_tokens"))
    wc = toks.groupBy("lang", "term").agg(F.count(F.lit(1)).alias("c"))
    model = (
        vocab.crossJoin(F.broadcast(langs.select("lang")))
        .crossJoin(F.broadcast(vsize))
        .join(lc, "lang")
        .join(wc, ["lang", "term"], "left")
        .select(
            "lang",
            "term",
            F.round(
                F.log(
                    (F.coalesce("c", F.lit(0)) + 1.0)
                    / (F.col("n_tokens") + F.col("v"))
                )
                * 1_000_000
            )
            .cast("bigint")
            .alias("ll"),
        )
    )
    prior = langs.join(F.broadcast(tot)).select(
        "lang",
        F.round(
            F.log(F.col("n_docs").cast("double") / F.col("n_total"))
            * 1_000_000
        )
        .cast("bigint")
        .alias("lp"),
    )
    scores = (
        toks.join(model.withColumnRenamed("lang", "cand"), "term")
        .join(
            F.broadcast(prior.withColumnRenamed("lang", "cand")), "cand"
        )
        .groupBy("doc_id", F.col("lang").alias("true_lang"), "cand")
        .agg((F.sum("ll") + F.max("lp")).alias("score"))
    )
    pred = scores.withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("doc_id").orderBy(
                F.desc("score"), "cand"
            )
        ),
    ).filter(F.col("rk") == 1)
    return (
        pred.groupBy("true_lang", F.col("cand").alias("pred_lang"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("true_lang", "pred_lang")
    )


@_register(
    "trimmed_stats_by_type",
    oracle="""
    WITH ev AS (
      -- NaN measures masked like NULL (nan_nn contract)
      SELECT * REPLACE (CASE WHEN NOT isfinite(value) THEN NULL
                        ELSE value END AS value)
      FROM events
    ), b AS (
      SELECT event_type,
             -- snapped to micro-units: interpolated percentiles differ
             -- between engines in the last ulp, and a duplicated value
             -- sitting exactly ON the cutoff flips membership (found by
             -- the sf1 sweep, where every value repeats 10x)
             ROUND(quantile_cont(value, 0.05), 6) AS p05,
             ROUND(quantile_cont(value, 0.95), 6) AS p95
      FROM ev GROUP BY event_type
    )
    SELECT e.event_type,
           COUNT(*) AS n,
           ROUND(AVG(e.value), 6) AS mean_raw,
           ROUND(AVG(e.value) FILTER (WHERE e.value BETWEEN b.p05 AND b.p95),
                 6) AS mean_trimmed,
           ROUND(AVG(LEAST(GREATEST(e.value, b.p05), b.p95)), 6)
             AS mean_winsorized,
           ROUND(b.p05, 6) AS p05, ROUND(b.p95, 6) AS p95
    FROM ev e JOIN b USING (event_type)
    GROUP BY e.event_type, b.p05, b.p95
    ORDER BY e.event_type
    """,
    tags=("robust", "agg", "analytics"),
    doc="5% trimmed and winsorized means per event type beside the "
    "raw mean — the robust location estimates that survive the fat "
    "tails `value_mad_outliers` detects. Exact interpolated "
    "percentile bounds (one agg pass) broadcast back onto the scan "
    "(TYPE-sized dim join); trimming is a conditional aggregate, "
    "winsorizing a clamp — both second-pass scan-shaped, no sort of "
    "the raw data. Two passes is the exact-quantile price; the "
    "approx_percentile twin pattern (registry_extras.py) is the "
    "single-pass 100 TB variant.",
)
def q_trimmed_stats_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").withColumn("value", nan_nn("value"))
    # cutoffs snapped to micro-units (both engines): boundary
    # membership must not depend on the last ulp of the interpolation
    b = ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.05)), 6).alias("p05"),
        F.round(F.percentile("value", F.lit(0.95)), 6).alias("p95"),
    )
    j = ev.join(F.broadcast(b), "event_type")
    clamped = F.least(
        F.greatest(F.col("value"), F.col("p05")), F.col("p95")
    )
    return (
        j.groupBy("event_type", "p05", "p95")
        .agg(
            F.count(F.lit(1)).alias("n"),
            _r6(F.avg("value")).alias("mean_raw"),
            _r6(
                F.avg(
                    F.when(
                        F.col("value").between(
                            F.col("p05"), F.col("p95")
                        ),
                        F.col("value"),
                    )
                )
            ).alias("mean_trimmed"),
            _r6(F.avg(clamped)).alias("mean_winsorized"),
        )
        .select(
            "event_type",
            "n",
            "mean_raw",
            "mean_trimmed",
            "mean_winsorized",
            _r6(F.col("p05")).alias("p05"),
            _r6(F.col("p95")).alias("p95"),
        )
        .orderBy("event_type")
    )


@_register(
    "mergeable_weekly_rollup",
    oracle="""
    WITH w AS (
      SELECT event_type, CAST(date_trunc('week', ts) AS DATE) AS week,
             COUNT(*) AS n,
             SUM(CAST(round((CASE WHEN NOT isfinite(value) THEN NULL ELSE value END) * 100) AS BIGINT)) AS s,
             SUM(CAST(round((CASE WHEN NOT isfinite(value) THEN NULL ELSE value END) * 100) AS BIGINT)
                 * CAST(round((CASE WHEN NOT isfinite(value) THEN NULL ELSE value END) * 100) AS BIGINT)) AS s2,
             MIN(CAST(round((CASE WHEN NOT isfinite(value) THEN NULL ELSE value END) * 100) AS BIGINT)) AS mn,
             MAX(CAST(round((CASE WHEN NOT isfinite(value) THEN NULL ELSE value END) * 100) AS BIGINT)) AS mx
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, week, n,
           ROUND(CAST(s AS DOUBLE) / n / 100.0, 6) AS avg_value,
           -- sample variance of a single observation is undefined
           ROUND(CASE WHEN n > 1 THEN
                   (CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE)
                    * CAST(s AS DOUBLE) / n) / (n - 1) / 10000.0 END, 6)
             AS var_value,
           ROUND(mn / 100.0, 6) AS min_value,
           ROUND(mx / 100.0, 6) AS max_value
    FROM w ORDER BY event_type, week
    """,
    tags=("warehouse", "agg", "incremental"),
    doc="Two-level mergeable rollup — the incremental-view-"
    "maintenance contract: Spark aggregates raw events to DAILY "
    "partial states (n, sum, sum-of-squares, min, max in integer "
    "cents), then merges ONLY those states to weekly; the oracle "
    "aggregates raw->weekly directly. Equality proves the state "
    "algebra is associative-exact, which is what lets a 100 TB "
    "pipeline maintain rollups by merging yesterday's sealed "
    "partials with today's delta instead of rescanning history "
    "(same law the HLL sketch rollup exercises for distincts). "
    "Integer power sums make merged variance bit-identical to "
    "direct variance.",
)
def q_mergeable_weekly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    cents = F.round(nan_nn("value") * 100).cast("bigint")
    daily = ev.groupBy(
        "event_type",
        F.date_trunc("day", "ts").alias("day"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cents).alias("s"),
        F.sum(cents * cents).alias("s2"),
        F.min(cents).alias("mn"),
        F.max(cents).alias("mx"),
    )
    weekly = daily.groupBy(
        "event_type",
        F.date_trunc("week", "day").cast("date").alias("week"),
    ).agg(
        F.sum("n").alias("n"),
        F.sum("s").alias("s"),
        F.sum("s2").alias("s2"),
        F.min("mn").alias("mn"),
        F.max("mx").alias("mx"),
    )
    sd = F.col("s").cast("double")
    return weekly.select(
        "event_type",
        "week",
        "n",
        _r6(sd / F.col("n") / 100.0).alias("avg_value"),
        _r6(
            F.when(
                F.col("n") > 1,
                (F.col("s2").cast("double") - sd * sd / F.col("n"))
                / (F.col("n") - 1)
                / 10000.0,
            )
        ).alias("var_value"),
        _r6(F.col("mn") / 100.0).alias("min_value"),
        _r6(F.col("mx") / 100.0).alias("max_value"),
    ).orderBy("event_type", "week")


@_register(
    "anova_hour_effect",
    oracle="""
    WITH g AS (
      SELECT event_type, hour(ts) AS hr,
             COUNT(*) AS n_g,
             SUM(CAST(round((CASE WHEN NOT isfinite(value) THEN NULL ELSE value END) * 100) AS BIGINT)) AS s_g,
             SUM(CAST(round((CASE WHEN NOT isfinite(value) THEN NULL ELSE value END) * 100) AS BIGINT)
                 * CAST(round((CASE WHEN NOT isfinite(value) THEN NULL ELSE value END) * 100) AS BIGINT)) AS s2_g
      FROM events GROUP BY 1, 2
    ), parts AS (
      SELECT event_type, COUNT(*) AS k,
             SUM(n_g) AS n, SUM(s_g) AS s, SUM(s2_g) AS s2,
             SUM(CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE) / n_g)
               AS sum_gsq
      FROM g GROUP BY event_type
    )
    SELECT event_type, k AS n_groups, CAST(n AS BIGINT) AS n_obs,
           ROUND((sum_gsq - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
                 / (k - 1)
                 / ((CAST(s2 AS DOUBLE) - sum_gsq) / (n - k)), 6)
             AS f_stat
    FROM parts ORDER BY event_type
    """,
    tags=("analytics", "agg", "stats"),
    doc="One-way ANOVA F-statistic for an hour-of-day effect on "
    "event value, per type: F = (SSB/(k-1)) / (SSW/(n-k)) with SSB/"
    "SSW derived from per-hour integer-cents power sums — the "
    "seasonality significance test behind `seasonal_profile`'s "
    "descriptive means. All within-group sums are exact BIGINTs; "
    "only the 24-term sum of S_g^2/n_g is floating point, summed "
    "over a groups-sized rollup. Two metadata-sized aggregations "
    "after one partial-agg shuffle of the scan.",
)
def q_anova_hour_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    cents = F.round(nan_nn("value") * 100).cast("bigint")
    g = ev.groupBy("event_type", F.hour("ts").alias("hr")).agg(
        F.count(F.lit(1)).alias("n_g"),
        F.sum(cents).alias("s_g"),
        F.sum(cents * cents).alias("s2_g"),
    )
    parts = g.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n_g").alias("n"),
        F.sum("s_g").alias("s"),
        F.sum("s2_g").alias("s2"),
        F.sum(
            F.col("s_g").cast("double")
            * F.col("s_g").cast("double")
            / F.col("n_g")
        ).alias("sum_gsq"),
    )
    sd = F.col("s").cast("double")
    return parts.select(
        "event_type",
        F.col("k").alias("n_groups"),
        F.col("n").alias("n_obs"),
        _r6(
            (F.col("sum_gsq") - sd * sd / F.col("n"))
            / (F.col("k") - 1)
            / (
                (F.col("s2").cast("double") - F.col("sum_gsq"))
                / (F.col("n") - F.col("k"))
            )
        ).alias("f_stat"),
    ).orderBy("event_type")
