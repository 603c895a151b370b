"""Seasonality, binning, repetition, and transition-matrix shapes.

Reference parity: the reference's dashboard reads hourly/weekday
activity heatmaps off pandas pivots (hourly_volume_pivot is the direct
twin); these four go further — seasonality STRENGTH as a variance
decomposition, equal-frequency feature binning, Gopher-style
within-document repetition filtering, and the user-journey Markov
matrix. All single-pass window/agg plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stockpulse_spark.functions.nullsafe import nan_nn
from stockpulse_spark.operators.rank import (
    ntile_from_rank,
    with_grouped_global_rank,
)
from stockpulse_spark.plans.registry import _r6, _register, _t


@_register(
    "seasonal_profile",
    oracle="""
    WITH ev AS (
      -- NaN measures masked like NULL (engine contract; see
      -- nullsafe.nan_nn) — COUNT(*) still counts every row
      SELECT * REPLACE (CASE WHEN NOT isfinite(value) THEN NULL
                        ELSE value END AS value)
      FROM events
    ), cells AS (
      SELECT event_type, isodow(ts) AS dow, hour(ts) AS hod,
             COUNT(*) AS n, AVG(value) AS cell_mean
      FROM ev GROUP BY 1, 2, 3
    ), tot AS (
      SELECT event_type, AVG(value) AS grand_mean,
             var_pop(value) AS total_var, COUNT(*) AS n_total
      FROM ev GROUP BY 1
    ), between_var AS (
      SELECT c.event_type,
             SUM(c.n * (c.cell_mean - t.grand_mean)
                     * (c.cell_mean - t.grand_mean)) / t.n_total AS bv
      FROM cells c JOIN tot t USING (event_type)
      GROUP BY c.event_type, t.n_total
    ), peak AS (
      SELECT event_type, dow AS peak_dow, hod AS peak_hod,
             cell_mean AS peak_mean
      FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                  ORDER BY cell_mean DESC, dow, hod) AS rn
        FROM cells
      ) WHERE rn = 1
    )
    SELECT t.event_type,
           ROUND(t.grand_mean, 6) AS grand_mean,
           ROUND(b.bv / t.total_var, 6) AS seasonal_eta2,
           p.peak_dow, p.peak_hod,
           ROUND(p.peak_mean, 6) AS peak_mean
    FROM tot t
    JOIN between_var b USING (event_type)
    JOIN peak p USING (event_type)
    ORDER BY t.event_type
    """,
    tags=("analytics", "agg"),
    doc="Seasonality strength per event type: eta-squared of the "
    "(iso-weekday x hour) cell decomposition — the share of value "
    "variance explained by when-in-the-week — plus the peak cell. "
    "Two partial-agg passes over events (per-type moments, per-cell "
    "means); the cell table is 5x7x24 rows at ANY data scale, so "
    "everything after the two scans is metadata-sized. isodow keeps "
    "the weekday numbering identical across engines (Spark weekday()"
    "+1 == DuckDB isodow).",
)
def q_seasonal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").withColumn("value", nan_nn("value"))
    cells = ev.groupBy(
        "event_type",
        (F.weekday("ts") + 1).alias("dow"),
        F.hour("ts").alias("hod"),
    ).agg(F.count(F.lit(1)).alias("n"), F.avg("value").alias("cell_mean"))
    tot = ev.groupBy("event_type").agg(
        F.avg("value").alias("grand_mean"),
        F.var_pop("value").alias("total_var"),
        F.count(F.lit(1)).alias("n_total"),
    )
    dev = F.col("cell_mean") - F.col("grand_mean")
    between = (
        cells.join(F.broadcast(tot), "event_type")
        .groupBy("event_type", "n_total")
        .agg((F.sum(F.col("n") * dev * dev) / F.col("n_total")).alias("bv"))
    )
    wp = Window.partitionBy("event_type").orderBy(
        F.col("cell_mean").desc(), "dow", "hod"
    )
    peak = (
        cells.withColumn("rn", F.row_number().over(wp))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("dow").alias("peak_dow"),
            F.col("hod").alias("peak_hod"),
            F.col("cell_mean").alias("peak_mean"),
        )
    )
    return (
        tot.join(F.broadcast(between.select("event_type", "bv")), "event_type")
        .join(F.broadcast(peak), "event_type")
        .select(
            "event_type",
            _r6(F.col("grand_mean")).alias("grand_mean"),
            _r6(F.col("bv") / F.col("total_var")).alias("seasonal_eta2"),
            "peak_dow",
            "peak_hod",
            _r6(F.col("peak_mean")).alias("peak_mean"),
        )
        .orderBy("event_type")
    )


@_register(
    "value_ntile_features",
    oracle="""
    WITH t AS (
      SELECT event_type, value,
             ntile(10) OVER (PARTITION BY event_type
                             ORDER BY value, event_id) AS decile
      FROM events
    )
    SELECT event_type, decile, COUNT(*) AS n,
           ROUND(MIN(value), 6) AS lo,
           ROUND(MAX(value), 6) AS hi,
           ROUND(AVG(value), 6) AS avg_value
    FROM t GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=("analytics", "window"),
    doc="Equal-frequency binning (decile features): exact ntile(10) "
    "per event type over a fully-specified order (value, event_id — "
    "ties broken by key so both engines assign identical buckets), "
    "then per-bin stats. A plain ntile() OVER (PARTITION BY "
    "event_type) caps parallelism at |event types| (5 tasks each "
    "sorting a fifth of the table at ANY scale); instead the decile "
    "comes from operators/rank.py::with_grouped_global_rank — one "
    "range repartition on (type, value, id) with a per-group "
    "prefix-sum, every partition a task — plus the closed-form "
    "ntile_from_rank arithmetic against broadcast per-type totals. "
    "The approx twin (value_percentiles_approx) remains the "
    "single-pass sketch path when exactness is negotiable.",
)
def q_value_ntile_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("event_id", "event_type", "value")
    ranked = with_grouped_global_rank(
        ev, ["event_type"], "value", "event_id", rank_col="__rnk"
    )
    totals = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("__n"))
    t = ranked.join(
        F.broadcast(totals).withColumnRenamed("event_type", "__t_type"),
        F.col("event_type").eqNullSafe(F.col("__t_type")),
    ).select(
        "event_type",
        "value",
        ntile_from_rank(F.col("__rnk"), F.col("__n"), 10).alias("decile"),
    )
    return (
        t.groupBy("event_type", "decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            _r6(F.min("value")).alias("lo"),
            _r6(F.max("value")).alias("hi"),
            _r6(F.avg("value")).alias("avg_value"),
        )
        .orderBy("event_type", "decile")
    )


# word 3-gram shingles, DuckDB side (inclusive slice i..i+2)
_D_3GRAMS = (
    "list_transform(range(1, greatest(len(string_split(text, ' ')) - 2, 0) + 1), "
    "i -> array_to_string((string_split(text, ' '))[i:i+2], ' '))"
)


@_register(
    "doc_repetition_score",
    oracle=f"""
    WITH per_doc AS (
      SELECT source,
             len({_D_3GRAMS}) AS n_grams,
             len(list_distinct({_D_3GRAMS})) AS n_distinct
      FROM documents
    ), scored AS (
      SELECT source, n_grams,
             CASE WHEN n_grams > 0
                  THEN 1.0 - n_distinct * 1.0 / n_grams
                  ELSE 0.0 END AS rep_ratio
      FROM per_doc
    )
    SELECT source,
           COUNT(*) AS n_docs,
           ROUND(AVG(rep_ratio), 6) AS avg_rep_ratio,
           CAST(SUM(CASE WHEN rep_ratio > 0.2 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
    FROM scored GROUP BY source ORDER BY source
    """,
    tags=("llmdata", "text"),
    doc="Gopher-style repetition filter: per-document duplicated "
    "3-gram fraction (1 - distinct/total word-3-grams), averaged per "
    "source with a >0.2 flag count — the signal that catches "
    "keyword-stuffed and template-generated text that length/"
    "stopword quality features miss. Pure Column expressions over "
    "the in-row token array (no explode, no shuffle before the "
    "per-source agg) — embarrassingly parallel at any scale.",
)
def q_doc_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        _t(spark, sf_dir, "documents")
        .select("source", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    from stockpulse_spark.llmdata.dedup import word_ngrams

    # round 10: zip_with n-grams — the old transform(sequence, slice)
    # re-split the text per gram position (interpreted HOF capture)
    grams = word_ngrams(F.col("text"), 3)
    per_doc = d.select(
        "source",
        F.size(grams).alias("n_grams"),
        F.size(F.array_distinct(grams)).alias("n_distinct"),
    )
    rep = F.when(
        F.col("n_grams") > 0,
        1.0 - F.col("n_distinct") * 1.0 / F.col("n_grams"),
    ).otherwise(F.lit(0.0))
    return (
        per_doc.select("source", rep.alias("rep_ratio"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            _r6(F.avg("rep_ratio")).alias("avg_rep_ratio"),
            F.sum(
                F.when(F.col("rep_ratio") > 0.2, 1).otherwise(0)
            ).alias("n_flagged"),
        )
        .orderBy("source")
    )


@_register(
    "event_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT event_type AS cur,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
      FROM events
    ), counts AS (
      SELECT cur, nxt, COUNT(*) AS n
      FROM seq WHERE nxt IS NOT NULL GROUP BY cur, nxt
    )
    SELECT cur, nxt, n,
           ROUND(n * 1.0 / SUM(n) OVER (PARTITION BY cur), 6) AS p
    FROM counts ORDER BY cur, nxt
    """,
    tags=("analytics", "window"),
    doc="User-journey Markov transition matrix: P(next event type | "
    "current) from per-user event sequences (lead over the fully-"
    "tie-broken (ts, event_id) order). One shuffle to sequence per "
    "user, one partial-agg shuffle to the TYPE x TYPE count matrix "
    "(25 cells at any scale), then the row-normalising window runs "
    "on metadata. The funnel/sessionization family's third member — "
    "where event_funnel asks 'did the path happen', this asks 'what "
    "paths exist'.",
)
def q_event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    counts = seq.groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("n"))
    wn = Window.partitionBy("cur")
    return counts.select(
        "cur",
        "nxt",
        "n",
        _r6(F.col("n") * 1.0 / F.sum("n").over(wn)).alias("p"),
    ).orderBy("cur", "nxt")
