"""Session path analysis, robust MAD outliers, and the revenue
waterfall.

Reference parity: the reference's dashboard shows activity counts and
mean/std outlier bands; these add the product-analytics path table
(what do sessions actually DO), the robust-statistics outlier gate
(MAD survives the heavy tails that blow up mean/std fences), and the
month-over-month price decomposition every finance review starts from.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stockpulse_spark.functions.nullsafe import nan_nn
from stockpulse_spark.plans.registry import _r4, _r6, _register, _t


@_register(
    "session_paths_topk",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id))
                    > 1800000000
                  OR lag(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), sess AS (
      SELECT user_id, ts, event_id, event_type,
             SUM(new_session) OVER (PARTITION BY user_id
               ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
      FROM flagged
    ), paths AS (
      SELECT user_id, session_id,
             -- coalesce: an all-NULL-type session is the empty path on
             -- both engines (string_agg of zero non-null rows is NULL,
             -- Spark's array_join of skipped nulls is '')
             coalesce(string_agg(event_type, '>' ORDER BY ts, event_id),
                      '') AS path,
             COUNT(*) AS path_len
      FROM sess
      GROUP BY user_id, session_id
      HAVING COUNT(*) <= 8
    )
    SELECT path, COUNT(*) AS n_sessions,
           ROUND(AVG(path_len), 6) AS avg_len
    FROM paths GROUP BY path
    ORDER BY n_sessions DESC, path LIMIT 15
    """,
    tags=("analytics", "session"),
    doc="Top session paths: the ordered event-type sequence of each "
    "session (<= 8 events; longer sessions are power-user noise for "
    "this table), counted and ranked. Spark's collect_list has no "
    "ordering guarantee, so the path is built by sorting an array of "
    "(ts, event_id, type) STRUCTS — array_sort on structs is "
    "lexicographic and fully tie-broken, bit-identical to DuckDB's "
    "string_agg(... ORDER BY ts, event_id). Per-session arrays are "
    "bounded (8), top-15 fully tie-broken via TakeOrdered.",
)
def q_session_paths_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    new_session = F.when(
        prev.isNull()
        | (
            (F.unix_micros(F.col("ts")) - F.unix_micros(prev))
            > 1_800_000_000
        ),
        1,
    ).otherwise(0)
    sess = ev.select(
        "user_id", "ts", "event_id", "event_type",
        new_session.alias("new_session"),
    ).withColumn(
        "session_id",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    paths = (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("ts", "event_id", "event_type")
                        )
                    ),
                    lambda s: s.getField("event_type"),
                ),
                ">",
            ).alias("path"),
            F.count(F.lit(1)).alias("path_len"),
        )
        .filter(F.col("path_len") <= 8)
    )
    return (
        paths.groupBy("path")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            _r6(F.avg("path_len")).alias("avg_len"),
        )
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(15)
    )


@_register(
    "value_mad_outliers",
    oracle="""
    WITH ev AS (
      -- NaN measures masked like NULL (nan_nn contract)
      SELECT * REPLACE (CASE WHEN NOT isfinite(value) THEN NULL
                        ELSE value END AS value)
      FROM events
    ), med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM ev GROUP BY event_type
    ), dev AS (
      SELECT e.event_type, e.value, m.med,
             abs(e.value - m.med) AS adev
      FROM ev e JOIN med m USING (event_type)
    ), mad AS (
      SELECT event_type, quantile_cont(adev, 0.5) AS mad
      FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
           COUNT(*) AS n,
           ROUND(MAX(d.med), 6) AS median,
           ROUND(MAX(m.mad), 6) AS mad,
           CAST(SUM(CASE WHEN d.adev > 3 * 1.4826 * m.mad
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM dev d JOIN mad m USING (event_type)
    GROUP BY d.event_type ORDER BY d.event_type
    """,
    tags=("analytics", "percentile", "quality"),
    doc="Robust outlier gate per event type: median absolute "
    "deviation with the 1.4826 normal-consistency factor, flagging "
    "|x - median| > 3 sigma-equivalents. Mean/std fences (the "
    "rolling_outliers family) move with the outliers they hunt; MAD "
    "has a 50% breakdown point. Two exact-percentile aggregations "
    "(the pinned percentile==quantile_cont pairing) with the "
    "TYPE-sized median/MAD tables broadcast back — at 100 TB swap "
    "percentile for approx_percentile exactly as "
    "value_percentiles_approx does.",
)
def q_value_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").withColumn("value", nan_nn("value"))
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type",
        "value",
        "med",
        F.abs(F.col("value") - F.col("med")).alias("adev"),
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            _r6(F.max("med")).alias("median"),
            _r6(F.max("mad")).alias("mad"),
            F.sum(
                F.when(
                    F.col("adev") > 3 * 1.4826 * F.col("mad"), 1
                ).otherwise(0)
            ).alias("n_outliers"),
        )
        .orderBy("event_type")
    )


@_register(
    "revenue_waterfall_monthly",
    oracle="""
    SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS month,
           ROUND(SUM(l_extendedprice), 4) AS gross,
           ROUND(SUM(l_extendedprice * l_discount), 4) AS discount_amt,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS net,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * l_tax), 4)
             AS tax_amt,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4)
             AS charged
    FROM lineitem
    GROUP BY 1 ORDER BY month
    """,
    tags=("analytics", "agg"),
    doc="Monthly revenue waterfall: gross -> discount -> net -> tax "
    "-> charged, the TPC-H Q1 money math cut by ship month in ONE "
    "partial-agg pass (five conditional sums share the scan; a "
    "BI-tool naive version runs five queries). Months-sized output "
    "at any scale; the scan prunes to four columns.",
)
def q_revenue_waterfall_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    ep, d, t = F.col("l_extendedprice"), F.col("l_discount"), F.col("l_tax")
    return (
        li.groupBy(F.date_trunc("month", "l_shipdate").alias("month"))
        .agg(
            _r4(F.sum(ep)).alias("gross"),
            _r4(F.sum(ep * d)).alias("discount_amt"),
            _r4(F.sum(ep * (1 - d))).alias("net"),
            _r4(F.sum(ep * (1 - d) * t)).alias("tax_amt"),
            _r4(F.sum(ep * (1 - d) * (1 + t))).alias("charged"),
        )
        .orderBy("month")
    )


def _lang_confusion_oracle() -> str:
    from stockpulse_spark.llmdata.textstats import LANG_STOPWORDS
    from stockpulse_spark.plans.registry_llmdata import _HITS, _LANG_CASE

    hits = " , ".join(
        f"{_HITS[lang]} AS __h_{lang}" for lang in sorted(LANG_STOPWORDS)
    )
    mx = ", ".join("__h_" + lang for lang in sorted(LANG_STOPWORDS))
    return f"""
    WITH base AS (
      SELECT lang, text, {hits} FROM documents
    ), feat AS (
      SELECT *, greatest({mx}) AS __m FROM base
    ), g AS (
      SELECT lang, {_LANG_CASE} AS guess FROM feat
    ), counts AS (
      SELECT lang, guess, COUNT(*) AS n FROM g GROUP BY lang, guess
    )
    SELECT lang, guess, n,
           ROUND(n * 1.0 / SUM(n) OVER (PARTITION BY lang), 6) AS rate
    FROM counts ORDER BY lang, guess
    """


@_register(
    "lang_id_confusion",
    oracle=_lang_confusion_oracle(),
    tags=("llmdata", "text", "agg"),
    doc="Language-ID evaluation: confusion matrix of the stopword-"
    "argmax guesser (llmdata/textstats.py:lang_guess) against the "
    "corpus's labeled lang column, with per-cell counts and "
    "row-normalized rates. The eval query a curator runs before "
    "trusting a heuristic classifier to route 100 TB — guesses and "
    "labels reduce to a LANGS x LANGS matrix in one conditional "
    "pass; the classifier itself is pure Column expressions in "
    "codegen.",
)
def q_lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stockpulse_spark.llmdata.textstats import lang_guess

    d = (
        _t(spark, sf_dir, "documents")
        .select("lang", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    g = d.select("lang", lang_guess(F.col("text")).alias("guess"))
    counts = g.groupBy("lang", "guess").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("lang")
    return counts.select(
        "lang",
        "guess",
        "n",
        _r6(F.col("n") * 1.0 / F.sum("n").over(w)).alias("rate"),
    ).orderBy("lang", "guess")
