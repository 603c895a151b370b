"""The dashboard's full indicator computation as ONE query (reference
app/dashboard.py:84-145 `calculate_technical_indicators`: the pandas
stage that adds every indicator column before charting).

This is the showcase for the expression-library design: ten indicator
columns in one select, and because every window shares the partitioning
(user_id ordered by bucket_start), Catalyst plans ONE exchange + sort
for the whole panel — the pandas version walks the frame column by
column, chart by chart."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stockpulse_spark.plans.registry import (
    _BARS_CTE,
    _hourly_bars,
    _r6,
    _register,
)

_W = "PARTITION BY user_id ORDER BY bucket_start"


@_register(
    "indicator_panel",
    oracle=_BARS_CTE
    + f"""
    , d AS (
      SELECT *, close - lag(close) OVER ({_W}) AS delta FROM bars
    ), p AS (
      SELECT user_id, bucket_start, close, volume,
             AVG(close) OVER w5 AS sma5,
             CASE WHEN COUNT(close) OVER w20 >= 20 THEN AVG(close) OVER w20 END AS sma20,
             CASE WHEN COUNT(close) OVER w20 >= 20 THEN STDDEV_SAMP(close) OVER w20 END AS sd20,
             CASE WHEN COUNT(greatest(delta, 0.0)) OVER w14 >= 14
                  THEN AVG(greatest(delta, 0.0)) OVER w14 END AS ag,
             CASE WHEN COUNT(greatest(-delta, 0.0)) OVER w14 >= 14
                  THEN AVG(greatest(-delta, 0.0)) OVER w14 END AS al,
             lag(close, 10) OVER ({_W}) AS close10,
             CASE WHEN COUNT(low) OVER w14 >= 14 THEN MIN(low) OVER w14 END AS lo14,
             CASE WHEN COUNT(high) OVER w14 >= 14 THEN MAX(high) OVER w14 END AS hi14,
             CASE WHEN COUNT(close) OVER wcum > 0 THEN
               list_reduce(list(close * volume)
                             FILTER (close IS NOT NULL) OVER wcum,
                           (a, b) -> a + b)
               / SUM(volume) OVER wcum END AS vwap
      FROM d
      WINDOW w5 AS ({_W} ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
             w14 AS ({_W} ROWS BETWEEN 13 PRECEDING AND CURRENT ROW),
             w20 AS ({_W} ROWS BETWEEN 19 PRECEDING AND CURRENT ROW),
             wcum AS ({_W} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, bucket_start, ROUND(close, 6) AS close,
           ROUND(sma5, 6) AS sma5,
           ROUND(sma20, 6) AS bb_mid,
           ROUND(sma20 + 2 * sd20, 6) AS bb_upper,
           ROUND(sma20 - 2 * sd20, 6) AS bb_lower,
           ROUND(CASE WHEN al = 0 AND ag = 0 THEN NULL
                      WHEN al = 0 THEN 100.0
                      ELSE 100.0 - 100.0 / (1.0 + ag / al) END, 6) AS rsi14,
           ROUND(100.0 * (close - close10) / close10, 6) AS roc10,
           ROUND(close - close10, 6) AS momentum10,
           ROUND(CASE WHEN hi14 != lo14
                      THEN 100.0 * (close - lo14) / (hi14 - lo14) END, 6) AS stoch_k,
           ROUND(vwap, 6) AS vwap
    FROM p
    """,
    headline=True,
    tags=("window", "indicator", "panel"),
    doc="the dashboard's whole indicator stage as one plan: SMA5, "
    "Bollinger(20,2), RSI(14), ROC/momentum(10), stochastic %K, "
    "cumulative VWAP — ten derived columns, ONE window exchange "
    "(asserted in test_plan_shapes).",
)
def q_indicator_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = _hourly_bars(spark, sf_dir)
    wb = Window.partitionBy("user_id").orderBy("bucket_start")
    w5, w14, w20 = wb.rowsBetween(-4, 0), wb.rowsBetween(-13, 0), wb.rowsBetween(-19, 0)
    wcum = wb.rowsBetween(Window.unboundedPreceding, 0)

    delta = F.col("close") - F.lag("close", 1).over(wb)
    d = bars.select("user_id", "bucket_start", "close", "volume", "high", "low",
                    delta.alias("delta"))

    gain = F.greatest(F.col("delta"), F.lit(0.0))
    loss = F.greatest(-F.col("delta"), F.lit(0.0))
    # two-select shape: every (function, frame) window aggregate is
    # named exactly ONCE here; the min_periods guards derive from the
    # named counts in the next projection.  Embedding the count guard
    # inside each guarded aggregate put 3 duplicated count windows in
    # the Window node (Catalyst does not dedup window expressions) —
    # caught by the round-8 de-blinded duplicate sweep.
    raw = d.select(
        "user_id",
        "bucket_start",
        "close",
        F.avg("close").over(w5).alias("sma5"),
        F.count("close").over(w20).alias("__n20"),
        F.avg("close").over(w20).alias("__sma20"),
        F.stddev_samp("close").over(w20).alias("__sd20"),
        F.count(gain).over(w14).alias("__n14d"),
        F.avg(gain).over(w14).alias("__ag"),
        F.avg(loss).over(w14).alias("__al"),
        F.count("low").over(w14).alias("__n14"),
        F.min("low").over(w14).alias("__lo14"),
        F.max("high").over(w14).alias("__hi14"),
        F.lag("close", 10).over(wb).alias("close10"),
        (F.sum(F.col("close") * F.col("volume")).over(wcum)
         / F.sum("volume").over(wcum)).alias("vwap"),
    )
    p = raw.select(
        "user_id",
        "bucket_start",
        "close",
        "sma5",
        F.when(F.col("__n20") >= 20, F.col("__sma20")).alias("sma20"),
        F.when(F.col("__n20") >= 20, F.col("__sd20")).alias("sd20"),
        F.when(F.col("__n14d") >= 14, F.col("__ag")).alias("ag"),
        F.when(F.col("__n14d") >= 14, F.col("__al")).alias("al"),
        "close10",
        F.when(F.col("__n14") >= 14, F.col("__lo14")).alias("lo14"),
        F.when(F.col("__n14") >= 14, F.col("__hi14")).alias("hi14"),
        "vwap",
    )
    rsi = (
        F.when((F.col("al") == 0) & (F.col("ag") == 0), F.lit(None))
        .when(F.col("al") == 0, F.lit(100.0))
        .otherwise(100.0 - 100.0 / (1.0 + F.col("ag") / F.col("al")))
    )
    stoch = F.when(
        F.col("hi14") != F.col("lo14"),
        100.0 * (F.col("close") - F.col("lo14")) / (F.col("hi14") - F.col("lo14")),
    )
    return p.select(
        "user_id",
        "bucket_start",
        _r6(F.col("close")).alias("close"),
        _r6(F.col("sma5")).alias("sma5"),
        _r6(F.col("sma20")).alias("bb_mid"),
        _r6(F.col("sma20") + 2 * F.col("sd20")).alias("bb_upper"),
        _r6(F.col("sma20") - 2 * F.col("sd20")).alias("bb_lower"),
        _r6(rsi).alias("rsi14"),
        _r6(
            F.try_divide(100.0 * (F.col("close") - F.col("close10")), F.col("close10"))
        ).alias("roc10"),
        _r6(F.col("close") - F.col("close10")).alias("momentum10"),
        _r6(stoch).alias("stoch_k"),
        _r6(F.col("vwap")).alias("vwap"),
    )
