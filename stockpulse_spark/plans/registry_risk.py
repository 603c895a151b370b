"""Portfolio/risk analytics over the per-user EOD series: Sharpe and
Sortino ratios, exact VaR/CVaR, rolling higher moments (skewness /
kurtosis), candlestick pattern detection, floor-trader pivot points,
drawdown durations, and the pairwise return-correlation screen.

These extend the reference's indicator stage (app/dashboard.py:84-145)
with the risk metrics a quant desk computes from the same bars. All are
single-pass window/agg plans over the (user_id, date) series — the
shapes scale exactly like the indicator panel: one shuffle on user_id,
windows sorted within partitions, map-side partial aggregation for the
per-user reductions.

Float discipline: every derived metric uses the SAME algebraic form in
the Spark plan and the DuckDB oracle (shared subexpressions, identical
operation order) so the 6-decimal rounding hashes identically."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stockpulse_spark.functions.nullsafe import nan_nn, corr_nn, max_by_nn, min_by_nn

from stockpulse_spark.plans.registry import _r4, _r6, _register, _t

# daily EOD bars from events (shared CTE text for the oracles)
_DAILY_CTE = """
WITH daily AS (
  -- HAVING: a day with no non-NULL price has no bar (arg_max skips
  -- NULLs, so close IS NULL <=> the whole day was NULL); a NULL bar
  -- inside a recursive series (EMA/Heikin-Ashi) would poison every
  -- later row in one engine and not the other
  SELECT user_id, CAST(ts AS DATE) AS date,
         first(value ORDER BY ts, value) FILTER (WHERE value IS NOT NULL AND isfinite(value)) AS open,
         max(value) FILTER (WHERE isfinite(value))         AS high,
         min(value) FILTER (WHERE isfinite(value))         AS low,
         last(value ORDER BY ts, value) FILTER (WHERE value IS NOT NULL AND isfinite(value)) AS close
  FROM events GROUP BY user_id, CAST(ts AS DATE)
  HAVING last(value ORDER BY ts, value) FILTER (WHERE value IS NOT NULL AND isfinite(value)) IS NOT NULL
)
"""

_WD = "PARTITION BY user_id ORDER BY date"


def _daily_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.to_date("ts").alias("date"))
        .agg(
            min_by_nn(nan_nn("value"), "ts").alias("open"),
            F.max(nan_nn("value")).alias("high"),
            F.min(nan_nn("value")).alias("low"),
            max_by_nn(nan_nn("value"), "ts").alias("close"),
        )
        # mirror the oracle's HAVING: no bar for an all-NULL day
        .filter(F.col("close").isNotNull())
    )


def _daily_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = _daily_bars(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("date")
    prev = F.lag("close", 1).over(w)
    return bars.select(
        "user_id",
        "date",
        F.try_divide(F.col("close") - prev, prev).alias("r"),
    ).filter(F.col("r").isNotNull())


_RETURNS_CTE = (
    _DAILY_CTE
    + f"""
, rets AS (
  SELECT user_id, date,
         (close - lag(close) OVER ({_WD})) / lag(close) OVER ({_WD}) AS r
  FROM daily
  QUALIFY r IS NOT NULL
)
"""
)


@_register(
    "sharpe_sortino",
    oracle=_RETURNS_CTE
    + """
    SELECT user_id,
           COUNT(*) AS n_days,
           ROUND(AVG(r) / STDDEV_SAMP(r) * SQRT(252.0), 6) AS sharpe,
           ROUND(AVG(r) / SQRT(SUM(CASE WHEN r < 0 THEN r * r ELSE 0 END)
                               / COUNT(*)) * SQRT(252.0), 6) AS sortino
    FROM rets GROUP BY user_id ORDER BY user_id
    """,
    tags=("agg", "risk"),
    doc="annualized Sharpe (mean/sample-std x sqrt252) and Sortino "
    "(mean/downside-deviation, target 0) per user from daily simple "
    "returns. One window pass for returns, one shuffle-free re-agg "
    "on the same user_id partitioning.",
)
def q_sharpe_sortino(spark: SparkSession, sf_dir: str) -> DataFrame:
    rets = _daily_returns(spark, sf_dir)
    downside = F.sqrt(
        F.sum(F.when(F.col("r") < 0, F.col("r") * F.col("r")).otherwise(0.0))
        / F.count(F.lit(1))
    )
    return (
        rets.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            _r6(F.avg("r") / F.stddev_samp("r") * F.sqrt(F.lit(252.0))).alias(
                "sharpe"
            ),
            _r6(F.avg("r") / downside * F.sqrt(F.lit(252.0))).alias("sortino"),
        )
        .orderBy("user_id")
    )


@_register(
    "var_cvar_95",
    oracle=_RETURNS_CTE
    + """
    , v AS (
      SELECT user_id, quantile_cont(r, 0.05) AS var95 FROM rets GROUP BY user_id
    )
    SELECT r.user_id,
           ROUND(ANY_VALUE(v.var95), 6) AS var95,
           ROUND(AVG(r.r) FILTER (WHERE r.r <= v.var95), 6) AS cvar95
    FROM rets r JOIN v ON r.user_id = v.user_id
    GROUP BY r.user_id ORDER BY r.user_id
    """,
    tags=("agg", "risk"),
    doc="exact 95% historical VaR (5th percentile of daily returns, "
    "continuous interpolation) and CVaR (mean of the tail at or below "
    "VaR) per user. Two aggs sharing the user_id shuffle; the VaR "
    "side is one row per user so the re-join broadcasts. At 100 TB "
    "swap percentile for approx_percentile (see value_percentiles_approx).",
)
def q_var_cvar_95(spark: SparkSession, sf_dir: str) -> DataFrame:
    rets = _daily_returns(spark, sf_dir)
    v = rets.groupBy("user_id").agg(
        F.percentile("r", F.lit(0.05)).alias("var95")
    )
    return (
        rets.join(F.broadcast(v), "user_id")
        .groupBy("user_id")
        .agg(
            _r6(F.any_value("var95")).alias("var95"),
            _r6(F.avg(F.when(F.col("r") <= F.col("var95"), F.col("r")))).alias(
                "cvar95"
            ),
        )
        .orderBy("user_id")
    )


@_register(
    "rolling_skew_kurt20",
    oracle=_DAILY_CTE
    + f"""
    , m AS (
      SELECT user_id, date, close,
             COUNT(close) OVER w20 AS n,
             AVG(close) OVER w20 AS m1,
             AVG(close * close) OVER w20 AS m2r,
             AVG(close * close * close) OVER w20 AS m3r,
             AVG(close * close * close * close) OVER w20 AS m4r
      FROM daily
      WINDOW w20 AS ({_WD} ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, date,
           ROUND(CASE WHEN n >= 20 THEN
             (m3r - 3.0 * m1 * m2r + 2.0 * m1 * m1 * m1)
             / POW(m2r - m1 * m1, 1.5) END, 6) AS skew20,
           ROUND(CASE WHEN n >= 20 THEN
             (m4r - 4.0 * m1 * m3r + 6.0 * m1 * m1 * m2r - 3.0 * m1 * m1 * m1 * m1)
             / POW(m2r - m1 * m1, 2.0) - 3.0 END, 6) AS kurt20
    FROM m
    """,
    tags=("window", "risk"),
    doc="rolling 20-day population skewness and excess kurtosis from "
    "raw-moment averages (single window pass computes E[x..x^4]; the "
    "central moments come out algebraically). Strict min_periods=20. "
    "Identical algebra on both sides keeps the float hash stable.",
)
def q_rolling_skew_kurt20(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = _daily_bars(spark, sf_dir)
    w20 = (
        Window.partitionBy("user_id").orderBy("date").rowsBetween(-19, 0)
    )
    x = F.col("close")
    n = F.count(x).over(w20)
    m1 = F.avg(x).over(w20)
    m2r = F.avg(x * x).over(w20)
    m3r = F.avg(x * x * x).over(w20)
    m4r = F.avg(x * x * x * x).over(w20)
    m = bars.select(
        "user_id",
        "date",
        n.alias("n"),
        m1.alias("m1"),
        m2r.alias("m2r"),
        m3r.alias("m3r"),
        m4r.alias("m4r"),
    )
    c1, c2r, c3r, c4r = (F.col(c) for c in ("m1", "m2r", "m3r", "m4r"))
    skew = (c3r - 3.0 * c1 * c2r + 2.0 * c1 * c1 * c1) / F.pow(
        c2r - c1 * c1, F.lit(1.5)
    )
    kurt = (
        c4r
        - 4.0 * c1 * c3r
        + 6.0 * c1 * c1 * c2r
        - 3.0 * c1 * c1 * c1 * c1
    ) / F.pow(c2r - c1 * c1, F.lit(2.0)) - 3.0
    full = F.col("n") >= 20
    return m.select(
        "user_id",
        "date",
        _r6(F.when(full, skew)).alias("skew20"),
        _r6(F.when(full, kurt)).alias("kurt20"),
    )


@_register(
    "candle_patterns",
    oracle=_DAILY_CTE
    + f"""
    , lagged AS (
      SELECT user_id, date, open, high, low, close,
             lag(open) OVER ({_WD}) AS popen,
             lag(close) OVER ({_WD}) AS pclose
      FROM daily
    )
    SELECT user_id,
           COUNT(*) AS n_days,
           CAST(SUM(CASE WHEN high > low
                     AND ABS(close - open) <= 0.1 * (high - low)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_doji,
           CAST(SUM(CASE WHEN pclose < popen AND close > open
                     AND open <= pclose AND close >= popen
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_bull_engulf,
           CAST(SUM(CASE WHEN pclose > popen AND close < open
                     AND open >= pclose AND close <= popen
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_bear_engulf
    FROM lagged GROUP BY user_id ORDER BY user_id
    """,
    tags=("window", "risk", "indicator"),
    doc="candlestick pattern counts per user on daily bars: doji "
    "(body <= 10% of range) and bullish/bearish engulfing (current "
    "body engulfs the previous opposite-colored body). lag + "
    "conditional-sum — one window pass then a partitioning-aligned agg.",
)
def q_candle_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = _daily_bars(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("date")
    lagged = bars.select(
        "user_id",
        "date",
        "open",
        "high",
        "low",
        "close",
        F.lag("open").over(w).alias("popen"),
        F.lag("close").over(w).alias("pclose"),
    )
    doji = (F.col("high") > F.col("low")) & (
        F.abs(F.col("close") - F.col("open"))
        <= 0.1 * (F.col("high") - F.col("low"))
    )
    bull = (
        (F.col("pclose") < F.col("popen"))
        & (F.col("close") > F.col("open"))
        & (F.col("open") <= F.col("pclose"))
        & (F.col("close") >= F.col("popen"))
    )
    bear = (
        (F.col("pclose") > F.col("popen"))
        & (F.col("close") < F.col("open"))
        & (F.col("open") >= F.col("pclose"))
        & (F.col("close") <= F.col("popen"))
    )
    return (
        lagged.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum(F.when(doji, 1).otherwise(0)).alias("n_doji"),
            F.sum(F.when(bull, 1).otherwise(0)).alias("n_bull_engulf"),
            F.sum(F.when(bear, 1).otherwise(0)).alias("n_bear_engulf"),
        )
        .orderBy("user_id")
    )


@_register(
    "pivot_points_daily",
    oracle=_DAILY_CTE
    + f"""
    , lagged AS (
      SELECT user_id, date,
             lag(high) OVER ({_WD})  AS ph,
             lag(low) OVER ({_WD})   AS pl,
             lag(close) OVER ({_WD}) AS pc
      FROM daily
    )
    SELECT user_id, date,
           ROUND((ph + pl + pc) / 3.0, 6) AS pivot,
           ROUND(2.0 * (ph + pl + pc) / 3.0 - pl, 6) AS r1,
           ROUND(2.0 * (ph + pl + pc) / 3.0 - ph, 6) AS s1,
           ROUND((ph + pl + pc) / 3.0 + (ph - pl), 6) AS r2,
           ROUND((ph + pl + pc) / 3.0 - (ph - pl), 6) AS s2
    FROM lagged WHERE ph IS NOT NULL
    """,
    tags=("window", "risk", "indicator"),
    doc="classic floor-trader pivot levels for each session from the "
    "PREVIOUS day's high/low/close: P=(H+L+C)/3, R1=2P-L, S1=2P-H, "
    "R2=P+(H-L), S2=P-(H-L). Three lags share one window sort.",
)
def q_pivot_points_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = _daily_bars(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("date")
    lagged = bars.select(
        "user_id",
        "date",
        F.lag("high").over(w).alias("ph"),
        F.lag("low").over(w).alias("pl"),
        F.lag("close").over(w).alias("pc"),
    ).filter(F.col("ph").isNotNull())
    p = (F.col("ph") + F.col("pl") + F.col("pc")) / 3.0
    return lagged.select(
        "user_id",
        "date",
        _r6(p).alias("pivot"),
        _r6(2.0 * p - F.col("pl")).alias("r1"),
        _r6(2.0 * p - F.col("ph")).alias("s1"),
        _r6(p + (F.col("ph") - F.col("pl"))).alias("r2"),
        _r6(p - (F.col("ph") - F.col("pl"))).alias("s2"),
    )


@_register(
    "drawdown_durations",
    oracle=_DAILY_CTE
    + f"""
    , uw AS (
      SELECT user_id, date, close,
             CASE WHEN close < MAX(close) OVER ({_WD}
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             THEN 1 ELSE 0 END AS under,
             ROW_NUMBER() OVER ({_WD}) AS rn
      FROM daily
    ), isl AS (
      SELECT user_id, under,
             rn - ROW_NUMBER() OVER (PARTITION BY user_id, under ORDER BY rn)
               AS grp
      FROM uw
    ), streaks AS (
      SELECT user_id, COUNT(*) AS len
      FROM isl WHERE under = 1 GROUP BY user_id, grp
    )
    SELECT u.user_id,
           CAST(SUM(u.under) AS BIGINT) AS underwater_days,
           COALESCE(ANY_VALUE(s.max_len), 0) AS longest_drawdown_days
    FROM uw u LEFT JOIN (
      SELECT user_id, MAX(len) AS max_len FROM streaks GROUP BY user_id
    ) s ON u.user_id = s.user_id
    GROUP BY u.user_id ORDER BY u.user_id
    """,
    tags=("window", "risk", "islands"),
    doc="drawdown duration per user: days below the running peak close "
    "(underwater) and the longest consecutive underwater streak — the "
    "gaps-and-islands double-row_number pattern on top of a running "
    "max. All windows share the user_id partitioning; the island agg "
    "re-shuffles only (user_id, grp) pairs.",
)
def q_drawdown_durations(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = _daily_bars(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("date")
    runmax = F.max("close").over(w.rowsBetween(Window.unboundedPreceding, 0))
    uw = bars.select(
        "user_id",
        "date",
        F.when(F.col("close") < runmax, 1).otherwise(0).alias("under"),
        F.row_number().over(w).alias("rn"),
    )
    isl = uw.withColumn(
        "grp",
        F.col("rn")
        - F.row_number().over(
            Window.partitionBy("user_id", "under").orderBy("rn")
        ),
    )
    streaks = (
        isl.filter(F.col("under") == 1)
        .groupBy("user_id", "grp")
        .agg(F.count(F.lit(1)).alias("len"))
        .groupBy("user_id")
        .agg(F.max("len").alias("max_len"))
    )
    return (
        uw.groupBy("user_id")
        .agg(F.sum("under").alias("underwater_days"))
        .join(F.broadcast(streaks), "user_id", "left")
        .select(
            "user_id",
            "underwater_days",
            F.coalesce(F.col("max_len"), F.lit(0)).alias(
                "longest_drawdown_days"
            ),
        )
        .orderBy("user_id")
    )


_LIQUID_CTE = """
, liquid AS (
  SELECT user_id FROM (
    SELECT user_id, COUNT(*) AS n_days,
           ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, user_id) AS lr
    FROM rets GROUP BY user_id
  ) WHERE lr <= 100
), lrets AS (
  SELECT r.* FROM rets r JOIN liquid l ON r.user_id = l.user_id
)
"""


def _liquid_returns(rets: DataFrame, top_n: int = 100) -> DataFrame:
    """Prune to the top-N most active series before any pair
    expansion — the stage that keeps pair screens bounded at ANY
    series cardinality. Integer sort key (n_days) with a full user_id
    tie-break so both engines elect the identical set."""
    # orderBy().limit(N) plans as TakeOrderedAndProject (per-task
    # top-N heaps, driver merge) — the earlier row_number() window
    # moved every distinct user through ONE task before keeping 100.
    liquid = (
        rets.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_days"))
        .orderBy(F.desc("n_days"), F.asc("user_id"))
        .limit(top_n)
        .select("user_id")
    )
    return rets.join(F.broadcast(liquid), "user_id")


@_register(
    "pairwise_return_corr",
    oracle=_RETURNS_CTE
    + _LIQUID_CTE
    + """
    SELECT a.user_id AS u1, b.user_id AS u2,
           COUNT(*) AS n_days,
           -- total-corr restatement: Spark's ANSI corr raises on a
           -- zero-variance side (a flat 20-day series), this form is
           -- NULL there in both engines (functions/nullsafe.py corr_nn)
           ROUND(covar_pop(a.r, b.r)
                 / nullif(stddev_pop(a.r) * stddev_pop(b.r), 0), 6)
             AS corr
    FROM lrets a JOIN lrets b ON a.date = b.date AND a.user_id < b.user_id
    GROUP BY a.user_id, b.user_id
    HAVING COUNT(*) >= 20
    ORDER BY ABS(ROUND(covar_pop(a.r, b.r)
                       / nullif(stddev_pop(a.r) * stddev_pop(b.r), 0), 6))
             DESC NULLS LAST, u1, u2
    LIMIT 15
    """,
    tags=("join", "risk", "agg"),
    doc="pairwise Pearson correlation of daily returns (u1 < u2, >= 20 "
    "common days), top-15 by |corr| — computed over the top-100 most "
    "active series. The liquidity prune is PART OF THE OPERATOR, not "
    "an optimization note: without it the per-date pair expansion is "
    "quadratic in series count (the 10x scale smoke measured 71x "
    "before the prune); with it the pair stage is a bounded K^2/2 "
    "regardless of how many series exist. Deterministic integer-keyed "
    "top-K so both engines elect the same set.",
)
def q_pairwise_return_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    rets = _liquid_returns(_daily_returns(spark, sf_dir))
    a = rets.alias("a")
    b = rets.alias("b")
    corr = F.round(corr_nn("a.r", "b.r"), 6)
    return (
        a.join(
            b,
            (F.col("a.date") == F.col("b.date"))
            & (F.col("a.user_id") < F.col("b.user_id")),
        )
        .groupBy(
            F.col("a.user_id").alias("u1"), F.col("b.user_id").alias("u2")
        )
        .agg(F.count(F.lit(1)).alias("n_days"), corr.alias("corr"))
        .filter(F.col("n_days") >= 20)
        .orderBy(F.abs(F.col("corr")).desc(), "u1", "u2")
        .limit(15)
    )
