"""Indicator query registrations (reference W5-W13) over pseudo-OHLCV
bars derived from `events` (FIXTURES.md F6 mapping).

Semantics pinned to the reference's pandas formulas (SURVEY §4 ledger):
strict min_periods (NULL until the frame is full), sample std, SMA of
clipped deltas for RSI (not Wilder), recursive EMA for MACD.

Division-by-zero: Spark doubles follow IEEE (x/0 → ±Inf) while DuckDB
returns NULL — every potentially-zero denominator is guarded with an
explicit CASE on BOTH sides so the engines agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stockpulse_spark.functions.nullsafe import nan_nn, max_by_nn, min_by_nn

from stockpulse_spark.functions.ema import add_macd_auto
from stockpulse_spark.plans.registry import (
    _BARS_CTE,
    _hourly_bars,
    _r6,
    _register,
    _t,
)

_W = "PARTITION BY user_id ORDER BY bucket_start"


@_register(
    "bollinger20",
    oracle=_BARS_CTE
    + f"""
    , b AS (
      SELECT user_id, bucket_start, close,
             CASE WHEN COUNT(close) OVER w >= 20 THEN AVG(close) OVER w END AS mid,
             CASE WHEN COUNT(close) OVER w >= 20 THEN STDDEV_SAMP(close) OVER w END AS sd
      FROM bars
      WINDOW w AS ({_W} ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, bucket_start, ROUND(close, 6) AS close,
           ROUND(mid, 6) AS bb_mid,
           ROUND(mid + 2 * sd, 6) AS bb_upper,
           ROUND(mid - 2 * sd, 6) AS bb_lower
    FROM b
    """,
    headline=True,
    tags=("window", "indicator"),
    doc="reference W5 (app/dashboard.py:97-101): SMA20 ± 2·rolling "
    "sample std, strict pandas min_periods (NULL until 20 rows).",
)
def q_bollinger20(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = _hourly_bars(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("bucket_start").rowsBetween(-19, 0)
    # two-select shape (functions/indicators.py convention): repeating
    # mid/sd inline puts 10 window-function instances in the Window
    # node (Catalyst does NOT dedup identical window expressions);
    # naming them first computes 3
    b = bars.select(
        "user_id",
        "bucket_start",
        "close",
        F.count("close").over(w).alias("__n"),
        F.avg("close").over(w).alias("__avg"),
        F.stddev_samp("close").over(w).alias("__sd"),
    )
    mid = F.when(F.col("__n") >= 20, F.col("__avg"))
    sd = F.when(F.col("__n") >= 20, F.col("__sd"))
    return b.select(
        "user_id",
        "bucket_start",
        _r6(F.col("close")).alias("close"),
        _r6(mid).alias("bb_mid"),
        _r6(mid + 2 * sd).alias("bb_upper"),
        _r6(mid - 2 * sd).alias("bb_lower"),
    )


@_register(
    "sma_50_200",
    oracle=_BARS_CTE
    + f"""
    SELECT user_id, bucket_start, ROUND(close, 6) AS close,
           ROUND(CASE WHEN COUNT(close) OVER w50 >= 50 THEN AVG(close) OVER w50 END, 6) AS sma50,
           ROUND(CASE WHEN COUNT(close) OVER w200 >= 200 THEN AVG(close) OVER w200 END, 6) AS sma200
    FROM bars
    WINDOW w50 AS ({_W} ROWS BETWEEN 49 PRECEDING AND CURRENT ROW),
           w200 AS ({_W} ROWS BETWEEN 199 PRECEDING AND CURRENT ROW)
    """,
    tags=("window", "indicator"),
    doc="reference W6 (app/dashboard.py:104-105): SMA50/SMA200, strict "
    "min_periods. Both frames share one window exchange.",
)
def q_sma_50_200(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = _hourly_bars(spark, sf_dir)
    base = Window.partitionBy("user_id").orderBy("bucket_start")
    out = [("sma50", 50), ("sma200", 200)]
    cols = [
        "user_id",
        "bucket_start",
        _r6(F.col("close")).alias("close"),
    ]
    for name, n in out:
        w = base.rowsBetween(-(n - 1), 0)
        cols.append(
            _r6(
                F.when(F.count("close").over(w) >= n, F.avg("close").over(w))
            ).alias(name)
        )
    return bars.select(*cols)


@_register(
    "rsi14",
    oracle=_BARS_CTE
    + f"""
    , d AS (
      SELECT user_id, bucket_start, close,
             close - lag(close) OVER ({_W}) AS delta
      FROM bars
    ), g AS (
      -- greatest() ignores the NULL first delta (= pandas .where(delta>0, 0)
      -- mapping NaN→0), so the clipped series is never null: count it,
      -- not the deltas, for the min_periods guard.
      SELECT user_id, bucket_start, close,
             CASE WHEN COUNT(greatest(delta, 0.0)) OVER w >= 14 THEN AVG(greatest(delta, 0.0)) OVER w END AS ag,
             CASE WHEN COUNT(greatest(-delta, 0.0)) OVER w >= 14 THEN AVG(greatest(-delta, 0.0)) OVER w END AS al
      FROM d
      WINDOW w AS ({_W} ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, bucket_start, ROUND(close, 6) AS close,
           ROUND(CASE WHEN al = 0 AND ag = 0 THEN NULL
                      WHEN al = 0 THEN 100.0
                      ELSE 100.0 - 100.0 / (1.0 + ag / al) END, 6) AS rsi14
    FROM g
    """,
    headline=True,
    tags=("window", "indicator"),
    doc="reference W7 (app/dashboard.py:107-112): RSI from SMA of "
    "clipped deltas (the reference's variant, not Wilder smoothing). "
    "al=0 guarded: Spark IEEE Inf vs DuckDB NULL would diverge.",
)
def q_rsi14(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = _hourly_bars(spark, sf_dir)
    wb = Window.partitionBy("user_id").orderBy("bucket_start")
    w = wb.rowsBetween(-13, 0)
    delta = F.col("close") - F.lag("close", 1).over(wb)
    bars = bars.select("user_id", "bucket_start", "close", delta.alias("delta"))
    gain = F.greatest(F.col("delta"), F.lit(0.0))
    loss = F.greatest(-F.col("delta"), F.lit(0.0))
    # two-select shape: the count guard is named ONCE — embedding
    # `full` in both averages put two identical count windows in the
    # Window node (Catalyst does not dedup window expressions; the
    # round-8 de-blinded sweep caught this one)
    bars = bars.select(
        "user_id",
        "bucket_start",
        "close",
        F.count(gain).over(w).alias("__n"),
        F.avg(gain).over(w).alias("__ag"),
        F.avg(loss).over(w).alias("__al"),
    )
    full = F.col("__n") >= 14
    ag = F.when(full, F.col("__ag"))
    al = F.when(full, F.col("__al"))
    bars = bars.select("user_id", "bucket_start", "close", ag.alias("ag"), al.alias("al"))
    rsi = (
        F.when((F.col("al") == 0) & (F.col("ag") == 0), F.lit(None))
        .when(F.col("al") == 0, F.lit(100.0))
        .otherwise(100.0 - 100.0 / (1.0 + F.col("ag") / F.col("al")))
    )
    return bars.select(
        "user_id",
        "bucket_start",
        _r6(F.col("close")).alias("close"),
        _r6(rsi).alias("rsi14"),
    )


@_register(
    "atr14",
    oracle=_BARS_CTE
    + f"""
    , t AS (
      SELECT user_id, bucket_start,
             greatest(high - low,
                      abs(high - lag(close) OVER ({_W})),
                      abs(low  - lag(close) OVER ({_W}))) AS tr
      FROM bars
    )
    SELECT user_id, bucket_start,
           ROUND(CASE WHEN COUNT(tr) OVER w >= 14 THEN AVG(tr) OVER w END, 6) AS atr14
    FROM t
    WINDOW w AS ({_W} ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    """,
    tags=("window", "indicator"),
    doc="reference W9 (app/dashboard.py:120-126): true range via "
    "greatest (NULL-ignoring in both engines, = pandas max skipna), "
    "then strict rolling mean.",
)
def q_atr14(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = _hourly_bars(spark, sf_dir)
    wb = Window.partitionBy("user_id").orderBy("bucket_start")
    pc = F.lag("close", 1).over(wb)
    tr = F.greatest(
        F.col("high") - F.col("low"),
        F.abs(F.col("high") - pc),
        F.abs(F.col("low") - pc),
    )
    t = bars.select("user_id", "bucket_start", tr.alias("tr"))
    w = wb.rowsBetween(-13, 0)
    atr = F.when(F.count("tr").over(w) >= 14, F.avg("tr").over(w))
    return t.select("user_id", "bucket_start", _r6(atr).alias("atr14"))


@_register(
    "stochastic_14_3",
    oracle=_BARS_CTE
    + f"""
    , k AS (
      SELECT user_id, bucket_start,
             CASE WHEN COUNT(low) OVER w >= 14 AND (MAX(high) OVER w) != (MIN(low) OVER w)
                  THEN 100.0 * (close - MIN(low) OVER w) / (MAX(high) OVER w - MIN(low) OVER w)
             END AS stoch_k
      FROM bars
      WINDOW w AS ({_W} ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, bucket_start, ROUND(stoch_k, 6) AS stoch_k,
           ROUND(CASE WHEN COUNT(stoch_k) OVER w3 >= 3 THEN AVG(stoch_k) OVER w3 END, 6) AS stoch_d
    FROM k
    WINDOW w3 AS ({_W} ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
    tags=("window", "indicator"),
    doc="reference W10 (app/dashboard.py:128-132): stochastic %K/%D, "
    "hi==lo guarded (0/0: Spark NaN vs DuckDB NULL).",
)
def q_stochastic(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = _hourly_bars(spark, sf_dir)
    wb = Window.partitionBy("user_id").orderBy("bucket_start")
    w = wb.rowsBetween(-13, 0)
    # two-select shape (see williams_r): LL/HH each appear 2-3x in
    # the %K formula; naming them computes 3 frame aggregates not 6
    b = bars.select(
        "user_id",
        "bucket_start",
        "close",
        F.count("low").over(w).alias("__n"),
        F.min("low").over(w).alias("__lo"),
        F.max("high").over(w).alias("__hi"),
    )
    lo, hi = F.col("__lo"), F.col("__hi")
    k = F.when(
        (F.col("__n") >= 14) & (hi != lo),
        100.0 * (F.col("close") - lo) / (hi - lo),
    )
    kd = b.select("user_id", "bucket_start", k.alias("stoch_k"))
    w3 = wb.rowsBetween(-2, 0)
    d = F.when(F.count("stoch_k").over(w3) >= 3, F.avg("stoch_k").over(w3))
    return kd.select(
        "user_id",
        "bucket_start",
        _r6(F.col("stoch_k")).alias("stoch_k"),
        _r6(d).alias("stoch_d"),
    )


@_register(
    "roc_momentum",
    oracle=_BARS_CTE
    + f"""
    SELECT user_id, bucket_start, ROUND(close, 6) AS close,
           ROUND(100.0 * (close - lag(close, 10) OVER ({_W})) / lag(close, 10) OVER ({_W}), 6) AS roc10,
           ROUND(close - lag(close, 10) OVER ({_W}), 6) AS momentum10
    FROM bars
    """,
    tags=("window", "indicator"),
    doc="reference W11 (app/dashboard.py:502-504): pct_change(10)·100 "
    "and close − close.shift(10). value > 0 in the data so the lag "
    "denominator needs no zero guard.",
)
def q_roc_momentum(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = _hourly_bars(spark, sf_dir)
    wb = Window.partitionBy("user_id").orderBy("bucket_start")
    # two-select shape: one lag evaluation instead of three
    b = bars.select(
        "user_id",
        "bucket_start",
        "close",
        F.lag("close", 10).over(wb).alias("__prev"),
    )
    prev = F.col("__prev")
    return b.select(
        "user_id",
        "bucket_start",
        _r6(F.col("close")).alias("close"),
        # try_divide: sf0.1 contains value=0 rows; ANSI Spark throws on
        # /0 while DuckDB yields NULL — try_divide matches the oracle
        _r6(F.try_divide(100.0 * (F.col("close") - prev), prev)).alias("roc10"),
        _r6(F.col("close") - prev).alias("momentum10"),
    )


@_register(
    "vwap",
    oracle=_BARS_CTE
    + f"""
    SELECT user_id, bucket_start,
           -- FILTER mirrors Spark SUM's NULL-skipping: an all-NULL
           -- bucket's close would otherwise poison the whole fold
           -- (NULL + acc) while Spark's SUM just skips it
           ROUND(CASE WHEN COUNT(close) OVER w > 0 THEN
                   list_reduce(list(close * volume)
                                 FILTER (close IS NOT NULL) OVER w,
                               (acc, e) -> acc + e)
                   / (SUM(volume) OVER w) END, 6) AS vwap
    FROM bars
    WINDOW w AS ({_W} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    tags=("window", "indicator"),
    doc="reference W12 (app/dashboard.py:377): cumulative "
    "Σ(price·vol)/Σ(vol). volume ≥ 1 by construction, no zero guard.",
)
def q_vwap(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = _hourly_bars(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("bucket_start")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    vwap = F.sum(F.col("close") * F.col("volume")).over(w) / F.sum("volume").over(w)
    return bars.select("user_id", "bucket_start", _r6(vwap).alias("vwap"))


@_register(
    "returns_volatility",
    oracle="""
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS date, last(value ORDER BY ts, value) FILTER (WHERE value IS NOT NULL AND isfinite(value)) AS close
      FROM events GROUP BY user_id, CAST(ts AS DATE)
    ), r AS (
      SELECT user_id, date, close,
             100.0 * (close - lag(close) OVER w0) / lag(close) OVER w0 AS daily_return
      FROM daily
      WINDOW w0 AS (PARTITION BY user_id ORDER BY date)
    )
    SELECT user_id, date, ROUND(close, 6) AS close,
           ROUND(daily_return, 6) AS daily_return,
           ROUND(CASE WHEN COUNT(daily_return) OVER w20 >= 20
                      THEN STDDEV_SAMP(daily_return) OVER w20 END, 6) AS volatility20
    FROM r
    WINDOW w20 AS (PARTITION BY user_id ORDER BY date ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    """,
    tags=("window", "indicator"),
    doc="reference W13 (docs/preprocessing.md:48-64): daily returns + "
    "20-day rolling sample-std volatility on EOD closes.",
)
def q_returns_volatility(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy("user_id", F.to_date("ts").alias("date")).agg(
        max_by_nn(nan_nn("value"), "ts").alias("close")
    )
    w0 = Window.partitionBy("user_id").orderBy("date")
    prev = F.lag("close", 1).over(w0)
    r = daily.select(
        "user_id",
        "date",
        "close",
        F.try_divide(100.0 * (F.col("close") - prev), prev).alias("daily_return"),
    )
    w20 = w0.rowsBetween(-19, 0)
    vol = F.when(
        F.count("daily_return").over(w20) >= 20,
        F.stddev_samp("daily_return").over(w20),
    )
    return r.select(
        "user_id",
        "date",
        _r6(F.col("close")).alias("close"),
        _r6(F.col("daily_return")).alias("daily_return"),
        _r6(vol).alias("volatility20"),
    )


# EMA lambda: pandas ewm(adjust=False) recursion y_t=(1-a)y_{t-1}+a·x_t,
# y_0=x_0 — DuckDB list_reduce uses the first element as the seed, which
# is exactly y_0=x_0. O(n²) per series, acceptable at oracle scale.
def _ema_reduce(expr: str, span: int) -> str:
    return (
        f"list_reduce(list({expr}) OVER ({_W} ROWS BETWEEN UNBOUNDED PRECEDING "
        f"AND CURRENT ROW), (acc, e) -> acc * (1.0 - 2.0/{span + 1}.0) + e * (2.0/{span + 1}.0))"
    )


_MACD_ORACLE = (
    _BARS_CTE
    + f"""
    , m AS (
      SELECT user_id, bucket_start, close,
             {_ema_reduce('close', 12)} - {_ema_reduce('close', 26)} AS macd
      FROM bars
    )
    SELECT user_id, bucket_start, ROUND(close, 6) AS close,
           ROUND(macd, 6) AS macd,
           ROUND({_ema_reduce('macd', 9)}, 6) AS macd_signal
    FROM m
    """
)


def _macd_query(spark: SparkSession, sf_dir: str, series_bound) -> DataFrame:
    bars = _hourly_bars(spark, sf_dir).select("user_id", "bucket_start", "close")
    out = add_macd_auto(
        bars,
        partition_cols=["user_id"],
        order_cols=["bucket_start"],
        value_col="close",
        series_bound=series_bound,
    )
    return out.select(
        "user_id",
        "bucket_start",
        _r6(F.col("close")).alias("close"),
        _r6(F.col("macd")).alias("macd"),
        _r6(F.col("macd_signal")).alias("macd_signal"),
    )


@_register(
    "macd_12_26_9",
    oracle=_MACD_ORACLE,
    headline=True,
    tags=("window", "indicator", "udf"),
    doc="reference W8 (app/dashboard.py:114-118): MACD via recursive "
    "EMA through the scale-safe dispatch (functions/ema.py:"
    "add_macd_auto) with a STATIC series bound read from parquet "
    "footer statistics (sources/tables.py:hour_span_bound): series "
    "are keyed (user, hour), so max length ≤ hour buckets in the "
    "dataset's ts span — one metadata fetch, zero Spark jobs, no "
    "probe aggregation in the benched path. Bounded series (≤10k "
    "points) run the JVM `aggregate` fold; past the bound the linear "
    "Arrow kernel runs. Falls back to the probe when footers carry no "
    "stats. Oracle folds the identical adjust=False recursion with "
    "DuckDB list_reduce; the probe path keeps its own oracle row "
    "(macd_probed_dispatch) and the dispatch is plan-pinned by "
    "tests/test_plan_shapes.py.",
)
def q_macd(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stockpulse_spark.sources.tables import hour_span_bound

    return _macd_query(spark, sf_dir, series_bound=hour_span_bound(sf_dir))


@_register(
    "macd_probed_dispatch",
    oracle=_MACD_ORACLE,
    tags=("window", "indicator", "udf"),
    doc="the library-default MACD path (series_bound=None): one cheap "
    "count-agg probes the true max per-series length over the "
    "localCheckpointed bars, then dispatches fold vs kernel. "
    "Registered separately so the probed path keeps a green oracle "
    "row while the benched macd_12_26_9 uses the footer-derived "
    "static bound.",
)
def q_macd_probed(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _macd_query(spark, sf_dir, series_bound=None)


@_register(
    "macd_intraday_hof",
    oracle=_MACD_ORACLE,
    tags=("window", "indicator"),
    doc="same MACD semantics with an asserted bound and no probe: the "
    "caller guarantees per-series length ≤ HOF_SERIES_BOUND (hourly "
    "bars over a ≤13-month retention window ≈ 9.5k points), so "
    "add_macd_auto picks the JVM-side `aggregate` fold directly "
    "(functions/ema.py:add_macd_hof) — no Python, no probe job.",
)
def q_macd_intraday_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _macd_query(spark, sf_dir, series_bound=9_600)


@_register(
    "macd_unbounded_kernel",
    oracle=_MACD_ORACLE,
    tags=("window", "indicator", "udf"),
    doc="same MACD semantics through the unbounded-history path the "
    "auto dispatch takes for series longer than HOF_SERIES_BOUND: the "
    "linear Arrow applyInPandas kernel (functions/ema.py:add_macd — "
    "pandas ewm(adjust=False), O(n) per series, per-group memory = one "
    "series). Registered so the kernel path carries its own green "
    "oracle row: all three MACD paths share one oracle and must agree "
    "bit-for-bit.",
)
def q_macd_unbounded_kernel(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    return _macd_query(spark, sf_dir, series_bound=math.inf)
