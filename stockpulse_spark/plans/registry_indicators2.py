"""Extended indicator set beyond the reference's dashboard: OBV,
Wilder-smoothed RSI (the industry-standard recursive variant — the
reference's SMA-based RSI stays in `rsi14`), and Williams %R. Rounds
out what a reference user would ask for next."""

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
    "obv",
    oracle=_BARS_CTE
    + f"""
    , d AS (
      SELECT user_id, bucket_start, close, volume,
             CASE WHEN close > lag(close) OVER ({_W}) THEN volume
                  WHEN close < lag(close) OVER ({_W}) THEN -volume
                  ELSE 0 END AS signed_vol
      FROM bars
    )
    SELECT user_id, bucket_start,
           CAST(SUM(signed_vol) OVER ({_W} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS obv
    FROM d
    """,
    tags=("window", "indicator"),
    doc="On-Balance Volume: cumulative signed volume (sign of the "
    "close-to-close change). Integer arithmetic — no float "
    "reconciliation needed; one shared window exchange.",
)
def q_obv(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = _hourly_bars(spark, sf_dir)
    wb = Window.partitionBy("user_id").orderBy("bucket_start")
    prev = F.lag("close", 1).over(wb)
    signed = (
        F.when(F.col("close") > prev, F.col("volume"))
        .when(F.col("close") < prev, -F.col("volume"))
        .otherwise(F.lit(0))
    )
    d = bars.select("user_id", "bucket_start", signed.alias("signed_vol"))
    return d.select(
        "user_id",
        "bucket_start",
        F.sum("signed_vol")
        .over(wb.rowsBetween(Window.unboundedPreceding, 0))
        .alias("obv"),
    )


def _wilder_reduce(expr: str, n: int) -> str:
    # Wilder smoothing: y_t = (y_{t-1}·(n−1) + x_t)/n, seeded with the
    # first value — same fold family as EMA with α = 1/n
    return (
        f"list_reduce(list({expr}) OVER ({_W} ROWS BETWEEN UNBOUNDED PRECEDING "
        f"AND CURRENT ROW), (acc, e) -> (acc * {n - 1}.0 + e) / {n}.0)"
    )


@_register(
    "rsi_wilder",
    oracle=_BARS_CTE
    + f"""
    , d AS (
      SELECT user_id, bucket_start, close,
             greatest(close - lag(close) OVER ({_W}), 0.0) AS gain,
             greatest(lag(close) OVER ({_W}) - close, 0.0) AS loss
      FROM bars
    ), sm AS (
      SELECT user_id, bucket_start, close,
             {_wilder_reduce('gain', 14)} AS ag,
             {_wilder_reduce('loss', 14)} AS al
      FROM d
    )
    SELECT user_id, bucket_start, ROUND(close, 6) AS close,
           ROUND(CASE WHEN al = 0 AND ag = 0 THEN NULL
                      WHEN al = 0 THEN 100.0
                      ELSE 100.0 - 100.0 / (1.0 + ag / al) END, 6) AS rsi_wilder
    FROM sm
    """,
    tags=("window", "indicator", "recursive"),
    doc="Wilder-smoothed RSI(14): the industry-standard recursive "
    "smoothing (α=1/14, seeded with the first clipped delta) — the "
    "reference's SMA variant stays in `rsi14`. Spark folds the "
    "recursion JVM-side with aggregate() like MACD; the oracle folds "
    "the identical recursion with list_reduce. greatest() maps the "
    "first NULL delta to 0 in both engines, so the folds seed "
    "identically.",
)
def q_rsi_wilder(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = _hourly_bars(spark, sf_dir).select("user_id", "bucket_start", "close")
    wb = Window.partitionBy("user_id").orderBy("bucket_start")
    prev = F.lag("close", 1).over(wb)
    d = bars.select(
        "user_id",
        "bucket_start",
        "close",
        F.greatest(F.col("close") - prev, F.lit(0.0)).alias("gain"),
        F.greatest(prev - F.col("close"), F.lit(0.0)).alias("loss"),
    )
    g = d.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct("bucket_start", "close", "gain", "loss"))
        ).alias("s")
    )

    def wilder(arr: str, n: int):
        return F.expr(
            f"aggregate(slice({arr}, 2, size({arr}) - 1), array({arr}[0]), "
            f"(acc, x) -> array_append(acc, (element_at(acc, -1) * {n - 1}.0 + x) / {n}.0))"
        )

    g = g.withColumn("ag", wilder("s.gain", 14)).withColumn(
        "al", wilder("s.loss", 14)
    )
    z = g.select(
        "user_id",
        F.explode(
            F.arrays_zip(
                F.col("s").alias("row"), F.col("ag").alias("ag"), F.col("al").alias("al")
            )
        ).alias("z"),
    ).select(
        "user_id",
        F.col("z.row.bucket_start").alias("bucket_start"),
        F.col("z.row.close").alias("close"),
        F.col("z.ag").alias("ag"),
        F.col("z.al").alias("al"),
    )
    rsi = (
        F.when((F.col("al") == 0) & (F.col("ag") == 0), F.lit(None))
        .when(F.col("al") == 0, F.lit(100.0))
        .otherwise(100.0 - 100.0 / (1.0 + F.col("ag") / F.col("al")))
    )
    return z.select(
        "user_id",
        "bucket_start",
        _r6(F.col("close")).alias("close"),
        _r6(rsi).alias("rsi_wilder"),
    )


@_register(
    "williams_r",
    oracle=_BARS_CTE
    + f"""
    -- + 0.0 normalizes IEEE negative zero (close == highest-high gives
    -- -0.0 here but +0.0 in Spark after its BigDecimal round)
    SELECT user_id, bucket_start,
           ROUND(CASE WHEN COUNT(low) OVER w >= 14
                       AND (MAX(high) OVER w) != (MIN(low) OVER w)
                      THEN -100.0 * (MAX(high) OVER w - close)
                           / (MAX(high) OVER w - MIN(low) OVER w)
                 END, 6) + 0.0 AS williams_r
    FROM bars
    WINDOW w AS ({_W} ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    """,
    tags=("window", "indicator"),
    doc="Williams %R(14): −100·(HH−close)/(HH−LL) over the trailing "
    "frame, strict min_periods, degenerate-range guarded (NULL where "
    "HH==LL, matching both engines' semantics).",
)
def q_williams_r(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = _hourly_bars(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("bucket_start").rowsBetween(-13, 0)
    # two-select shape: HH/LL each appear 3x in the formula and
    # Catalyst does not dedup identical window expressions — naming
    # them first computes 3 frame aggregates instead of 6
    b = bars.select(
        "user_id",
        "bucket_start",
        "close",
        F.count("low").over(w).alias("__n"),
        F.max("high").over(w).alias("__hh"),
        F.min("low").over(w).alias("__ll"),
    )
    hh, ll = F.col("__hh"), F.col("__ll")
    wr = F.when(
        (F.col("__n") >= 14) & (hh != ll),
        -100.0 * (hh - F.col("close")) / (hh - ll),
    )
    return b.select("user_id", "bucket_start", _r6(wr).alias("williams_r"))


@_register(
    "mfi14",
    oracle=_BARS_CTE
    + f"""
    , tpf AS (
      SELECT user_id, bucket_start,
             (high + low + close) / 3.0 AS tp, volume
      FROM bars
    ), mf AS (
      SELECT user_id, bucket_start, tp,
             CASE WHEN tp > lag(tp) OVER ({_W}) THEN tp * volume ELSE 0 END AS pos_mf,
             CASE WHEN tp < lag(tp) OVER ({_W}) THEN tp * volume ELSE 0 END AS neg_mf,
             lag(tp) OVER ({_W}) AS prev_tp
      FROM tpf
    ), s AS (
      SELECT user_id, bucket_start,
             SUM(pos_mf) OVER w14 AS sp,
             SUM(neg_mf) OVER w14 AS sn,
             COUNT(prev_tp) OVER w14 AS n_chg
      FROM mf
      WINDOW w14 AS ({_W} ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, bucket_start,
           ROUND(CASE WHEN n_chg >= 14 AND sp + sn > 0
                      THEN 100.0 * sp / (sp + sn) END, 6) AS mfi
    FROM s
    """,
    tags=("window", "indicator"),
    doc="Money Flow Index (14): volume-weighted RSI analogue — "
    "typical-price money flow split by direction, 14-bar sums, "
    "MFI = 100·pos/(pos+neg). Strict min_periods (NULL until 14 "
    "typical-price changes exist) and a zero-flow guard on both "
    "engines. Same single window exchange as the RSI family.",
)
def q_mfi14(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = _hourly_bars(spark, sf_dir)
    wb = Window.partitionBy("user_id").orderBy("bucket_start")
    w14 = wb.rowsBetween(-13, 0)
    tp = ((F.col("high") + F.col("low") + F.col("close")) / 3.0).alias("tp")
    tpf = bars.select("user_id", "bucket_start", tp, "volume")
    prev = F.lag("tp").over(wb)
    mf = tpf.select(
        "user_id",
        "bucket_start",
        F.when(F.col("tp") > prev, F.col("tp") * F.col("volume"))
        .otherwise(F.lit(0.0))
        .alias("pos_mf"),
        F.when(F.col("tp") < prev, F.col("tp") * F.col("volume"))
        .otherwise(F.lit(0.0))
        .alias("neg_mf"),
        prev.alias("prev_tp"),
    )
    s = mf.select(
        "user_id",
        "bucket_start",
        F.sum("pos_mf").over(w14).alias("sp"),
        F.sum("neg_mf").over(w14).alias("sn"),
        F.count("prev_tp").over(w14).alias("n_chg"),
    )
    mfi = F.when(
        (F.col("n_chg") >= 14) & (F.col("sp") + F.col("sn") > 0),
        100.0 * F.col("sp") / (F.col("sp") + F.col("sn")),
    )
    return s.select("user_id", "bucket_start", _r6(mfi).alias("mfi"))


@_register(
    "cci20",
    oracle=_BARS_CTE
    + f"""
    , tpf AS (
      SELECT user_id, bucket_start, (high + low + close) / 3.0 AS tp
      FROM bars
    ), w AS (
      SELECT user_id, bucket_start, tp,
             CASE WHEN COUNT(tp) OVER w20 >= 20 THEN AVG(tp) OVER w20 END AS sma,
             list(tp) OVER w20 AS arr
      FROM tpf
      WINDOW w20 AS ({_W} ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    ), md AS (
      SELECT user_id, bucket_start, tp, sma,
             list_reduce(list_transform(arr, x -> abs(x - sma)), (a, b) -> a + b)
               / 20.0 AS mean_dev
      FROM w WHERE TRUE
    )
    SELECT user_id, bucket_start,
           ROUND(CASE WHEN sma IS NOT NULL AND mean_dev > 0
                      THEN (tp - sma) / (0.015 * mean_dev) END, 6) AS cci
    FROM md
    """,
    tags=("window", "indicator"),
    doc="Commodity Channel Index (20): (tp − SMA20) / (0.015·mean "
    "deviation). Mean ABSOLUTE deviation around the CURRENT row's SMA "
    "is not sum-decomposable, so it folds a bounded 20-element window "
    "array with a JVM HOF (collect_list over the frame + aggregate) — "
    "the window-array pattern for non-decomposable window statistics; "
    "per-row state is 20 doubles regardless of history length. Strict "
    "min_periods; both engines fold the identical frame order.",
)
def q_cci20(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = _hourly_bars(spark, sf_dir)
    wb = Window.partitionBy("user_id").orderBy("bucket_start")
    w20 = wb.rowsBetween(-19, 0)
    tpf = bars.select(
        "user_id",
        "bucket_start",
        ((F.col("high") + F.col("low") + F.col("close")) / 3.0).alias("tp"),
    )
    w = tpf.select(
        "user_id",
        "bucket_start",
        "tp",
        F.when(F.count("tp").over(w20) >= 20, F.avg("tp").over(w20)).alias("sma"),
        F.collect_list("tp").over(w20).alias("arr"),
    )
    # mean deviation folded in its OWN projection (lateral-alias rule)
    md = w.select(
        "user_id",
        "bucket_start",
        "tp",
        "sma",
        (
            F.aggregate(
                F.transform(F.col("arr"), lambda x: F.abs(x - F.col("sma"))),
                F.lit(0.0),
                lambda a, b: a + b,
            )
            / 20.0
        ).alias("mean_dev"),
    )
    cci = F.when(
        F.col("sma").isNotNull() & (F.col("mean_dev") > 0),
        (F.col("tp") - F.col("sma")) / (0.015 * F.col("mean_dev")),
    )
    return md.select("user_id", "bucket_start", _r6(cci).alias("cci"))


@_register(
    "adx14",
    oracle=_BARS_CTE
    + f"""
    , d AS (
      SELECT user_id, bucket_start, close,
             CASE WHEN (high - lag(high) OVER ({_W})) > (lag(low) OVER ({_W}) - low)
                   AND (high - lag(high) OVER ({_W})) > 0
                  THEN high - lag(high) OVER ({_W}) ELSE 0.0 END AS dmp,
             CASE WHEN (lag(low) OVER ({_W}) - low) > (high - lag(high) OVER ({_W}))
                   AND (lag(low) OVER ({_W}) - low) > 0
                  THEN lag(low) OVER ({_W}) - low ELSE 0.0 END AS dmm,
             greatest(high - low,
                      abs(high - coalesce(lag(close) OVER ({_W}), close)),
                      abs(low - coalesce(lag(close) OVER ({_W}), close))) AS tr
      FROM bars
    ), sm AS (
      SELECT user_id, bucket_start, close,
             {_wilder_reduce('dmp', 14)} AS sdm,
             {_wilder_reduce('dmm', 14)} AS smm,
             {_wilder_reduce('tr', 14)} AS strv
      FROM d
    ), dx AS (
      SELECT user_id, bucket_start, close,
             CASE WHEN strv = 0 THEN 0.0 ELSE 100.0 * sdm / strv END AS di_plus,
             CASE WHEN strv = 0 THEN 0.0 ELSE 100.0 * smm / strv END AS di_minus
      FROM sm
    ), dx2 AS (
      SELECT user_id, bucket_start, close, di_plus, di_minus,
             CASE WHEN di_plus + di_minus = 0 THEN 0.0
                  ELSE 100.0 * abs(di_plus - di_minus) / (di_plus + di_minus)
             END AS dx
      FROM dx
    )
    SELECT user_id, bucket_start,
           ROUND(di_plus, 6) AS di_plus,
           ROUND(di_minus, 6) AS di_minus,
           ROUND({_wilder_reduce('dx', 14)}, 6) AS adx
    FROM dx2
    """,
    tags=("window", "indicator", "recursive"),
    doc="ADX(14) — the triple-recursive Wilder indicator: directional "
    "movements and true range each Wilder-smoothed, DI+/DI- ratios, "
    "then the DX series Wilder-smoothed AGAIN into ADX. Three "
    "dependent recursive folds per series, all JVM-side over one "
    "collected bounded array (the intraday HOF family — hourly bars "
    "≤ ~10k points/series); zero-denominator guards return 0 (total "
    "functions keep the chained folds well-defined identically in "
    "both engines). Oracle chains the same three list_reduce folds.",
)
def q_adx14(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = _hourly_bars(spark, sf_dir)
    wb = Window.partitionBy("user_id").orderBy("bucket_start")
    ph, pl, pc = (F.lag(c).over(wb) for c in ("high", "low", "close"))
    hd = F.col("high") - ph
    ld = pl - F.col("low")
    dmp = F.when((hd > ld) & (hd > 0), hd).otherwise(F.lit(0.0))
    dmm = F.when((ld > hd) & (ld > 0), ld).otherwise(F.lit(0.0))
    tr = F.greatest(
        F.col("high") - F.col("low"),
        F.abs(F.col("high") - F.coalesce(pc, F.col("close"))),
        F.abs(F.col("low") - F.coalesce(pc, F.col("close"))),
    )
    d = bars.select(
        "user_id", "bucket_start",
        dmp.alias("dmp"), dmm.alias("dmm"), tr.alias("tr"),
    )
    g = d.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct("bucket_start", "dmp", "dmm", "tr"))
        ).alias("s")
    )

    def wilder(arr: str, n: int = 14):
        return F.expr(
            f"aggregate(slice({arr}, 2, size({arr}) - 1), array({arr}[0]), "
            f"(acc, x) -> array_append(acc, (element_at(acc, -1) * {n - 1}.0 + x) / {n}.0))"
        )

    g = (
        g.withColumn("sdm", wilder("s.dmp"))
        .withColumn("smm", wilder("s.dmm"))
        .withColumn("strv", wilder("s.tr"))
    )
    di = lambda num: F.zip_with(  # noqa: E731
        F.col(num), F.col("strv"),
        lambda a, b: F.when(b == 0, F.lit(0.0)).otherwise(100.0 * a / b),
    )
    g = g.withColumn("dip", di("sdm")).withColumn("dim", di("smm"))
    g = g.withColumn(
        "dx",
        F.zip_with(
            "dip", "dim",
            lambda p, m: F.when(p + m == 0, F.lit(0.0)).otherwise(
                100.0 * F.abs(p - m) / (p + m)
            ),
        ),
    )
    g = g.withColumn("adx", wilder("dx"))
    z = g.select(
        "user_id",
        F.explode(
            F.arrays_zip(
                F.col("s").alias("row"),
                F.col("dip").alias("di_plus"),
                F.col("dim").alias("di_minus"),
                F.col("adx").alias("adx"),
            )
        ).alias("z"),
    )
    return z.select(
        "user_id",
        F.col("z.row.bucket_start").alias("bucket_start"),
        _r6(F.col("z.di_plus")).alias("di_plus"),
        _r6(F.col("z.di_minus")).alias("di_minus"),
        _r6(F.col("z.adx")).alias("adx"),
    )


@_register(
    "donchian20",
    oracle=_BARS_CTE
    + f"""
    SELECT user_id, bucket_start,
           ROUND(CASE WHEN COUNT(*) OVER w >= 20 THEN MAX(high) OVER w END, 6)
             AS dc_upper,
           ROUND(CASE WHEN COUNT(*) OVER w >= 20 THEN MIN(low) OVER w END, 6)
             AS dc_lower,
           ROUND(CASE WHEN COUNT(*) OVER w >= 20
                      THEN (MAX(high) OVER w + MIN(low) OVER w) / 2.0 END, 6)
             AS dc_mid
    FROM bars
    WINDOW w AS ({_W} ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    """,
    tags=("window", "indicator"),
    doc="Donchian channel (20): rolling extreme-high/extreme-low "
    "bands and midline, strict min_periods. Pure rolling min/max — "
    "the cheapest channel indicator, one shared window exchange.",
)
def q_donchian20(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = _hourly_bars(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("bucket_start").rowsBetween(-19, 0)
    # two-select shape (see williams_r): 3 window aggregates, not 8
    b = bars.select(
        "user_id",
        "bucket_start",
        F.count(F.lit(1)).over(w).alias("__n"),
        F.max("high").over(w).alias("__hi"),
        F.min("low").over(w).alias("__lo"),
    )
    full = F.col("__n") >= 20
    hi = F.when(full, F.col("__hi"))
    lo = F.when(full, F.col("__lo"))
    return b.select(
        "user_id",
        "bucket_start",
        _r6(hi).alias("dc_upper"),
        _r6(lo).alias("dc_lower"),
        _r6((hi + lo) / 2.0).alias("dc_mid"),
    )


@_register(
    "keltner20",
    oracle=_BARS_CTE
    + f"""
    , t AS (
      SELECT user_id, bucket_start,
             (high + low + close) / 3.0 AS tp,
             greatest(high - low,
                      abs(high - coalesce(lag(close) OVER ({_W}), close)),
                      abs(low - coalesce(lag(close) OVER ({_W}), close))) AS tr
      FROM bars
    ), sm AS (
      SELECT user_id, bucket_start,
             list_reduce(list(tp) OVER ({_W} ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW), (acc, e) -> acc * (1.0 - 2.0/21.0) + e * (2.0/21.0))
               AS mid,
             {_wilder_reduce('tr', 10)} AS atr10
      FROM t
    )
    SELECT user_id, bucket_start,
           ROUND(mid, 6) AS kc_mid,
           ROUND(mid + 2.0 * atr10, 6) AS kc_upper,
           ROUND(mid - 2.0 * atr10, 6) AS kc_lower
    FROM sm
    """,
    tags=("window", "indicator", "recursive"),
    doc="Keltner channel (EMA20 of typical price ± 2·Wilder-ATR10): "
    "composes the two recursive fold families already pinned by MACD "
    "and Wilder-RSI — one collected bounded array per series, both "
    "folds JVM-side, one shuffle.",
)
def q_keltner20(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = _hourly_bars(spark, sf_dir)
    wb = Window.partitionBy("user_id").orderBy("bucket_start")
    pc = F.lag("close").over(wb)
    tp = (F.col("high") + F.col("low") + F.col("close")) / 3.0
    tr = F.greatest(
        F.col("high") - F.col("low"),
        F.abs(F.col("high") - F.coalesce(pc, F.col("close"))),
        F.abs(F.col("low") - F.coalesce(pc, F.col("close"))),
    )
    t = bars.select("user_id", "bucket_start", tp.alias("tp"), tr.alias("tr"))
    g = t.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("bucket_start", "tp", "tr"))).alias("s")
    )
    # constants as Python-double reprs: Spark SQL would parse
    # `2.0/21.0` as DECIMAL division (truncated scale) while DuckDB's
    # `/` is double division — the repr'd literals keep both engines
    # on the identical IEEE constant (same trick as ema.py)
    a = 2.0 / 21.0
    ema = F.expr(
        "aggregate(slice(s.tp, 2, size(s.tp) - 1), array(s.tp[0]), "
        f"(acc, x) -> array_append(acc, element_at(acc, -1) * {1 - a!r} + x * {a!r}))"
    )
    atr = F.expr(
        "aggregate(slice(s.tr, 2, size(s.tr) - 1), array(s.tr[0]), "
        "(acc, x) -> array_append(acc, (element_at(acc, -1) * 9.0 + x) / 10.0))"
    )
    g = g.withColumn("mid", ema).withColumn("atr10", atr)
    z = g.select(
        "user_id",
        F.explode(
            F.arrays_zip(
                F.col("s").alias("row"),
                F.col("mid").alias("mid"),
                F.col("atr10").alias("atr10"),
            )
        ).alias("z"),
    )
    return z.select(
        "user_id",
        F.col("z.row.bucket_start").alias("bucket_start"),
        _r6(F.col("z.mid")).alias("kc_mid"),
        _r6(F.col("z.mid") + 2.0 * F.col("z.atr10")).alias("kc_upper"),
        _r6(F.col("z.mid") - 2.0 * F.col("z.atr10")).alias("kc_lower"),
    )


@_register(
    "ichimoku",
    oracle=_BARS_CTE
    + f"""
    , m AS (
      SELECT user_id, bucket_start, close,
             CASE WHEN COUNT(*) OVER w9 >= 9
                  THEN (MAX(high) OVER w9 + MIN(low) OVER w9) / 2.0 END AS tenkan,
             CASE WHEN COUNT(*) OVER w26 >= 26
                  THEN (MAX(high) OVER w26 + MIN(low) OVER w26) / 2.0 END AS kijun,
             CASE WHEN COUNT(*) OVER w52 >= 52
                  THEN (MAX(high) OVER w52 + MIN(low) OVER w52) / 2.0 END AS mid52
      FROM bars
      WINDOW w9  AS ({_W} ROWS BETWEEN 8 PRECEDING AND CURRENT ROW),
             w26 AS ({_W} ROWS BETWEEN 25 PRECEDING AND CURRENT ROW),
             w52 AS ({_W} ROWS BETWEEN 51 PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, bucket_start,
           ROUND(tenkan, 6) AS tenkan,
           ROUND(kijun, 6) AS kijun,
           ROUND(lag((tenkan + kijun) / 2.0, 26) OVER ({_W}), 6) AS senkou_a,
           ROUND(lag(mid52, 26) OVER ({_W}), 6) AS senkou_b,
           ROUND(lead(close, 26) OVER ({_W}), 6) AS chikou
    FROM m
    """,
    tags=("window", "indicator"),
    doc="Ichimoku overlay: three rolling midlines (9/26/52 bars, "
    "strict min_periods) plus the time-shifted spans (senkou A/B "
    "lagged 26 forward in display terms = lag 26 in data terms; "
    "chikou = close led 26). Three frames + two offsets share ONE "
    "window exchange and sort — frame variety is free once the "
    "partitioning is shared.",
)
def q_ichimoku(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = _hourly_bars(spark, sf_dir)
    wb = Window.partitionBy("user_id").orderBy("bucket_start")

    def mid(n: int):
        w = wb.rowsBetween(-(n - 1), 0)
        return F.when(
            F.count(F.lit(1)).over(w) >= n,
            (F.max("high").over(w) + F.min("low").over(w)) / 2.0,
        )

    m = bars.select(
        "user_id",
        "bucket_start",
        "close",
        mid(9).alias("tenkan"),
        mid(26).alias("kijun"),
        mid(52).alias("mid52"),
    )
    return m.select(
        "user_id",
        "bucket_start",
        _r6(F.col("tenkan")).alias("tenkan"),
        _r6(F.col("kijun")).alias("kijun"),
        _r6(F.lag((F.col("tenkan") + F.col("kijun")) / 2.0, 26).over(wb)).alias(
            "senkou_a"
        ),
        _r6(F.lag("mid52", 26).over(wb)).alias("senkou_b"),
        _r6(F.lead("close", 26).over(wb)).alias("chikou"),
    )


_PSAR_RISE = "least(acc.psar + acc.af * (acc.ep - acc.psar), acc.p1l, acc.p2l)"
_PSAR_FALL = "greatest(acc.psar + acc.af * (acc.ep - acc.psar), acc.p1h, acc.p2h)"
_PSAR_INIT = (
    "named_struct("
    "'rising', s[1].high + s[1].low >= s[0].high + s[0].low, "
    "'psar', CAST(CASE WHEN s[1].high + s[1].low >= s[0].high + s[0].low THEN s[0].low ELSE s[0].high END AS DOUBLE), "
    "'ep', CAST(CASE WHEN s[1].high + s[1].low >= s[0].high + s[0].low THEN s[1].high ELSE s[1].low END AS DOUBLE), "
    "'af', CAST(0.02 AS DOUBLE), "
    "'p1h', CAST(s[1].high AS DOUBLE), 'p1l', CAST(s[1].low AS DOUBLE), "
    "'p2h', CAST(s[0].high AS DOUBLE), 'p2l', CAST(s[0].low AS DOUBLE), "
    "'arr', array(CAST(NULL AS DOUBLE), "
    "CAST(CASE WHEN s[1].high + s[1].low >= s[0].high + s[0].low THEN s[0].low ELSE s[0].high END AS DOUBLE)))"
)
_PSAR_STEP = f"""named_struct(
  'rising', CASE WHEN acc.rising THEN NOT (e.low < {_PSAR_RISE}) ELSE (e.high > {_PSAR_FALL}) END,
  'psar', CASE WHEN acc.rising
               THEN CASE WHEN e.low < {_PSAR_RISE} THEN acc.ep ELSE {_PSAR_RISE} END
               ELSE CASE WHEN e.high > {_PSAR_FALL} THEN acc.ep ELSE {_PSAR_FALL} END END,
  'ep', CASE WHEN acc.rising
             THEN CASE WHEN e.low < {_PSAR_RISE} THEN CAST(e.low AS DOUBLE)
                       WHEN e.high > acc.ep THEN CAST(e.high AS DOUBLE) ELSE acc.ep END
             ELSE CASE WHEN e.high > {_PSAR_FALL} THEN CAST(e.high AS DOUBLE)
                       WHEN e.low < acc.ep THEN CAST(e.low AS DOUBLE) ELSE acc.ep END END,
  'af', CASE WHEN acc.rising
             THEN CASE WHEN e.low < {_PSAR_RISE} THEN CAST(0.02 AS DOUBLE)
                       WHEN e.high > acc.ep THEN least(acc.af + 0.02, 0.2) ELSE acc.af END
             ELSE CASE WHEN e.high > {_PSAR_FALL} THEN CAST(0.02 AS DOUBLE)
                       WHEN e.low < acc.ep THEN least(acc.af + 0.02, 0.2) ELSE acc.af END END,
  'p1h', CAST(e.high AS DOUBLE), 'p1l', CAST(e.low AS DOUBLE),
  'p2h', acc.p1h, 'p2l', acc.p1l,
  'arr', array_append(acc.arr,
    CASE WHEN acc.rising
         THEN CASE WHEN e.low < {_PSAR_RISE} THEN acc.ep ELSE {_PSAR_RISE} END
         ELSE CASE WHEN e.high > {_PSAR_FALL} THEN acc.ep ELSE {_PSAR_FALL} END END))"""

# DuckDB cannot run this as a lambda fold (list_reduce lambdas evaluate
# CASE branches inconsistently across struct fields — observed engine
# bug), so the oracle carries the identical state machine as a
# RECURSIVE CTE: one frontier row per series per step, plain SQL CASE.
_S_RISE = "least(s.psar + s.af * (s.ep - s.psar), s.p1l, s.p2l)"
_S_FALL = "greatest(s.psar + s.af * (s.ep - s.psar), s.p1h, s.p2h)"
_PSAR_ORACLE = f"""
WITH RECURSIVE bars AS (
  -- HAVING mirrors _BARS_CTE's no-empty-bar contract (incl. the
  -- NaN mask: NaN ticks are not trades)
  SELECT user_id, date_trunc('hour', ts) AS bucket_start,
         max(value) FILTER (WHERE isfinite(value)) AS high,
         min(value) FILTER (WHERE isfinite(value)) AS low
  FROM events GROUP BY user_id, date_trunc('hour', ts)
  HAVING max(value) FILTER (WHERE isfinite(value)) IS NOT NULL
), b AS (
  SELECT user_id, bucket_start, high, low,
         CAST(row_number() OVER (PARTITION BY user_id ORDER BY bucket_start) AS INTEGER) AS rn
  FROM bars
), step AS (
  SELECT b2.user_id, b2.rn,
         b2.high + b2.low >= b1.high + b1.low AS rising,
         CAST(CASE WHEN b2.high + b2.low >= b1.high + b1.low THEN b1.low ELSE b1.high END AS DOUBLE) AS psar,
         CAST(CASE WHEN b2.high + b2.low >= b1.high + b1.low THEN b2.high ELSE b2.low END AS DOUBLE) AS ep,
         CAST(0.02 AS DOUBLE) AS af,
         CAST(b2.high AS DOUBLE) AS p1h, CAST(b2.low AS DOUBLE) AS p1l,
         CAST(b1.high AS DOUBLE) AS p2h, CAST(b1.low AS DOUBLE) AS p2l
  FROM b b1 JOIN b b2 ON b1.user_id = b2.user_id AND b1.rn = 1 AND b2.rn = 2
  UNION ALL
  SELECT s.user_id, n.rn,
         CASE WHEN s.rising THEN NOT (n.low < {_S_RISE}) ELSE (n.high > {_S_FALL}) END,
         CASE WHEN s.rising
              THEN CASE WHEN n.low < {_S_RISE} THEN s.ep ELSE {_S_RISE} END
              ELSE CASE WHEN n.high > {_S_FALL} THEN s.ep ELSE {_S_FALL} END END,
         CASE WHEN s.rising
              THEN CASE WHEN n.low < {_S_RISE} THEN CAST(n.low AS DOUBLE)
                        WHEN n.high > s.ep THEN CAST(n.high AS DOUBLE) ELSE s.ep END
              ELSE CASE WHEN n.high > {_S_FALL} THEN CAST(n.high AS DOUBLE)
                        WHEN n.low < s.ep THEN CAST(n.low AS DOUBLE) ELSE s.ep END END,
         CASE WHEN s.rising
              THEN CASE WHEN n.low < {_S_RISE} THEN CAST(0.02 AS DOUBLE)
                        WHEN n.high > s.ep THEN least(s.af + 0.02, 0.2) ELSE s.af END
              ELSE CASE WHEN n.high > {_S_FALL} THEN CAST(0.02 AS DOUBLE)
                        WHEN n.low < s.ep THEN least(s.af + 0.02, 0.2) ELSE s.af END END,
         CAST(n.high AS DOUBLE), CAST(n.low AS DOUBLE), s.p1h, s.p1l
  FROM step s JOIN b n ON n.user_id = s.user_id AND n.rn = s.rn + 1
)
SELECT b.user_id, b.bucket_start, ROUND(step.psar, 6) AS psar
FROM b LEFT JOIN step ON b.user_id = step.user_id AND b.rn = step.rn
"""


@_register(
    "psar",
    oracle=_PSAR_ORACLE,
    tags=("window", "indicator", "recursive", "iterative"),
    doc="Parabolic SAR — the PATH-DEPENDENT indicator: a per-series "
    "state machine (trend direction, extreme point, accelerating "
    "factor with reset-on-reversal) that no window frame expresses. "
    "Spark folds the full transition function JVM-side with one "
    "aggregate() over the bounded per-series array, state = one "
    "9-field struct. The oracle runs the IDENTICAL state machine as "
    "a DuckDB recursive CTE (one frontier row per series per step) — "
    "DuckDB's lambda folds evaluate CASE branches inconsistently "
    "across struct fields (engine bug found while building this), so "
    "recursion is the trustworthy formulation there. Exact to 1e-15 "
    "against an independent Python reference before rounding.",
)
def q_psar(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = _hourly_bars(spark, sf_dir)
    g = bars.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("bucket_start", "high", "low"))).alias(
            "s0"
        )
    )
    g = g.withColumn(
        "s", F.expr("transform(s0, x -> named_struct('high', x.high, 'low', x.low))")
    )
    psar_arr = F.when(
        F.size("s") < 2, F.expr("array(CAST(NULL AS DOUBLE))")
    ).otherwise(
        F.expr(
            f"aggregate(slice(s, 3, size(s) - 2), {_PSAR_INIT}, "
            f"(acc, e) -> {_PSAR_STEP}).arr"
        )
    )
    z = g.select(
        "user_id",
        F.explode(
            F.arrays_zip(F.col("s0").alias("row"), psar_arr.alias("psar"))
        ).alias("z"),
    )
    return z.select(
        "user_id",
        F.col("z.row.bucket_start").alias("bucket_start"),
        _r6(F.col("z.psar")).alias("psar"),
    )
