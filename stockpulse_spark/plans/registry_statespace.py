"""State-space filtering over the hourly bar series: a local-level
Kalman filter and RiskMetrics EWMA volatility.

Reference parity: the reference's dashboard smooths price series with
moving averages (app/dashboard.py chart panels); these are the two
state-space upgrades of that smoothing a quant pipeline reaches for —
an optimal-gain level tracker (Kalman) and the exponentially-weighted
variance estimator (RiskMetrics lambda=0.94) that backs its VaR
cousins (registry_risk.py).

Both are scalar recursions that neither a window frame nor a plain
list_reduce can express (the Kalman gain depends on the evolving
error covariance, the EWMA variance on the previous variance), so the
Spark side folds a named_struct accumulator with `aggregate` entirely
in codegen — one shuffle to collect each bounded series, the same
contract as the MACD/Holt folds — and the oracles run LOCKSTEP
RECURSIVE CTEs (all series advance one step per iteration). Scalar
operation order is identical in both engines, so values match
bit-for-bit before rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stockpulse_spark.plans.registry import _BARS_CTE, _r6, _register
from stockpulse_spark.plans.registry_indicators import _hourly_bars

# Local-level model: y_t = l_t + eps (var R), l_t = l_{t-1} + eta
# (var Q). Fixed, unit-consistent noise variances; the filter's
# behavior is governed by the ratio Q/R.
_KF_Q, _KF_R = 0.1, 1.0

# The same inlined-expression discipline as the Holt fold: SQL
# lambdas bind no intermediates, so the gain expression appears
# verbatim inside level/covariance updates — mirroring the oracle's
# textual recursion keeps scalar operation order identical.
_KF_PPRED = f"(acc.p + {_KF_Q!r})"
_KF_GAIN = f"({_KF_PPRED} / ({_KF_PPRED} + {_KF_R!r}))"
_KF_NEWL = f"(acc.l + {_KF_GAIN} * (x - acc.l))"
_KF_NEWP = f"((1.0 - {_KF_GAIN}) * {_KF_PPRED})"


@_register(
    "kalman_local_level",
    oracle=_BARS_CTE.replace("WITH ", "WITH RECURSIVE ", 1)
    + f"""
    , bt AS (
      SELECT user_id, bucket_start, close,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY bucket_start) - 1 AS t,
             COUNT(*) OVER (PARTITION BY user_id) AS n
      FROM bars
    ), state AS (
      SELECT user_id, 0 AS t, CAST(close AS DOUBLE) AS l,
             CAST({_KF_R!r} AS DOUBLE) AS p,
             CAST(NULL AS DOUBLE) AS gain,
             CAST(NULL AS DOUBLE) AS innovation
      FROM bt WHERE t = 0
      UNION ALL
      SELECT s.user_id, b.t,
             (s.l + ((s.p + {_KF_Q!r}) / ((s.p + {_KF_Q!r}) + {_KF_R!r}))
                    * (b.close - s.l)),
             ((1.0 - ((s.p + {_KF_Q!r}) / ((s.p + {_KF_Q!r}) + {_KF_R!r})))
                    * (s.p + {_KF_Q!r})),
             ((s.p + {_KF_Q!r}) / ((s.p + {_KF_Q!r}) + {_KF_R!r})),
             (b.close - s.l)
      FROM state s JOIN bt b
        ON b.user_id = s.user_id AND b.t = s.t + 1
    )
    SELECT b.user_id, b.bucket_start, ROUND(b.close, 6) AS close,
           ROUND(s.l, 6) AS level,
           ROUND(s.p, 6) AS err_var,
           ROUND(s.gain, 6) AS gain,
           ROUND(s.innovation, 6) AS innovation
    FROM state s JOIN bt b USING (user_id, t)
    """,
    tags=("window", "indicator", "statespace"),
    doc="Local-level Kalman filter (random-walk level, Q=0.1, R=1.0, "
    "init l0=y0, P0=R) per series over hourly bars: filtered level, "
    "posterior error variance, gain, and one-step innovation. The "
    "gain adapts per step from the error covariance — a TWO-state "
    "recursion folded JVM-side via `aggregate` with a named_struct "
    "accumulator (one shuffle, bounded-series contract shared with "
    "the MACD/Holt folds); the oracle advances every series in "
    "lockstep through a RECURSIVE CTE. Identical scalar operation "
    "order in both engines -> bit-for-bit agreement before rounding. "
    "At 100 TB the per-series state is two doubles; the collect is "
    "bounded by series length, not corpus size.",
)
def q_kalman_local_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = _hourly_bars(spark, sf_dir).select(
        "user_id", "bucket_start", "close"
    )
    fold = (
        "aggregate("
        "  slice(s.close, 2, size(s.close) - 1), "
        "  named_struct("
        "    'l', CAST(s.close[0] AS DOUBLE), "
        f"    'p', CAST({_KF_R!r} AS DOUBLE), "
        "    'lev', array(CAST(s.close[0] AS DOUBLE)), "
        f"    'pv', array(CAST({_KF_R!r} AS DOUBLE)), "
        "    'g', array(CAST(NULL AS DOUBLE)), "
        "    'inn', array(CAST(NULL AS DOUBLE))), "
        "  (acc, x) -> named_struct("
        f"    'l', {_KF_NEWL}, "
        f"    'p', {_KF_NEWP}, "
        f"    'lev', array_append(acc.lev, {_KF_NEWL}), "
        f"    'pv', array_append(acc.pv, {_KF_NEWP}), "
        f"    'g', array_append(acc.g, {_KF_GAIN}), "
        "    'inn', array_append(acc.inn, x - acc.l)))"
    )
    g = (
        bars.groupBy("user_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("bucket_start", "close"))
            ).alias("s")
        )
        .withColumn("st", F.expr(fold))
    )
    z = g.select(
        "user_id",
        F.explode(
            F.arrays_zip(
                F.col("s"),
                F.col("st.lev").alias("level"),
                F.col("st.pv").alias("err_var"),
                F.col("st.g").alias("gain"),
                F.col("st.inn").alias("innovation"),
            )
        ).alias("z"),
    )
    return z.select(
        "user_id",
        F.col("z.s.bucket_start").alias("bucket_start"),
        _r6(F.col("z.s.close")).alias("close"),
        _r6(F.col("z.level")).alias("level"),
        _r6(F.col("z.err_var")).alias("err_var"),
        _r6(F.col("z.gain")).alias("gain"),
        _r6(F.col("z.innovation")).alias("innovation"),
    )


_EWMA_LAMBDA = 0.94


@_register(
    "ewma_volatility",
    oracle=_BARS_CTE.replace("WITH ", "WITH RECURSIVE ", 1)
    + f"""
    , rt AS (
      SELECT user_id, bucket_start, close,
             CASE WHEN close > 0
                   AND lag(close) OVER (PARTITION BY user_id
                                        ORDER BY bucket_start) > 0
                  THEN ln(close / lag(close) OVER (PARTITION BY user_id
                                                   ORDER BY bucket_start))
             END AS r
      FROM bars
    ), bt AS (
      SELECT user_id, bucket_start, r,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY bucket_start) - 1 AS t
      FROM rt WHERE r IS NOT NULL
    ), state AS (
      SELECT user_id, 0 AS t, r * r AS s2 FROM bt WHERE t = 0
      UNION ALL
      SELECT s.user_id, b.t,
             {_EWMA_LAMBDA!r} * s.s2
               + {1 - _EWMA_LAMBDA!r} * (b.r * b.r)
      FROM state s JOIN bt b
        ON b.user_id = s.user_id AND b.t = s.t + 1
    )
    SELECT b.user_id, b.bucket_start,
           ROUND(b.r, 6) AS log_return,
           ROUND(sqrt(s.s2), 6) AS ewma_vol
    FROM state s JOIN bt b USING (user_id, t)
    """,
    tags=("window", "indicator", "statespace", "risk"),
    doc="RiskMetrics EWMA volatility (lambda=0.94, init sigma2_1 = "
    "r1^2) over hourly log returns per series — the exponentially-"
    "weighted variance that backs parametric VaR (registry_risk.py "
    "computes the historical kind). Returns come from one lag window "
    "sharing the per-series sort with the collect; the variance "
    "recursion folds JVM-side (named_struct accumulator, same "
    "bounded-series contract as the EMA family) against a lockstep "
    "recursive-CTE oracle — bit-for-bit scalar parity. State per "
    "series is one double; nothing driver-side.",
)
def q_ewma_volatility(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = _hourly_bars(spark, sf_dir).select(
        "user_id", "bucket_start", "close"
    )
    w = Window.partitionBy("user_id").orderBy("bucket_start")
    rt = bars.select(
        "user_id",
        "bucket_start",
        # a zero/negative close breaks the return series rather than
        # the job: sf0.1 bars contain close == 0, and under ANSI the
        # unguarded ratio is a DIVIDE_BY_ZERO error (ln of a
        # non-positive ratio is no better); the CASE guard is mirrored
        # in the oracle so both engines drop the same rows
        F.when(
            (F.col("close") > 0) & (F.lag("close").over(w) > 0),
            F.log(F.col("close") / F.lag("close").over(w)),
        ).alias("r"),
    ).filter(F.col("r").isNotNull())
    lam = _EWMA_LAMBDA
    newv = f"{lam!r} * acc.s2 + {1 - lam!r} * (x * x)"
    fold = (
        "aggregate("
        "  slice(sr, 2, size(sr) - 1), "
        "  named_struct("
        "    's2', CAST(sr[0] * sr[0] AS DOUBLE), "
        "    'out', array(CAST(sr[0] * sr[0] AS DOUBLE))), "
        "  (acc, x) -> named_struct("
        f"    's2', {newv}, "
        f"    'out', array_append(acc.out, {newv})))"
    )
    g = (
        rt.groupBy("user_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("bucket_start", "r"))
            ).alias("s")
        )
        .withColumn("sr", F.expr("transform(s, e -> e.r)"))
        .withColumn("st", F.expr(fold))
    )
    z = g.select(
        "user_id",
        F.explode(
            F.arrays_zip(F.col("s"), F.col("st.out").alias("s2"))
        ).alias("z"),
    )
    return z.select(
        "user_id",
        F.col("z.s.bucket_start").alias("bucket_start"),
        _r6(F.col("z.s.r")).alias("log_return"),
        _r6(F.sqrt(F.col("z.s2"))).alias("ewma_vol"),
    )


@_register(
    "kalman_events_batch",
    oracle=f"""
    WITH RECURSIVE bt AS (
      -- finite-tick substream: round-6 sensor-garbage contract,
      -- mirrored in the streaming kernel (_finite_ticks) and the
      -- Spark batch twin so all three agree on degenerate corpora
      SELECT user_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts) - 1 AS t,
             COUNT(*) OVER (PARTITION BY user_id) AS n
      FROM events
      WHERE value IS NOT NULL AND isfinite(value)
    ), state AS (
      SELECT user_id, 0 AS t, n, CAST(value AS DOUBLE) AS l,
             CAST({_KF_R!r} AS DOUBLE) AS p
      FROM bt WHERE t = 0
      UNION ALL
      SELECT s.user_id, b.t, s.n,
             (s.l + ((s.p + {_KF_Q!r}) / ((s.p + {_KF_Q!r}) + {_KF_R!r}))
                    * (b.value - s.l)),
             ((1.0 - ((s.p + {_KF_Q!r}) / ((s.p + {_KF_Q!r}) + {_KF_R!r})))
                    * (s.p + {_KF_Q!r}))
      FROM state s JOIN bt b
        ON b.user_id = s.user_id AND b.t = s.t + 1
    )
    SELECT user_id, n AS n_obs,
           ROUND(l, 6) AS level, ROUND(p, 6) AS err_var
    FROM state WHERE t = n - 1
    ORDER BY user_id
    """,
    tags=("statespace", "streaming"),
    doc="FINAL Kalman state per user over the raw event sequence "
    "(local-level filter, same Q/R as `kalman_local_level` but "
    "per-event observations) — the batch twin of the STREAMING "
    "stateful Kalman operator (streaming/transform_state.py:"
    "running_kalman_filter): the stream folds the identical "
    "recursion across micro-batches with (l, p, n) in keyed state, "
    "and tests assert its final rows equal this query under any "
    "batch split. Spark side: one scalar fold per series (no output "
    "arrays — final state only); oracle: lockstep recursive CTE.",
)
def q_kalman_events_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stockpulse_spark.functions.nullsafe import not_finite
    from stockpulse_spark.plans.registry import _t

    ev = (
        _t(spark, sf_dir, "events")
        .select("user_id", "ts", "value")
        .filter(F.col("value").isNotNull() & ~not_finite("value"))
    )
    fold = (
        "aggregate("
        "  slice(sv, 2, size(sv) - 1), "
        "  named_struct("
        "    'l', CAST(sv[0] AS DOUBLE), "
        f"    'p', CAST({_KF_R!r} AS DOUBLE)), "
        "  (acc, x) -> named_struct("
        f"    'l', {_KF_NEWL}, "
        f"    'p', {_KF_NEWP}))"
    )
    g = (
        ev.groupBy("user_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("ts", "value"))).alias("s")
        )
        .withColumn("sv", F.expr("transform(s, e -> e.value)"))
        .withColumn("st", F.expr(fold))
    )
    return g.select(
        "user_id",
        F.size("sv").cast("bigint").alias("n_obs"),
        _r6(F.col("st.l")).alias("level"),
        _r6(F.col("st.p")).alias("err_var"),
    ).orderBy("user_id")
