"""Fourth analytics wave: rolling beta/alpha against the market,
peak-concurrency via a distributed prefix sum, and the embedding
dimension-correlation matrix.

Reference parity: rolling beta is the risk-model companion to
rolling_corr20 (same window frame, co-moment ratio instead of the
normalized one); peak_concurrent_sessions_daily shows the PREFIX-SUM
DECOMPOSITION — the scan-line running count is inherently sequential,
so the Spark plan computes it as within-day cumsums plus a
metadata-sized day-offset table, the way a 1000-executor cluster has
to; embedding_dim_correlation is the feature-redundancy diagnostic run
before training on a vector column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stockpulse_spark.functions.nullsafe import corr_nn, not_finite
from stockpulse_spark.plans.registry import (
    _BARS_CTE,
    _hourly_bars,
    _r6,
    _register,
    _t,
)

_W = "PARTITION BY user_id ORDER BY bucket_start"
_XS = "PARTITION BY bucket_start"


@_register(
    "rolling_beta20",
    oracle=_BARS_CTE
    + f"""
    , m AS (
      SELECT user_id, bucket_start, close,
             AVG(close) OVER ({_XS}) AS mkt
      FROM bars
    )
    SELECT user_id, bucket_start,
           ROUND(CASE WHEN COUNT(*) OVER w >= 20
                      THEN covar_pop(close, mkt) OVER w
                           / NULLIF(var_pop(mkt) OVER w, 0) END, 6)
             AS beta20,
           -- alpha from 6dp-rounded pieces: the raw product
           -- beta * avg(mkt) amplifies last-ulp window-aggregate
           -- differences across engines onto rounding boundaries
           ROUND(CASE WHEN COUNT(*) OVER w >= 20
                      THEN ROUND(AVG(close) OVER w, 6)
                           - ROUND(covar_pop(close, mkt) OVER w
                                   / NULLIF(var_pop(mkt) OVER w, 0), 6)
                             * ROUND(AVG(mkt) OVER w, 6) END, 6)
             AS alpha20
    FROM m
    WINDOW w AS ({_W} ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    """,
    tags=("window", "indicator", "cross-series"),
    doc="Rolling 20-bar market beta and alpha per series: "
    "covar_pop/var_pop over the trailing frame against the "
    "equal-weight market close (population moments on BOTH sides so "
    "no ddof trap; zero-variance frames NULLed). Same two-exchange "
    "shape as rolling_corr20 — per-bucket market mean, then all four "
    "window aggregates share the per-user frame — and both engines "
    "evaluate the co-moments decomposably, never re-scanning the "
    "frame.",
)
def q_rolling_beta20(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = _hourly_bars(spark, sf_dir).select(
        "user_id", "bucket_start", "close"
    )
    mkt = F.avg("close").over(Window.partitionBy("bucket_start"))
    m = bars.select("user_id", "bucket_start", "close", mkt.alias("mkt"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("bucket_start")
        .rowsBetween(-19, 0)
    )
    # two-select shape (see williams_r): the co-moments feed both
    # beta and alpha — naming them computes 5 window aggregates not 8
    mm = m.select(
        "user_id",
        "bucket_start",
        F.count(F.lit(1)).over(w).alias("__n"),
        F.covar_pop("close", "mkt").over(w).alias("__cov"),
        F.var_pop("mkt").over(w).alias("__var"),
        F.avg("close").over(w).alias("__avgc"),
        F.avg("mkt").over(w).alias("__avgm"),
    )
    enough = F.col("__n") >= 20
    beta = F.col("__cov") / F.nullif(F.col("__var"), F.lit(0.0))
    # alpha from 6dp-rounded pieces — see the oracle comment
    alpha = _r6(F.col("__avgc")) - _r6(beta) * _r6(F.col("__avgm"))
    return mm.select(
        "user_id",
        "bucket_start",
        _r6(F.when(enough, beta)).alias("beta20"),
        _r6(F.when(enough, alpha)).alias("alpha20"),
    )


@_register(
    "peak_concurrent_sessions_daily",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER
                    (PARTITION BY user_id ORDER BY ts)) > 1800000000
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                     IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), sess AS (
      SELECT user_id,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id,
             ts
      FROM flagged
    ), intervals AS (
      SELECT MIN(ts) AS s, MAX(ts) AS e
      FROM sess GROUP BY user_id, session_id
    ), deltas AS (
      SELECT s AS ts, 1 AS delta FROM intervals
      UNION ALL
      SELECT e + INTERVAL 1 MICROSECOND, -1 FROM intervals
    ), running AS (
      SELECT ts, delta,
             SUM(delta) OVER (ORDER BY ts, delta
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS concurrent
      FROM deltas
    )
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           CAST(MAX(concurrent) AS BIGINT) AS peak_concurrent
    FROM running GROUP BY 1 ORDER BY day
    """,
    tags=("analytics", "session", "window"),
    doc="Peak concurrent sessions per day, scan-line over session "
    "intervals (+1 at start, -1 one microsecond after end, integer "
    "running sum, daily max). The oracle states it as one global "
    "ordered cumsum; the Spark plan computes the SAME sequence as a "
    "distributed prefix sum — within-day cumsums in parallel plus a "
    "days-sized exclusive-offset table joined back broadcast — "
    "because a single-partition window over all deltas is the thing "
    "that does NOT survive 100 TB. Ties ordered (ts, delta) so ends "
    "process before starts at the same instant, identically in both "
    "engines; all-integer state, no float drift.",
)
def q_peak_concurrent_sessions_daily(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
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
        "user_id", "ts", new_session.alias("new_session")
    ).withColumn(
        "session_id",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    intervals = sess.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("s"), F.max("ts").alias("e")
    )
    deltas = intervals.select(
        F.col("s").alias("ts"), F.lit(1).alias("delta")
    ).unionAll(
        intervals.select(
            (F.col("e") + F.expr("INTERVAL 1 MICROSECOND")).alias("ts"),
            F.lit(-1).alias("delta"),
        )
    ).withColumn("day", F.date_trunc("day", "ts"))
    # distributed prefix sum: parallel within-day cumsum ...
    w_day = (
        Window.partitionBy("day")
        .orderBy("ts", "delta")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    within = deltas.withColumn("run_in_day", F.sum("delta").over(w_day))
    # ... plus an exclusive day-offset cumsum over the DAYS-sized table
    day_tot = deltas.groupBy("day").agg(F.sum("delta").alias("day_net"))
    w_days = (
        Window.partitionBy()
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = day_tot.select(
        "day", F.coalesce(F.sum("day_net").over(w_days), F.lit(0)).alias("off")
    )
    return (
        within.join(F.broadcast(offsets), "day")
        .groupBy("day")
        .agg(
            F.max(F.col("run_in_day") + F.col("off")).alias(
                "peak_concurrent"
            )
        )
        .orderBy("day")
    )


_N_DIMS_CORR = 8


@_register(
    "embedding_dim_correlation",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
      WHERE embedding IS NULL OR len(list_filter(embedding, x -> NOT isfinite(x))) = 0
    ), dims AS (
      SELECT vec_id, p.pos - 1 AS pos, e[p.pos] AS val
      FROM v, (SELECT unnest(range(1, {_N_DIMS_CORR + 1})) AS pos) p
      WHERE e[p.pos] IS NOT NULL
    )
    -- corr restated as covar_pop/nullif(stddev product): Spark's ANSI
    -- corr raises DIVIDE_BY_ZERO on a constant dim, DuckDB's returns
    -- NULL; the explicit formula is total AND identical in both
    SELECT a.pos AS dim_i, b.pos AS dim_j,
           ROUND(covar_pop(a.val, b.val)
                 / nullif(stddev_pop(a.val) * stddev_pop(b.val), 0),
                 6) AS pearson
    FROM dims a JOIN dims b
      ON a.vec_id = b.vec_id AND a.pos < b.pos
    GROUP BY a.pos, b.pos
    ORDER BY dim_i, dim_j
    """,
    tags=("llmdata", "similarity", "agg"),
    doc=f"Pairwise Pearson correlation among the first {_N_DIMS_CORR} "
    "embedding dimensions — the feature-redundancy diagnostic "
    "(highly correlated dims mean wasted capacity / a candidate for "
    "PCA before indexing). The within-vector self-join is an "
    f"equi-join on vec_id with bounded {_N_DIMS_CORR}x"
    f"{_N_DIMS_CORR} fanout, then one partial-agg shuffle of "
    "co-moment triples per (i, j) cell — the DIMSxDIMS output is "
    "metadata at any corpus size. corr is a decomposable aggregate "
    "in both engines (no per-cell re-scan).",
)
def q_embedding_dim_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = _t(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNull()
        | ~F.exists("embedding", lambda x: not_finite(x))
    ).select(
        "vec_id",
        F.slice(F.col("embedding").cast("array<double>"), 1, _N_DIMS_CORR)
        .alias("e"),
    )
    dims = v.select("vec_id", F.posexplode("e").alias("pos", "val"))
    a = dims.select(
        "vec_id", F.col("pos").alias("dim_i"), F.col("val").alias("vi")
    )
    b = dims.select(
        "vec_id", F.col("pos").alias("dim_j"), F.col("val").alias("vj")
    )
    return (
        a.join(b, "vec_id")
        .filter(F.col("dim_i") < F.col("dim_j"))
        .groupBy("dim_i", "dim_j")
        .agg(_r6(corr_nn("vi", "vj")).alias("pearson"))
        .orderBy("dim_i", "dim_j")
    )


@_register(
    "hourly_count_autocorr",
    oracle="""
    WITH hc AS (
      SELECT event_type, date_trunc('hour', ts) AS hr,
             COUNT(*) AS n, ROUND(SUM(value), 6) AS total
      FROM events GROUP BY 1, 2
    ), lagged AS (
      SELECT event_type, n,
             lag(n) OVER (PARTITION BY event_type ORDER BY hr) AS n_prev
      FROM hc
    )
    , sums AS (
      -- corr from exact BIGINT power sums: Spark's ANSI corr raises
      -- DIVIDE_BY_ZERO on single-pair groups and float-sum order
      -- differs between engines; integer sums make it total AND
      -- bit-identical (NULL when the variance product is 0)
      SELECT event_type,
             COUNT(*) AS c,
             SUM(n) AS sx, SUM(n_prev) AS sy,
             SUM(n * n) AS sxx, SUM(n_prev * n_prev) AS syy,
             SUM(n * n_prev) AS sxy
      FROM lagged WHERE n_prev IS NOT NULL GROUP BY event_type
    )
    SELECT event_type,
           c AS n_hours,
           ROUND((CAST(c AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / nullif(sqrt(CAST(c AS DOUBLE) * sxx
                               - CAST(sx AS DOUBLE) * sx)
                          * sqrt(CAST(c AS DOUBLE) * syy
                                 - CAST(sy AS DOUBLE) * sy), 0), 6)
             AS autocorr_lag1
    FROM sums ORDER BY event_type
    """,
    tags=("analytics", "window", "agg"),
    doc="Lag-1 autocorrelation of hourly event counts per type — the "
    "burstiness diagnostic (white-noise arrivals ~0; sustained load "
    "waves or feedback loops push it up). Counts first (events "
    "collapse to an HOURS x TYPES table in one partial-agg shuffle), "
    "then lag + corr run on that metadata-sized rollup — never "
    "window the raw events for a rollup statistic.",
)
def q_hourly_count_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    hc = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy("hr")
    lagged = hc.select(
        "event_type",
        F.col("n"),
        F.lag("n").over(w).alias("n_prev"),
    ).filter(F.col("n_prev").isNotNull())
    # corr from exact BIGINT power sums (see oracle note): total over
    # degenerate groups and bit-identical across engines
    sums = lagged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("c"),
        F.sum("n").alias("sx"),
        F.sum("n_prev").alias("sy"),
        F.sum(F.col("n") * F.col("n")).alias("sxx"),
        F.sum(F.col("n_prev") * F.col("n_prev")).alias("syy"),
        F.sum(F.col("n") * F.col("n_prev")).alias("sxy"),
    )
    c = F.col("c").cast("double")
    num = c * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")
    den = F.sqrt(
        c * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    ) * F.sqrt(c * F.col("syy") - F.col("sy").cast("double") * F.col("sy"))
    return sums.select(
        "event_type",
        F.col("c").alias("n_hours"),
        _r6(num / F.nullif(den, F.lit(0.0))).alias("autocorr_lag1"),
    ).orderBy("event_type")
