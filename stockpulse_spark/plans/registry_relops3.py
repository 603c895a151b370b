"""Third relational-ops wave: GROUPING SETS with grouping_id,
UNPIVOT (wide->long melt), time-weighted average price over irregular
event spacing, and per-series maximum drawdown.

Reference parity: the reference pivots long->wide for its heatmap
(app/dashboard.py pivot_table) — unpivot is the inverse contract; its
summary tables are single-level GROUP BYs — grouping sets produce the
multi-level report in one scan. TWAP/drawdown are the next indicator
asks beyond the dashboard's set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stockpulse_spark.functions.nullsafe import nan_nn, max_by_nn, min_by_nn

from stockpulse_spark.plans.registry import (
    _BARS_CTE,
    _hourly_bars,
    _r6,
    _register,
    _t,
)


@_register(
    "grouping_sets_revenue",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS gid,
           COUNT(*) AS n,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    -- HAVING: empty-table contract, see rollup_revenue
    HAVING COUNT(*) > 0
    ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    tags=("agg", "groupingsets"),
    doc="GROUPING SETS: detail, subtotal, and grand-total levels of "
    "the revenue report in ONE scan — Catalyst plans Expand feeding a "
    "single partial-agg shuffle exactly like CUBE (pinned for CUBE in "
    "test_plan_shapes), never three scans. grouping_id disambiguates "
    "real NULLs from subtotal rows; identical GROUPING() bit layout "
    "in both engines.",
)
def q_grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("__li_gsets")
    return spark.sql("""
        SELECT l_returnflag, l_linestatus,
               CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT)
                 AS gid,
               COUNT(*) AS n,
               ROUND(SUM(l_extendedprice * (1 - l_discount)) * 10000.0) / 10000.0
                 AS revenue
        FROM __li_gsets
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        HAVING COUNT(*) > 0
        ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """)


@_register(
    "unpivot_ohlc",
    oracle=_BARS_CTE
    + """
    , wide AS (SELECT user_id, bucket_start, open, high, low, close FROM bars)
    SELECT user_id, bucket_start, field, ROUND(px, 6) AS px FROM (
      SELECT user_id, bucket_start, 'open'  AS field, open  AS px FROM wide
      UNION ALL
      SELECT user_id, bucket_start, 'high'  AS field, high  AS px FROM wide
      UNION ALL
      SELECT user_id, bucket_start, 'low'   AS field, low   AS px FROM wide
      UNION ALL
      SELECT user_id, bucket_start, 'close' AS field, close AS px FROM wide
    )
    """,
    tags=("reshape",),
    doc="UNPIVOT (melt): OHLC wide->long via DataFrame.unpivot — the "
    "inverse of the reference's heatmap pivot (app/dashboard.py "
    "pivot_table). Spark plans Expand (4 output rows per input row in "
    "the SAME task, no shuffle, no union of four scans); the oracle "
    "states the semantics as UNION ALL.",
)
def q_unpivot_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = _hourly_bars(spark, sf_dir).select(
        "user_id", "bucket_start", "open", "high", "low", "close"
    )
    long = bars.unpivot(
        ids=["user_id", "bucket_start"],
        values=["open", "high", "low", "close"],
        variableColumnName="field",
        valueColumnName="px",
    )
    return long.select("user_id", "bucket_start", "field", _r6(F.col("px")).alias("px"))


@_register(
    "twap_daily",
    oracle="""
    WITH seg AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, value,
             CAST(epoch_us(lead(ts) OVER (PARTITION BY user_id,
                                          CAST(date_trunc('day', ts) AS TIMESTAMP)
                                          ORDER BY ts))
                  - epoch_us(ts) AS DOUBLE) AS dt_us
      FROM events
    )
    SELECT user_id, day,
           -- nullif: a day whose only segments are zero-length
           -- (duplicate-timestamp ticks) has an undefined TWAP
           ROUND(SUM(value * dt_us) / nullif(SUM(dt_us), 0), 6) AS twap,
           COUNT(dt_us) AS n_segments
    FROM seg WHERE dt_us IS NOT NULL
    GROUP BY user_id, day
    ORDER BY user_id, day
    """,
    tags=("window", "agg", "indicator"),
    doc="Time-weighted average price per user-day: each observation "
    "weighted by its holding interval (microseconds to the next "
    "event, via lead over the user-day partition; the day's last "
    "event opens no interval). The estimator for irregularly-spaced "
    "ticks where a plain mean over-weights bursts. Interval math in "
    "epoch MICROSECONDS (unix_micros/epoch_us) — the repo rule for "
    "sub-second-safe time arithmetic. One window exchange + one "
    "partial-agg shuffle on the same key.",
)
def q_twap_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts")
    w = Window.partitionBy("user_id", day).orderBy("ts")
    dt = (F.unix_micros(F.lead("ts").over(w)) - F.unix_micros(F.col("ts"))).cast(
        "double"
    )
    seg = ev.select(
        "user_id", day.alias("day"), "value", dt.alias("dt_us")
    ).filter(F.col("dt_us").isNotNull())
    return (
        seg.groupBy("user_id", "day")
        .agg(
            _r6(
                F.sum(F.col("value") * F.col("dt_us"))
                / F.nullif(F.sum("dt_us"), F.lit(0.0))
            ).alias("twap"),
            F.count("dt_us").alias("n_segments"),
        )
        .orderBy("user_id", "day")
    )


@_register(
    "max_drawdown",
    oracle="""
    WITH daily AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             last(value ORDER BY ts, value) FILTER (WHERE value IS NOT NULL AND isfinite(value)) AS close
      FROM events GROUP BY 1, 2
    ), dd AS (
      SELECT user_id, day,
             -- nullif: a zero running peak (flat-at-zero series) has
             -- no defined drawdown — NULL in both engines instead of
             -- Spark's ANSI raise / DuckDB's inf
             close / nullif(MAX(close) OVER (PARTITION BY user_id ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0)
               - 1.0 AS drawdown
      FROM daily
    ), ranked AS (
      SELECT user_id, day AS trough_day, drawdown,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY drawdown ASC, day ASC) AS rn
      FROM dd
    )
    SELECT user_id, trough_day, ROUND(drawdown, 6) AS max_drawdown
    FROM ranked WHERE rn = 1
    ORDER BY user_id
    """,
    tags=("window", "indicator"),
    doc="Maximum drawdown per series: running peak (cumulative window "
    "max) over the daily closes, drawdown = close/peak - 1, then the "
    "per-series minimum with a deterministic earliest-trough "
    "tie-break. The risk statistic every returns dashboard adds "
    "after volatility; both window passes share the per-user "
    "exchange, and the division compares identical doubles in both "
    "engines (same arg_max-selected close, same running max).",
)
def q_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).agg(max_by_nn(nan_nn("value"), "ts").alias("close"))
    wcum = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    dd = daily.select(
        "user_id",
        "day",
        (
            F.try_divide(
                F.col("close"),
                F.nullif(F.max("close").over(wcum), F.lit(0.0)),
            )
            - 1.0
        ).alias("drawdown"),
    )
    # asc_nulls_last: an all-NULL day has NULL drawdown; Spark's ASC
    # default (NULLS FIRST) would crown it the trough while DuckDB's
    # ROW_NUMBER default (NULLS LAST) never would
    wr = Window.partitionBy("user_id").orderBy(
        F.col("drawdown").asc_nulls_last(), F.col("day").asc()
    )
    return (
        dd.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("day").alias("trough_day"),
            _r6(F.col("drawdown")).alias("max_drawdown"),
        )
        .orderBy("user_id")
    )
