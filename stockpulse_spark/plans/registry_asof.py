"""As-of and range joins — the tick-data join extensions (SURVEY §2.5
notes the reference implements neither; they're the natural next
operators for a market-data engine, and DuckDB's native ASOF JOIN
provides an exact oracle)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stockpulse_spark.functions.nullsafe import max_by_nn, min_by_nn

from stockpulse_spark.operators.asof import asof_join
from stockpulse_spark.plans.registry import _r6, _register, _t


@_register(
    "asof_prev_close",
    oracle="""
    WITH eod AS (
      SELECT user_id, CAST(ts AS DATE) AS d, last(value ORDER BY ts, value) FILTER (WHERE value IS NOT NULL) AS prev_close,
             CAST(CAST(ts AS DATE) AS TIMESTAMP) + INTERVAL 1 DAY AS avail_ts
      FROM events GROUP BY user_id, CAST(ts AS DATE)
    )
    SELECT e.event_id, e.user_id, e.ts, e.value,
           ROUND(d.prev_close, 6) AS prev_close
    FROM events e
    ASOF LEFT JOIN eod d ON e.user_id = d.user_id AND e.ts >= d.avail_ts
    """,
    headline=True,
    tags=("join", "asof"),
    doc="point-in-time join: every event gets the most recent PRIOR "
    "day's closing value for its series (EOD closes become available "
    "at next midnight). Spark side: union-and-fill as-of join "
    "(operators/asof.py) — one shuffle of |L|+|R|, no range cross "
    "product; oracle: DuckDB's native ASOF JOIN.",
)
def q_asof_prev_close(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    eod = (
        ev.groupBy("user_id", F.to_date("ts").alias("d"))
        .agg(max_by_nn("value", "ts").alias("prev_close"))
        .select(
            "user_id",
            "prev_close",
            (F.to_timestamp("d") + F.expr("INTERVAL 1 DAY")).alias("avail_ts"),
        )
    )
    joined = asof_join(
        ev.select("event_id", "user_id", "ts", "value"),
        eod,
        on=["user_id"],
        left_ts="ts",
        right_ts="avail_ts",
        payload_cols=["prev_close"],
    )
    return joined.select(
        "event_id", "user_id", "ts", "value", _r6(F.col("prev_close")).alias("prev_close")
    )


@_register(
    "range_join_hour_stats",
    oracle="""
    WITH stats AS (
      SELECT user_id, date_trunc('hour', ts) AS h,
             max(value) AS hour_high, min(value) AS hour_low, count(*) AS hour_n
      FROM events GROUP BY user_id, date_trunc('hour', ts)
    )
    SELECT e.event_id, e.user_id, e.ts, e.value,
           ROUND(s.hour_high, 6) AS hour_high,
           ROUND(s.hour_low, 6)  AS hour_low,
           s.hour_n
    FROM events e
    JOIN stats s ON e.user_id = s.user_id AND date_trunc('hour', e.ts) = s.h
    """,
    tags=("join", "range"),
    doc="interval/range join done the scale-smart way: 'event within "
    "[bucket_start, bucket_end)' is rewritten as an EQUI-join on the "
    "truncated bucket key — a hash shuffle on dense keys instead of a "
    "non-equi range join's per-key cross product. The general recipe "
    "for fixed-width ranges; variable ranges bucket to a grid first.",
)
def q_range_join_hour_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    stats = ev.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(
        F.max("value").alias("hour_high"),
        F.min("value").alias("hour_low"),
        F.count(F.lit(1)).alias("hour_n"),
    )
    joined = ev.withColumn("h", F.date_trunc("hour", F.col("ts"))).join(
        stats, on=["user_id", "h"]
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        _r6(F.col("hour_high")).alias("hour_high"),
        _r6(F.col("hour_low")).alias("hour_low"),
        "hour_n",
    )
