"""Distinct aggregation + sessionization — rounding out the agg/window
surface (neither is in the reference; both are table-stakes for an
events engine and free in Spark)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stockpulse_spark.plans.registry import _r6, _register, _t


@_register(
    "distinct_users_by_type",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS n_users,
           COUNT(*) AS n_events,
           ROUND(COUNT(*) / COUNT(DISTINCT user_id), 6) AS events_per_user
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("agg", "distinct"),
    doc="distinct aggregation: COUNT(DISTINCT) plans as a two-stage "
    "partial-distinct expand — exact here; approx_count_distinct is "
    "the drop-in at 100 TB when 2% error is acceptable (not oracle-"
    "checkable: HLL implementations differ across engines).",
)
def q_distinct_users_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
            _r6(F.count(F.lit(1)) / F.countDistinct("user_id")).alias(
                "events_per_user"
            ),
        )
        .orderBy("event_type")
    )


@_register(
    "sessionize_events",
    oracle="""
    WITH flagged AS (
      -- gap compared in exact microseconds on both sides: an interval
      -- or seconds-truncated comparison would disagree on sub-second
      -- boundary gaps
      SELECT user_id, ts, value,
             CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts))
                       > 1800000000
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), sessions AS (
      SELECT user_id, ts, value,
             CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS session_id
      FROM flagged
    )
    SELECT user_id, session_id,
           MIN(ts) AS session_start,
           MAX(ts) AS session_end,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 6) AS total_value
    FROM sessions
    GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
    tags=("window", "session"),
    doc="gap-based sessionization (30-min inactivity closes a "
    "session): lag→new-session flag→running sum as the session id, "
    "then one grouped agg. The declarative twin of Spark's "
    "session_window / Structured Streaming session windows, written "
    "so DuckDB can oracle it exactly. One window shuffle + one agg "
    "shuffle on the same key → AQE reuses the partitioning.",
)
def q_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    prev = F.lag("ts").over(w)
    new_session = F.when(
        prev.isNull()
        | ((F.unix_micros(F.col("ts")) - F.unix_micros(prev)) > 1_800_000_000),
        1,
    ).otherwise(0)
    flagged = ev.select("user_id", "ts", "value", new_session.alias("new_session"))
    sessions = flagged.withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        sessions.groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            _r6(F.sum("value")).alias("total_value"),
        )
        .orderBy("user_id", "session_id")
    )
