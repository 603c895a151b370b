"""Remaining SURVEY §2 surface: the EXISTS/anti-join insert gate (A2),
live metrics (A9), weekly resample (A10 @1W), global sort/top-k
(O1-O5), and a ROLLUP extension the engine gets from Spark for free."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stockpulse_spark.functions.nullsafe import nan_nn, max_by_nn, min_by_nn

from stockpulse_spark.operators.dedup import new_keys_only
from stockpulse_spark.plans.registry import _r4, _r6, _register, _t


@_register(
    "new_keys_anti_join",
    oracle="""
    WITH existing AS (
      SELECT DISTINCT user_id, ts FROM events WHERE ts < TIMESTAMP '2024-01-25'
    )
    SELECT e.event_id, e.ts, e.user_id, e.value
    FROM events e
    ANTI JOIN existing x ON e.user_id = x.user_id AND e.ts = x.ts
    """,
    tags=("join", "dedup"),
    doc="reference A2/J3 (bigquery_loader.py:118-140): the per-record "
    "EXISTS insert gate as ONE left-anti join of the batch against the "
    "sink's keys — replaces one synchronous RPC per message.",
)
def q_new_keys_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    existing = ev.filter(F.col("ts") < F.lit("2024-01-25").cast("timestamp"))
    return new_keys_only(ev, existing, keys=["user_id", "ts"]).select(
        "event_id", "ts", "user_id", "value"
    )


@_register(
    "live_metrics",
    oracle="""
    SELECT user_id,
           MAX(ts)                       AS latest_ts,
           ROUND(last(value ORDER BY ts, value) FILTER (WHERE value IS NOT NULL AND isfinite(value)), 6)  AS latest_value,
           ROUND(AVG(value), 6)          AS mean_value,
           ROUND(100.0 * (last(value ORDER BY ts, value) FILTER (WHERE value IS NOT NULL AND isfinite(value)) - AVG(value)) / AVG(value), 6) AS pct_vs_mean,
           COUNT(*)                      AS n_events
    FROM events
    GROUP BY user_id
    """,
    tags=("agg",),
    doc="reference A9 (dashboard.py:644-667): last price, %Δ vs mean, "
    "activity count — one partial-aggregated shuffle, no window.",
)
def q_live_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    last_v = max_by_nn(nan_nn("value"), "ts")
    return ev.groupBy("user_id").agg(
        F.max("ts").alias("latest_ts"),
        _r6(last_v).alias("latest_value"),
        _r6(F.avg("value")).alias("mean_value"),
        _r6(F.try_divide(100.0 * (last_v - F.avg("value")), F.avg("value"))).alias(
            "pct_vs_mean"
        ),
        F.count(F.lit(1)).alias("n_events"),
    )


@_register(
    "ohlcv_weekly",
    oracle="""
    SELECT user_id,
           CAST(date_trunc('week', ts) AS DATE) AS week_start,
           ROUND(first(value ORDER BY ts, value) FILTER (WHERE value IS NOT NULL AND isfinite(value)), 6)  AS open,
           ROUND(max(value), 6)          AS high,
           ROUND(min(value), 6)          AS low,
           ROUND(last(value ORDER BY ts, value) FILTER (WHERE value IS NOT NULL AND isfinite(value)), 6)  AS close,
           count(*)                      AS volume
    FROM events
    GROUP BY user_id, CAST(date_trunc('week', ts) AS DATE)
    """,
    tags=("agg", "resample"),
    doc="reference A10 at 1W (docs/preprocessing.md:19-33) — Monday-"
    "anchored tumbling week, same deterministic first/last shape.",
)
def q_ohlcv_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(
        "user_id", F.to_date(F.date_trunc("week", F.col("ts"))).alias("week_start")
    ).agg(
        _r6(min_by_nn(nan_nn("value"), "ts")).alias("open"),
        _r6(F.max("value")).alias("high"),
        _r6(F.min("value")).alias("low"),
        _r6(max_by_nn(nan_nn("value"), "ts")).alias("close"),
        F.count(F.lit(1)).alias("volume"),
    )


@_register(
    "global_sort_topk",
    oracle="""
    SELECT event_id, user_id, ts, value
    FROM events
    ORDER BY value DESC, event_id
    LIMIT 100
    """,
    tags=("sort", "limit"),
    doc="reference O1-O5 global sort + positional selection as a "
    "deterministic top-k: Spark plans TakeOrderedAndProject (per-"
    "partition heaps, no full sort) — the shape that matters at scale.",
)
def q_global_sort_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.select("event_id", "user_id", "ts", "value")
        .orderBy(F.col("value").desc(), "event_id")
        .limit(100)
    )


@_register(
    "rollup_revenue",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    -- only populated groups are reported: on EMPTY input ANSI/DuckDB
    -- emits the () grand-total row while Spark's rollup emits none —
    -- the HAVING (a no-op on any non-empty input, every real group
    -- has >=1 row) pins the shared empty-table contract
    HAVING COUNT(*) > 0
    """,
    tags=("agg", "rollup"),
    doc="hierarchical subtotals via ROLLUP — not in the reference "
    "(SURVEY §2.3 notes the absence); the engine inherits it from "
    "Spark's grouping-sets support at zero extra cost.",
)
def q_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    return l.rollup("l_returnflag", "l_linestatus").agg(
        _r4(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    )
