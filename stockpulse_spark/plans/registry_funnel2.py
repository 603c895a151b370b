"""Funnel latency, backlog scan-line, and market-basket pairs.

Reference parity: the reference's dashboard answers "how many users
converted" (event funnel); these add the harder operational follow-ups
— how LONG conversion takes (cohorted latency percentiles), how much
work is in flight at any date (the interval-counting scan-line, which
naively is a point-in-interval range join), and which items co-occur
(the self-join-within-group market-basket shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stockpulse_spark.plans.registry import _r6, _register, _t


@_register(
    "funnel_conversion_latency",
    oracle="""
    WITH s AS (
      SELECT user_id, MIN(ts) AS signup_ts FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ), p AS (
      SELECT user_id, MIN(ts) AS purchase_ts FROM events
      WHERE event_type = 'purchase' GROUP BY user_id
    ), conv AS (
      SELECT CAST(date_trunc('week', s.signup_ts) AS TIMESTAMP)
               AS cohort_week,
             (epoch_us(p.purchase_ts) - epoch_us(s.signup_ts))
               / 3600000000.0 AS latency_h
      FROM s JOIN p USING (user_id)
      WHERE p.purchase_ts >= s.signup_ts
    )
    SELECT cohort_week,
           COUNT(*) AS n_converted,
           ROUND(quantile_cont(latency_h, 0.5), 6) AS p50_latency_h,
           ROUND(quantile_cont(latency_h, 0.9), 6) AS p90_latency_h
    FROM conv GROUP BY cohort_week ORDER BY cohort_week
    """,
    tags=("analytics", "funnel", "percentile"),
    doc="Cohorted conversion latency: first signup -> first purchase "
    "per user, exact-microsecond latency in hours (epoch diffs then "
    "ONE division — never seconds-casts), p50/p90 per signup week. "
    "Two conditional-MIN partial aggs shrink events to one row per "
    "user per step BEFORE the user-keyed join, so the join input is "
    "users-sized, not events-sized — the funnel family's latency "
    "member (event_funnel asks who converted; this asks how fast).",
)
def q_funnel_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("purchase_ts"))
    )
    conv = (
        s.join(p, "user_id")
        .filter(F.col("purchase_ts") >= F.col("signup_ts"))
        .select(
            F.date_trunc("week", "signup_ts").alias("cohort_week"),
            (
                (
                    F.unix_micros("purchase_ts")
                    - F.unix_micros("signup_ts")
                )
                / 3600000000.0
            ).alias("latency_h"),
        )
    )
    return (
        conv.groupBy("cohort_week")
        .agg(
            F.count(F.lit(1)).alias("n_converted"),
            _r6(F.expr("percentile(latency_h, 0.5)")).alias(
                "p50_latency_h"
            ),
            _r6(F.expr("percentile(latency_h, 0.9)")).alias(
                "p90_latency_h"
            ),
        )
        .orderBy("cohort_week")
    )


@_register(
    "order_backlog_daily",
    oracle="""
    WITH ship AS (
      SELECT l_orderkey AS okey, MAX(l_shipdate) AS done_ts
      FROM lineitem GROUP BY l_orderkey
    ), deltas AS (
      -- date-less orders can't enter the scan-line (and a NULL day
      -- would land at opposite ends of the cumsum ORDER BY: Spark
      -- NULLS FIRST vs DuckDB NULLS LAST); an all-NULL-shipdate
      -- order simply never closes
      SELECT CAST(date_trunc('day', o.o_orderdate) AS TIMESTAMP) AS day,
             1 AS delta
      FROM orders o WHERE o.o_orderdate IS NOT NULL
      UNION ALL
      SELECT CAST(date_trunc('day', s.done_ts) AS TIMESTAMP) AS day,
             -1 AS delta
      FROM ship s JOIN orders o ON o.o_orderkey = s.okey
      WHERE s.done_ts IS NOT NULL
    ), daily AS (
      SELECT day, CAST(SUM(delta) AS BIGINT) AS net FROM deltas GROUP BY day
    )
    SELECT day, net,
           CAST(SUM(net) OVER (ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS backlog
    FROM daily ORDER BY day
    """,
    tags=("analytics", "window"),
    doc="Open-order backlog over time as a scan-line: +1 at order "
    "date, -1 at the order's last ship date, daily net, integer "
    "cumulative sum. The naive form is a point-in-interval range "
    "join (every day x every open order); the scan-line form is two "
    "partial-agg shuffles to a DAYS-sized table and one metadata "
    "window — the interval-counting rewrite that survives any scale. "
    "Integer deltas make the cumsum exact in both engines.",
)
def q_order_backlog_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    ship = li.groupBy(F.col("l_orderkey").alias("okey")).agg(
        F.max("l_shipdate").alias("done_ts")
    )
    opened = o.filter(F.col("o_orderdate").isNotNull()).select(
        F.date_trunc("day", "o_orderdate").alias("day"),
        F.lit(1).alias("delta"),
    )
    closed = (
        ship.filter(F.col("done_ts").isNotNull())
        .join(o, ship.okey == o.o_orderkey)
        .select(
            F.date_trunc("day", "done_ts").alias("day"),
            F.lit(-1).alias("delta"),
        )
    )
    daily = (
        opened.unionAll(closed)
        .groupBy("day")
        .agg(F.sum("delta").alias("net"))
    )
    w = (
        Window.partitionBy()
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return daily.select(
        "day", "net", F.sum("net").over(w).alias("backlog")
    ).orderBy("day")


@_register(
    "copurchase_pairs",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), pairs AS (
      SELECT a.l_partkey AS part_1, b.l_partkey AS part_2
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey
       AND a.l_partkey < b.l_partkey
    )
    SELECT part_1, part_2, COUNT(*) AS n_orders
    FROM pairs GROUP BY part_1, part_2
    HAVING COUNT(*) >= 2
    ORDER BY n_orders DESC, part_1, part_2
    LIMIT 20
    """,
    tags=("analytics", "join"),
    doc="Market-basket co-occurrence: part pairs appearing in the "
    "same order at least twice, top 20 with full tie-break. The "
    "self-join is WITHIN the order key (equi-join on l_orderkey + "
    "triangular inequality), so fanout is bounded by per-order "
    "basket size squared — never a global cross join; the DISTINCT "
    "pre-shrink drops duplicate part lines before pairing. At 100 TB "
    "add a per-order basket cap (baskets beyond ~1k items are "
    "boilerplate carts) exactly like the LSH bucket cap.",
)
def q_copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a = items.select(
        F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("part_1")
    )
    b = items.select(
        F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("part_2")
    )
    pairs = a.join(b, "okey").filter(F.col("part_1") < F.col("part_2"))
    return (
        pairs.groupBy("part_1", "part_2")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= 2)
        .orderBy(F.col("n_orders").desc(), "part_1", "part_2")
        .limit(20)
    )
