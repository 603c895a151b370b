"""Deeper analytic shapes: a TPC-H Q5-style five-table join tree,
CUBE aggregation, an ordered event funnel, and a weekly retention
cohort matrix — the product-analytics surface a warehouse user expects
on top of the operator inventory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stockpulse_spark.plans.registry import _r2, _register, _t


@_register(
    "local_supplier_revenue",
    oracle="""
    SELECT n_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           COUNT(*) AS n_lineitems
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
                 AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
    tags=("join", "tpch"),
    doc="TPC-H Q5 shape (local-supplier revenue): five joins — two "
    "fact-fact (lineitem-orders on orderkey, then the customer/"
    "supplier same-nation condition) and three broadcast dims "
    "(supplier, nation, region with the region filter pushed through "
    "the dim chain before any fact row moves). The canonical join-"
    "ordering stress test: Catalyst prunes region first so only one "
    "region's nations reach the fact join.",
)
def q_local_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    dims = F.broadcast(
        supp.join(
            F.broadcast(nation.join(region, nation.n_regionkey == region.r_regionkey)),
            supp.s_nationkey == F.col("n_nationkey"),
        ).select("s_suppkey", "s_nationkey", "n_name")
    )
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            dims,
            (li.l_suppkey == dims.s_suppkey)
            & (cust.c_nationkey == dims.s_nationkey),
        )
    )
    return (
        j.groupBy("n_name")
        .agg(
            _r2(F.sum(li.l_extendedprice * (1 - li.l_discount))).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@_register(
    "cube_order_stats",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total_value
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    -- HAVING: empty-table contract, see rollup_revenue
    HAVING COUNT(*) > 0
    """,
    tags=("agg", "cube"),
    doc="CUBE over (status, priority): all four grouping combinations "
    "(both, each alone, grand total) in ONE pass — Spark plans it as "
    "an Expand (4 output rows per input) feeding the same partial-agg "
    "shuffle, beating four separate scans at any scale. Complements "
    "rollup_revenue which covers the hierarchical case.",
)
def q_cube_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        _r2(F.sum("o_totalprice")).alias("total_value"),
    )


@_register(
    "event_funnel",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events GROUP BY user_id
    )
    SELECT
      COUNT(t_view) AS n_view,
      COUNT(CASE WHEN t_click > t_view THEN 1 END) AS n_click_after_view,
      COUNT(CASE WHEN t_purchase > t_click AND t_click > t_view THEN 1 END)
        AS n_purchase_after_click,
      -- NULLIF: an empty funnel stage is a NULL rate on BOTH engines
      -- (unguarded, Spark ANSI raises DIVIDE_BY_ZERO and DuckDB
      -- yields NaN — the empty-corpus sweep caught the crash)
      ROUND(COUNT(CASE WHEN t_click > t_view THEN 1 END)
            / CAST(NULLIF(COUNT(t_view), 0) AS DOUBLE), 6) AS view_to_click,
      ROUND(COUNT(CASE WHEN t_purchase > t_click AND t_click > t_view THEN 1 END)
            / CAST(NULLIF(COUNT(CASE WHEN t_click > t_view THEN 1 END), 0)
                   AS DOUBLE), 6)
        AS click_to_purchase
    FROM firsts
    """,
    tags=("agg", "funnel"),
    doc="ordered event funnel (view → click → purchase): first "
    "occurrence of each step per user via conditional MIN (one "
    "grouped pass over events, no self-joins — the naive formulation "
    "is a 3-way self-join), then strict time-ordering between steps "
    "and conversion rates. NULL comparisons drop users missing a "
    "step, exactly as both engines define three-valued logic; an "
    "empty stage yields NULL rates rather than a raise (Spark) or "
    "NaN (DuckDB).",
)
def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")

    def first_of(t: str):
        return F.min(F.when(F.col("event_type") == t, F.col("ts")))

    firsts = ev.groupBy("user_id").agg(
        first_of("view").alias("t_view"),
        first_of("click").alias("t_click"),
        first_of("purchase").alias("t_purchase"),
    )
    clicked = F.col("t_click") > F.col("t_view")
    purchased = (F.col("t_purchase") > F.col("t_click")) & clicked
    return firsts.agg(
        F.count("t_view").alias("n_view"),
        F.count(F.when(clicked, 1)).alias("n_click_after_view"),
        F.count(F.when(purchased, 1)).alias("n_purchase_after_click"),
        (
            F.round(
                F.count(F.when(clicked, 1))
                / F.nullif(F.count("t_view").cast("double"), F.lit(0.0))
                * 1e6
            )
            / 1e6
        ).alias("view_to_click"),
        (
            F.round(
                F.count(F.when(purchased, 1))
                / F.nullif(
                    F.count(F.when(clicked, 1)).cast("double"), F.lit(0.0)
                )
                * 1e6
            )
            / 1e6
        ).alias("click_to_purchase"),
    )


@_register(
    "weekly_retention",
    oracle="""
    WITH first_week AS (
      SELECT user_id, MIN(date_trunc('week', ts)) AS cohort_week
      FROM events GROUP BY user_id
    ), activity AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS active_week
      FROM events
    )
    SELECT CAST(f.cohort_week AS TIMESTAMP) AS cohort_week,
           CAST((epoch(a.active_week) - epoch(f.cohort_week)) / 604800 AS INTEGER)
             AS weeks_since,
           COUNT(*) AS n_users
    FROM first_week f JOIN activity a USING (user_id)
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    tags=("agg", "retention"),
    doc="weekly retention cohort matrix: cohort = first active week "
    "per user, then distinct (user, week) activity joined back and "
    "bucketed by weeks-since-cohort. Two grouped passes + one join on "
    "user_id; the cohort dim is user-count-sized and broadcastable. "
    "date_trunc('week') returns DATE in DuckDB vs TIMESTAMP in Spark "
    "— both sides cast (the known parity recipe).",
)
def q_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    week = F.date_trunc("week", F.col("ts"))
    first_week = ev.groupBy("user_id").agg(F.min(week).alias("cohort_week"))
    activity = ev.select("user_id", week.alias("active_week")).distinct()
    j = activity.join(F.broadcast(first_week), "user_id")
    weeks_since = (
        (F.unix_timestamp("active_week") - F.unix_timestamp("cohort_week")) / 604800
    ).cast("int")
    return (
        j.groupBy(
            F.col("cohort_week").cast("timestamp").alias("cohort_week"),
            weeks_since.alias("weeks_since"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_week", "weeks_since")
    )
