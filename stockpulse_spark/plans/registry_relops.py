"""Relational-surface fill-outs: rank-family window functions
(ntile / percent_rank / cume_dist), set operations
(INTERSECT / EXCEPT), and a FULL OUTER reconciliation join — the
remaining ANSI surface a reference user would expect to carry over.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stockpulse_spark.functions.nullsafe import nan_nn
from stockpulse_spark.operators.rank import (
    ntile_from_rank,
    with_grouped_global_rank,
)
from stockpulse_spark.plans.registry import _r6, _register, _t


@_register(
    "value_rank_family",
    oracle="""
    SELECT event_id, event_type,
           CAST(ntile(4) OVER w AS INTEGER) AS quartile,
           ROUND(percent_rank() OVER w, 6) AS pct_rank,
           ROUND(cume_dist() OVER w, 6) AS cume,
           CAST(rank() OVER w AS BIGINT) AS rnk,
           CAST(dense_rank() OVER w AS BIGINT) AS drnk
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
    """,
    tags=("window", "rank"),
    doc="the rank-family window surface in one query: ntile(4) "
    "quartile assignment, percent_rank, cume_dist, rank, dense_rank "
    "per event_type ordered by (value, event_id) — the tiebreak makes "
    "every function deterministic so both engines agree bit-for-bit. "
    "The whole family is DERIVED from the grouped distributed row "
    "number (operators/rank.py::with_grouped_global_rank — a plain "
    "PARTITION BY event_type window caps parallelism at |types|): "
    "rank = min row_number over the (type, value, id) tie group, "
    "cume_dist = (rank + ties - 1)/N, percent_rank = (rank-1)/(N-1) "
    "(0 for a 1-row group, the SQL definition), dense_rank = the "
    "grouped row number of the DISTINCT tie-key table, ntile = the "
    "closed-form arithmetic. The tie join is a co-partitioned "
    "shuffle join on the near-unique tie key, never a broadcast of "
    "anything event-sized.",
)
def q_value_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("event_id", "event_type", "value")
    # asc_nulls_last everywhere: Spark ASC is NULLS FIRST, DuckDB
    # ORDER BY default is NULLS LAST — NULL values must rank last on
    # both engines (with_grouped_global_rank pins this)
    # pin once per invocation: the tie-group pass and the final join's
    # left side both read the ranked frame — unpinned, the global-rank
    # decomposition executed twice (optimization r11)
    rn = with_grouped_global_rank(
        ev, ["event_type"], "value", "event_id", rank_col="__rn"
    ).localCheckpoint(eager=False)
    # tie groups: duplicate (type, value, id) rows (fuzz plants full-
    # row duplicates) share rank/cume; min/count over the tie key
    ties = rn.groupBy("event_type", "value", "event_id").agg(
        F.min("__rn").alias("__minrn"), F.count(F.lit(1)).alias("__tn")
    )
    # dense_rank = row number of the DISTINCT tie key within its group
    dties = with_grouped_global_rank(
        ties, ["event_type"], "value", "event_id", rank_col="__dr"
    )
    totals = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("__n"))
    cond = (
        F.col("l.event_type").eqNullSafe(F.col("r.event_type"))
        & F.col("l.value").eqNullSafe(F.col("r.value"))
        & F.col("l.event_id").eqNullSafe(F.col("r.event_id"))
    )
    joined = (
        rn.alias("l")
        .join(dties.alias("r"), cond)
        .select(
            F.col("l.event_id").alias("event_id"),
            F.col("l.event_type").alias("event_type"),
            "__rn",
            "__minrn",
            "__tn",
            "__dr",
        )
        .join(
            F.broadcast(totals).withColumnRenamed("event_type", "__t"),
            F.col("event_type").eqNullSafe(F.col("__t")),
        )
    )
    n = F.col("__n")
    pct = F.when(n == 1, F.lit(0.0)).otherwise(
        (F.col("__minrn") - 1) / (n - 1)
    )
    return joined.select(
        "event_id",
        "event_type",
        ntile_from_rank(F.col("__rn"), n, 4).alias("quartile"),
        _r6(pct).alias("pct_rank"),
        _r6((F.col("__minrn") + F.col("__tn") - 1) / n).alias("cume"),
        F.col("__minrn").cast("long").alias("rnk"),
        F.col("__dr").cast("long").alias("drnk"),
    )


@_register(
    "user_cohort_set_ops",
    oracle="""
    WITH w1 AS (
      SELECT DISTINCT user_id FROM events WHERE ts < TIMESTAMP '2024-01-08'
    ), w2 AS (
      SELECT DISTINCT user_id FROM events WHERE ts >= TIMESTAMP '2024-01-24'
    )
    SELECT user_id, 'retained' AS cohort FROM (SELECT * FROM w1 INTERSECT SELECT * FROM w2)
    UNION ALL
    SELECT user_id, 'churned' AS cohort FROM (SELECT * FROM w1 EXCEPT SELECT * FROM w2)
    UNION ALL
    SELECT user_id, 'new' AS cohort FROM (SELECT * FROM w2 EXCEPT SELECT * FROM w1)
    """,
    tags=("setops",),
    doc="set-operation surface: INTERSECT / EXCEPT cohorting of users "
    "between the first and last activity week (retained / churned / "
    "new). Spark plans these as left-semi / left-anti joins over the "
    "distinct key sets — same hash-join machinery as the key-match "
    "gates, no sort.",
)
def q_user_cohort_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w1 = ev.filter(F.col("ts") < "2024-01-08").select("user_id").distinct()
    w2 = ev.filter(F.col("ts") >= "2024-01-24").select("user_id").distinct()
    return (
        w1.intersect(w2).select("user_id", F.lit("retained").alias("cohort"))
        .unionAll(w1.exceptAll(w2).distinct().select("user_id", F.lit("churned").alias("cohort")))
        .unionAll(w2.exceptAll(w1).distinct().select("user_id", F.lit("new").alias("cohort")))
    )


@_register(
    "daily_order_ship_reconciliation",
    oracle="""
    WITH o AS (
      SELECT o_orderdate AS d, COUNT(*) AS n_orders,
             ROUND(SUM(CASE WHEN NOT isfinite(o_totalprice) THEN NULL
                       ELSE o_totalprice END), 2) AS order_value
      FROM orders GROUP BY o_orderdate
    ), s AS (
      SELECT l_shipdate AS d, COUNT(*) AS n_shipments
      FROM lineitem GROUP BY l_shipdate
    )
    SELECT COALESCE(o.d, s.d) AS date,
           o.n_orders, o.order_value, s.n_shipments,
           o.d IS NOT NULL AND s.d IS NOT NULL AS both_sides
    FROM o FULL OUTER JOIN s ON o.d = s.d
    """,
    tags=("join", "outer"),
    doc="FULL OUTER reconciliation: daily order counts/value vs daily "
    "shipment counts, null-preserving on both unmatched sides with a "
    "both_sides audit flag — the dataset-diff shape every warehouse "
    "migration runs. Both inputs pre-aggregate (partial agg map-side) "
    "before a sort-merge full join on the date key.",
)
def q_daily_order_ship_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")
    o = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        (F.round(F.sum(nan_nn("o_totalprice")) * 100) / 100).alias("order_value"),
    )
    s = lineitem.groupBy(F.col("l_shipdate").alias("d")).agg(
        F.count(F.lit(1)).alias("n_shipments")
    )
    oo, ss = o.alias("o"), s.alias("s")
    return oo.join(ss, F.col("o.d") == F.col("s.d"), "full").select(
        F.coalesce(F.col("o.d"), F.col("s.d")).alias("date"),
        "n_orders",
        "order_value",
        "n_shipments",
        (F.col("o.d").isNotNull() & F.col("s.d").isNotNull()).alias("both_sides"),
    )


@_register(
    "rolling_1h_time_window",
    oracle="""
    SELECT user_id, ts,
           COUNT(*) OVER w AS n_events_1h,
           ROUND(SUM(value) OVER w, 6) AS sum_value_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
    tags=("window", "range-frame"),
    doc="TIME-based rolling window (trailing 1 hour per user) via a "
    "RANGE frame over epoch microseconds — the window class row-based "
    "frames can't express when events are irregularly spaced: each "
    "row's frame holds however many events fell in its trailing hour. "
    "Same single hash-exchange + sort as a rows frame; the frame "
    "bound comparison is integer microseconds so both engines agree "
    "exactly (sub-second recipe). COUNT is exact; SUM is a running "
    "segment aggregate in both engines over identical operand sets, "
    "rounded at 6dp.",
)
def q_rolling_1h_time_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "user_id",
        "ts",
        F.count(F.lit(1)).over(w).alias("n_events_1h"),
        _r6(F.sum("value").over(w)).alias("sum_value_1h"),
    )


@_register(
    "props_json_stats",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           MIN(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k,
           MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k,
           ROUND(AVG(CAST(json_extract_string(props, '$.k') AS INTEGER)), 6) AS avg_k,
           COUNT(DISTINCT CAST(json_extract_string(props, '$.k') AS INTEGER))
             AS n_distinct_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("json", "agg"),
    doc="semi-structured column surface: extract a typed field from "
    "the JSON `props` payload (get_json_object / $.k path) and "
    "aggregate it per event type — the schema-on-read shape every "
    "event pipeline needs before promoting a property to a real "
    "column. JSON parsing stays inside codegen; at scale promote hot "
    "paths to from_json with an explicit schema so the parse happens "
    "once per row, not once per extraction.",
)
def q_props_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            _r6(F.avg("k")).alias("avg_k"),
            F.countDistinct("k").alias("n_distinct_k"),
        )
        .orderBy("event_type")
    )


@_register(
    "window_offsets",
    oracle="""
    SELECT user_id, ts,
           ROUND(value, 6) AS value,
           ROUND(lag(value, 1) OVER w, 6) AS prev_value,
           ROUND(lead(value, 1) OVER w, 6) AS next_value,
           ROUND(first_value(value) OVER wf, 6) AS first_val,
           ROUND(last_value(value) OVER wf, 6) AS last_val,
           ROUND(nth_value(value, 3) OVER wf, 6) AS third_val
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts),
           wf AS (PARTITION BY user_id ORDER BY ts
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    tags=("window", "offset"),
    doc="offset/navigation window surface: lag, lead, first_value, "
    "last_value, nth_value per user series with an explicit full-"
    "partition frame (the default RANGE frame would make last_value "
    "mean 'current row' — a classic correctness trap both engines "
    "share). One exchange + one sort serves all six columns.",
)
def q_window_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return ev.select(
        "user_id",
        "ts",
        _r6(F.col("value")).alias("value"),
        _r6(F.lag("value", 1).over(w)).alias("prev_value"),
        _r6(F.lead("value", 1).over(w)).alias("next_value"),
        _r6(F.first("value").over(wf)).alias("first_val"),
        _r6(F.last("value").over(wf)).alias("last_val"),
        _r6(F.nth_value("value", 3).over(wf)).alias("third_val"),
    )


@_register(
    "salted_event_type_stats",
    oracle="""
    SELECT event_type,
           COUNT(value) AS n_values,
           ROUND(MAX(value), 6) AS max_value,
           ROUND(MIN(value), 6) AS min_value,
           ROUND(SUM(value), 6) AS total_value
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("agg", "skew"),
    doc="the two-stage SALTED aggregation under the oracle gate: "
    "event_type has only 5 values, the textbook low-cardinality "
    "skewed-reducer shape, so operators/skew.py:salted_agg scatters "
    "each group over 16 sub-keys, partially aggregates, and merges — "
    "and must produce byte-identical results to the plain GROUP BY "
    "the oracle runs. Proves the skew mitigation is semantics-"
    "preserving, not just property-tested: count/min/max are exact "
    "under any regrouping and the float sum survives 6dp rounding.",
)
def q_salted_event_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stockpulse_spark.operators.skew import salted_agg

    ev = _t(spark, sf_dir, "events")
    out = salted_agg(
        ev,
        keys=["event_type"],
        aggs={
            "n_values": ("count", "value"),
            "max_value": ("max", "value"),
            "min_value": ("min", "value"),
            "total_value": ("sum", "value"),
        },
    )
    return out.select(
        "event_type",
        "n_values",
        _r6(F.col("max_value")).alias("max_value"),
        _r6(F.col("min_value")).alias("min_value"),
        _r6(F.col("total_value")).alias("total_value"),
    ).orderBy("event_type")
