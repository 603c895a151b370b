"""Change-data-capture snapshot diff and time-weighted linear
interpolation — the warehouse maintenance pair: detect what changed
between two table versions, and repair gaps a feed left behind.

`snapshot_diff_cdc` derives two deterministic snapshot versions from
the orders table (same derivation on both engines: a later cutoff
inserts rows, orderkey % 7 rows get a price revision, orderkey % 11
rows are deleted) and computes the insert/update/delete changefeed via
one FULL OUTER join on the key — the diff a CDC publisher emits when a
table has no native changelog.

`interpolate_linear_gaps` repairs synthesized missing points (every
5th event) with time-weighted linear interpolation between the
surrounding observations — the step up from ffill/bounded-ffill
(operators/quality.py) when the series is numeric and gaps must not
flatten."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stockpulse_spark.functions.nullsafe import nan_nn
from stockpulse_spark.plans.registry import _r4, _r6, _register, _t


@_register(
    "snapshot_diff_cdc",
    oracle="""
    WITH snap_a AS (
      SELECT o_orderkey,
             CAST(ROUND((CASE WHEN NOT isfinite(o_totalprice) THEN NULL ELSE o_totalprice END) * 100) AS BIGINT) AS cents
      FROM orders WHERE o_orderdate < TIMESTAMP '2000-01-01'
    ), snap_b AS (
      SELECT o_orderkey,
             cents + CASE WHEN o_orderkey % 7 = 0
                          THEN cents // 20 ELSE 0 END AS cents
      FROM (
        SELECT o_orderkey,
               CAST(ROUND((CASE WHEN NOT isfinite(o_totalprice) THEN NULL ELSE o_totalprice END) * 100) AS BIGINT) AS cents
        FROM orders
        WHERE o_orderdate < TIMESTAMP '2001-01-01'
          AND o_orderkey % 11 != 0
      )
    ), diff AS (
      SELECT CASE WHEN a.o_orderkey IS NULL THEN 'insert'
                  WHEN b.o_orderkey IS NULL THEN 'delete'
                  WHEN a.cents != b.cents THEN 'update'
                  ELSE 'unchanged' END AS change_type,
             COALESCE(b.cents, 0) - COALESCE(a.cents, 0) AS delta_cents
      FROM snap_a a FULL OUTER JOIN snap_b b
        ON a.o_orderkey = b.o_orderkey
    )
    SELECT change_type, COUNT(*) AS n_rows,
           ROUND(SUM(delta_cents) / 100.0, 4) AS total_delta
    FROM diff GROUP BY change_type ORDER BY change_type
    """,
    tags=("join", "warehouse", "cdc"),
    doc="snapshot-diff changefeed: FULL OUTER join of two table "
    "versions on the primary key classifies every row as insert / "
    "update / delete / unchanged and totals the price delta "
    "(prices snap to integer cents BEFORE the revision, and the 5% "
    "markup is integer division — no float rounding can diverge "
    "between engines). At scale both snapshots shuffle once "
    "on the key — or zero times if the table is bucketed by it "
    "(sinks.py's bucketed layout); this is the publisher side of the "
    "orders_merge_upsert consumer already registered.",
)
def q_snapshot_diff_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    cents = F.round(nan_nn("o_totalprice") * 100).cast("bigint")
    snap_a = o.filter(
        F.col("o_orderdate") < F.lit("2000-01-01").cast("timestamp")
    ).select("o_orderkey", cents.alias("cents"))
    snap_b = (
        o.filter(
            (F.col("o_orderdate") < F.lit("2001-01-01").cast("timestamp"))
            & (F.col("o_orderkey") % 11 != 0)
        )
        .select("o_orderkey", cents.alias("cents"))
        .select(
            "o_orderkey",
            (
                F.col("cents")
                + F.when(
                    F.col("o_orderkey") % 7 == 0,
                    F.expr("cents div 20"),
                ).otherwise(F.lit(0))
            ).alias("cents"),
        )
    )
    a = snap_a.alias("a")
    b = snap_b.alias("b")
    joined = a.join(
        b, F.col("a.o_orderkey") == F.col("b.o_orderkey"), "full_outer"
    )
    change = (
        F.when(F.col("a.o_orderkey").isNull(), "insert")
        .when(F.col("b.o_orderkey").isNull(), "delete")
        .when(F.col("a.cents") != F.col("b.cents"), "update")
        .otherwise("unchanged")
    )
    delta = F.coalesce(F.col("b.cents"), F.lit(0)) - F.coalesce(
        F.col("a.cents"), F.lit(0)
    )
    return (
        joined.select(change.alias("change_type"), delta.alias("delta_cents"))
        .groupBy("change_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            _r4(F.sum("delta_cents") / 100.0).alias("total_delta"),
        )
        .orderBy("change_type")
    )


@_register(
    "interpolate_linear_gaps",
    oracle="""
    WITH masked AS (
      SELECT user_id, ts, event_id,
             CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS v
      FROM events
    ), bounded AS (
      SELECT user_id, ts, event_id, v,
             last_value(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
             last_value(CASE WHEN v IS NOT NULL THEN ts END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pts,
             first_value(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv,
             first_value(CASE WHEN v IS NOT NULL THEN ts END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nts
      FROM masked
    )
    SELECT user_id, ts, event_id,
           ROUND(pv + (nv - pv)
                 * (CAST(epoch_us(ts) - epoch_us(pts) AS DOUBLE)
                    / (epoch_us(nts) - epoch_us(pts))), 6) AS v_interp
    FROM bounded
    WHERE v IS NULL AND pv IS NOT NULL AND nv IS NOT NULL
    """,
    tags=("window", "quality"),
    doc="time-weighted linear interpolation of missing points (every "
    "5th event masked on both engines): previous/next observed value "
    "and timestamp via IGNORE NULLS window frames, interpolation "
    "factor from exact epoch-microsecond arithmetic. The numeric "
    "upgrade of ffill/bounded-ffill for gaps that must not flatten; "
    "all four windows share the one per-series sort.",
)
def q_interpolate_linear_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    masked = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_id") % 5 == 0, None)
        .otherwise(F.col("value"))
        .alias("v"),
    )
    w = Window.partitionBy("user_id").orderBy("ts")
    prev_f = w.rowsBetween(Window.unboundedPreceding, -1)
    next_f = w.rowsBetween(1, Window.unboundedFollowing)
    obs_ts = F.when(F.col("v").isNotNull(), F.col("ts"))
    bounded = masked.select(
        "user_id",
        "ts",
        "event_id",
        "v",
        F.last("v", ignorenulls=True).over(prev_f).alias("pv"),
        F.last(obs_ts, ignorenulls=True).over(prev_f).alias("pts"),
        F.first("v", ignorenulls=True).over(next_f).alias("nv"),
        F.first(obs_ts, ignorenulls=True).over(next_f).alias("nts"),
    )
    frac = (
        F.unix_micros("ts") - F.unix_micros("pts")
    ).cast("double") / (F.unix_micros("nts") - F.unix_micros("pts"))
    return (
        bounded.filter(
            F.col("v").isNull()
            & F.col("pv").isNotNull()
            & F.col("nv").isNotNull()
        )
        .select(
            "user_id",
            "ts",
            "event_id",
            _r6(F.col("pv") + (F.col("nv") - F.col("pv")) * frac).alias(
                "v_interp"
            ),
        )
    )
