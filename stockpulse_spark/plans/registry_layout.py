"""Data-layout and sliding-window shapes: Z-order clustering,
sliding 7-day actives, and a weighted median.

Reference parity: the reference's warehouse relies on (symbol, ts)
sort order for pruning (bigquery_loader DDL clustering); at 100 TB a
SINGLE sort key can't serve both per-user and per-time queries —
Z-ordering interleaves both dimensions so min/max file stats prune on
either predicate. zorder_clustering_stats measures that directly.
sliding_7d_active_users is the bounded-fanout rewrite of the sliding
distinct-count (the op that naively needs a 7-day shuffle window per
day); weighted_median_price is the order-statistic the plain median
family (value_percentiles) can't express.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stockpulse_spark.functions.nullsafe import not_finite

from stockpulse_spark.plans.registry import _r6, _register, _t

_BITS = 8


def _morton_sql(a: str, b: str) -> str:
    """Bit-interleave two 8-bit ints into a 16-bit Morton code using
    only & * + with precomputed power-of-two literals — `&` is the
    one bit operator with identical syntax and semantics in Spark SQL
    and DuckDB (shift operators differ), and it stays in codegen."""
    terms = []
    for i in range(_BITS):
        terms.append(
            f"(CASE WHEN (({a}) & {1 << i}) <> 0"
            f" THEN {1 << (2 * i + 1)} ELSE 0 END)"
        )
        terms.append(
            f"(CASE WHEN (({b}) & {1 << i}) <> 0"
            f" THEN {1 << (2 * i)} ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ")"


@_register(
    "zorder_clustering_stats",
    oracle=f"""
    WITH pts AS (
      SELECT user_id % 256 AS a,
             (epoch_us(ts) // 3600000000) % 256 AS b
      FROM events
    ), coded AS (
      SELECT a, b,
             {_morton_sql('a', 'b')} // 256 AS z_bucket,
             a AS linear_bucket
      FROM pts
    ), z AS (
      SELECT 'zorder' AS layout, z_bucket AS bucket,
             COUNT(*) AS n,
             COUNT(DISTINCT a) AS d_users,
             MAX(b) - MIN(b) AS hour_span
      FROM coded GROUP BY z_bucket
    ), lin AS (
      SELECT 'linear' AS layout, linear_bucket AS bucket,
             COUNT(*) AS n,
             COUNT(DISTINCT a) AS d_users,
             MAX(b) - MIN(b) AS hour_span
      FROM coded GROUP BY linear_bucket
    ), unioned AS (
      SELECT * FROM z UNION ALL SELECT * FROM lin
    )
    SELECT layout,
           COUNT(*) AS n_buckets,
           ROUND(AVG(d_users), 6) AS avg_distinct_users,
           ROUND(AVG(hour_span), 6) AS avg_hour_span,
           MAX(n) AS max_bucket_rows
    FROM unioned GROUP BY layout ORDER BY layout
    """,
    tags=("layout", "agg"),
    doc="Z-order vs single-key clustering, measured: Morton-interleave "
    "(user % 256, hour % 256) into 256 buckets and compare per-bucket "
    "user-cardinality and hour-span against user-only bucketing. "
    "Z-order buckets stay tight on BOTH dimensions (small d_users AND "
    "small hour_span), which is exactly what lets parquet min/max "
    "stats prune files for either predicate — the layout decision "
    "behind a 100 TB table serving mixed per-user and per-time "
    "queries. The interleave is integer //%* arithmetic — dialect-"
    "portable, whole-stage codegen, no UDF.",
)
def q_zorder_clustering_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    pts = ev.select(
        (F.col("user_id") % 256).alias("a"),
        (F.expr("unix_micros(ts) div 3600000000") % 256).alias("b"),
    )
    coded = pts.select(
        "a",
        "b",
        F.expr(f"{_morton_sql('a', 'b')} div 256").alias("z_bucket"),
        F.col("a").alias("linear_bucket"),
    )

    def layout(df: DataFrame, key: str, name: str) -> DataFrame:
        return (
            df.groupBy(F.col(key).alias("bucket"))
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.countDistinct("a").alias("d_users"),
                (F.max("b") - F.min("b")).alias("hour_span"),
            )
            .select(F.lit(name).alias("layout"), "*")
        )

    unioned = layout(coded, "z_bucket", "zorder").unionAll(
        layout(coded, "linear_bucket", "linear")
    )
    return (
        unioned.groupBy("layout")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            _r6(F.avg("d_users")).alias("avg_distinct_users"),
            _r6(F.avg("hour_span")).alias("avg_hour_span"),
            F.max("n").alias("max_bucket_rows"),
        )
        .orderBy("layout")
    )


@_register(
    "sliding_7d_active_users",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
      FROM events
    ), days AS (
      SELECT DISTINCT day FROM ud
    ), expanded AS (
      SELECT ud.user_id, ud.day + o.o * INTERVAL 1 DAY AS obs_day
      FROM ud, (SELECT unnest(range(0, 7)) AS o) o
    ), wau AS (
      SELECT obs_day, COUNT(DISTINCT user_id) AS active_7d
      FROM expanded GROUP BY obs_day
    ), dau AS (
      SELECT day, COUNT(*) AS active_1d FROM ud GROUP BY day
    )
    SELECT d.day, dau.active_1d, wau.active_7d,
           ROUND(dau.active_1d * 1.0 / wau.active_7d, 6) AS stickiness
    FROM days d
    JOIN dau ON dau.day = d.day
    JOIN wau ON wau.obs_day = d.day
    ORDER BY d.day
    """,
    tags=("analytics", "agg"),
    doc="Sliding 7-day distinct actives (WAU) + same-day DAU + "
    "stickiness, via the bounded-fanout rewrite: distinct (user, day) "
    "pairs each project into the <=7 observation days they keep a "
    "user active in, then one COUNT DISTINCT per day. The naive form "
    "(a 7-day RANGE window with a distinct agg) keeps per-day state "
    "proportional to the window's raw rows; this form's fanout is a "
    "CONSTANT 7x on the already-deduped (user, day) table and every "
    "stage partial-aggregates — the standard scale pattern for "
    "sliding distinct counts.",
)
def q_sliding_7d_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    ud = ev.select(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).distinct()
    days = ud.select("day").distinct()
    expanded = ud.select(
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("o"),
        "day",
    ).select(
        "user_id",
        F.expr("timestampadd(DAY, o, day)").alias("obs_day"),
    )
    wau = expanded.groupBy("obs_day").agg(
        F.countDistinct("user_id").alias("active_7d")
    )
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).alias("active_1d"))
    return (
        days.join(dau, "day")
        .join(wau, days.day == wau.obs_day)
        .select(
            "day",
            "active_1d",
            "active_7d",
            _r6(F.col("active_1d") * 1.0 / F.col("active_7d")).alias(
                "stickiness"
            ),
        )
        .orderBy("day")
    )


@_register(
    "weighted_median_price",
    oracle="""
    WITH w AS (
      -- NULL price/weight rows carry no information for an order
      -- statistic AND would enter the cumsum ORDER BY where Spark
      -- (NULLS FIRST) and DuckDB (NULLS LAST) disagree — excluded
      SELECT l_returnflag,
             l_extendedprice AS price,
             CAST(l_quantity AS BIGINT) AS wt
      FROM lineitem
      WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
        AND isfinite(l_extendedprice)
    ), c AS (
      SELECT l_returnflag, price, wt,
             SUM(wt) OVER (PARTITION BY l_returnflag ORDER BY price
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
             SUM(wt) OVER (PARTITION BY l_returnflag) AS tw
      FROM w
    )
    SELECT l_returnflag,
           COUNT(*) AS n,
           CAST(MAX(tw) AS BIGINT) AS total_weight,
           ROUND(MIN(CASE WHEN 2 * cw >= tw THEN price END), 6)
             AS weighted_median,
           ROUND(quantile_cont(price, 0.5), 6) AS plain_median
    FROM c GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    tags=("analytics", "window", "percentile"),
    doc="Quantity-weighted median price per return flag: the first "
    "price whose cumulative integer weight crosses half the total "
    "(weights cast to BIGINT so the cumsum is exact — no float "
    "fold-order divergence at the crossing), next to the plain "
    "median for contrast. Among tied prices the crossing price is "
    "tie-invariant, so ORDER BY price alone is deterministic. One "
    "sort shuffle on the group key; the order statistic the "
    "percentile family can't express (percentile() has no weight "
    "argument).",
)
def q_weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    w = li.filter(
        F.col("l_extendedprice").isNotNull()
        & F.col("l_quantity").isNotNull()
        & ~not_finite("l_extendedprice")
    ).select(
        "l_returnflag",
        F.col("l_extendedprice").alias("price"),
        F.col("l_quantity").cast("bigint").alias("wt"),
    )
    wc = (
        Window.partitionBy("l_returnflag")
        .orderBy("price")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wt_all = Window.partitionBy("l_returnflag")
    c = w.select(
        "l_returnflag",
        "price",
        F.sum("wt").over(wc).alias("cw"),
        F.sum("wt").over(wt_all).alias("tw"),
    )
    return (
        c.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max("tw").alias("total_weight"),
            _r6(
                F.min(
                    F.when(2 * F.col("cw") >= F.col("tw"), F.col("price"))
                )
            ).alias("weighted_median"),
            _r6(F.expr("percentile(price, 0.5)")).alias("plain_median"),
        )
        .orderBy("l_returnflag")
    )
