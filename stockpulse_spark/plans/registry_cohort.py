"""Customer-base analytics: monthly cohort LTV curves and RFM
segmentation — the two rollups every revenue warehouse schedules,
expressed so the heavy tables shuffle once and every derived stage
runs on customer- or cohort-sized data.

(The reference's warehouse serves this query class; its dashboard
only ever plots per-symbol series — reference app/dashboard.py — so
these extend the engine along the axis BASELINE.md identifies as the
reference's blind spot.)"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stockpulse_spark.functions.nullsafe import nan_nn
from stockpulse_spark.operators.rank import ntile_from_rank, with_global_rank
from stockpulse_spark.plans.registry import _r4, _register, _t


@_register(
    "cohort_ltv_monthly",
    oracle="""
    WITH om AS (
      -- date-less orders have no month on the LTV axis; a NULL m
      -- would yield NULL cohort/month_index keys whose window
      -- ORDER BY position differs between engines (NULLS FIRST vs
      -- NULLS LAST), shearing every cumsum after it
      SELECT o_custkey,
             CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
             o_totalprice
      FROM orders WHERE o_orderdate IS NOT NULL
    ), cohorts AS (
      SELECT o_custkey, MIN(m) AS cohort_month FROM om GROUP BY o_custkey
    ), sizes AS (
      SELECT cohort_month, COUNT(*) AS n_customers
      FROM cohorts GROUP BY cohort_month
    ), rev AS (
      SELECT c.cohort_month,
             datediff('month', c.cohort_month, o.m) AS month_index,
             CAST(ROUND(SUM((CASE WHEN NOT isfinite(o.o_totalprice) THEN NULL ELSE o.o_totalprice END) * 100)) AS BIGINT) AS rev_cents
      FROM om o JOIN cohorts c ON o.o_custkey = c.o_custkey
      GROUP BY c.cohort_month, datediff('month', c.cohort_month, o.m)
    )
    SELECT r.cohort_month, r.month_index, s.n_customers,
           ROUND(SUM(r.rev_cents) OVER (
                   PARTITION BY r.cohort_month ORDER BY r.month_index
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 / (100.0 * s.n_customers), 4) AS cum_ltv_per_customer
    FROM rev r JOIN sizes s ON r.cohort_month = s.cohort_month
    ORDER BY r.cohort_month, r.month_index
    """,
    tags=("agg", "growth", "window"),
    doc="cohort LTV curves: customers grouped by first-order month, "
    "cumulative revenue per customer by months-since-acquisition. "
    "Orders shuffle once on custkey (cohort assignment re-uses that "
    "partitioning); everything after the second agg is "
    "cohorts x months sized — window cumsum on metadata, not facts. "
    "Revenue snaps to integer CENTS before the cumsum (prices are "
    "2-decimal), so the running total is exact integer arithmetic on "
    "both engines — float fold-order cannot reach the 4dp output "
    "(the weighted_median_price integer-cumsum discipline).",
)
def q_cohort_ltv_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    om = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate").isNotNull())
        .select(
            "o_custkey",
            F.trunc("o_orderdate", "month").alias("m"),
            "o_totalprice",
        )
    )
    cohorts = om.groupBy("o_custkey").agg(
        F.min("m").alias("cohort_month")
    )
    sizes = cohorts.groupBy("cohort_month").agg(
        F.count(F.lit(1)).alias("n_customers")
    )
    rev = (
        om.join(cohorts, "o_custkey")
        .groupBy(
            "cohort_month",
            F.months_between("m", F.col("cohort_month"))
            .cast("bigint")
            .alias("month_index"),
        )
        .agg(
            F.round(F.sum(nan_nn("o_totalprice") * 100))
            .cast("bigint")
            .alias("rev_cents")
        )
    )
    w = (
        Window.partitionBy("cohort_month")
        .orderBy("month_index")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        rev.join(F.broadcast(sizes), "cohort_month")
        .select(
            "cohort_month",
            "month_index",
            "n_customers",
            _r4(
                F.sum("rev_cents").over(w)
                / (100.0 * F.col("n_customers"))
            ).alias("cum_ltv_per_customer"),
        )
        .orderBy("cohort_month", "month_index")
    )


@_register(
    "rfm_segmentation",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey,
             datediff('day', MAX(o_orderdate),
                      (SELECT MAX(o_orderdate) FROM orders)) AS recency_days,
             COUNT(*) AS frequency,
             SUM(CAST(round((CASE WHEN NOT isfinite(o_totalprice) THEN NULL ELSE o_totalprice END) * 100) AS BIGINT)) AS monetary
      FROM orders GROUP BY o_custkey
    ), scored AS (
      SELECT o_custkey, monetary,
             -- NULLS LAST pinned: a never-dated customer has NULL
             -- recency, and Spark ASC (NULLS FIRST) vs DuckDB ASC
             -- (NULLS LAST) would shear every r_score bucket;
             -- DESC NULLS LAST is the shared default but stated
             ntile(5) OVER (ORDER BY recency_days ASC NULLS LAST,
                            o_custkey) AS r_score,
             ntile(5) OVER (ORDER BY frequency DESC, o_custkey)  AS f_score,
             ntile(5) OVER (ORDER BY monetary DESC NULLS LAST,
                            o_custkey)   AS m_score
      FROM per_cust
    )
    SELECT r_score, f_score, m_score,
           COUNT(*) AS n_customers,
           ROUND(SUM(monetary) / 100.0 / COUNT(*), 4) AS avg_monetary
    FROM scored GROUP BY r_score, f_score, m_score
    ORDER BY r_score, f_score, m_score
    """,
    tags=("agg", "growth", "window"),
    doc="RFM segmentation: recency/frequency/monetary quintiles per "
    "customer (ntile with full custkey tie-break so the buckets are "
    "deterministic on both engines), rolled up to segment counts and "
    "average spend. One fact shuffle to customer grain; each quintile "
    "is a distributed global rank (operators/rank.py::with_global_rank"
    " — range repartition + per-partition row_number + broadcast "
    "prefix-sum) plus closed-form ntile arithmetic, so NO unbounded "
    "frame ever crosses a single WindowExec task: at 10^9 customers "
    "the three rank passes are three range shuffles of the "
    "customer-grain table, not three single-task sorts.",
)
def q_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    anchor = o.agg(F.max("o_orderdate").alias("anchor"))
    per_cust = (
        o.join(F.broadcast(anchor))
        .groupBy("o_custkey")
        .agg(
            F.datediff(
                F.any_value("anchor"), F.max("o_orderdate")
            ).alias("recency_days"),
            F.count(F.lit(1)).alias("frequency"),
            # integer cents: SUM over doubles is summation-order-
            # dependent in the last ulp, which flips 4dp rounding
            # boundaries at sf0.1 AND can reorder m_score ties —
            # exact integer cents make both deterministic
            F.sum(
                F.round(nan_nn("o_totalprice") * 100).cast("bigint")
            ).alias("monetary"),
        )
    )
    # Descending orderings re-expressed as ascending on the negated
    # key (with_global_rank pins ASC NULLS LAST, matching the
    # oracle's DESC NULLS LAST after negation — nulls stay null).
    keyed = per_cust.withColumns(
        {
            "__negf": -F.col("frequency"),
            "__negm": -F.col("monetary"),
        }
    ).localCheckpoint(eager=False)  # totals + 3 rank passes share it
    ranked = with_global_rank(
        keyed, "recency_days", "o_custkey", rank_col="__rr"
    )
    ranked = with_global_rank(ranked, "__negf", "o_custkey", rank_col="__fr")
    ranked = with_global_rank(ranked, "__negm", "o_custkey", rank_col="__mr")
    total = keyed.agg(F.count(F.lit(1)).alias("__n"))
    n = F.col("__n")
    scored = ranked.join(F.broadcast(total)).select(
        "o_custkey",
        "monetary",
        ntile_from_rank(F.col("__rr"), n, 5).alias("r_score"),
        ntile_from_rank(F.col("__fr"), n, 5).alias("f_score"),
        ntile_from_rank(F.col("__mr"), n, 5).alias("m_score"),
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            _r4(
                F.sum("monetary") / 100.0 / F.count(F.lit(1))
            ).alias("avg_monetary"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


@_register(
    "basket_affinity_lift",
    oracle="""
    WITH baskets AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), n_orders AS (
      SELECT COUNT(DISTINCT l_orderkey) AS n FROM baskets
    ), item AS (
      SELECT l_partkey, COUNT(*) AS item_cnt FROM baskets GROUP BY l_partkey
    ), pair AS (
      SELECT a.l_partkey AS p1, b.l_partkey AS p2, COUNT(*) AS pair_cnt
      FROM baskets a JOIN baskets b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY a.l_partkey, b.l_partkey
      HAVING COUNT(*) >= 3
    )
    SELECT p.p1, p.p2, p.pair_cnt,
           ROUND(CAST(p.pair_cnt AS DOUBLE) / i1.item_cnt, 6) AS confidence,
           ROUND(CAST(p.pair_cnt AS DOUBLE) * n.n
                 / (i1.item_cnt * CAST(i2.item_cnt AS DOUBLE)), 6) AS lift
    FROM pair p
    JOIN item i1 ON p.p1 = i1.l_partkey
    JOIN item i2 ON p.p2 = i2.l_partkey
    CROSS JOIN n_orders n
    ORDER BY lift DESC, p.p1, p.p2
    LIMIT 20
    """,
    tags=("join", "growth", "agg"),
    doc="association rules over order baskets: support (pair count), "
    "confidence P(p2|p1) and lift P(p1,p2)/(P(p1)P(p2)) for co-ordered "
    "part pairs with support >= 3, top-20 by lift. The pair expansion "
    "is WITHIN-order, in-row over each order's collected part set "
    "(bounded by basket size squared, never corpus-quadratic) so the "
    "basket table never self-joins — one collect_set shuffle replaces "
    "the join. The per-item count table is catalog-sized (TPC-H part "
    "grows with SF: ~2e8 parts at SF=1e5), so the two item-count "
    "joins carry NO broadcast hint — AQE broadcasts while the "
    "catalog is small and shuffles on the part key when it is not; "
    "only the 1-row order-count scalar is hinted.",
)
def q_basket_affinity_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    # one shuffle builds each order's distinct part set (map-side
    # partial collect_set); pairs expand in-row over the sorted array
    # (bounded by basket size squared), so the basket table never
    # self-joins
    baskets = (
        li.select("l_orderkey", "l_partkey")
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("ps"))
    )
    n_orders = li.agg(F.count_distinct("l_orderkey").alias("n"))
    item = (
        baskets.select(F.explode("ps").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("item_cnt"))
    )
    pair = (
        baskets.select(
            F.explode(
                F.expr(
                    "flatten(transform(ps, (x, i) -> "
                    "transform(slice(ps, i + 2, size(ps)), "
                    "y -> struct(x AS p1, y AS p2))))"
                )
            ).alias("q")
        )
        .groupBy(F.col("q.p1").alias("p1"), F.col("q.p2").alias("p2"))
        .agg(F.count(F.lit(1)).alias("pair_cnt"))
        .filter(F.col("pair_cnt") >= 3)
    )
    i1 = item.select(
        F.col("l_partkey").alias("p1"), F.col("item_cnt").alias("cnt1")
    )
    i2 = item.select(
        F.col("l_partkey").alias("p2"), F.col("item_cnt").alias("cnt2")
    )
    from stockpulse_spark.plans.registry import _r6

    return (
        pair.join(i1, "p1")
        .join(i2, "p2")
        .join(F.broadcast(n_orders))
        .select(
            "p1",
            "p2",
            "pair_cnt",
            _r6(F.col("pair_cnt").cast("double") / F.col("cnt1")).alias(
                "confidence"
            ),
            _r6(
                F.col("pair_cnt").cast("double")
                * F.col("n")
                / (F.col("cnt1") * F.col("cnt2").cast("double"))
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "p1", "p2")
        .limit(20)
    )
