"""Survival analysis, inequality measures, ranking-based model
evaluation, and bitmap activity rollups.

Reference parity: the reference tracks per-symbol activity and
dashboard KPIs (app/dashboard.py metric tiles); these are the
retention-engineering upgrades of those KPIs — a Kaplan-Meier churn
curve (the estimator behind every retention chart that must respect
censoring), a Gini concentration index, a Mann-Whitney AUC for
scoring weak labelers, and the bit-twiddling activity rollup that
collapses a month of presence to one BIGINT per entity.

Scale notes: every query shuffles entity-sized rollups, never raw
rows, except the AUC's one global sort (rank statistics need it; a
two-stage range-partitioned sort is the standard cluster form).
The KM survival chain and the bitmap streak are folds with
deterministic scalar order, mirrored by lockstep RECURSIVE CTE
oracles — bit-for-bit parity, same contract as the Holt/Kalman
family (registry_statespace.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stockpulse_spark.functions.nullsafe import nan_nn, not_finite
from stockpulse_spark.plans.registry import _r2, _r6, _register, _t

# censoring rule: a customer whose last order falls within this many
# months of the data horizon is still-active (censored), not churned
_KM_CENSOR_MONTHS = 12


@_register(
    "kaplan_meier_churn",
    oracle=f"""
    WITH RECURSIVE u AS (
      SELECT o_custkey,
             min(o_orderdate) AS first_dt,
             max(o_orderdate) AS last_dt
      FROM orders GROUP BY o_custkey
    ), h AS (
      SELECT max(o_orderdate) AS horizon FROM orders
    ), life AS (
      SELECT year(first_dt) AS cohort,
             date_diff('month', first_dt, last_dt) AS dur,
             CASE WHEN last_dt >= horizon - INTERVAL {_KM_CENSOR_MONTHS} MONTH
                  THEN 0 ELSE 1 END AS ev
      FROM u, h
    ), agg AS (
      SELECT cohort, dur,
             CAST(SUM(ev) AS BIGINT) AS d,
             COUNT(*) AS leaving
      FROM life GROUP BY cohort, dur
    ), risk AS (
      SELECT cohort, dur, d,
             CAST(SUM(leaving) OVER (PARTITION BY cohort ORDER BY dur
                                ROWS BETWEEN CURRENT ROW
                                AND UNBOUNDED FOLLOWING) AS BIGINT) AS n_risk
      FROM agg
    ), ev_rows AS (
      SELECT cohort, dur, d, n_risk,
             ROW_NUMBER() OVER (PARTITION BY cohort ORDER BY dur) - 1 AS t
      FROM risk WHERE d > 0
    ), km AS (
      SELECT cohort, 0 AS t,
             (1.0 - CAST(d AS DOUBLE) / n_risk) AS s
      FROM ev_rows WHERE t = 0
      UNION ALL
      SELECT k.cohort, e.t,
             k.s * (1.0 - CAST(e.d AS DOUBLE) / e.n_risk)
      FROM km k JOIN ev_rows e
        ON e.cohort = k.cohort AND e.t = k.t + 1
    )
    SELECT e.cohort, e.dur AS month, e.n_risk, e.d AS churned,
           ROUND(k.s, 6) AS survival
    FROM km k JOIN ev_rows e USING (cohort, t)
    ORDER BY cohort, month
    """,
    tags=("survival", "analytics", "window"),
    doc="Kaplan-Meier churn curve per acquisition-year cohort over "
    "customer order lifetimes: duration = months from first to last "
    "order, censored while the last order is within 12 months of the "
    "data horizon. Risk sets come from ONE reverse cumulative sum "
    "over the cohort x duration rollup (entity-sized — raw orders "
    "collapse first); the survival product S_t = prod(1 - d/n) is a "
    "chain multiplication folded JVM-side per cohort against a "
    "lockstep recursive-CTE oracle, so no exp/sum-log libm "
    "divergence can split the engines — identical multiply order, "
    "bit-for-bit. The estimator every retention chart needs once "
    "entities can still be alive at the horizon.",
)
def q_kaplan_meier_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    u = o.groupBy("o_custkey").agg(
        F.min("o_orderdate").alias("first_dt"),
        F.max("o_orderdate").alias("last_dt"),
    )
    h = o.agg(F.max("o_orderdate").alias("horizon"))
    life = u.join(F.broadcast(h)).select(
        F.year("first_dt").alias("cohort"),
        (
            (F.year("last_dt") - F.year("first_dt")) * 12
            + (F.month("last_dt") - F.month("first_dt"))
        ).alias("dur"),
        F.when(
            F.col("last_dt")
            >= F.add_months(F.col("horizon"), -_KM_CENSOR_MONTHS),
            0,
        )
        .otherwise(1)
        .alias("ev"),
    )
    agg = life.groupBy("cohort", "dur").agg(
        F.sum("ev").alias("d"), F.count(F.lit(1)).alias("leaving")
    )
    w_rev = (
        Window.partitionBy("cohort")
        .orderBy("dur")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    risk = agg.select(
        "cohort",
        "dur",
        "d",
        F.sum("leaving").over(w_rev).alias("n_risk"),
    ).filter(F.col("d") > 0)
    g = risk.groupBy("cohort").agg(
        F.array_sort(
            F.collect_list(F.struct("dur", "d", "n_risk"))
        ).alias("s")
    )
    fold = (
        "aggregate("
        "  slice(s, 2, size(s) - 1), "
        "  named_struct("
        "    'surv', (1.0 - CAST(s[0].d AS DOUBLE) / s[0].n_risk), "
        "    'out', array((1.0 - CAST(s[0].d AS DOUBLE) / s[0].n_risk))), "
        "  (acc, e) -> named_struct("
        "    'surv', acc.surv * (1.0 - CAST(e.d AS DOUBLE) / e.n_risk), "
        "    'out', array_append(acc.out, "
        "      acc.surv * (1.0 - CAST(e.d AS DOUBLE) / e.n_risk))))"
    )
    z = g.withColumn("st", F.expr(fold)).select(
        "cohort",
        F.explode(
            F.arrays_zip(F.col("s"), F.col("st.out").alias("surv"))
        ).alias("z"),
    )
    return z.select(
        "cohort",
        F.col("z.s.dur").alias("month"),
        F.col("z.s.n_risk").alias("n_risk"),
        F.col("z.s.d").alias("churned"),
        _r6(F.col("z.surv")).alias("survival"),
    ).orderBy("cohort", "month")


@_register(
    "gini_revenue_yearly",
    oracle="""
    WITH rev AS (
      -- unpriced orders carry nothing; an all-NULL customer-year
      -- would otherwise put a NULL cents into the rank ORDER BY
      -- where Spark (NULLS FIRST) and DuckDB (NULLS LAST) disagree
      SELECT year(o_orderdate) AS o_year, o_custkey,
             CAST(SUM(round((CASE WHEN NOT isfinite(o_totalprice) THEN NULL ELSE o_totalprice END) * 100)) AS BIGINT) AS cents
      FROM orders
      WHERE o_totalprice IS NOT NULL AND isfinite(o_totalprice)
      GROUP BY 1, 2
    ), ranked AS (
      SELECT o_year, cents,
             ROW_NUMBER() OVER (PARTITION BY o_year
                                ORDER BY cents, o_custkey) AS rnk
      FROM rev
    )
    SELECT o_year,
           COUNT(*) AS n_customers,
           ROUND(SUM(cents) / 100.0, 2) AS total_revenue,
           -- nullif: an all-zero-revenue year has no inequality to
           -- measure — NULL in both engines (Spark ANSI would raise)
           ROUND((2.0 * SUM(rnk * cents) - (COUNT(*) + 1.0) * SUM(cents))
                 / nullif(COUNT(*) * CAST(SUM(cents) AS DOUBLE), 0.0),
                 6) AS gini
    FROM ranked
    GROUP BY o_year ORDER BY o_year
    """,
    tags=("analytics", "window", "agg"),
    doc="Gini coefficient of customer revenue per order year — the "
    "inequality index complementing `revenue_concentration`'s Pareto "
    "shares (a single 0..1 number instead of threshold cuts). Uses "
    "the rank formulation G = (2*sum(i*x_i) - (n+1)*sum(x)) / "
    "(n*sum(x)) over ascending ranks: revenue is integer cents so "
    "every sum (max ~1e14) is exact in BIGINT and below 2^53, and "
    "the one double division at the end is IEEE-identical in both "
    "engines — no float-cumsum association anywhere. One customer "
    "rollup shuffle + one per-year rank window.",
)
def q_gini_revenue_yearly(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_totalprice").isNotNull() & ~not_finite("o_totalprice")
    )
    rev = o.groupBy(
        F.year("o_orderdate").alias("o_year"), "o_custkey"
    ).agg(
        F.sum(F.round(nan_nn("o_totalprice") * 100))
        .cast("bigint")
        .alias("cents")
    )
    ranked = rev.select(
        "o_year",
        "cents",
        F.row_number()
        .over(Window.partitionBy("o_year").orderBy("cents", "o_custkey"))
        .alias("rnk"),
    )
    n = F.count(F.lit(1))
    sx = F.sum("cents")
    six = F.sum(F.col("rnk") * F.col("cents"))
    return (
        ranked.groupBy("o_year")
        .agg(
            n.alias("n_customers"),
            _r2(sx / 100.0).alias("total_revenue"),
            _r6(
                F.try_divide(
                    2.0 * six - (n + F.lit(1.0)) * sx,
                    F.nullif(n * sx.cast("double"), F.lit(0.0)),
                )
            ).alias("gini"),
        )
        .orderBy("o_year")
    )


@_register(
    "score_auc_rank",
    oracle="""
    WITH scored AS (
      SELECT vec_id, label,
             CAST(embedding[1] AS DOUBLE) AS score
      FROM embeddings
    ), ranked AS (
      SELECT label, vec_id,
             ROW_NUMBER() OVER (ORDER BY score, vec_id) AS rnk
      FROM scored
    ), n AS (
      SELECT COUNT(*) AS n_total FROM scored
    ), per AS (
      SELECT label,
             COUNT(*) AS n_pos,
             SUM(rnk) AS rank_sum
      FROM ranked GROUP BY label
    )
    SELECT label, n_pos, n_total - n_pos AS n_neg,
           ROUND((rank_sum - n_pos * (n_pos + 1) / 2.0)
                 / (CAST(n_pos AS DOUBLE) * (n_total - n_pos)), 6) AS auc
    FROM per, n
    ORDER BY label
    """,
    tags=("ml", "eval", "window"),
    doc="One-vs-rest AUC per label for a candidate scoring feature "
    "(first embedding dimension) via the Mann-Whitney rank-sum "
    "identity AUC = (R_pos - n_pos(n_pos+1)/2) / (n_pos*n_neg) — the "
    "model-evaluation primitive for weak-labeler triage, computed "
    "without any threshold sweep. ONE global rank (deterministic "
    "(score, vec_id) tiebreak shared by all labels, since "
    "Mann-Whitney only needs global ranks) feeds every per-label "
    "aggregate; ranks and rank sums are integers so only the final "
    "division is floating point. The rank is DISTRIBUTED: a range "
    "repartition on (score, vec_id), per-partition row_number, then "
    "a broadcast of cumulative partition counts — the prefix-sum "
    "decomposition (`peak_concurrent_sessions_daily` uses the same "
    "trick) — so no single task ever sees the whole table the way a "
    "global Window.orderBy would.",
)
def q_score_auc_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    scored = e.select(
        "vec_id",
        "label",
        F.col("embedding").getItem(0).cast("double").alias("score"),
    )
    from stockpulse_spark.operators.rank import with_global_rank

    ranked = with_global_rank(scored, "score", "vec_id").select(
        "label", "rnk"
    )
    n_total = scored.agg(F.count(F.lit(1)).alias("n_total"))
    per = ranked.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_pos"),
        F.sum("rnk").alias("rank_sum"),
    )
    return (
        per.join(F.broadcast(n_total))
        .select(
            "label",
            "n_pos",
            (F.col("n_total") - F.col("n_pos")).alias("n_neg"),
            _r6(
                (
                    F.col("rank_sum")
                    - F.col("n_pos") * (F.col("n_pos") + 1) / 2.0
                )
                / (
                    F.col("n_pos").cast("double")
                    * (F.col("n_total") - F.col("n_pos"))
                )
            ).alias("auc"),
        )
        .orderBy("label")
    )


@_register(
    "activity_bitmap_rollup",
    oracle="""
    WITH RECURSIVE bm AS (
      SELECT user_id, date_trunc('month', ts) AS month,
             bit_or(CAST(1 AS BIGINT) << (day(ts) - 1)) AS mask
      FROM events GROUP BY 1, 2
    ), st AS (
      SELECT user_id, month, mask, 0 AS i,
             mask AS v, 0 AS streak
      FROM bm
      UNION ALL
      SELECT user_id, month, mask, i + 1,
             v & (v << 1),
             streak + CASE WHEN v <> 0 THEN 1 ELSE 0 END
      FROM st WHERE i < 31
    )
    SELECT user_id, month, mask,
           bit_count(mask) AS active_days,
           streak AS longest_streak
    FROM st WHERE i = 31
    ORDER BY user_id, month
    """,
    tags=("analytics", "bitmap", "agg"),
    doc="Monthly activity bitmap per user: one BIGINT with bit d set "
    "iff the user was active on day d+1 — the compressed presence "
    "encoding that makes retention/streak queries metadata-sized at "
    "100 TB (a billion users x month is 8 GB of masks vs rescanning "
    "raw events; masks OR-merge associatively, so partial aggs and "
    "month->quarter rollups are free). active_days = popcount; "
    "longest consecutive-day streak via the classic 31-step "
    "v &= (v << 1) reduction — counted identically by a JVM "
    "sequence-fold and the oracle's lockstep recursive CTE, integer-"
    "exact in both. One shuffle on (user, month) with map-side "
    "partial bit_or.",
)
def q_activity_bitmap_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    bm = ev.groupBy(
        "user_id",
        F.date_trunc("month", "ts").cast("date").alias("month"),
    ).agg(
        F.bit_or(
            F.expr("shiftleft(CAST(1 AS BIGINT), day(ts) - 1)")
        ).alias("mask")
    )
    streak = (
        "aggregate(sequence(1, 31), "
        " named_struct('v', mask, 'streak', 0), "
        " (acc, i) -> named_struct("
        "   'v', acc.v & shiftleft(acc.v, 1), "
        "   'streak', acc.streak + IF(acc.v <> 0, 1, 0)), "
        " acc -> acc.streak)"
    )
    return bm.select(
        "user_id",
        "month",
        "mask",
        F.bit_count("mask").alias("active_days"),
        F.expr(streak).alias("longest_streak"),
    ).orderBy("user_id", "month")
