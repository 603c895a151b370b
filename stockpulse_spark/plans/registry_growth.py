"""Growth accounting, session conversion, and dup-cluster shape.

Reference parity: the reference's dashboard shows activity counts;
growth accounting is the standard decomposition product teams actually
run on them (every weekly active user is exactly one of new/retained/
resurrected, and last week's actives who vanished are churned — the
four flows reconcile WAU deltas). session_conversion_daily composes
the sessionizer with a per-session outcome flag; dup_cluster_size_stats
reads the connected-component structure the transitive keeper builds
and answers the curator's question "how big do duplicate clusters get".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stockpulse_spark.plans.registry import _r6, _register, _t
from stockpulse_spark.plans.registry_tfidf import (
    _CHAIN_CTE,
    q_dedup_keeper_transitive,
)


@_register(
    "growth_accounting_weekly",
    oracle="""
    WITH uw AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('week', ts) AS TIMESTAMP) AS wk
      FROM events
    ), seq AS (
      SELECT user_id, wk,
             MIN(wk) OVER (PARTITION BY user_id) AS first_wk,
             lag(wk)  OVER (PARTITION BY user_id ORDER BY wk) AS prev_wk,
             lead(wk) OVER (PARTITION BY user_id ORDER BY wk) AS next_wk
      FROM uw
    ), mx AS (
      SELECT MAX(wk) AS max_wk FROM uw
    ), actives AS (
      SELECT wk,
             CASE WHEN wk = first_wk THEN 'new'
                  WHEN prev_wk = wk - INTERVAL 7 DAY THEN 'retained'
                  ELSE 'resurrected' END AS status
      FROM seq
    ), churn AS (
      SELECT s.wk + INTERVAL 7 DAY AS wk, 'churned' AS status
      FROM seq s, mx
      WHERE (s.next_wk IS NULL OR s.next_wk > s.wk + INTERVAL 7 DAY)
        AND s.wk + INTERVAL 7 DAY <= mx.max_wk
    ), unioned AS (
      SELECT * FROM actives UNION ALL SELECT * FROM churn
    )
    SELECT wk,
           CAST(SUM(CASE WHEN status = 'new' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_new,
           CAST(SUM(CASE WHEN status = 'retained' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_retained,
           CAST(SUM(CASE WHEN status = 'resurrected' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_resurrected,
           CAST(SUM(CASE WHEN status = 'churned' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_churned
    FROM unioned GROUP BY wk ORDER BY wk
    """,
    tags=("analytics", "window"),
    doc="Weekly growth accounting: every active user classified as "
    "new (first week), retained (also active previous week), or "
    "resurrected (returning after a gap); churned counts last week's "
    "actives who vanished, reported into the week they went missing "
    "(capped at the observed horizon). One window pass over the "
    "deduped (user, week) table — users-x-weeks-sized, far smaller "
    "than events — then a conditional-sum pivot on weeks-sized data. "
    "The four flows reconcile WAU week-over-week deltas exactly.",
)
def q_growth_accounting_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    uw = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("wk")
    ).distinct()
    wu = Window.partitionBy("user_id")
    wo = wu.orderBy("wk")
    seq = uw.select(
        "user_id",
        "wk",
        F.min("wk").over(wu).alias("first_wk"),
        F.lag("wk").over(wo).alias("prev_wk"),
        F.lead("wk").over(wo).alias("next_wk"),
    )
    week = F.expr("INTERVAL 7 DAYS")
    mx = uw.agg(F.max("wk").alias("max_wk"))
    actives = seq.select(
        "wk",
        F.when(F.col("wk") == F.col("first_wk"), "new")
        .when(F.col("prev_wk") == F.col("wk") - week, "retained")
        .otherwise("resurrected")
        .alias("status"),
    )
    churn = (
        seq.join(F.broadcast(mx))
        .filter(
            (
                F.col("next_wk").isNull()
                | (F.col("next_wk") > F.col("wk") + week)
            )
            & (F.col("wk") + week <= F.col("max_wk"))
        )
        .select(
            (F.col("wk") + week).alias("wk"), F.lit("churned").alias("status")
        )
    )
    return (
        actives.unionAll(churn)
        .groupBy("wk")
        .agg(
            F.sum(F.when(F.col("status") == "new", 1).otherwise(0)).alias(
                "n_new"
            ),
            F.sum(
                F.when(F.col("status") == "retained", 1).otherwise(0)
            ).alias("n_retained"),
            F.sum(
                F.when(F.col("status") == "resurrected", 1).otherwise(0)
            ).alias("n_resurrected"),
            F.sum(
                F.when(F.col("status") == "churned", 1).otherwise(0)
            ).alias("n_churned"),
        )
        .orderBy("wk")
    )


@_register(
    "session_conversion_daily",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_type,
             CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER
                    (PARTITION BY user_id ORDER BY ts)) > 1800000000
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                     IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), sessions AS (
      SELECT user_id, ts, event_type,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
      FROM flagged
    ), per_session AS (
      SELECT user_id, session_id,
             MIN(ts) AS session_start,
             (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) / 60000000.0
               AS session_minutes,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS converted
      FROM sessions GROUP BY user_id, session_id
    )
    SELECT CAST(date_trunc('day', session_start) AS TIMESTAMP) AS day,
           COUNT(*) AS n_sessions,
           CAST(SUM(converted) AS BIGINT) AS n_converting,
           ROUND(SUM(converted) * 1.0 / COUNT(*), 6) AS conversion_rate,
           ROUND(AVG(session_minutes), 6) AS avg_session_minutes
    FROM per_session GROUP BY 1 ORDER BY day
    """,
    tags=("analytics", "session"),
    doc="Daily session conversion: the sessionizer (same lag->cumsum "
    "core as sessionize_events, exact-microsecond gaps) composed "
    "with a per-session purchase flag and duration, rolled up by "
    "session-start day. Window + two partial-agg shuffles all keyed "
    "on user/day; session durations stay exact epoch-us integers "
    "until ONE division to minutes. The business rollup the raw "
    "sessionizer exists to feed.",
)
def q_session_conversion_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    prev = F.lag("ts").over(w)
    new_session = F.when(
        prev.isNull()
        | (
            (F.unix_micros(F.col("ts")) - F.unix_micros(prev))
            > 1_800_000_000
        ),
        1,
    ).otherwise(0)
    sessions = ev.select(
        "user_id", "ts", "event_type", new_session.alias("new_session")
    ).withColumn(
        "session_id",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    per_session = sessions.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        (
            (
                F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))
            )
            / 60000000.0
        ).alias("session_minutes"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted"),
    )
    return (
        per_session.groupBy(
            F.date_trunc("day", "session_start").alias("day")
        )
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("converted").alias("n_converting"),
            _r6(F.sum("converted") * 1.0 / F.count(F.lit(1))).alias(
                "conversion_rate"
            ),
            _r6(F.avg("session_minutes")).alias("avg_session_minutes"),
        )
        .orderBy("day")
    )


@_register(
    "dup_cluster_size_stats",
    oracle=_CHAIN_CTE
    + """
    , assign AS (
      SELECT k.doc_id,
             LEAST(k.doc_id, COALESCE(c.min_reach, k.doc_id)) AS keeper_id
      FROM keyed k LEFT JOIN comp c USING (doc_id)
    ), sizes AS (
      SELECT keeper_id, COUNT(*) AS cluster_size
      FROM assign GROUP BY keeper_id
    )
    SELECT cluster_size, COUNT(*) AS n_clusters
    FROM sizes GROUP BY cluster_size ORDER BY cluster_size
    """,
    tags=("llmdata", "dedup", "iterative"),
    doc="Duplicate-cluster size distribution over the SAME planted "
    "A-B-C chain corpus and label-propagation components as "
    "dedup_keeper_transitive: group members by elected keeper, then "
    "histogram the cluster sizes. The curator's sanity table — a fat "
    "tail here means boilerplate super-clusters that need a bucket "
    "cap before pair generation. Adds two group-by shuffles over "
    "(id, label) pairs on top of the component iteration; the "
    "histogram itself is cluster-size-sized (tiny).",
)
def q_dup_cluster_size_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    assign = q_dedup_keeper_transitive(spark, sf_dir)
    sizes = assign.groupBy("keeper_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return (
        sizes.groupBy("cluster_size")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .orderBy("cluster_size")
    )
