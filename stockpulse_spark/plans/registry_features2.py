"""Feature-store composition queries: the wide per-entity feature
matrix, graph-ranked keywords, and seasonal-baseline anomaly rates.

Reference parity: these compose operators the registry already
verifies one-by-one (rollups, percentiles, pagerank, seasonal
profiles) into the three deliverables an ML platform actually ships:
a training-ready feature matrix per entity, corpus keywords, and an
anomaly monitor scored against a seasonal baseline. Each stays one
declarative plan so Catalyst shares scans/exchanges across the
composed pieces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stockpulse_spark.functions.nullsafe import nan_nn
from stockpulse_spark.plans.registry import _r6, _register, _t


@_register(
    "user_feature_matrix",
    oracle="""
    WITH h AS (
      SELECT max(ts) AS horizon FROM events
    ), f AS (
      SELECT user_id,
             COUNT(*) AS n_events,
             COUNT(DISTINCT CAST(date_trunc('day', ts) AS DATE))
               AS n_active_days,
             COUNT(DISTINCT event_type) AS n_types,
             SUM(CAST(round((CASE WHEN NOT isfinite(value) THEN NULL ELSE value END) * 100) AS BIGINT)) AS cents,
             SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS n_purchases,
             min(ts) AS first_ts, max(ts) AS last_ts
      FROM events GROUP BY user_id
    )
    SELECT f.user_id, f.n_events, f.n_active_days, f.n_types,
           ROUND(f.cents / 100.0, 6) AS total_value,
           ROUND(CAST(f.n_purchases AS DOUBLE) / f.n_events, 6)
             AS purchase_rate,
           (epoch_us(h.horizon) - epoch_us(f.last_ts))
             // 3600000000 AS recency_hours,
           (epoch_us(f.last_ts) - epoch_us(f.first_ts))
             // 86400000000 AS tenure_days,
           CASE WHEN f.n_events > 1 THEN
             ROUND(CAST(epoch_us(f.last_ts) - epoch_us(f.first_ts)
                        AS DOUBLE) / 60000000.0 / (f.n_events - 1), 6)
           END AS mean_gap_minutes
    FROM f, h
    ORDER BY f.user_id
    """,
    tags=("features", "ml", "agg"),
    doc="The training-ready per-user feature matrix in ONE pass: "
    "activity (events, active days, type breadth), monetary "
    "(integer-cents total), behavioral (purchase rate), and "
    "temporal (recency vs the data horizon, tenure, mean inter-"
    "event gap) features — the feature-store materialization every "
    "churn/LTV model starts from, with all time math in integer "
    "microseconds so both engines derive identical features. One "
    "partial-agg shuffle keyed by user + a 1-row horizon broadcast; "
    "leakage-free variants (as-of cutoffs) compose via "
    "`scd2_point_in_time_join`'s interval semantics.",
)
def q_user_feature_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    us = F.expr("unix_micros(ts)")
    h = ev.agg(F.max(us).alias("horizon_us"))
    f = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_distinct(
            F.date_trunc("day", "ts").cast("date")
        ).alias("n_active_days"),
        F.count_distinct("event_type").alias("n_types"),
        F.sum(F.round(nan_nn("value") * 100).cast("bigint")).alias("cents"),
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("n_purchases"),
        F.min(us).alias("first_us"),
        F.max(us).alias("last_us"),
    )
    return (
        f.join(F.broadcast(h))
        .select(
            "user_id",
            "n_events",
            "n_active_days",
            "n_types",
            _r6(F.col("cents") / 100.0).alias("total_value"),
            _r6(
                F.col("n_purchases").cast("double") / F.col("n_events")
            ).alias("purchase_rate"),
            F.expr(
                "(horizon_us - last_us) DIV 3600000000"
            ).alias("recency_hours"),
            F.expr(
                "(last_us - first_us) DIV 86400000000"
            ).alias("tenure_days"),
            F.when(
                F.col("n_events") > 1,
                _r6(
                    (F.col("last_us") - F.col("first_us")).cast("double")
                    / 60000000.0
                    / (F.col("n_events") - 1)
                ),
            ).alias("mean_gap_minutes"),
        )
        .orderBy("user_id")
    )


_TR_UNIT = 10**12
_TR_TELEPORT = 15 * 10**10  # 0.15 in rank units


@_register(
    "textrank_keywords",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), adj AS (
      -- the pair stays a STRUCT (never a delimited string): a token
      -- containing the delimiter would corrupt a re-split edge list
      -- while the Spark side's struct pairs stayed intact
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, len(w)),
                    i -> CASE WHEN w[i] < w[i + 1]
                         THEN {{'a': w[i], 'b': w[i + 1]}}
                         ELSE {{'a': w[i + 1], 'b': w[i]}} END)) AS pk
      FROM toks
    ), pairs AS (
      SELECT DISTINCT pk.a AS p1, pk.b AS p2
      FROM adj WHERE pk.a <> pk.b
    ), edges AS (
      SELECT p1 AS src, p2 AS dst FROM pairs
      UNION ALL SELECT p2, p1 FROM pairs
    ), deg AS (
      SELECT src AS node, COUNT(*) AS outdeg FROM edges GROUP BY src
    ), n AS (SELECT COUNT(*) AS nn FROM deg),
    pr0 AS (
      SELECT node, outdeg, {_TR_UNIT} // nn AS pr_units FROM deg, n
    ), it1 AS (
      SELECT d.node, d.outdeg,
             CAST({_TR_TELEPORT} // n.nn
                  + (85 * SUM(p.pr_units // p.outdeg)) // 100
                  AS BIGINT) AS pr_units
      FROM edges e
      JOIN pr0 p ON e.src = p.node
      JOIN deg d ON e.dst = d.node, n
      GROUP BY d.node, d.outdeg, n.nn
    ), it2 AS (
      SELECT d.node, d.outdeg,
             CAST({_TR_TELEPORT} // n.nn
                  + (85 * SUM(p.pr_units // p.outdeg)) // 100
                  AS BIGINT) AS pr_units
      FROM edges e
      JOIN it1 p ON e.src = p.node
      JOIN deg d ON e.dst = d.node, n
      GROUP BY d.node, d.outdeg, n.nn
    )
    SELECT node AS keyword,
           ROUND(CAST(pr_units AS DOUBLE) / {_TR_UNIT}, 12) AS textrank
    FROM it2
    ORDER BY pr_units DESC, node
    LIMIT 20
    """,
    tags=("llmdata", "text", "graph", "iterative"),
    doc="TextRank keyword extraction: PageRank (d=0.85, 2 unrolled "
    "iterations, integer rank units — the same machinery as "
    "`copurchase_pagerank`) over the word co-occurrence graph, where "
    "nodes are corpus terms and edges join words ADJACENT in any "
    "document (canonical low|high orientation, distinct per doc via "
    "in-row bigram expansion — never a token self-join). The "
    "graph-centrality upgrade of `corpus_top_terms`' raw counts: a "
    "term ranks high for sitting between many distinct contexts, "
    "not for raw frequency. Edge list is vocabulary-bounded, tiny "
    "next to the scan that builds it.",
)
def q_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    # two-select + zip_with, no captured expression (the round-10
    # interpreted-HOF rule): the old transform lambda re-ran
    # split(text) per TOKEN via the captured element_at(split(...))
    # — interpreted HOFs re-evaluate every captured expression per
    # element. zip_with over two slices of the pre-projected token
    # attribute emits the identical adjacent pairs.
    adj = d.select("doc_id", F.split("text", " ").alias("ws")).select(
        "doc_id",
        F.explode(
            F.expr(
                "array_distinct(zip_with("
                "slice(ws, 1, size(ws) - 1), slice(ws, 2, size(ws) - 1), "
                "(x, y) -> IF(x < y, struct(x AS p1, y AS p2), "
                "struct(y AS p1, x AS p2))))"
            )
        ).alias("q"),
    )
    pairs = (
        adj.select(F.col("q.p1").alias("p1"), F.col("q.p2").alias("p2"))
        .filter(F.col("p1") != F.col("p2"))
        .distinct()
    )
    edges = (
        pairs.select(F.col("p1").alias("src"), F.col("p2").alias("dst"))
        .unionAll(
            pairs.select(F.col("p2").alias("src"), F.col("p1").alias("dst"))
        )
        .localCheckpoint(eager=False)
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    n = deg.agg(F.count(F.lit(1)).alias("nn"))
    pr = deg.join(F.broadcast(n)).select(
        F.col("src").alias("node"),
        "outdeg",
        F.expr(f"CAST({_TR_UNIT} AS BIGINT) DIV nn").alias("pr_units"),
    )

    def step(p: DataFrame) -> DataFrame:
        inflow = (
            edges.join(p, edges["src"] == p["node"])
            .select(
                F.col("dst").alias("node"),
                F.expr("pr_units DIV outdeg").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        return (
            inflow.join(F.broadcast(n))
            .join(deg, inflow["node"] == deg["src"])
            .select(
                "node",
                "outdeg",
                (
                    F.expr(f"CAST({_TR_TELEPORT} AS BIGINT) DIV nn")
                    + F.expr("(85 * inflow) DIV 100")
                ).alias("pr_units"),
            )
        )

    it2 = step(step(pr))
    return (
        it2.orderBy(F.desc("pr_units"), "node")
        .limit(20)
        .select(
            F.col("node").alias("keyword"),
            F.round(
                F.col("pr_units").cast("double") / F.lit(_TR_UNIT), 12
            ).alias("textrank"),
        )
    )


@_register(
    "seasonal_anomaly_rates",
    oracle="""
    WITH ev AS (
      SELECT * REPLACE (CASE WHEN NOT isfinite(value) THEN NULL
                        ELSE value END AS value)
      FROM events
    ), b AS (
      SELECT event_type, hour(ts) AS hr,
             quantile_cont(value, 0.5) AS med
      FROM ev GROUP BY 1, 2
    ), r AS (
      SELECT e.event_type, hour(e.ts) AS hr,
             abs(e.value - b.med) AS adev, e.value
      FROM ev e JOIN b ON e.event_type = b.event_type
                          AND hour(e.ts) = b.hr
    ), m AS (
      SELECT event_type, hr, quantile_cont(adev, 0.5) AS mad
      FROM r GROUP BY 1, 2
    )
    SELECT r.event_type, r.hr,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN r.adev > 3 * 1.4826 * m.mad
               THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies,
           ROUND(CAST(SUM(CASE WHEN r.adev > 3 * 1.4826 * m.mad
                          THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS anomaly_rate
    FROM r JOIN m ON r.event_type = m.event_type AND r.hr = m.hr
    GROUP BY r.event_type, r.hr
    ORDER BY r.event_type, r.hr
    """,
    tags=("features", "anomaly", "agg"),
    doc="Seasonal-baseline anomaly monitor: each event is scored "
    "against the median of ITS OWN (type, hour-of-day) cell and "
    "flagged beyond 3 robust sigmas (1.4826*MAD) — the seasonal "
    "upgrade of `value_mad_outliers`' global baseline, so a value "
    "normal at the daily peak but absurd at 3am is caught. Two "
    "exact-percentile passes over the scan with the (24 x types)-"
    "sized baselines broadcast back; the comparison doubles are "
    "identical in both engines because medians interpolate the "
    "identical multisets.",
)
def q_seasonal_anomaly_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").withColumn("value", nan_nn("value"))
    b = ev.groupBy("event_type", F.hour("ts").alias("hr")).agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    r = ev.select(
        "event_type", F.hour("ts").alias("hr"), "value"
    ).join(F.broadcast(b), ["event_type", "hr"]).select(
        "event_type",
        "hr",
        F.abs(F.col("value") - F.col("med")).alias("adev"),
    )
    m = r.groupBy("event_type", "hr").agg(
        F.percentile("adev", F.lit(0.5)).alias("mad")
    )
    flag = F.when(
        F.col("adev") > 3 * 1.4826 * F.col("mad"), 1
    ).otherwise(0)
    return (
        r.join(F.broadcast(m), ["event_type", "hr"])
        .groupBy("event_type", "hr")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(flag).alias("n_anomalies"),
            _r6(
                F.sum(flag).cast("double") / F.count(F.lit(1))
            ).alias("anomaly_rate"),
        )
        .orderBy("event_type", "hr")
    )
