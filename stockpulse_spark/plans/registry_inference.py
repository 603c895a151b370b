"""Distributed statistical inference: Poisson-bootstrap confidence
intervals and a chi-square independence test.

Reference parity: the reference reports point metrics with no
uncertainty (app/dashboard.py KPI tiles); these add the error bars — the
Poisson bootstrap is THE cluster-scale resampling method (per-row
Poisson(1) weights make every replicate a single streaming pass;
classical resampling would need n draws per replicate and a shuffle
each), and the chi-square test is the canonical independence check
for two categorical rollups.

Determinism: bootstrap weights come from md5-derived 32-bit uniforms
compared against PRE-COMPUTED INTEGER thresholds (floor of the
Poisson(1) CDF scaled by 2^32) — no float RNG, no libm in the weight
path, so both engines draw identical replicates; replicate sums are
integer cents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stockpulse_spark.llmdata.hashing import hex_to_int_sql
from stockpulse_spark.functions.nullsafe import nan_nn
from stockpulse_spark.plans.registry import _r6, _register, _t

_B = 100  # bootstrap replicates

# floor(CDF_Poisson1(k) * 2^32) for k = 0..8; a 32-bit md5 uniform u
# falls in bucket k when u < threshold[k]. P(K > 8) < 1.2e-8 — the
# residual mass rounds into weight 9 via the ELSE arm.
_POIS_T = [
    1580030168,
    3160060337,
    3950075421,
    4213413783,
    4279248373,
    4292415291,
    4294609777,
    4294923276,
    4294962463,
]


def _pois_case(u: str) -> str:
    arms = " ".join(
        f"WHEN {u} < {t} THEN {k}" for k, t in enumerate(_POIS_T)
    )
    return f"(CASE {arms} ELSE 9 END)"


@_register(
    "poisson_bootstrap_ci",
    oracle=f"""
    WITH reps AS (
      SELECT e.event_type, b.b,
             {_pois_case(hex_to_int_sql("md5(CAST(e.event_id AS VARCHAR) || ':' || CAST(b.b AS VARCHAR))"))} AS w,
             CAST(round((CASE WHEN NOT isfinite(e.value) THEN NULL ELSE e.value END) * 100) AS BIGINT) AS cents
      FROM events e
      CROSS JOIN (SELECT unnest(range(0, {_B})) AS b) b
    ), rm AS (
      SELECT event_type, b,
             CAST(SUM(w * cents) AS DOUBLE) / SUM(w) / 100.0 AS m
      FROM reps GROUP BY event_type, b
      HAVING SUM(w) > 0
    ), pt AS (
      SELECT event_type, COUNT(*) AS n,
             ROUND(AVG(value), 6) AS mean_value
      FROM events GROUP BY event_type
    )
    SELECT pt.event_type, pt.n, pt.mean_value,
           ROUND(stddev_samp(rm.m), 6) AS boot_se,
           ROUND(quantile_cont(rm.m, 0.025), 6) AS ci_lo,
           ROUND(quantile_cont(rm.m, 0.975), 6) AS ci_hi
    FROM pt JOIN rm USING (event_type)
    GROUP BY pt.event_type, pt.n, pt.mean_value
    ORDER BY pt.event_type
    """,
    tags=("inference", "bootstrap", "agg"),
    doc=f"Bootstrap 95% CI and standard error for the mean value per "
    "event type via the POISSON BOOTSTRAP — per-(row, replicate) "
    "Poisson(1) weights stand in for sampling with replacement, "
    "which is the only bootstrap that runs as one streaming pass "
    f"over a 100 TB table ({_B} weighted partial aggregates per "
    "partition, shuffle rows = groups x replicates, never the data). "
    "Weights are md5-uniforms compared against integer-scaled "
    "Poisson CDF thresholds — pure integer comparisons, so both "
    "engines draw bit-identical replicates; replicate sums are "
    "integer cents and each replicate mean is one exact division. "
    "The replicate explode multiplies map-side compute, not shuffle "
    "volume — the documented cost of uncertainty at scale.",
)
def q_poisson_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    u = hex_to_int_sql(
        "md5(CAST(event_id AS STRING) || ':' || CAST(b AS STRING))"
    )
    # Spread the events scan before the xB replicate explode
    # (optimization r11, the PQ/matryoshka fix class): the input is
    # one parquet split, so the 100x row multiply and its per-row md5
    # otherwise execute in a SINGLE task. The repartition shuffles the
    # 3-column pre-explode rows only; replicate weights and integer
    # replicate sums are partition-independent.
    reps = (
        ev.select(
            "event_type",
            "event_id",
            F.round(nan_nn("value") * 100).cast("bigint").alias("cents"),
        )
        .repartition(spark.sparkContext.defaultParallelism)
        .select(
            "event_type",
            "event_id",
            "cents",
            F.explode(F.sequence(F.lit(0), F.lit(_B - 1))).alias("b"),
        )
        .withColumn("w", F.expr(_pois_case(u)))
    )
    rm = (
        reps.groupBy("event_type", "b")
        .agg(
            F.sum(F.col("w") * F.col("cents")).alias("ws"),
            F.sum("w").alias("wn"),
        )
        .filter(F.col("wn") > 0)
        .select(
            "event_type",
            (
                F.col("ws").cast("double") / F.col("wn") / 100.0
            ).alias("m"),
        )
    )
    pt = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        _r6(F.avg("value")).alias("mean_value"),
    )
    return (
        pt.join(rm, "event_type")
        .groupBy("event_type", "n", "mean_value")
        .agg(
            _r6(F.stddev_samp("m")).alias("boot_se"),
            _r6(F.percentile("m", F.lit(0.025))).alias("ci_lo"),
            _r6(F.percentile("m", F.lit(0.975))).alias("ci_hi"),
        )
        .orderBy("event_type")
    )


@_register(
    "segment_type_chisq",
    oracle="""
    WITH j AS (
      SELECT c.c_mktsegment AS seg, e.event_type AS typ
      FROM events e JOIN customer c ON e.user_id = c.c_custkey
    ), o AS (
      SELECT seg, typ, COUNT(*) AS obs FROM j GROUP BY seg, typ
    ), rt AS (
      SELECT seg, SUM(obs) AS r FROM o GROUP BY seg
    ), ct AS (
      SELECT typ, SUM(obs) AS c FROM o GROUP BY typ
    ), n AS (
      SELECT SUM(obs) AS n FROM o
    ), cells AS (
      SELECT o.seg, o.typ, o.obs,
             CAST(rt.r AS DOUBLE) * ct.c / n.n AS expected
      FROM o JOIN rt USING (seg) JOIN ct USING (typ), n
    )
    SELECT (SELECT COUNT(*) FROM rt) AS n_segments,
           (SELECT COUNT(*) FROM ct) AS n_types,
           (SELECT CAST(n AS BIGINT) FROM n) AS n_obs,
           ((SELECT COUNT(*) FROM rt) - 1)
             * ((SELECT COUNT(*) FROM ct) - 1) AS dof,
           ROUND(SUM((obs - expected) * (obs - expected) / expected), 6)
             AS chi2
    FROM cells
    """,
    tags=("inference", "agg", "join"),
    doc="Chi-square test of independence between customer market "
    "segment and event type — the significance test behind every "
    "'does behavior differ by segment' dashboard split. The "
    "contingency table is a (segments x types)-sized rollup built "
    "from one broadcast-dim join + one partial-agg shuffle; "
    "marginals and expecteds derive from that metadata-sized table, "
    "so the statistic costs one scan regardless of corpus size. "
    "Observed counts and marginals are exact integers; expecteds "
    "are one double expression per cell.",
)
def q_segment_type_chisq(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    cust = _t(spark, sf_dir, "customer")
    j = ev.join(
        F.broadcast(
            cust.select(
                F.col("c_custkey").alias("user_id"),
                F.col("c_mktsegment").alias("seg"),
            )
        ),
        "user_id",
    ).select("seg", F.col("event_type").alias("typ"))
    o = j.groupBy("seg", "typ").agg(F.count(F.lit(1)).alias("obs"))
    rt = o.groupBy("seg").agg(F.sum("obs").alias("r"))
    ct = o.groupBy("typ").agg(F.sum("obs").alias("c"))
    n = o.agg(F.sum("obs").alias("n"))
    cells = (
        o.join(F.broadcast(rt), "seg")
        .join(F.broadcast(ct), "typ")
        .join(F.broadcast(n))
        .select(
            "obs",
            (
                F.col("r").cast("double") * F.col("c") / F.col("n")
            ).alias("expected"),
        )
    )
    nseg = rt.agg(F.count(F.lit(1)).alias("n_segments"))
    ntyp = ct.agg(F.count(F.lit(1)).alias("n_types"))
    stat = cells.agg(
        _r6(
            F.sum(
                (F.col("obs") - F.col("expected"))
                * (F.col("obs") - F.col("expected"))
                / F.col("expected")
            )
        ).alias("chi2")
    )
    return (
        nseg.join(F.broadcast(ntyp))
        .join(F.broadcast(n.select(F.col("n").alias("n_obs"))))
        .join(F.broadcast(stat))
        .select(
            "n_segments",
            "n_types",
            "n_obs",
            (
                (F.col("n_segments") - 1) * (F.col("n_types") - 1)
            ).alias("dof"),
            "chi2",
        )
    )


@_register(
    "conformal_interval_coverage",
    oracle=f"""
    WITH e AS (
      SELECT event_type, hour(ts) AS hr,
             CASE WHEN NOT isfinite(value) THEN NULL ELSE value END AS value,
             CAST(round((CASE WHEN NOT isfinite(value) THEN NULL ELSE value END) * 100) AS BIGINT) AS cents,
             {hex_to_int_sql("md5(CAST(event_id AS VARCHAR))", 8)} % 2
               AS split
      FROM events
    ), model AS (
      SELECT event_type, hr,
             CAST(SUM(cents) AS DOUBLE) / COUNT(*) / 100.0 AS pred
      FROM e WHERE split = 0 GROUP BY event_type, hr
    ), scored AS (
      SELECT e.event_type, e.split,
             abs(e.value - m.pred) AS score
      FROM e JOIN model m
        ON e.event_type = m.event_type AND e.hr = m.hr
    ), qhat AS (
      SELECT event_type,
             COUNT(*) AS n_calib,
             quantile_cont(score, 0.9) AS q
      FROM scored WHERE split = 0 GROUP BY event_type
    )
    SELECT s.event_type, q.n_calib,
           COUNT(*) AS n_test,
           ROUND(q.q, 6) AS qhat,
           ROUND(CAST(SUM(CASE WHEN s.score <= q.q THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS coverage
    FROM scored s JOIN qhat q USING (event_type)
    WHERE s.split = 1
    GROUP BY s.event_type, q.n_calib, q.q
    ORDER BY s.event_type
    """,
    tags=("inference", "ml", "agg"),
    doc="Split-conformal prediction intervals with empirical coverage "
    "check: an md5-parity split carves calibration/test halves "
    "deterministically in both engines, a (type, hour-of-day) "
    "calibration-mean model predicts each event, the 90% quantile "
    "of calibration residuals becomes the interval half-width, and "
    "the TEST half reports achieved coverage (should sit near 0.9 — "
    "the distribution-free guarantee every deployed predictor "
    "should be wrapped in). Model and quantiles are metadata-sized "
    "broadcasts; the whole check is two scan passes. Calibration "
    "means come from integer cents, so predictions and residuals "
    "are identical doubles across engines.",
)
def q_conformal_interval_coverage(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    split = (
        F.expr(hex_to_int_sql("md5(CAST(event_id AS STRING))", 8)) % 2
    ).alias("split")
    e = ev.select(
        "event_type",
        F.hour("ts").alias("hr"),
        nan_nn("value").alias("value"),
        F.round(nan_nn("value") * 100).cast("bigint").alias("cents"),
        split,
    )
    model = (
        e.filter(F.col("split") == 0)
        .groupBy("event_type", "hr")
        .agg(
            (
                F.sum("cents").cast("double")
                / F.count(F.lit(1))
                / 100.0
            ).alias("pred")
        )
    )
    scored = e.join(F.broadcast(model), ["event_type", "hr"]).select(
        "event_type",
        "split",
        F.abs(F.col("value") - F.col("pred")).alias("score"),
    )
    qhat = (
        scored.filter(F.col("split") == 0)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_calib"),
            F.percentile("score", F.lit(0.9)).alias("q"),
        )
    )
    hit = F.when(F.col("score") <= F.col("q"), 1).otherwise(0)
    return (
        scored.filter(F.col("split") == 1)
        .join(F.broadcast(qhat), "event_type")
        .groupBy("event_type", "n_calib", "q")
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            _r6(
                F.sum(hit).cast("double") / F.count(F.lit(1))
            ).alias("coverage"),
        )
        .select(
            "event_type",
            "n_calib",
            "n_test",
            _r6(F.col("q")).alias("qhat"),
            "coverage",
        )
        .orderBy("event_type")
    )
