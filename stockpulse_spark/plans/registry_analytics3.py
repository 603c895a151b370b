"""Third analytics wave: concentration (Pareto) analysis, rolling
anomaly detection, and Benford first-digit forensics.

Reference parity: these are the "is something off in this data?"
queries an analyst runs on the reference's warehouse after the
dashboard — customer concentration for revenue risk, outlier bars for
data-quality triage (the reference eyeballs spikes on its price chart,
app/dashboard.py), digit-distribution forensics for synthetic/fat-
fingered data detection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stockpulse_spark.functions.nullsafe import not_finite

from stockpulse_spark.operators.rank import with_global_rank
from stockpulse_spark.plans.registry import _hourly_bars, _r6, _register, _t

_PCTS = (1, 5, 20)


@_register(
    "revenue_concentration",
    oracle=f"""
    WITH rev AS (
      SELECT o_custkey, SUM(o_totalprice) AS revenue FROM orders GROUP BY o_custkey
    ), ranked AS (
      SELECT revenue,
             ROW_NUMBER() OVER (ORDER BY revenue DESC, o_custkey) AS rnk,
             COUNT(*) OVER () AS n_total,
             SUM(revenue) OVER () AS total_rev
      FROM rev
    )
    SELECT p.pct,
           CAST(ceil(n_total * p.pct / 100.0) AS BIGINT) AS n_customers,
           ROUND(SUM(revenue) FILTER (WHERE rnk <= ceil(n_total * p.pct / 100.0))
                 / total_rev, 6) AS revenue_share
    FROM ranked CROSS JOIN (VALUES {", ".join(f"({p})" for p in _PCTS)}) AS p(pct)
    GROUP BY p.pct, n_total, total_rev
    ORDER BY p.pct
    """,
    tags=("window", "agg", "analytics"),
    doc="Pareto concentration: revenue share of the top 1/5/20% of "
    "customers. Shares are CONDITIONAL sums over the ranked frame "
    "(one row per threshold), deliberately NOT a running cumulative "
    "sum — plain SUM is order-free in both engines so the usual "
    "cumulative-float-association trap never arises. One customer "
    "agg shuffle (pinned with localCheckpoint so the totals pass and "
    "the rank pass share it); the global rank is distributed "
    "(operators/rank.py::with_global_rank — range repartition + "
    "prefix-sum, never a single-task sort of the customer frame) and "
    "the two scalars broadcast back — nothing customer-sized ever "
    "crosses one task.",
)
def q_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    rev = (
        o.groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("revenue"))
        .localCheckpoint(eager=False)
    )
    totals = rev.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum("revenue").alias("total_rev"),
    )
    # "-revenue" = DESC NULLS LAST, identical (incl. NaN placement) to
    # the oracle's ORDER BY revenue DESC under DuckDB's nulls-last
    # default
    ranked = with_global_rank(
        rev, "-revenue", "o_custkey", rank_col="rnk"
    ).crossJoin(F.broadcast(totals))
    pcts = spark.range(1).select(
        F.explode(F.array(*[F.lit(p) for p in _PCTS])).alias("pct")
    )
    cut = F.ceil(F.col("n_total") * F.col("pct") / 100.0)
    return (
        ranked.crossJoin(F.broadcast(pcts))
        .groupBy("pct", "n_total", "total_rev")
        .agg(
            _r6(
                F.sum(F.when(F.col("rnk") <= cut, F.col("revenue")).otherwise(0.0))
                / F.first("total_rev")
            ).alias("revenue_share")
        )
        .select(
            "pct",
            F.ceil(F.col("n_total") * F.col("pct") / 100.0)
            .cast("long")
            .alias("n_customers"),
            "revenue_share",
        )
        .orderBy("pct")
    )


@_register(
    "rolling_outliers",
    oracle="""
    WITH bars AS (
      -- HAVING mirrors _BARS_CTE's no-empty-bar contract
      SELECT user_id, date_trunc('hour', ts) AS bucket_start,
             last(value ORDER BY ts, value) FILTER (WHERE value IS NOT NULL AND isfinite(value)) AS close
      FROM events GROUP BY user_id, date_trunc('hour', ts)
      HAVING last(value ORDER BY ts, value) FILTER (WHERE value IS NOT NULL AND isfinite(value)) IS NOT NULL
    ), z AS (
      SELECT user_id, bucket_start, close,
             CASE WHEN COUNT(*) OVER w >= 20
                   AND stddev_samp(close) OVER w > 0
                  THEN (close - AVG(close) OVER w) / stddev_samp(close) OVER w
             END AS zscore
      FROM bars
      WINDOW w AS (PARTITION BY user_id ORDER BY bucket_start
                   ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, bucket_start, ROUND(close, 6) AS close,
           ROUND(zscore, 6) AS zscore
    FROM z WHERE abs(zscore) > 2.0
    ORDER BY user_id, bucket_start
    """,
    tags=("window", "analytics", "quality"),
    doc="Rolling anomaly detection: hourly closes more than 2 sample "
    "standard deviations from their own trailing-20 mean — the "
    "data-quality triage query behind every 'spike on the chart' "
    "investigation. Same single window exchange as the Bollinger "
    "family (it IS the Bollinger z-score, surfaced as a filter); "
    "the |z|>2 cut compares identical doubles in both engines.",
)
def q_rolling_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = _hourly_bars(spark, sf_dir).select("user_id", "bucket_start", "close")
    w = Window.partitionBy("user_id").orderBy("bucket_start").rowsBetween(-19, 0)
    # two-select shape: stddev named once (Catalyst does not dedup
    # identical window expressions — inline it appeared twice)
    b = bars.select(
        "user_id",
        "bucket_start",
        "close",
        F.count(F.lit(1)).over(w).alias("__n"),
        F.avg("close").over(w).alias("__avg"),
        F.stddev_samp("close").over(w).alias("__sd"),
    )
    sd = F.col("__sd")
    z = F.when(
        (F.col("__n") >= 20) & (sd > 0),
        (F.col("close") - F.col("__avg")) / sd,
    )
    return (
        b.select(
            "user_id",
            "bucket_start",
            _r6(F.col("close")).alias("close"),
            _r6(z).alias("zscore"),
        )
        .filter(F.abs(F.col("zscore")) > 2.0)
        .orderBy("user_id", "bucket_start")
    )


# first significant digit WITHOUT log10: floor(log10) flips on a 1-ulp
# libm difference right at powers of ten, while range CASEs multiply/
# divide by exact powers of ten — identical IEEE ops in both engines.
# events.value spans [0.01, ~500].
_DIGIT = """
CAST(CASE WHEN {v} >= 100 THEN floor({v} / 100.0)
          WHEN {v} >= 10  THEN floor({v} / 10.0)
          WHEN {v} >= 1   THEN floor({v})
          WHEN {v} >= 0.1 THEN floor({v} * 10.0)
          WHEN {v} > 0    THEN floor({v} * 100.0)
     END AS INTEGER)
"""


@_register(
    "benford_first_digit",
    oracle=f"""
    WITH d AS (
      SELECT {_DIGIT.format(v="value")} AS digit FROM events WHERE value > 0 AND isfinite(value)
    )
    SELECT digit,
           COUNT(*) AS n,
           ROUND(COUNT(*) * 1.0 / (SUM(COUNT(*)) OVER ()), 6) AS freq,
           ROUND(ln(1.0 + 1.0 / digit) / ln(10.0), 6) AS benford_expected
    FROM d GROUP BY digit ORDER BY digit
    """,
    tags=("agg", "analytics", "quality"),
    doc="Benford first-significant-digit distribution vs the Benford "
    "expectation log10(1 + 1/d) — the forensic screen for synthetic "
    "or manipulated numeric columns. Digit extraction uses range "
    "CASEs with exact power-of-ten arithmetic instead of "
    "floor(log10()) (a 1-ulp libm divergence at a power of ten would "
    "flip the digit; multiplication by exact constants cannot). One "
    "9-group partial-agg shuffle.",
)
def q_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(
        (F.col("value") > 0) & ~not_finite("value")
    )
    d = ev.select(F.expr(_DIGIT.format(v="value")).alias("digit"))
    counts = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    return (
        counts.select(
            "digit",
            "n",
            _r6(
                F.col("n") * 1.0 / F.sum("n").over(Window.partitionBy())
            ).alias("freq"),
            _r6(F.log(1.0 + 1.0 / F.col("digit")) / F.log(F.lit(10.0))).alias(
                "benford_expected"
            ),
        )
        .orderBy("digit")
    )
