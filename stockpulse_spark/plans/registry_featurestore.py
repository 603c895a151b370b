"""Point-in-time-correct training-set assembly — the feature-store
operation that decides whether an ML pipeline leaks the future:
every feature attached to a label row must be computable from STRICTLY
BEFORE the label timestamp.

Spark-first shape: no join at all. Labels (purchase events) and the
feature stream are the same partitioned series, so one pass of
per-user RANGE-frame windows (microsecond integer key, upper bound
1 microsecond PRECEDING — the rolling_1h_time_window pattern) attaches
the trailing-7-day counts/sums and the as-of previous event, then the
label filter keeps purchase rows. At 100 TB this is one shuffle on
user_id — the same exchange every per-user feature shares.

Determinism: money is integer cents BEFORE the window sum (the
SCALE.md fold-order contract); the strictly-before frame makes the
label row and any exact-duplicate row invisible to its own features
in both engines identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stockpulse_spark.functions.nullsafe import nan_nn
from stockpulse_spark.plans.registry import _r2, _register, _t

_7D_US = 7 * 24 * 3600 * 1_000_000


@_register(
    "leakage_free_training_set",
    oracle=f"""
    WITH ev AS (
      SELECT event_id, user_id, ts, event_type,
             epoch_us(ts) AS us,
             CASE WHEN value IS NULL OR NOT isfinite(value) THEN NULL
                  ELSE CAST(round(value * 100) AS BIGINT) END AS cents
      FROM events WHERE ts IS NOT NULL
    ), feat AS (
      SELECT event_id, user_id, ts, event_type,
             COUNT(*) OVER w7 AS n_prev_7d,
             SUM(cents) OVER w7 AS cents_prev_7d,
             COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)
               OVER w7 AS n_prev_purchases,
             -- total order: adversarial corpora collide (us,
             -- event_id) with different payloads; type/value
             -- tiebreaks (NULLS LAST both engines) leave only
             -- full-duplicate ties, where lag's answer is identical
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY us, event_id,
                                            event_type NULLS LAST,
                                            cents NULLS LAST)
               AS prev_event_type
      FROM ev
      WINDOW w7 AS (PARTITION BY user_id ORDER BY us
                    RANGE BETWEEN {_7D_US} PRECEDING
                          AND 1 PRECEDING)
    )
    SELECT event_id AS label_id, user_id, ts,
           CAST(COALESCE(n_prev_7d, 0) AS BIGINT) AS n_prev_7d,
           ROUND(COALESCE(cents_prev_7d, 0) / 100.0, 2)
             AS value_prev_7d,
           CAST(COALESCE(n_prev_purchases, 0) AS BIGINT)
             AS n_prev_purchases,
           prev_event_type
    FROM feat
    WHERE event_type = 'purchase'
    ORDER BY user_id, ts, label_id
    """,
    tags=("ml", "window", "feature"),
    doc="Leakage-free training-set assembly: label rows (purchases) "
    "carry trailing-7-day activity count, spend, and purchase count "
    "plus the as-of previous event — all through per-user RANGE "
    "frames on the microsecond key with an upper bound of 1 "
    "microsecond PRECEDING, so the label row (and any exact "
    "duplicate of it) can never see itself. No join: labels and "
    "features share one user_id exchange — the point-in-time "
    "correctness the scd2_point_in_time_join gives dimension "
    "attributes, delivered for windowed behavioral features. Spend "
    "sums integer cents inside the frame (fold-order exact).",
)
def q_leakage_free_training_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        _t(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select(
            "event_id",
            "user_id",
            "ts",
            "event_type",
            F.expr("unix_micros(ts)").alias("us"),
            # nan_nn: a NaN spend is garbage, not money — and the
            # cents snap would raise CAST_OVERFLOW on it (ANSI)
            F.when(
                nan_nn("value").isNotNull(),
                F.round(nan_nn("value") * 100).cast("bigint"),
            ).alias("cents"),
        )
    )
    w7 = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-_7D_US, -1)
    )
    wl = Window.partitionBy("user_id").orderBy(
        F.col("us").asc(),
        F.col("event_id").asc(),
        F.col("event_type").asc_nulls_last(),
        F.col("cents").asc_nulls_last(),
    )
    feat = ev.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.count(F.lit(1)).over(w7).alias("n_prev_7d"),
        F.sum("cents").over(w7).alias("cents_prev_7d"),
        F.count(
            F.when(F.col("event_type") == "purchase", 1)
        ).over(w7).alias("n_prev_purchases"),
        F.lag("event_type").over(wl).alias("prev_event_type"),
    )
    return (
        feat.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("label_id"),
            "user_id",
            "ts",
            F.coalesce("n_prev_7d", F.lit(0))
            .cast("long")
            .alias("n_prev_7d"),
            _r2(
                F.coalesce("cents_prev_7d", F.lit(0)) / 100.0
            ).alias("value_prev_7d"),
            F.coalesce("n_prev_purchases", F.lit(0))
            .cast("long")
            .alias("n_prev_purchases"),
            "prev_event_type",
        )
        .orderBy("user_id", "ts", "label_id")
    )
