"""Burst detection: a two-state Poisson HMM decoded with Viterbi —
the Kleinberg burst-detection shape over hourly event arrivals.

Reference parity: the reference's dashboard shows raw hourly volume
(app/dashboard.py volume panel) and `hourly_count_autocorr` diagnoses
burstiness as one number; this operator LABELS the bursts — an
optimal (min-cost) segmentation of each type's hourly count series
into baseline vs burst states, with a switching penalty that
suppresses one-hour flickers. State 0 emits Poisson(lambda), state 1
Poisson(2*lambda), switch cost gamma = 1 nat.

Determinism: emission costs drop the k!-term (shared by both states)
and integerize to MICRO-NATS, so the entire forward DP and the
backward decode are exact BIGINT/boolean arithmetic — the argmin
path cannot flip on float order in either engine. The oracle replays
the identical forward recursion and backward walk through two
lockstep recursive CTEs.

Scale: counts collapse to the HOURS x TYPES rollup first; the
Viterbi folds IN-ROW per type (two integer costs + two boolean
backpointer arrays — O(series) memory), the same bounded-series
contract as the MACD/Holt/DTW folds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stockpulse_spark.plans.registry import _r6, _register, _t

_SW = 1_000_000  # switch cost: 1 nat in micro-nats


@_register(
    "burst_detection_viterbi",
    oracle=f"""
    WITH RECURSIVE hc AS (
      -- typed burst detection: untyped (NULL) events carry no series
      -- key; filtered identically on the Spark side
      SELECT event_type, date_trunc('hour', ts) AS hr,
             COUNT(*) AS k
      FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2
    ), ser AS (
      SELECT event_type,
             list(hr ORDER BY hr) AS hrs,
             list(k ORDER BY hr) AS ks,
             COUNT(*) AS n,
             CAST(SUM(k) AS DOUBLE) / COUNT(*) AS lam,
             CAST(round(CAST(SUM(k) AS DOUBLE) / COUNT(*) * 1000000)
                  AS BIGINT) AS lam_u,
             CAST(round(ln(CAST(SUM(k) AS DOUBLE) / COUNT(*)) * 1000000)
                  AS BIGINT) AS llam,
             CAST(round(ln(2 * CAST(SUM(k) AS DOUBLE) / COUNT(*)) * 1000000)
                  AS BIGINT) AS l2lam
      FROM hc GROUP BY event_type
    ), fwd AS (
      SELECT event_type, n, ks, lam, lam_u, llam, l2lam, 0 AS t,
             lam_u - ks[1] * llam AS c0,
             2 * lam_u - ks[1] * l2lam + {_SW} AS c1,
             CAST([] AS BOOLEAN[]) AS b0,
             CAST([] AS BOOLEAN[]) AS b1
      FROM ser
      UNION ALL
      SELECT event_type, n, ks, lam, lam_u, llam, l2lam, t + 1,
             lam_u - ks[t + 2] * llam
               + CASE WHEN c1 + {_SW} < c0 THEN c1 + {_SW} ELSE c0 END,
             2 * lam_u - ks[t + 2] * l2lam
               + CASE WHEN c0 + {_SW} < c1 THEN c0 + {_SW} ELSE c1 END,
             list_append(b0, c1 + {_SW} < c0),
             list_append(b1, c0 + {_SW} < c1)
      FROM fwd WHERE t + 1 < n
    ), fin AS (
      SELECT event_type, n, b0, b1,
             CASE WHEN c1 < c0 THEN 1 ELSE 0 END AS s_final
      FROM fwd WHERE t = n - 1
    ), bwd AS (
      SELECT event_type, n, b0, b1, n - 1 AS t, s_final AS s,
             [s_final] AS path
      FROM fin
      UNION ALL
      SELECT event_type, n, b0, b1, t - 1,
             CASE WHEN s = 1 THEN (CASE WHEN b1[t] THEN 0 ELSE 1 END)
                  ELSE (CASE WHEN b0[t] THEN 1 ELSE 0 END) END,
             list_prepend(
               CASE WHEN s = 1 THEN (CASE WHEN b1[t] THEN 0 ELSE 1 END)
                    ELSE (CASE WHEN b0[t] THEN 1 ELSE 0 END) END,
               path)
      FROM bwd WHERE t > 0
    )
    SELECT s.event_type,
           unnest(s.hrs) AS hr,
           unnest(s.ks) AS n_events,
           ROUND(s.lam, 6) AS base_rate,
           unnest(b.path) AS burst_state
    FROM ser s JOIN (SELECT * FROM bwd WHERE t = 0) b
      USING (event_type)
    ORDER BY s.event_type, hr
    """,
    tags=("timeseries", "hmm", "statespace"),
    doc="Two-state Poisson-HMM burst labeling of hourly event counts "
    "per type (Kleinberg's burst-detection shape): state 0 emits "
    "Poisson(lambda = the type's mean hourly rate), state 1 "
    "Poisson(2*lambda), switching costs 1 nat — Viterbi returns the "
    "min-cost state sequence, so isolated spikes don't flicker the "
    "label. Emission costs drop the shared k! term and integerize "
    "to micro-nats; the forward DP (two BIGINT costs + boolean "
    "backpointers per step) and the backward walk are exact integer "
    "arithmetic folded IN-ROW, mirrored by two lockstep recursive "
    "CTEs in the oracle. The rollup is the only shuffle; the fold "
    "is bounded by series length.",
)
def q_burst_detection_viterbi(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull()
    )
    hc = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.count(F.lit(1)).alias("k"))
    ser = (
        hc.groupBy("event_type")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(hr, k))), e -> e.hr)"
            ).alias("hrs"),
            F.expr(
                "transform(array_sort(collect_list(struct(hr, k))), e -> e.k)"
            ).alias("ks"),
            F.count(F.lit(1)).alias("n"),
            (F.sum("k").cast("double") / F.count(F.lit(1))).alias("lam"),
        )
        # The per-type constants lam, ln(lam), ln(2*lam) are quantized
        # to micro-nats ONCE here (and identically in the oracle CTE),
        # so the DP below is exact BIGINT arithmetic over shared
        # constants: a last-ulp libm divergence between DuckDB's and
        # the JVM's ln() can only matter if it moves ln(lam)*1e6
        # across a .5 boundary — it is never amplified by k or by the
        # per-step rounding the previous formulation applied.
        .withColumn("lam_u", F.expr("CAST(round(lam * 1000000) AS BIGINT)"))
        .withColumn("llam", F.expr("CAST(round(ln(lam) * 1000000) AS BIGINT)"))
        .withColumn(
            "l2lam", F.expr("CAST(round(ln(2 * lam) * 1000000) AS BIGINT)")
        )
    )
    c0em = "(lam_u - x * llam)"
    c1em = "(2 * lam_u - x * l2lam)"
    fwd = (
        "aggregate("
        "  slice(ks, 2, size(ks) - 1), "
        "  named_struct("
        f"    'c0', {c0em.replace('x', 'ks[0]')}, "
        f"    'c1', {c1em.replace('x', 'ks[0]')} + {_SW}, "
        "    'b0', CAST(array() AS ARRAY<BOOLEAN>), "
        "    'b1', CAST(array() AS ARRAY<BOOLEAN>)), "
        "  (acc, x) -> named_struct("
        f"    'c0', {c0em} + IF(acc.c1 + {_SW} < acc.c0, "
        f"                      acc.c1 + {_SW}, acc.c0), "
        f"    'c1', {c1em} + IF(acc.c0 + {_SW} < acc.c1, "
        f"                      acc.c0 + {_SW}, acc.c1), "
        f"    'b0', array_append(acc.b0, acc.c1 + {_SW} < acc.c0), "
        f"    'b1', array_append(acc.b1, acc.c0 + {_SW} < acc.c1)))"
    )
    prevs = (
        "IF(acc.s = 1, "
        "IF(element_at(f.b1, CAST(t AS INT)), 0, 1), "
        "IF(element_at(f.b0, CAST(t AS INT)), 1, 0))"
    )
    bwd = (
        # single-element series have no backward steps (and Spark's
        # sequence(0, 1, -1) would error), hence the size guard
        "IF(size(ks) < 2, array(IF(f.c1 < f.c0, 1, 0)), "
        "aggregate("
        "  sequence(size(ks) - 1, 1, -1), "
        "  named_struct("
        "    's', IF(f.c1 < f.c0, 1, 0), "
        "    'path', array(IF(f.c1 < f.c0, 1, 0))), "
        "  (acc, t) -> named_struct("
        f"    's', {prevs}, "
        f"    'path', concat(array({prevs}), acc.path)), "
        "  acc -> acc.path))"
    )
    dec = ser.withColumn("f", F.expr(fwd)).withColumn(
        "path", F.expr(bwd)
    )
    z = dec.select(
        "event_type",
        _r6(F.col("lam")).alias("base_rate"),
        F.explode(
            F.arrays_zip(
                F.col("hrs").alias("hr"),
                F.col("ks").alias("n_events"),
                F.col("path").alias("burst_state"),
            )
        ).alias("z"),
    )
    return z.select(
        "event_type",
        F.col("z.hr").alias("hr"),
        F.col("z.n_events").alias("n_events"),
        "base_rate",
        F.col("z.burst_state").alias("burst_state"),
    ).orderBy("event_type", "hr")
