"""Audience overlap via mergeable-sketch inclusion-exclusion — the
100 TB answer to "how many users do segments A and B share?" when the
key universe is too large to intersect exactly: |A∩B| ≈ hll(A) +
hll(B) − hll(A∪B), three constant-size sketches instead of a shuffle
of every distinct key.

Self-certification follows distinct_users_approx: HLL register values
are implementation-defined so the ESTIMATE can't hash-match across
engines — but the exact overlap (computed in the same plan, the twin
the estimate replaces at scale) and the error-bound BOOLEAN can. The
inclusion-exclusion envelope is three sketch errors wide, so the
certified bound is 15·rsd·|A∪B| + 2 (absolute slack covers
integer-rounded estimates on tiny segments, where HLL is exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stockpulse_spark.plans.registry import _register, _t

_RSD = 0.02
_K = 15  # inclusion-exclusion bound multiplier (3 sketches wide)


@_register(
    "audience_overlap_sketch",
    oracle="""
    WITH du AS (
      SELECT DISTINCT event_type, user_id FROM events
      WHERE event_type IS NOT NULL AND user_id IS NOT NULL
    ), ex AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             COUNT(*) AS exact_overlap
      FROM du a JOIN du b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    ), un AS (
      SELECT e.type_a, e.type_b, COUNT(DISTINCT d.user_id) AS exact_union
      FROM ex e JOIN du d
        ON d.event_type IN (e.type_a, e.type_b)
      GROUP BY 1, 2
    )
    SELECT e.type_a, e.type_b,
           CAST(e.exact_overlap AS BIGINT) AS exact_overlap,
           CAST(u.exact_union AS BIGINT) AS exact_union,
           TRUE AS sketch_within_bound
    FROM ex e JOIN un u
      ON u.type_a = e.type_a AND u.type_b = e.type_b
    ORDER BY e.type_a, e.type_b
    """,
    tags=("agg", "approx", "sketch"),
    doc="Segment-overlap estimation by HLL inclusion-exclusion "
    "(rsd=2%): |A∩B| ≈ est(A)+est(B)−est(A∪B) — three mergeable "
    "KB-sized sketches per pair where the exact form shuffles every "
    "distinct key. The exact overlap and union are computed in the "
    "same plan purely to CERTIFY the estimate: the driver hashes the "
    "exact values plus the boolean |est−exact| ≤ 15·rsd·|A∪B|+2 "
    "(three sketch errors wide, absolute slack for tiny segments "
    "where HLL is exact). Pairs come from the overlap join itself, "
    "so zero-overlap pairs are absent on both engines identically.",
)
def q_audience_overlap_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    # pin once per invocation: the distinct (type, user) frame is read
    # on FOUR plan branches (both overlap self-join sides, the
    # per-type sketch, and the pairwise union pass) — unpinned, the
    # events scan + distinct shuffle executed 4x (optimization r11)
    du = (
        _t(spark, sf_dir, "events")
        .filter(
            F.col("event_type").isNotNull() & F.col("user_id").isNotNull()
        )
        .select("event_type", "user_id")
        .distinct()
        .localCheckpoint(eager=False)
    )
    a = du.select(
        F.col("event_type").alias("type_a"), F.col("user_id").alias("u")
    )
    b = du.select(
        F.col("event_type").alias("type_b"), F.col("user_id").alias("u")
    )
    ex = (
        a.join(b, "u")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("exact_overlap"))
    )
    per_type = du.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", _RSD).alias("est_t"),
    )
    pairs = ex.select("type_a", "type_b")
    un = (
        du.join(
            F.broadcast(pairs),
            (F.col("event_type") == F.col("type_a"))
            | (F.col("event_type") == F.col("type_b")),
        )
        .groupBy("type_a", "type_b")
        .agg(
            F.approx_count_distinct("user_id", _RSD).alias("est_u"),
            F.count_distinct("user_id").alias("exact_union"),
        )
    )
    ea = per_type.select(
        F.col("event_type").alias("type_a"), F.col("est_t").alias("est_a")
    )
    eb = per_type.select(
        F.col("event_type").alias("type_b"), F.col("est_t").alias("est_b")
    )
    est_inter = F.col("est_a") + F.col("est_b") - F.col("est_u")
    ok = (
        F.abs(est_inter - F.col("exact_overlap"))
        <= _K * _RSD * F.col("exact_union") + 2
    )
    return (
        ex.join(un, ["type_a", "type_b"])
        .join(F.broadcast(ea), "type_a")
        .join(F.broadcast(eb), "type_b")
        .select(
            "type_a",
            "type_b",
            F.col("exact_overlap").cast("long").alias("exact_overlap"),
            F.col("exact_union").cast("long").alias("exact_union"),
            ok.alias("sketch_within_bound"),
        )
        .orderBy("type_a", "type_b")
    )
