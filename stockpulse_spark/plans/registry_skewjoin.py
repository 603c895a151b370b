"""Salted skew JOIN — the classic rescue when a shuffle join's key is
skewed AND the dimension is too big to broadcast: replicate each dim
row across `_SALTS` salt values, give every fact row a deterministic
salt, and join on (key, salt) so one hot key's rows spread over
`_SALTS` reducers instead of one.

salted_event_type_stats already oracle-gates the salted AGGREGATION;
this gates the salted JOIN: the oracle is the PLAIN join (DuckDB
neither needs nor knows about the salt), so the hash match proves the
rewrite is result-identical — the property that makes the technique
safe to deploy. The Spark side pins a ShuffledHashJoin (broadcast
disabled via hint) with the salt in the join key, because on the
small test corpus Catalyst would otherwise broadcast the dim and
silently stop exercising the technique.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stockpulse_spark.functions.nullsafe import nan_nn
from stockpulse_spark.llmdata.hashing import word32_sql
from stockpulse_spark.plans.registry import _register, _t

_SALTS = 8


@_register(
    "salted_skew_join_stats",
    oracle="""
    WITH dim AS (
      SELECT user_id, COUNT(*) AS user_cnt
      FROM events GROUP BY user_id
    ), fact AS (
      SELECT event_id, user_id, event_type,
             CASE WHEN value IS NULL OR NOT isfinite(value) THEN NULL
                  ELSE CAST(round(value * 100) AS BIGINT) END AS cents
      FROM events
    )
    SELECT f.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT f.user_id) AS BIGINT) AS n_users,
           CAST(COALESCE(SUM(f.cents * d.user_cnt), 0) AS BIGINT)
             AS weighted_cents
    FROM fact f JOIN dim d USING (user_id)
    GROUP BY f.event_type
    ORDER BY f.event_type NULLS LAST
    """,
    tags=("warehouse", "join", "skew"),
    doc="Salted shuffle join, result-certified against the plain "
    f"join: the per-user dim is replicated x{_SALTS}, every fact row "
    "draws a deterministic md5 salt, and the join runs on "
    "(user_id, salt) as a ShuffledHashJoin (broadcast disabled via "
    "hint so the technique is actually exercised at test scale). "
    "The DuckDB oracle is the UNSALTED join — the hash match is the "
    "proof the rewrite changes the shuffle layout and nothing else. "
    "Deploy when AQE's skew handling can't help (e.g. the skew is in "
    "a key joined below an exchange AQE won't split); the dim "
    "replication cost is |dim| x salts rows, traded for hot-key "
    "parallelism of the fact side.",
)
def q_salted_skew_join_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    dim = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("user_cnt"))
        .select(
            "user_id",
            "user_cnt",
            F.explode(
                F.sequence(F.lit(0), F.lit(_SALTS - 1))
            ).alias("__salt"),
        )
    )
    fact = ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.when(
            nan_nn("value").isNotNull(),
            F.round(nan_nn("value") * 100).cast("bigint"),
        ).alias("cents"),
        (
            F.expr(word32_sql("CAST(event_id AS STRING)")) % _SALTS
        ).cast("int").alias("__salt"),
    )
    joined = fact.join(
        dim.hint("shuffle_hash"), ["user_id", "__salt"]
    )
    return (
        joined.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.coalesce(
                F.sum(F.col("cents") * F.col("user_cnt")), F.lit(0)
            ).alias("weighted_cents"),
        )
        .select(
            "event_type",
            F.col("n_events").cast("long").alias("n_events"),
            F.col("n_users").cast("long").alias("n_users"),
            F.col("weighted_cents").cast("long").alias("weighted_cents"),
        )
        .orderBy(F.col("event_type").asc_nulls_last())
    )
