"""MMR (maximal marginal relevance) diversified top-k over the
embedding table.

Reference parity: the retrieval layer a training-data curator puts
between ANN candidates and the final sample — relevance alone returns
near-duplicates; MMR trades relevance against redundancy
(score = lam*rel - (1-lam)*max-sim-to-already-picked) so the k picks
cover the space. Greedy selection is inherently sequential in k, but
each of the k steps is a fully distributed scan: score every
remaining candidate against the (tiny, broadcast) picked set, take
the argmax with TakeOrderedAndProject. k is small by construction
(a sample page, not a table), so the k-step plan chain is bounded;
candidates never leave their partitions except through the k top-1
reductions. No driver-side collect anywhere — the picked set stays a
DataFrame and broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stockpulse_spark.functions.nullsafe import not_finite

from stockpulse_spark.llmdata.similarity import _as_double, dot, norm
from stockpulse_spark.plans.registry import _r6, _register, _t
from stockpulse_spark.plans.registry_ml import _d_cos

_K = 3
_LAM = 0.7


def _d_mmr_step(prev: str, sel_ids: str) -> str:
    """DuckDB CTE fragment: next greedy pick given selected-set CTE."""
    return f"""
      SELECT vec_id, e, rel, max_sim,
             {_LAM} * rel - {1 - _LAM} * max_sim AS mmr_score
      FROM (
        SELECT c.vec_id, c.e, c.rel,
               MAX({_d_cos('c.e', 's.e')}) AS max_sim
        FROM cand c, {prev} s
        WHERE c.vec_id NOT IN ({sel_ids})
        GROUP BY c.vec_id, c.e, c.rel
      )
      ORDER BY mmr_score DESC, vec_id LIMIT 1
    """


@_register(
    "mmr_diversified_topk",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
      WHERE embedding IS NULL OR len(list_filter(embedding, x -> NOT isfinite(x))) = 0
    ), q AS (
      SELECT e FROM v WHERE vec_id = 0
    ), cand AS (
      SELECT v.vec_id, v.e, {_d_cos('v.e', 'q.e')} AS rel
      FROM v, q WHERE v.vec_id > 0
    ), s1 AS (
      SELECT vec_id, e, rel, 0.0 AS max_sim, rel AS mmr_score
      FROM cand ORDER BY rel DESC, vec_id LIMIT 1
    ), s2 AS (
      {_d_mmr_step('s1', '(SELECT vec_id FROM s1)')}
    ), s12 AS (
      SELECT * FROM s1 UNION ALL SELECT * FROM s2
    ), s3 AS (
      {_d_mmr_step('s12', '(SELECT vec_id FROM s12)')}
    ), picks AS (
      SELECT 1 AS pick_order, * FROM s1
      UNION ALL SELECT 2, * FROM s2
      UNION ALL SELECT 3, * FROM s3
    )
    SELECT pick_order, vec_id,
           ROUND(rel, 6) AS relevance,
           ROUND(max_sim, 6) AS max_sim_prev,
           ROUND(mmr_score, 6) AS mmr_score
    FROM picks ORDER BY pick_order
    """,
    tags=("llmdata", "similarity"),
    doc=f"Greedy MMR top-{_K} (lam={_LAM}): query = embedding 0, "
    "candidates = the rest; pick argmax(lam*cosine-to-query - "
    "(1-lam)*max-cosine-to-picked) three times. Each step is one "
    "distributed scan + broadcast of the <=k picked rows + top-1 "
    "reduction; the sequential dependency is in k (tiny), never in "
    "the data. Cosines are sequential zip_with/aggregate folds over "
    "array<double>, bit-identical to DuckDB's list_reduce, so the "
    "greedy argmax chain stays deterministic across engines.",
)
def q_mmr_diversified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = _t(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNull()
        | ~F.exists("embedding", lambda x: not_finite(x))
    ).select(
        "vec_id", _as_double(F.col("embedding")).alias("e")
    )
    q = v.filter(F.col("vec_id") == 0).select(F.col("e").alias("qe"))
    cos = lambda a, b: dot(a, b) / (norm(a) * norm(b))  # noqa: E731
    cand = (
        v.filter(F.col("vec_id") > 0)
        .join(F.broadcast(q))
        .select("vec_id", "e", cos(F.col("e"), F.col("qe")).alias("rel"))
    )
    picked: DataFrame | None = None
    rows = []
    for step in range(1, _K + 1):
        if picked is None:
            nxt = (
                cand.select(
                    "vec_id",
                    "e",
                    "rel",
                    F.lit(0.0).alias("max_sim"),
                    F.col("rel").alias("mmr_score"),
                )
                .orderBy(F.col("rel").desc(), "vec_id")
                .limit(1)
            )
        else:
            sel = picked.select(
                F.col("vec_id").alias("s_id"), F.col("e").alias("s_e")
            )
            nxt = (
                cand.join(
                    F.broadcast(sel.select("s_id")),
                    cand.vec_id == F.col("s_id"),
                    "left_anti",
                )
                .join(F.broadcast(sel))
                .groupBy("vec_id", "e", "rel")
                .agg(F.max(cos(F.col("e"), F.col("s_e"))).alias("max_sim"))
                .select(
                    "vec_id",
                    "e",
                    "rel",
                    "max_sim",
                    (
                        _LAM * F.col("rel") - (1 - _LAM) * F.col("max_sim")
                    ).alias("mmr_score"),
                )
                .orderBy(F.col("mmr_score").desc(), "vec_id")
                .limit(1)
            )
        picked = nxt if picked is None else picked.unionAll(nxt)
        rows.append(nxt.select(F.lit(step).alias("pick_order"), "*"))
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out.select(
        "pick_order",
        "vec_id",
        _r6(F.col("rel")).alias("relevance"),
        _r6(F.col("max_sim")).alias("max_sim_prev"),
        _r6(F.col("mmr_score")).alias("mmr_score"),
    ).orderBy("pick_order")
