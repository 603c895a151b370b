"""Round-8b recommender wave: user-user collaborative-filtering
neighbor search (df-capped inverted index — the CF twin of the LSH
candidate machinery) and a time-split popularity-recommender
evaluation (hit-rate@k) — the retrieval/eval loop a personalization
pipeline runs on the warehouse tables.

Reference parity: outside the reference's indicator scope; extends
the engine the way the ANN/recall-eval family did — candidate
generation bounded at the source, evaluation as a driver-hashed
certificate.

Scale posture:
- the CF candidate join is an inverted index on part keys, df-capped
  at {cap}: a part held by B customers contributes <= B^2/2 pairs,
  so one hot item (everyone buys the bestseller) cannot turn the
  join quadratic — same guard as the LSH bucket cap.  On the
  scale-out axis (customers AND parts grow together) per-part df
  stays ~constant, so candidate volume grows linearly.
- min-support (>= 2 common parts) prunes the noise tail before the
  rank; per-customer top-3 is one bounded sort_array/slice
  aggregation (neighbor lists are df-cap-bounded), never a
  |customers|-task window.
- the popularity evaluation's model frame is 20 rows (top-k parts) —
  the one legitimately broadcast-hinted frame here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stockpulse_spark.plans.registry import _r6, _register, _t

_CF_DF_CAP = 64
_CF_MIN_COMMON = 2
_CF_TOPK = 3


@_register(
    "customer_cf_neighbors",
    oracle=f"""
    WITH baskets AS (
      SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ), sizes AS (
      SELECT c, CAST(COUNT(*) AS BIGINT) AS s FROM baskets GROUP BY c
    ), kept AS (
      SELECT b.c, b.p FROM baskets b
      JOIN (SELECT p FROM baskets GROUP BY p
            HAVING COUNT(*) <= {_CF_DF_CAP}) d ON b.p = d.p
    ), cand AS (
      SELECT a.c AS c1, b.c AS c2, CAST(COUNT(*) AS BIGINT) AS n_common
      FROM kept a JOIN kept b ON a.p = b.p AND a.c < b.c
      GROUP BY 1, 2 HAVING COUNT(*) >= {_CF_MIN_COMMON}
    ), sym AS (
      SELECT c1 AS customer, c2 AS neighbor, n_common FROM cand
      UNION ALL
      SELECT c2, c1, n_common FROM cand
    ), scored AS (
      SELECT b.customer, b.neighbor, b.n_common,
             b.n_common * 1.0 / (s1.s + s2.s - b.n_common) AS jaccard
      FROM sym b
      JOIN sizes s1 ON b.customer = s1.c
      JOIN sizes s2 ON b.neighbor = s2.c
    ), ranked AS (
      SELECT customer, neighbor, n_common, jaccard,
             ROW_NUMBER() OVER (PARTITION BY customer
                                ORDER BY jaccard DESC, neighbor) AS rank
      FROM scored
    )
    SELECT customer, CAST(rank AS BIGINT) AS rank, neighbor, n_common,
           ROUND(jaccard, 6) AS jaccard
    FROM ranked WHERE rank <= {_CF_TOPK}
    ORDER BY customer, rank
    """,
    tags=("recsys", "join", "topk"),
    doc=f"User-user collaborative-filtering neighbors: top-{_CF_TOPK} "
    "most-similar customers by Jaccard over purchased part sets, "
    f"via a part-keyed inverted index (df cap {_CF_DF_CAP} — a part "
    "everyone buys carries no similarity signal AND would make the "
    "index join quadratic; dropping it is both the statistical and "
    f"the scale fix), min-support {_CF_MIN_COMMON} common parts.  "
    "The neighbor-retrieval primitive behind user-based "
    "recommendation and look-alike audiences.  Shape: one part-key "
    "shuffle builds the index; candidates are equi-join + partial "
    "agg; per-customer top-k is ONE bounded aggregation (each kept "
    "part contributes <= cap-1 neighbors, so per-key state is "
    "O(cap x basket), never |customers| window tasks).  Ties break on (jaccard DESC, "
    "neighbor) and the jaccard doubles are identical across engines "
    "(exact-int ratios, one correctly-rounded divide).",
)
def q_customer_cf_neighbors(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    # pin the basket set once per invocation: it feeds the sizes pass
    # AND the df-capped index — unpinned, the lineitem⋈orders join +
    # distinct executed three times (optimization r11)
    baskets = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    sizes = baskets.groupBy("c").agg(F.count(F.lit(1)).alias("s"))
    # df-cap as ONE window count over the p exchange instead of
    # groupBy(p) + join-back (same §2.4 rewrite as the containment /
    # exact-Jaccard index): one shuffle of baskets, same rows out
    kept = (
        baskets.withColumn(
            "__df", F.count(F.lit(1)).over(Window.partitionBy("p"))
        )
        .filter(F.col("__df") <= _CF_DF_CAP)
        .drop("__df")
    )
    a = kept.select(F.col("c").alias("c1"), "p")
    b = kept.select(F.col("c").alias("c2"), "p")
    cand = (
        a.join(b, "p")
        .filter(F.col("c1") < F.col("c2"))
        .groupBy("c1", "c2")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .filter(F.col("n_common") >= _CF_MIN_COMMON)
    )
    both = cand.select(
        F.col("c1").alias("customer"),
        F.col("c2").alias("neighbor"),
        "n_common",
    ).unionAll(
        cand.select(
            F.col("c2").alias("customer"),
            F.col("c1").alias("neighbor"),
            "n_common",
        )
    )
    s1 = sizes.select(F.col("c").alias("customer"), F.col("s").alias("__s1"))
    s2 = sizes.select(F.col("c").alias("neighbor"), F.col("s").alias("__s2"))
    scored = (
        both.join(s1, "customer")
        .join(s2, "neighbor")
        .select(
            "customer",
            "neighbor",
            "n_common",
            (
                F.col("n_common")
                * 1.0
                / (F.col("__s1") + F.col("__s2") - F.col("n_common"))
            ).alias("jaccard"),
        )
    )
    # bounded per-customer top-k as ONE aggregation (optimization r12):
    # the grouped-global-rank machinery (range exchange + checkpoint +
    # window + offset join) is the right shape for UNBOUNDED groups,
    # but a customer's neighbor list is bounded by the df cap — each
    # kept part contributes <= cap-1 neighbors — so a sort_array +
    # slice over the per-customer collect is O(cap x basket) per-key
    # state and one hash exchange. Interleaved A/B at sf0.1:
    # 4.67 -> 3.94 s, identical 44803 rows. Ordering matches the
    # oracle's (jaccard DESC, neighbor): the sort key negates the
    # strictly-positive jaccard (no -0.0/NaN hazard — exact-int ratio,
    # n_common >= 2), neighbor breaks ties ascending.
    top = scored.groupBy("customer").agg(
        F.slice(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        (-F.col("jaccard")).alias("nj"),
                        F.col("neighbor").alias("neighbor"),
                        F.col("n_common").alias("n_common"),
                        F.col("jaccard").alias("jaccard"),
                    )
                )
            ),
            1,
            _CF_TOPK,
        ).alias("t")
    )
    return (
        top.select("customer", F.posexplode("t").alias("pos", "q"))
        .select(
            "customer",
            (F.col("pos") + 1).cast("bigint").alias("rank"),
            F.col("q.neighbor").alias("neighbor"),
            F.col("q.n_common").alias("n_common"),
            _r6(F.col("q.jaccard")).alias("jaccard"),
        )
        .orderBy("customer", "rank")
    )


_REC_TOPK = 20
_REC_HOLDOUT_DAYS = 90


@_register(
    "popularity_rec_hitrate",
    oracle=f"""
    WITH cut AS (
      SELECT MAX(o_orderdate) - INTERVAL '{_REC_HOLDOUT_DAYS}' DAY
               AS cutoff
      FROM orders
    ), purchases AS (
      SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p,
             o.o_orderdate >= cut.cutoff AS is_test
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      CROSS JOIN cut
    ), pop AS (
      SELECT p, CAST(COUNT(DISTINCT c) AS BIGINT) AS n_buyers
      FROM purchases WHERE NOT is_test GROUP BY p
      ORDER BY n_buyers DESC, p LIMIT {_REC_TOPK}
    ), test_c AS (
      SELECT c, CAST(COUNT(*) AS BIGINT) AS n_test_parts
      FROM purchases WHERE is_test GROUP BY c
    ), hits AS (
      SELECT pu.c, CAST(COUNT(*) AS BIGINT) AS n_hits
      FROM purchases pu JOIN pop ON pu.p = pop.p
      WHERE pu.is_test GROUP BY pu.c
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_test_customers,
           CAST(COALESCE(SUM(CASE WHEN h.n_hits > 0 THEN 1 ELSE 0 END),
                         0) AS BIGINT) AS n_hit_customers,
           CASE WHEN COUNT(*) > 0
                THEN ROUND(SUM(CASE WHEN h.n_hits > 0 THEN 1 ELSE 0 END)
                           * 1.0 / COUNT(*), 6) END
             AS hitrate_at_{_REC_TOPK},
           CASE WHEN COUNT(*) > 0
                THEN ROUND(SUM(COALESCE(h.n_hits, 0)) * 1.0 / COUNT(*),
                           6) END AS avg_hits
    FROM test_c t LEFT JOIN hits h ON t.c = h.c
    """,
    tags=("recsys", "evaluation"),
    doc=f"Time-split popularity-recommender evaluation: train on all "
    f"purchases before (max order date - {_REC_HOLDOUT_DAYS} days), "
    f"recommend the {_REC_TOPK} parts with the most distinct train "
    "buyers, and measure on the holdout: share of test-window "
    "customers who bought a recommended part (hit-rate@k) and mean "
    "hits per test customer — the baseline every personalized "
    "recommender must beat, as a driver-hashed certificate.  Scale "
    "shape: one (customer, part) dedup shuffle feeds both sides; "
    "the model is a TakeOrdered top-k (ties by part key) joined back "
    f"as a {_REC_TOPK}-row broadcast; the cutoff is a 1-row scalar "
    "cross-joined in.  Leakage-safe by construction: the model sees "
    "only pre-cutoff rows (point-in-time discipline, same contract "
    "as leakage_free_training_set).",
)
def q_popularity_rec_hitrate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    cut = o.agg(
        (
            F.max("o_orderdate")
            - F.expr(f"INTERVAL {_REC_HOLDOUT_DAYS} DAYS")
        ).alias("cutoff")
    )
    purchases = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .crossJoin(F.broadcast(cut))
        .select(
            F.col("o_custkey").alias("c"),
            F.col("l_partkey").alias("p"),
            (F.col("o_orderdate") >= F.col("cutoff")).alias("is_test"),
        )
        .distinct()
    )
    pop = (
        purchases.filter(~F.col("is_test"))
        .groupBy("p")
        .agg(F.countDistinct("c").alias("n_buyers"))
        .orderBy(F.desc("n_buyers"), "p")
        .limit(_REC_TOPK)
    )
    test_c = (
        purchases.filter(F.col("is_test"))
        .groupBy("c")
        .agg(F.count(F.lit(1)).alias("n_test_parts"))
    )
    hits = (
        purchases.filter(F.col("is_test"))
        .join(F.broadcast(pop.select("p")), "p")
        .groupBy("c")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    joined = test_c.join(hits, "c", "left")
    hit = F.when(F.col("n_hits") > 0, 1).otherwise(0)
    return joined.agg(
        F.count(F.lit(1)).alias("n_test_customers"),
        F.coalesce(F.sum(hit), F.lit(0))
        .cast("bigint")
        .alias("n_hit_customers"),
        F.coalesce(F.sum(F.coalesce("n_hits", F.lit(0))), F.lit(0)).alias(
            "__total_hits"
        ),
    ).select(
        "n_test_customers",
        "n_hit_customers",
        F.when(
            F.col("n_test_customers") > 0,
            _r6(
                F.col("n_hit_customers") * 1.0 / F.col("n_test_customers")
            ),
        ).alias(f"hitrate_at_{_REC_TOPK}"),
        F.when(
            F.col("n_test_customers") > 0,
            _r6(F.col("__total_hits") * 1.0 / F.col("n_test_customers")),
        ).alias("avg_hits"),
    )
