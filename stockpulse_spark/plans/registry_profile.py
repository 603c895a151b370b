"""Corpus LM scoring, change detection, warehouse profiling, and
lead-lag screening — four operator families rounding out the curation
and monitoring surface.

- bigram LM fluency (the 2-gram upgrade of doc_unigram_logprob):
  conditional logprob ln(c(w1,w2)/c(w1)) averaged per document.
- CUSUM change detection on daily returns: the recursive
  max(0, acc+e) fold — pandas linear kernel on the Spark side,
  list_reduce closed form in the oracle (the EMA/Heikin-Ashi pattern).
- a column profiler over orders (null/distinct/min/max per column) —
  the warehouse health check every ingest pipeline schedules.
- lead-lag return correlation: corr(r_a[t], r_b[t-1]) across user
  pairs — the screen for series that PREDICT each other rather than
  co-move (pairwise_return_corr covers lag 0)."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from stockpulse_spark.functions.nullsafe import corr_nn
from stockpulse_spark.plans.registry import _r6, _register, _t
from stockpulse_spark.plans.registry_risk import (
    _LIQUID_CTE,
    _RETURNS_CTE,
    _daily_returns,
    _liquid_returns,
)


@_register(
    "doc_bigram_logprob",
    oracle="""
    WITH ws AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), bigrams AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(w)),
                                   i -> w[i] || ' ' || w[i+1])) AS bg
      FROM ws WHERE len(w) >= 2
    ), c2 AS (
      SELECT bg, COUNT(*) AS cnt2 FROM bigrams GROUP BY bg
    ), c1 AS (
      SELECT string_split(bg, ' ')[1] AS w1, SUM(cnt2) AS cnt1
      FROM c2 GROUP BY 1
    ), lp AS (
      SELECT c2.bg, ln(c2.cnt2 / c1.cnt1) AS logprob
      FROM c2 JOIN c1 ON string_split(c2.bg, ' ')[1] = c1.w1
    )
    SELECT b.doc_id,
           COUNT(*) AS n_bigrams,
           ROUND(AVG(lp.logprob), 6) AS avg_logprob
    FROM bigrams b JOIN lp ON b.bg = lp.bg
    GROUP BY b.doc_id ORDER BY b.doc_id
    """,
    tags=("llmdata", "text", "quality"),
    doc="bigram LM fluency score: mean ln P(w2|w1) per document with "
    "MLE conditionals trained on the corpus itself (c(w1,.) marginal "
    "derived FROM the bigram table so both sides count boundaries "
    "identically). Same scale shape as the unigram variant, and the "
    "same scale caveat amplified: the bigram vocabulary is "
    "corpus-sublinear but UNBOUNDED (1e9-1e10 distinct bigrams at "
    "100 TB — strictly larger than the unigram vocab), so neither "
    "the c2⋈c1 marginal join nor the corpus⋈lp scoring join carries "
    "a broadcast hint — both are plain equi-joins (on w1 / on the "
    "bigram key) that AQE broadcasts at test scale and shuffles at "
    "corpus scale.",
)
def q_doc_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    words = docs.select(
        "doc_id", F.split("text", " ").alias("w")
    ).filter(F.size("w") >= 2)
    bigrams = words.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(w) - 1), "
                "i -> concat(element_at(w, i), ' ', element_at(w, i + 1)))"
            )
        ).alias("bg"),
    )
    c2 = bigrams.groupBy("bg").agg(F.count(F.lit(1)).alias("cnt2"))
    c1 = c2.groupBy(
        F.split("bg", " ").getItem(0).alias("w1")
    ).agg(F.sum("cnt2").alias("cnt1"))
    lp = (
        c2.join(c1, F.split(c2.bg, " ").getItem(0) == c1.w1)
        .select("bg", F.log(F.col("cnt2") / F.col("cnt1")).alias("logprob"))
    )
    return (
        bigrams.join(lp, "bg")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            _r6(F.avg("logprob")).alias("avg_logprob"),
        )
        .orderBy("doc_id")
    )


_CUSUM_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("date", T.DateType()),
        T.StructField("cusum_up", T.DoubleType()),
        T.StructField("cusum_dn", T.DoubleType()),
    ]
)


def _cusum_batch_kernel(batches):
    """Optimization r11 (guide §4.2): one mapInPandas pass over
    JVM-collected per-series arrays instead of grouped-map
    applyInPandas — the per-GROUP machinery (Arrow batch + pandas
    frame + sort per series) was ~100x the recurrence arithmetic at
    these series lengths. Identical ndarray loop, same doubles."""
    import numpy as np
    import pandas as pd

    for pdf in batches:
        if len(pdf) == 0:
            continue
        uids = pdf["user_id"].to_numpy()
        dates = pdf["__dates"].to_numpy()
        rss = pdf["__rs"].to_numpy()
        out: dict[str, list] = {
            k: [] for k in ("user_id", "date", "cusum_up", "cusum_dn")
        }
        for i in range(len(pdf)):
            rs = np.asarray(rss[i], dtype=np.float64)
            n = len(rs)
            ups = np.empty(n)
            dns = np.empty(n)
            up, dn = 0.0, 0.0
            for t in range(n):
                up = max(0.0, up + rs[t])
                dn = max(0.0, dn - rs[t])
                ups[t] = up
                dns[t] = dn
            out["user_id"].append(np.repeat(uids[i], n))
            out["date"].append(np.asarray(dates[i]))
            out["cusum_up"].append(ups)
            out["cusum_dn"].append(dns)
        yield pd.DataFrame({k: np.concatenate(v) for k, v in out.items()})


@_register(
    "cusum_returns",
    oracle=_RETURNS_CTE
    + """
    , folded AS (
      SELECT user_id, date,
             list_reduce(
               list_prepend(0.0, list(r) OVER w),
               (acc, e) -> greatest(0.0, acc + e)) AS cusum_up,
             list_reduce(
               list_prepend(0.0, list(-r) OVER w),
               (acc, e) -> greatest(0.0, acc + e)) AS cusum_dn
      FROM rets
      WINDOW w AS (PARTITION BY user_id ORDER BY date
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, date,
           ROUND(cusum_up, 6) AS cusum_up,
           ROUND(cusum_dn, 6) AS cusum_dn
    FROM folded
    """,
    tags=("window", "risk", "kernel"),
    doc="one-sided CUSUM change detectors on daily returns (upward and "
    "downward drift accumulators, zero-floored): S[t]=max(0,S[t-1]+x). "
    "Recursive, so Spark runs the linear per-series pandas kernel; "
    "the oracle folds the identical recursion with a zero-seeded "
    "list_reduce. The streaming twin of this shape belongs in "
    "transformWithState (see streaming/transform_state.py).",
)
def q_cusum_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    rets = _daily_returns(spark, sf_dir)
    g = (
        rets.groupBy("user_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("date", "r"))).alias("__s")
        )
        # tiny-bytes frame: spread before the Python stage or AQE
        # coalesces the kernel to ~1 task
        .repartition(spark.sparkContext.defaultParallelism)
        .select(
            "user_id",
            F.expr("transform(__s, e -> e.date)").alias("__dates"),
            F.expr("transform(__s, e -> e.r)").alias("__rs"),
        )
    )
    out = g.mapInPandas(_cusum_batch_kernel, schema=_CUSUM_SCHEMA)
    return out.select(
        "user_id",
        "date",
        _r6(F.col("cusum_up")).alias("cusum_up"),
        _r6(F.col("cusum_dn")).alias("cusum_dn"),
    )


_PROFILE_NUMERIC = ("o_orderkey", "o_custkey", "o_totalprice")
_PROFILE_ALL = (
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
)


@_register(
    "table_profile_orders",
    oracle=" UNION ALL ".join(
        f"""
        SELECT '{c}' AS col_name,
               COUNT(*) AS n_rows,
               COUNT(*) - COUNT({c}) AS n_nulls,
               COUNT(DISTINCT {c}) AS n_distinct,
               {f"ROUND(CAST(MIN({c}) AS DOUBLE), 6)" if c in _PROFILE_NUMERIC else "CAST(NULL AS DOUBLE)"} AS min_num,
               {f"ROUND(CAST(MAX({c}) AS DOUBLE), 6)" if c in _PROFILE_NUMERIC else "CAST(NULL AS DOUBLE)"} AS max_num
        FROM orders
        """
        for c in _PROFILE_ALL
    )
    + " ORDER BY col_name",
    tags=("agg", "profiling"),
    doc="column profiler for the orders table: row/null/distinct "
    "counts per column, numeric min/max, one row per column. The "
    "Spark plan is ONE scan: a single wide aggregate computes every "
    "metric (multi-distinct via Catalyst's expand), then a stack() "
    "unpivot reshapes the one wide row — at 100 TB the table is read "
    "once, not once per column (the oracle's UNION ALL form is only "
    "the spec). The scheduled ingest health check of a warehouse.",
)
def q_table_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in _PROFILE_ALL:
        aggs.append(F.count(c).alias(f"cnt_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"nd_{c}"))
        if c in _PROFILE_NUMERIC:
            aggs.append(_r6(F.min(c).cast("double")).alias(f"mn_{c}"))
            aggs.append(_r6(F.max(c).cast("double")).alias(f"mx_{c}"))
    wide = o.agg(*aggs)
    stack_args = []
    for c in _PROFILE_ALL:
        num = c in _PROFILE_NUMERIC
        stack_args.append(
            f"'{c}', n_rows, n_rows - cnt_{c}, nd_{c}, "
            + (
                f"mn_{c}, mx_{c}"
                if num
                else "CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)"
            )
        )
    return wide.select(
        F.expr(
            f"stack({len(_PROFILE_ALL)}, "
            + ", ".join(stack_args)
            + ") AS (col_name, n_rows, n_nulls, n_distinct, min_num, max_num)"
        )
    ).orderBy("col_name")


@_register(
    "leadlag_return_corr",
    oracle=_RETURNS_CTE
    + _LIQUID_CTE
    + """
    SELECT a.user_id AS leader, b.user_id AS follower,
           COUNT(*) AS n_days,
           -- total-corr restatement (see functions/nullsafe.py corr_nn):
           -- NULL on a zero-variance side instead of Spark's ANSI raise
           ROUND(covar_pop(a.r, b.r)
                 / nullif(stddev_pop(a.r) * stddev_pop(b.r), 0), 6)
             AS leadlag_corr
    FROM lrets a
    JOIN lrets b ON b.date = a.date + INTERVAL 1 DAY
               AND a.user_id != b.user_id
    GROUP BY a.user_id, b.user_id
    HAVING COUNT(*) >= 20
    ORDER BY ABS(ROUND(covar_pop(a.r, b.r)
                       / nullif(stddev_pop(a.r) * stddev_pop(b.r), 0), 6))
             DESC NULLS LAST, leader, follower
    LIMIT 15
    """,
    tags=("join", "risk", "agg"),
    doc="lead-lag screen: correlation of user A's return on day t with "
    "user B's return on day t+1 (does A lead B?). Directional pairs "
    "(A,B) != (B,A); >= 20 overlapping days; top-15 by |corr|. Runs "
    "over the same top-100 liquidity prune as pairwise_return_corr — "
    "the stage that keeps the per-date pair expansion bounded at any "
    "series cardinality.",
)
def q_leadlag_return_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    rets = _liquid_returns(_daily_returns(spark, sf_dir))
    a = rets.alias("a")
    b = rets.alias("b")
    corr = F.round(corr_nn("a.r", "b.r"), 6)
    return (
        a.join(
            b,
            (F.col("b.date") == F.date_add(F.col("a.date"), 1))
            & (F.col("a.user_id") != F.col("b.user_id")),
        )
        .groupBy(
            F.col("a.user_id").alias("leader"),
            F.col("b.user_id").alias("follower"),
        )
        .agg(F.count(F.lit(1)).alias("n_days"), corr.alias("leadlag_corr"))
        .filter(F.col("n_days") >= 20)
        .orderBy(F.abs(F.col("leadlag_corr")).desc(), "leader", "follower")
        .limit(15)
    )
