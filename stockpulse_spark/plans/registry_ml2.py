"""kNN classification over the embedding corpus and Heikin-Ashi
smoothed candles — two operators the reference's stack (pandas
indicator stage + a vector-less warehouse) cannot express at scale.

`embedding_knn_classify` composes the exact cosine top-k primitive
(llmdata/similarity.cosine_topk — broadcast queries, JVM fold, no
Python) with a majority vote; it is the standard label-propagation /
weak-supervision step in a training-data pipeline (label the unlabeled
split from its nearest labeled neighbors).

`heikin_ashi_daily` is a genuinely recursive series transform
(ha_open[t] depends on ha_open[t-1]) — the same class as EMA, so the
Spark side uses the linear per-series pandas kernel (one pass, Arrow
batched; the pattern functions/ema.py:93 established) while the
DuckDB oracle folds the closed form with list_reduce at oracle scale."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from stockpulse_spark.llmdata.similarity import cosine_topk
from stockpulse_spark.plans.registry import _r6, _register, _t
from stockpulse_spark.plans.registry_llmdata import _DOT_DUCK, _NORM_DUCK
from stockpulse_spark.plans.registry_risk import _DAILY_CTE, _daily_bars


@_register(
    "embedding_knn_classify",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings
    ), q AS (
      SELECT vec_id AS query_id, label AS true_label, e AS qv
      FROM v WHERE vec_id % 25 = 0
    ), c AS (
      SELECT vec_id AS neighbor_id, label, e AS cv FROM v
    ), scored AS (
      SELECT query_id, true_label, neighbor_id, label,
             {_DOT_DUCK} / ({_NORM_DUCK.format(v='qv')}
                            * {_NORM_DUCK.format(v='cv')}) AS cosine
      FROM q, c WHERE query_id != neighbor_id
    ), ranked AS (
      SELECT query_id, true_label, label, cosine,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, neighbor_id) AS rank
      FROM scored
    ), votes AS (
      SELECT query_id, true_label, label, COUNT(*) AS n_votes
      FROM ranked WHERE rank <= 10
      GROUP BY query_id, true_label, label
    ), best AS (
      SELECT query_id, true_label, label AS predicted_label, n_votes,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY n_votes DESC, label) AS vr
      FROM votes
    )
    SELECT query_id, true_label, predicted_label, n_votes
    FROM best WHERE vr = 1 ORDER BY query_id
    """,
    tags=("llmdata", "similarity", "ml"),
    doc="10-NN majority-vote label assignment per query vector (ties "
    "break to the smallest label): exact cosine top-k (broadcast "
    "query side, JVM fold) -> per-query vote count -> argmax. The "
    "weak-labeling step of a curation pipeline; at 100 TB swap the "
    "exact top-k for the SRP/IVF ANN variants registered alongside.",
)
def q_embedding_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 25 == 0)
    # spread the single-split corpus scan: 200 query vectors x the
    # whole corpus of interpreted cosine folds otherwise run in one
    # task (optimization r11; the spread is caller-side by design —
    # see cosine_topk)
    nn = cosine_topk(
        queries,
        emb.repartition(spark.sparkContext.defaultParallelism),
        k=10,
    )
    labels = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("label")
    )
    true = emb.select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("true_label"),
    )
    votes = (
        nn.join(labels, "neighbor_id")
        .groupBy("query_id", "label")
        .agg(F.count(F.lit(1)).alias("n_votes"))
    )
    from pyspark.sql import Window

    vr = F.row_number().over(
        Window.partitionBy("query_id").orderBy(
            F.desc("n_votes"), F.col("label")
        )
    )
    return (
        votes.withColumn("vr", vr)
        .filter(F.col("vr") == 1)
        .join(F.broadcast(true), "query_id")
        .select(
            "query_id",
            "true_label",
            F.col("label").alias("predicted_label"),
            "n_votes",
        )
        .orderBy("query_id")
    )


_HA_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("date", T.DateType()),
        T.StructField("ha_open", T.DoubleType()),
        T.StructField("ha_high", T.DoubleType()),
        T.StructField("ha_low", T.DoubleType()),
        T.StructField("ha_close", T.DoubleType()),
    ]
)


def _ha_batch_kernel(batches):
    """Optimization r11 (guide §4.2): the grouped-map applyInPandas
    form paid ~4 ms of per-GROUP machinery per series (Arrow batch +
    pandas frame + sort per group), 100x the arithmetic at daily-bar
    series lengths. One mapInPandas pass over JVM-collected per-series
    arrays runs the identical ndarray recurrence per series and
    re-explodes in Python — same rows, same doubles."""
    import numpy as np
    import pandas as pd

    for pdf in batches:
        if len(pdf) == 0:
            continue
        uids = pdf["user_id"].to_numpy()
        dates = pdf["__dates"].to_numpy()
        opens = pdf["__opens"].to_numpy()
        highs = pdf["__highs"].to_numpy()
        lows = pdf["__lows"].to_numpy()
        closes = pdf["__closes"].to_numpy()
        out: dict[str, list] = {
            k: []
            for k in (
                "user_id",
                "date",
                "ha_open",
                "ha_high",
                "ha_low",
                "ha_close",
            )
        }
        for i in range(len(pdf)):
            o = np.asarray(opens[i], dtype=np.float64)
            h = np.asarray(highs[i], dtype=np.float64)
            lo = np.asarray(lows[i], dtype=np.float64)
            c = np.asarray(closes[i], dtype=np.float64)
            hc = (o + h + lo + c) / 4.0
            n = len(hc)
            ho = np.empty(n)
            prev_open = (o[0] + c[0]) / 2.0
            for t in range(n):
                ho[t] = prev_open
                prev_open = (prev_open + hc[t]) / 2.0
            out["user_id"].append(np.repeat(uids[i], n))
            out["date"].append(np.asarray(dates[i]))
            out["ha_open"].append(ho)
            out["ha_high"].append(np.maximum(h, np.maximum(ho, hc)))
            out["ha_low"].append(np.minimum(lo, np.minimum(ho, hc)))
            out["ha_close"].append(hc)
        yield pd.DataFrame({k: np.concatenate(v) for k, v in out.items()})


@_register(
    "heikin_ashi_daily",
    oracle=_DAILY_CTE
    + """
    , hc AS (
      SELECT user_id, date, open, high, low,
             (open + high + low + close) / 4.0 AS ha_close,
             first_value((open + close) / 2.0) OVER w0 AS seed,
             list(((open + high + low + close) / 4.0)) OVER (
               PARTITION BY user_id ORDER BY date
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS prior_hc
      FROM daily
      WINDOW w0 AS (PARTITION BY user_id ORDER BY date)
    ), ha AS (
      SELECT user_id, date, high, low, ha_close,
             CASE WHEN prior_hc IS NULL OR len(prior_hc) = 0 THEN seed
                  ELSE list_reduce(list_prepend(seed, prior_hc),
                                   (acc, e) -> (acc + e) / 2.0)
             END AS ha_open
      FROM hc
    )
    SELECT user_id, date,
           ROUND(ha_open, 6) AS ha_open,
           ROUND(GREATEST(high, ha_open, ha_close), 6) AS ha_high,
           ROUND(LEAST(low, ha_open, ha_close), 6) AS ha_low,
           ROUND(ha_close, 6) AS ha_close
    FROM ha
    """,
    tags=("window", "indicator", "kernel"),
    doc="Heikin-Ashi smoothed candles on daily bars: ha_close is the "
    "OHLC mean, ha_open the recursion (prev_ha_open+prev_ha_close)/2 "
    "seeded at (open+close)/2. Recursive like EMA, so the Spark side "
    "is the linear one-pass per-series pandas kernel (Arrow batched, "
    "O(n) — the add_ema pattern); the oracle folds the same recursion "
    "with list_reduce, O(n^2) but only ever run at oracle scale.",
)
def q_heikin_ashi_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = _daily_bars(spark, sf_dir)
    g = (
        bars.groupBy("user_id")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct("date", "open", "high", "low", "close")
                )
            ).alias("__s")
        )
        # tiny-bytes frame: spread before the Python stage or AQE
        # coalesces the kernel to ~1 task
        .repartition(spark.sparkContext.defaultParallelism)
        .select(
            "user_id",
            F.expr("transform(__s, e -> e.date)").alias("__dates"),
            F.expr("transform(__s, e -> e.open)").alias("__opens"),
            F.expr("transform(__s, e -> e.high)").alias("__highs"),
            F.expr("transform(__s, e -> e.low)").alias("__lows"),
            F.expr("transform(__s, e -> e.close)").alias("__closes"),
        )
    )
    ha = g.mapInPandas(_ha_batch_kernel, schema=_HA_SCHEMA)
    return ha.select(
        "user_id",
        "date",
        _r6(F.col("ha_open")).alias("ha_open"),
        _r6(F.col("ha_high")).alias("ha_high"),
        _r6(F.col("ha_low")).alias("ha_low"),
        _r6(F.col("ha_close")).alias("ha_close"),
    )


@_register(
    "embedding_power_iteration",
    oracle="""
    WITH v AS (
      SELECT embedding::DOUBLE[] AS e FROM embeddings
    ), g AS (
      SELECT i.i AS i, j.j AS j, ROUND(SUM(v.e[i.i] * v.e[j.j]), 6) AS gv
      FROM v, range(1, 65) i(i), range(1, 65) j(j)
      GROUP BY i.i, j.j
    ), v1_raw AS (
      SELECT i, SUM(gv) AS x FROM g GROUP BY i
    ), v1 AS (
      SELECT i, ROUND(x / sqrt(SUM(x * x) OVER ()), 6) AS x FROM v1_raw
    ), v2_raw AS (
      SELECT g.i, SUM(g.gv * v1.x) AS x
      FROM g JOIN v1 ON g.j = v1.i GROUP BY g.i
    )
    SELECT i AS dim_idx,
           ROUND(x / sqrt(SUM(x * x) OVER ()), 6) AS eigvec
    FROM v2_raw ORDER BY dim_idx
    """,
    tags=("llmdata", "ml", "iterative"),
    doc="top principal direction of the embedding corpus by two power "
    "iterations on the Gram matrix: G accumulates distributedly "
    "(per-row outer products -> one shuffle into a 64x64 cell table, "
    "map-side combined), then each iteration is a 64-row join+agg — "
    "NO collect, the whole loop stays in the plan. G cells and the "
    "normalized vectors are 6dp-snapped on both sides so the "
    "fold-order of float sums cannot leak into the hash (the "
    "rolling_beta20 boundary-amplification fix). At 100 TB G stays "
    "DIMS^2-sized while the corpus grows; more iterations are more "
    "metadata-joins, exactly how kmeans_lloyd_2iter scales.",
)
def q_embedding_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Spread the scan before the 64x64 outer-product explode
    # (optimization r11, the PQ/matryoshka class): the embeddings scan
    # is one parquet split, so the 4096x row multiply otherwise runs
    # in a single task. G is a sum — partition-independent — and its
    # cells are 6dp-snapped before any downstream use.
    emb = (
        _t(spark, sf_dir, "embeddings")
        .select(F.col("embedding").cast("array<double>").alias("e"))
        .repartition(spark.sparkContext.defaultParallelism)
    )
    cells = emb.select(
        F.explode(
            F.expr(
                "flatten(transform(e, (x, i) -> "
                "transform(e, (y, j) -> "
                "struct(i + 1 AS i, j + 1 AS j, x * y AS p))))"
            )
        ).alias("c")
    ).select("c.i", "c.j", "c.p")
    g = cells.groupBy("i", "j").agg(_r6(F.sum("p")).alias("gv"))

    def normalize(df: DataFrame, col: str) -> DataFrame:
        w = Window.partitionBy()
        return df.select(
            "i",
            _r6(
                F.col(col) / F.sqrt(F.sum(F.col(col) * F.col(col)).over(w))
            ).alias("x"),
        )

    from pyspark.sql import Window

    v1 = normalize(
        g.groupBy("i").agg(F.sum("gv").alias("x")), "x"
    )
    v2_raw = (
        g.join(
            F.broadcast(v1.select(F.col("i").alias("j"), "x")), "j"
        )
        .groupBy("i")
        .agg(F.sum(F.col("gv") * F.col("x")).alias("x"))
    )
    w = Window.partitionBy()
    return v2_raw.select(
        F.col("i").alias("dim_idx"),
        _r6(
            F.col("x") / F.sqrt(F.sum(F.col("x") * F.col("x")).over(w))
        ).alias("eigvec"),
    ).orderBy("dim_idx")
