"""Corpus novelty decay and classical seasonal decomposition — one
curation-ordering operator and one time-series structure operator.

`doc_ngram_novelty` measures, for each document in arrival (doc_id)
order, the share of its 5-gram shingles never seen in any earlier
document — the novelty curve dedup/sampling pipelines use to decide
when a source is exhausted. The global first-seen table is one shuffle
on the gram key (the decontamination_overlap shape).

`revenue_seasonal_decompose` is the additive trend/seasonal/residual
split on monthly revenue: centered 13-month moving average as trend,
month-of-year mean of the detrended series as the seasonal component.
Revenue snaps to integer cents before any window (the cohort-LTV
discipline)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stockpulse_spark.functions.nullsafe import nan_nn
from stockpulse_spark.plans.registry import _r4, _r6, _register, _t


@_register(
    "doc_ngram_novelty",
    oracle="""
    WITH ws AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), grams AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, len(w) - 3),
                    i -> array_to_string(w[i:i+4], ' '))) AS g
      FROM ws WHERE len(w) >= 5
    ), first_seen AS (
      SELECT g, MIN(doc_id) AS first_doc FROM grams GROUP BY g
    )
    SELECT gr.doc_id,
           COUNT(*) AS n_grams,
           CAST(SUM(CASE WHEN fs.first_doc = gr.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           ROUND(SUM(CASE WHEN fs.first_doc = gr.doc_id
                          THEN 1.0 ELSE 0.0 END) / COUNT(*), 6)
             AS novelty
    FROM grams gr JOIN first_seen fs ON gr.g = fs.g
    GROUP BY gr.doc_id ORDER BY gr.doc_id
    """,
    tags=("llmdata", "text", "dedup"),
    doc="novelty decay: per document (in doc_id arrival order), the "
    "fraction of its distinct 5-gram shingles first introduced by "
    "THIS document. first-seen is min(doc_id) per gram — one shuffle "
    "on the gram key with map-side combine; the re-join broadcasts "
    "nothing bigger than the gram table it already built. The curve "
    "every data-mixing pipeline reads to decide a source is mined "
    "out.",
)
def q_doc_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    words = docs.select(
        "doc_id", F.split("text", " ").alias("w")
    ).filter(F.size("w") >= 5)
    grams = words.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(w) - 4), "
                "i -> concat_ws(' ', slice(w, i, 5)))"
            )
        ).alias("g"),
    ).distinct()
    first_seen = grams.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    novel = F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
    return (
        grams.join(first_seen, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(novel).alias("n_novel"),
            _r6(
                F.sum(novel.cast("double")) / F.count(F.lit(1))
            ).alias("novelty"),
        )
        .orderBy("doc_id")
    )


@_register(
    "revenue_seasonal_decompose",
    oracle="""
    WITH monthly AS (
      -- date-less orders have no month on the axis; worse, a NULL m
      -- in the window ORDER BY is placed UNSTABLY by DuckDB's
      -- parallel window sort (flips ends run-to-run) and at the
      -- opposite end by Spark — excluded on both engines
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
             CAST(ROUND(SUM((CASE WHEN NOT isfinite(o_totalprice) THEN NULL ELSE o_totalprice END) * 100)) AS BIGINT) AS cents
      FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1
    ), trended AS (
      SELECT m, cents,
             CASE WHEN COUNT(*) OVER w = 13
                  THEN AVG(cents) OVER w END AS trend_cents
      FROM monthly
      WINDOW w AS (ORDER BY m ROWS BETWEEN 6 PRECEDING AND 6 FOLLOWING)
    ), detrended AS (
      SELECT m, cents, trend_cents,
             cents - trend_cents AS dt
      FROM trended
    ), seasonal AS (
      SELECT EXTRACT(month FROM m) AS moy, AVG(dt) AS s_cents
      FROM detrended WHERE dt IS NOT NULL GROUP BY 1
    )
    SELECT d.m AS month,
           ROUND(d.cents / 100.0, 4) AS revenue,
           ROUND(d.trend_cents / 100.0, 4) AS trend,
           ROUND(s.s_cents / 100.0, 4) AS seasonal,
           ROUND((d.dt - s.s_cents) / 100.0, 4) AS residual
    FROM detrended d
    JOIN seasonal s ON EXTRACT(month FROM d.m) = s.moy
    ORDER BY d.m
    """,
    tags=("window", "agg", "seasonal"),
    doc="additive seasonal decomposition of monthly revenue: trend = "
    "centered 13-month moving average (strict full window), seasonal "
    "= month-of-year mean of the detrended series, residual = the "
    "rest. Monthly revenue snaps to integer cents first, so the "
    "windows fold exact integers; the series itself is months-sized "
    "metadata after one fact shuffle.",
)
def q_revenue_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").isNotNull()
    )
    monthly = o.groupBy(
        F.trunc("o_orderdate", "month").alias("m")
    ).agg(
        F.round(F.sum(nan_nn("o_totalprice") * 100))
        .cast("bigint")
        .alias("cents")
    )
    w = Window.orderBy("m").rowsBetween(-6, 6)
    trended = monthly.select(
        "m",
        "cents",
        F.when(F.count(F.lit(1)).over(w) == 13, F.avg("cents").over(w)).alias(
            "trend_cents"
        ),
    )
    detrended = trended.withColumn(
        "dt", F.col("cents") - F.col("trend_cents")
    )
    seasonal = (
        detrended.filter(F.col("dt").isNotNull())
        .groupBy(F.month("m").alias("moy"))
        .agg(F.avg("dt").alias("s_cents"))
    )
    return (
        detrended.join(
            F.broadcast(seasonal), F.month("m") == F.col("moy")
        )
        .select(
            F.col("m").alias("month"),
            _r4(F.col("cents") / 100.0).alias("revenue"),
            _r4(F.col("trend_cents") / 100.0).alias("trend"),
            _r4(F.col("s_cents") / 100.0).alias("seasonal"),
            _r4((F.col("dt") - F.col("s_cents")) / 100.0).alias("residual"),
        )
        .orderBy("month")
    )


from stockpulse_spark.plans.registry import _BARS_CTE  # noqa: E402
from stockpulse_spark.plans.registry_indicators import _hourly_bars  # noqa: E402

_HW_ALPHA, _HW_BETA = 0.5, 0.3


@_register(
    "holt_linear_trend",
    oracle=_BARS_CTE.replace("WITH ", "WITH RECURSIVE ", 1)
    + f"""
    , bt AS (
      SELECT user_id, bucket_start, close,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY bucket_start) - 1 AS t,
             COUNT(*) OVER (PARTITION BY user_id) AS n
      FROM bars
    ), state AS (
      SELECT b0.user_id, 0 AS t, b0.close AS l,
             b1.close - b0.close AS b
      FROM bt b0 JOIN bt b1
        ON b0.user_id = b1.user_id AND b0.t = 0 AND b1.t = 1
      WHERE b0.n >= 2
      UNION ALL
      SELECT s.user_id, n.t,
             {_HW_ALPHA} * n.close + {1 - _HW_ALPHA} * (s.l + s.b),
             {_HW_BETA} * (({_HW_ALPHA} * n.close
                            + {1 - _HW_ALPHA} * (s.l + s.b)) - s.l)
               + {1 - _HW_BETA} * s.b
      FROM state s JOIN bt n
        ON n.user_id = s.user_id AND n.t = s.t + 1
    )
    SELECT bt.user_id, bt.bucket_start,
           ROUND(s.l, 6) AS level,
           ROUND(s.b, 6) AS trend,
           ROUND(s.l + s.b, 6) AS forecast
    FROM state s JOIN bt USING (user_id, t)
    """,
    tags=("window", "indicator", "forecast"),
    doc="Holt's double exponential smoothing (level + linear trend, "
    "alpha 0.5 / beta 0.3, classic init l0=y0, b0=y1-y0) per series "
    "over hourly bars, with the one-step-ahead forecast. A TWO-state "
    "recursion, so neither a window frame nor a scalar list_reduce "
    "can express it: the Spark side folds a named_struct accumulator "
    "with `aggregate` entirely in codegen (one shuffle, the same "
    "bounded-series contract as the MACD fold), and the oracle runs a "
    "LOCKSTEP RECURSIVE CTE — all series advance one step per "
    "iteration, depth = max series length. Scalar recursion means "
    "identical operation order in both engines, so values match "
    "bit-for-bit before rounding.",
)
def q_holt_linear_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = _hourly_bars(spark, sf_dir).select("user_id", "bucket_start", "close")
    a, b_ = _HW_ALPHA, _HW_BETA
    newl = f"{a!r} * x + {1 - a!r} * (acc.l + acc.b)"
    newb = f"{b_!r} * (({newl}) - acc.l) + {1 - b_!r} * acc.b"
    fold = (
        "aggregate("
        "  slice(s.close, 2, size(s.close) - 1), "
        "  named_struct("
        "    'l', CAST(s.close[0] AS DOUBLE), "
        "    'b', CAST(s.close[1] - s.close[0] AS DOUBLE), "
        "    'lev', array(CAST(s.close[0] AS DOUBLE)), "
        "    'tr', array(CAST(s.close[1] - s.close[0] AS DOUBLE))), "
        "  (acc, x) -> named_struct("
        f"    'l', {newl}, "
        f"    'b', {newb}, "
        f"    'lev', array_append(acc.lev, {newl}), "
        f"    'tr', array_append(acc.tr, {newb})))"
    )
    g = (
        bars.groupBy("user_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("bucket_start", "close"))
            ).alias("s")
        )
        .filter(F.size("s") >= 2)
        .withColumn("st", F.expr(fold))
    )
    z = g.select(
        "user_id",
        F.explode(
            F.arrays_zip(
                F.col("s"),
                F.col("st.lev").alias("level"),
                F.col("st.tr").alias("trend"),
            )
        ).alias("z"),
    )
    return z.select(
        "user_id",
        F.col("z.s.bucket_start").alias("bucket_start"),
        _r6(F.col("z.level")).alias("level"),
        _r6(F.col("z.trend")).alias("trend"),
        _r6(F.col("z.level") + F.col("z.trend")).alias("forecast"),
    )


_HW_M = 24          # daily seasonality over hourly bars
_HW_G = 0.2         # gamma (seasonal smoothing)


def _hw_fold_sql(a: float, b_: float, g: float, m: int) -> str:
    """The Spark-side Holt-Winters fold: a named_struct accumulator
    carrying (l, b, seasonal array, step counter, output arrays),
    advanced once per observation past the first season. Expressions
    are inlined (SQL lambdas bind no intermediates), so newl appears
    inside newb and news verbatim — identical scalar operation order
    to the oracle's recursive CTE."""
    sprev = f"element_at(acc.seas, pmod(acc.t, {m}) + 1)"
    newl = f"({a!r} * (x - {sprev}) + {1 - a!r} * (acc.l + acc.b))"
    newb = f"({b_!r} * ({newl} - acc.l) + {1 - b_!r} * acc.b)"
    news = f"({g!r} * (x - {newl}) + {1 - g!r} * {sprev})"
    fitted = f"((acc.l + acc.b) + {sprev})"
    l0 = f"(aggregate(slice(s.close, 1, {m}), CAST(0.0 AS DOUBLE), (a0, x0) -> a0 + x0) / {m})"
    seas0 = f"transform(slice(s.close, 1, {m}), x0 -> CAST(x0 AS DOUBLE) - {l0})"
    return (
        f"aggregate(slice(s.close, {m + 1}, size(s.close) - {m}), "
        f"named_struct("
        f"  'l', CAST({l0} AS DOUBLE), 'b', CAST(0.0 AS DOUBLE), "
        f"  'seas', {seas0}, 't', {m}, "
        f"  'lev', array()::array<double>, 'tr', array()::array<double>, "
        f"  'sv', array()::array<double>, 'fit', array()::array<double>), "
        f"(acc, x) -> named_struct("
        f"  'l', {newl}, 'b', {newb}, "
        f"  'seas', transform(acc.seas, (v2, i2) -> IF(i2 = pmod(acc.t, {m}), {news}, v2)), "
        f"  't', acc.t + 1, "
        f"  'lev', array_append(acc.lev, {newl}), "
        f"  'tr', array_append(acc.tr, {newb}), "
        f"  'sv', array_append(acc.sv, {news}), "
        f"  'fit', array_append(acc.fit, {fitted})))"
    )


def _hw_oracle(a: float, b_: float, g: float, m: int) -> str:
    # the observation being folded is n.t = s.t + 1; its seasonal slot
    # is (s.t + 1) % m — matching the Spark fold's pmod(acc.t, m)
    # (acc.t counts observations already processed, starting at m)
    sprev = f"s.seas[((s.t + 1) % {m}) + 1]"
    newl = f"({a!r} * (n.close - {sprev}) + {1 - a!r} * (s.l + s.b))"
    newb = f"({b_!r} * ({newl} - s.l) + {1 - b_!r} * s.b)"
    news = f"({g!r} * (n.close - {newl}) + {1 - g!r} * {sprev})"
    fitted = f"((s.l + s.b) + {sprev})"
    return (
        "\n    , bt AS ("
        "\n      SELECT user_id, bucket_start, close,"
        "\n             ROW_NUMBER() OVER (PARTITION BY user_id"
        "\n                                ORDER BY bucket_start) - 1 AS t,"
        "\n             COUNT(*) OVER (PARTITION BY user_id) AS n"
        "\n      FROM bars"
        "\n    ), init AS ("
        f"\n      SELECT user_id,"
        f"\n             list_reduce(list(close ORDER BY t), (a0, x0) -> a0 + x0) / {m} AS l0,"
        f"\n             list_transform(list(close ORDER BY t),"
        f"\n               x0 -> x0 - list_reduce(list(close ORDER BY t), (a1, x1) -> a1 + x1) / {m}) AS seas"
        f"\n      FROM bt WHERE t < {m}"
        f"\n      GROUP BY user_id"
        f"\n      HAVING COUNT(*) = {m}"
        "\n    ), state AS ("
        f"\n      SELECT user_id, {m} - 1 AS t, l0 AS l, 0.0::DOUBLE AS b,"
        "\n             seas, NULL::DOUBLE AS fitted, NULL::DOUBLE AS snew"
        "\n      FROM init"
        "\n      UNION ALL"
        f"\n      SELECT s.user_id, n.t, {newl}, {newb},"
        f"\n             list_transform(s.seas,"
        f"\n               (v2, i2) -> CASE WHEN i2 - 1 = (s.t + 1) % {m}"
        f"\n                                THEN {news} ELSE v2 END),"
        f"\n             {fitted}, {news}"
        "\n      FROM state s JOIN bt n"
        "\n        ON n.user_id = s.user_id AND n.t = s.t + 1"
        "\n    )"
    )


@_register(
    "holt_winters_additive",
    oracle=_BARS_CTE.replace("WITH ", "WITH RECURSIVE ", 1)
    + _hw_oracle(_HW_ALPHA, _HW_BETA, _HW_G, _HW_M)
    + f"""
    SELECT bt.user_id, bt.bucket_start,
           ROUND(s.l, 6) AS level,
           ROUND(s.b, 6) AS trend,
           ROUND(s.snew, 6) AS seasonal,
           ROUND(s.fitted, 6) AS fitted
    FROM state s JOIN bt USING (user_id, t)
    WHERE s.t >= {_HW_M}
    """,
    tags=("window", "indicator", "forecast", "iterative"),
    doc="Holt-Winters ADDITIVE triple smoothing (alpha 0.5, beta 0.3, "
    "gamma 0.2, period 24 = daily seasonality over hourly bars): "
    "level, trend, a 24-slot seasonal state array updated cyclically, "
    "and the in-sample one-step forecast (l+b+s_{t-m}). Init: l0 = "
    "mean of the first season (left-fold, same summation order both "
    "engines), b0 = 0, s_i = y_i - l0. THREE-variable recursion with "
    "ARRAY state: the Spark fold carries the seasonal array inside a "
    "named_struct accumulator and rewrites one slot per step with an "
    "indexed transform — all codegen, one shuffle; the oracle carries "
    "the same list through a lockstep recursive CTE. The hardest "
    "state shape any per-series kernel here uses; if the slot "
    "arithmetic, 0/1-based indexing, or operation order diverged "
    "anywhere, the bit-for-bit hash would fail.",
)
def q_holt_winters_additive(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = _hourly_bars(spark, sf_dir).select("user_id", "bucket_start", "close")
    m = _HW_M
    g = (
        bars.groupBy("user_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("bucket_start", "close"))
            ).alias("s")
        )
        .filter(F.size("s") > m)
        .withColumn(
            "st", F.expr(_hw_fold_sql(_HW_ALPHA, _HW_BETA, _HW_G, m))
        )
    )
    z = g.select(
        "user_id",
        F.slice(F.col("s"), m + 1, F.size("s") - m).alias("tail"),
        "st",
    ).select(
        "user_id",
        F.explode(
            F.arrays_zip(
                F.col("tail"),
                F.col("st.lev").alias("level"),
                F.col("st.tr").alias("trend"),
                F.col("st.sv").alias("seasonal"),
                F.col("st.fit").alias("fitted"),
            )
        ).alias("z"),
    )
    return z.select(
        "user_id",
        F.col("z.tail.bucket_start").alias("bucket_start"),
        _r6(F.col("z.level")).alias("level"),
        _r6(F.col("z.trend")).alias("trend"),
        _r6(F.col("z.seasonal")).alias("seasonal"),
        _r6(F.col("z.fitted")).alias("fitted"),
    )
