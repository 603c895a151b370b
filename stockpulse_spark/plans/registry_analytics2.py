"""Second analytics wave: cross-series finance statistics (rolling
correlation against the market, cross-sectional z-score/rank) and
corpus-statistics quality signals (unigram log-probability fluency,
out-of-vocabulary ratio).

Reference parity: the reference's dashboard is strictly per-symbol
(app/dashboard.py computes each indicator on one symbol's frame);
cross-series statistics are the first thing a quant user asks of a
warehouse that holds ALL symbols — and the LLM-data brief makes
corpus-level quality scoring first-class.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stockpulse_spark.plans.registry import (
    _BARS_CTE,
    _hourly_bars,
    _r6,
    _register,
    _t,
)

_W = "PARTITION BY user_id ORDER BY bucket_start"
_XS = "PARTITION BY bucket_start"


@_register(
    "rolling_corr20",
    oracle=_BARS_CTE
    + f"""
    , m AS (
      SELECT user_id, bucket_start, close,
             AVG(close) OVER ({_XS}) AS mkt
      FROM bars
    )
    SELECT user_id, bucket_start,
           -- total-corr restatement (functions/nullsafe.py corr_nn):
           -- a flat 20-bar frame is NULL, not Spark's ANSI raise
           ROUND(CASE WHEN COUNT(*) OVER w >= 20
                      THEN covar_pop(close, mkt) OVER w
                           / nullif((stddev_pop(close) OVER w)
                                    * (stddev_pop(mkt) OVER w), 0)
                 END, 6) AS corr20
    FROM m
    WINDOW w AS ({_W} ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    """,
    tags=("window", "indicator", "cross-series"),
    doc="Rolling 20-bar correlation of each series against the "
    "equal-weight market close. Two window partitionings are "
    "inherent (per-bucket market mean, then per-user trailing corr) "
    "= two exchanges; corr is a decomposable window aggregate "
    "(co-moment form) in both engines, and sample-vs-population "
    "normalization cancels in the ratio so there is no ddof trap. "
    "Strict min_periods like the SMA family.",
)
def q_rolling_corr20(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = _hourly_bars(spark, sf_dir).select("user_id", "bucket_start", "close")
    mkt = F.avg("close").over(Window.partitionBy("bucket_start"))
    m = bars.select("user_id", "bucket_start", "close", mkt.alias("mkt"))
    w = Window.partitionBy("user_id").orderBy("bucket_start").rowsBetween(-19, 0)
    # windowed twin of corr_nn: each co-moment over the same frame, so a
    # flat frame yields NULL instead of an ANSI DIVIDE_BY_ZERO (bars have
    # no NULL closes by the no-empty-bar contract, so no pairwise mask)
    total_corr = F.try_divide(
        F.covar_pop("close", "mkt").over(w),
        F.nullif(
            F.stddev_pop("close").over(w) * F.stddev_pop("mkt").over(w),
            F.lit(0.0),
        ),
    )
    c = F.when(F.count(F.lit(1)).over(w) >= 20, total_corr)
    return m.select("user_id", "bucket_start", _r6(c).alias("corr20"))


@_register(
    "cross_sectional_zscore",
    oracle=_BARS_CTE
    + f"""
    SELECT user_id, bucket_start,
           ROUND((close - AVG(close) OVER ({_XS}))
                 / NULLIF(stddev_samp(close) OVER ({_XS}), 0), 6) AS zscore,
           RANK() OVER ({_XS} ORDER BY close DESC) AS close_rank,
           COUNT(*) OVER ({_XS}) AS n_series
    FROM bars
    """,
    tags=("window", "cross-series"),
    doc="Cross-sectional normalization per bucket: z-score of each "
    "series' close against that hour's cross-series mean/stddev "
    "(sample stddev, zero-variance guarded to NULL) plus dense "
    "close rank — the cross-sectional-momentum building block. One "
    "partitioning (bucket_start) shared by all four window columns "
    "= one exchange; partition width is the series count, never "
    "history length, so it scales with the catalog not the data.",
)
def q_cross_sectional_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = _hourly_bars(spark, sf_dir).select("user_id", "bucket_start", "close")
    wx = Window.partitionBy("bucket_start")
    z = (F.col("close") - F.avg("close").over(wx)) / F.nullif(
        F.stddev_samp("close").over(wx), F.lit(0.0)
    )
    return bars.select(
        "user_id",
        "bucket_start",
        _r6(z).alias("zscore"),
        F.rank().over(wx.orderBy(F.col("close").desc())).alias("close_rank"),
        F.count(F.lit(1)).over(wx).alias("n_series"),
    )


@_register(
    "doc_unigram_logprob",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ), vocab AS (
      SELECT term, COUNT(*) AS cnt FROM toks GROUP BY term
    ), lp AS (
      SELECT term, ln(cnt / (SUM(cnt) OVER ())) AS logprob FROM vocab
    )
    SELECT t.doc_id,
           COUNT(*) AS n_tokens,
           ROUND(AVG(lp.logprob), 6) AS avg_logprob
    FROM toks t JOIN lp USING (term)
    GROUP BY t.doc_id
    ORDER BY t.doc_id
    """,
    tags=("llmdata", "text", "quality"),
    doc="Unigram language-model fluency score: each document's mean "
    "ln(corpus unigram probability) — the classic cheap perplexity "
    "proxy for quality filtering (low = rare-token gibberish). "
    "Corpus pass = one term-key shuffle into the vocabulary table. "
    "Heaps' law makes that vocabulary corpus-SUBLINEAR but NOT "
    "bounded (~1e8-1e9 distinct whitespace unigrams at 100 TB — "
    "URLs, typos, numbers), so nothing here may broadcast it: the "
    "corpus total is a 1-row scalar aggregate cross-joined back "
    "(broadcast of one row, not of the vocab), and the toks⋈lp "
    "equi-join on `term` is left UNHINTED — AQE broadcasts at test "
    "scale and degrades gracefully to a shuffle hash join on `term` "
    "at 100 TB, which is the scan-shaped plan this query wants.",
)
def q_doc_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    vocab = toks.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("_total"))
    lp = vocab.crossJoin(F.broadcast(total)).select(
        "term",
        F.log(F.col("cnt") / F.col("_total")).alias("logprob"),
    )
    return (
        toks.join(lp, "term")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            _r6(F.avg("logprob")).alias("avg_logprob"),
        )
        .orderBy("doc_id")
    )


@_register(
    "doc_oov_ratio",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ), vocab AS (
      SELECT term FROM (
        SELECT term, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, term) AS r
        FROM toks GROUP BY term
      ) WHERE r <= 30
    ), per_doc AS (
      SELECT t.doc_id,
             COUNT(*) AS n_tokens,
             SUM(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS n_oov
      FROM toks t LEFT JOIN vocab v ON t.term = v.term
      GROUP BY t.doc_id
    )
    SELECT d.source,
           COUNT(*) AS n_docs,
           ROUND(AVG(CAST(p.n_oov AS DOUBLE) / p.n_tokens), 6) AS avg_oov_ratio
    FROM per_doc p JOIN documents d USING (doc_id)
    GROUP BY d.source
    ORDER BY d.source
    """,
    tags=("llmdata", "text", "quality"),
    doc="Out-of-vocabulary ratio per source: share of tokens outside "
    "the top-30 corpus vocabulary (deterministic count-then-term "
    "tie-break), averaged by document source — the quality signal "
    "that flags sources drifting from the corpus register. Vocab "
    "top-k is a TakeOrdered over the vocabulary aggregate, then a "
    "broadcast LEFT join marks membership; everything else is "
    "partial-agg shuffles on doc_id/source.",
)
def q_doc_oov_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").select("doc_id", "text", "source")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    vocab = (
        toks.groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "term")
        .limit(30)
        .select("term", F.lit(True).alias("in_vocab"))
    )
    per_doc = (
        toks.join(F.broadcast(vocab), "term", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(
                F.when(F.col("in_vocab").isNull(), 1).otherwise(0)
            ).alias("n_oov"),
        )
    )
    return (
        per_doc.join(d.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            _r6(
                F.avg(F.col("n_oov").cast("double") / F.col("n_tokens"))
            ).alias("avg_oov_ratio"),
        )
        .orderBy("source")
    )


@_register(
    "doc_fluency_filter",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ), vocab AS (
      SELECT term, COUNT(*) AS cnt FROM toks GROUP BY term
    ), lp AS (
      SELECT term, ln(cnt / (SUM(cnt) OVER ())) AS logprob FROM vocab
    ), scored AS (
      SELECT t.doc_id, AVG(lp.logprob) AS avg_logprob
      FROM toks t JOIN lp USING (term) GROUP BY t.doc_id
    ), cut AS (
      SELECT quantile_cont(avg_logprob, 0.10) AS p10 FROM scored
    )
    SELECT s.doc_id,
           ROUND(s.avg_logprob, 6) AS avg_logprob,
           ROUND(c.p10, 6) AS threshold,
           s.avg_logprob >= c.p10 AS keep
    FROM scored s CROSS JOIN cut c
    """,
    tags=("llmdata", "text", "quality", "pipeline"),
    doc="CCNet/Gopher-style fluency filter: score each doc by mean "
    "corpus-unigram ln-probability (the cheap perplexity proxy), drop "
    "the bottom decile. The cutoff is a corpus exact percentile "
    "(percentile == DuckDB quantile_cont, proven by "
    "value_percentiles) computed over the doc-level score table — "
    "corpus-cardinality-sized, one extra tiny aggregation — then "
    "broadcast back as a 1-row literal join. The unigram vocabulary "
    "itself is Heaps'-law unbounded (1e8+ terms at 100 TB) so the "
    "toks⋈lp join carries NO broadcast hint (AQE picks broadcast at "
    "test scale, shuffle hash join at corpus scale) and the corpus "
    "total is a 1-row scalar agg cross-joined back, never a window "
    "over the vocabulary. Keeps the whole filter-decision path in "
    "one lazy plan: no driver loop, no second scan of the corpus.",
)
def q_doc_fluency_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    vocab = toks.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("_total"))
    lp = vocab.crossJoin(F.broadcast(total)).select(
        "term",
        F.log(F.col("cnt") / F.col("_total")).alias("logprob"),
    )
    scored = (
        toks.join(lp, "term")
        .groupBy("doc_id")
        .agg(F.avg("logprob").alias("avg_logprob"))
    )
    cut = scored.agg(
        F.expr("percentile(avg_logprob, 0.10)").alias("p10")
    )
    return scored.crossJoin(F.broadcast(cut)).select(
        "doc_id",
        _r6(F.col("avg_logprob")).alias("avg_logprob"),
        _r6(F.col("p10")).alias("threshold"),
        (F.col("avg_logprob") >= F.col("p10")).alias("keep"),
    )
