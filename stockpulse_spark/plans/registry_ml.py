"""Distributed-ML and monitoring shapes: a two-step Lloyd (k-means)
iteration as pure DataFrame ops, per-type hourly tail percentiles, and
per-document word-entropy quality scoring.

The k-means step is the second iterative-algorithm pattern in the repo
(after label-propagation connected components): assign -> dim-wise
recompute -> reassign, each iteration two shuffles (one broadcast-
assignment, one (cid, dim)-keyed mean), centroids snapped to 6
decimals between iterations so both engines feed bit-identical
centroids into the next assignment. At 100 TB the centroid table stays
K x dims (KBs) and broadcasts; members never leave their partitions
except through the dim-wise partial-agg shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stockpulse_spark.functions.nullsafe import max_by_nn, min_by_nn, nan_nn, not_finite

from stockpulse_spark.llmdata.similarity import _as_double, dot, norm
from stockpulse_spark.plans.registry import _r6, _register, _t

_K = 8
_DIMS = 64
# DuckDB fragments (1-indexed lists)
_D_DOT = (
    "list_reduce(list_transform(range(1, {n}), i -> {a}[i] * {b}[i]),"
    " (x, y) -> x + y)"
)
_D_NORM = "sqrt(" + _D_DOT + ")"


def _d_cos(a: str, b: str) -> str:
    n = _DIMS + 1
    return (
        _D_DOT.format(n=n, a=a, b=b)
        + " / ("
        + _D_NORM.format(n=n, a=a, b=a)
        + " * "
        + _D_NORM.format(n=n, a=b, b=b)
        + ")"
    )


@_register(
    "kmeans_lloyd_2iter",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
      WHERE embedding IS NULL OR len(list_filter(embedding, x -> NOT isfinite(x))) = 0
    ), c0 AS (
      SELECT vec_id AS cid, e AS c FROM v WHERE vec_id < {_K}
    ), a1 AS (
      SELECT vec_id, e, cid,
             ROW_NUMBER() OVER (PARTITION BY vec_id
               ORDER BY {_d_cos('e', 'c')} DESC, cid) AS rn
      FROM v, c0
    ), m1 AS (SELECT vec_id, e, cid FROM a1 WHERE rn = 1),
    c1 AS (
      -- no WITH ORDINALITY in DuckDB: index the list with a lateral range
      SELECT cid, list(mu ORDER BY pos) AS c FROM (
        SELECT cid, t.i AS pos, ROUND(AVG(e[t.i]), 6) AS mu
        FROM m1, range(1, {_DIMS + 1}) AS t(i)
        GROUP BY cid, t.i
      ) GROUP BY cid
    ), a2 AS (
      SELECT vec_id, e, cid,
             {_d_cos('e', 'c')} AS cos_c,
             ROW_NUMBER() OVER (PARTITION BY vec_id
               ORDER BY {_d_cos('e', 'c')} DESC, cid) AS rn
      FROM v, c1
    )
    SELECT cid, COUNT(*) AS n_members,
           ROUND(AVG(cos_c), 6) AS avg_cos,
           ROUND(MIN(cos_c), 6) AS min_cos
    FROM a2 WHERE rn = 1
    GROUP BY cid ORDER BY cid
    """,
    tags=("llmdata", "similarity", "iterative"),
    doc="One full Lloyd refinement of a k-means clustering (K=8, "
    "cosine assignment, deterministic first-K init like the IVF "
    "query): assign -> dim-wise centroid mean -> reassign, reporting "
    "per-cluster size and cohesion. Each iteration = one broadcast "
    "centroid join + one (cid, dim) partial-agg shuffle; centroids "
    "are ROUNDED to 6 decimals between iterations on BOTH engines so "
    "cross-engine float drift in the dim-wise sums cannot flip an "
    "assignment at a cluster boundary. The pattern generalizes to "
    "trained IVF centroids and any fixed-iteration Lloyd loop.",
)
def q_kmeans_lloyd_2iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = (
        _t(spark, sf_dir, "embeddings")
        .filter(
            F.col("embedding").isNull()
        | ~F.exists("embedding", lambda x: not_finite(x))
        )
        .repartition(spark.sparkContext.defaultParallelism)
        .select("vec_id", _as_double(F.col("embedding")).alias("e"))
        # per-vector norm folded ONCE (optimization r11, srp_lsh_topk
        # pattern): the fold is an interpreted HOF and the old shape
        # re-folded it per (vector x centroid) candidate in BOTH Lloyd
        # iterations. Same doubles through the same division.
        .withColumn("en", norm(F.col("e")))
    )
    c0 = v.filter(F.col("vec_id") < _K).select(
        F.col("vec_id").alias("cid"),
        F.col("e").alias("c"),
        F.col("en").alias("cn"),
    )

    def assign(vecs: DataFrame, cents: DataFrame) -> DataFrame:
        cos = dot(F.col("e"), F.col("c")) / (F.col("en") * F.col("cn"))
        w = Window.partitionBy("vec_id").orderBy(F.col("cos_c").desc(), "cid")
        return (
            vecs.crossJoin(F.broadcast(cents))
            .select("vec_id", "e", "en", "cid", cos.alias("cos_c"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )

    m1 = assign(v, c0)
    c1 = (
        m1.select("cid", F.posexplode("e").alias("pos", "val"))
        .groupBy("cid", "pos")
        .agg(_r6(F.avg("val")).alias("mu"))
        .groupBy("cid")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "mu"))),
                lambda s: s.getField("mu"),
            ).alias("c")
        )
        .withColumn("cn", norm(F.col("c")))
    )
    a2 = assign(v, c1)
    return (
        a2.groupBy("cid")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            _r6(F.avg("cos_c")).alias("avg_cos"),
            _r6(F.min("cos_c")).alias("min_cos"),
        )
        .orderBy("cid")
    )


@_register(
    "hourly_p95_by_type",
    oracle="""
    SELECT event_type, CAST(hour(ts) AS INTEGER) AS hour_of_day,
           COUNT(*) AS n,
           ROUND(quantile_cont(CASE WHEN NOT isfinite(value) THEN NULL
                               ELSE value END, 0.95), 6) AS p95,
           ROUND(quantile_cont(CASE WHEN NOT isfinite(value) THEN NULL
                               ELSE value END, 0.99), 6) AS p99
    FROM events
    GROUP BY event_type, hour(ts)
    ORDER BY event_type, hour_of_day
    """,
    tags=("agg", "percentile"),
    doc="Tail percentiles per (event type, hour of day) — the ops "
    "monitoring cut (p95/p99 latency boards). Exact continuous "
    "percentiles (Spark percentile == DuckDB quantile_cont, the "
    "pinned pairing from value_percentiles); one shuffle of at most "
    "|types| x 24 groups. The 100 TB variant swaps in "
    "percentile_approx exactly as value_percentiles_approx does.",
)
def q_hourly_p95_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type", F.hour("ts").cast("int").alias("hour_of_day"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            _r6(
                F.percentile(nan_nn("value"), F.lit(0.95))
            ).alias("p95"),
            _r6(
                F.percentile(nan_nn("value"), F.lit(0.99))
            ).alias("p99"),
        )
        .orderBy("event_type", "hour_of_day")
    )


@_register(
    "doc_word_entropy",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ), tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
    ), n AS (
      SELECT doc_id, SUM(tf) AS n_tokens FROM tf GROUP BY doc_id
    )
    SELECT tf.doc_id,
           CAST(n.n_tokens AS BIGINT) AS n_tokens,
           -- + 0.0 canonicalizes the single-token doc's -0.0
           -- (-(1*ln 1)) to +0.0 on both engines
           ROUND(-SUM((tf.tf / n.n_tokens) * ln(tf.tf / n.n_tokens)) + 0.0, 6)
             AS word_entropy
    FROM tf JOIN n USING (doc_id)
    GROUP BY tf.doc_id, n.n_tokens
    ORDER BY tf.doc_id
    """,
    tags=("llmdata", "text", "quality"),
    doc="Shannon entropy of each document's word distribution — low "
    "entropy flags repetitive/boilerplate text that length and "
    "stopword ratios miss; complements unigram logprob (which scores "
    "against the CORPUS, entropy scores against the DOC ITSELF). Two "
    "partial-agg shuffles on (doc, term) then doc; no corpus-wide "
    "state at all, so it scales embarrassingly.",
)
def q_doc_word_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    tf = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    wn = Window.partitionBy("doc_id")
    # window sum named once (doc total feeds both n_tokens and p)
    t2 = tf.select(
        "doc_id", "tf", F.sum("tf").over(wn).alias("n_tokens")
    )
    p = (F.col("tf") / F.col("n_tokens")).alias("p")
    return (
        t2.select("doc_id", "n_tokens", p)
        .groupBy("doc_id", "n_tokens")
        .agg(
            _r6(-F.sum(F.col("p") * F.log("p")) + 0.0).alias("word_entropy")
        )
        .select("doc_id", F.col("n_tokens").cast("long").alias("n_tokens"), "word_entropy")
        .orderBy("doc_id")
    )


@_register(
    "ohlcv_daily_from_hourly",
    oracle="""
    -- the oracle aggregates DIRECTLY from raw events: passing proves
    -- the hourly->daily reaggregation algebra loses nothing. Under
    -- the no-empty-bar contract, rows in all-NULL hours carry no
    -- volume (their hour forms no bar) and all-empty days form no
    -- row; o/h/l/c are unaffected because arg_min/arg_max/min/max
    -- skip NULLs anyway.
    WITH he AS (
      -- nv counts REAL prices: NULL and NaN ticks alike form no bar
      -- (the _BARS_CTE NaN-mask contract)
      SELECT user_id, date_trunc('hour', ts) AS h,
             COUNT(CASE WHEN isfinite(value) THEN value END) AS nv
      FROM events GROUP BY 1, 2
    )
    SELECT e.user_id, CAST(date_trunc('day', e.ts) AS TIMESTAMP) AS day,
           ROUND(first(e.value ORDER BY e.ts, e.value) FILTER (WHERE e.value IS NOT NULL AND isfinite(e.value)), 6) AS open,
           ROUND(max(e.value) FILTER (WHERE isfinite(e.value)), 6)           AS high,
           ROUND(min(e.value) FILTER (WHERE isfinite(e.value)), 6)           AS low,
           ROUND(last(e.value ORDER BY e.ts, e.value) FILTER (WHERE e.value IS NOT NULL AND isfinite(e.value)), 6) AS close,
           COUNT(*) FILTER (WHERE he.nv > 0) AS volume
    FROM events e
    JOIN he ON e.user_id = he.user_id AND date_trunc('hour', e.ts) = he.h
    GROUP BY e.user_id, date_trunc('day', e.ts)
    HAVING COUNT(CASE WHEN isfinite(e.value) THEN e.value END) > 0
    ORDER BY e.user_id, day
    """,
    tags=("agg", "resample", "rollup"),
    doc="Continuous-aggregate rollup reuse: daily OHLCV computed FROM "
    "THE HOURLY BARS (open = open of first hour via min_by on "
    "bucket_start, high = max of highs, volume = sum of volumes), "
    "while the oracle aggregates directly from raw ticks — equality "
    "proves the reaggregation algebra, which is what lets a "
    "hypertable serve day/week/month queries from the hourly rollup "
    "instead of rescanning raw data (the TimescaleDB continuous-"
    "aggregate pattern). At 100 TB this turns every coarser-grain "
    "query into a scan of the hourly table: ~3600x fewer rows.",
)
def q_ohlcv_daily_from_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stockpulse_spark.plans.registry import _hourly_bars

    bars = _hourly_bars(spark, sf_dir)
    day = F.date_trunc("day", "bucket_start")
    return (
        bars.groupBy("user_id", day.alias("day"))
        .agg(
            _r6(min_by_nn("open", "bucket_start")).alias("open"),
            _r6(F.max("high")).alias("high"),
            _r6(F.min("low")).alias("low"),
            _r6(max_by_nn("close", "bucket_start")).alias("close"),
            F.sum("volume").alias("volume"),
        )
        .orderBy("user_id", "day")
    )
