"""Curation wave 3: embedding-space outlier detection, token-budget
sampling, and week-over-week growth.

Reference parity: embedding_label_outliers is the vector-quality gate
(mislabeled / out-of-distribution vectors sit far from their label
centroid); doc_token_budget_sample closes the sampling pipeline opened
by source_sampling_weights — it materialises the actual per-source doc
selection under a global token budget; revenue_wow_growth is the
dashboard's growth tile as one window over a metadata-sized weekly
rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stockpulse_spark.llmdata.hashing import word32_sql
from stockpulse_spark.llmdata.similarity import _as_double, dot, norm
from stockpulse_spark.operators.rank import with_grouped_running_sum
from stockpulse_spark.operators.topk import salted_grouped_topk
from stockpulse_spark.functions.nullsafe import nan_nn, not_finite
from stockpulse_spark.plans.registry import _r4, _r6, _register, _t
from stockpulse_spark.plans.registry_ml import _DIMS, _d_cos

_BUDGET = 10_000  # global token budget for the sample


@_register(
    "embedding_label_outliers",
    oracle=f"""
    WITH v AS (
      -- NULL embeddings are excluded from the gate entirely: a label
      -- whose vectors are ALL NULL otherwise keeps a NULL-centroid
      -- row here while Spark's posexplode drops it (found by
      -- hypothesis in tests/test_property_parity.py)
      SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings
      WHERE embedding IS NOT NULL AND len(list_filter(embedding, x -> NOT isfinite(x))) = 0
    ), cent AS (
      SELECT label, list(mu ORDER BY pos) AS c FROM (
        SELECT v.label, p.pos, ROUND(AVG(v.e[p.pos]), 6) AS mu
        FROM v, (SELECT unnest(range(1, {_DIMS + 1})) AS pos) p
        GROUP BY v.label, p.pos
      ) GROUP BY label
    ), d AS (
      SELECT v.vec_id, v.label,
             1 - {_d_cos('v.e', 'c.c')} AS dist
      FROM v JOIN cent c USING (label)
    ), stats AS (
      SELECT label, COUNT(*) AS n,
             AVG(dist) AS mu_d, stddev_pop(dist) AS sd_d
      FROM d GROUP BY label
    )
    SELECT s.label, s.n,
           ROUND(s.mu_d, 6) AS avg_dist,
           ROUND(s.sd_d, 6) AS sd_dist,
           CAST(SUM(CASE WHEN d.dist > s.mu_d + 2 * s.sd_d
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM d JOIN stats s USING (label)
    GROUP BY s.label, s.n, s.mu_d, s.sd_d
    ORDER BY s.label
    """,
    tags=("llmdata", "similarity", "agg"),
    doc="Embedding-space outlier gate: cosine distance of every "
    "vector to its label centroid (dimension-wise mean, snapped to "
    "6 dp so both engines feed bit-identical centroids — the kmeans "
    "recipe), flagging vectors beyond mean + 2 sigma. Centroids are "
    "LABELS x DIMS rows (KBs at any scale) and broadcast; the "
    "per-vector distance is a sequential JVM fold; two partial-agg "
    "shuffles end-to-end. The curation signal that catches "
    "mislabeled and out-of-distribution vectors before training.",
)
def q_embedding_label_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = (
        _t(spark, sf_dir, "embeddings")
        .filter(
            F.col("embedding").isNotNull()
            & ~F.exists("embedding", lambda x: not_finite(x))
        )
        .select("vec_id", "label", _as_double(F.col("embedding")).alias("e"))
    )
    cent = (
        v.select("label", F.posexplode("e").alias("pos", "val"))
        .groupBy("label", "pos")
        .agg(_r6(F.avg("val")).alias("mu"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "mu"))),
                lambda s: s.getField("mu"),
            ).alias("c")
        )
        # centroid norm folded once per LABEL, not once per corpus row
        # (optimization r11 — interpreted-HOF fold; same doubles
        # through the same division)
        .withColumn("cn", norm(F.col("c")))
    )
    d = (
        v.join(F.broadcast(cent), "label")
        .select(
            "vec_id",
            "label",
            (
                1 - dot(F.col("e"), F.col("c"))
                / (norm(F.col("e")) * F.col("cn"))
            ).alias("dist"),
        )
    )
    stats = d.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("dist").alias("mu_d"),
        F.stddev_pop("dist").alias("sd_d"),
    )
    return (
        d.join(F.broadcast(stats), "label")
        .groupBy("label", "n", "mu_d", "sd_d")
        .agg(
            F.sum(
                F.when(
                    F.col("dist") > F.col("mu_d") + 2 * F.col("sd_d"), 1
                ).otherwise(0)
            ).alias("n_outliers")
        )
        .select(
            "label",
            "n",
            _r6(F.col("mu_d")).alias("avg_dist"),
            _r6(F.col("sd_d")).alias("sd_dist"),
            "n_outliers",
        )
        .orderBy("label")
    )


@_register(
    "doc_token_budget_sample",
    oracle=f"""
    WITH per_src AS (
      SELECT source, SUM(len(string_split(text, ' '))) AS n_tokens
      FROM documents GROUP BY source
    ), raw AS (
      SELECT source, n_tokens,
             n_tokens * 1.0 / SUM(n_tokens) OVER () AS raw_share
      FROM per_src
    ), sh AS (
      SELECT source,
             pow(raw_share, 0.3)
               / SUM(pow(raw_share, 0.3)) OVER () AS sampled_share
      FROM raw
    ), quota AS (
      SELECT source,
             CAST(floor({_BUDGET} * sampled_share) AS BIGINT) AS quota
      FROM sh
    ), cum AS (
      SELECT source, doc_id,
             len(string_split(text, ' ')) AS toks,
             SUM(len(string_split(text, ' '))) OVER (
               PARTITION BY source ORDER BY md5(text), doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ctoks
      FROM documents
    )
    SELECT c.source, q.quota,
           CAST(SUM(CASE WHEN c.ctoks <= q.quota THEN 1 ELSE 0 END)
                AS BIGINT) AS n_docs_sampled,
           CAST(COALESCE(MAX(CASE WHEN c.ctoks <= q.quota THEN c.ctoks END), 0)
                AS BIGINT) AS tokens_sampled,
           ROUND(COALESCE(MAX(CASE WHEN c.ctoks <= q.quota THEN c.ctoks END), 0)
                 * 1.0 / q.quota, 6) AS utilization
    FROM cum c JOIN quota q USING (source)
    GROUP BY c.source, q.quota
    ORDER BY c.source
    """,
    tags=("llmdata", "sample", "window"),
    doc=f"Token-budget sampler: split a {_BUDGET}-token global budget "
    "across sources by the temperature-scaled weights "
    "(source_sampling_weights, alpha=0.3), then take each source's "
    "docs in content-md5 priority order until the quota is exhausted "
    "— a deterministic, resumable sample (same corpus -> same "
    "sample, no RNG state). One integer cumsum window per source "
    "partition; quotas are SOURCE-count-sized and broadcast. "
    "Utilization < 1 shows quantisation loss to the curator.",
)
def q_doc_token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").select("source", "doc_id", "text")
    toks = F.size(F.split("text", " "))
    per_src = d.groupBy("source").agg(F.sum(toks).alias("n_tokens"))
    w = Window.partitionBy()
    raw = per_src.select(
        "source",
        (F.col("n_tokens") * 1.0 / F.sum("n_tokens").over(w)).alias(
            "raw_share"
        ),
    )
    sh = raw.select(
        "source",
        (
            F.pow("raw_share", 0.3)
            / F.sum(F.pow("raw_share", 0.3)).over(w)
        ).alias("sampled_share"),
    )
    quota = sh.select(
        "source",
        F.floor(_BUDGET * F.col("sampled_share")).cast("bigint").alias(
            "quota"
        ),
    )
    # grouped prefix cumsum (operators/rank.py): the plain per-source
    # window caps parallelism at |sources|
    cum = with_grouped_running_sum(
        d.select(
            "source",
            "doc_id",
            toks.alias("__tk"),
            F.md5("text").alias("__ord"),
        ),
        ["source"],
        ["__ord", "doc_id"],
        "__tk",
        out_col="ctoks",
        inclusive=True,
    ).select("source", "doc_id", "ctoks")
    in_budget = F.when(F.col("ctoks") <= F.col("quota"), F.col("ctoks"))
    return (
        cum.join(F.broadcast(quota), "source")
        .groupBy("source", "quota")
        .agg(
            F.sum(
                F.when(F.col("ctoks") <= F.col("quota"), 1).otherwise(0)
            ).alias("n_docs_sampled"),
            F.coalesce(F.max(in_budget), F.lit(0)).alias("tokens_sampled"),
        )
        .select(
            "source",
            "quota",
            "n_docs_sampled",
            "tokens_sampled",
            _r6(F.col("tokens_sampled") * 1.0 / F.col("quota")).alias(
                "utilization"
            ),
        )
        .orderBy("source")
    )


@_register(
    "revenue_wow_growth",
    oracle="""
    WITH weekly AS (
      -- date-less orders are off the weekly axis; a NULL wk in the
      -- lag ORDER BY is engine-divergent (and DuckDB's parallel
      -- window sort places it unstably run-to-run)
      -- integer-cents snap (the rfm/gini/cohort discipline): a raw
      -- double week-sum is fold-order nondeterministic in its last
      -- ulp, which can flip the 4dp round run-to-run
      SELECT CAST(date_trunc('week', o_orderdate) AS TIMESTAMP) AS wk,
             CAST(ROUND(SUM((CASE WHEN NOT isfinite(o_totalprice) THEN NULL ELSE o_totalprice END) * 100)) AS BIGINT) AS cents,
             COUNT(*) AS n_orders
      FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1
    )
    SELECT wk, ROUND(cents / 100.0, 4) AS revenue, n_orders,
           ROUND((cents - lag(cents) OVER (ORDER BY wk))
                 / nullif(1.0 * lag(cents) OVER (ORDER BY wk), 0.0),
                 6) AS wow_growth
    FROM weekly ORDER BY wk
    """,
    tags=("analytics", "window"),
    doc="Week-over-week revenue growth: one partial-agg shuffle to "
    "the weekly rollup (52 rows/year at ANY data scale), then the "
    "lag window runs single-partition on metadata — the correct "
    "shape for growth tiles: never window the fact table, window "
    "the rollup. date_trunc('week') cast to TIMESTAMP on both "
    "engines (DuckDB returns DATE).",
)
def q_revenue_wow_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").isNotNull()
    )
    weekly = o.groupBy(
        F.date_trunc("week", "o_orderdate").alias("wk")
    ).agg(
        F.round(F.sum(nan_nn("o_totalprice") * 100))
        .cast("bigint")
        .alias("cents"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    w = Window.partitionBy().orderBy("wk")
    return weekly.select(
        "wk",
        _r4(F.col("cents") / 100.0).alias("revenue"),
        "n_orders",
        _r6(
            F.try_divide(
                F.col("cents") - F.lag("cents").over(w),
                1.0 * F.lag("cents").over(w),
            )
        ).alias("wow_growth"),
    ).orderBy("wk")


@_register(
    "doc_weighted_sample",
    oracle=f"""
    SELECT doc_id, source, n_chars,
           ROUND(LN(({word32_sql('text')} + 0.5) / 4294967296.0)
                 / n_chars, 12) AS samp_key
    FROM documents
    WHERE text IS NOT NULL AND n_chars > 0
    ORDER BY samp_key DESC, doc_id
    LIMIT 20
    """,
    tags=("llmdata", "sampling"),
    doc="Efraimidis-Spirakis (A-ES) weighted sample without "
    "replacement: per-doc uniform u derived from the md5 of the "
    "content (cross-engine deterministic, re-ingestion stable), "
    "log-domain key ln(u)/w with w = n_chars, top-k largest keys = a "
    "sample drawn with probability proportional to document length. "
    "The length-weighted draw a token-budgeted mixture builder uses "
    "when it wants docs, not sources, as the sampling unit. Zero "
    "shuffles at any scale: one scan, per-partition top-k, driver "
    "merge of k-row candidates (TakeOrderedAndProject).",
)
def q_doc_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    h = F.expr(word32_sql("text")).cast("double")
    key = F.log((h + F.lit(0.5)) / F.lit(4294967296.0)) / F.col("n_chars")
    return (
        docs.filter(F.col("text").isNotNull() & (F.col("n_chars") > 0))
        .select(
            "doc_id",
            "source",
            "n_chars",
            F.round(key, 12).alias("samp_key"),
        )
        .orderBy(F.desc("samp_key"), "doc_id")
        .limit(20)
    )


@_register(
    "doc_weighted_sample_by_source",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id, source, n_chars,
             ROUND(LN(({word32_sql('text')} + 0.5) / 4294967296.0)
                   / n_chars, 12) AS samp_key
      FROM documents
      WHERE text IS NOT NULL AND n_chars > 0
    ), ranked AS (
      SELECT *, ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY samp_key DESC, doc_id) AS rk
      FROM keyed
    )
    SELECT doc_id, source, n_chars, samp_key, rk
    FROM ranked WHERE rk <= 5
    ORDER BY source, rk
    """,
    tags=("llmdata", "sampling", "window"),
    doc="per-source A-ES weighted sample (top-5 per source by the "
    "same ln(u)/w key as doc_weighted_sample). `source` has tiny "
    "cardinality, so a naive PARTITION BY source window would funnel "
    "the full corpus through a handful of reducers; instead a salted "
    "two-stage top-k runs: stage 1 ranks within (source, md5-salt) "
    "buckets — 16x the reducers, each seeing 1/16th of a hot group — "
    "and keeps k rows per bucket; stage 2 ranks the surviving "
    "16*k-per-source candidates exactly. Identical result to the "
    "single-window form at any scale, without the hot-reducer funnel.",
)
def q_doc_weighted_sample_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    h = F.expr(word32_sql("text")).cast("double")
    key = F.round(
        F.log((h + F.lit(0.5)) / F.lit(4294967296.0)) / F.col("n_chars"),
        12,
    )
    keyed = docs.filter(
        F.col("text").isNotNull() & (F.col("n_chars") > 0)
    ).select(
        "doc_id",
        "source",
        "n_chars",
        key.alias("samp_key"),
    )
    return salted_grouped_topk(
        keyed,
        ["source"],
        [F.desc("samp_key"), F.asc("doc_id")],
        5,
        F.expr(word32_sql("CAST(doc_id AS STRING)")),
    ).orderBy("source", "rk")


@_register(
    "doc_substring_dup_pairs",
    oracle="""
    WITH words AS (
      SELECT doc_id, string_split(text, ' ') AS w
      FROM documents WHERE text IS NOT NULL
    ), sh AS (
      SELECT DISTINCT doc_id, h FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(w) - 8),
                      i -> md5(array_to_string(w[i:i+9], ' ')))) AS h
        FROM words WHERE len(w) >= 10
      )
    ), grp AS (
      SELECT h, COUNT(DISTINCT doc_id) AS d FROM sh GROUP BY h
    ), keep AS (
      SELECT h FROM grp WHERE d BETWEEN 2 AND 8
    ), pair AS (
      SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS shared
      FROM sh a JOIN sh b USING (h) JOIN keep USING (h)
      WHERE a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ), tot AS (
      SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
    )
    SELECT p.d1, p.d2, p.shared,
           ROUND(CAST(p.shared AS DOUBLE) / LEAST(t1.n_sh, t2.n_sh), 6)
             AS overlap
    FROM pair p
    JOIN tot t1 ON p.d1 = t1.doc_id
    JOIN tot t2 ON p.d2 = t2.doc_id
    ORDER BY p.shared DESC, p.d1, p.d2
    LIMIT 20
    """,
    tags=("llmdata", "dedup"),
    doc="duplicated-substring pair discovery (the shingle-join proxy "
    "for exact substring dedup a la 'Deduplicating Training Data "
    "Makes Language Models Better'): every word-10-gram is md5 "
    "fingerprinted (stride 1), shingles shared by 2-8 docs nominate "
    "candidate pairs — the df cap drops boilerplate hot shingles, "
    "bounding any bucket's pair fan-out at C(8,2)=28, so the pair "
    "generator is never corpus-quadratic. Pairs expand in-row over "
    "each shingle's collected doc set (no shingle-table self-join); "
    "overlap normalizes by the smaller doc's shingle count. Top-20 "
    "by the integer shared-count, so selection is float-free.",
)
def q_doc_substring_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    sh = (
        docs.filter(F.col("text").isNotNull())
        .select("doc_id", F.split("text", " ").alias("w"))
        .filter(F.size("w") >= 10)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(w) - 9), "
                    "i -> md5(concat_ws(' ', slice(w, i, 10))))"
                )
            ).alias("h"),
        )
        .distinct()
    )
    grp = (
        sh.groupBy("h")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("ds"))
        .filter((F.size("ds") >= 2) & (F.size("ds") <= 8))
    )
    pair = (
        grp.select(
            F.explode(
                F.expr(
                    "flatten(transform(ds, (x, i) -> "
                    "transform(slice(ds, i + 2, size(ds)), "
                    "y -> struct(x AS d1, y AS d2))))"
                )
            ).alias("q")
        )
        .groupBy(F.col("q.d1").alias("d1"), F.col("q.d2").alias("d2"))
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    tot = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    t1 = tot.select(F.col("doc_id").alias("d1"), F.col("n_sh").alias("n1"))
    t2 = tot.select(F.col("doc_id").alias("d2"), F.col("n_sh").alias("n2"))
    return (
        pair.join(t1, "d1")
        .join(t2, "d2")
        .orderBy(F.desc("shared"), "d1", "d2")
        .limit(20)
        .select(
            "d1",
            "d2",
            "shared",
            _r6(
                F.col("shared").cast("double") / F.least("n1", "n2")
            ).alias("overlap"),
        )
    )
