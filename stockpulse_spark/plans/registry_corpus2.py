"""Corpus-statistics wave 2: Zipf rank-frequency fit, temperature-
scaled source sampling weights, and benchmark-decontamination overlap.

Reference parity: these are the curation decisions a training-data
pipeline makes from corpus statistics — does a source's term
distribution look natural (Zipf), how hard should each source be
up/down-sampled (temperature sampling a la multilingual LM training),
and which train docs collide with the held-out split (n-gram
decontamination). All pure DataFrame ops; hashing is md5-derived
(llmdata/hashing.py) so every stage keeps a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stockpulse_spark.functions.nullsafe import corr_nn
from stockpulse_spark.llmdata.dedup import word_ngrams
from stockpulse_spark.llmdata.hashing import hex_to_int_sql
from stockpulse_spark.plans.registry import _r6, _register, _t


@_register(
    "zipf_slope",
    oracle="""
    WITH toks AS (
      SELECT source, unnest(string_split(text, ' ')) AS term
      FROM documents
    ), tf AS (
      SELECT source, term, COUNT(*) AS freq FROM toks GROUP BY 1, 2
    ), ranked AS (
      SELECT source, freq,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY freq DESC, term) AS rnk
      FROM tf
    )
    SELECT source,
           COUNT(*) AS n_terms,
           ROUND(regr_slope(ln(freq), ln(rnk)), 6) AS zipf_slope,
           -- corr^2 spelled out instead of regr_r2: Postgres/DuckDB
           -- regr_r2 returns 1.0 when var(y)=0 (every top term at the
           -- same freq) while Spark's corr is 0/0 there; the explicit
           -- total form is NULL in both engines, and Spark's ANSI corr
           -- raise on the same input is avoided (corr_nn twin)
           ROUND(POWER(covar_pop(ln(freq), ln(rnk))
                       / nullif(stddev_pop(ln(freq))
                                * stddev_pop(ln(rnk)), 0), 2), 6)
             AS fit_r2
    FROM ranked WHERE rnk <= 64
    GROUP BY source ORDER BY source
    """,
    tags=("llmdata", "text", "agg"),
    doc="Zipf's-law fit per source: OLS slope and R^2 of ln(freq) ~ "
    "ln(rank) over the top-64 terms. Natural text fits slope ~ -1; a "
    "flat or cliff-shaped curve marks template spam or boilerplate. "
    "Slope = covar_pop/var_pop and R^2 = corr^2 as single-pass "
    "aggregates (Spark's regression moments); R^2 is the explicit "
    "total corr^2 in BOTH engines (regr_r2 diverges on var(y)=0, "
    "see the oracle comment). Rank via one window over "
    "the (source, term) frequency table — vocabulary-sized, tiny next "
    "to the token explode that feeds it, which is map-side partial-"
    "aggregated before its one shuffle.",
)
def q_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        _t(spark, sf_dir, "documents")
        .select("source", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    tf = (
        d.select("source", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    w = Window.partitionBy("source").orderBy(
        F.col("freq").desc(), F.col("term")
    )
    ranked = tf.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= 64
    )
    x = F.log(F.col("rnk").cast("double"))
    y = F.log(F.col("freq").cast("double"))
    return (
        ranked.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            _r6(F.try_divide(F.covar_pop(y, x), F.var_pop(x))).alias(
                "zipf_slope"
            ),
            _r6(F.pow(corr_nn(y, x), F.lit(2.0))).alias("fit_r2"),
        )
        .orderBy("source")
    )


@_register(
    "source_sampling_weights",
    oracle="""
    WITH per_src AS (
      SELECT source,
             COUNT(*) AS n_docs,
             SUM(len(string_split(text, ' '))) AS n_tokens
      FROM documents GROUP BY source
    ), raw AS (
      SELECT source, n_docs, n_tokens,
             n_tokens * 1.0 / SUM(n_tokens) OVER () AS raw_share
      FROM per_src
    ), shares AS (
      SELECT source, n_docs, n_tokens, raw_share,
             pow(raw_share, 0.3)
               / SUM(pow(raw_share, 0.3)) OVER () AS sampled_share
      FROM raw
    )
    SELECT source, n_docs, CAST(n_tokens AS BIGINT) AS n_tokens,
           ROUND(raw_share, 6) AS raw_share,
           ROUND(sampled_share, 6) AS sampled_share,
           ROUND(sampled_share / raw_share, 6) AS oversample_factor
    FROM shares ORDER BY source
    """,
    tags=("llmdata", "sample", "agg"),
    doc="Temperature-scaled source sampling weights (alpha = 0.3, the "
    "multilingual-LM recipe): p_i proportional to share_i^alpha, "
    "renormalised — small sources get oversampled, dominant crawls "
    "damped. One partial-agg shuffle to per-source token counts, then "
    "unpartitioned windows over the SOURCE-count-sized frame (tens of "
    "rows at any data scale — the single-partition window is on "
    "metadata, not data). oversample_factor > 1 tells the sampler to "
    "repeat-epoch that source.",
)
def q_source_sampling_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").select("source", "text")
    per_src = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).alias("n_tokens"),
    )
    w = Window.partitionBy()
    raw_df = per_src.select(
        "source",
        "n_docs",
        "n_tokens",
        (F.col("n_tokens") * 1.0 / F.sum("n_tokens").over(w)).alias(
            "raw_share"
        ),
    )
    shares = raw_df.select(
        "source",
        "n_docs",
        "n_tokens",
        "raw_share",
        (
            F.pow("raw_share", 0.3)
            / F.sum(F.pow("raw_share", 0.3)).over(w)
        ).alias("sampled_share"),
    )
    return shares.select(
        "source",
        "n_docs",
        "n_tokens",
        _r6(F.col("raw_share")).alias("raw_share"),
        _r6(F.col("sampled_share")).alias("sampled_share"),
        _r6(F.col("sampled_share") / F.col("raw_share")).alias(
            "oversample_factor"
        ),
    ).orderBy("source")


_NGRAM_N = 5
# DuckDB 5-gram shingles over whitespace words (inclusive slice i..i+4)
_D_SHINGLES = (
    "list_transform(range(1, greatest(len(string_split(text, ' ')) - 4, 0) + 1), "
    "i -> array_to_string((string_split(text, ' '))[i:i+4], ' '))"
)


@_register(
    "decontamination_overlap",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, source, text,
             {hex_to_int_sql("md5(text)")} % 100 AS bucket
      FROM documents
    ), eval_grams AS (
      SELECT DISTINCT md5(g) AS gh
      FROM b, unnest({_D_SHINGLES}) AS t(g)
      WHERE bucket >= 90
    ), train_grams AS (
      SELECT DISTINCT doc_id, source, md5(g) AS gh
      FROM b, unnest({_D_SHINGLES}) AS t(g)
      WHERE bucket < 90
    ), hits AS (
      SELECT t.doc_id, t.source, COUNT(*) AS n_hits
      FROM train_grams t JOIN eval_grams e ON t.gh = e.gh
      GROUP BY t.doc_id, t.source
    )
    SELECT b.source,
           COUNT(*) AS n_train_docs,
           COUNT(h.doc_id) AS n_contaminated,
           ROUND(COUNT(h.doc_id) * 1.0 / COUNT(*), 6) AS contaminated_pct,
           CAST(COALESCE(SUM(h.n_hits), 0) AS BIGINT) AS total_gram_hits
    FROM b LEFT JOIN hits h ON h.doc_id = b.doc_id
    WHERE b.bucket < 90
    GROUP BY b.source ORDER BY b.source
    """,
    tags=("llmdata", "dedup", "join"),
    doc="Benchmark decontamination: hash every 5-gram of the held-out "
    "split (content-md5 bucket >= 90, the same split key as "
    "doc_train_test_split so dedup can't leak across it), then flag "
    "train docs sharing any 5-gram hash. The train->eval check is an "
    "equi-join on 32-byte gram hashes — hash-partitioned, "
    "sub-quadratic, never all-pairs; per-doc grams are DISTINCT'd "
    "map-side before the shuffle. At 100 TB the eval gram set is "
    "still benchmark-sized: broadcast it, or bloom-prefilter "
    "(operators/bloom.py) before the residual join.",
)
def q_decontamination_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "source", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    # round 10: zip_with n-grams — the old transform(sequence, slice)
    # re-split the text per gram position (interpreted HOF capture;
    # see llmdata/dedup.word_ngrams)
    shingles = word_ngrams(F.col("text"), _NGRAM_N)
    b = d.select(
        "doc_id",
        "source",
        shingles.alias("grams"),
        (F.expr(hex_to_int_sql("md5(text)")) % 100).alias("bucket"),
    )
    # pin once per invocation: b is read by the eval-gram pass, the
    # train-gram pass and the final per-source join — unpinned, the
    # n-gram transform over the whole corpus executed 3x
    # (optimization r11)
    b = b.localCheckpoint(eager=False)
    eval_grams = (
        b.filter(F.col("bucket") >= 90)
        .select(F.explode("grams").alias("g"))
        .select(F.md5("g").alias("gh"))
        .distinct()
    )
    train = b.filter(F.col("bucket") < 90)
    train_grams = train.select(
        "doc_id", "source", F.explode("grams").alias("g")
    ).select("doc_id", "source", F.md5("g").alias("gh")).distinct()
    hits = (
        train_grams.join(F.broadcast(eval_grams), "gh")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        train.join(F.broadcast(hits), "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_train_docs"),
            F.count("n_hits").alias("n_contaminated"),
            _r6(
                F.count("n_hits") * 1.0 / F.count(F.lit(1))
            ).alias("contaminated_pct"),
            F.coalesce(F.sum("n_hits"), F.lit(0)).alias("total_gram_hits"),
        )
        .orderBy("source")
    )


@_register(
    "corpus_drift_jsd",
    oracle=f"""
    WITH b AS (
      SELECT source, text,
             {hex_to_int_sql("md5(text)")} % 100 AS bucket
      FROM documents
    ), toks AS (
      SELECT source, bucket < 50 AS half_a,
             unnest(string_split(text, ' ')) AS term
      FROM b
    ), counts AS (
      SELECT source, term,
             SUM(CASE WHEN half_a THEN 1 ELSE 0 END) AS ca,
             SUM(CASE WHEN half_a THEN 0 ELSE 1 END) AS cb
      FROM toks GROUP BY source, term
    ), tot AS (
      SELECT source, SUM(ca) AS na, SUM(cb) AS nb,
             COUNT(*) AS vocab
      FROM counts GROUP BY source
    ), pq AS (
      SELECT c.source, t.vocab,
             (c.ca + 0.5) / (t.na + 0.5 * t.vocab) AS p,
             (c.cb + 0.5) / (t.nb + 0.5 * t.vocab) AS q
      FROM counts c JOIN tot t USING (source)
    )
    SELECT source, MAX(vocab) AS vocab_size,
           ROUND(0.5 * SUM(p * ln(2 * p / (p + q)))
               + 0.5 * SUM(q * ln(2 * q / (p + q))), 6) AS jsd,
           ROUND(0.5 * SUM(abs(p - q)), 6) AS tv_distance
    FROM pq GROUP BY source ORDER BY source
    """,
    tags=("llmdata", "text", "agg"),
    doc="Distribution-drift detector per source: Jensen-Shannon "
    "divergence and total-variation distance between the unigram "
    "distributions of two content-md5 halves of each source "
    "(add-half smoothing over the union vocabulary). Near-zero = "
    "internally homogeneous source; a spike = mixed registers or an "
    "ingestion regime change — the check run before declaring two "
    "crawls 'the same distribution'. One token-explode shuffle to "
    "(source, term) counts with both halves' counts in ONE row "
    "(conditional sums, so no self-join), then vocabulary-sized "
    "arithmetic.",
)
def q_corpus_drift_jsd(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        _t(spark, sf_dir, "documents")
        .select(
            "source",
            "text",
            (
                (F.expr(hex_to_int_sql("md5(text)")) % 100) < 50
            ).alias("half_a"),
        )
        .repartition(spark.sparkContext.defaultParallelism)
    )
    toks = d.select(
        "source", "half_a", F.explode(F.split("text", " ")).alias("term")
    )
    counts = toks.groupBy("source", "term").agg(
        F.sum(F.when(F.col("half_a"), 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("half_a"), 0).otherwise(1)).alias("cb"),
    )
    tot = counts.groupBy("source").agg(
        F.sum("ca").alias("na"),
        F.sum("cb").alias("nb"),
        F.count(F.lit(1)).alias("vocab"),
    )
    p = (F.col("ca") + 0.5) / (F.col("na") + 0.5 * F.col("vocab"))
    q = (F.col("cb") + 0.5) / (F.col("nb") + 0.5 * F.col("vocab"))
    pq = counts.join(F.broadcast(tot), "source").select(
        "source", "vocab", p.alias("p"), q.alias("q")
    )
    return (
        pq.groupBy("source")
        .agg(
            F.max("vocab").alias("vocab_size"),
            _r6(
                0.5
                * F.sum(
                    F.col("p")
                    * F.log(2 * F.col("p") / (F.col("p") + F.col("q")))
                )
                + 0.5
                * F.sum(
                    F.col("q")
                    * F.log(2 * F.col("q") / (F.col("p") + F.col("q")))
                )
            ).alias("jsd"),
            _r6(0.5 * F.sum(F.abs(F.col("p") - F.col("q")))).alias(
                "tv_distance"
            ),
        )
        .orderBy("source")
    )


# the funnel variant shares the exact op's oracle verbatim: the bloom
# stage has no false negatives and the residual equi-join removes the
# false positives, so the outputs are identical by construction
@_register(
    "decontamination_bloom_funnel",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, source, text,
             {hex_to_int_sql("md5(text)")} % 100 AS bucket
      FROM documents
    ), eval_grams AS (
      SELECT DISTINCT md5(g) AS gh
      FROM b, unnest({_D_SHINGLES}) AS t(g)
      WHERE bucket >= 90
    ), train_grams AS (
      SELECT DISTINCT doc_id, source, md5(g) AS gh
      FROM b, unnest({_D_SHINGLES}) AS t(g)
      WHERE bucket < 90
    ), hits AS (
      SELECT t.doc_id, t.source, COUNT(*) AS n_hits
      FROM train_grams t JOIN eval_grams e ON t.gh = e.gh
      GROUP BY t.doc_id, t.source
    )
    SELECT b.source,
           COUNT(*) AS n_train_docs,
           COUNT(h.doc_id) AS n_contaminated,
           ROUND(COUNT(h.doc_id) * 1.0 / COUNT(*), 6) AS contaminated_pct,
           CAST(COALESCE(SUM(h.n_hits), 0) AS BIGINT) AS total_gram_hits
    FROM b LEFT JOIN hits h ON h.doc_id = b.doc_id
    WHERE b.bucket < 90
    GROUP BY b.source ORDER BY b.source
    """,
    tags=("llmdata", "dedup", "join", "bloom"),
    doc="Benchmark decontamination through the 100 TB funnel: the "
    "eval-split 5-gram hashes build a Bloom bitset (operators/"
    "bloom.py — one map-side-combinable bit_or shuffle, bitset "
    "embedded as an array<long> literal in whole-stage codegen), the "
    "corpus-sized train gram stream is pre-filtered to ~true hits + "
    "FP rate BEFORE any join, and the residual broadcast equi-join "
    "removes the false positives — output identical to "
    "decontamination_overlap (same oracle, byte-for-byte), which IS "
    "the point: the approximate stage only prunes, never decides. At "
    "100 TB this is the difference between shuffling every train "
    "gram and shuffling ~the contaminated ones.",
)
def q_decontamination_bloom_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stockpulse_spark.operators.bloom import bloom_semi_join

    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "source", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    # round 10: zip_with n-grams — the old transform(sequence, slice)
    # re-split the text per gram position (interpreted HOF capture;
    # see llmdata/dedup.word_ngrams)
    shingles = word_ngrams(F.col("text"), _NGRAM_N)
    b = d.select(
        "doc_id",
        "source",
        shingles.alias("grams"),
        (F.expr(hex_to_int_sql("md5(text)")) % 100).alias("bucket"),
    )
    # pin once per invocation: b is read on four plan branches (the
    # eval grams feed the bloom build EAGERLY and the exact residual
    # join — see bloom_semi_join — plus the train-gram pass and the
    # final per-source join), each of which otherwise re-ran the
    # n-gram transform over the whole corpus (optimization r11)
    b = b.localCheckpoint(eager=False)
    # the eval gram-hash set is itself read twice (bloom build + exact
    # residual semi-join) — pin the narrow distinct set too
    eval_grams = (
        b.filter(F.col("bucket") >= 90)
        .select(F.explode("grams").alias("g"))
        .select(F.md5("g").alias("gh"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    train = b.filter(F.col("bucket") < 90)
    train_grams = train.select(
        "doc_id", "source", F.explode("grams").alias("g")
    ).select("doc_id", "source", F.md5("g").alias("gh")).distinct()
    # bloom prefilter + exact residual join (exact by construction)
    survivors = bloom_semi_join(train_grams, eval_grams, "gh", "gh")
    hits = survivors.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_hits"))
    return (
        train.join(F.broadcast(hits), "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_train_docs"),
            F.count("n_hits").alias("n_contaminated"),
            _r6(
                F.count("n_hits") * 1.0 / F.count(F.lit(1))
            ).alias("contaminated_pct"),
            F.coalesce(F.sum("n_hits"), F.lit(0)).alias("total_gram_hits"),
        )
        .orderBy("source")
    )


@_register(
    "source_mixture_temperature",
    oracle="""
    WITH counts AS (
      SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
    ), tot AS (
      SELECT SUM(n_docs) AS n FROM counts
    ), scaled AS (
      SELECT c.source, c.n_docs,
             c.n_docs * 1.0 / t.n AS p_raw,
             pow(c.n_docs * 1.0 / t.n, 0.7) AS p_temp
      FROM counts c CROSS JOIN tot t
    )
    SELECT source, n_docs,
           ROUND(p_raw, 6) AS p_raw,
           ROUND(p_temp / SUM(p_temp) OVER (), 6) AS p_mixture,
           ROUND((p_temp / SUM(p_temp) OVER ()) / p_raw, 6)
             AS upsample_factor
    FROM scaled ORDER BY source
    """,
    tags=("llmdata", "sampling", "agg"),
    doc="temperature-scaled mixture weights (T = 0.7, the multilingual "
    "up/down-sampling scheme of the XLM-R / mT5 corpus recipes): "
    "per-source mass p^T renormalized, plus the resulting "
    "upsample factor vs natural sampling. One partial-agg shuffle on "
    "source; the mixture table is source-cardinality-sized — "
    "broadcastable to whatever sampler consumes it "
    "(doc_weighted_sample_by_source).",
)
def q_source_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    counts = (
        _t(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    tot = counts.agg(F.sum("n_docs").alias("n"))
    scaled = counts.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        (F.col("n_docs") * 1.0 / F.col("n")).alias("p_raw"),
        F.pow(F.col("n_docs") * 1.0 / F.col("n"), F.lit(0.7)).alias("p_temp"),
    )
    w = Window.partitionBy()
    # window sum named once — p_mix is referenced twice below and
    # Catalyst does not dedup identical window expressions
    mixed = scaled.select(
        "source",
        "n_docs",
        "p_raw",
        (F.col("p_temp") / F.sum("p_temp").over(w)).alias("__pmix"),
    )
    return mixed.select(
        "source",
        "n_docs",
        _r6(F.col("p_raw")).alias("p_raw"),
        _r6(F.col("__pmix")).alias("p_mixture"),
        _r6(F.col("__pmix") / F.col("p_raw")).alias("upsample_factor"),
    ).orderBy("source")


@_register(
    "decontamination_recall_eval",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, text,
             {hex_to_int_sql("md5(text)")} % 100 AS bucket,
             string_split(text, ' ') AS w
      FROM documents
    ), ev AS (
      SELECT doc_id, text, w FROM b
      WHERE bucket >= 90 AND len(w) >= 25
    ), planted AS (
      -- residue-class planted ids (k=4, cohort offsets 0-3): injective
      -- for ANY input id range — round 9 migrated off the additive
      -- +3M/+4M/+5M offsets for uniformity with the engine-wide
      -- synthetic-id scheme (tests/test_synthetic_ids.py)
      SELECT doc_id * 4 AS doc_id, 'clean_train' AS cohort, text
      FROM b WHERE bucket < 90
      UNION ALL
      SELECT doc_id * 4 + 1, 'copy_full', text FROM ev
      UNION ALL
      SELECT doc_id * 4 + 2, 'copy_span10',
             array_to_string(w[9:18], ' ') FROM ev
      UNION ALL
      SELECT doc_id * 4 + 3, 'copy_span4',
             array_to_string(w[9:12], ' ') FROM ev
    ), eval_grams AS (
      SELECT DISTINCT md5(g) AS gh
      FROM ev, unnest({_D_SHINGLES}) AS t(g)
    ), train_grams AS (
      SELECT DISTINCT doc_id, cohort, md5(g) AS gh
      FROM planted, unnest({_D_SHINGLES}) AS t(g)
    ), flagged AS (
      SELECT DISTINCT t.doc_id, t.cohort
      FROM train_grams t JOIN eval_grams e ON t.gh = e.gh
    )
    SELECT p.cohort,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN f.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_flagged,
           ROUND(SUM(CASE WHEN f.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                 * 1.0 / COUNT(*), 6) AS flag_rate
    FROM planted p LEFT JOIN flagged f USING (doc_id, cohort)
    GROUP BY p.cohort ORDER BY p.cohort
    """,
    tags=("llmdata", "dedup", "join", "evaluation"),
    doc="Measured decontamination recall on PLANTED contamination — "
    "the third evaluation harness beside the LSH S-curve and ANN "
    "recall: every eval doc is re-planted into the train side at "
    "three copy strengths (verbatim, a 10-word span, a 4-word span), "
    "and the 5-gram-hash detector (decontamination_overlap's exact "
    "machinery) is scored per cohort. The boundary is the point: "
    "verbatim and 10-word spans must flag at 1.0 (any >=5-word "
    "contiguous overlap survives shingling), the 4-word span at "
    "EXACTLY 0.0 — an asserted contract "
    "(tests/test_llmdata.py::test_decontamination_recall_boundary "
    "pins all four cohort rates), not a documented gap: 4-word "
    "overlaps are deliberately out of decontamination scope because "
    "a 4-gram band would ~1.25x the gram volume and flag mostly "
    "idiom-level collocations (false-positive noise) while carrying "
    "negligible eval signal. The MinHash fuzzy tier does NOT cover "
    "this blind spot and no longer claims to — its measured catch "
    "rate on 4-word snippets is 0.0 "
    "(test_decontamination_fuzzy_tier_catch_rate_measured pins it, "
    "with the reason: a 4-word snippet shares <=2 shingles with its "
    "25+-word source). The fuzzy tier's decontamination value is "
    "near-VERBATIM copies (measured 1.0 on verbatim re-plants); "
    "dense paraphrase evades both lexical tiers and belongs to the "
    "embedding-similarity family. clean_train shows the organic "
    "false-positive base rate. Same join shape and scale posture as "
    "decontamination_overlap (broadcast benchmark gram set).",
)
def q_decontamination_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    b = d.select(
        "doc_id",
        "text",
        (F.expr(hex_to_int_sql("md5(text)")) % 100).alias("bucket"),
        F.split("text", " ").alias("w"),
    )
    # pin once per invocation: b feeds the eval-gram pass plus all
    # four planted-cohort branches, and the planted union is itself
    # read twice (gram explode + final recall join) — unpinned, the
    # split + md5-bucket scan executed up to 9x (optimization r11)
    b = b.localCheckpoint(eager=False)
    ev = b.filter((F.col("bucket") >= 90) & (F.size("w") >= 25))
    # residue-class planted ids (k=4, offsets 0-3): injective for any
    # input id range — migrated round 9 off the additive +3M/+4M/+5M
    # offsets (whose collisions the (doc_id, cohort) keying tolerated
    # flag-correctly, but which double-counted a collided physical doc
    # in two cohorts' n_docs at 100x)
    planted = (
        b.filter(F.col("bucket") < 90).select(
            (F.col("doc_id") * 4).alias("doc_id"),
            F.lit("clean_train").alias("cohort"),
            "text",
        )
        .unionAll(
            ev.select(
                (F.col("doc_id") * 4 + 1).alias("doc_id"),
                F.lit("copy_full").alias("cohort"),
                "text",
            )
        )
        .unionAll(
            ev.select(
                (F.col("doc_id") * 4 + 2).alias("doc_id"),
                F.lit("copy_span10").alias("cohort"),
                F.array_join(F.slice("w", 9, 10), " ").alias("text"),
            )
        )
        .unionAll(
            ev.select(
                (F.col("doc_id") * 4 + 3).alias("doc_id"),
                F.lit("copy_span4").alias("cohort"),
                F.array_join(F.slice("w", 9, 4), " ").alias("text"),
            )
        )
    )
    # round 10: zip_with n-grams (see llmdata/dedup.word_ngrams)
    grams = word_ngrams(F.col("text"), _NGRAM_N)
    eval_grams = (
        ev.select(F.explode(grams).alias("g"))
        .select(F.md5("g").alias("gh"))
        .distinct()
    )
    train_grams = (
        planted.select("doc_id", "cohort", F.explode(grams).alias("g"))
        .select("doc_id", "cohort", F.md5("g").alias("gh"))
        .distinct()
    )
    # flagged keys on (doc_id, cohort) — mirrors the oracle; with
    # residue ids the pair key is redundant (ids are injective) but
    # keeps the join contract explicit
    flagged = (
        train_grams.join(F.broadcast(eval_grams), "gh")
        .select("doc_id", "cohort")
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    return (
        planted.join(flagged, ["doc_id", "cohort"], "left")
        .groupBy("cohort")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0)))
            .cast("bigint")
            .alias("n_flagged"),
        )
        .select(
            "cohort",
            "n_docs",
            "n_flagged",
            _r6(F.col("n_flagged") * 1.0 / F.col("n_docs")).alias("flag_rate"),
        )
        .orderBy("cohort")
    )
