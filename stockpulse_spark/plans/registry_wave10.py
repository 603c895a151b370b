"""Round-9 wave: curation economics + index-maintenance instrumentation.

Six queries a production training-data pipeline runs around the dedup/
retrieval core the earlier waves built:

- measured LSH PRECISION (the recall side has minhash_lsh_recall_eval
  and lsh_tuning_curve; this closes the other half of the operating-
  point evidence: of the candidate pairs the deployed tier emits, how
  many are true near-dups at each estimated-similarity level),
- per-domain document caps (C4-style source quotas with a
  deterministic keep rank),
- chunking economics for RAG/packing (size/stride token expansion,
  closed form — no explode),
- freshness-decay sampling weights (exact dyadic weights so the sums
  are bit-reproducible under ANY partial-sum order),
- LSH band churn under document edits (the CDC cost of an incremental
  LSH index: which fraction of each band's entries an edit rewrites),
- exact-dedup token savings per source (the storage/compute case for
  running the dedup funnel at all).

Reference parity: outside the reference's indicator scope (its dedup
is drop_duplicates on a pandas frame — StockPulse
src/preprocessing/preprocessing_pipeline.py:125); these extend the
LLM-data pipeline family
the north-star extensions call for.

Scale posture: every query is scan-shaped or candidate-bounded. The
precision sample only scores pairs the LSH tier already emitted
(bounded by the band-bucket cap); the churn delta joins each doc to
its single edited twin (1:1, never quadratic); caps/chunks/weights/
savings are one groupBy over a scan projection. No global windows,
no driver collects, no Python rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stockpulse_spark.llmdata.dedup import (
    minhash_lsh_pairs,
    minhash_lsh_pairs_from_shingles,
    minhash_signature,
    shingles,
)
from stockpulse_spark.plans.registry import _r6, _register, _t
from stockpulse_spark.plans.registry_llmdata import (
    _MUT_CTE,
    _SHINGLES_DUCK,
    _mutated_corpus,
    _sig_sql,
)

# ---------------------------------------------------------------------------
# 1. measured LSH precision by estimated-similarity level


@_register(
    "lsh_precision_sample",
    oracle=_MUT_CTE
    + f"""
    , sig AS (
      SELECT doc_id, {_sig_sql(16)} AS sig FROM corpus
    ), banded AS (
      SELECT doc_id, sig, b.band_idx,
             md5(array_to_string(sig[b.band_idx * 2 + 1 : b.band_idx * 2 + 2], '|')) AS band_hash
      FROM sig, (SELECT unnest(range(0, 8)) AS band_idx) b
    ), ok_buckets AS (
      SELECT band_idx, band_hash FROM banded
      GROUP BY band_idx, band_hash HAVING COUNT(*) <= 64
    ), cand AS (
      SELECT DISTINCT l.doc_id AS doc_id_1, r.doc_id AS doc_id_2,
             list_sum(list_transform(range(1, 17),
               i -> CASE WHEN l.sig[i] = r.sig[i] THEN 1 ELSE 0 END)) / 16.0
               AS est
      FROM banded l JOIN banded r
        ON l.band_idx = r.band_idx AND l.band_hash = r.band_hash
       AND l.doc_id < r.doc_id
      JOIN ok_buckets ob
        ON ob.band_idx = l.band_idx AND ob.band_hash = l.band_hash
    ), sh AS (
      SELECT doc_id, {_SHINGLES_DUCK} AS sh FROM corpus
    ), scored AS (
      SELECT c.est,
             len(list_intersect(a.sh, b.sh)) AS i,
             len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS u
      FROM cand c
      JOIN sh a ON c.doc_id_1 = a.doc_id
      JOIN sh b ON c.doc_id_2 = b.doc_id
      WHERE c.est >= 0.5
    )
    SELECT est AS est_jaccard,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(CASE WHEN u > 0 AND i * 2 >= u THEN 1 ELSE 0 END)
                AS BIGINT) AS n_true,
           ROUND(SUM(CASE WHEN u > 0 AND i * 2 >= u THEN 1 ELSE 0 END)
                 * 1.0 / COUNT(*), 6) AS precision,
           ROUND(SUM(i) * 1.0 / nullif(SUM(u), 0), 6) AS micro_jaccard
    FROM scored GROUP BY est ORDER BY est
    """,
    tags=("llmdata", "dedup", "evaluation"),
    doc="Measured PRECISION of the deployed MinHash-LSH tier, by "
    "estimated-Jaccard level: every candidate pair the tier emits "
    "(est >= 0.5, the doc_minhash_lsh operating point) is verified "
    "against EXACT 3-gram Jaccard, reported per signature-agreement "
    "level (est is m/16 — nine possible levels).  Closes the "
    "operating-point evidence the recall side (minhash_lsh_recall_"
    "eval, lsh_tuning_curve) leaves open: recall says what the tier "
    "finds, this says what fraction of its candidate volume is real "
    "— the number that prices the downstream exact-verify stage.  "
    "truth test is integer (2i >= u), the micro average is a ratio "
    "of exact integer sums: no float-summation-order hazard.  Scale "
    "shape: exact Jaccard is computed ONLY on LSH-emitted pairs "
    "(band-bucket cap bounds them), via two id-keyed joins against "
    "the shingle-set frame — the funnel's verify-stage cost, "
    "measured not argued.",
)
def q_lsh_precision_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _mutated_corpus(spark, sf_dir)
    # pin the shingle frame once per invocation — the LSH candidate
    # stage (signatures) and the exact-Jaccard scoring both read it
    # (optimization r11; previously the corpus mutation + shingle
    # transform ran twice)
    sh = corpus.select(
        "doc_id", shingles("text", 3).alias("sh")
    ).localCheckpoint(eager=False)
    pairs = minhash_lsh_pairs_from_shingles(
        sh, sh_col="sh", k=16, bands=8, threshold=0.5
    )
    a = sh.select(F.col("doc_id").alias("doc_id_1"), F.col("sh").alias("sh1"))
    b = sh.select(F.col("doc_id").alias("doc_id_2"), F.col("sh").alias("sh2"))
    inter = F.size(F.array_intersect("sh1", "sh2"))
    scored = (
        pairs.join(a, "doc_id_1")
        .join(b, "doc_id_2")
        .select(
            F.col("est_jaccard").alias("est"),
            inter.alias("i"),
            (F.size("sh1") + F.size("sh2") - inter).alias("u"),
        )
    )
    true_hit = F.when((F.col("u") > 0) & (F.col("i") * 2 >= F.col("u")), 1).otherwise(0)
    return (
        scored.groupBy(F.col("est").alias("est_jaccard"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(true_hit).cast("bigint").alias("n_true"),
            F.sum("i").alias("__si"),
            F.sum("u").alias("__su"),
        )
        .select(
            "est_jaccard",
            "n_pairs",
            "n_true",
            _r6(F.col("n_true") * 1.0 / F.col("n_pairs")).alias("precision"),
            _r6(
                F.col("__si") * 1.0 / F.nullif(F.col("__su"), F.lit(0))
            ).alias("micro_jaccard"),
        )
        .orderBy("est_jaccard")
    )


# ---------------------------------------------------------------------------
# 2. per-domain document caps

_DOMAIN_CAP = 64


@_register(
    "domain_cap_enforcement",
    oracle=f"""
    WITH base AS (
      SELECT source, doc_id, md5(text) AS fp,
             CASE WHEN text IS NULL THEN 0
                  ELSE len(string_split(text, ' ')) END AS n_tok
      FROM documents
    ), ranked AS (
      SELECT *, ROW_NUMBER() OVER (
               PARTITION BY source ORDER BY fp, doc_id) AS rnk
      FROM base
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN rnk <= {_DOMAIN_CAP} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept,
           CAST(SUM(n_tok) AS BIGINT) AS tokens_total,
           CAST(SUM(CASE WHEN rnk <= {_DOMAIN_CAP} THEN n_tok ELSE 0 END)
                AS BIGINT) AS tokens_kept,
           ROUND(SUM(CASE WHEN rnk <= {_DOMAIN_CAP} THEN 1 ELSE 0 END)
                 * 1.0 / COUNT(*), 6) AS keep_rate
    FROM ranked GROUP BY source ORDER BY source
    """,
    tags=("llmdata", "curation", "topk"),
    doc=f"C4-style per-domain document quota: keep at most "
    f"{_DOMAIN_CAP} docs per source, selected by a DETERMINISTIC "
    "content rank (md5(text), doc_id ascending — a content hash "
    "spreads the keep set across the domain instead of biasing to "
    "early ids), and report the per-domain enforcement economics "
    "(docs/tokens kept vs total).  The quota step every web-scale "
    "corpus runs so no single domain dominates the mixture.  Scale "
    "shape: the rank rides with_grouped_global_rank's range-"
    "partitioned prefix sum — parallelism stays cluster-width when "
    "'source' is millions of domains AND when one domain holds half "
    "the crawl (the hot-domain rows spread over many range "
    "partitions; the per-(partition, group) counts frame the offsets "
    "window runs on is metadata-sized).",
)
def q_domain_cap_enforcement(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stockpulse_spark.operators.rank import with_grouped_global_rank

    d = _t(spark, sf_dir, "documents")
    base = d.select(
        "source",
        "doc_id",
        F.md5(F.encode(F.col("text"), "utf-8")).alias("fp"),
        F.when(F.col("text").isNull(), F.lit(0))
        .otherwise(F.size(F.split("text", " ")))
        .alias("n_tok"),
    )
    ranked = with_grouped_global_rank(
        base, ["source"], "fp", "doc_id", rank_col="rnk"
    )
    kept = F.col("rnk") <= _DOMAIN_CAP
    return (
        ranked.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(kept, 1).otherwise(0)).cast("bigint").alias("n_kept"),
            F.sum("n_tok").cast("bigint").alias("tokens_total"),
            F.sum(F.when(kept, F.col("n_tok")).otherwise(0))
            .cast("bigint")
            .alias("tokens_kept"),
        )
        .select(
            "source",
            "n_docs",
            "n_kept",
            "tokens_total",
            "tokens_kept",
            _r6(F.col("n_kept") * 1.0 / F.col("n_docs")).alias("keep_rate"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# 3. chunking economics (size/stride token expansion), closed form

_CHUNK_SIZE = 64
_CHUNK_STRIDE = 48


@_register(
    "chunk_stride_plan",
    oracle=f"""
    WITH base AS (
      SELECT source,
             CASE WHEN text IS NULL THEN 0
                  ELSE len(string_split(text, ' ')) END AS n
      FROM documents
    ), per_doc AS (
      SELECT source, n,
             CASE WHEN n <= 0 THEN 0
                  WHEN n <= {_CHUNK_SIZE} THEN 1
                  ELSE 1 + (n - {_CHUNK_SIZE} + {_CHUNK_STRIDE} - 1)
                           // {_CHUNK_STRIDE}
             END AS m
      FROM base
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(m) AS BIGINT) AS n_chunks,
           CAST(SUM(n) AS BIGINT) AS tokens_in,
           CAST(SUM(CASE WHEN m >= 1
                    THEN n + ({_CHUNK_SIZE} - {_CHUNK_STRIDE}) * (m - 1)
                    ELSE 0 END) AS BIGINT) AS tokens_emitted,
           ROUND(SUM(CASE WHEN m >= 1
                     THEN n + ({_CHUNK_SIZE} - {_CHUNK_STRIDE}) * (m - 1)
                     ELSE 0 END) * 1.0 / nullif(SUM(n), 0), 6)
             AS expansion_factor
    FROM per_doc GROUP BY source ORDER BY source
    """,
    tags=("llmdata", "curation"),
    doc=f"Chunking economics for a size-{_CHUNK_SIZE}/stride-"
    f"{_CHUNK_STRIDE} overlapping chunker (the RAG-indexing / "
    "long-context packing prepass): chunks per doc, token expansion "
    "from the overlap, per source.  Deliberately CLOSED FORM — "
    "chunk count is 1 + ceil((n - size)/stride) and emitted tokens "
    "are n + (size - stride)(m - 1), so the per-doc work is integer "
    "arithmetic in the scan projection and the query never explodes "
    "chunk rows it only needs to COUNT.  At 100 TB that is the "
    "difference between a metadata report and a full rewrite of the "
    "corpus; the actual chunk materialization belongs to the writer "
    "that needs the chunks.  All-integer: bit-identical under any "
    "partitioning.",
)
def q_chunk_stride_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    n = (
        F.when(F.col("text").isNull(), F.lit(0))
        .otherwise(F.size(F.split("text", " ")))
    )
    base = d.select("source", n.alias("n"))
    m = (
        F.when(F.col("n") <= 0, F.lit(0))
        .when(F.col("n") <= _CHUNK_SIZE, F.lit(1))
        .otherwise(
            1
            + F.floor(
                (F.col("n") - _CHUNK_SIZE + _CHUNK_STRIDE - 1) / _CHUNK_STRIDE
            )
        )
    )
    per_doc = base.select("source", "n", m.cast("long").alias("m"))
    emitted = F.when(
        F.col("m") >= 1,
        F.col("n") + (_CHUNK_SIZE - _CHUNK_STRIDE) * (F.col("m") - 1),
    ).otherwise(0)
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("m").cast("bigint").alias("n_chunks"),
            F.sum("n").cast("bigint").alias("tokens_in"),
            F.sum(emitted).cast("bigint").alias("tokens_emitted"),
        )
        .select(
            "source",
            "n_docs",
            "n_chunks",
            "tokens_in",
            "tokens_emitted",
            _r6(
                F.col("tokens_emitted")
                * 1.0
                / F.nullif(F.col("tokens_in"), F.lit(0))
            ).alias("expansion_factor"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# 4. freshness-decay sampling weights (exact dyadic)

_DECAY_BUCKET_DAYS = 30
_DECAY_MAX_BUCKET = 20


@_register(
    "freshness_decay_weights",
    oracle=f"""
    WITH cut AS (
      SELECT MAX(o_orderdate) AS max_d FROM orders
    ), base AS (
      SELECT o_orderpriority,
             CASE WHEN o_orderdate IS NULL THEN NULL
                  ELSE least(date_diff('day', o_orderdate, cut.max_d)
                             // {_DECAY_BUCKET_DAYS}, {_DECAY_MAX_BUCKET})
             END AS bucket,
             CASE WHEN o_orderdate IS NULL THEN NULL
                  ELSE date_diff('day', o_orderdate, cut.max_d) END AS age_d
      FROM orders CROSS JOIN cut
    ), w AS (
      SELECT o_orderpriority, age_d,
             CASE WHEN bucket IS NULL THEN NULL
                  ELSE power(2.0, -bucket) END AS wt
      FROM base
    ), agg AS (
      SELECT o_orderpriority,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             SUM(wt) AS sum_w,
             CAST(SUM(age_d) AS BIGINT) AS sum_age
      FROM w GROUP BY o_orderpriority
    )
    SELECT o_orderpriority,
           n_orders,
           ROUND(sum_w, 6) AS sum_weight,
           ROUND(sum_w / nullif(SUM(sum_w) OVER (), 0), 6) AS weight_share,
           ROUND(sum_age * 1.0 / nullif(n_orders, 0), 6) AS mean_age_days
    FROM agg ORDER BY o_orderpriority
    """,
    tags=("curation", "agg"),
    doc=f"Freshness-decay sampling weights: each order's weight halves "
    f"every {_DECAY_BUCKET_DAYS} days of age (bucketed integer age, "
    f"capped at bucket {_DECAY_MAX_BUCKET}), reported per priority "
    "class with each class's share of total weight — the recency "
    "prior a training-data sampler applies so stale data doesn't "
    "dominate by volume.  The weights are EXACT DYADIC (2^-bucket "
    "with bucket <= 20): every partial sum spans < 53 bits of "
    "exponent, so the float sums are bit-identical under ANY "
    "partition/summation order — the same reproducibility posture "
    "as the exact-integer money path, applied to float weights by "
    "CONSTRUCTION instead of by widening.  Scale shape: one scalar "
    "max (1-row broadcast), one scan projection, one |priorities| "
    "aggregate; the share window runs on the 5-row aggregate frame.",
)
def q_freshness_decay_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders").select("o_orderpriority", "o_orderdate")
    cut = o.agg(F.max("o_orderdate").alias("max_d"))
    age = F.datediff(F.col("max_d"), F.col("o_orderdate"))
    bucket = F.least(
        F.floor(age / _DECAY_BUCKET_DAYS), F.lit(_DECAY_MAX_BUCKET)
    )
    base = o.crossJoin(F.broadcast(cut)).select(
        "o_orderpriority",
        age.alias("age_d"),
        F.when(F.col("o_orderdate").isNotNull(), F.pow(F.lit(2.0), -bucket))
        .alias("wt"),
    )
    agg = base.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("wt").alias("sum_w"),
        F.sum("age_d").cast("bigint").alias("sum_age"),
    )
    # the share window runs over the |priorities|-row AGGREGATE frame
    # (metadata-sized — 5 rows — not the orders table)
    total = F.sum("sum_w").over(Window.partitionBy())
    return agg.select(
        "o_orderpriority",
        "n_orders",
        _r6(F.col("sum_w")).alias("sum_weight"),
        _r6(F.col("sum_w") / F.nullif(total, F.lit(0.0))).alias(
            "weight_share"
        ),
        _r6(
            F.col("sum_age") * 1.0 / F.nullif(F.col("n_orders"), F.lit(0))
        ).alias("mean_age_days"),
    ).orderBy("o_orderpriority")


# ---------------------------------------------------------------------------
# 5. LSH band churn under document edits (incremental-index CDC cost)


@_register(
    "lsh_band_churn",
    oracle=_MUT_CTE
    + f"""
    , sig AS (
      SELECT doc_id, {_sig_sql(16)} AS sig FROM corpus
    ), banded AS (
      SELECT doc_id, b.band_idx,
             md5(array_to_string(sig[b.band_idx * 2 + 1 : b.band_idx * 2 + 2], '|')) AS band_hash
      FROM sig, (SELECT unnest(range(0, 8)) AS band_idx) b
    ), joined AS (
      SELECT o.band_idx,
             o.band_hash IS DISTINCT FROM m.band_hash AS changed
      FROM banded o JOIN banded m
        ON m.doc_id = o.doc_id + 1 AND m.band_idx = o.band_idx
      WHERE o.doc_id % 2 = 0
    )
    SELECT band_idx,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN changed THEN 1 ELSE 0 END) AS BIGINT)
             AS n_changed,
           ROUND(SUM(CASE WHEN changed THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*), 6) AS churn_rate
    FROM joined GROUP BY band_idx ORDER BY band_idx
    """,
    tags=("llmdata", "dedup", "cdc"),
    doc="LSH index-maintenance cost under document edits: each "
    "original (residue id 2i) is joined to its edited twin (2i+1, "
    "last 5 words dropped — _mutated_corpus) and, per band, the "
    "fraction of band hashes the edit changed is reported.  This is "
    "the CDC bill for an INCREMENTAL LSH index at 100 TB: an edit "
    "rewrites only the changed bands' (bucket -> id) entries, so "
    "churn_rate x |edits| x |bands| prices the index update stream "
    "— measured per band rather than assumed uniform (a tail-biased "
    "edit, like this suffix drop, churns the bands whose min-shingle "
    "lives near the tail more).  Scale shape: signature scan + one "
    "1:1 id-equi-join (never quadratic) + an 8-group aggregate.  "
    "IS DISTINCT FROM (null-safe) keeps empty/NULL-text docs "
    "comparable on both engines.",
)
def q_lsh_band_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _mutated_corpus(spark, sf_dir)
    k, bands = 16, 8
    r = k // bands
    sig = corpus.select(
        "doc_id", minhash_signature("text", k, 3).alias("sig")
    )
    banded = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.md5(
                            F.encode(
                                F.concat_ws(
                                    "|", F.slice("sig", b * r + 1, r)
                                ),
                                "utf-8",
                            )
                        ).alias("band_hash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "band.band_idx", "band.band_hash")
    # pin once per invocation: the orig and mut branches both read the
    # banded frame, so the MinHash signature previously computed twice
    # (optimization r11)
    banded = banded.localCheckpoint(eager=False)
    orig = banded.filter(F.col("doc_id") % 2 == 0).select(
        F.col("doc_id").alias("oid"),
        "band_idx",
        F.col("band_hash").alias("h_orig"),
    )
    mut = banded.select(
        (F.col("doc_id") - 1).alias("oid"),
        "band_idx",
        F.col("band_hash").alias("h_mut"),
    )
    joined = orig.join(mut, ["oid", "band_idx"]).select(
        "band_idx",
        (~F.col("h_orig").eqNullSafe(F.col("h_mut"))).alias("changed"),
    )
    return (
        joined.groupBy("band_idx")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("changed"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_changed"),
        )
        .select(
            "band_idx",
            "n_docs",
            "n_changed",
            _r6(F.col("n_changed") * 1.0 / F.col("n_docs")).alias(
                "churn_rate"
            ),
        )
        .orderBy("band_idx")
    )


# ---------------------------------------------------------------------------
# 6. exact-dedup token savings per source


@_register(
    "dedup_token_savings",
    oracle="""
    WITH doubled AS (
      SELECT doc_id * 2 AS doc_id, source, text FROM documents
      UNION ALL
      SELECT doc_id * 2 + 1 AS doc_id, source, text FROM documents
    ), base AS (
      SELECT doc_id, source, md5(text) AS fp,
             CASE WHEN text IS NULL THEN 0
                  ELSE len(string_split(text, ' ')) END AS n_tok
      FROM doubled
    ), keepers AS (
      SELECT fp, MIN(doc_id) AS keeper_id
      FROM base WHERE fp IS NOT NULL GROUP BY fp
    ), marked AS (
      SELECT b.source, b.n_tok,
             CASE WHEN b.fp IS NULL THEN FALSE
                  WHEN b.doc_id = k.keeper_id THEN FALSE
                  ELSE TRUE END AS dropped
      FROM base b LEFT JOIN keepers k ON b.fp = k.fp
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN dropped THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dropped,
           CAST(SUM(n_tok) AS BIGINT) AS tokens_total,
           CAST(SUM(CASE WHEN dropped THEN n_tok ELSE 0 END) AS BIGINT)
             AS tokens_dropped,
           ROUND(SUM(CASE WHEN dropped THEN n_tok ELSE 0 END) * 1.0
                 / nullif(SUM(n_tok), 0), 6) AS savings_rate
    FROM marked GROUP BY source ORDER BY source
    """,
    tags=("llmdata", "dedup", "agg"),
    doc="Exact-dedup token economics per source, over a deliberately "
    "doubled corpus (residue ids 2i/2i+1 so the planted copies can "
    "never collide with input ids): keeper = global MIN doc_id per "
    "md5(text) cluster, every other copy is dropped and its tokens "
    "billed to ITS OWN source — the per-source storage/compute case "
    "for running the dedup funnel, and the attribution rule that "
    "matters when a mirror site re-hosts another domain's content "
    "(the mirror pays, the origin keeps).  NULL-text docs are always "
    "keepers (no content to deduplicate on; md5(NULL) groups would "
    "otherwise merge unrelated empty docs into one fake cluster).  "
    "Scale shape: one 32-byte-key shuffle builds the keeper frame, "
    "one id-keyed join back, one |sources| aggregate.",
)
def q_dedup_token_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    doubled = d.select(
        (F.col("doc_id") * 2).alias("doc_id"), "source", "text"
    ).unionAll(
        d.select((F.col("doc_id") * 2 + 1).alias("doc_id"), "source", "text")
    )
    base = doubled.select(
        "doc_id",
        "source",
        F.md5(F.encode(F.col("text"), "utf-8")).alias("fp"),
        F.when(F.col("text").isNull(), F.lit(0))
        .otherwise(F.size(F.split("text", " ")))
        .alias("n_tok"),
    )
    # pin once per invocation: the keeper aggregation and the marking
    # join both read this frame, so the md5 fingerprint + token count
    # over the doubled corpus previously computed twice (optimization
    # r11)
    base = base.localCheckpoint(eager=False)
    keepers = (
        base.filter(F.col("fp").isNotNull())
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keeper_id"))
    )
    marked = base.join(keepers, "fp", "left").select(
        "source",
        "n_tok",
        F.when(F.col("fp").isNull(), F.lit(False))
        .when(F.col("doc_id") == F.col("keeper_id"), F.lit(False))
        .otherwise(F.lit(True))
        .alias("dropped"),
    )
    return (
        marked.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("dropped"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_dropped"),
            F.sum("n_tok").cast("bigint").alias("tokens_total"),
            F.sum(F.when(F.col("dropped"), F.col("n_tok")).otherwise(0))
            .cast("bigint")
            .alias("tokens_dropped"),
        )
        .select(
            "source",
            "n_docs",
            "n_dropped",
            "tokens_total",
            "tokens_dropped",
            _r6(
                F.col("tokens_dropped")
                * 1.0
                / F.nullif(F.col("tokens_total"), F.lit(0))
            ).alias("savings_rate"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# wave 10b: layout planning, quality-aware canonicalization, model lift

_COMPACT_TARGET = 16384  # bytes per output file (SF-scaled stand-in)


@_register(
    "file_compaction_plan",
    oracle=f"""
    WITH base AS (
      SELECT source, doc_id,
             CAST(coalesce(n_chars, 0) AS BIGINT) AS bytes
      FROM documents
    ), packed AS (
      SELECT source, doc_id, bytes,
             coalesce(SUM(bytes) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               // {_COMPACT_TARGET} AS file_idx
      FROM base
    ), files AS (
      SELECT source, file_idx, SUM(bytes) AS fbytes, COUNT(*) AS fdocs
      FROM packed GROUP BY source, file_idx
    )
    SELECT source,
           CAST(SUM(fdocs) AS BIGINT) AS n_docs,
           CAST(SUM(fbytes) AS BIGINT) AS total_bytes,
           CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST((SUM(fbytes) + {_COMPACT_TARGET} - 1)
                // {_COMPACT_TARGET} AS BIGINT) AS ideal_files,
           CAST(MAX(fbytes) AS BIGINT) AS max_file_bytes,
           ROUND(SUM(fbytes) * 1.0
                 / nullif(COUNT(*) * {_COMPACT_TARGET}, 0), 6) AS fill_ratio
    FROM files GROUP BY source ORDER BY source
    """,
    tags=("curation", "layout"),
    doc=f"Write-layout compaction plan: pack each source's documents "
    f"(in id order) into ~{_COMPACT_TARGET}-byte output files by "
    "EXCLUSIVE prefix-sum bucketing (file = cum_bytes_before // "
    "target — a doc larger than the target gets its own file and "
    "overflows it, the same contract as parquet row-group sizing), "
    "then report per-source file counts vs the bin-packing ideal and "
    "the fill ratio — the small-files report a table-maintenance "
    "job consumes.  Scale shape: the per-source cumsum rides "
    "with_grouped_running_sum's range-partitioned prefix "
    "decomposition (parallelism = cluster width, never |sources| "
    "window tasks); two keyed aggregates after it.  All-integer "
    "except the final ratio (one divide).",
)
def q_file_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stockpulse_spark.operators.rank import with_grouped_running_sum

    d = _t(spark, sf_dir, "documents").select(
        "source",
        "doc_id",
        F.coalesce(F.col("n_chars"), F.lit(0)).cast("long").alias("bytes"),
    )
    packed = with_grouped_running_sum(
        d, ["source"], ["doc_id"], "bytes", out_col="__pre", inclusive=False
    ).select(
        "source",
        "bytes",
        F.floor(F.col("__pre") / _COMPACT_TARGET).cast("long").alias("file_idx"),
    )
    files = packed.groupBy("source", "file_idx").agg(
        F.sum("bytes").alias("fbytes"), F.count(F.lit(1)).alias("fdocs")
    )
    return (
        files.groupBy("source")
        .agg(
            F.sum("fdocs").cast("bigint").alias("n_docs"),
            F.sum("fbytes").cast("bigint").alias("total_bytes"),
            F.count(F.lit(1)).alias("n_files"),
            F.max("fbytes").cast("bigint").alias("max_file_bytes"),
        )
        .select(
            "source",
            "n_docs",
            "total_bytes",
            "n_files",
            (
                F.floor(
                    (F.col("total_bytes") + _COMPACT_TARGET - 1)
                    / _COMPACT_TARGET
                )
            ).cast("bigint").alias("ideal_files"),
            "max_file_bytes",
            _r6(
                F.col("total_bytes")
                * 1.0
                / F.nullif(
                    F.col("n_files") * F.lit(_COMPACT_TARGET), F.lit(0)
                )
            ).alias("fill_ratio"),
        )
        .select(
            "source", "n_docs", "total_bytes", "n_files", "ideal_files",
            "max_file_bytes", "fill_ratio",
        )
        .orderBy("source")
    )


@_register(
    "quality_keeper_selection",
    oracle="""
    WITH base AS (
      SELECT doc_id, source,
             md5(array_to_string((string_split(text, ' '))[1:10], ' '))
               AS pfx,
             CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
               AS n_unique,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      FROM documents WHERE text IS NOT NULL
    ), ranked AS (
      SELECT *,
             ROW_NUMBER() OVER (PARTITION BY pfx
                                ORDER BY n_unique DESC, doc_id) AS q_rnk,
             MIN(doc_id) OVER (PARTITION BY pfx) AS min_id,
             COUNT(*) OVER (PARTITION BY pfx) AS csize
      FROM base
    )
    SELECT source,
           CAST(COUNT(DISTINCT pfx) AS BIGINT) AS n_clusters,
           CAST(COUNT(DISTINCT CASE WHEN csize > 1 THEN pfx END)
                AS BIGINT) AS n_multi,
           CAST(SUM(CASE WHEN q_rnk = 1 AND doc_id != min_id
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_keeper_changed,
           CAST(SUM(CASE WHEN q_rnk = 1 THEN n_tok ELSE 0 END)
              - SUM(CASE WHEN doc_id = min_id THEN n_tok ELSE 0 END)
                AS BIGINT) AS tokens_kept_delta
    FROM ranked GROUP BY source ORDER BY source
    """,
    tags=("llmdata", "dedup", "curation"),
    doc="Quality-aware canonical selection: within each prefix-10 "
    "near-dup cluster, compare the MIN-ID keeper rule (what "
    "doc_dedup_exact / the keeper chain use) against a QUALITY rule "
    "(keep the member with the most distinct words, ties to the "
    "smaller id) — production pipelines keep the best copy, not the "
    "first, and this measures per source how often the rules "
    "disagree and the token delta of upgrading.  Quality is an "
    "INTEGER (distinct-word count), so the argmax is exact on both "
    "engines — no float-ranking hazard.  Scale shape: one pfx-keyed "
    "shuffle carries (two window functions + a rank) over clusters "
    "that are near-dup-sized by construction; one |sources| "
    "aggregate.  doc_id-attributed so a cluster spanning sources "
    "bills each side's own docs.",
)
def q_quality_keeper_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = F.split("text", " ")
    base = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(
            "doc_id",
            "source",
            F.md5(
                F.encode(F.concat_ws(" ", F.slice(w, 1, 10)), "utf-8")
            ).alias("pfx"),
            F.size(F.array_distinct(w)).cast("long").alias("n_unique"),
            F.size(w).cast("long").alias("n_tok"),
        )
    )
    cw = Window.partitionBy("pfx")
    ranked = base.select(
        "*",
        F.row_number()
        .over(cw.orderBy(F.col("n_unique").desc(), F.col("doc_id")))
        .alias("q_rnk"),
        F.min("doc_id").over(cw).alias("min_id"),
        F.count(F.lit(1)).over(cw).alias("csize"),
    )
    return (
        ranked.groupBy("source")
        .agg(
            F.countDistinct("pfx").alias("n_clusters"),
            F.countDistinct(
                F.when(F.col("csize") > 1, F.col("pfx"))
            ).alias("n_multi"),
            F.sum(
                F.when(
                    (F.col("q_rnk") == 1) & (F.col("doc_id") != F.col("min_id")),
                    1,
                ).otherwise(0)
            ).cast("bigint").alias("n_keeper_changed"),
            (
                F.sum(F.when(F.col("q_rnk") == 1, F.col("n_tok")).otherwise(0))
                - F.sum(
                    F.when(F.col("doc_id") == F.col("min_id"), F.col("n_tok"))
                    .otherwise(0)
                )
            ).cast("bigint").alias("tokens_kept_delta"),
        )
        .orderBy("source")
    )


_LIFT_K = 10
_LIFT_HOLDOUT_DAYS = 90


@_register(
    "score_decile_lift",
    oracle=f"""
    WITH cut AS (
      SELECT MAX(o_orderdate) - INTERVAL '{_LIFT_HOLDOUT_DAYS}' DAY
               AS cutoff FROM orders
    ), resp AS (
      SELECT DISTINCT o_custkey AS c FROM orders CROSS JOIN cut
      WHERE o_orderdate >= cut.cutoff
    ), scored AS (
      SELECT cu.c_custkey,
             CASE WHEN r.c IS NOT NULL THEN 1 ELSE 0 END AS responded,
             NTILE({_LIFT_K}) OVER (
               ORDER BY cu.c_acctbal DESC, cu.c_custkey) AS decile
      FROM customer cu LEFT JOIN resp r ON cu.c_custkey = r.c
    ), agg AS (
      SELECT decile,
             CAST(COUNT(*) AS BIGINT) AS n_customers,
             CAST(SUM(responded) AS BIGINT) AS n_responders
      FROM scored GROUP BY decile
    ), cum AS (
      SELECT decile, n_customers, n_responders,
             SUM(n_customers) OVER (ORDER BY decile) AS cum_c,
             SUM(n_responders) OVER (ORDER BY decile) AS cum_r,
             SUM(n_customers) OVER () AS tot_c,
             SUM(n_responders) OVER () AS tot_r
      FROM agg
    )
    SELECT CAST(decile AS INT) AS decile, n_customers, n_responders,
           ROUND(n_responders * 1.0 / nullif(n_customers, 0), 6)
             AS response_rate,
           ROUND(cum_r * tot_c * 1.0 / nullif(cum_c * tot_r, 0), 6)
             AS cum_lift
    FROM cum ORDER BY decile
    """,
    tags=("ml", "evaluation"),
    doc=f"Decile lift table — the campaign-targeting companion to "
    "score_auc_rank: customers ranked by account balance (stand-in "
    f"model score, ties broken on key), cut into {_LIFT_K} deciles "
    "via the CLOSED-FORM ntile over the range-partitioned global "
    f"rank (never a single NTILE window task), responders = bought "
    f"within {_LIFT_HOLDOUT_DAYS} days of the data's max date; per "
    "decile the response rate and cumulative lift vs the base rate.  "
    "cum_lift is computed as a ratio of exact INTEGER products "
    "(cum_r*tot_c)/(cum_c*tot_r) — one correctly-rounded divide, no "
    "float accumulation.  The cumulative window runs on the 10-row "
    "decile aggregate (metadata-sized).",
)
def q_score_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stockpulse_spark.operators.rank import (
        ntile_from_rank,
        with_global_rank,
    )

    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    cu = _t(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    cut = o.agg(
        (
            F.max("o_orderdate") - F.expr(f"INTERVAL {_LIFT_HOLDOUT_DAYS} DAYS")
        ).alias("cutoff")
    )
    resp = (
        o.crossJoin(F.broadcast(cut))
        .filter(F.col("o_orderdate") >= F.col("cutoff"))
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
        .withColumn("__resp", F.lit(1))
    )
    scored = cu.join(resp, "c_custkey", "left").select(
        "c_custkey",
        "c_acctbal",
        F.coalesce("__resp", F.lit(0)).alias("responded"),
    )
    ranked = with_global_rank(
        scored, "-c_acctbal", "c_custkey", rank_col="__rnk"
    )
    total = ranked.agg(F.count(F.lit(1)).cast("long").alias("__tot"))
    decd = ranked.crossJoin(F.broadcast(total)).select(
        "responded",
        ntile_from_rank(F.col("__rnk"), F.col("__tot"), _LIFT_K).alias(
            "decile"
        ),
    )
    agg = decd.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("responded").cast("bigint").alias("n_responders"),
    )
    # cumulative/total windows run on the 10-row decile frame
    wcum = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.partitionBy()
    cum = agg.select(
        "decile",
        "n_customers",
        "n_responders",
        F.sum("n_customers").over(wcum).alias("cum_c"),
        F.sum("n_responders").over(wcum).alias("cum_r"),
        F.sum("n_customers").over(wall).alias("tot_c"),
        F.sum("n_responders").over(wall).alias("tot_r"),
    )
    return cum.select(
        F.col("decile").cast("int").alias("decile"),
        "n_customers",
        "n_responders",
        _r6(
            F.col("n_responders") * 1.0 / F.nullif(F.col("n_customers"), F.lit(0))
        ).alias("response_rate"),
        _r6(
            F.col("cum_r") * F.col("tot_c") * 1.0
            / F.nullif(F.col("cum_c") * F.col("tot_r"), F.lit(0))
        ).alias("cum_lift"),
    ).orderBy("decile")
