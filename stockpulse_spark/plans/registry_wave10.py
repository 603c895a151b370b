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
src/data/processors.py); these extend the LLM-data pipeline family
the north-star extensions call for.

Scale posture: every query is scan-shaped or candidate-bounded. The
precision sample only scores pairs the LSH tier already emitted
(bounded by the band-bucket cap); the churn delta joins each doc to
its single edited twin (1:1, never quadratic); caps/chunks/weights/
savings are one groupBy over a scan projection. No global windows,
no driver collects, no Python rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stockpulse_spark.llmdata.dedup import (
    minhash_lsh_pairs,
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
    pairs = minhash_lsh_pairs(corpus, k=16, bands=8, threshold=0.5)
    sh = corpus.select(
        "doc_id", shingles(F.col("text"), 3).alias("sh")
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
        "doc_id", minhash_signature(F.col("text"), k, 3).alias("sig")
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
