"""Curation wave 5 — the selection/analysis layer a training-data
pipeline runs AFTER dedup and quality gates:

- dsir_importance_weights: DSIR (Xie et al. 2023, "Data Selection for
  Language Models via Importance Resampling") — hashed unigram
  importance weights log(p_target/p_raw), target = the English slice.
  The scores that let a curator up-sample raw data toward a target
  domain without training a classifier.
- cross_source_dup_matrix: which sources copy from each other —
  exact-hash overlap counts + Jaccard per source pair, the signal for
  dropping a mirror site before paying near-dup compute on it.
- label_centroid_similarity: pairwise cosine between label centroids —
  labels whose centroids nearly coincide are candidates for merging
  (or evidence of labeling noise) before the embedding corpus is used
  for retrieval training.
- hard_negative_mining: per anchor, the top-k most-similar vectors
  with a DIFFERENT label — the contrastive-training pair generator.
- vocab_coverage_curve: fraction of all token occurrences covered by
  the top-k vocabulary (k = 100/1k/10k) — the tokenizer-budget curve.
- packing_efficiency_report: padded vs packed sequence utilization at
  context 128/512/2048 — what doc_pack_sequences buys, quantified.
- token_frequency_spectrum: frequency-of-frequencies bands — the
  min-frequency-cutoff design table for tokenizer training.

Determinism contract (same discipline as registry_mlstats /
registry_mixture): every log is quantized to integer micro-nats
BEFORE any cross-row sum, so per-doc scores are exact BIGINT sums in
both engines; cosines fold sequentially over 6dp-snapped centroids and
are rounded before ranking; every ORDER BY is total (tiebreak keys).
Fuzz posture: NULL/empty text and NULL/all-zero embeddings are
excluded identically on both sides; norms are nullif-guarded so the
all-zero vector yields NULL cosine, never an ANSI divide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stockpulse_spark.llmdata.hashing import word32_sql
from stockpulse_spark.llmdata.similarity import _as_double, dot, norm
from stockpulse_spark.operators.rank import with_global_rank
from stockpulse_spark.operators.topk import salted_grouped_topk
from stockpulse_spark.plans.registry import _r6, _register, _t
from stockpulse_spark.plans.registry_ml import _DIMS, _D_DOT

_N_BUCKETS = 256  # hashed-unigram feature space (DSIR uses 10^4; 256
# keeps the sf0.001 oracle fast while exercising identical plumbing)
_TARGET_LANG = "en"

_TOK_FILTER = "text IS NOT NULL AND text <> ''"


def _docs_tok(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, lang, source, w): one row per whitespace token of every
    non-NULL non-empty document — the shared scan of this module."""
    return (
        _t(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull() & (F.col("text") != ""))
        .select(
            "doc_id",
            "lang",
            "source",
            F.explode(F.split("text", " ")).alias("w"),
        )
    )


@_register(
    "dsir_importance_weights",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
      FROM documents WHERE {_TOK_FILTER}
    ), tb AS (
      SELECT doc_id, lang, ({word32_sql('w')} % {_N_BUCKETS}) AS b
      FROM tok
    ), raw AS (
      SELECT b, COUNT(*) AS rc FROM tb GROUP BY b
    ), tots AS (
      SELECT COUNT(*) AS rt,
             SUM(CASE WHEN lang = '{_TARGET_LANG}' THEN 1 ELSE 0 END)
               AS tt
      FROM tb
    ), tgt AS (
      SELECT b, COUNT(*) AS tc FROM tb
      WHERE lang = '{_TARGET_LANG}' GROUP BY b
    ), model AS (
      SELECT r.b,
             CAST(round((ln((COALESCE(t.tc, 0) + 1.0)
                            / (s.tt + {_N_BUCKETS}.0))
                         - ln((r.rc + 1.0)
                              / (s.rt + {_N_BUCKETS}.0))) * 1000000)
                  AS BIGINT) AS lr
      FROM raw r LEFT JOIN tgt t USING (b) CROSS JOIN tots s
    ), scored AS (
      SELECT tb.doc_id, tb.lang,
             SUM(m.lr) AS s_micro, COUNT(*) AS n_toks
      FROM tb JOIN model m USING (b)
      GROUP BY tb.doc_id, tb.lang
    )
    SELECT doc_id, lang, CAST(n_toks AS BIGINT) AS n_tokens,
           ROUND((s_micro * 1.0 / n_toks) / 1000000.0, 6)
             AS dsir_weight
    FROM scored
    ORDER BY dsir_weight DESC, doc_id
    LIMIT 20
    """,
    tags=("llmdata", "sample", "ml"),
    doc="DSIR importance weights: per-token hashed-unigram (md5 mod "
    f"{_N_BUCKETS}) log-ratio of the target distribution (lang="
    f"'{_TARGET_LANG}') over the raw corpus, Laplace-smoothed, "
    "averaged per document — the importance-resampling score of Xie "
    "et al. 2023. Log-ratios are quantized to integer micro-nats "
    "per BUCKET (a 256-row broadcast model), so every per-doc score "
    "is an exact BIGINT sum — float fold order can flip nothing. "
    "Two scan-shaped shuffles (bucket counts, then doc regroup) + "
    "one broadcast; top-20 is TakeOrdered. At 100 TB the model stays "
    "KB-sized regardless of corpus size.",
)
def q_dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    # pin the tokenized+hashed frame once per invocation (the r11
    # multi-branch pin policy): tb feeds FOUR branches (raw counts,
    # totals, target counts, doc regroup), so the split+explode and
    # the per-token md5 otherwise execute 4x
    tb = (
        _docs_tok(spark, sf_dir)
        .select(
            "doc_id",
            "lang",
            (F.expr(word32_sql("w")) % _N_BUCKETS).alias("b"),
        )
        .localCheckpoint(eager=False)
    )
    raw = tb.groupBy("b").agg(F.count(F.lit(1)).alias("rc"))
    tots = tb.agg(
        F.count(F.lit(1)).alias("rt"),
        F.sum(
            F.when(F.col("lang") == _TARGET_LANG, 1).otherwise(0)
        ).alias("tt"),
    )
    tgt = (
        tb.filter(F.col("lang") == _TARGET_LANG)
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("tc"))
    )
    model = (
        raw.join(tgt, "b", "left")
        .crossJoin(F.broadcast(tots))
        .select(
            "b",
            F.round(
                (
                    F.log(
                        (F.coalesce("tc", F.lit(0)) + 1.0)
                        / (F.col("tt") + float(_N_BUCKETS))
                    )
                    - F.log(
                        (F.col("rc") + 1.0)
                        / (F.col("rt") + float(_N_BUCKETS))
                    )
                )
                * 1_000_000
            )
            .cast("bigint")
            .alias("lr"),
        )
    )
    scored = (
        tb.join(F.broadcast(model), "b")
        .groupBy("doc_id", "lang")
        .agg(
            F.sum("lr").alias("s_micro"),
            F.count(F.lit(1)).alias("n_toks"),
        )
    )
    return (
        scored.select(
            "doc_id",
            "lang",
            F.col("n_toks").cast("long").alias("n_tokens"),
            _r6(
                (F.col("s_micro") * 1.0 / F.col("n_toks")) / 1_000_000.0
            ).alias("dsir_weight"),
        )
        .orderBy(F.desc("dsir_weight"), "doc_id")
        .limit(20)
    )


@_register(
    "cross_source_dup_matrix",
    oracle=f"""
    WITH hs AS (
      SELECT DISTINCT
             md5(array_to_string(string_split(text, ' ')[1:8], ' '))
               AS h,
             source
      FROM documents WHERE {_TOK_FILTER}
    ), per AS (
      SELECT source, COUNT(*) AS n FROM hs GROUP BY source
    )
    SELECT a.source AS src_a, b.source AS src_b,
           CAST(COUNT(*) AS BIGINT) AS shared_texts,
           ROUND(COUNT(*) * 1.0 / (pa.n + pb.n - COUNT(*)), 6)
             AS jaccard
    FROM hs a JOIN hs b ON a.h = b.h AND a.source < b.source
    JOIN per pa ON pa.source = a.source
    JOIN per pb ON pb.source = b.source
    GROUP BY a.source, b.source, pa.n, pb.n
    ORDER BY shared_texts DESC, src_a, src_b
    """,
    tags=("llmdata", "dedup", "agg"),
    doc="Cross-source duplication matrix: for every source pair, how "
    "many distinct leading fingerprints (md5 of the first 8 words — "
    "the header/boilerplate signature mirrors and syndicated copies "
    "share even when trailing content drifts) they have in common, "
    "plus the Jaccard of their fingerprint sets — the mirror-site "
    "detector run BEFORE paying near-dup compute. The Spark plan "
    "never self-joins the hash table: each "
    "hash's distinct source set is collected in-row (bounded by "
    "source cardinality, ~dozens at any corpus scale) and pairs "
    "expand combinatorially inside the row, then one partial-agg "
    "shuffle on the (src_a, src_b) pair — the same in-row expansion "
    "as doc_substring_dup_pairs. Per-source totals are tiny and "
    "broadcast.",
)
def q_cross_source_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    hs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull() & (F.col("text") != ""))
        .select(
            F.md5(
                F.concat_ws(" ", F.slice(F.split("text", " "), 1, 8))
            ).alias("h"),
            "source",
        )
        .distinct()
    )
    per = hs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    pair = (
        hs.groupBy("h")
        .agg(F.sort_array(F.collect_set("source")).alias("ss"))
        .filter(F.size("ss") >= 2)
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ss, (x, i) -> "
                    "transform(slice(ss, i + 2, size(ss)), "
                    "y -> struct(x AS src_a, y AS src_b))))"
                )
            ).alias("q")
        )
        .groupBy(
            F.col("q.src_a").alias("src_a"),
            F.col("q.src_b").alias("src_b"),
        )
        .agg(F.count(F.lit(1)).alias("shared_texts"))
    )
    pa = per.select(F.col("source").alias("src_a"), F.col("n").alias("na"))
    pb = per.select(F.col("source").alias("src_b"), F.col("n").alias("nb"))
    return (
        pair.join(F.broadcast(pa), "src_a")
        .join(F.broadcast(pb), "src_b")
        .select(
            "src_a",
            "src_b",
            "shared_texts",
            _r6(
                F.col("shared_texts")
                * 1.0
                / (F.col("na") + F.col("nb") - F.col("shared_texts"))
            ).alias("jaccard"),
        )
        .orderBy(F.desc("shared_texts"), "src_a", "src_b")
    )


def _d_guarded_cos(a: str, b: str) -> str:
    """DuckDB cosine with nullif-guarded norms (all-zero vector ->
    NULL, matching llmdata.similarity.norm)."""
    n = _DIMS + 1
    d_ab = _D_DOT.format(n=n, a=a, b=b)
    d_aa = _D_DOT.format(n=n, a=a, b=a)
    d_bb = _D_DOT.format(n=n, a=b, b=b)
    return (
        f"{d_ab} / (sqrt(nullif({d_aa}, 0.0))"
        f" * sqrt(nullif({d_bb}, 0.0)))"
    )


@_register(
    "label_centroid_similarity",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings
      WHERE embedding IS NOT NULL AND label IS NOT NULL
    ), cent AS (
      SELECT label, list(mu ORDER BY pos) AS c, MAX(n1) AS n FROM (
        SELECT v.label, t.i AS pos, ROUND(AVG(e[t.i]), 6) AS mu,
               COUNT(*) AS n1
        FROM v, range(1, {_DIMS + 1}) AS t(i)
        GROUP BY v.label, t.i
      ) GROUP BY label
    )
    SELECT a.label AS label_a, b.label AS label_b,
           CAST(a.n AS BIGINT) AS n_a, CAST(b.n AS BIGINT) AS n_b,
           ROUND({_d_guarded_cos('a.c', 'b.c')}, 6) AS cos_sim
    FROM cent a JOIN cent b ON a.label < b.label
    ORDER BY label_a, label_b
    """,
    tags=("llmdata", "similarity", "agg"),
    doc="Pairwise cosine between label centroids: labels whose "
    "centroids nearly coincide are merge candidates (or labeling "
    "noise) before the corpus trains a retriever. Centroids are "
    "6dp-snapped dimension-wise means (the embedding_label_outliers "
    "/ kmeans recipe, so both engines fold bit-identical vectors); "
    "the pair join is LABELS x LABELS on metadata-sized input — "
    "broadcast, never a shuffle. One partial-agg shuffle over the "
    "corpus total. All-zero centroids yield NULL cosine via "
    "nullif-guarded norms, never an ANSI divide.",
)
def q_label_centroid_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = (
        _t(spark, sf_dir, "embeddings")
        .filter(F.col("embedding").isNotNull() & F.col("label").isNotNull())
        .select("label", _as_double(F.col("embedding")).alias("e"))
    )
    cent = (
        v.select("label", F.posexplode("e").alias("pos", "val"))
        .groupBy("label", "pos")
        .agg(
            _r6(F.avg("val")).alias("mu"),
            F.count(F.lit(1)).alias("n1"),
        )
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "mu"))),
                lambda s: s.getField("mu"),
            ).alias("c"),
            F.max("n1").alias("n"),
        )
    )
    # per-centroid norms folded once per side, not per label pair
    # (optimization r11 — interpreted-HOF fold; same doubles through
    # the same division)
    a = cent.select(
        F.col("label").alias("label_a"),
        F.col("c").alias("ca"),
        F.col("n").alias("n_a"),
        norm(F.col("c")).alias("na"),
    )
    b = cent.select(
        F.col("label").alias("label_b"),
        F.col("c").alias("cb"),
        F.col("n").alias("n_b"),
        norm(F.col("c")).alias("nb"),
    )
    return (
        a.join(F.broadcast(b), F.col("label_a") < F.col("label_b"))
        .select(
            "label_a",
            "label_b",
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            _r6(
                dot(F.col("ca"), F.col("cb")) / (F.col("na") * F.col("nb"))
            ).alias("cos_sim"),
        )
        .orderBy("label_a", "label_b")
    )


_N_ANCHORS = 10
_K_NEG = 3


@_register(
    "hard_negative_mining",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings
      WHERE embedding IS NOT NULL AND label IS NOT NULL
    ), anch AS (
      SELECT vec_id AS anchor_id, label AS anchor_label, e AS ae
      FROM v WHERE vec_id < {_N_ANCHORS}
    ), cand AS (
      SELECT a.anchor_id, a.anchor_label,
             c.vec_id AS neg_id, c.label AS neg_label,
             ROUND({_d_guarded_cos('a.ae', 'c.e')}, 6) AS cos_sim
      FROM anch a JOIN v c ON c.label <> a.anchor_label
    ), ranked AS (
      SELECT *, ROW_NUMBER() OVER (
               PARTITION BY anchor_id
               ORDER BY cos_sim DESC, neg_id) AS rk
      FROM cand WHERE cos_sim IS NOT NULL
    )
    SELECT anchor_id, anchor_label, neg_id, neg_label, cos_sim,
           CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= {_K_NEG}
    ORDER BY anchor_id, rk
    """,
    tags=("llmdata", "similarity", "window"),
    doc="Contrastive hard-negative mining: for each anchor vector, "
    f"the top-{_K_NEG} most-cosine-similar vectors carrying a "
    "DIFFERENT label — the pair generator for contrastive retriever "
    "training. Anchors are a tiny broadcast side against one corpus "
    "scan; cosines are rounded to 6dp BEFORE ranking (neg_id "
    "tiebreak) so a last-ulp fold difference can never flip a rank. "
    "The per-anchor top-k runs the salted two-stage form "
    "(doc_weighted_sample_by_source's shape): stage 1 ranks inside "
    "(anchor, md5-salt) buckets and keeps k, stage 2 ranks the "
    "16k survivors exactly — no hot reducer even when one anchor "
    "partition would otherwise see the whole corpus. All-zero "
    "vectors have NULL cosine (nullif-guarded norm) and are "
    "excluded identically on both engines.",
)
def q_hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Per-vector norms are folded ONCE per side before the anchor
    # join (optimization r11, the srp_lsh_topk rewrite's pattern):
    # the norm fold is an interpreted higher-order function, and
    # computing it inside the pair projection re-ran it per (anchor,
    # candidate) pair — 2 x |anchors| folds per vector instead of 1.
    # Same doubles through the same division; pair set unchanged.
    v = (
        _t(spark, sf_dir, "embeddings")
        .filter(F.col("embedding").isNotNull() & F.col("label").isNotNull())
        .select("vec_id", "label", _as_double(F.col("embedding")).alias("e"))
        .withColumn("en", norm(F.col("e")))
    )
    anch = v.filter(F.col("vec_id") < _N_ANCHORS).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("label").alias("anchor_label"),
        F.col("e").alias("ae"),
        F.col("en").alias("an"),
    )
    cand = (
        v.join(
            F.broadcast(anch),
            F.col("label") != F.col("anchor_label"),
        )
        .select(
            "anchor_id",
            "anchor_label",
            F.col("vec_id").alias("neg_id"),
            F.col("label").alias("neg_label"),
            _r6(
                dot(F.col("ae"), F.col("e")) / (F.col("an") * F.col("en"))
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim").isNotNull())
    )
    topk = salted_grouped_topk(
        cand,
        ["anchor_id"],
        [F.desc("cos_sim"), F.asc("neg_id")],
        _K_NEG,
        F.expr(word32_sql("CAST(neg_id AS STRING)")),
    )
    return (
        topk.select(
            "anchor_id",
            "anchor_label",
            "neg_id",
            "neg_label",
            "cos_sim",
            F.col("rk").cast("long").alias("rk"),
        )
        .orderBy("anchor_id", "rk")
    )


@_register(
    "vocab_coverage_curve",
    oracle=f"""
    WITH tok AS (
      SELECT unnest(string_split(text, ' ')) AS w
      FROM documents WHERE {_TOK_FILTER}
    ), tf AS (
      SELECT w, COUNT(*) AS cnt FROM tok GROUP BY w
    ), ranked AS (
      SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, w) AS rk
      FROM tf
    ), tot AS (
      SELECT SUM(cnt) AS total, COUNT(*) AS v FROM tf
    )
    SELECT CAST(k.k AS BIGINT) AS k,
           CAST(LEAST(k.k, t.v) AS BIGINT) AS vocab_used,
           CAST(COALESCE(SUM(CASE WHEN r.rk <= k.k THEN r.cnt END), 0)
                AS BIGINT) AS covered_tokens,
           CAST(t.total AS BIGINT) AS total_tokens,
           ROUND(COALESCE(SUM(CASE WHEN r.rk <= k.k THEN r.cnt END), 0)
                 * 1.0 / t.total, 6) AS coverage
    FROM ranked r
    CROSS JOIN (VALUES (100), (1000), (10000)) k(k)
    CROSS JOIN tot t
    GROUP BY k.k, t.v, t.total
    ORDER BY k
    """,
    tags=("llmdata", "text", "rank"),
    doc="Vocabulary coverage curve: share of ALL token occurrences "
    "covered by the top-k most frequent terms (k = 100/1k/10k) — the "
    "table a tokenizer budget decision reads (complements "
    "zipf_slope/corpus_heaps_stats with the actionable cumulative "
    "form). Term ranking runs through with_global_rank (range "
    "repartition + prefix-sum) on (-cnt, term) — never a "
    "single-task global window over a 100M-term vocabulary; the "
    "3-row k table broadcasts onto the ranked terms and one "
    "partial agg folds the conditional sums.",
)
def q_vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    tf = (
        _docs_tok(spark, sf_dir)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    ranked = with_global_rank(
        tf.withColumn("neg_cnt", -F.col("cnt")),
        "neg_cnt",
        "w",
        rank_col="rk",
    ).select("cnt", "rk")
    tot = tf.agg(
        F.sum("cnt").alias("total"), F.count(F.lit(1)).alias("v")
    )
    ks = tot.select(
        F.explode(
            F.array(F.lit(100), F.lit(1000), F.lit(10000))
        ).alias("k"),
        "total",
        "v",
    )
    covered = F.sum(
        F.when(F.col("rk") <= F.col("k"), F.col("cnt"))
    )
    return (
        ranked.crossJoin(F.broadcast(ks))
        .groupBy("k", "v", "total")
        .agg(F.coalesce(covered, F.lit(0)).alias("covered"))
        .select(
            F.col("k").cast("long").alias("k"),
            F.least("k", "v").cast("long").alias("vocab_used"),
            F.col("covered").cast("long").alias("covered_tokens"),
            F.col("total").cast("long").alias("total_tokens"),
            _r6(F.col("covered") * 1.0 / F.col("total")).alias(
                "coverage"
            ),
        )
        .orderBy("k")
    )


@_register(
    "packing_efficiency_report",
    oracle=f"""
    WITH d AS (
      SELECT len(string_split(text, ' ')) AS toks
      FROM documents WHERE {_TOK_FILTER}
    )
    SELECT CAST(c.ctx AS BIGINT) AS ctx,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(LEAST(d.toks, c.ctx)) AS BIGINT) AS tokens_kept,
           CAST(CEIL(SUM(LEAST(d.toks, c.ctx)) * 1.0 / c.ctx)
                AS BIGINT) AS packed_bins,
           ROUND(SUM(LEAST(d.toks, c.ctx)) * 1.0
                 / (COUNT(*) * c.ctx), 6) AS util_padded,
           ROUND(SUM(LEAST(d.toks, c.ctx)) * 1.0
                 / (CEIL(SUM(LEAST(d.toks, c.ctx)) * 1.0 / c.ctx)
                    * c.ctx), 6) AS util_packed
    FROM d CROSS JOIN (VALUES (128), (512), (2048)) c(ctx)
    GROUP BY c.ctx
    ORDER BY ctx
    """,
    tags=("llmdata", "agg"),
    doc="Packing efficiency: at context 128/512/2048, the slot "
    "utilization of one-doc-per-sequence padding vs perfect "
    "first-fit packing (lower bound ceil(total/ctx) bins) — "
    "quantifies what doc_pack_sequences buys and picks the context "
    "length. Docs longer than the context are truncated (LEAST). "
    "Pure integer aggregates over one scan crossed with a 3-row "
    "literal — fold-order-free, zero data shuffles beyond the "
    "3-group partial agg.",
)
def q_packing_efficiency_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull() & (F.col("text") != ""))
        .select(F.size(F.split("text", " ")).alias("toks"))
    )
    ctxs = spark.range(1).select(
        F.explode(
            F.array(F.lit(128), F.lit(512), F.lit(2048))
        ).alias("ctx")
    )
    kept = F.sum(F.least(F.col("toks"), F.col("ctx")))
    agg = (
        d.crossJoin(F.broadcast(ctxs))
        .groupBy("ctx")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            kept.alias("tokens_kept"),
        )
    )
    packed = F.ceil(F.col("tokens_kept") * 1.0 / F.col("ctx"))
    return agg.select(
        F.col("ctx").cast("long").alias("ctx"),
        "n_docs",
        F.col("tokens_kept").cast("long").alias("tokens_kept"),
        packed.cast("long").alias("packed_bins"),
        _r6(
            F.col("tokens_kept") * 1.0 / (F.col("n_docs") * F.col("ctx"))
        ).alias("util_padded"),
        _r6(
            F.col("tokens_kept") * 1.0 / (packed * F.col("ctx"))
        ).alias("util_packed"),
    ).orderBy("ctx")


@_register(
    "token_frequency_spectrum",
    oracle=f"""
    WITH tok AS (
      SELECT unnest(string_split(text, ' ')) AS w
      FROM documents WHERE {_TOK_FILTER}
    ), tf AS (
      SELECT w, COUNT(*) AS cnt FROM tok GROUP BY w
    ), banded AS (
      SELECT cnt,
             CASE WHEN cnt = 1 THEN 1 WHEN cnt = 2 THEN 2
                  WHEN cnt < 10 THEN 3 WHEN cnt < 100 THEN 10
                  WHEN cnt < 1000 THEN 100 ELSE 1000 END AS band_lo,
             CASE WHEN cnt = 1 THEN '1' WHEN cnt = 2 THEN '2'
                  WHEN cnt < 10 THEN '3-9' WHEN cnt < 100 THEN '10-99'
                  WHEN cnt < 1000 THEN '100-999'
                  ELSE '1000+' END AS band
      FROM tf
    ), tot AS (SELECT SUM(cnt) AS total FROM tf)
    SELECT b.band,
           CAST(b.band_lo AS BIGINT) AS band_lo,
           CAST(COUNT(*) AS BIGINT) AS n_terms,
           CAST(SUM(b.cnt) AS BIGINT) AS token_mass,
           ROUND(SUM(b.cnt) * 1.0 / t.total, 6) AS mass_share
    FROM banded b CROSS JOIN tot t
    GROUP BY b.band, b.band_lo, t.total
    ORDER BY band_lo
    """,
    tags=("llmdata", "text", "agg"),
    doc="Token frequency-of-frequencies spectrum: how many distinct "
    "terms occur once / twice / 3-9 / 10-99 / 100-999 / 1000+ times "
    "and what share of total token mass each band carries — the "
    "design table for a tokenizer's min-frequency cutoff (hapax "
    "band = OOV exposure). Integer-only except the final share; one "
    "term-count shuffle then a 6-group partial agg.",
)
def q_token_frequency_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    tf = (
        _docs_tok(spark, sf_dir)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    band_lo = (
        F.when(F.col("cnt") == 1, 1)
        .when(F.col("cnt") == 2, 2)
        .when(F.col("cnt") < 10, 3)
        .when(F.col("cnt") < 100, 10)
        .when(F.col("cnt") < 1000, 100)
        .otherwise(1000)
    )
    band = (
        F.when(F.col("cnt") == 1, "1")
        .when(F.col("cnt") == 2, "2")
        .when(F.col("cnt") < 10, "3-9")
        .when(F.col("cnt") < 100, "10-99")
        .when(F.col("cnt") < 1000, "100-999")
        .otherwise("1000+")
    )
    banded = tf.select(
        "cnt", band_lo.alias("band_lo"), band.alias("band")
    )
    tot = tf.agg(F.sum("cnt").alias("total"))
    return (
        banded.crossJoin(F.broadcast(tot))
        .groupBy("band", "band_lo", "total")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.sum("cnt").alias("token_mass"),
        )
        .select(
            "band",
            F.col("band_lo").cast("long").alias("band_lo"),
            F.col("n_terms").cast("long").alias("n_terms"),
            F.col("token_mass").cast("long").alias("token_mass"),
            _r6(F.col("token_mass") * 1.0 / F.col("total")).alias(
                "mass_share"
            ),
        )
        .orderBy("band_lo")
    )
